"""A/B the v6 anchor-sorted kernel vs v3/v4 on the bench workloads.

Two scenes, on the real chip, per-frame times from an N-frame
lax.scan with a scalar checksum (tunnel RTT amortized):

  * the primary 1M-disc 1080p dolly scene (fused render) — v3 vs v4
    vs v6;
  * the flagship traj_ball TRAIL scene at --trail-points points
    (ground + spheres + 8-capsule trails) — v4 vs v6.

Run: python benchmarks/v6_ab.py [--frames 24] [--points 1000000]
"""
import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

sys.path.insert(0, "/root/repo")

from pointcloud_render_tpu.configs import PRESETS  # noqa: E402
from pointcloud_render_tpu.raster.primitives import (  # noqa: E402
    ScreenPrimitives,
    discs_from_points,
)
from pointcloud_render_tpu.raster.render import (  # noqa: E402
    RasterConfig,
    ground_plane,
    render,
)
from pointcloud_render_tpu.run.pipeline import build_primitives  # noqa: E402
from pointcloud_render_tpu.scene.camera import (  # noqa: E402
    TARGETS,
    TOTAL_FRAMES,
    Camera,
    camera_origin_jax,
)
from pointcloud_render_tpu.utils import aot  # noqa: E402


def time_scan(name, frame_fn, frames, *args, rounds=3):
    def episode(*a):
        def body(acc, fi):
            return acc + frame_fn(fi, *a), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.asarray(frames, jnp.int32))
        return acc

    c = aot.compile_const_free(episode, *args)
    float(np.asarray(c(*args)))
    best = np.inf
    for _ in range(rounds):
        t0 = time.perf_counter()
        float(np.asarray(c(*args)))
        best = min(best, time.perf_counter() - t0)
    ms = best / len(frames) * 1e3
    print(f"{name:36s} {ms:8.2f} ms/frame", file=sys.stderr)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--points", type=int, default=1_000_000)
    ap.add_argument("--trail-points", type=int, default=1_000_000)
    ap.add_argument("--skip-disc", action="store_true")
    ap.add_argument("--skip-trail", action="store_true")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    target = np.asarray(TARGETS["traj_ball"], np.float32)

    def make_camera(fi):
        return Camera(origin=camera_origin_jax("traj_ball", fi,
                                               TOTAL_FRAMES),
                      target=target)

    # ---- disc scene --------------------------------------------------
    if not args.skip_disc:
        n = args.points
        positions = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)), jnp.float32)
        radii = jnp.full((n,), 0.002, jnp.float32)
        frames = np.linspace(0, 219, args.frames).astype(np.int32)

        def soup(camera, positions, radii):
            return ScreenPrimitives.concatenate([
                ground_plane(camera, 10.0, (0.0, 0.0, -0.5)),
                discs_from_points(positions, camera, radii,
                                  np.array([0.3, 0.3, 0.3], np.float32)),
            ])

        def frame(config):
            def f(fi, positions, radii):
                camera = make_camera(fi)
                fb = render(soup(camera, positions, radii), camera, config)
                return (jnp.sum(jnp.where(jnp.isfinite(fb.depth), fb.depth,
                                          0.0))
                        + jnp.sum(fb.rgb[::8, ::8]))

            return f

        # v3 needs a probed capacity; use the bench's r2 value class.
        from pointcloud_render_tpu.raster import pallas_csr3

        cam0 = make_camera(jnp.int32(0))
        probe = aot.compile_const_free(
            lambda fi: pallas_csr3.true_entry_count3(
                soup(make_camera(fi), positions, radii),
                cam0.width, cam0.height), jnp.int32(0))
        ecs = [int(np.asarray(probe(jnp.int32(int(f)))))
               for f in (0, 120, 219)]
        cap = ((int(max(ecs) * 1.15) + 127) // 128) * 128

        time_scan("disc v3 fused (cap)", frame(RasterConfig(
            backend="pallas3", no_triangles=True, discs_only=True,
            entry_capacity=cap)), frames, positions, radii)
        time_scan("disc v4 fused", frame(RasterConfig(
            backend="pallas4", no_triangles=True)), frames,
            positions, radii)
        time_scan("disc v6 fused", frame(RasterConfig(
            backend="pallas6", no_triangles=True)), frames,
            positions, radii)
        time_scan("disc v6 discs_only fused", frame(RasterConfig(
            backend="pallas6", no_triangles=True, discs_only=True)),
            frames, positions, radii)

    # ---- trail scene -------------------------------------------------
    if not args.skip_trail:
        preset = PRESETS["traj_ball"]
        tn = args.trail_points
        tpos = jnp.asarray(rng.uniform(-0.5, 0.5, (tn, 3)), jnp.float32)
        tvel = jnp.asarray(np.random.default_rng(1).normal(0, 2, (tn, 3)),
                           jnp.float32)
        tframes = np.linspace(20, 219, max(8, args.frames // 2)).astype(
            np.int32)

        def tsoup(fi):
            camera = make_camera(fi)
            return build_primitives(preset, camera, tpos, tvel, fi), camera

        from pointcloud_render_tpu.raster import pallas_csr4

        cam0 = make_camera(jnp.int32(0))
        w, h = cam0.width, cam0.height
        pc = aot.compile_const_free(
            lambda fi: (pallas_csr4.true_entry_count4(tsoup(fi)[0], w, h),
                        pallas_csr4.bin_diagnostics4(tsoup(fi)[0], w, h)),
            jnp.int32(0))
        ecs, ovfs = zip(*[tuple(int(np.asarray(x))
                               for x in pc(jnp.int32(int(f))))
                          for f in (tframes[0], tframes[-1])])
        cap = ((int(max(ecs) * 1.2) + 127) // 128) * 128
        max_big = ((1024 + int(max(ovfs) * 1.5) + 511) // 512) * 512
        print(f"# trail cap {cap} max_big {max_big}", file=sys.stderr)

        def tframe(config):
            def f(fi, tpos, tvel):
                s, camera = tsoup(fi)
                fb = render(s, camera, config)
                return (jnp.sum(jnp.where(jnp.isfinite(fb.depth), fb.depth,
                                          0.0))
                        + jnp.sum(fb.rgb[::8, ::8]))

            return f

        time_scan("trail v4 (cap)", tframe(RasterConfig(
            backend="pallas4", no_triangles=True, entry_capacity=cap,
            max_big=max_big)), tframes, tpos, tvel)
        time_scan("trail v6", tframe(RasterConfig(
            backend="pallas6", no_triangles=True, max_big=max_big)),
            tframes, tpos, tvel)


if __name__ == "__main__":
    main()
