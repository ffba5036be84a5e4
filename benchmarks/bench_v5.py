"""On-chip A/B: v3 (round-2 bench path) vs v5 (chunk-binned, fused
shading) on the bench scene — 1M-point uniform cloud, traj_ball dolly,
1080p, shaded.  The v5 cloud is Morton-sorted once on the host
(scene/spatial.py); the per-frame scan re-runs projection, chunk
binning, the (C*4)-slot sort, the superrow gather, and the fused
kernel+shade, exactly as bench.py's episode does for v3.

Usage: python benchmarks/bench_v5.py [--points N] [--frames F] [--what v3,v5]
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=1_000_000)
    ap.add_argument("--radius", type=float, default=0.002)
    ap.add_argument("--frames", type=int, default=110)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--what", default="v3,v5")
    ap.add_argument("--chunk-rows", type=int, default=32)
    ap.add_argument("--check-every", type=int, default=2)
    ap.add_argument("--unroll", type=int, default=2)
    ap.add_argument("--max-big", type=int, default=4096)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    import jax.numpy as jnp

    from pointcloud_render_tpu.raster import pallas_csr3, pallas_csr5
    from pointcloud_render_tpu.raster.primitives import (
        ScreenPrimitives,
        discs_from_points,
    )
    from pointcloud_render_tpu.raster.render import RasterConfig, ground_plane, render
    from pointcloud_render_tpu.scene.camera import (
        TARGETS,
        TOTAL_FRAMES,
        Camera,
        camera_origin_jax,
    )
    from pointcloud_render_tpu.scene.spatial import spatial_sort
    from pointcloud_render_tpu.utils import aot

    n = args.points
    rng = np.random.default_rng(0)
    pos_np = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    pos_sorted, _ = spatial_sort(pos_np)
    positions = jnp.asarray(pos_np)
    positions_m = jnp.asarray(pos_sorted)
    radii = jnp.full((n,), args.radius, jnp.float32)
    target = np.asarray(TARGETS["traj_ball"], np.float32)
    gray = np.array([0.3, 0.3, 0.3], np.float32)

    def make_camera(frame_index):
        return Camera(
            origin=camera_origin_jax("traj_ball", frame_index, TOTAL_FRAMES),
            target=target)

    def soup(camera, positions, radii):
        return ScreenPrimitives.concatenate([
            ground_plane(camera, 10.0, (0.0, 0.0, -0.5)),
            discs_from_points(positions, camera, radii, gray),
        ])

    cam0 = make_camera(jnp.int32(0))
    w, h = cam0.width, cam0.height
    # Probe the TIMED range (frames 0..frames-1), endpoints + quartiles.
    probe_frames = tuple(sorted({0, args.frames // 4, args.frames // 2,
                                 3 * args.frames // 4, args.frames - 1}))

    def time_episode(name, episode, *eargs):
        compiled = aot.compile_const_free(episode, *eargs)
        out = compiled(*eargs)
        float(np.asarray(out))
        times = []
        for _ in range(args.rounds):
            t0 = time.perf_counter()
            out = compiled(*eargs)
            float(np.asarray(out))
            times.append((time.perf_counter() - t0) / args.frames)
        dt = float(np.median(times))
        print(f"{name}: {dt * 1e3:.2f} ms/frame = {1.0 / dt:.1f} FPS "
              f"(rounds {[round(t * 1e3, 2) for t in times]})")
        return dt

    frames = jnp.arange(args.frames, dtype=jnp.int32)

    if "v3" in args.what:
        def probe3(fi):
            s = soup(make_camera(fi), positions, radii)
            return pallas_csr3.true_entry_count3(s, w, h)

        p3 = aot.compile_const_free(probe3, jnp.int32(0))
        ecs = [int(np.asarray(p3(jnp.int32(f)))) for f in probe_frames]
        ec3 = ((int(max(ecs) * 1.15) + 127) // 128) * 128
        print(f"# v3 entries {ecs} -> capacity {ec3}", file=sys.stderr)
        config = RasterConfig(backend="pallas3", no_triangles=True,
                              discs_only=True, entry_capacity=ec3)

        def episode3(positions, radii):
            def body(acc, fi):
                camera = make_camera(fi)
                fb = render(soup(camera, positions, radii), camera, config)
                c = (jnp.sum(jnp.where(jnp.isfinite(fb.depth), fb.depth, 0.0))
                     + jnp.sum(fb.rgb[::8, ::8]))
                return acc + c, None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), frames)
            return acc

        time_episode("v3", episode3, positions, radii)

    if "v5" in args.what:
        from pointcloud_render_tpu.shading.shade import ShadingConfig

        cfg = ShadingConfig()

        def probe5(fi):
            s = soup(make_camera(fi), positions_m, radii)
            return (pallas_csr5.true_entry_count5(s, w, h),
                    pallas_csr5.bin_diagnostics5(s, w, h,
                                                 max_big=args.max_big))

        p5 = aot.compile_const_free(probe5, jnp.int32(0))
        stats = [tuple(int(np.asarray(v)) for v in p5(jnp.int32(f)))
                 for f in probe_frames]
        ecs = [s[0] for s in stats]
        ovf = [s[1] for s in stats]
        print(f"# v5 chunk entries {ecs} big-overflow {ovf}", file=sys.stderr)
        assert max(ovf) == 0, f"v5 big-list overflow {ovf}"
        ec5 = ((int(max(ecs) * 1.15) + args.chunk_rows - 1)
               // args.chunk_rows) * args.chunk_rows
        print(f"# v5 capacity {ec5} superrows "
              f"({ec5 * 512 / 1e6:.0f} MB gathered/frame)", file=sys.stderr)

        def episode5(positions_m, radii):
            def body(acc, fi):
                camera = make_camera(fi)
                s = soup(camera, positions_m, radii)
                rgb, depth, _ = pallas_csr5.render_shaded_csr5(
                    s, camera, cfg, entry_capacity=ec5,
                    chunk_rows=args.chunk_rows,
                    check_every=args.check_every, unroll=args.unroll,
                    max_big=args.max_big, uniform_color=tuple(gray))
                c = (jnp.sum(jnp.where(jnp.isfinite(depth), depth, 0.0))
                     + jnp.sum(rgb[::8, ::8]))
                return acc + c, None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0), frames)
            return acc

        time_episode("v5", episode5, positions_m, radii)


if __name__ == "__main__":
    main()
