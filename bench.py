"""Benchmark harness: 1080p frames/sec at 1M points on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is the ratio against the 500 FPS/chip north-star target
(BASELINE.md; the reference publishes no numbers of its own).

Scene: 1M-point uniform cloud in the unit box viewed by the traj_ball
camera at frame 120, world radius 0.002 (~2.5 px splats — a dense
LiDAR-viewer-style workload), full shading, deterministic z-buffer.
Backend: the fastest available for this platform ("auto").

Usage: python bench.py [--points N] [--backend auto] [--radius R]
"""

import argparse
import json
import sys
import time

import numpy as np

TARGET_FPS = 500.0  # BASELINE.md north star


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=1_000_000)
    ap.add_argument("--backend", default="auto")
    ap.add_argument("--radius", type=float, default=0.002)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--max-per-tile", type=int, default=4096)
    ap.add_argument("--max-tiles-per-prim", type=int, default=4)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    import jax  # noqa: F401
    import jax.numpy as jnp

    from pointcloud_render_tpu.raster.primitives import discs_from_points
    from pointcloud_render_tpu.raster.render import (
        RasterConfig,
        ground_plane,
        render,
    )
    from pointcloud_render_tpu.raster.primitives import ScreenPrimitives
    from pointcloud_render_tpu.scene.camera import Camera
    from pointcloud_render_tpu.utils import aot

    n = args.points
    rng = np.random.default_rng(0)
    positions = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)), jnp.float32)
    radii = jnp.full((n,), args.radius, jnp.float32)
    camera = Camera(
        origin=jnp.asarray(np.array([2.0, 2.0, 2.0], np.float32)),
        target=jnp.asarray(np.array([0.0, 0.0, -0.05], np.float32)))
    config = RasterConfig(backend=args.backend,
                          max_per_tile=args.max_per_tile,
                          max_tiles_per_prim=args.max_tiles_per_prim,
                          no_triangles=True)  # bench scene: discs + big-list ground

    def frame(positions, radii):
        prims = ScreenPrimitives.concatenate([
            ground_plane(camera, 10.0, (0.0, 0.0, -0.5)),
            discs_from_points(positions, camera, radii,
                              np.array([0.3, 0.3, 0.3], np.float32)),
        ])
        fb = render(prims, camera, config)
        # Scalar checksum: fetching it forces the whole program to finish
        # (block_until_ready on lazy axon buffers is NOT a reliable fence).
        checksum = jnp.sum(jnp.where(jnp.isfinite(fb.depth), fb.depth, 0.0))
        return fb.rgb, fb.depth, checksum

    compiled = aot.compile_const_free(frame, positions, radii)

    out = compiled(positions, radii)  # warmup
    float(np.asarray(out[2]))

    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        out = compiled(positions, radii)
        float(np.asarray(out[2]))
        times.append(time.perf_counter() - t0)
    rgb, depth = out[0], out[1]
    dt = float(np.median(times))
    fps = 1.0 / dt

    if args.verbose:
        hit = float((np.asarray(depth) < np.inf).mean())
        print(f"# backend={args.backend} platform={jax.default_backend()} "
              f"median={dt * 1e3:.2f}ms hit_frac={hit:.3f} "
              f"splats/s={n * fps:.3e}", file=sys.stderr)

    print(json.dumps({
        "metric": f"1080p_fps_{n // 1000}k_points",
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / TARGET_FPS, 4),
    }))


if __name__ == "__main__":
    main()
