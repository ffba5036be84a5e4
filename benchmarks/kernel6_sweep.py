"""Sweep the v6 kernel knobs on the 1M-disc bench frame.

The v6-disc kernel measured 18.3 ms where v3's was 8.6 on the same
pairs (stage_profile6) — sweep chunk_rows / allow_exit / unroll to
find where the overhead lives (exit-jump DMA drains, chunk-schedule
scalar work, or chunk size).

Run: python benchmarks/kernel6_sweep.py [--scene disc|trail]
"""
import argparse
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(name, fn, *a, reps=6):
    from pointcloud_render_tpu.utils import aot

    c = aot.compile_const_free(fn, *a)
    out = c(*a)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = c(*a)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:52s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="disc", choices=["disc", "trail"])
    ap.add_argument("--points", type=int, default=1_000_000)
    ap.add_argument("--frame", type=int, default=120)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

    from pointcloud_render_tpu.configs import PRESETS
    from pointcloud_render_tpu.raster import pallas_csr6
    from pointcloud_render_tpu.raster.primitives import (
        ScreenPrimitives,
        discs_from_points,
    )
    from pointcloud_render_tpu.raster.render import ground_plane
    from pointcloud_render_tpu.run.pipeline import build_primitives
    from pointcloud_render_tpu.scene.camera import (
        TARGETS,
        TOTAL_FRAMES,
        Camera,
        camera_origin_jax,
    )

    n = args.points
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)), jnp.float32)
    vel = jnp.asarray(rng.normal(0, 2, (n, 3)), jnp.float32)
    radii = jnp.full((n,), 0.002, jnp.float32)
    fi = jnp.int32(args.frame)
    discs_only = args.scene == "disc"
    max_big = 1024 if discs_only else 20480

    def make(p, v):
        cam = Camera(
            origin=camera_origin_jax("traj_ball", fi, TOTAL_FRAMES),
            target=np.asarray(TARGETS["traj_ball"], np.float32))
        if args.scene == "disc":
            soup = ScreenPrimitives.concatenate([
                ground_plane(cam, 10.0, (0.0, 0.0, -0.5)),
                discs_from_points(p, cam, radii,
                                  np.array([0.3, 0.3, 0.3], np.float32))])
        else:
            soup = build_primitives(PRESETS["traj_ball"], cam, p, v, fi)
        return soup, cam

    _, cam0 = make(pos, vel)
    W, H = cam0.width, cam0.height

    def raster(chunk_rows, allow_exit, unroll, dma_slots=2, span=2,
               mb=None, tpp=1, sm="scan"):
        def f(p, v):
            soup, _ = make(p, v)
            d, i = pallas_csr6.rasterize_pallas_csr6(
                soup, W, H, unroll=unroll, max_big=mb or max_big,
                discs_only=discs_only, chunk_rows=chunk_rows,
                allow_exit=allow_exit, dma_slots=dma_slots, span=span,
                tiles_per_program=tpp, starts_method=sm)
            return jnp.sum(jnp.where(jnp.isfinite(d), d, 0.0))

        return f

    for cr in (256, 512, 1024):
        for ex in (True, False):
            for un in (4,) if cr != 512 else (2, 4, 8):
                timed(f"chunk={cr} exit={int(ex)} unroll={un}",
                      raster(cr, ex, un), pos, vel)
    # DMA ring depth (exit-off fori path only) and span A/B.
    for ds in (3, 4, 8):
        timed(f"chunk=256 exit=0 unroll=4 dma_slots={ds}",
              raster(256, False, 4, dma_slots=ds), pos, vel)
    # span=4 needs a fraction of the big list (fade-frame trail
    # segments bin; 14052 -> 4 bigs at frame 219) — mb=384 also rides
    # the resident SMEM big path.
    timed("chunk=256 exit=0 unroll=4 span=4 mb=384",
          raster(256, False, 4, span=4, mb=384), pos, vel)
    # Grid fusion: several tiles per program amortize the per-grid-step
    # prologue/epilogue (the 2.4x chunk-overhead suspect list).
    for tpp in (2, 4, 8):
        timed(f"chunk=256 exit=0 unroll=4 tpp={tpp}",
              raster(256, False, 4, tpp=tpp), pos, vel)
    # starts stage: searchsorted method A/B in-frame (scan = default;
    # sort merges the bounds into the keys — see starts_probe.py).
    timed("chunk=256 exit=0 unroll=4 starts=sort",
          raster(256, False, 4, sm="sort"), pos, vel)
    if not discs_only:
        timed("chunk=256 exit=0 u=4 span=4 starts=sort",
              raster(256, False, 4, span=4, mb=max_big, sm="sort"),
              pos, vel)
        timed("chunk=256 exit=0 u=4 span=4 starts=scan",
              raster(256, False, 4, span=4, mb=max_big), pos, vel)
    if discs_only:
        # max_big <= 511 -> one chunk -> RESIDENT SMEM big list
        # (no per-tile big-DMA round-trip).
        timed("chunk=256 exit=0 unroll=4 max_big=256 (resident big)",
              raster(256, False, 4, mb=256), pos, vel)
        timed("chunk=256 exit=0 u=4 mb=256 dma_slots=4",
              raster(256, False, 4, dma_slots=4, mb=256), pos, vel)
        timed("chunk=256 exit=0 u=4 mb=256 tpp=4",
              raster(256, False, 4, mb=256, tpp=4), pos, vel)
        timed("chunk=256 exit=0 u=4 mb=256 tpp=4 dma_slots=4",
              raster(256, False, 4, mb=256, tpp=4, dma_slots=4),
              pos, vel)
        timed("chunk=512 exit=0 u=4 mb=256 tpp=4",
              raster(512, False, 4, mb=256, tpp=4), pos, vel)
        timed("chunk=256 exit=0 u=4 mb=256 tpp=8",
              raster(256, False, 4, mb=256, tpp=8), pos, vel)

        # Full shaded frame: generic by-id gather vs the FUSED (u, v)
        # two-tone epilogue (no per-pixel gather, no table repack).
        from pointcloud_render_tpu.shading.shade import ShadingConfig

        def shaded(uniform, unroll=4):
            look = (((0.3, 0.3, 0.3), (1.0, 1.0, 1.0))
                    if uniform else None)

            def f(p, v):
                soup, cam = make(p, v)
                rgb, d, i = pallas_csr6.render_shaded_csr6(
                    soup, cam, ShadingConfig(), discs_only=True,
                    max_big=256, unroll=unroll, uniform_look=look)
                return (jnp.sum(jnp.where(jnp.isfinite(d), d, 0.0))
                        + jnp.sum(rgb[::8, ::8]))

            return f

        timed("shaded mb=256 generic by-id gather", shaded(False),
              pos, vel)
        timed("shaded mb=256 FUSED uv two-tone", shaded(True), pos, vel)
        timed("shaded mb=256 FUSED uv unroll=2", shaded(True, 2),
              pos, vel)


if __name__ == "__main__":
    main()
