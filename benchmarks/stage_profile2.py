"""Stage budget of the pallas_csr2 bench frame (1M pts, 1080p, disc path).

Cumulative stages (each includes the previous ones), matching the exact
bench.py configuration (discs_only, unroll=4, measured entry capacity):
  build   — project discs + ground, concat soup
  bin     — + entry expansion + (tile,bucket) key sort
  rows    — + searchsorted starts + capacity-prefix 8-float row gather
  raster  — + the Pallas CSR v2 kernel
  shade   — + the shading resolve (= the full bench frame)

Pipelined timing (dispatch reps, fetch one scalar) excludes the tunnel RTT.
Run: python benchmarks/stage_profile2.py [--points N] [--mtp M]
"""
import sys, os, time, argparse
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from pointcloud_render_tpu.raster.primitives import (
    ScreenPrimitives, discs_from_points)
from pointcloud_render_tpu.raster.render import RasterConfig, ground_plane, render
from pointcloud_render_tpu.raster import pallas_csr, pallas_csr2
from pointcloud_render_tpu.scene.camera import Camera
from pointcloud_render_tpu.utils import aot

W, H = 1920, 1080


def timed(name, fn, *a, reps=10):
    c = aot.compile_const_free(fn, *a)
    out = c(*a)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = c(*a)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=1_000_000)
    ap.add_argument("--mtp", type=int, default=4)
    ap.add_argument("--unroll", type=int, default=4)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    camera = Camera(origin=jnp.asarray(np.array([2., 2., 2.], np.float32)),
                    target=jnp.asarray(np.array([0., 0., -0.05], np.float32)))
    n = args.points
    pos = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)), jnp.float32)
    rad = jnp.full((n,), 0.002, jnp.float32)
    mtp = args.mtp
    tiles_y, tiles_x = -(-H // 8), -(-W // 128)
    num_tiles = tiles_y * tiles_x

    def build(p, r):
        return ScreenPrimitives.concatenate([
            ground_plane(camera, 10.0, (0., 0., -0.5)),
            discs_from_points(p, camera, r, np.array([.3, .3, .3], np.float32)),
        ])

    soup0 = build(pos, rad)
    ec = int(pallas_csr2.true_entry_count(
        soup0, W, H, max_tiles_per_prim=mtp, no_triangles=True))
    cap = ((int(ec * 1.1) + 127) // 128) * 128
    print(f"true entries {ec}, capacity {cap}", flush=True)

    def stage_build(p, r):
        soup = build(p, r)
        return soup.params.sum()

    def stage_bin(p, r):
        soup = build(p, r)
        sk, sp, bl, bc, _ = pallas_csr._bin_csr(
            soup, W, H, 8, 128, mtp, 1024, num_tiles, tiles_x, tiles_y,
            force_tri_big=True, force_capsule_big=True)
        return sk[0] + sp[0] + bc

    def stage_rows(p, r):
        soup = build(p, r)
        sk, sp, bl, bc, blow = pallas_csr._bin_csr(
            soup, W, H, 8, 128, mtp, 1024, num_tiles, tiles_x, tiles_y,
            force_tri_big=True, force_capsule_big=True)
        starts = jnp.searchsorted(
            sk, np.arange(num_tiles + 1, dtype=np.int32)
            * pallas_csr.N_BUCKETS).astype(jnp.int32)
        e = min(sp.shape[0], cap)
        sp = sp[:e]
        sk = sk[:e]
        chunk = pallas_csr2.DEFAULT_CHUNK_ROWS
        e_pad = -(-(e + chunk + 16) // chunk) * chunk
        rows = pallas_csr2._pack_rows_disc(soup, sp, sk, blow, e_pad)
        return rows.sum() + starts[0].astype(jnp.float32)

    def stage_raster(p, r):
        soup = build(p, r)
        d, i = pallas_csr2.rasterize_pallas_csr2(
            soup, W, H, max_tiles_per_prim=mtp, discs_only=True,
            unroll=args.unroll, entry_capacity=cap)
        return jnp.sum(jnp.where(jnp.isfinite(d), d, 0.0))

    def stage_shade(p, r):
        soup = build(p, r)
        cfg = RasterConfig(backend="pallas", max_tiles_per_prim=mtp,
                           no_triangles=True, discs_only=True,
                           unroll=args.unroll, entry_capacity=cap)
        fb = render(soup, camera, cfg)
        return jnp.sum(jnp.where(jnp.isfinite(fb.depth), fb.depth, 0.0))

    t1 = timed("build+project", stage_build, pos, rad)
    t2 = timed("+ bin (expand+sort)", stage_bin, pos, rad)
    t3 = timed("+ starts + row gather/pack", stage_rows, pos, rad)
    t4 = timed("+ CSR v2 kernel", stage_raster, pos, rad)
    t5 = timed("+ shading (full frame)", stage_shade, pos, rad)
    print(f"\ndeltas: bin={1e3*(t2-t1):.1f} rows={1e3*(t3-t2):.1f} "
          f"kernel={1e3*(t4-t3):.1f} shade={1e3*(t5-t4):.1f} "
          f"total={1e3*t5:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
