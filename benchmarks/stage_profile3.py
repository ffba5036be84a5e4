"""Stage budget of the pallas_csr3 bench frame (1M pts, 1080p, disc path).

Cumulative stages (each includes the previous ones), matching bench.py's
v3 configuration (fused shading, measured entry capacity):
  build   — project discs + ground, concat soup
  bin     — + fixed-2x2 entry expansion + tile-key sort
  rows    — + searchsorted starts + capacity-prefix 8-float row pack
  raster  — + the Pallas CSR v3 kernel (depth + entry image)
  shade   — + the fused winner-attribute shading (= the full bench frame)

Pipelined timing (dispatch reps, fetch one scalar) excludes the tunnel RTT.
Run: python benchmarks/stage_profile3.py [--points N]
"""
import sys, os, time, argparse
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from pointcloud_render_tpu.raster.primitives import (
    ScreenPrimitives, discs_from_points)
from pointcloud_render_tpu.raster.render import RasterConfig, ground_plane, render
from pointcloud_render_tpu.raster import pallas_csr3
from pointcloud_render_tpu.scene.camera import Camera
from pointcloud_render_tpu.shading.shade import ShadingConfig
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
    ap.add_argument("--unroll", type=int, default=4)
    ap.add_argument("--chunk-rows", type=int, default=512)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    camera = Camera(origin=jnp.asarray(np.array([2., 2., 2.], np.float32)),
                    target=jnp.asarray(np.array([0., 0., -0.05], np.float32)))
    n = args.points
    pos = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)), jnp.float32)
    rad = jnp.full((n,), 0.002, jnp.float32)
    th, tw = 8, 128
    tiles_y, tiles_x = -(-H // th), -(-W // tw)
    num_tiles = tiles_y * tiles_x

    def build(p, r):
        return ScreenPrimitives.concatenate([
            ground_plane(camera, 10.0, (0., 0., -0.5)),
            discs_from_points(p, camera, r, np.array([.3, .3, .3], np.float32)),
        ])

    soup0 = build(pos, rad)
    ec = int(pallas_csr3.true_entry_count3(soup0, W, H))
    cap = ((int(ec * 1.1) + 127) // 128) * 128
    print(f"true entries {ec}, capacity {cap}", flush=True)

    def stage_build(p, r):
        soup = build(p, r)
        return soup.params.sum()

    def stage_bin(p, r):
        soup = build(p, r)
        sk, sp, bl, bc, _zs = pallas_csr3._bin_csr_2x2(
            soup, th, tw, num_tiles, tiles_x, tiles_y)
        return sk[0] + sp[0] + bc

    def stage_rows(p, r):
        soup = build(p, r)
        sk, sp, bl, bc, _zs = pallas_csr3._bin_csr_2x2(
            soup, th, tw, num_tiles, tiles_x, tiles_y)
        starts = jnp.searchsorted(
            sk, np.arange(num_tiles + 1, dtype=np.int32)).astype(jnp.int32)
        e = min(sp.shape[0], cap)
        sp = sp[:e]
        chunk = args.chunk_rows
        e_pad = -(-(e + chunk + pallas_csr3.PACK) // chunk) * chunk
        z3 = jnp.zeros((soup.count, 3), jnp.float32)
        zf = jnp.zeros((soup.count,), jnp.float32)
        rows = pallas_csr3._pack_rows8(soup, sp, e_pad, bl, z3, zf,
                                       (0., 0., 0.))
        return rows.sum() + starts[0].astype(jnp.float32)

    def stage_raster(p, r):
        soup = build(p, r)
        d, i = pallas_csr3.rasterize_pallas_csr3(
            soup, W, H, unroll=args.unroll, entry_capacity=cap,
            chunk_rows=args.chunk_rows)
        return jnp.sum(jnp.where(jnp.isfinite(d), d, 0.0))

    def stage_shade(p, r):
        soup = build(p, r)
        rgb, d, i = pallas_csr3.render_shaded_csr3(
            soup, camera, ShadingConfig(), unroll=args.unroll,
            entry_capacity=cap, chunk_rows=args.chunk_rows)
        return (jnp.sum(jnp.where(jnp.isfinite(d), d, 0.0))
                + jnp.sum(rgb[::8, ::8]))

    t1 = timed("build+project", stage_build, pos, rad)
    t2 = timed("+ bin (2x2 expand+sort)", stage_bin, pos, rad)
    t3 = timed("+ starts + row pack", stage_rows, pos, rad)
    t4 = timed("+ CSR v3 kernel (depth+ent)", stage_raster, pos, rad)
    t5 = timed("+ fused shading (full frame)", stage_shade, pos, rad)
    print(f"\ndeltas: bin={1e3*(t2-t1):.1f} rows={1e3*(t3-t2):.1f} "
          f"kernel={1e3*(t4-t3):.1f} shade={1e3*(t5-t4):.1f} "
          f"total={1e3*t5:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
