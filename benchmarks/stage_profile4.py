"""Stage budget of the v4 trail-scene frame (traj_ball, 100k pts, 1080p).

Cumulative stages (each includes the previous ones):
  build   — velocity trails + capsule/disc projection + soup concat
  bin     — + fixed-2x2 expansion + unstable (tile, zlb-bucket) sort
  rows    — + starts + 16-float entry row gather
  raster  — + the Pallas CSR v4 kernel (depth + idf image)
  shade   — + the fused prim-table shading (= the full frame)

Run: python benchmarks/stage_profile4.py [--points N] [--frame F]
"""
import sys, os, time, argparse
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from pointcloud_render_tpu.configs import PRESETS
from pointcloud_render_tpu.run.pipeline import build_primitives
from pointcloud_render_tpu.raster import pallas_csr4
from pointcloud_render_tpu.scene.camera import TARGETS, Camera, camera_origin_jax
from pointcloud_render_tpu.shading.shade import ShadingConfig
from pointcloud_render_tpu.utils import aot


def timed(name, fn, *a, reps=10):
    c = aot.compile_const_free(fn, *a)
    out = c(*a)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = c(*a)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=100_000)
    ap.add_argument("--frame", type=int, default=120)
    ap.add_argument("--unroll", type=int, default=4)
    ap.add_argument("--chunk-rows", type=int, default=512)
    args = ap.parse_args()

    preset = PRESETS["traj_ball"]
    rng = np.random.default_rng(0)
    n = args.points
    pos = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)), jnp.float32)
    vel = jnp.asarray(rng.normal(0, 2, (n, 3)), jnp.float32)
    fi = jnp.int32(args.frame)

    def make(p, v):
        cam = Camera(
            origin=camera_origin_jax(preset.camera_preset, fi,
                                     preset.total_frames),
            target=np.asarray(TARGETS[preset.camera_preset], np.float32),
            fov_x_degrees=preset.fov_x_degrees)
        return build_primitives(preset, cam, p, v, fi), cam

    soup0, cam0 = make(pos, vel)
    W, H = cam0.width, cam0.height
    th, tw = 32, 32
    tiles_y, tiles_x = -(-H // th), -(-W // tw)
    num_tiles = tiles_y * tiles_x
    ec = int(pallas_csr4.true_entry_count4(soup0, W, H))
    cap = ((int(ec * 1.15) + 127) // 128) * 128
    print(f"prims {soup0.count} entries {ec} cap {cap}", flush=True)

    def stage_build(p, v):
        soup, _ = make(p, v)
        return soup.params.sum()

    def stage_bin(p, v):
        soup, _ = make(p, v)
        sk, sp, bl, bc, _zm = pallas_csr4._bin_csr4(
            soup, th, tw, num_tiles, tiles_x, tiles_y)
        return sk[0] + sp[0] + bc

    def stage_rows(p, v):
        soup, _ = make(p, v)
        sk, sp, bl, bc, _zm = pallas_csr4._bin_csr4(
            soup, th, tw, num_tiles, tiles_x, tiles_y)
        zq = pallas_csr4._zq_bits(num_tiles)
        starts = jnp.searchsorted(
            sk, np.arange(num_tiles + 1, dtype=np.int32) << zq
        ).astype(jnp.int32)
        e = min(sp.shape[0], cap)
        sp = sp[:e]
        chunk = args.chunk_rows
        e_pad = -(-(e + chunk + pallas_csr4.PACK) // chunk) * chunk
        z3 = jnp.zeros((soup.count, 3), jnp.float32)
        zf = jnp.zeros((soup.count,), jnp.float32)
        table = pallas_csr4._build_table16(soup, z3, zf)
        prims_p = jnp.pad(sp, (0, e_pad - e), constant_values=soup.count)
        rows = table[prims_p]
        return rows.sum() + starts[0].astype(jnp.float32)

    def stage_raster(p, v):
        soup, _ = make(p, v)
        d, i = pallas_csr4.rasterize_pallas_csr4(
            soup, W, H, unroll=args.unroll, entry_capacity=cap,
            chunk_rows=args.chunk_rows)
        return jnp.sum(jnp.where(jnp.isfinite(d), d, 0.0))

    def stage_shade(p, v):
        soup, cam = make(p, v)
        rgb, d, i = pallas_csr4.render_shaded_csr4(
            soup, cam, ShadingConfig(), unroll=args.unroll,
            entry_capacity=cap, chunk_rows=args.chunk_rows)
        return (jnp.sum(jnp.where(jnp.isfinite(d), d, 0.0))
                + jnp.sum(rgb[::8, ::8]))

    t1 = timed("build (trails+project+concat)", stage_build, pos, vel)
    t2 = timed("+ bin (2x2 expand + unstable sort)", stage_bin, pos, vel)
    t3 = timed("+ starts + 16f row gather", stage_rows, pos, vel)
    t4 = timed("+ CSR v4 kernel", stage_raster, pos, vel)
    t5 = timed("+ fused shading (full frame)", stage_shade, pos, vel)
    print(f"\ndeltas: bin={1e3*(t2-t1):.1f} rows={1e3*(t3-t2):.1f} "
          f"kernel={1e3*(t4-t3):.1f} shade={1e3*(t5-t4):.1f} "
          f"total={1e3*t5:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
