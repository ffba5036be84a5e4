"""Microprofile of the binning stage: expansion vs sort vs sort flavors.

Run: python benchmarks/bin_profile.py [--points N] [--mtp M]
"""
import sys, os, time, argparse
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from pointcloud_render_tpu.raster.primitives import (
    ScreenPrimitives, discs_from_points)
from pointcloud_render_tpu.raster.render import ground_plane
from pointcloud_render_tpu.raster import pallas_csr
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
    print(f"{name:48s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=1_000_000)
    ap.add_argument("--mtp", type=int, default=4)
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

    def expand(p, r):
        """Everything in _bin_csr up to (flat_key, flat_prims)."""
        prims = build(p, r)
        pp = prims.count
        xmin, xmax = prims.bbox[:, 0], prims.bbox[:, 1]
        ymin, ymax = prims.bbox[:, 2], prims.bbox[:, 3]
        tx0 = jnp.clip(jnp.floor(xmin / 128).astype(jnp.int32), 0, tiles_x - 1)
        tx1 = jnp.clip(jnp.floor(xmax / 128).astype(jnp.int32), 0, tiles_x - 1)
        ty0 = jnp.clip(jnp.floor(ymin / 8).astype(jnp.int32), 0, tiles_y - 1)
        ty1 = jnp.clip(jnp.floor(ymax / 8).astype(jnp.int32), 0, tiles_y - 1)
        ntx = tx1 - tx0 + 1
        nty = ty1 - ty0 + 1
        span = ntx * nty
        is_big = (span > mtp) & prims.valid
        is_big |= (prims.kind != 0) & prims.valid
        is_small = prims.valid & ~is_big

        slot = np.arange(mtp, dtype=np.int32)[None, :]
        ex = slot % ntx[:, None]
        ey = slot // ntx[:, None]
        slot_ok = (slot < span[:, None]) & is_small[:, None]
        tile_id = (ty0[:, None] + ey) * tiles_x + (tx0[:, None] + ex)
        tile_id = jnp.where(slot_ok, tile_id, num_tiles)
        prim_id = jnp.broadcast_to(np.arange(pp, dtype=np.int32)[:, None],
                                   tile_id.shape)
        hint = prims.params[:, 2]
        bucket, _ = pallas_csr._depth_buckets(hint, is_small | is_big)
        flat_key = (tile_id * pallas_csr.N_BUCKETS
                    + bucket[:, None]).reshape(-1)
        flat_key = jnp.where(tile_id.reshape(-1) >= num_tiles,
                             num_tiles * pallas_csr.N_BUCKETS, flat_key)
        return flat_key, prim_id.reshape(-1)

    def stage_expand(p, r):
        k, pr = expand(p, r)
        return k[0] + pr[0]

    def sort_stable(p, r):
        k, pr = expand(p, r)
        k16, sp = jax.lax.sort((k.astype(jnp.int16), pr), num_keys=1,
                               is_stable=True)
        return k16[0].astype(jnp.int32) + sp[0]

    def sort_unstable(p, r):
        k, pr = expand(p, r)
        k16, sp = jax.lax.sort((k.astype(jnp.int16), pr), num_keys=1,
                               is_stable=False)
        return k16[0].astype(jnp.int32) + sp[0]

    def sort_i32_stable(p, r):
        k, pr = expand(p, r)
        ks, sp = jax.lax.sort((k, pr), num_keys=1, is_stable=True)
        return ks[0] + sp[0]

    def sort_packed_unstable(p, r):
        """Pack (key16, prim) into ONE i32 sort key: key in high bits, prim
        in low bits -> single-operand sort; unpacking is free shifts.
        Stability for free: equal keys order by prim id ascending."""
        k, pr = expand(p, r)
        # key < 2026*16 = 32416 -> 15 bits; prim < 2^24 -> need 24 bits.
        # 15+24 > 32: pack into int64? TPU i64 sort unsupported-ish.
        # Instead sort (k16 as key, pr payload) is the comparison.
        packed = k.astype(jnp.int64) * (1 << 24) + pr.astype(jnp.int64)
        s = jax.lax.sort(packed, is_stable=False)
        return (s[0] % (1 << 24)).astype(jnp.int32)

    timed("build+expand only", stage_expand, pos, rad)
    timed("expand + sort i16 stable (current)", sort_stable, pos, rad)
    timed("expand + sort i16 UNstable", sort_unstable, pos, rad)
    timed("expand + sort i32 stable", sort_i32_stable, pos, rad)
    try:
        timed("expand + sort packed i64 unstable", sort_packed_unstable,
              pos, rad)
    except Exception as e:
        print(f"packed i64: FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
