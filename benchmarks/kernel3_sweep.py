"""Sweep pallas_csr3 configs on the real chip at bench settings.

Run: python benchmarks/kernel3_sweep.py [--points N]
"""
import sys, os, time, argparse, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from pointcloud_render_tpu.raster.primitives import (
    ScreenPrimitives, discs_from_points)
from pointcloud_render_tpu.raster.render import ground_plane
from pointcloud_render_tpu.raster import pallas_csr2, pallas_csr3
from pointcloud_render_tpu.scene.camera import Camera
from pointcloud_render_tpu.utils import aot

W, H = 1920, 1080


def timed(name, fn, *a, reps=10):
    try:
        c = aot.compile_const_free(fn, *a)
        out = c(*a)
        chk0 = float(np.asarray(jax.tree_util.tree_leaves(out)[0]))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = c(*a)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]))
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:56s} {dt * 1e3:8.2f} ms  chk={chk0:.6e}", flush=True)
        return dt
    except Exception as e:
        print(f"{name:56s} FAILED {type(e).__name__}: {str(e)[:140]}",
              flush=True)
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=1_000_000)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    camera = Camera(origin=jnp.asarray(np.array([2., 2., 2.], np.float32)),
                    target=jnp.asarray(np.array([0., 0., -0.05], np.float32)))
    n = args.points
    pos = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)), jnp.float32)
    rad = jnp.full((n,), 0.002, jnp.float32)

    def build(p, r):
        return ScreenPrimitives.concatenate([
            ground_plane(camera, 10.0, (0., 0., -0.5)),
            discs_from_points(p, camera, r, np.array([.3, .3, .3], np.float32)),
        ])

    soup = build(pos, rad)
    ec2 = int(pallas_csr2.true_entry_count(soup, W, H, max_tiles_per_prim=4,
                                           no_triangles=True))
    cap2 = ((int(ec2 * 1.1) + 127) // 128) * 128
    caps = {}
    for th, tw in ((8, 128), (32, 32), (16, 64)):
        ec = int(pallas_csr3.true_entry_count3(soup, W, H, tile_h=th,
                                               tile_w=tw))
        caps[(th, tw)] = ((int(ec * 1.1) + 127) // 128) * 128
        print(f"v3 {th}x{tw}: entries {ec} cap {caps[th, tw]}", flush=True)
    cap3 = caps[(8, 128)]
    print(f"v2 entries {ec2} cap {cap2}", flush=True)

    def v2(p, r):
        s = build(p, r)
        d, i = pallas_csr2.rasterize_pallas_csr2(
            s, W, H, max_tiles_per_prim=4, discs_only=True, unroll=4,
            entry_capacity=cap2)
        return jnp.sum(jnp.where(jnp.isfinite(d), d, 0.0)) + jnp.sum(i % 97)

    timed("v2 discs_only unroll=4 cap (bench config)", v2, pos, rad)

    def v3(p, r, **kw):
        s = build(p, r)
        d, i = pallas_csr3.rasterize_pallas_csr3(s, W, H, **kw)
        return jnp.sum(jnp.where(jnp.isfinite(d), d, 0.0)) + jnp.sum(i % 97)

    for kw in (
        dict(unroll=4, entry_capacity=cap3),
        dict(unroll=8, entry_capacity=cap3),
        dict(unroll=4, entry_capacity=cap3, chunk_rows=256),
        dict(unroll=4, entry_capacity=cap3, chunk_rows=128),
        dict(unroll=8, entry_capacity=cap3, chunk_rows=256),
        dict(unroll=4, tile_h=32, tile_w=32, entry_capacity=caps[32, 32]),
        dict(unroll=4, tile_h=32, tile_w=32, entry_capacity=caps[32, 32],
             chunk_rows=256),
        dict(unroll=4, tile_h=16, tile_w=64, entry_capacity=caps[16, 64]),
    ):
        name = "v3 " + " ".join(f"{k}={v}" for k, v in kw.items())
        timed(name, functools.partial(v3, **kw), pos, rad)


if __name__ == "__main__":
    main()
