"""Sweep pallas_csr2 configs on the real chip at bench settings.

Run: python benchmarks/kernel_sweep.py [--points N]
"""
import sys, os, time, argparse, itertools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from pointcloud_render_tpu.raster.primitives import (
    ScreenPrimitives, discs_from_points)
from pointcloud_render_tpu.raster.render import ground_plane
from pointcloud_render_tpu.raster import pallas_csr, pallas_csr2
from pointcloud_render_tpu.scene.camera import Camera
from pointcloud_render_tpu.utils import aot

W, H = 1920, 1080


def timed(name, fn, *a, reps=6):
    try:
        c = aot.compile_const_free(fn, *a)
        out = c(*a)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = c(*a)
        chk = float(np.asarray(jax.tree_util.tree_leaves(out)[0]))
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:64s} {dt * 1e3:8.2f} ms  chk={chk:.6e}", flush=True)
        return dt
    except Exception as e:
        print(f"{name:64s} FAILED {type(e).__name__}: {str(e)[:120]}",
              flush=True)
        return None


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

    def build(p, r):
        return ScreenPrimitives.concatenate([
            ground_plane(camera, 10.0, (0., 0., -0.5)),
            discs_from_points(p, camera, r, np.array([.3, .3, .3], np.float32)),
        ])

    soup = build(pos, rad)
    ec = int(pallas_csr2.true_entry_count(soup, W, H,
                                          max_tiles_per_prim=args.mtp,
                                          no_triangles=True))
    cap = ((int(ec * 1.25) + 127) // 128) * 128
    print(f"true entries: {ec}  capacity(1.25x): {cap}", flush=True)

    def v1(p, r):
        s = build(p, r)
        d, i = pallas_csr.rasterize_pallas_csr(
            s, W, H, max_tiles_per_prim=args.mtp, no_triangles=True)
        return jnp.sum(jnp.where(jnp.isfinite(d), d, 0.0))

    timed("v1 baseline (mtp=4 no_triangles)", v1, pos, rad)

    def v2(p, r, **kw):
        s = build(p, r)
        d, i = pallas_csr2.rasterize_pallas_csr2(
            s, W, H, max_tiles_per_prim=args.mtp, **kw)
        return jnp.sum(jnp.where(jnp.isfinite(d), d, 0.0))

    import functools
    configs = [
        dict(discs_only=True, chunk_rows=128, entry_capacity=cap),
        dict(discs_only=True, chunk_rows=128, unroll=2, entry_capacity=cap),
        dict(discs_only=True, chunk_rows=128, unroll=4, entry_capacity=cap),
        dict(discs_only=True, chunk_rows=256, unroll=4, entry_capacity=cap),
        dict(no_triangles=True, chunk_rows=128, unroll=2, entry_capacity=cap),
        dict(no_triangles=True, chunk_rows=128, unroll=4, entry_capacity=cap),
        dict(discs_only=True, chunk_rows=128, unroll=8, entry_capacity=cap),
    ]

    for kw in configs:
        name = "v2 " + " ".join(f"{k}={v}" for k, v in kw.items()
                                if not isinstance(v, bool) or v)
        timed(name, functools.partial(v2, **kw), pos, rad)


if __name__ == "__main__":
    main()
