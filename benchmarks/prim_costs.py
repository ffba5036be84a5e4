"""Measure the raw primitive costs that bound the rasterizer's stages.

Pipelined timing: dispatch `reps` calls back-to-back, fetch ONE scalar at
the end — per-call time excludes the dev tunnel's ~25 ms RTT.
Run: python benchmarks/prim_costs.py
"""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from pointcloud_render_tpu.utils import aot


def timed(name, fn, *a, reps=8):
    c = aot.compile_const_free(fn, *a)
    out = c(*a)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]))  # warm + sync
    t0 = time.perf_counter()
    for _ in range(reps):
        out = c(*a)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:46s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    for e in (1_000_000, 2_000_000, 4_000_000):
        keys = jnp.asarray(rng.integers(0, 30000, e), jnp.int16)
        pay = jnp.asarray(rng.integers(0, 1 << 20, e), jnp.int32)

        def sort_pair(k, p):
            ks, ps = jax.lax.sort((k, p), num_keys=1, is_stable=True)
            return ks[0].astype(jnp.int32) + ps[0]

        timed(f"sort int16 key + i32 payload  E={e//1000}k", sort_pair, keys, pay)

        k32 = jnp.asarray(rng.integers(0, 1 << 31, e), jnp.int32)

        def sort_single(k):
            return jax.lax.sort(k)[0]

        timed(f"sort single int32             E={e//1000}k", sort_single, k32)

        idx = jnp.asarray(rng.integers(0, e, e), jnp.int32)
        rows = jnp.asarray(rng.normal(size=(e, 16)), jnp.float32)

        def gather_rows(rows, idx):
            return rows[idx].sum()

        timed(f"gather (E,16) rows            E={e//1000}k", gather_rows, rows, idx)

        def gather_pad8(rows, idx):
            g = rows[idx]
            return g.reshape(e // 8, 128).sum()

        timed(f"gather+pack (E/8,128)         E={e//1000}k", gather_pad8, rows, idx)

        tid = jnp.asarray(rng.integers(0, 2048, e), jnp.int32)

        def bincount(t):
            return jnp.zeros((2049,), jnp.int32).at[t].add(1)[0]

        timed(f"scatter-add bincount->2k      E={e//1000}k", bincount, tid)


if __name__ == "__main__":
    main()
