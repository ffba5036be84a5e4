"""searchsorted-method A/B for the v6 ``starts`` stage.

starts = searchsorted(sorted_keys, consecutive (anchor, cls) bounds).
jnp's default method='scan' costs ~320 ns/bound (v6_probe, 8161 bounds
-> 2.6 ms); span=4 quadruples tiles' class count (32k bounds at 1080p).
method='sort' instead merges bounds into the keys with one extra sort
(O((P+B) log) vs O(B log P) gathers) — which wins depends on P vs B.
All methods return identical indices (integer searchsorted, side
'left'), so this is a pure perf knob.

Run on the TPU: python benchmarks/starts_probe.py
"""
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(name, fn, *a, reps=8):
    from pointcloud_render_tpu.utils import aot

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
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    rng = np.random.default_rng(0)
    ZQ = 8
    for p in (1_000_000, 9_000_000):
        # Sorted v6-like keys: (anchor*cls_count + cls) << ZQ | qz.
        for nb in (8161, 32641):
            hi = (nb - 1) << ZQ
            keys = jnp.asarray(np.sort(rng.integers(0, hi, p)), jnp.int32)
            bounds = jnp.asarray(np.arange(nb, dtype=np.int32) << ZQ)

            for method in ("scan", "sort", "scan_unrolled"):
                def f(k, b, method=method):
                    return jnp.searchsorted(k, b, method=method)[0]

                timed(f"P={p//1000}k B={nb} method={method}", f, keys,
                      bounds)


if __name__ == "__main__":
    main()
