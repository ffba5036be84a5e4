"""Measure the v6 (anchor-sorted binning) hypothesis pieces on-chip.

v6 replaces the 4-slot entry expansion + (4P int16 key, 4P i32 payload)
sort with a per-PRIM sort of (P int32 keys, P i32 payload) and a
5-range CSR per tile.  Before building the kernel, measure on the real
chip:

  1. lax.sort at both shapes and scales (1M disc bench, 9M trail soup);
  2. the row gather at entry-count vs prim-count, 32 B vs 64 B rows;
  3. searchsorted for 8161 (tile, class) boundaries + the key build.

Tunnel discipline (CLAUDE.md): each measurement runs ITERS times inside
one jitted fori_loop with a data dependency, returns a SCALAR checksum
(fetched to host), and the per-iter time subtracts a measured empty-loop
dispatch baseline.

Run: python benchmarks/v6_probe.py
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

ITERS = 8


def timed(name, body, *args, reps=3):
    """body(carry_scalar, *args) -> scalar; looped ITERS times in-jit."""

    def looped(*a):
        def step(i, acc):
            return body(acc, *a)

        return jax.lax.fori_loop(0, ITERS, step, jnp.float32(0.0))

    c = jax.jit(looped)
    float(np.asarray(c(*args)))  # compile + warm
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(c(*args)))
        best = min(best, time.perf_counter() - t0)
    return name, best


def main():
    rng = np.random.default_rng(0)

    # Dispatch + empty-loop baseline (RTT).
    _, base = timed("base", lambda acc: acc + 1.0)
    print(f"# dispatch baseline {base * 1e3:.2f} ms", file=sys.stderr)

    def report(name, total):
        dt = (total - base) / ITERS * 1e3
        print(f"{name:44s} {dt:8.2f} ms", file=sys.stderr)

    for p in (1_000_000, 9_000_000):
        tag = f"{p // 10**6}M"
        k16 = jnp.asarray(rng.integers(0, 32000, 4 * p), jnp.int16)
        pay4 = jnp.asarray(np.arange(4 * p, dtype=np.int32))
        k32 = jnp.asarray(rng.integers(0, 8160 * 256, p), jnp.int32)
        pay1 = jnp.asarray(np.arange(p, dtype=np.int32))

        def sort4(acc, k, v):
            kk = (k + acc.astype(jnp.int16)).astype(jnp.int16)
            sk, sv = jax.lax.sort((kk, v), num_keys=1, is_stable=False)
            return acc + sv[0].astype(jnp.float32) * 1e-9

        report(f"sort {4 * p // 10**6}M i16+i32 (v3/v4)",
               timed("s4", sort4, k16, pay4)[1])

        def sort1(acc, k, v):
            sk, sv = jax.lax.sort((k + acc.astype(jnp.int32), v),
                                  num_keys=1, is_stable=False)
            return acc + sv[0].astype(jnp.float32) * 1e-9

        report(f"sort {p // 10**6}M i32+i32 (v6)",
               timed("s1", sort1, k32, pay1)[1])

        e = int(1.2 * p)
        table8 = jnp.asarray(rng.normal(size=(p + 1, 8)), jnp.float32)
        table16 = jnp.asarray(rng.normal(size=(p + 1, 16)), jnp.float32)
        idx_e = jnp.asarray(rng.integers(0, p, e), jnp.int32)
        idx_p = jnp.asarray(rng.permutation(p).astype(np.int32))
        loc = np.clip(np.arange(p) + rng.integers(-64, 64, p), 0, p - 1)
        idx_l = jnp.asarray(loc.astype(np.int32))

        def gath(acc, t, i):
            g = t[i + (acc > 1e30).astype(jnp.int32)]
            return acc + g[0, 0] * 1e-9

        report(f"gather {e / 10**6:.1f}M x 32B (v3 rows)",
               timed("g", gath, table8, idx_e)[1])
        report(f"gather {e / 10**6:.1f}M x 64B (v4 rows)",
               timed("g", gath, table16, idx_e)[1])
        report(f"gather {p / 10**6:.1f}M x 64B perm (v6)",
               timed("g", gath, table16, idx_p)[1])
        report(f"gather {p / 10**6:.1f}M x 64B near-id",
               timed("g", gath, table16, idx_l)[1])

        # r5: decompose the cap10 rows stage (99 ms at the 6M-prim
        # droplet frame = 16.5 ns/row vs the 9.7 ns/row bare-gather
        # probe above): bare 40 B gather, + the packed (p/12, 120)
        # reshape, + the 128-lane pad — is the pack relayout or the
        # gather the cost?
        table10 = jnp.asarray(rng.normal(size=(p + 1, 10)), jnp.float32)
        pk = 12
        p_pad = -(-p // pk) * pk
        idx_pp = jnp.asarray(
            np.pad(np.asarray(idx_p), (0, p_pad - p),
                   constant_values=p).astype(np.int32))

        def gath10(acc, t, i):
            g = t[i + (acc > 1e30).astype(jnp.int32)]
            return acc + g[0, 0] * 1e-9

        def gath10_pack(acc, t, i):
            g = t[i + (acc > 1e30).astype(jnp.int32)]
            r = g.reshape(p_pad // pk, pk * 10)
            return acc + r[0, 0] * 1e-9

        def gath10_pad(acc, t, i):
            g = t[i + (acc > 1e30).astype(jnp.int32)]
            r = g.reshape(p_pad // pk, pk * 10)
            r = jnp.pad(r, ((0, 0), (0, 128 - pk * 10)))
            return acc + r[0, 0] * 1e-9

        report(f"gather {p / 10**6:.1f}M x 40B (cap10 bare)",
               timed("g", gath10, table10, idx_pp)[1])
        report(f"gather {p / 10**6:.1f}M x 40B + pack reshape",
               timed("g", gath10_pack, table10, idx_pp)[1])
        report(f"gather {p / 10**6:.1f}M x 40B + pack + pad128",
               timed("g", gath10_pad, table10, idx_pp)[1])

        # r5b: cap8 candidate lanes.  The r5 decomposition above showed
        # 40 B and 64 B rows gather at the same ~11 ns/row while 32 B
        # rows ran 6.6 ns/row (XLA gathers in 32 B granules) — so an
        # 8-float capsule row [x0, y0, ux, uy, rho0, rhod, z0, sdz]
        # (idf rides the sort payload, which is ALREADY contiguous in
        # sorted order) would roughly halve the rows stage.  Measure:
        # the 32 B gather at the real v6 perm pattern, the pad-FREE
        # (p/16, 128) pack (128 = 16 x 8 exactly), and the no-gather
        # alternative of carrying all 8 columns through lax.sort.
        p16 = -(-p // 16) * 16
        idx_p16 = jnp.asarray(
            np.pad(np.asarray(idx_p), (0, p16 - p),
                   constant_values=p).astype(np.int32))

        def gath8(acc, t, i):
            g = t[i + (acc > 1e30).astype(jnp.int32)]
            return acc + g[0, 0] * 1e-9

        def gath8_pack(acc, t, i):
            g = t[i + (acc > 1e30).astype(jnp.int32)]
            r = g.reshape(p16 // 16, 128)
            return acc + r[0, 0] * 1e-9

        report(f"gather {p / 10**6:.1f}M x 32B perm (cap8)",
               timed("g", gath8, table8, idx_p16)[1])
        report(f"gather {p / 10**6:.1f}M x 32B + pack reshape",
               timed("g", gath8_pack, table8, idx_p16)[1])

        cols8 = tuple(jnp.asarray(rng.normal(size=p), jnp.float32)
                      for _ in range(8))

        def sortw(acc, k, v, *cols):
            # Checksum EVERY carried column: XLA prunes unused sort
            # operands, so a single-column dependency measures a 2-op
            # sort in disguise.
            s = jax.lax.sort((k + acc.astype(jnp.int32), v) + cols,
                             num_keys=1, is_stable=False)
            c = s[1].astype(jnp.float32)[0]
            for t in s[2:]:
                c = c + t[0]
            return acc + c * 1e-9

        report(f"sort {p // 10**6}M i32+i32+8xf32 (carried rows)",
               timed("sw", sortw, k32, pay1, *cols8)[1])

        # The full sort-carried replacement of the rows stage: split a
        # prebuilt (P, 8) table into columns, carry them through the
        # sort, re-interleave into the rows8 packed layout + idf lanes.
        # Compare against (32 B gather + pack) above.
        p128 = -(-p // 128) * 128  # the pack needs whole 128-entry groups

        def sortw_pack(acc, k, t):
            cols = tuple(t[:, j] for j in range(8))
            s = jax.lax.sort((k + acc.astype(jnp.int32),
                              jnp.arange(p128, dtype=jnp.int32)) + cols,
                             num_keys=1, is_stable=False)
            g = jnp.stack(s[2:], axis=1).reshape(p128 // 128, 8, 128)
            idf = s[1].astype(jnp.float32).reshape(p128 // 128, 1, 128)
            r = jnp.concatenate([g, idf], axis=1).reshape(-1, 128)
            return acc + r[0, 0] * 1e-9

        k32p = jnp.pad(k32, (0, p128 - p))
        t8 = jnp.asarray(rng.normal(size=(p128, 8)), jnp.float32)
        report(f"sort-carried rows8 stage {p / 10**6:.1f}M (sort+pack)",
               timed("swp", sortw_pack, k32p, t8)[1])

        ks = jnp.sort(k32)
        bounds = jnp.asarray((np.arange(8161, dtype=np.int32)) << 8)

        def ss(acc, s, b):
            r = jnp.searchsorted(s, b + (acc > 1e30).astype(jnp.int32))
            return acc + r[77].astype(jnp.float32) * 1e-9

        report(f"searchsorted 8161 bounds {tag}",
               timed("ss", ss, ks, bounds)[1])

        bbox = jnp.asarray(rng.uniform(0, 1900, (p, 4)), jnp.float32)
        z = jnp.asarray(rng.uniform(0.1, 10.0, p), jnp.float32)

        def keys(acc, bbox, z):
            b0 = bbox[:, 0] + acc
            tx0 = jnp.clip((b0 // 32).astype(jnp.int32), 0, 59)
            tx1 = jnp.clip((bbox[:, 1] // 32).astype(jnp.int32), 0, 59)
            ty0 = jnp.clip((bbox[:, 2] // 32).astype(jnp.int32), 0, 33)
            ty1 = jnp.clip((bbox[:, 3] // 32).astype(jnp.int32), 0, 33)
            cls = (tx1 > tx0).astype(jnp.int32) + 2 * (ty1 > ty0)
            anchor = ty0 * 60 + tx0
            zmin, zmax = jnp.min(z), jnp.max(z)
            qz = jnp.clip(((z - zmin) * (256.0 / (zmax - zmin))), 0,
                          255).astype(jnp.int32)
            k = ((anchor * 4 + cls) << 8) | qz
            return acc + k[0].astype(jnp.float32) * 1e-9

        report(f"v6 key build {tag}", timed("kb", keys, bbox, z)[1])


if __name__ == "__main__":
    main()
