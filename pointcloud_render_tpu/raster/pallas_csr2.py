"""CSR Pallas rasterizer v2: tuned for the measured cost model.

Evolution of pallas_csr.py driven by the round-2 on-chip stage budget
(1M pts / 1080p / mtp=4, pipelined timing, docs/KERNEL_NOTES.md):
build 7 ms | bin+sort 23 ms | row gather 53 ms | kernel 69 ms.

The v2 levers, each parametric so the hardware sweep picks the config:

* **disc-specialized rows** (``row_f=8``): scenes whose binned entries are
  all discs (the 1M-point bench; sharded disc paths) pack 8-float rows
  [px, py, z, r^2, id, bucket_low, 0, 0] — half the gather traffic and
  half the per-pair SMEM scalar reads of the generic 16-float layout.
* **tile groups** (``group=G``): one grid program owns G consecutive
  tiles of the same tile row, amortizing the ~5-10 us per-program
  dispatch overhead (1080p @ 8x128 tiles = 2025 programs = 10-20 ms).
* **unrolled inner loop** (``unroll=U``): U primitives per fori_loop
  step, masked tails, letting the scalar unit's reads for prim k+1
  overlap the VPU evaluation of prim k.
* **entry capacity** (``entry_capacity``): the stable sort parks the
  mtp-padding sentinels at the end of the key array, so only the true-
  entry prefix ever reaches the kernel; capping the ROW GATHER at a
  static capacity skips materializing sentinel rows (the gather is the
  single largest stage).  EXACTNESS POLICY: with the default None every
  entry is gathered (always exact).  A finite capacity is only exact
  when true_entry_count(...) <= capacity — callers must check once per
  scene shape (bench.py does) or accept dropped primitives.

Contract (unchanged): winner per pixel = lexicographic min of
(depth, primitive index); division-free per-pixel math (primitives.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pointcloud_render_tpu.raster.pallas_csr import (
    N_BUCKETS,
    _bin_csr,
    _eval_capsule,
    _eval_scalar,
)

INF = np.float32(np.inf)
IMAX = np.int32(2147483647)
DEFAULT_CHUNK_ROWS = 512  # entries per DMA chunk (large: DMA issue latency
# dominates small chunks — ~5 us/transfer beats 128-entry compute)


def _pack_rows_disc(prims, sorted_prims, sorted_keys, bucket_low, e_pad):
    """8-float rows: [px, py, z, r2, id, bucket_low, 0, 0] (discs only)."""
    prims_p = jnp.pad(sorted_prims, (0, e_pad - sorted_prims.shape[0]),
                      constant_values=-1)
    keys_p = jnp.pad(sorted_keys, (0, e_pad - sorted_keys.shape[0]))
    safe = jnp.maximum(prims_p, 0)
    # ONE narrow row gather from a CONTIGUOUS (P, 4) table.  Both
    # per-column gathers and sliced gathers (params[safe, 0:4]) lower to
    # pathological access patterns on TPU (measured 3-8x slower); a
    # contiguous-row gather is the only fast form.
    params4 = prims.params[:, 0:4]  # (P, 4) slice-copy, O(P) elementwise
    g = params4[safe]  # (E, 4): px, py, z, r
    r2 = (g[:, 3] * g[:, 3])[:, None]
    rows = jnp.concatenate([
        g[:, 0:3], r2,
        prims_p.astype(jnp.float32)[:, None],
        bucket_low(jax.lax.rem(keys_p, N_BUCKETS))[:, None],
        jnp.zeros((e_pad, 2), jnp.float32),
    ], axis=1)
    return rows.reshape(e_pad // 16, 128)


def _pack_rows_generic(prims, sorted_prims, sorted_keys, bucket_low, e_pad):
    """16-float rows: 12 params + id + kind + bucket_low + pad (v1 layout)."""
    prims_p = jnp.pad(sorted_prims, (0, e_pad - sorted_prims.shape[0]),
                      constant_values=-1)
    keys_p = jnp.pad(sorted_keys, (0, e_pad - sorted_keys.shape[0]))
    safe = jnp.maximum(prims_p, 0)
    rows = jnp.concatenate([
        prims.params[safe],
        prims_p.astype(jnp.float32)[:, None],
        prims.kind[safe].astype(jnp.float32)[:, None],
        bucket_low(jax.lax.rem(keys_p, N_BUCKETS))[:, None],
        jnp.zeros((e_pad, 1), jnp.float32),
    ], axis=1)
    return rows.reshape(e_pad // 8, 128)


def _eval_disc_row(p, qx, qy):
    """Masked depth of one 8-float disc row; r^2 precomputed at packing."""
    dx = qx - p[0]
    dy = qy - p[1]
    return jnp.where(dx * dx + dy * dy <= p[3], p[2], INF)


def _make_kernel(tiles_x, tile_h, tile_w, group, row_f, unroll,
                 no_triangles, n_chunk_block, chunk_rows):
    pack = 128 // row_f
    id_slot = 4 if row_f == 8 else 12
    bound_slot = 5 if row_f == 8 else 14

    def kernel(starts_ref,  # scalar prefetch: (T+2,) i32; [T+1] = big count
               rows_hbm,  # (E_pad/pack, 128) f32 in ANY/HBM
               big_params_ref,  # SMEM (16, BIG) f32
               big_ids_ref,  # SMEM (1, BIG) i32
               big_kinds_ref,  # SMEM (1, BIG) i32
               depth_out,  # VMEM (group, TH, TW) f32
               idx_out,  # VMEM (group, TH, TW) i32
               scratch,  # SMEM (2, n_chunk_block, 128) f32
               sems):  # DMA sems (2,)
        prog = pl.program_id(0)
        big_n = starts_ref[pl.num_programs(0) * group + 1]

        for k in range(group):  # static unroll over the program's tiles
            tile = prog * group + k
            ty = tile // tiles_x
            tx = tile % tiles_x
            ix = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
            iy = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
            qx = (tx * tile_w + ix).astype(jnp.float32) + 0.5
            qy = (ty * tile_h + iy).astype(jnp.float32) + 0.5

            start = starts_ref[tile]
            count = starts_ref[tile + 1] - start
            n_chunks = pl.cdiv(count, chunk_rows)

            def get_dma(slot, ci, start=start):
                g0 = start + ci * chunk_rows
                return pltpu.make_async_copy(
                    rows_hbm.at[pl.ds(g0 // pack, n_chunk_block), :],
                    scratch.at[slot],
                    sems.at[slot],
                )

            @pl.when(n_chunks > 0)
            def _():
                get_dma(0, 0).start()

            # Big primitives (ground etc.) render FIRST: they fill pixels
            # the cloud leaves empty, arming the saturation early-exit.
            def big_body(j, carry):
                d, i = carry
                kind = big_kinds_ref[0, j]
                pid = big_ids_ref[0, j]
                p = tuple(big_params_ref[r, j] for r in range(12))
                zc = _eval_scalar(kind, p, qx, qy)
                better = (zc < d) | ((zc == d) & (pid < i))
                return jnp.where(better, zc, d), jnp.where(better, pid, i)

            d_bg, i_bg = jax.lax.fori_loop(
                0, big_n, big_body,
                (jnp.full((tile_h, tile_w), INF, jnp.float32),
                 jnp.full((tile_h, tile_w), IMAX, jnp.int32)))

            # `unroll` INDEPENDENT accumulator chains: the lexicographic
            # merge is associative+commutative, so prim j feeds chain
            # j % unroll and the chains fold together once per tile —
            # breaking the serial merge dependency that otherwise caps the
            # loop at (scalar reads + full VPU chain) per primitive.
            accs = [d_bg, i_bg]
            for _ in range(unroll - 1):
                accs += [jnp.full((tile_h, tile_w), INF, jnp.float32),
                         jnp.full((tile_h, tile_w), IMAX, jnp.int32)]
            init = tuple(accs) + (jnp.bool_(True),)

            def chunk_body(ci, carry, start=start, count=count,
                           n_chunks=n_chunks, get_dma=get_dma, qx=qx, qy=qy):
                accs_in = carry[:-1]
                active = carry[-1]
                slot = jax.lax.rem(ci, 2)

                @pl.when(active & (ci + 1 < n_chunks))
                def _():
                    get_dma(jax.lax.rem(ci + 1, 2), ci + 1).start()

                m = jnp.minimum(chunk_rows, count - ci * chunk_rows)
                o0 = jax.lax.rem(start + ci * chunk_rows, pack)

                def process(_):
                    get_dma(slot, ci).wait()

                    def eval_one(j, d0, i0):
                        lin = o0 + j
                        br = lin // pack
                        lane = jax.lax.rem(lin, pack) * row_f

                        def rd(r):
                            return scratch[slot, br, lane + r]

                        pid = rd(id_slot).astype(jnp.int32)
                        if row_f == 8:
                            p = tuple(rd(r) for r in range(4))
                            zc = _eval_disc_row(p, qx, qy)
                        elif no_triangles:
                            p = tuple(rd(r) for r in range(12))
                            zc = _eval_capsule(p, qx, qy)
                        else:
                            p = tuple(rd(r) for r in range(12))
                            kind = rd(13).astype(jnp.int32)
                            zc = _eval_scalar(kind, p, qx, qy)
                        # Masked tail: j may overrun m in unrolled steps.
                        oob = j >= m
                        zc = jnp.where(oob, INF, zc)
                        pid = jnp.where(oob, IMAX, pid)
                        better = (zc < d0) | ((zc == d0) & (pid < i0))
                        return (jnp.where(better, zc, d0),
                                jnp.where(better, pid, i0))

                    def prim_body(s, c2):
                        out = list(c2)
                        base = s * unroll
                        for u in range(unroll):
                            out[2 * u], out[2 * u + 1] = eval_one(
                                base + u, out[2 * u], out[2 * u + 1])
                        return tuple(out)

                    accs = jax.lax.fori_loop(
                        0, pl.cdiv(m, unroll), prim_body, accs_in)

                    # Saturation early-exit (see pallas_csr.py): entries are
                    # front-to-back by depth bucket; if the tile is fully
                    # covered shallower than any remaining bucket, stop.
                    lin_last = o0 + m - 1
                    bound = scratch[slot, lin_last // pack,
                                    jax.lax.rem(lin_last, pack) * row_f
                                    + bound_slot]
                    d_all = accs[0]
                    for u in range(1, unroll):
                        d_all = jnp.minimum(d_all, accs[2 * u])
                    tile_max = jnp.max(d_all)
                    still = ~((tile_max < INF) & (bound > tile_max))

                    @pl.when(~still & (ci + 1 < n_chunks))
                    def _():
                        get_dma(jax.lax.rem(ci + 1, 2), ci + 1).wait()

                    return accs + (still,)

                def skip(_):
                    return accs_in + (active,)

                return jax.lax.cond(active, process, skip, 0)

            out = jax.lax.fori_loop(0, n_chunks, chunk_body, init)
            depth, idx = out[0], out[1]
            for u in range(1, unroll):
                du, iu = out[2 * u], out[2 * u + 1]
                better = (du < depth) | ((du == depth) & (iu < idx))
                depth = jnp.where(better, du, depth)
                idx = jnp.where(better, iu, idx)

            depth_out[k, :, :] = depth
            idx_out[k, :, :] = idx

    return kernel


def true_entry_count(prims, width: int, height: int, tile_h: int = 8,
                     tile_w: int = 128, max_tiles_per_prim: int = 4,
                     no_triangles: bool = False):
    """() int32: non-sentinel (tile, prim) entries for this scene/config.

    The exactness precondition for a finite ``entry_capacity`` is
    ``true_entry_count(...) <= entry_capacity`` — check once per scene
    shape (cheap relative to a frame: one expansion + sort)."""
    tiles_y = -(-height // tile_h)
    tiles_x = -(-width // tile_w)
    num_tiles = tiles_y * tiles_x
    sorted_keys, *_ = _bin_csr(
        prims, width, height, tile_h, tile_w, max_tiles_per_prim, 1024,
        num_tiles, tiles_x, tiles_y, force_tri_big=no_triangles)
    return jnp.searchsorted(
        sorted_keys, jnp.int32(num_tiles * N_BUCKETS)).astype(jnp.int32)


def rasterize_pallas_csr2(prims, width: int, height: int, tile_h: int = 8,
                          tile_w: int = 128, max_tiles_per_prim: int = 4,
                          max_big: int = 1024, no_triangles: bool = False,
                          discs_only: bool = False, group: int = 1,
                          unroll: int = 1, entry_capacity=None,
                          chunk_rows: int = DEFAULT_CHUNK_ROWS,
                          interpret: bool = False):
    """Returns (depth (H,W) f32 +inf-empty, index (H,W) i32 -1-empty).

    ``discs_only=True`` compiles the 8-float-row fast path: every BINNED
    entry must be a disc (capsules/triangles are forced to the big list,
    which handles every kind) — safe for disc clouds over furniture; do
    not use with trail-heavy scenes (the big list is O(T x big)).
    ``group`` tiles share one grid program (must divide the tile count
    evenly after padding; tiles are consecutive in row-major order).
    ``entry_capacity`` caps the sorted-entry ROW GATHER — see module
    docstring for the exactness precondition.
    """
    tiles_y = -(-height // tile_h)
    tiles_x = -(-width // tile_w)
    num_tiles = tiles_y * tiles_x
    if num_tiles % group:
        raise ValueError(f"group {group} must divide num_tiles {num_tiles}")

    force_big = no_triangles or discs_only
    (sorted_keys, sorted_prims, big_list, big_count,
     bucket_low) = _bin_csr(
        prims, width, height, tile_h, tile_w, max_tiles_per_prim, max_big,
        num_tiles, tiles_x, tiles_y, force_tri_big=force_big,
        force_capsule_big=discs_only)

    starts = jnp.searchsorted(
        sorted_keys,
        np.arange(num_tiles + 1, dtype=np.int32) * N_BUCKETS).astype(
        jnp.int32)

    row_f = 8 if discs_only else 16
    pack = 128 // row_f
    e = sorted_prims.shape[0]
    if entry_capacity is not None:
        e = min(e, int(entry_capacity))
        sorted_prims = sorted_prims[:e]
        sorted_keys = sorted_keys[:e]
        starts = jnp.minimum(starts, e)
    e_pad = -(-(e + chunk_rows + pack) // chunk_rows) * chunk_rows
    if prims.count >= (1 << 24):
        raise ValueError("CSR kernel id encoding supports < 2^24 primitives")
    pack_fn = _pack_rows_disc if discs_only else _pack_rows_generic
    rows = pack_fn(prims, sorted_prims, sorted_keys, bucket_low, e_pad)

    big_safe = jnp.maximum(big_list, 0)
    big_kinds = jnp.where((big_list >= 0) & prims.valid[big_safe],
                          prims.kind[big_safe], -1)[None, :]
    big_params = jnp.zeros((16, big_list.shape[0]), jnp.float32)
    big_params = big_params.at[:12, :].set(prims.params[big_safe].T)
    big_ids = big_list[None, :]

    scalars = jnp.concatenate([
        starts, jnp.minimum(big_count, big_list.shape[0])[None].astype(
            jnp.int32)])

    n_chunk_block = chunk_rows // pack + 1
    n_programs = num_tiles // group

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_programs,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((16, big_list.shape[0]), lambda i, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, big_list.shape[0]), lambda i, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, big_list.shape[0]), lambda i, c: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((group, tile_h, tile_w), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, tile_h, tile_w), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((2, n_chunk_block, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = _make_kernel(tiles_x, tile_h, tile_w, group, row_f, unroll,
                          no_triangles, n_chunk_block, chunk_rows)
    depth_t, idx_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, tile_h, tile_w), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, tile_h, tile_w), jnp.int32),
        ],
        interpret=interpret,
    )(scalars, rows, big_params, big_ids, big_kinds)

    depth = depth_t.reshape(tiles_y, tiles_x, tile_h, tile_w) \
        .transpose(0, 2, 1, 3).reshape(tiles_y * tile_h, tiles_x * tile_w)
    idx = idx_t.reshape(tiles_y, tiles_x, tile_h, tile_w) \
        .transpose(0, 2, 1, 3).reshape(tiles_y * tile_h, tiles_x * tile_w)
    depth = depth[:height, :width]
    idx = idx[:height, :width]
    idx = jnp.where(jnp.isinf(depth), -1, idx)
    return depth, idx
