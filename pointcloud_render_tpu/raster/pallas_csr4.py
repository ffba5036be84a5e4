"""CSR Pallas rasterizer v4: the GENERIC binned path (discs + capsules).

v3 (pallas_csr3) is the minimum-cost disc fast path; its binned entries
must have constant per-pixel depth, so trail capsules ride the O(T x big)
big list — unusable for trail-heavy scenes (a traj_ball frame is half
capsules).  v4 keeps v3's machinery — fixed 2x2 binning on square 32x32
pixel blocks, z-bucket sort keys with an in-kernel depth early-exit,
PACK-aligned static lane addressing, fused shading — and generalizes the
row format to the full capsule parameterization:

* one branchless eval covers discs AND capsules: a disc is a degenerate
  capsule (params[4:9] = 0 -> t = 0), exactly as the CPU oracle treats
  them (cpu_reference.py) and with the identical formula as
  pallas_csr._eval_capsule — bit-for-bit the same coverage and depth;
* rows carry the PRIMITIVE ID AS A FLOAT (exact for id < 2^24) and the
  kernel does the full lexicographic (depth, id) tie-break per pair.
  Consequences, all simplifications over v3:
  - the winner is ORDER-INDEPENDENT, so the binning sort can be
    UNSTABLE (measured ~2.7 ms cheaper than stable at 4M slots) and the
    v3 leading-stranger masking is unnecessary;
  - big-list ties are exact too (big rows carry the same float id) —
    v3's "big ids below binned ids" precondition is gone;
  - there is no entry->id resolve: the index image is int(idf), and the
    fused shading gathers the (P+1, 16) PRIM table by winner id.
* the early-exit bound uses a per-primitive DEPTH LOWER BOUND zlb
  (discs: z; capsules: min(z0, z0 + dz) — the capsule depth eval
  z0 + dz*t, t in [0,1], can never go below it), bucketed into the sort
  key exactly as v3 buckets disc z.

Row format (16 f32, PACK = 8 entries per 128-lane scratch row):
  [0:9]  params x0, y0, z0, r0, dx, dy, dz, dr, inv_len2
  [9]    primitive id as f32
  [10:13] shading rgb (raw disc color, or preshaded capsule/triangle)
  [13]   flag: disc -> 1/max(r, 1e-6) (per-pixel lambert); else -1
  [14]   zlb (early-exit depth lower bound)
  [15]   pad

Contract (unchanged): winner per pixel = lexicographic min of
(depth, primitive index); division-free per-pixel math (primitives.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pointcloud_render_tpu.raster.pallas_csr3 import _preshade, _zq_bits
from pointcloud_render_tpu.raster.primitives import (
    KIND_CAPSULE,
    KIND_DISC,
    KIND_TRIANGLE,
    ScreenPrimitives,
)

INF = np.float32(np.inf)
IMAX = np.int32(2147483647)
F_EMPTY = np.float32(1 << 24)  # > every representable prim id
ROW_F = 16
PACK = 128 // ROW_F  # 8 entries per 128-lane row
DEFAULT_CHUNK_ROWS = 256  # sweep optimum (r2 kernel sweep; docs/KERNEL_NOTES.md)
DEFAULT_MAX_BIG = 1024
DEFAULT_BIG_CHUNK = 512  # big-list prims per HBM->SMEM DMA chunk


def _z_lower_bound(prims, with_triangles: bool = False):
    """(P,) sound per-prim lower bound of the eval'd depth.

    Disc/capsule depth = z0 + dz*t with t in [0, 1] -> min(z0, z0+dz).
    With ``with_triangles``, triangle depth = 1/iz with iz(x, y) linear
    in screen space; its max over the triangle is bounded by the max
    over the prim's own bbox corners, so 1/max(corner iz) is a sound
    lower bound (0 where the bound degenerates — always sound).
    """
    z0 = prims.params[:, 2]
    dz = prims.params[:, 6]
    zlb = jnp.minimum(z0, z0 + dz)
    if not with_triangles:
        return zlb
    p = prims.params
    izmax = None
    for cx in (0, 1):
        for cy in (2, 3):
            qx = prims.bbox[:, cx]
            qy = prims.bbox[:, cy]
            e0 = p[:, 0] * qy - p[:, 1] * qx + p[:, 2]
            e1 = p[:, 3] * qy - p[:, 4] * qx + p[:, 5]
            e2 = p[:, 6] * qy - p[:, 7] * qx + p[:, 8]
            iz = e0 * p[:, 9] + e1 * p[:, 10] + e2 * p[:, 11]
            izmax = iz if izmax is None else jnp.maximum(izmax, iz)
    zlb_tri = jnp.where(izmax > 0, 1.0 / jnp.where(izmax > 0, izmax, 1.0),
                        0.0)
    return jnp.where(prims.kind == KIND_TRIANGLE, zlb_tri, zlb)


def _bin_csr4(prims, tile_h, tile_w, num_tiles, tiles_x, tiles_y,
              max_big=DEFAULT_MAX_BIG, bin_triangles=False):
    """Fixed-pattern 2x2 expansion + UNSTABLE (tile, zlb-bucket) sort.

    Discs and capsules whose bbox spans at most 2x2 tiles are binned
    (plus triangles under ``bin_triangles`` — the mesh-LOD droplet mode);
    wider prims, non-binnable kinds, and invalids ride the big list.
    Returns
    (sorted_keys, sorted_prims, big_list, big_count, zmeta); zmeta as in
    pallas_csr3._bin_csr_2x2 but over the binned prims' zlb.  The sort
    is unstable — v4's per-pair id tie-break makes the winner
    order-independent, so only the (tile, bucket) grouping matters.
    """
    p = prims.count
    zq_bits = _zq_bits(num_tiles)
    xmin, xmax = prims.bbox[:, 0], prims.bbox[:, 1]
    ymin, ymax = prims.bbox[:, 2], prims.bbox[:, 3]
    tx0 = jnp.clip(jnp.floor(xmin / tile_w).astype(jnp.int32), 0, tiles_x - 1)
    tx1 = jnp.clip(jnp.floor(xmax / tile_w).astype(jnp.int32), 0, tiles_x - 1)
    ty0 = jnp.clip(jnp.floor(ymin / tile_h).astype(jnp.int32), 0, tiles_y - 1)
    ty1 = jnp.clip(jnp.floor(ymax / tile_h).astype(jnp.int32), 0, tiles_y - 1)
    ntx = tx1 - tx0 + 1
    nty = ty1 - ty0 + 1
    binnable = (prims.kind == KIND_DISC) | (prims.kind == KIND_CAPSULE)
    if bin_triangles:
        binnable = binnable | (prims.kind == KIND_TRIANGLE)
    fits = (ntx <= 2) & (nty <= 2) & binnable
    is_small = prims.valid & fits
    is_big = prims.valid & ~fits

    prim_id = np.arange(p, dtype=np.int32)
    home = ty0 * tiles_x + tx0
    sent = np.int32(num_tiles << zq_bits)

    zlb = _z_lower_bound(prims, with_triangles=bin_triangles)
    if zq_bits > 0:
        nb = np.float32(1 << zq_bits)
        zmin = jnp.min(jnp.where(is_small, zlb, INF))
        zmax = jnp.max(jnp.where(is_small, zlb, -INF))
        rngz = zmax - zmin
        s = jnp.where(rngz > 0, nb / rngz, 0.0)
        qz = jnp.clip(jnp.floor((zlb - zmin) * s), 0.0,
                      nb - 1).astype(jnp.int32)
        home = (home << zq_bits) | qz
        thr_scale = jnp.where(s > 0, np.float32(1.0 - 1e-6) / s, 0.0)
        zmeta = jnp.stack([jnp.where(jnp.isfinite(zmin), zmin, 0.0),
                           s, thr_scale])
    else:
        zmeta = jnp.zeros((3,), jnp.float32)

    keys = []
    for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):  # static pattern
        ok = is_small
        if dx:
            ok = ok & (ntx == 2)
        if dy:
            ok = ok & (nty == 2)
        keys.append(jnp.where(ok, home + ((dy * tiles_x + dx) << zq_bits),
                              sent))
    flat_key = jnp.stack(keys, axis=1).reshape(-1)
    flat_prims = jnp.broadcast_to(prim_id[:, None], (p, 4)).reshape(-1)
    # int16 keys only when the sentinel fits (the tiles.py guard):
    # >32767-tile grids (>8K renders at 32x32 blocks) silently wrap
    # int16 and interleave sentinel/real keys.
    if ((num_tiles + 1) << zq_bits) <= 32767:
        k16, sorted_prims = jax.lax.sort(
            (flat_key.astype(jnp.int16), flat_prims), num_keys=1,
            is_stable=False)
        sorted_keys = k16.astype(jnp.int32)
    else:
        sorted_keys, sorted_prims = jax.lax.sort(
            (flat_key, flat_prims), num_keys=1, is_stable=False)

    big_rank = jnp.cumsum(is_big.astype(jnp.int32)) - 1
    big_idx = jnp.where(is_big & (big_rank < max_big), big_rank, max_big)
    big_list = jnp.full((max_big + 1,), -1, jnp.int32)
    big_list = big_list.at[big_idx].set(prim_id, mode="drop")
    big_list = big_list[:-1]
    big_count = jnp.sum(is_big.astype(jnp.int32))
    return sorted_keys, sorted_prims, big_list, big_count, zmeta


def true_entry_count4(prims, width: int, height: int, tile_h: int = 32,
                      tile_w: int = 32, bin_triangles: bool = False):
    """() int32 non-sentinel entries under the v4 binning (the exactness
    precondition for a finite entry_capacity)."""
    tiles_y = -(-height // tile_h)
    tiles_x = -(-width // tile_w)
    num_tiles = tiles_y * tiles_x
    sorted_keys, *_ = _bin_csr4(prims, tile_h, tile_w, num_tiles,
                                tiles_x, tiles_y,
                                bin_triangles=bin_triangles)
    return jnp.searchsorted(
        sorted_keys,
        jnp.int32(num_tiles << _zq_bits(num_tiles))).astype(jnp.int32)


def bin_diagnostics4(prims, width: int, height: int, tile_h: int = 32,
                     tile_w: int = 32, max_big: int = DEFAULT_MAX_BIG,
                     bin_triangles: bool = False):
    """Big-list overflow count under the v4 binning (0 = exact)."""
    tiles_y = -(-height // tile_h)
    tiles_x = -(-width // tile_w)
    num_tiles = tiles_y * tiles_x
    _, _, big_list, big_count, _ = _bin_csr4(
        prims, tile_h, tile_w, num_tiles, tiles_x, tiles_y,
        max_big=max_big, bin_triangles=bin_triangles)
    return jnp.maximum(big_count - big_list.shape[0], 0)


def _build_table16(prims, shade_rgb, shade_flag, bin_triangles=False,
                   idf=None, pad=True):
    """(P+1, 16) f32 prim table; row P is the all-zero pad/sentinel.

    KERNEL-ONLY layout (the shade pass builds its own compact table):
    triangle rows repurpose the kernel-unused rgb/flag lanes for the
    inverse-z plane coefficients — lanes [10:13] = params[9:12],
    lane 15 = 1.0 kind flag (0 for capsule/disc rows, whose tri
    coefficients are 0).  The tri-aware layout is emitted ALWAYS: the
    big list streams through the same rows with the dual eval, and
    triangles ride the big list even when ``bin_triangles`` is off.
    ``bin_triangles`` only controls the zlb lane (the binned stream's
    early-exit bound; the big stream never reads it).

    ``idf``/``pad`` serve _build_table16_rows (gathered sub-soups whose
    id lane must carry the ORIGINAL prim indices, unpadded).
    """
    p = prims.count
    idf = jnp.arange(p, dtype=jnp.float32) if idf is None else idf
    zlb = _z_lower_bound(prims, with_triangles=bin_triangles)
    is_tri = (prims.kind == KIND_TRIANGLE)[:, None]
    mid = jnp.where(is_tri,
                    jnp.concatenate([prims.params[:, 9:12],
                                     jnp.zeros((p, 1), jnp.float32)],
                                    axis=1),
                    jnp.concatenate([shade_rgb, shade_flag[:, None]],
                                    axis=1))
    tail = is_tri.astype(jnp.float32)
    table = jnp.concatenate([
        prims.params[:, 0:9],
        idf[:, None],
        mid,
        zlb[:, None],
        tail,
    ], axis=1)
    # Zero INVALID prims' rows: the sentinel-keyed sort tail borders
    # the last tile's run inside its PACK-aligned stranger slop, and
    # invalid (z-clipped / off-film) prims keep live params.  A zero
    # row is inert under both evals (rad = 0; kf = 0 tri with iz = 0).
    # jnp.where, not *, so non-finite params can't leak NaNs.
    table = jnp.where(prims.valid[:, None], table, 0.0)
    return jnp.pad(table, ((0, 1), (0, 0))) if pad else table


def _build_table16_rows(prims, shade_rgb, shade_flag, ids,
                        bin_triangles=False):
    """Rows ``_build_table16(...)[ids]`` WITHOUT materializing the
    (P+1, 16) table: gather the per-prim inputs at ``ids`` first, then
    run the identical elementwise layout on the small result.

    Bit-equal per row because every lane is an elementwise function of
    the gathered columns (gather and elementwise commute).  Indices
    outside [0, P) (the sentinel pad P, the big list's -1 empties)
    produce the all-zero row — inert under both kernel evals, exactly
    like the padded table's sentinel.  Used by the pallas_csr6
    discs_only path, where the binned stream rides 8-float rows and
    only the few big-list prims need 16-float rows (skipping a
    P x 16 f32 materialization per frame)."""
    p = prims.count
    ids = jnp.asarray(ids, jnp.int32)
    safe = jnp.clip(ids, 0, p - 1)
    m = ids.shape[0]
    sub = ScreenPrimitives(
        kind=prims.kind[safe],
        params=prims.params[safe],
        color=jnp.zeros((m, 3), jnp.float32),
        valid=prims.valid[safe] & (ids >= 0) & (ids < p),
        bbox=prims.bbox[safe],
        normal=jnp.zeros((m, 3), jnp.float32),
    )
    return _build_table16(sub, shade_rgb[safe], shade_flag[safe],
                          bin_triangles=bin_triangles,
                          idf=ids.astype(jnp.float32), pad=False)


def _make_row_body16(scr, slot, nchains, tri, qx, qy):
    """fori_loop body over one 16-float-row scratch slab (module-level so
    pallas_csr6 shares the EXACT same eval; see _make_kernel4's row-body
    comment for the stranger-slot soundness argument)."""

    def row_body(br, c2):
        out = list(c2)
        for u in range(PACK):
            lane = u * ROW_F
            x0 = scr[slot, br, lane]
            y0 = scr[slot, br, lane + 1]
            z0 = scr[slot, br, lane + 2]
            r0 = scr[slot, br, lane + 3]
            sdx = scr[slot, br, lane + 4]
            sdy = scr[slot, br, lane + 5]
            sdz = scr[slot, br, lane + 6]
            sdr = scr[slot, br, lane + 7]
            il2 = scr[slot, br, lane + 8]
            idf = scr[slot, br, lane + 9]
            ch = u % nchains
            d0, di = out[2 * ch], out[2 * ch + 1]
            dx = qx - x0
            dy = qy - y0
            t = jnp.clip((dx * sdx + dy * sdy) * il2, 0.0, 1.0)
            cx = dx - t * sdx
            cy = dy - t * sdy
            rad = r0 + sdr * t
            z = z0 + sdz * t
            cov = cx * cx + cy * cy <= rad * rad
            if tri:
                # Branchless dual eval: the same 9 scalars are the
                # triangle's edge coefficients; lanes [10:13] its iz
                # plane, lane 15 the kind flag (scalar — the select
                # broadcasts it).  Matches pallas_csr._eval_tri exactly.
                t9 = scr[slot, br, lane + 10]
                t10 = scr[slot, br, lane + 11]
                t11 = scr[slot, br, lane + 12]
                kf = scr[slot, br, lane + 15]
                e0 = x0 * qy - y0 * qx + z0
                e1 = r0 * qy - sdx * qx + sdy
                e2 = sdz * qy - sdr * qx + il2
                iz = e0 * t9 + e1 * t10 + e2 * t11
                cov_t = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)
                         & (iz > 0))
                z_t = 1.0 / jnp.where(iz > 0, iz, 1.0)
                is_tri = kf > 0
                z = jnp.where(is_tri, z_t, z)
                cov = (is_tri & cov_t) | (~is_tri & cov)
            better = cov & ((z < d0) | ((z == d0) & (idf < di)))
            out[2 * ch] = jnp.where(better, z, d0)
            out[2 * ch + 1] = jnp.where(better, idf, di)
        return tuple(out)

    return row_body


def _stream_big(big_hbm, big_scratch, big_sems, big_n, big_chunk, qx, qy):
    """Merge the HBM-streamed big list (16-float tri-aware rows, double-
    buffered DMA chunks) -> (depth, idf) (8, 128) accumulators.  Shared
    by the v4 and v6 kernels; the per-pair (depth, id) tie-break keeps
    the merge with binned prims exact in any processing order."""
    n_big_block = big_chunk // PACK
    n_bchunks = pl.cdiv(big_n, big_chunk)

    def get_big_dma(slot, ci):
        return pltpu.make_async_copy(
            big_hbm.at[pl.ds(ci * n_big_block, n_big_block), :],
            big_scratch.at[slot],
            big_sems.at[slot],
        )

    @pl.when(n_bchunks > 0)
    def _():
        get_big_dma(0, 0).start()

    def bchunk_body(ci, accs_in):
        s = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < n_bchunks)
        def _():
            get_big_dma(jax.lax.rem(ci + 1, 2), ci + 1).start()

        get_big_dma(s, ci).wait()
        mc = jnp.minimum(big_chunk, big_n - ci * big_chunk)
        n_rows = (mc + (PACK - 1)) // PACK
        return jax.lax.fori_loop(
            0, n_rows, _make_row_body16(big_scratch, s, 2, True, qx, qy),
            accs_in)

    big4 = jax.lax.fori_loop(
        0, n_bchunks, bchunk_body,
        (jnp.full((8, 128), INF, jnp.float32),
         jnp.full((8, 128), F_EMPTY, jnp.float32),
         jnp.full((8, 128), INF, jnp.float32),
         jnp.full((8, 128), F_EMPTY, jnp.float32)))
    bbetter = (big4[2] < big4[0]) | ((big4[2] == big4[0])
                                     & (big4[3] < big4[1]))
    d_bg = jnp.where(bbetter, big4[2], big4[0])
    i_bg = jnp.where(bbetter, big4[3], big4[1])
    return d_bg, i_bg


def _make_kernel4(tiles_x, tile_h, tile_w, unroll, n_chunk_block,
                  chunk_rows, allow_exit, with_triangles=False,
                  big_chunk=DEFAULT_BIG_CHUNK):
    assert chunk_rows % PACK == 0
    assert big_chunk % PACK == 0

    def kernel(starts_ref,  # scalar prefetch: (T+2,) i32; [T+1] = big count
               rows_hbm,  # (E_pad/8, 128) f32 in ANY/HBM
               big_hbm,  # (BIG_pad/8, 128) f32 in ANY/HBM — same row fmt
               zmeta_ref,  # SMEM (1, 3) f32: zmin, s, thr_scale
               depth_out,  # VMEM (1, 8, 128) f32 — one pixel block
               idf_out,  # VMEM (1, 8, 128) f32 — winner id as f32
               scratch,  # SMEM (2, n_chunk_block, 128) f32
               sems,  # DMA sems (2,)
               big_scratch,  # SMEM (2, n_big_block, 128) f32
               big_sems):  # DMA sems (2,)
        tile = pl.program_id(0)
        ty = tile // tiles_x
        tx = tile % tiles_x
        # VREG (8, 128) -> (tile_h, tile_w) pixel block (pallas_csr3).
        ix = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        iy = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        qx = (tx * tile_w + ix % tile_w).astype(jnp.float32) + 0.5
        qy = (ty * tile_h + iy + 8 * (ix // tile_w)).astype(
            jnp.float32) + 0.5

        start = starts_ref[tile]
        count = starts_ref[tile + 1] - start
        n_chunks = pl.cdiv(count, chunk_rows)
        big_n = starts_ref[pl.num_programs(0) + 1]
        o0 = jax.lax.rem(start, PACK)

        def get_dma(slot, ci):
            g0 = start + ci * chunk_rows
            return pltpu.make_async_copy(
                rows_hbm.at[pl.ds(g0 // PACK, n_chunk_block), :],
                scratch.at[slot],
                sems.at[slot],
            )

        @pl.when(n_chunks > 0)
        def _():
            get_dma(0, 0).start()

        # Whole PACK-aligned 8-entry rows at STATIC lane offsets
        # (_make_row_body16).  No stranger masking (cf. pallas_csr3):
        # the per-pair id tie-break makes processing order irrelevant,
        # and out-of-run slots are inert (cannot cover this tile; zero
        # pad rows cover nothing: rad = 0 and every pixel center is
        # >= 0.5 from the origin) or idempotent duplicates.

        # Big primitives (triangles / wide prims) first, streamed from
        # HBM in double-buffered chunks — the big list has NO SMEM-
        # resident ceiling (a 1M-pt trail fade frame needs ~20k big
        # rows; (16, 20k) f32 resident would blow the 1 MB scalar
        # memory).
        d_bg, i_bg = _stream_big(big_hbm, big_scratch, big_sems, big_n,
                                 big_chunk, qx, qy)

        accs = [d_bg, i_bg]
        for _ in range(unroll - 1):
            accs += [jnp.full((8, 128), INF, jnp.float32),
                     jnp.full((8, 128), F_EMPTY, jnp.float32)]
        init = tuple(accs)

        def process_chunk(ci, slot, accs_in):
            mc = jnp.minimum(chunk_rows, count - ci * chunk_rows)
            n_rows = (o0 + mc + (PACK - 1)) // PACK
            return jax.lax.fori_loop(
                0, n_rows,
                _make_row_body16(scratch, slot, unroll, with_triangles,
                                 qx, qy),
                accs_in), n_rows

        if allow_exit:
            # Runs ascend in zlb-bucket; every unprocessed entry's depth
            # >= its zlb >= the last streamed bucket's floor (one bucket
            # + 1e-6 margin back) — soundness as in pallas_csr3, with
            # zlb in row slot 14.  The bucket is read at the chunk's
            # LAST REAL entry (o0 + mc - 1), never a PACK-slop slot, so
            # the bound's soundness is local to this ascending run: it
            # never rests on which neighbouring run's entries happen to
            # share the slab (slop slots are evaluated, so nothing live
            # is ever skipped either way — but the last-real read keeps
            # the invariant checkable without that global argument).
            zmin = zmeta_ref[0, 0]
            zs = zmeta_ref[0, 1]
            thr_scale = zmeta_ref[0, 2]

            def cond(c):
                return (c[0] < n_chunks) & jnp.logical_not(c[1])

            def body(c):
                ci = c[0]
                accs_in = c[2:]
                slot = jax.lax.rem(ci, 2)

                @pl.when(ci + 1 < n_chunks)
                def _():
                    get_dma(jax.lax.rem(ci + 1, 2), ci + 1).start()

                get_dma(slot, ci).wait()
                accs_out, n_rows = process_chunk(ci, slot, accs_in)
                dmin = accs_out[0]
                for u in range(1, unroll):
                    dmin = jnp.minimum(dmin, accs_out[2 * u])
                dmax = jnp.max(dmin)
                mc = jnp.minimum(chunk_rows, count - ci * chunk_rows)
                e = o0 + mc - 1
                last_zlb = scratch[slot, e // PACK,
                                   jax.lax.rem(e, PACK) * ROW_F + 14]
                qz = jnp.maximum(
                    jnp.floor((last_zlb - zmin) * zs) - 1.0, 0.0)
                # STRICT >: at equality a remaining equal-depth entry
                # with a LOWER id must still win the per-pair tie-break
                # (the unstable sort does not order ids) — ADVICE r2.
                done = zmin + qz * thr_scale > dmax
                return (ci + 1, done) + accs_out

            final = jax.lax.while_loop(
                cond, body, (jnp.int32(0), jnp.bool_(False)) + init)
            ci_end, done = final[0], final[1]
            out = final[2:]

            @pl.when(done & (ci_end < n_chunks))
            def _():
                get_dma(jax.lax.rem(ci_end, 2), ci_end).wait()
        else:
            def chunk_body(ci, accs_in):
                s = jax.lax.rem(ci, 2)

                @pl.when(ci + 1 < n_chunks)
                def _():
                    get_dma(jax.lax.rem(ci + 1, 2), ci + 1).start()

                get_dma(s, ci).wait()
                accs_out, _ = process_chunk(ci, s, accs_in)
                return accs_out

            out = jax.lax.fori_loop(0, n_chunks, chunk_body, init)

        depth, idf = out[0], out[1]
        for u in range(1, unroll):
            du, iu = out[2 * u], out[2 * u + 1]
            better = (du < depth) | ((du == depth) & (iu < idf))
            depth = jnp.where(better, du, depth)
            idf = jnp.where(better, iu, idf)

        depth_out[0, :, :] = depth
        idf_out[0, :, :] = idf

    return kernel


def _raster_core4(prims, width, height, tile_h, tile_w, unroll,
                  entry_capacity, chunk_rows, interpret, shade_rgb,
                  shade_flag, max_big=DEFAULT_MAX_BIG,
                  bin_triangles=False):
    """Shared binning + kernel launch.

    Returns (depth, idf_img, table16, diag) where diag carries the
    DEVICE-SIDE exactness certificates: ``true_entries`` (must be <= any
    finite entry_capacity) and ``big_overflow`` (must be 0) — one scalar
    fetch certifies a whole frame post hoc (cf. parallel/streaming.py)."""
    if tile_h * tile_w != 1024 or tile_w not in (16, 32, 64, 128):
        raise ValueError(
            "pallas_csr4 pixel blocks must hold exactly one (8, 128) "
            "f32 VREG: tile_h * tile_w == 1024 with tile_w in "
            "{16, 32, 64, 128}")
    if prims.count >= (1 << 24):
        raise ValueError("float id encoding supports < 2^24 primitives")
    tiles_y = -(-height // tile_h)
    tiles_x = -(-width // tile_w)
    num_tiles = tiles_y * tiles_x

    sorted_keys, sorted_prims, big_list, big_count, zmeta = _bin_csr4(
        prims, tile_h, tile_w, num_tiles, tiles_x, tiles_y,
        max_big=max_big, bin_triangles=bin_triangles)

    zq_bits = _zq_bits(num_tiles)
    starts = jnp.searchsorted(
        sorted_keys,
        np.arange(num_tiles + 1, dtype=np.int32) << zq_bits
    ).astype(jnp.int32)
    diag = dict(true_entries=starts[num_tiles],
                big_overflow=jnp.maximum(big_count - big_list.shape[0], 0))

    e = sorted_prims.shape[0]
    if entry_capacity is not None:
        e = min(e, int(entry_capacity))
        sorted_prims = sorted_prims[:e]
        starts = jnp.minimum(starts, e)
    e_pad = -(-(e + chunk_rows + PACK) // chunk_rows) * chunk_rows

    table16 = _build_table16(prims, shade_rgb, shade_flag,
                             bin_triangles=bin_triangles)
    prims_p = jnp.pad(sorted_prims, (0, e_pad - e),
                      constant_values=prims.count)
    rows = table16[prims_p].reshape(e_pad // PACK, 128)

    # Big stream: SAME 16-float row format, gathered by big-list id
    # (invalid slots -> the zero pad row, which covers nothing), padded
    # to whole DMA chunks.  Lives in HBM — no SMEM-resident size cap.
    big_chunk = DEFAULT_BIG_CHUNK
    big = big_list.shape[0]
    big_pad = -(-(big + 1) // big_chunk) * big_chunk
    big_safe = jnp.maximum(big_list, 0)
    big_ids = jnp.where((big_list >= 0) & prims.valid[big_safe],
                        big_safe, prims.count)
    big_rows = table16[jnp.pad(big_ids, (0, big_pad - big),
                               constant_values=prims.count)]
    big_rows = big_rows.reshape(big_pad // PACK, 128)

    scalars = jnp.concatenate([
        starts, jnp.minimum(big_count, big_list.shape[0])[None].astype(
            jnp.int32)])

    n_chunk_block = chunk_rows // PACK + 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 3), lambda i, c: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((2, n_chunk_block, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((2, big_chunk // PACK, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = _make_kernel4(tiles_x, tile_h, tile_w, unroll, n_chunk_block,
                           chunk_rows, allow_exit=zq_bits > 0,
                           with_triangles=bin_triangles,
                           big_chunk=big_chunk)
    depth_t, idf_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, 8, 128), jnp.float32),
        ],
        interpret=interpret,
    )(scalars, rows, big_rows, zmeta[None, :])

    nq = 128 // tile_w

    def assemble(t):
        return t.reshape(tiles_y, tiles_x, 8, nq, tile_w) \
            .transpose(0, 3, 2, 1, 4) \
            .reshape(tiles_y * tile_h, tiles_x * tile_w)

    depth = assemble(depth_t)[:height, :width]
    idf = assemble(idf_t)[:height, :width]
    return depth, idf, table16, diag


def rasterize_pallas_csr4(prims, width: int, height: int, tile_h: int = 32,
                          tile_w: int = 32, unroll: int = 4,
                          entry_capacity=None,
                          chunk_rows: int = DEFAULT_CHUNK_ROWS,
                          max_big: int = DEFAULT_MAX_BIG,
                          bin_triangles: bool = False,
                          interpret: bool = False,
                          return_diag: bool = False):
    """Returns (depth (H,W) f32 +inf-empty, index (H,W) i32 -1-empty).

    Generic binned path: every valid disc/capsule spanning <= 2x2 pixel
    blocks is binned; triangles and wider prims ride the big list
    (exact; O(T x big), capped at DEFAULT_MAX_BIG — check
    bin_diagnostics4 for overflow).  ``bin_triangles`` additionally bins
    small triangles (the mesh-LOD droplet mode,
    /root/reference/traj_renderer.py:529-576 droplet instancing) via a
    branchless per-slot dual eval — only the huge ground triangles stay
    big.  Ties are exact for EVERY mix of kinds (full per-pair
    lexicographic compare).  With a finite ``entry_capacity``,
    true_entry_count4(scene) must be <= it.
    """
    zeros3 = jnp.zeros((prims.count, 3), jnp.float32)
    zerosf = jnp.zeros((prims.count,), jnp.float32)
    depth, idf, _, diag = _raster_core4(
        prims, width, height, tile_h, tile_w, unroll, entry_capacity,
        chunk_rows, interpret, zeros3, zerosf, max_big=max_big,
        bin_triangles=bin_triangles)
    index = jnp.where(jnp.isinf(depth), -1, idf.astype(jnp.int32))
    if return_diag:
        return depth, index, diag
    return depth, index


def _shade_by_id(prims, camera, shading, depth, idf, shade_rgb, shade_flag,
                 uniform_look=None, three_tone=None):
    """Per-pixel winner-id shade epilogue -> (rgb, index).

    Matches shading.shade_framebuffer bit-for-bit (lambert and flat
    modes) with ONE compact 8-float per-pixel gather; shared by the v4
    and v6 fused render paths.

    ``uniform_look``: optional ((disc rgb), (preshaded big rgb)) for
    TWO-TONE scenes — narrows the per-pixel gather to 4 floats
    [x0, y0, flag, 0] with the two colors injected as constants
    (bit-identical exactly when the scene's colors really are these
    two constants; lambert mode only — the pallas_csr3 option, ported).

    ``three_tone``: optional (disc_rep, capsule_rep, tri_rep) prim ids
    for PER-KIND-CONSTANT scenes (the trail/droplet presets: gray
    lambert discs + one flat trail color + the ground).  Skips the
    whole O(P) ``_preshade`` rgb pass — the three colors are derived
    IN-GRAPH from the representative prims by _preshade's exact
    formulas (so they are bit-identical whenever every prim of a kind
    really shares its rep's color, and every triangle its rep's
    normal) — and the per-pixel gather narrows to 4 floats
    [x0, y0, flag, is_capsule].  Lambert mode only; callers pass
    shade_rgb/shade_flag = zeros (kernel-inert; nothing reads them).
    """
    width, height = camera.width, camera.height
    hit = jnp.isfinite(depth)
    index = jnp.where(hit, idf.astype(jnp.int32), -1)
    safe = jnp.where(hit, index, prims.count)  # pad row: zeros

    def lambert(px, py, inv_r):
        qx = (np.arange(width, dtype=np.float32) + 0.5)[None, :]
        qy = (np.arange(height, dtype=np.float32) + 0.5)[:, None]
        m = camera.world_to_camera_matrix()
        l_cam = jnp.stack([m[0, 2], m[1, 2], m[2, 2]])
        u = (qx - px) * inv_r
        v = -(qy - py) * inv_r
        w2 = jnp.maximum(0.0, 1.0 - u * u - v * v)
        nz = -jnp.sqrt(w2)
        ndotl = u * l_cam[0] + v * l_cam[1] + nz * l_cam[2]
        return shading.ambient + shading.diffuse * jnp.maximum(ndotl, 0.0)

    if three_tone is not None and shading.mode != "flat":
        # 3-tuple: per-kind-constant (disc, capsule, tri) reps.
        # 5-tuple: (disc, capA, capB, cap_split, tri) — capsules carry
        # TWO colors in two contiguous id runs (droplet presets: tail
        # capsules then trails; pallas_csr6.derive_four_tone) and the
        # winner id picks the run with one compare, no extra lane.
        cap_split = None
        if len(three_tone) == 5:
            d_rep, c_rep, c_rep2, cap_split, t_rep = (
                int(r) for r in three_tone)
        else:
            d_rep, c_rep, t_rep = (int(r) for r in three_tone)
        # The tones, by _preshade's exact formulas on the
        # representative prims (same inputs -> same f32 results).
        uc = prims.color[d_rep]  # raw disc color; lit applied per pixel
        ut = jnp.clip(prims.color[c_rep]
                      * jnp.float32(shading.trail_boost), 0.0, 1.0)
        if cap_split is not None:
            ut2 = jnp.clip(prims.color[c_rep2]
                           * jnp.float32(shading.trail_boost), 0.0, 1.0)
        m = camera.world_to_camera_matrix()
        l_cam = jnp.stack([m[0, 2], m[1, 2], m[2, 2]])
        ndotl_g = (prims.normal[t_rep, 0] * l_cam[0]
                   + prims.normal[t_rep, 1] * l_cam[1]
                   + prims.normal[t_rep, 2] * l_cam[2])
        lit_g = shading.ambient + shading.diffuse * jnp.maximum(ndotl_g,
                                                                0.0)
        ug = jnp.clip(prims.color[t_rep] * lit_g, 0.0, 1.0)
        # flag exactly as _preshade: inv_r for discs, -1 preshaded.
        is_disc_p = prims.kind == KIND_DISC
        inv_r_p = 1.0 / jnp.maximum(prims.params[:, 3], 1e-6)
        flag_p = jnp.where(is_disc_p, inv_r_p, -1.0)
        is_cap = (prims.kind == KIND_CAPSULE).astype(jnp.float32)
        table4 = jnp.pad(jnp.concatenate([
            prims.params[:, 0:2], flag_p[:, None], is_cap[:, None],
        ], axis=1), ((0, 1), (0, 0)))
        a = table4[safe]  # (H, W, 4)
        flag = a[..., 2]
        lit = lambert(a[..., 0], a[..., 1], flag)
        cap_rgb = ut
        if cap_split is not None:
            cap_rgb = jnp.where((index < cap_split)[..., None], ut, ut2)
        rgb = jnp.where((flag > 0)[..., None], uc * lit[..., None],
                        jnp.where((a[..., 3] > 0)[..., None], cap_rgb,
                                  ug))
        bg = np.asarray(shading.background, np.float32)
        rgb = jnp.clip(jnp.where(hit[..., None], rgb, bg), 0.0, 1.0)
        return rgb, index

    if uniform_look is not None and shading.mode != "flat":
        table4 = jnp.pad(jnp.concatenate([
            prims.params[:, 0:2], shade_flag[:, None],
            jnp.zeros((prims.count, 1), jnp.float32),
        ], axis=1), ((0, 1), (0, 0)))
        a = table4[safe]  # (H, W, 4)
        inv_r = a[..., 2]
        lit = lambert(a[..., 0], a[..., 1], inv_r)
        uc = np.asarray(uniform_look[0], np.float32)
        ub = np.asarray(uniform_look[1], np.float32)
        rgb = jnp.where((inv_r > 0)[..., None], uc * lit[..., None], ub)
        bg = np.asarray(shading.background, np.float32)
        rgb = jnp.clip(jnp.where(hit[..., None], rgb, bg), 0.0, 1.0)
        return rgb, index

    # Gathers are row-count bound but byte-width still shows at 2M
    # pixels: shade from a compact 8-float table [x0, y0, c0, c1, c2,
    # flag, 0, 0] (one O(P) repack).  Built from the soup directly —
    # under bin_triangles the kernel rows repurpose the rgb lanes.
    table8 = jnp.pad(jnp.concatenate([
        prims.params[:, 0:2], shade_rgb, shade_flag[:, None],
        jnp.zeros((prims.count, 2), jnp.float32),
    ], axis=1), ((0, 1), (0, 0)))
    a = table8[safe]  # (H, W, 8)

    if shading.mode == "flat":
        rgb = a[..., 2:5]
    else:
        inv_r = a[..., 5]
        lit = lambert(a[..., 0], a[..., 1], inv_r)
        is_disc = inv_r > 0
        rgb = jnp.where(is_disc[..., None], a[..., 2:5] * lit[..., None],
                        a[..., 2:5])

    bg = np.asarray(shading.background, np.float32)
    rgb = jnp.clip(jnp.where(hit[..., None], rgb, bg), 0.0, 1.0)
    return rgb, index


def render_shaded_csr4(prims, camera, shading, tile_h: int = 32,
                       tile_w: int = 32, unroll: int = 4,
                       entry_capacity=None,
                       chunk_rows: int = DEFAULT_CHUNK_ROWS,
                       max_big: int = DEFAULT_MAX_BIG,
                       bin_triangles: bool = False,
                       interpret: bool = False,
                       return_diag: bool = False):
    """Rasterize + shade in one pass: (rgb, depth, index).

    Matches shading.shade_framebuffer bit-for-bit (lambert and flat
    modes) with ONE 16-float per-pixel gather of the prim table by
    winner id.  Same preconditions as rasterize_pallas_csr4.
    """
    width, height = camera.width, camera.height
    shade_rgb, shade_flag = _preshade(prims, camera, shading)
    depth, idf, table16, diag = _raster_core4(
        prims, width, height, tile_h, tile_w, unroll, entry_capacity,
        chunk_rows, interpret, shade_rgb, shade_flag, max_big=max_big,
        bin_triangles=bin_triangles)
    rgb, index = _shade_by_id(prims, camera, shading, depth, idf,
                              shade_rgb, shade_flag)
    if return_diag:
        return rgb, depth, index, diag
    return rgb, depth, index
