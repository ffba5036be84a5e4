"""CSR Pallas rasterizer v5: CHUNK-binned disc path for spatially
ordered clouds — the sort/gather walls removed.

Round-2 profiling (docs/KERNEL_NOTES.md) left the v3 frame dominated by
two XLA-primitive-bound stages: the 4M-SLOT binning sort (~11.5 ms; 4
static slots per prim, ~70% sentinels) and the 1.2M-row entry gather
(~10.9 ms; per-row gathers cost ~9 ns REGARDLESS of row width), plus a
7.6 ms per-pixel winner-attribute shade gather.  v5 removes all three by
changing the BINNING GRANULARITY:

* the cloud is spatially ordered once per scene (Morton order,
  scene/spatial.py) so every run of K=16 consecutive primitives is a
  compact world-space cell;
* binning operates on CHUNKS of 16 prims: per-chunk screen bbox + depth
  min are cheap segment reduces, and the (tile, z-bucket) sort handles
  C = P/16 chunks x 4 slots — 250k slots at 1M points instead of 4M
  (~16x less sort);
* the sorted-entry gather fetches ONE 128-lane superrow per chunk entry
  (16 prims x 8 floats) — ~90k row-count-bound gathers instead of 1.2M
  (row gathers are count-bound, so 16x fewer rows ~= 16x cheaper);
* shading is FUSED INTO THE KERNEL: the merge carries the winner's
  (z, id, px, py, r[, rgb]) and the tile epilogue evaluates the same
  sphere-Lambert formula as shading.shade_framebuffer vectorized over
  the (8, 128) pixel block — the 2M-pixel shade gather disappears.

Exactness structure (the lexicographic (depth, id) contract):

* WITHIN a superrow the 16 prims ascend in primitive id (chunks are
  consecutive id ranges), so a strict-< merge into the row accumulator
  keeps the lowest id on equal depths — no per-pair tie-break ops;
* ACROSS rows the chunk order follows the chunk's DEPTH MIN bucket, not
  the individual prim depth, so equal-depth prims can arrive in either
  order — the row winner merges into the global accumulator with a FULL
  (depth, id) lexicographic compare, once per 16 prims.  The winner is
  therefore ORDER-INDEPENDENT (unstable chunk sort is fine);
* the winner id inside a row is reconstructed as base + slot, where
  base is the chunk's first prim id (ONE scalar read per row — ids
  don't ride the per-pair selects) and slot is a selected constant;
* the depth early-exit generalizes v3's: entries ascend in chunk-zmin
  bucket (i32 keys afford 2^10 buckets vs v3's 2^4), every prim of every
  unstreamed chunk has z >= the last streamed chunk's zmin-bucket floor,
  and the kernel re-derives that floor from the row's 16 depth scalars
  (invalid slots hold +inf, so the row min IS the binning's chunk zmin,
  bit-for-bit).  Exit checks run every `check_every` rows — 16-32 prims
  — against v3's 512-entry granularity.

Row format (8 f32 per prim, 16 prims per 128-lane superrow):
  [px, py, z, r, idf, c0, c1, c2]
  invalid / non-disc / culled slots: r = 0 (covers no pixel center), and
  z = +inf (keeps the row depth-min equal to the binning's chunk zmin).

Scope: binned prims are DISCS whose CHUNK bbox spans <= max_span^2
pixel blocks (static sentinel-masked slot pattern, default 4x4);
capsules, triangles, and members of wider chunks ride the per-prim big
list (exact, O(T x big), capped — bin_diagnostics5).  Scenes without
spatial order degrade to big-list overflow, loudly.

Contract (unchanged): winner per pixel = lexicographic min of
(depth, primitive index); division-free per-pixel COVERAGE math
(primitives.py); the fused shade epilogue evaluates the identical
formula as shading.shade_framebuffer (one divide + sqrt per pixel,
exactly as the XLA shade pass).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pointcloud_render_tpu.raster.pallas_csr import _eval_scalar
from pointcloud_render_tpu.raster.pallas_csr3 import _preshade
from pointcloud_render_tpu.raster.primitives import KIND_DISC

INF = np.float32(np.inf)
F_EMPTY = np.float32(1 << 24)  # > every representable prim id
DEFAULT_K = 16  # prims per chunk (superrow = k * 8 lanes)
ROW_F = 8  # px, py, z, r, idf, c0, c1, c2
ZQ_BITS = 10  # chunk-zmin depth buckets in the i32 sort key
DEFAULT_CHUNK_ROWS = 32  # superrows per DMA (512 prims)
DEFAULT_CHECK_EVERY = 2  # early-exit check cadence (rows)
DEFAULT_MAX_BIG = 1024
DEFAULT_MAX_SPAN = 4  # tiles per axis a binned chunk may cover
DEFAULT_MAX_SPILL = 32768  # singleton rows for discs of wider chunks


def _chunk_reduce(x, c, k, fill, op):
    return op(jnp.pad(x, (0, c * k - x.shape[0]), constant_values=fill)
              .reshape(c, k), axis=1)


def _bin_chunks5(prims, tile_h, tile_w, num_tiles, tiles_x, tiles_y,
                 max_big=DEFAULT_MAX_BIG, max_span=DEFAULT_MAX_SPAN,
                 max_spill=DEFAULT_MAX_SPILL, k=DEFAULT_K):
    """Chunk bbox/zmin reduce + masked max_span^2 expansion + UNSTABLE
    i32 sort, with a SINGLETON SPILL for discs of wider chunks.

    A chunk covering (ntx, nty) tiles emits ntx*nty live slots out of a
    STATIC max_span^2 pattern (the rest sort as sentinels) — wide-chunk
    tolerance costs sort slots, not exactness.  max_span=4 admits any
    chunk bbox up to 3 tile-strides per axis (96 px at 32x32), which
    covers Morton cells of 1M-point clouds through most of the
    traj_ball dolly.  Discs of WIDER chunks (close-camera frames,
    partially ordered clouds) spill into per-prim SINGLETON rows: each
    gets a virtual chunk id >= C whose table row holds just that prim
    (slot 0) and pads, binned 2x2 on its OWN bbox — the same sort, the
    same row stream, the same kernel; a singleton row simply wastes 15
    inert slot evaluations.  Only discs beyond ``max_spill`` (or
    spanning > 2 tiles themselves) ride the big list, loudly.

    Returns (sorted_keys, sorted_chunks, big_list, big_count, zmeta,
    binnable, spill) — zmeta = [zmin, s, thr_scale] over the binned
    chunks' depth MIN (sound lower bound for every member prim),
    binnable the per-prim "rides the chunk rows" mask, and spill =
    (sok, srank) the per-prim singleton mask/slot assignment.
    """
    p = prims.count
    c = -(-p // k)
    is_disc = prims.valid & (prims.kind == KIND_DISC)

    xmin = jnp.where(is_disc, prims.bbox[:, 0], INF)
    xmax = jnp.where(is_disc, prims.bbox[:, 1], -INF)
    ymin = jnp.where(is_disc, prims.bbox[:, 2], INF)
    ymax = jnp.where(is_disc, prims.bbox[:, 3], -INF)
    z = jnp.where(is_disc, prims.params[:, 2], INF)

    cxmin = _chunk_reduce(xmin, c, k, INF, jnp.min)
    cxmax = _chunk_reduce(xmax, c, k, -INF, jnp.max)
    cymin = _chunk_reduce(ymin, c, k, INF, jnp.min)
    cymax = _chunk_reduce(ymax, c, k, -INF, jnp.max)
    czmin = _chunk_reduce(z, c, k, INF, jnp.min)
    has = jnp.isfinite(cxmin)

    tx0 = jnp.clip(jnp.floor(cxmin / tile_w).astype(jnp.int32), 0, tiles_x - 1)
    tx1 = jnp.clip(jnp.floor(cxmax / tile_w).astype(jnp.int32), 0, tiles_x - 1)
    ty0 = jnp.clip(jnp.floor(cymin / tile_h).astype(jnp.int32), 0, tiles_y - 1)
    ty1 = jnp.clip(jnp.floor(cymax / tile_h).astype(jnp.int32), 0, tiles_y - 1)
    ntx = jnp.where(has, tx1 - tx0 + 1, 0)
    nty = jnp.where(has, ty1 - ty0 + 1, 0)
    fits = has & (ntx <= max_span) & (nty <= max_span)

    # Per-prim routing: discs of fitting chunks ride the chunk rows;
    # discs of wider chunks spill to singleton rows (their own 2x2
    # span); everything else valid (capsule/triangle/over-spill) big.
    fit_per_prim = jnp.repeat(fits, k)[:p]
    binnable = is_disc & fit_per_prim
    wide_per_prim = jnp.repeat(has & ~fits, k)[:p]
    spill = is_disc & wide_per_prim
    ptx0 = jnp.clip(jnp.floor(prims.bbox[:, 0] / tile_w).astype(jnp.int32),
                    0, tiles_x - 1)
    ptx1 = jnp.clip(jnp.floor(prims.bbox[:, 1] / tile_w).astype(jnp.int32),
                    0, tiles_x - 1)
    pty0 = jnp.clip(jnp.floor(prims.bbox[:, 2] / tile_h).astype(jnp.int32),
                    0, tiles_y - 1)
    pty1 = jnp.clip(jnp.floor(prims.bbox[:, 3] / tile_h).astype(jnp.int32),
                    0, tiles_y - 1)
    pntx = ptx1 - ptx0 + 1
    pnty = pty1 - pty0 + 1
    srank = jnp.cumsum(spill.astype(jnp.int32)) - 1
    sok = (spill & (pntx <= 2) & (pnty <= 2) & (srank < max_spill))
    is_big = prims.valid & ~(binnable | sok)

    # Bucket range spans fit-chunk zmins AND spilled-prim depths: a
    # spill entry with z below the fit range would otherwise clip to a
    # bucket whose floor EXCEEDS its true depth, letting the in-kernel
    # early exit fire before it streams (an order-dependent drop — the
    # unstable sort decides whether the exit sees it first).
    nb = np.float32(1 << ZQ_BITS)
    zmin = jnp.minimum(jnp.min(jnp.where(fits, czmin, INF)),
                       jnp.min(jnp.where(spill, z, INF)))
    zmax = jnp.maximum(jnp.max(jnp.where(fits, czmin, -INF)),
                       jnp.max(jnp.where(spill, z, -INF)))
    rngz = zmax - zmin
    s = jnp.where(rngz > 0, nb / rngz, 0.0)
    qz = jnp.clip(jnp.floor((czmin - zmin) * s), 0.0, nb - 1).astype(jnp.int32)
    qz = jnp.where(has, qz, 0)
    thr_scale = jnp.where(s > 0, np.float32(1.0 - 1e-6) / s, 0.0)
    zmeta = jnp.stack([jnp.where(jnp.isfinite(zmin), zmin, 0.0),
                       s, thr_scale])

    chunk_id = np.arange(c, dtype=np.int32)
    home = ((ty0 * tiles_x + tx0) << ZQ_BITS) | qz
    sent = np.int32(num_tiles << ZQ_BITS)
    keys = []
    for dy in range(max_span):  # static masked pattern
        for dx in range(max_span):
            ok = fits & (dx < ntx) & (dy < nty)
            keys.append(jnp.where(
                ok, home + ((dy * tiles_x + dx) << ZQ_BITS), sent))
    n_slots = max_span * max_span
    flat_key = jnp.stack(keys, axis=1).reshape(-1)
    flat_chunks = jnp.broadcast_to(chunk_id[:, None],
                                   (c, n_slots)).reshape(-1)

    # Singleton spill keys: 2x2 of the PRIM's own bbox, z-bucketed on
    # the same chunk scale (clipped — monotone in z, so the early-exit
    # sort invariant holds).  ONE row-scatter builds all 4 slot keys
    # (TPU scatters lower to sort-like programs — each extra scatter
    # costs real milliseconds at 1M indices), and the payload needs no
    # scatter at all: slot i of the spill array ALWAYS belongs to
    # virtual chunk c + i//4, occupied or not (unoccupied slots carry
    # sentinel keys and sort to the truncated tail).
    zq_p = jnp.clip(jnp.floor((z - zmin) * s), 0.0, nb - 1).astype(jnp.int32)
    phome = ((pty0 * tiles_x + ptx0) << ZQ_BITS) | zq_p
    key4 = []
    for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        okp = sok
        if dx:
            okp = okp & (pntx == 2)
        if dy:
            okp = okp & (pnty == 2)
        key4.append(jnp.where(okp, phome + ((dy * tiles_x + dx) << ZQ_BITS),
                              sent))
    key4 = jnp.stack(key4, axis=1)  # (P, 4)
    skeys = jnp.full((max_spill + 1, 4), sent, jnp.int32)
    sidx = jnp.where(sok, srank, max_spill)
    skeys = skeys.at[sidx].set(key4, mode="drop")
    spayload = np.int32(c) + (np.arange(max_spill * 4, dtype=np.int32) // 4)
    flat_key = jnp.concatenate([flat_key, skeys[:-1].reshape(-1)])
    flat_chunks = jnp.concatenate([flat_chunks, jnp.asarray(spayload)])
    sorted_keys, sorted_chunks = jax.lax.sort(
        (flat_key, flat_chunks), num_keys=1, is_stable=False)

    prim_id = np.arange(p, dtype=np.int32)
    big_rank = jnp.cumsum(is_big.astype(jnp.int32)) - 1
    big_idx = jnp.where(is_big & (big_rank < max_big), big_rank, max_big)
    big_list = jnp.full((max_big + 1,), -1, jnp.int32)
    big_list = big_list.at[big_idx].set(prim_id, mode="drop")
    big_list = big_list[:-1]
    big_count = jnp.sum(is_big.astype(jnp.int32))
    return (sorted_keys, sorted_chunks, big_list, big_count, zmeta,
            binnable, (sok, srank))


PAD8 = np.array([0.0, 0.0, np.inf, 0.0, float(F_EMPTY), 0.0, 0.0, 0.0],
                np.float32)


def _build_table5(prims, binnable, shade_rgb, k=DEFAULT_K):
    """(C*k, 8) f32 rows [px, py, z, r, idf, c0, c1, c2]; non-binnable
    slots are inert (r = 0) with z = +inf (row depth-min == chunk zmin)."""
    p = prims.count
    c = -(-p // k)
    idf = jnp.arange(p, dtype=jnp.float32)
    table = jnp.concatenate([
        prims.params[:, 0:2],
        jnp.where(binnable, prims.params[:, 2], INF)[:, None],
        jnp.where(binnable, prims.params[:, 3], 0.0)[:, None],
        idf[:, None],
        shade_rgb,
    ], axis=1)
    pad_row = jnp.asarray(PAD8)
    return jnp.concatenate(
        [table, jnp.broadcast_to(pad_row, (c * k - p, ROW_F))], axis=0)


def _build_singletons5(prims, sok, srank, max_spill, shade_rgb,
                       k=DEFAULT_K):
    """(max_spill, 128) singleton superrows: the spilled prim in slot 0,
    15 inert pad slots (z = +inf keeps the row depth-min == the prim z,
    matching its sort bucket — the early-exit bound stays sound)."""
    p = prims.count
    idf = jnp.arange(p, dtype=jnp.float32)
    row8 = jnp.concatenate([
        prims.params[:, 0:2],
        jnp.where(sok, prims.params[:, 2], INF)[:, None],
        jnp.where(sok, prims.params[:, 3], 0.0)[:, None],
        idf[:, None],
        shade_rgb,
    ], axis=1)
    sidx = jnp.where(sok, srank, max_spill)
    s8 = jnp.broadcast_to(jnp.asarray(PAD8), (max_spill + 1, ROW_F))
    s8 = s8.at[sidx].set(row8, mode="drop")[:max_spill]
    tail = jnp.broadcast_to(jnp.asarray(np.tile(PAD8, k - 1)),
                            (max_spill, (k - 1) * ROW_F))
    return jnp.concatenate([s8, tail], axis=1)


def _make_kernel5(tiles_x, tile_h, tile_w, unroll, chunk_rows, check_every,
                  allow_exit, fused, uniform, k=DEFAULT_K):
    assert chunk_rows % check_every == 0

    def kernel(starts_ref,  # scalar prefetch: (T+2,) i32; [T+1] = big count
               rows_hbm,  # (E_pad, 128) f32 in ANY/HBM
               big_params_ref,  # SMEM (17, BIG) f32
               big_kinds_ref,  # SMEM (1, BIG) i32
               meta_ref,  # SMEM (1, 16) f32 (see _raster_core5)
               *out_and_scratch):
        if fused:
            depth_out, idf_out, r_out, g_out, b_out = out_and_scratch[:5]
            scratch, sems = out_and_scratch[5:]
        else:
            depth_out, idf_out = out_and_scratch[:2]
            scratch, sems = out_and_scratch[2:]
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

        def get_dma(slot, ci):
            return pltpu.make_async_copy(
                rows_hbm.at[pl.ds(start + ci * chunk_rows, chunk_rows), :],
                scratch.at[slot],
                sems.at[slot],
            )

        @pl.when(n_chunks > 0)
        def _():
            get_dma(0, 0).start()

        # Big primitives first (full per-pair lexicographic tie-break,
        # as pallas_csr4).  Fused carries: rf = r for discs (per-pixel
        # lambert at the epilogue) or -1 (row 16: preshaded color).
        n_carry = 8 if fused else 2

        def big_body(j, carry):
            d, di = carry[0], carry[1]
            kind = big_kinds_ref[0, j]
            p = tuple(big_params_ref[r, j] for r in range(12))
            idf = big_params_ref[12, j]
            zc = _eval_scalar(kind, p, qx, qy)
            better = (zc < d) | ((zc == d) & (idf < di))

            def sel(a, b):
                return jnp.where(better, a, b)

            out = (sel(zc, d), sel(idf, di))
            if fused:
                out += (sel(p[0], carry[2]), sel(p[1], carry[3]),
                        sel(big_params_ref[16, j], carry[4]),
                        sel(big_params_ref[13, j], carry[5]),
                        sel(big_params_ref[14, j], carry[6]),
                        sel(big_params_ref[15, j], carry[7]))
            return out

        zero = jnp.zeros((8, 128), jnp.float32)
        init = (jnp.full((8, 128), INF, jnp.float32),
                jnp.full((8, 128), F_EMPTY, jnp.float32))
        if fused:
            init += (zero, zero, jnp.full((8, 128), -1.0, jnp.float32),
                     zero, zero, zero)
        g_acc = jax.lax.fori_loop(0, big_n, big_body, init)

        if uniform:
            ucr = meta_ref[0, 11]
            ucg = meta_ref[0, 12]
            ucb = meta_ref[0, 13]

        def do_row(slot, br, g):
            """One superrow: 16 id-ascending discs -> row winner (strict
            < within `unroll` chains + (z, slot) chain merge) -> global
            merge with the full (z, id) lexicographic compare."""
            base_idf = scratch[slot, br, 4]  # prim 0's id == chunk base
            chains = []
            for _ in range(unroll):
                ch = [jnp.full((8, 128), INF, jnp.float32),  # z
                      jnp.full((8, 128), np.float32(k), jnp.float32)]  # slot
                if fused:
                    ch += [zero, zero, zero]  # px, py, r
                    if not uniform:
                        ch += [zero, zero, zero]  # rgb
                chains.append(ch)
            for u in range(k):
                lane = u * ROW_F
                px = scratch[slot, br, lane]
                py = scratch[slot, br, lane + 1]
                z = scratch[slot, br, lane + 2]
                r = scratch[slot, br, lane + 3]
                ch = chains[u % unroll]
                dx = qx - px
                dy = qy - py
                better = (dx * dx + dy * dy <= r * r) & (z < ch[0])
                vals = [z, np.float32(u)]
                if fused:
                    vals += [px, py, r]
                    if not uniform:
                        vals += [scratch[slot, br, lane + 5],
                                 scratch[slot, br, lane + 6],
                                 scratch[slot, br, lane + 7]]
                for i, v in enumerate(vals):
                    ch[i] = jnp.where(better, v, ch[i])
            row = chains[0]
            for ch in chains[1:]:
                better = (ch[0] < row[0]) | ((ch[0] == row[0])
                                             & (ch[1] < row[1]))
                row = [jnp.where(better, a, b) for a, b in zip(ch, row)]
            idf_r = base_idf + row[1]
            gz, gi = g[0], g[1]
            better = (row[0] < gz) | ((row[0] == gz) & (idf_r < gi))

            def sel(a, b):
                return jnp.where(better, a, b)

            out = (sel(row[0], gz), sel(idf_r, gi))
            if fused:
                out += (sel(row[2], g[2]), sel(row[3], g[3]),
                        sel(row[4], g[4]))
                if uniform:
                    out += (sel(ucr, g[5]), sel(ucg, g[6]), sel(ucb, g[7]))
                else:
                    out += (sel(row[5], g[5]), sel(row[6], g[6]),
                            sel(row[7], g[7]))
            return out

        if allow_exit:
            zmin_s = meta_ref[0, 0]
            zs = meta_ref[0, 1]
            thr = meta_ref[0, 2]

        def run_chunk(ci, done_in, g_in):
            """Process one DMA'd chunk in check_every-row blocks with an
            early-exit check after each block.  Rows past the run's end
            (other tiles' chunks, +inf pads) are processed unguarded —
            sound: the merge is order-independent and idempotent, a
            foreign chunk either cannot cover this tile or duplicates an
            own entry, and pads cover nothing."""
            slot = jax.lax.rem(ci, 2)
            nr = jnp.minimum(chunk_rows, count - ci * chunk_rows)
            n_blocks = pl.cdiv(nr, check_every)

            def cond(c):
                return (c[0] < n_blocks) & jnp.logical_not(c[1])

            def body(c):
                bk = c[0]
                g = c[2:]
                br0 = bk * check_every
                for step in range(check_every):  # NOT `k` — the chunk
                    g = do_row(slot, br0 + step, g)  # size is in scope
                done2 = jnp.bool_(False)
                if allow_exit:
                    # Lower bound for every unstreamed prim: the last
                    # processed row's depth MIN is the chunk's binning
                    # zmin (invalid slots hold +inf), whose bucket floor
                    # (one bucket + 1e-6 margin back, as pallas_csr3)
                    # bounds all later-sorted chunks.  A foreign row can
                    # only LOWER the bound (delays exit, never wrong).
                    lr = br0 + (check_every - 1)
                    zrow = scratch[slot, lr, 2]
                    for u in range(1, k):
                        zrow = jnp.minimum(zrow,
                                           scratch[slot, lr, u * ROW_F + 2])
                    qz = jnp.maximum(jnp.floor((zrow - zmin_s) * zs) - 1.0,
                                     0.0)
                    dmax = jnp.max(g[0])
                    # STRICT >: ties must stay reachable — a remaining
                    # equal-depth chunk can carry a LOWER id and the
                    # cross-row merge is fully lexicographic (ADVICE r2).
                    done2 = zmin_s + qz * thr > dmax
                return (bk + 1, done2) + g

            out = jax.lax.while_loop(
                cond, body, (jnp.int32(0), done_in) + g_in)
            return out[1], out[2:]

        def cond(c):
            return (c[0] < n_chunks) & jnp.logical_not(c[1])

        def body(c):
            ci = c[0]
            slot = jax.lax.rem(ci, 2)

            @pl.when(ci + 1 < n_chunks)
            def _():
                get_dma(jax.lax.rem(ci + 1, 2), ci + 1).start()

            get_dma(slot, ci).wait()
            done, g = run_chunk(ci, jnp.bool_(False), c[2:])
            return (ci + 1, done) + g

        final = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.bool_(False)) + g_acc)
        ci_end, done = final[0], final[1]
        g = final[2:]

        # Drain the prefetch issued for the never-processed chunk.
        @pl.when(done & (ci_end < n_chunks))
        def _():
            get_dma(jax.lax.rem(ci_end, 2), ci_end).wait()

        depth, idf = g[0], g[1]
        depth_out[0, :, :] = depth
        idf_out[0, :, :] = idf
        if fused:
            # Sphere-Lambert epilogue — the same formula as
            # shading.shade_framebuffer, vectorized over the pixel block
            # (one divide + sqrt per pixel; rf <= 0 rows are preshaded).
            px, py, rf = g[2], g[3], g[4]
            cr, cg, cb = g[5], g[6], g[7]
            lx = meta_ref[0, 3]
            ly = meta_ref[0, 4]
            lz = meta_ref[0, 5]
            amb = meta_ref[0, 6]
            dif = meta_ref[0, 7]
            inv_r = 1.0 / jnp.maximum(rf, 1e-6)
            u = (qx - px) * inv_r
            v = -(qy - py) * inv_r
            w2 = jnp.maximum(0.0, 1.0 - u * u - v * v)
            nz = -jnp.sqrt(w2)
            ndotl = u * lx + v * ly + nz * lz
            lit = amb + dif * jnp.maximum(ndotl, 0.0)
            is_disc = rf > 0
            hit = depth < INF
            for out_ref, cc, bgi in ((r_out, cr, 8), (g_out, cg, 9),
                                     (b_out, cb, 10)):
                val = jnp.where(is_disc, cc * lit, cc)
                val = jnp.where(hit, val, meta_ref[0, bgi])
                out_ref[0, :, :] = jnp.clip(val, 0.0, 1.0)

    return kernel


def _assemble(t, tiles_y, tiles_x, tile_h, tile_w, height, width):
    nq = 128 // tile_w
    return t.reshape(tiles_y, tiles_x, 8, nq, tile_w) \
        .transpose(0, 3, 2, 1, 4) \
        .reshape(tiles_y * tile_h, tiles_x * tile_w)[:height, :width]


def _raster_core5(prims, width, height, tile_h, tile_w, unroll,
                  entry_capacity, chunk_rows, check_every, interpret,
                  fused, shade_rgb, big_rgb, big_rflag, meta_tail,
                  uniform, max_big, max_span=DEFAULT_MAX_SPAN,
                  max_spill=DEFAULT_MAX_SPILL, k=DEFAULT_K):
    if tile_h * tile_w != 1024 or tile_w not in (16, 32, 64, 128):
        raise ValueError(
            "pallas_csr5 pixel blocks must hold exactly one (8, 128) "
            "f32 VREG: tile_h * tile_w == 1024 with tile_w in "
            "{16, 32, 64, 128}")
    if prims.count >= (1 << 24):
        raise ValueError("float id encoding supports < 2^24 primitives")
    tiles_y = -(-height // tile_h)
    tiles_x = -(-width // tile_w)
    num_tiles = tiles_y * tiles_x

    (sorted_keys, sorted_chunks, big_list, big_count, zmeta, binnable,
     (sok, srank)) = _bin_chunks5(prims, tile_h, tile_w, num_tiles,
                                  tiles_x, tiles_y, max_big=max_big,
                                  max_span=max_span, max_spill=max_spill,
                                  k=k)

    starts = jnp.searchsorted(
        sorted_keys,
        np.arange(num_tiles + 1, dtype=np.int32) << ZQ_BITS
    ).astype(jnp.int32)
    true_count = starts[num_tiles]

    e = sorted_chunks.shape[0]
    if entry_capacity is not None:
        e = min(e, int(entry_capacity))
        sorted_chunks = sorted_chunks[:e]
        starts = jnp.minimum(starts, e)
    e_pad = -(-(e + chunk_rows) // chunk_rows) * chunk_rows

    table = _build_table5(prims, binnable, shade_rgb, k=k)
    c = table.shape[0] // k
    sing = _build_singletons5(prims, sok, srank, max_spill, shade_rgb,
                              k=k)
    pad_row = jnp.asarray(np.tile(PAD8, k))[None, :]
    chunk_tab = jnp.concatenate([table.reshape(c, k * ROW_F), sing,
                                 pad_row], axis=0)
    pad_id = c + max_spill
    chunks_p = jnp.pad(sorted_chunks, (0, e_pad - e),
                       constant_values=pad_id)
    rows = chunk_tab[chunks_p]  # (e_pad, k*8) — THE superrow gather

    big_safe = jnp.maximum(big_list, 0)
    big_kinds = jnp.where(big_list >= 0, prims.kind[big_safe], -1)[None, :]
    big_params = jnp.zeros((17, big_list.shape[0]), jnp.float32)
    big_params = big_params.at[:12, :].set(prims.params[big_safe].T)
    big_params = big_params.at[12, :].set(big_safe.astype(jnp.float32))
    big_params = big_params.at[13:16, :].set(big_rgb[big_safe].T)
    big_params = big_params.at[16, :].set(big_rflag[big_safe])

    meta = jnp.concatenate([zmeta, jnp.asarray(meta_tail, jnp.float32),
                            jnp.zeros((16 - 3 - len(meta_tail),),
                                      jnp.float32)])

    scalars = jnp.concatenate([
        starts,
        jnp.minimum(big_count, big_list.shape[0])[None].astype(jnp.int32)])

    n_out = 5 if fused else 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((17, big_list.shape[0]), lambda i, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, big_list.shape[0]), lambda i, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 16), lambda i, c: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[pl.BlockSpec((1, 8, 128), lambda i, c: (i, 0, 0),
                                memory_space=pltpu.VMEM)] * n_out,
        scratch_shapes=[
            pltpu.SMEM((2, chunk_rows, k * ROW_F), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = _make_kernel5(tiles_x, tile_h, tile_w, unroll, chunk_rows,
                           check_every, allow_exit=True, fused=fused,
                           uniform=uniform, k=k)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((num_tiles, 8, 128), jnp.float32)
                   ] * n_out,
        interpret=interpret,
    )(scalars, rows, big_params, big_kinds, meta[None, :])

    outs = [_assemble(t, tiles_y, tiles_x, tile_h, tile_w, height, width)
            for t in outs]
    diag = dict(true_entries=true_count,
                big_overflow=jnp.maximum(
                    big_count - big_list.shape[0], 0))
    return outs, diag


def true_entry_count5(prims, width: int, height: int, tile_h: int = 32,
                      tile_w: int = 32, max_span: int = DEFAULT_MAX_SPAN,
                      max_spill: int = DEFAULT_MAX_SPILL,
                      k: int = DEFAULT_K):
    """() int32 non-sentinel CHUNK entries (superrows) under the chunk
    binning — the exactness precondition for a finite entry_capacity."""
    tiles_y = -(-height // tile_h)
    tiles_x = -(-width // tile_w)
    num_tiles = tiles_y * tiles_x
    sorted_keys, *_ = _bin_chunks5(prims, tile_h, tile_w, num_tiles,
                                   tiles_x, tiles_y, max_span=max_span,
                                   max_spill=max_spill, k=k)
    return jnp.searchsorted(
        sorted_keys, jnp.int32(num_tiles << ZQ_BITS)).astype(jnp.int32)


def bin_diagnostics5(prims, width: int, height: int, tile_h: int = 32,
                     tile_w: int = 32, max_big: int = DEFAULT_MAX_BIG,
                     max_span: int = DEFAULT_MAX_SPAN,
                     max_spill: int = DEFAULT_MAX_SPILL,
                     k: int = DEFAULT_K):
    """Big-list overflow count under the chunk binning (0 = exact)."""
    tiles_y = -(-height // tile_h)
    tiles_x = -(-width // tile_w)
    num_tiles = tiles_y * tiles_x
    _, _, big_list, big_count, _, _, _ = _bin_chunks5(
        prims, tile_h, tile_w, num_tiles, tiles_x, tiles_y,
        max_big=max_big, max_span=max_span, max_spill=max_spill, k=k)
    return jnp.maximum(big_count - big_list.shape[0], 0)


def rasterize_pallas_csr5(prims, width: int, height: int,
                          tile_h: int = 32, tile_w: int = 32,
                          unroll: int = 2, entry_capacity=None,
                          chunk_rows: int = DEFAULT_CHUNK_ROWS,
                          check_every: int = DEFAULT_CHECK_EVERY,
                          max_big: int = DEFAULT_MAX_BIG,
                          max_span: int = DEFAULT_MAX_SPAN,
                          max_spill: int = DEFAULT_MAX_SPILL,
                          k: int = DEFAULT_K,
                          interpret: bool = False,
                          return_diag: bool = False):
    """Returns (depth (H,W) f32 +inf-empty, index (H,W) i32 -1-empty).

    Chunk-binned disc path for SPATIALLY ORDERED clouds (scene/spatial):
    valid discs whose 16-prim chunk spans <= 2x2 pixel blocks are
    binned; capsules, triangles, and wide-chunk members ride the
    per-prim big list (exact; O(T x big), capped at ``max_big`` — check
    ``return_diag``/bin_diagnostics5 for overflow).  Ties are exact for
    every mix (order-independent lexicographic merge).  With a finite
    ``entry_capacity``, true_entry_count5(scene) must be <= it; the
    ``return_diag`` dict carries the device-side true count for
    post-hoc certification.
    """
    zeros3 = jnp.zeros((prims.count, 3), jnp.float32)
    zerosf = jnp.zeros((prims.count,), jnp.float32)
    (depth, idf), diag = _raster_core5(
        prims, width, height, tile_h, tile_w, unroll, entry_capacity,
        chunk_rows, check_every, interpret, False, zeros3, zeros3, zerosf,
        (), False, max_big, max_span, max_spill, k)
    index = jnp.where(jnp.isinf(depth), -1, idf.astype(jnp.int32))
    if return_diag:
        return depth, index, diag
    return depth, index


def render_shaded_csr5(prims, camera, shading, tile_h: int = 32,
                       tile_w: int = 32, unroll: int = 2,
                       entry_capacity=None,
                       chunk_rows: int = DEFAULT_CHUNK_ROWS,
                       check_every: int = DEFAULT_CHECK_EVERY,
                       max_big: int = DEFAULT_MAX_BIG,
                       max_span: int = DEFAULT_MAX_SPAN,
                       max_spill: int = DEFAULT_MAX_SPILL,
                       k: int = DEFAULT_K,
                       uniform_color=None,
                       interpret: bool = False,
                       return_diag: bool = False):
    """Rasterize + shade fully fused: (rgb, depth, index).

    The shade epilogue runs INSIDE the kernel on the carried winner
    attributes — no per-pixel gather at all.  It evaluates the identical
    formula as shading.shade_framebuffer (lambert / flat).

    ``uniform_color``: optional (r, g, b) — when EVERY binned disc has
    this color (the reference presets' constant gray), the kernel skips
    3 reads + 3 selects per pair and injects the color at row merges.
    """
    width, height = camera.width, camera.height
    shade_rgb, _flag = _preshade(prims, camera, shading)
    is_disc = prims.kind == KIND_DISC
    big_rflag = jnp.where(is_disc, prims.params[:, 3], -1.0)
    m = camera.world_to_camera_matrix()
    if shading.mode == "flat":
        l_cam = (0.0, 0.0, 0.0)
        amb, dif = 1.0, 0.0
    else:
        l_cam = (m[0, 2], m[1, 2], m[2, 2])
        amb, dif = shading.ambient, shading.diffuse
    bg = tuple(np.asarray(shading.background, np.float32))
    uc = (0.0, 0.0, 0.0) if uniform_color is None else tuple(uniform_color)
    meta_tail = tuple(l_cam) + (amb, dif) + bg + uc
    (depth, idf, r_, g_, b_), diag = _raster_core5(
        prims, width, height, tile_h, tile_w, unroll, entry_capacity,
        chunk_rows, check_every, interpret, True, shade_rgb, shade_rgb,
        big_rflag, meta_tail, uniform_color is not None, max_big,
        max_span, max_spill, k)
    hit = jnp.isfinite(depth)
    index = jnp.where(hit, idf.astype(jnp.int32), -1)
    rgb = jnp.stack([r_, g_, b_], axis=-1)
    if return_diag:
        return rgb, depth, index, diag
    return rgb, depth, index
