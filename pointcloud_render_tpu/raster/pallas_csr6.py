"""CSR Pallas rasterizer v6: ANCHOR-SORTED binning (per-prim sort).

v3/v4 bin by expanding every <=2x2-tile prim into 4 key slots and
sorting 4P entries; at 1M discs that sort is 4.6 ms and at the 9M-prim
trail soup it is 94 ms (benchmarks/v6_probe.py) — the dominant frame
cost.  v6 sorts each prim ONCE by its ANCHOR (top-left covered tile)
with its spill class and z-bucket in the key:

    key = ((anchor * 4 + cls) << ZQ) | qz        (int32)
    cls = (spans 2 tiles in x) + 2 * (spans 2 tiles in y)

A tile t's entries are then FIVE contiguous ranges of the prim-sorted
order (B = searchsorted boundaries at every (anchor, cls)):

    r0: B[4t]          .. B[4t + 4]         every prim anchored at t
    r1: B[4(t-1) + 1]  .. B[4(t-1) + 2]     left neighbors, cls 1
    r2: B[4(t-1) + 3]  .. B[4(t-1) + 4]     left neighbors, cls 3
    r3: B[4(t-tx) + 2] .. B[4(t-tx) + 4]    up neighbors, cls {2, 3}
    r4: B[4(t-tx-1)+3] .. B[4(t-tx-1) + 4]  diag neighbors, cls 3

The union is EXACTLY the set of binned prims covering t (same pair
count as v4's expansion), so the kernel work is unchanged while the
sort shrinks 4x in items (4.55 -> 0.79 ms at 1M; 94 -> 15 ms at 9M) and
the row gather shrinks from per-entry to per-prim (1.2M -> 1M rows).
A further consequence: there is NO entry capacity — the row buffer is
always exactly P prims, so the v3/v4 capacity probe/certificate
machinery does not apply (only big-list overflow remains).

Exactness: identical contract and eval as v4 (the row format, the
per-pair lexicographic (depth, id) tie-break, and the big-list
streaming are shared code — pallas_csr4._make_row_body16 /
_stream_big).  The tie-break makes processing order irrelevant, which
is what makes multi-range streaming sound: any stranger slot in the
PACK-aligned chunk slop either covers this tile (then it also appears
in one of the five ranges — idempotent) or fails coverage (inert;
invalid prims' rows are zeroed at table build).

The in-kernel depth early-exit is per RANGE: each range ascends in
z-bucket, so the v4 exit bound applies with the jump target being the
next range's first chunk instead of loop termination.

Reference parity: this replaces what Mitsuba's BVH + megakernel do for
the reference renderer (/root/reference/traj_ball_renderer.py:355-359);
the reference has no binning of its own.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pointcloud_render_tpu.raster.pallas_csr3 import _preshade
from pointcloud_render_tpu.raster.pallas_csr4 import (
    DEFAULT_BIG_CHUNK,
    DEFAULT_MAX_BIG,
    F_EMPTY,
    INF,
    _build_table16,
    _make_row_body16,
    _stream_big,
    _z_lower_bound,
)
from pointcloud_render_tpu.raster.primitives import (
    KIND_CAPSULE,
    KIND_DISC,
    KIND_TRIANGLE,
)

ROW_F = 16
PACK = 128 // ROW_F  # 8 entries per 128-lane row
ROW_F_DISC = 8  # discs_only rows: [px, py, z, r^2, idf, 0, 0, 0]
PACK_DISC = 128 // ROW_F_DISC
ZQ = 8  # z-bucket bits in the int32 key (256 buckets)
DEFAULT_CHUNK_ROWS = 256


def _bin_csr6(prims, tile_h, tile_w, num_tiles, tiles_x, tiles_y,
              max_big=DEFAULT_MAX_BIG, bin_triangles=False,
              discs_only=False):
    """Per-prim (anchor, class, z-bucket) int32 keys + UNSTABLE sort.

    Returns (sorted_keys, sorted_prims, big_list, big_count, zmeta);
    zmeta = f32 [zmin, s, thr_scale] over the binned prims' zlb exactly
    as pallas_csr4._bin_csr4 (the kernel's exit math is shared).
    """
    p = prims.count
    xmin, xmax = prims.bbox[:, 0], prims.bbox[:, 1]
    ymin, ymax = prims.bbox[:, 2], prims.bbox[:, 3]
    tx0 = jnp.clip(jnp.floor(xmin / tile_w).astype(jnp.int32), 0, tiles_x - 1)
    tx1 = jnp.clip(jnp.floor(xmax / tile_w).astype(jnp.int32), 0, tiles_x - 1)
    ty0 = jnp.clip(jnp.floor(ymin / tile_h).astype(jnp.int32), 0, tiles_y - 1)
    ty1 = jnp.clip(jnp.floor(ymax / tile_h).astype(jnp.int32), 0, tiles_y - 1)
    if discs_only:
        binnable = prims.kind == KIND_DISC
    else:
        binnable = (prims.kind == KIND_DISC) | (prims.kind == KIND_CAPSULE)
        if bin_triangles:
            binnable = binnable | (prims.kind == KIND_TRIANGLE)
    fits = (tx1 - tx0 < 2) & (ty1 - ty0 < 2) & binnable
    is_small = prims.valid & fits
    is_big = prims.valid & ~fits

    prim_id = np.arange(p, dtype=np.int32)
    cls = (tx1 > tx0).astype(jnp.int32) + 2 * (ty1 > ty0).astype(jnp.int32)
    anchor = ty0 * tiles_x + tx0
    sent = np.int32(num_tiles * 4) << ZQ

    nb = np.float32(1 << ZQ)
    zlb = _z_lower_bound(prims, with_triangles=bin_triangles)
    zmin = jnp.min(jnp.where(is_small, zlb, INF))
    zmax = jnp.max(jnp.where(is_small, zlb, -INF))
    rngz = zmax - zmin
    s = jnp.where(rngz > 0, nb / rngz, 0.0)
    qz = jnp.clip(jnp.floor((zlb - zmin) * s), 0.0, nb - 1).astype(jnp.int32)
    thr_scale = jnp.where(s > 0, np.float32(1.0 - 1e-6) / s, 0.0)
    zmeta = jnp.stack([jnp.where(jnp.isfinite(zmin), zmin, 0.0),
                       s, thr_scale])

    key = jnp.where(is_small, ((anchor * 4 + cls) << ZQ) | qz, sent)
    sorted_keys, sorted_prims = jax.lax.sort(
        (key, jnp.asarray(prim_id)), num_keys=1, is_stable=False)

    big_rank = jnp.cumsum(is_big.astype(jnp.int32)) - 1
    big_idx = jnp.where(is_big & (big_rank < max_big), big_rank, max_big)
    big_list = jnp.full((max_big + 1,), -1, jnp.int32)
    big_list = big_list.at[big_idx].set(prim_id, mode="drop")
    big_list = big_list[:-1]
    big_count = jnp.sum(is_big.astype(jnp.int32))
    return sorted_keys, sorted_prims, big_list, big_count, zmeta


def bin_diagnostics6(prims, width: int, height: int, tile_h: int = 32,
                     tile_w: int = 32, max_big: int = DEFAULT_MAX_BIG,
                     bin_triangles: bool = False):
    """Big-list overflow count under the v6 binning (0 = exact)."""
    tiles_y = -(-height // tile_h)
    tiles_x = -(-width // tile_w)
    num_tiles = tiles_y * tiles_x
    _, _, big_list, big_count, _ = _bin_csr6(
        prims, tile_h, tile_w, num_tiles, tiles_x, tiles_y,
        max_big=max_big, bin_triangles=bin_triangles)
    return jnp.maximum(big_count - big_list.shape[0], 0)


def _make_row_body8(scr, slot, nchains, qx, qy):
    """fori_loop body over one 8-float DISC-row scratch slab:
    [px, py, z, r^2, idf, 0, 0, 0] x 16 per 128-lane row.  r^2 is
    squared at TABLE build (P rows) — bit-identical to squaring per
    pair (same f32 multiply on the same input, the pallas_csr3
    convention); the per-pair (depth, id) tie-break matches
    _make_row_body16 exactly."""

    def row_body(br, c2):
        out = list(c2)
        for u in range(PACK_DISC):
            lane = u * ROW_F_DISC
            px = scr[slot, br, lane]
            py = scr[slot, br, lane + 1]
            z = scr[slot, br, lane + 2]
            r2 = scr[slot, br, lane + 3]
            idf = scr[slot, br, lane + 4]
            ch = u % nchains
            d0, di = out[2 * ch], out[2 * ch + 1]
            dx = qx - px
            dy = qy - py
            cov = dx * dx + dy * dy <= r2
            better = cov & ((z < d0) | ((z == d0) & (idf < di)))
            out[2 * ch] = jnp.where(better, z, d0)
            out[2 * ch + 1] = jnp.where(better, idf, di)
        return tuple(out)

    return row_body


def _make_kernel6(tiles_x, tile_h, tile_w, unroll, n_chunk_block,
                  chunk_rows, allow_exit, with_triangles=False,
                  big_chunk=DEFAULT_BIG_CHUNK, row_f=ROW_F):
    pack = 128 // row_f
    zlb_lane = 14 if row_f == ROW_F else 2  # disc rows: zlb == z
    assert chunk_rows % pack == 0
    assert big_chunk % PACK == 0

    def kernel(starts_ref,  # scalar prefetch: (4T+2,) i32; [4T+1] = big n
               rows_hbm,  # (P_pad/8, 128) f32 in ANY/HBM, anchor-sorted
               big_hbm,  # (BIG_pad/8, 128) f32 in ANY/HBM
               zmeta_ref,  # SMEM (1, 3) f32: zmin, s, thr_scale
               depth_out,  # VMEM (1, 8, 128) f32
               idf_out,  # VMEM (1, 8, 128) f32
               scratch,  # SMEM (2, n_chunk_block, 128) f32
               sems,  # DMA sems (2,)
               big_scratch,  # SMEM (2, big_chunk/8, 128) f32
               big_sems):  # DMA sems (2,)
        tile = pl.program_id(0)
        num_t = pl.num_programs(0)
        ty = tile // tiles_x
        tx = tile % tiles_x
        # VREG (8, 128) -> (tile_h, tile_w) pixel block (pallas_csr3).
        ix = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        iy = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        qx = (tx * tile_w + ix % tile_w).astype(jnp.float32) + 0.5
        qy = (ty * tile_h + iy + 8 * (ix // tile_w)).astype(
            jnp.float32) + 0.5

        big_n = starts_ref[4 * num_t + 1]

        # --- the five ranges (starts, counts), guarded at grid edges --
        def rng(anchor, c_lo, c_hi, ok):
            a = jnp.maximum(anchor, 0)
            s = starts_ref[4 * a + c_lo]
            n = starts_ref[4 * a + c_hi] - s
            return s, jnp.where(ok, n, 0)

        left = tx > 0
        up = ty > 0
        ranges = [
            rng(tile, 0, 4, True),
            rng(tile - 1, 1, 2, left),
            rng(tile - 1, 3, 4, left),
            rng(tile - tiles_x, 2, 4, up),
            rng(tile - tiles_x - 1, 3, 4, left & up),
        ]

        # Flat chunk schedule across the ranges: chunk ci of the tile
        # maps to (range r, offset j) via the cumulative chunk counts,
        # so the double-buffered DMA pipeline spans range boundaries
        # without a per-range restart stall.
        ncs = [pl.cdiv(n, chunk_rows) for _, n in ranges]
        cums = []
        acc = jnp.int32(0)
        for nc in ncs:
            acc = acc + nc
            cums.append(acc)
        total_chunks = cums[-1]

        def locate(ci):
            """ci -> (g0 entry offset, mc live entries, next_cum)."""
            g0 = ranges[0][0] + ci * chunk_rows
            mc = ranges[0][1] - ci * chunk_rows
            nxt = cums[0]
            prev = jnp.int32(0)
            for r in range(1, 5):
                inr = ci >= cums[r - 1]
                j = ci - cums[r - 1]
                g0 = jnp.where(inr, ranges[r][0] + j * chunk_rows, g0)
                mc = jnp.where(inr, ranges[r][1] - j * chunk_rows, mc)
                nxt = jnp.where(inr, cums[r], nxt)
                prev = jnp.where(inr, cums[r - 1], prev)
            return g0, jnp.minimum(mc, chunk_rows), nxt

        def get_dma(slot, ci):
            g0, _, _ = locate(ci)
            return pltpu.make_async_copy(
                rows_hbm.at[pl.ds(g0 // pack, n_chunk_block), :],
                scratch.at[slot],
                sems.at[slot],
            )

        @pl.when(total_chunks > 0)
        def _():
            get_dma(0, 0).start()

        d_bg, i_bg = _stream_big(big_hbm, big_scratch, big_sems, big_n,
                                 big_chunk, qx, qy)

        accs = [d_bg, i_bg]
        for _ in range(unroll - 1):
            accs += [jnp.full((8, 128), INF, jnp.float32),
                     jnp.full((8, 128), F_EMPTY, jnp.float32)]
        init = tuple(accs)

        if allow_exit:
            zmin = zmeta_ref[0, 0]
            zs = zmeta_ref[0, 1]
            thr_scale = zmeta_ref[0, 2]

        def cond(c):
            return c[0] < total_chunks

        def body(c):
            ci, slot = c[0], c[1]
            accs_in = c[2:]

            @pl.when(ci + 1 < total_chunks)
            def _():
                get_dma(1 - slot, ci + 1).start()

            get_dma(slot, ci).wait()
            g0, mc, nxt = locate(ci)
            o0 = jax.lax.rem(g0, pack)
            n_rows = (o0 + mc + (pack - 1)) // pack
            body_fn = (_make_row_body16(scratch, slot, unroll,
                                        with_triangles, qx, qy)
                       if row_f == ROW_F else
                       _make_row_body8(scratch, slot, unroll, qx, qy))
            accs_out = jax.lax.fori_loop(0, n_rows, body_fn, accs_in)

            if allow_exit:
                # Each range ascends in zlb-bucket; once the last
                # streamed bucket's floor (one bucket + 1e-6 margin
                # back, STRICT >) beats the tile's worst winning depth,
                # the REST OF THIS RANGE cannot win — jump to the next
                # range's first chunk.  Soundness as pallas_csr4 (the
                # last slot may be a stranger from a LOWER bucket,
                # which only delays the jump).
                dmin = accs_out[0]
                for u in range(1, unroll):
                    dmin = jnp.minimum(dmin, accs_out[2 * u])
                dmax = jnp.max(dmin)
                last_zlb = scratch[slot, n_rows - 1,
                                   (pack - 1) * row_f + zlb_lane]
                qz = jnp.maximum(
                    jnp.floor((last_zlb - zmin) * zs) - 1.0, 0.0)
                done = zmin + qz * thr_scale > dmax
                ci_next = jnp.where(done, nxt, ci + 1)
            else:
                ci_next = ci + 1

            # On a jump the sequential prefetch (ci+1 -> 1-slot) is
            # wrong: drain it, then start the jump target's chunk.
            jumped = (ci_next != ci + 1) & (ci + 1 < total_chunks)

            @pl.when(jumped)
            def _():
                get_dma(1 - slot, ci + 1).wait()

            @pl.when(jumped & (ci_next < total_chunks))
            def _():
                get_dma(1 - slot, ci_next).start()

            return (ci_next, 1 - slot) + accs_out

        out = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.int32(0)) + init)[2:]

        depth, idf = out[0], out[1]
        for u in range(1, unroll):
            du, iu = out[2 * u], out[2 * u + 1]
            better = (du < depth) | ((du == depth) & (iu < idf))
            depth = jnp.where(better, du, depth)
            idf = jnp.where(better, iu, idf)

        depth_out[0, :, :] = depth
        idf_out[0, :, :] = idf

    return kernel


def _raster_core6(prims, width, height, tile_h, tile_w, unroll,
                  chunk_rows, interpret, shade_rgb, shade_flag,
                  max_big=DEFAULT_MAX_BIG, bin_triangles=False,
                  discs_only=False, allow_exit=True):
    """Binning + kernel launch.  Returns (depth, idf_img, diag); diag's
    ``big_overflow`` must be 0 for exactness (``true_entries`` reports
    the would-be v4 entry count for observability — v6 itself has no
    capacity precondition)."""
    if tile_h * tile_w != 1024 or tile_w not in (16, 32, 64, 128):
        raise ValueError(
            "pallas_csr6 pixel blocks must hold exactly one (8, 128) "
            "f32 VREG: tile_h * tile_w == 1024 with tile_w in "
            "{16, 32, 64, 128}")
    if prims.count >= (1 << 24):
        raise ValueError("float id encoding supports < 2^24 primitives")
    tiles_y = -(-height // tile_h)
    tiles_x = -(-width // tile_w)
    num_tiles = tiles_y * tiles_x
    if (num_tiles * 4 + 1) << ZQ >= (1 << 31):
        raise ValueError("tile grid too large for the int32 v6 key")

    sorted_keys, sorted_prims, big_list, big_count, zmeta = _bin_csr6(
        prims, tile_h, tile_w, num_tiles, tiles_x, tiles_y,
        max_big=max_big, bin_triangles=bin_triangles,
        discs_only=discs_only)

    # (anchor, class) boundaries: B[j] = first sorted position with
    # anchor*4+cls >= j.  B[4T] = number of binned prims.
    bounds = (np.arange(num_tiles * 4 + 1, dtype=np.int32) << ZQ)
    starts = jnp.searchsorted(sorted_keys, jnp.asarray(bounds)).astype(
        jnp.int32)
    n_small = starts[num_tiles * 4]
    # Entry count as v4 would bin it (sum over tiles of range lengths) —
    # reported for observability/tests, not a precondition.
    cls_counts = starts[1:] - starts[:-1]
    c = cls_counts.reshape(num_tiles, 4)
    # Entries per class: cls0 -> 1 tile, cls1/cls2 -> 2, cls3 -> 4.
    true_entries = (n_small + jnp.sum(c[:, 1]) + jnp.sum(c[:, 2])
                    + 3 * jnp.sum(c[:, 3]))
    diag = dict(true_entries=true_entries.astype(jnp.int32),
                big_overflow=jnp.maximum(big_count - big_list.shape[0], 0))

    p = prims.count
    row_f = ROW_F_DISC if discs_only else ROW_F
    pack = 128 // row_f
    p_pad = -(-(p + chunk_rows + pack) // chunk_rows) * chunk_rows

    table16 = _build_table16(prims, shade_rgb, shade_flag,
                             bin_triangles=bin_triangles)
    prims_p = jnp.pad(sorted_prims, (0, p_pad - p), constant_values=p)
    if discs_only:
        # Narrow 8-float disc rows: [px, py, z, r^2, idf, 0, 0, 0] —
        # 32 B gathers are ~40% cheaper than 64 B at equal row count
        # (benchmarks/v6_probe.py).  Invalid rows zeroed as table16.
        r = prims.params[:, 3]
        table8 = jnp.concatenate([
            prims.params[:, 0:3], (r * r)[:, None],
            jnp.arange(p, dtype=jnp.float32)[:, None],
            jnp.zeros((p, 3), jnp.float32),
        ], axis=1)
        table8 = jnp.where(prims.valid[:, None], table8, 0.0)
        table8 = jnp.pad(table8, ((0, 1), (0, 0)))
        rows = table8[prims_p].reshape(p_pad // pack, 128)
    else:
        rows = table16[prims_p].reshape(p_pad // pack, 128)

    big_chunk = DEFAULT_BIG_CHUNK
    big = big_list.shape[0]
    big_pad = -(-(big + 1) // big_chunk) * big_chunk
    big_safe = jnp.maximum(big_list, 0)
    big_ids = jnp.where((big_list >= 0) & prims.valid[big_safe],
                        big_safe, p)
    big_rows = table16[jnp.pad(big_ids, (0, big_pad - big),
                               constant_values=p)]
    big_rows = big_rows.reshape(big_pad // PACK, 128)

    scalars = jnp.concatenate([
        starts, jnp.minimum(big_count, big)[None].astype(jnp.int32)])

    n_chunk_block = chunk_rows // pack + 1

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

    kernel = _make_kernel6(tiles_x, tile_h, tile_w, unroll, n_chunk_block,
                           chunk_rows, allow_exit=allow_exit,
                           with_triangles=bin_triangles,
                           big_chunk=big_chunk, row_f=row_f)
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


def rasterize_pallas_csr6(prims, width: int, height: int, tile_h: int = 32,
                          tile_w: int = 32, unroll: int = 4,
                          chunk_rows: int = DEFAULT_CHUNK_ROWS,
                          max_big: int = DEFAULT_MAX_BIG,
                          bin_triangles: bool = False,
                          discs_only: bool = False,
                          interpret: bool = False,
                          return_diag: bool = False,
                          allow_exit: bool = True):
    """Returns (depth (H,W) f32 +inf-empty, index (H,W) i32 -1-empty).

    Same semantics and eval as rasterize_pallas_csr4 (per-pair exact
    ties, big list for wide prims/triangles, optional bin_triangles),
    with the anchor-sorted binning — and therefore NO entry_capacity
    precondition: nothing is ever truncated except big-list overflow
    (check diag/bin_diagnostics6).  ``discs_only`` narrows binned rows
    to 8 floats (capsules AND triangles ride the big list) — the disc-
    cloud fast path, ~40% cheaper row gathers.
    """
    zeros3 = jnp.zeros((prims.count, 3), jnp.float32)
    zerosf = jnp.zeros((prims.count,), jnp.float32)
    depth, idf, _, diag = _raster_core6(
        prims, width, height, tile_h, tile_w, unroll, chunk_rows,
        interpret, zeros3, zerosf, max_big=max_big,
        bin_triangles=bin_triangles, discs_only=discs_only,
        allow_exit=allow_exit)
    index = jnp.where(jnp.isinf(depth), -1, idf.astype(jnp.int32))
    if return_diag:
        return depth, index, diag
    return depth, index


def render_shaded_csr6(prims, camera, shading, tile_h: int = 32,
                       tile_w: int = 32, unroll: int = 4,
                       chunk_rows: int = DEFAULT_CHUNK_ROWS,
                       max_big: int = DEFAULT_MAX_BIG,
                       bin_triangles: bool = False,
                       discs_only: bool = False,
                       interpret: bool = False,
                       return_diag: bool = False):
    """Rasterize + shade in one pass: (rgb, depth, index).

    Matches shading.shade_framebuffer bit-for-bit (lambert and flat
    modes); the shade epilogue is pallas_csr4's (compact 8-float
    per-pixel winner gather by id).
    """
    from pointcloud_render_tpu.raster import pallas_csr4 as _v4

    width, height = camera.width, camera.height
    shade_rgb, shade_flag = _preshade(prims, camera, shading)
    depth, idf, _, diag = _raster_core6(
        prims, width, height, tile_h, tile_w, unroll, chunk_rows,
        interpret, shade_rgb, shade_flag, max_big=max_big,
        bin_triangles=bin_triangles, discs_only=discs_only)
    rgb, index = _v4._shade_by_id(prims, camera, shading, depth, idf,
                                  shade_rgb, shade_flag)
    if return_diag:
        return rgb, depth, index, diag
    return rgb, depth, index
