"""CSR Pallas rasterizer: sorted entry ranges + double-buffered DMA.

Evolution of pallas_kernel.py that removes the dense (T, MPT) tile table
and its scatter/pre-gather entirely:

* binning sorts (tile, prim) entries once (int16 keys); the sorted order
  IS the CSR layout — per-tile ranges come from one searchsorted, no
  rank computation, no capacity cap, no overflow;
* primitive rows are gathered once in sorted-entry order into an
  (E_pad, 16) float32 block: 12 params + bitcast primitive id (row 12)
  + kind (row 13);
* the kernel walks its tile's [start, end) range in CH-row chunks,
  double-buffering HBM -> SMEM DMAs, and evaluates each primitive as 12
  scalar reads + one (8, 128) VPU op, merged lexicographically.

Contract identical to every other backend: winner per pixel =
lexicographic min of (depth, primitive index).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


INF = np.float32(np.inf)
IMAX = np.int32(2147483647)
ROW_F = 16  # 12 params + id + kind + depth-bucket lower bound + 1 pad
CHUNK_ROWS = 128  # entries per DMA chunk
PACK = 8  # entries per 128-lane HBM row (8 * 16 floats = 128 lanes)
BLOCK_ROWS = CHUNK_ROWS // PACK + 1  # +1 slop row for unaligned starts
N_BUCKETS = 16  # front-to-back depth buckets inside each tile's range


def _depth_buckets(hint, valid):
    """Range-adaptive buckets: linear over the scene's actual [zmin, zmax]
    so the N_BUCKETS resolve the cloud's own depth extent (a fixed global
    scale would collapse most scenes into one or two buckets).

    Returns (bucket (P,) int32, bucket_low fn: bucket -> conservative
    lower bound of any depth in that bucket)."""
    big = jnp.float32(3.0e38)
    zmin = jnp.min(jnp.where(valid, hint, big))
    zmax = jnp.max(jnp.where(valid, hint, -big))
    span = jnp.maximum(zmax - zmin, 1e-6)
    scale = N_BUCKETS / span
    bucket = jnp.clip(((hint - zmin) * scale).astype(jnp.int32),
                      0, N_BUCKETS - 1)

    def bucket_low(b):
        # Safety margin covers the float rounding of the forward map.
        return zmin + b.astype(jnp.float32) * (span / N_BUCKETS)             - 1e-3 * span

    return bucket, bucket_low


def _eval_capsule(p, qx, qy):
    """Disc-or-capsule masked depth (discs are degenerate capsules)."""
    dx = qx - p[0]
    dy = qy - p[1]
    t = jnp.clip((dx * p[4] + dy * p[5]) * p[8], 0.0, 1.0)
    cx = dx - t * p[4]
    cy = dy - t * p[5]
    rad = p[3] + p[7] * t
    return jnp.where(cx * cx + cy * cy <= rad * rad, p[2] + p[6] * t, INF)


def _eval_tri(p, qx, qy):
    e0 = p[0] * qy - p[1] * qx + p[2]
    e1 = p[3] * qy - p[4] * qx + p[5]
    e2 = p[6] * qy - p[7] * qx + p[8]
    iz = e0 * p[9] + e1 * p[10] + e2 * p[11]
    cov = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & (iz > 0)
    return jnp.where(cov, 1.0 / jnp.where(iz > 0, iz, 1.0), INF)


def _eval_scalar(kind, p, qx, qy):
    """Masked depth of one primitive vs the tile; +inf where uncovered.
    Branches only triangle vs not (the common splat/trail path is
    branch-free; per-primitive branching costs real scalar-unit time)."""
    return jax.lax.cond(kind == 2, lambda _: _eval_tri(p, qx, qy),
                        lambda _: _eval_capsule(p, qx, qy), 0)


def _make_kernel(tiles_x, tile_h, tile_w, max_big, no_triangles):
    def kernel(starts_ref,  # scalar prefetch: (T+2,) i32; [T+1] = big count
               rows_hbm,  # (E_pad/8, 128) f32, memory_space=ANY (packed rows)
               big_params_ref,  # SMEM (16, BIG) f32
               big_ids_ref,  # SMEM (1, BIG) i32
               big_kinds_ref,  # SMEM (1, BIG) i32
               depth_out,  # VMEM (1, TH, TW) f32
               idx_out,  # VMEM (1, TH, TW) i32
               scratch,  # SMEM (2, CHUNK_ROWS, 16) f32
               sems):  # DMA sems (2,)
        tile = pl.program_id(0)
        ty = tile // tiles_x
        tx = tile % tiles_x
        ix = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1)
        iy = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0)
        qx = (tx * tile_w + ix).astype(jnp.float32) + 0.5
        qy = (ty * tile_h + iy).astype(jnp.float32) + 0.5

        start = starts_ref[tile]
        count = starts_ref[tile + 1] - start
        n_chunks = pl.cdiv(count, CHUNK_ROWS)

        def get_dma(slot, ci):
            g0 = start + ci * CHUNK_ROWS
            return pltpu.make_async_copy(
                rows_hbm.at[pl.ds(g0 // PACK, BLOCK_ROWS), :],
                scratch.at[slot],
                sems.at[slot],
            )

        @pl.when(n_chunks > 0)
        def _():
            get_dma(0, 0).start()

        # Big primitives (the ground plane) render FIRST: they fill every
        # pixel the cloud leaves uncovered, which is what lets the
        # saturation early-exit fire on gappy point clouds.
        def big_body(j, carry):
            d, i = carry
            kind = big_kinds_ref[0, j]
            pid = big_ids_ref[0, j]
            p = tuple(big_params_ref[r, j] for r in range(12))
            zc = _eval_scalar(kind, p, qx, qy)
            better = (zc < d) | ((zc == d) & (pid < i))
            return jnp.where(better, zc, d), jnp.where(better, pid, i)

        big_n = starts_ref[pl.num_programs(0) + 1]
        d_bg, i_bg = jax.lax.fori_loop(
            0, big_n, big_body,
            (jnp.full((tile_h, tile_w), INF, jnp.float32),
             jnp.full((tile_h, tile_w), IMAX, jnp.int32)))

        init = (d_bg, i_bg, jnp.bool_(True))

        def chunk_body(ci, carry):
            d_in, i_in, active = carry
            slot = jax.lax.rem(ci, 2)

            @pl.when(active & (ci + 1 < n_chunks))
            def _():
                get_dma(jax.lax.rem(ci + 1, 2), ci + 1).start()

            m = jnp.minimum(CHUNK_ROWS, count - ci * CHUNK_ROWS)
            o0 = jax.lax.rem(start + ci * CHUNK_ROWS, PACK)

            def process(_):
                get_dma(slot, ci).wait()

                def prim_body(j, carry2):
                    d0, i0 = carry2
                    lin = o0 + j
                    br = lin // PACK
                    lane = jax.lax.rem(lin, PACK) * ROW_F

                    def rd(r):
                        return scratch[slot, br, lane + r]

                    p = tuple(rd(r) for r in range(12))
                    # ids travel as exact float32 values (scalar bitcast
                    # is unsupported); exact below 2^24 primitives.
                    pid = rd(12).astype(jnp.int32)
                    if no_triangles:
                        # Every binned entry is a disc/capsule (triangles
                        # were forced to the big list) — branch-free.
                        zc = _eval_capsule(p, qx, qy)
                    else:
                        kind = rd(13).astype(jnp.int32)
                        zc = _eval_scalar(kind, p, qx, qy)
                    better = (zc < d0) | ((zc == d0) & (pid < i0))
                    return (jnp.where(better, zc, d0),
                            jnp.where(better, pid, i0))

                d, i = jax.lax.fori_loop(0, m, prim_body, (d_in, i_in))

                # Saturation early-exit: entries are front-to-back by depth
                # bucket; every remaining entry's depth is >= the last
                # processed entry's bucket lower bound (row 14).  If the
                # tile is fully covered and that bound STRICTLY exceeds the
                # deepest pixel, no remaining primitive can win anywhere
                # (strict: an equal-depth prim could still win an id tie).
                lin_last = o0 + m - 1
                bound = scratch[slot, lin_last // PACK,
                                jax.lax.rem(lin_last, PACK) * ROW_F + 14]
                tile_max = jnp.max(d)
                still = ~((tile_max < INF) & (bound > tile_max))

                # Retire the already-started next DMA on the deactivation
                # edge so no transfer is left dangling.
                @pl.when(~still & (ci + 1 < n_chunks))
                def _():
                    get_dma(jax.lax.rem(ci + 1, 2), ci + 1).wait()

                return d, i, still

            def skip(_):
                return d_in, i_in, active

            return jax.lax.cond(active, process, skip, 0)

        depth, idx, _ = jax.lax.fori_loop(0, n_chunks, chunk_body, init)

        depth_out[0, :, :] = depth
        idx_out[0, :, :] = idx

    return kernel


def rasterize_pallas_csr(prims, width: int, height: int, tile_h: int = 8,
                         tile_w: int = 128, max_tiles_per_prim: int = 8,
                         max_big: int = 1024, no_triangles: bool = False,
                         interpret: bool = False):
    """Returns (depth (H,W) f32 +inf-empty, index (H,W) i32 -1-empty).

    No per-tile capacity: every binned entry is rasterized exactly.  The
    only capacity is the big list (primitives spanning more than
    max_tiles_per_prim tiles); its loop cost is proportional to the TRUE
    big count, so the default is generous — check ``bin_diagnostics`` or
    raise ``max_big`` for scenes with thousands of screen-spanning
    primitives.
    ``no_triangles=True`` compiles the branch-free splat/trail fast path;
    any triangles present are forced onto the big list (which always
    branches per kind), so it is safe for every scene without small
    triangle soups (droplet mesh LOD).
    """
    tiles_y = -(-height // tile_h)
    tiles_x = -(-width // tile_w)
    num_tiles = tiles_y * tiles_x

    (sorted_keys, sorted_prims, big_list, big_count,
     bucket_low) = _bin_csr(
        prims, width, height, tile_h, tile_w, max_tiles_per_prim, max_big,
        num_tiles, tiles_x, tiles_y, force_tri_big=no_triangles)

    starts = jnp.searchsorted(
        sorted_keys,
        np.arange(num_tiles + 1, dtype=np.int32) * N_BUCKETS).astype(
        jnp.int32)

    # Gather primitive rows in sorted-entry order; pad by one chunk plus
    # slop so the last DMA stays in bounds, then pack 8 entries per
    # 128-lane HBM row (Mosaic cannot DMA-slice a 16-wide row layout).
    # Built as ONE concatenate (a zeros+.at[].set chain re-materializes
    # the 256 MB block several times).
    e = sorted_prims.shape[0]
    e_pad = -(-(e + CHUNK_ROWS + PACK) // CHUNK_ROWS) * CHUNK_ROWS
    if prims.count >= (1 << 24):
        raise ValueError("CSR kernel id encoding supports < 2^24 primitives")
    # Pad the small 1-D arrays BEFORE the row gather so the 256MB block is
    # materialized exactly once (no extra pad copy).
    prims_p = jnp.pad(sorted_prims, (0, e_pad - e), constant_values=-1)
    keys_p = jnp.pad(sorted_keys, (0, e_pad - e))
    safe = jnp.maximum(prims_p, 0)
    rows = jnp.concatenate([
        prims.params[safe],
        prims_p.astype(jnp.float32)[:, None],
        prims.kind[safe].astype(jnp.float32)[:, None],
        bucket_low(jax.lax.rem(keys_p, N_BUCKETS))[:, None],
        jnp.zeros((e_pad, 1), jnp.float32),
    ], axis=1)
    rows = rows.reshape(e_pad // PACK, PACK * ROW_F)

    big_safe = jnp.maximum(big_list, 0)
    big_kinds = jnp.where((big_list >= 0) & prims.valid[big_safe],
                          prims.kind[big_safe], -1)[None, :]
    big_params = jnp.zeros((ROW_F, big_list.shape[0]), jnp.float32)
    big_params = big_params.at[:12, :].set(prims.params[big_safe].T)
    big_ids = big_list[None, :]

    scalars = jnp.concatenate([
        starts, jnp.minimum(big_count, big_list.shape[0])[None].astype(
            jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((ROW_F, big_list.shape[0]), lambda i, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, big_list.shape[0]), lambda i, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, big_list.shape[0]), lambda i, c: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_h, tile_w), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, tile_w), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.SMEM((2, BLOCK_ROWS, PACK * ROW_F), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = _make_kernel(tiles_x, tile_h, tile_w, big_list.shape[0],
                          no_triangles)
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


def bin_diagnostics(prims, width: int, height: int, tile_h: int = 8,
                    tile_w: int = 128, max_tiles_per_prim: int = 8,
                    max_big: int = 256, no_triangles: bool = False,
                    discs_only: bool = False):
    """Big-list overflow count for a scene/config (0 = every primitive is
    rasterized exactly; >0 = raise max_big or max_tiles_per_prim).  The
    per-tile lists are capacity-free, so the big list is the only way a
    primitive can be dropped on this backend.  The no_triangles/
    discs_only flags must MIRROR the render config being certified
    (discs_only big-lists every capsule — probing without it
    under-counts)."""
    tiles_y = -(-height // tile_h)
    tiles_x = -(-width // tile_w)
    num_tiles = tiles_y * tiles_x
    _, _, big_list, big_count, _ = _bin_csr(
        prims, width, height, tile_h, tile_w, max_tiles_per_prim, max_big,
        num_tiles, tiles_x, tiles_y,
        force_tri_big=no_triangles or discs_only,
        force_capsule_big=discs_only)
    return jnp.maximum(big_count - big_list.shape[0], 0)


def _bin_csr(prims, width, height, tile_h, tile_w, max_tiles_per_prim,
             max_big, num_tiles, tiles_x, tiles_y, force_tri_big=False,
             force_capsule_big=False):
    """Entry expansion + int16 pair sort (see tiles.bin_primitives; this
    variant skips the dense table build entirely).  force_*_big push whole
    kinds onto the big list so the kernel can compile a narrower row
    format (pallas_csr2's discs_only fast path)."""
    p = prims.count
    xmin, xmax = prims.bbox[:, 0], prims.bbox[:, 1]
    ymin, ymax = prims.bbox[:, 2], prims.bbox[:, 3]
    tx0 = jnp.clip(jnp.floor(xmin / tile_w).astype(jnp.int32), 0, tiles_x - 1)
    tx1 = jnp.clip(jnp.floor(xmax / tile_w).astype(jnp.int32), 0, tiles_x - 1)
    ty0 = jnp.clip(jnp.floor(ymin / tile_h).astype(jnp.int32), 0, tiles_y - 1)
    ty1 = jnp.clip(jnp.floor(ymax / tile_h).astype(jnp.int32), 0, tiles_y - 1)
    ntx = tx1 - tx0 + 1
    nty = ty1 - ty0 + 1
    span = ntx * nty
    is_big = (span > max_tiles_per_prim) & prims.valid
    if force_tri_big:
        is_big |= (prims.kind == 2) & prims.valid
    if force_capsule_big:
        is_big |= (prims.kind == 1) & prims.valid
    is_small = prims.valid & ~is_big

    slot = np.arange(max_tiles_per_prim, dtype=np.int32)[None, :]
    ex = slot % ntx[:, None]
    ey = slot // ntx[:, None]
    slot_ok = (slot < span[:, None]) & is_small[:, None]
    tile_id = (ty0[:, None] + ey) * tiles_x + (tx0[:, None] + ex)
    tile_id = jnp.where(slot_ok, tile_id, num_tiles)
    prim_id = jnp.broadcast_to(np.arange(p, dtype=np.int32)[:, None],
                               tile_id.shape)

    # Front-to-back key: (tile, depth bucket).  Within-tile order is NOT
    # id-ascending, which is fine — the kernels' lexicographic merge is
    # order-independent; the bucketing exists purely so the saturation
    # early-exit triggers as soon as a tile is covered by near geometry.
    # Depth hint per primitive: disc z / capsule min endpoint z (params
    # slots 2 and 6; slot 6 is 0 for discs); triangles get bucket 0
    # (conservative: processed first).
    hint = prims.params[:, 2] + jnp.minimum(prims.params[:, 6], 0.0)
    hint = jnp.where(prims.kind == 2, 0.0, hint)
    bucket, bucket_low = _depth_buckets(hint, is_small | is_big)
    flat_key = (tile_id * N_BUCKETS
                + bucket[:, None]).reshape(-1)
    flat_key = jnp.where(tile_id.reshape(-1) >= num_tiles,
                         num_tiles * N_BUCKETS, flat_key)
    flat_prims = prim_id.reshape(-1)
    if num_tiles * N_BUCKETS + 1 < 32767:
        k16, sorted_prims = jax.lax.sort(
            (flat_key.astype(jnp.int16), flat_prims), num_keys=1,
            is_stable=True)
        sorted_keys = k16.astype(jnp.int32)
    else:
        sorted_keys, sorted_prims = jax.lax.sort(
            (flat_key, flat_prims), num_keys=1, is_stable=True)

    big_rank = jnp.cumsum(is_big.astype(jnp.int32)) - 1
    big_idx = jnp.where(is_big & (big_rank < max_big), big_rank, max_big)
    big_list = jnp.full((max_big + 1,), -1, jnp.int32)
    big_list = big_list.at[big_idx].set(np.arange(p, dtype=np.int32),
                                        mode="drop")
    big_list = big_list[:-1]
    big_count = jnp.sum(is_big.astype(jnp.int32))
    return sorted_keys, sorted_prims, big_list, big_count, bucket_low
