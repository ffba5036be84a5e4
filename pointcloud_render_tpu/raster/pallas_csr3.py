"""CSR Pallas rasterizer v3: the disc fast path at minimum cost per pair.

Driven by the round-2 on-chip microprofiles (docs/KERNEL_NOTES.md):

* the v2 binning expansion's ``slot % ntx`` / ``slot // ntx`` variable
  integer divisions (no hardware int div on TPU) cost ~15 ms of pure
  elementwise time at 1M points — v3 bins with a FIXED 2x2 slot pattern
  (dx, dy in {0,1}^2 masked by dx < ntx, dy < nty): no division.  Discs
  spanning more than 2x2 tiles fall to the big list (bin_diagnostics3
  counts them; the bench cloud's splats are <= ~6 px so the pattern
  always fits).
* per-PIXEL gathers cost ~5-8 ns/row on this chip REGARDLESS of
  coherence, so the old resolve (2M x id) + shade (2M x 10-float attr)
  gathers were ~27 ms — v3 packs the SHADING attributes into its own
  entry-indexed row buffer ([px, py, z, r^2, c0, c1, c2, inv_r|flag],
  8 floats — the 8-wide form is the measured gather sweet spot) and
  shades with ONE gather indexed by the kernel's winning ENTRY.  The
  primitive-id image is still available (one more gather) but is lazily
  dead-code-eliminated when callers only consume rgb/depth.
* the kernel tracks (depth, global entry index) — the id is NOT read
  per pair: 4 scalar SMEM reads (px, py, z, r^2) + ~9 VPU ops per pair.
* **strict-< merge** — no equality/tie-break ops per pair.  Exactness
  argument: the binning sort is stable with key = tile, so a tile's run
  preserves expansion order = primitive-id order, and a depth TIE
  between discs implies equal z (disc depth is constant over its
  footprint).  Processing in id order with strict < keeps the FIRST ==
  lowest id — exactly the lexicographic (depth, id) contract.  Two
  preconditions, both documented at the entry point:
  - big-list primitives must carry LOWER ids than every binned disc
    (furniture-first soups; the big loop runs first with the full
    tie-break merge);
  - per-pixel depth of a binned entry must be CONSTANT (true for
    discs; capsules/triangles ride the big list on this path).
* no bounds masking in the inner loop: chunk trip counts round up to
  the unroll multiple; overrun entries belong to neighboring tiles
  whose footprint cannot cover this tile (coverage is a subset of the
  binned bbox), and padding rows have r^2 = 0 — both evaluate to +inf
  and never win under strict <.

Contract (unchanged): winner per pixel = lexicographic min of
(depth, primitive index); division-free per-pixel math (primitives.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pointcloud_render_tpu.raster.pallas_csr import _eval_scalar
from pointcloud_render_tpu.raster.primitives import (
    KIND_CAPSULE,
    KIND_DISC,
)

INF = np.float32(np.inf)
IMAX = np.int32(2147483647)
ROW_F = 8  # px, py, z, r^2, c0, c1, c2, inv_r|preshaded-flag
PACK = 128 // ROW_F  # 16 entries per 128-lane row
DEFAULT_CHUNK_ROWS = 512
DEFAULT_MAX_BIG = 1024


def _bin_csr_2x2(prims, tile_h, tile_w, num_tiles, tiles_x, tiles_y,
                 max_big=DEFAULT_MAX_BIG):
    """Fixed-pattern 2x2 expansion + stable tile-key int16 sort.

    Only DISC (kind 0) primitives whose bbox spans at most 2x2 tiles are
    binned; everything else (capsules, triangles, wide/tall discs) is a
    big-list primitive.  Returns (sorted_keys, sorted_prims, big_list,
    big_count) — the stable sort makes each tile's run ascend in
    primitive id, which the strict-< kernel relies on for exact ties.
    """
    p = prims.count
    xmin, xmax = prims.bbox[:, 0], prims.bbox[:, 1]
    ymin, ymax = prims.bbox[:, 2], prims.bbox[:, 3]
    tx0 = jnp.clip(jnp.floor(xmin / tile_w).astype(jnp.int32), 0, tiles_x - 1)
    tx1 = jnp.clip(jnp.floor(xmax / tile_w).astype(jnp.int32), 0, tiles_x - 1)
    ty0 = jnp.clip(jnp.floor(ymin / tile_h).astype(jnp.int32), 0, tiles_y - 1)
    ty1 = jnp.clip(jnp.floor(ymax / tile_h).astype(jnp.int32), 0, tiles_y - 1)
    ntx = tx1 - tx0 + 1
    nty = ty1 - ty0 + 1
    fits = (ntx <= 2) & (nty <= 2) & (prims.kind == KIND_DISC)
    is_small = prims.valid & fits
    is_big = prims.valid & ~fits

    prim_id = np.arange(p, dtype=np.int32)
    home = ty0 * tiles_x + tx0
    sent = np.int32(num_tiles)

    keys = []
    for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):  # static pattern
        ok = is_small
        if dx:
            ok = ok & (ntx == 2)
        if dy:
            ok = ok & (nty == 2)
        keys.append(jnp.where(ok, home + dy * tiles_x + dx, sent))
    # id-major flattening (axis=1 stack): each tile's run after the
    # stable sort is ascending in primitive id — a disc contributes at
    # most one entry per DISTINCT tile, so ids never repeat in a run and
    # the strict-< kernel's first-wins tie handling equals lowest-id.
    flat_key = jnp.stack(keys, axis=1).reshape(-1)
    flat_prims = jnp.broadcast_to(prim_id[:, None], (p, 4)).reshape(-1)

    k16, sorted_prims = jax.lax.sort(
        (flat_key.astype(jnp.int16), flat_prims), num_keys=1, is_stable=True)
    sorted_keys = k16.astype(jnp.int32)

    big_rank = jnp.cumsum(is_big.astype(jnp.int32)) - 1
    big_idx = jnp.where(is_big & (big_rank < max_big), big_rank, max_big)
    big_list = jnp.full((max_big + 1,), -1, jnp.int32)
    big_list = big_list.at[big_idx].set(prim_id, mode="drop")
    big_list = big_list[:-1]
    big_count = jnp.sum(is_big.astype(jnp.int32))
    return sorted_keys, sorted_prims, big_list, big_count


def _preshade(prims, camera, shading):
    """Per-primitive shading precomputation (pixel-invariant parts).

    Returns (rgb (P,3), flag (P,)):
      flag > 0:  lambert disc; flag = 1/max(r, 1e-6) (the same value
                 shading.shade_framebuffer computes per pixel), rgb = raw
                 base color (lit applied per pixel);
      flag = -1: preshaded row; rgb is the final clipped color
                 (triangles: lambert with the per-prim face normal;
                 capsules: the reference trail_boost).
    Matches shading.shade_framebuffer bit-for-bit: identical formulas on
    identical inputs, evaluated per prim instead of per pixel wherever
    the result is constant over the footprint.
    """
    if shading.mode == "flat":
        return prims.color, jnp.full((prims.count,), -1.0, jnp.float32)
    m = camera.world_to_camera_matrix()
    l_cam = jnp.stack([m[0, 2], m[1, 2], m[2, 2]])
    ndotl_tri = (prims.normal[:, 0] * l_cam[0]
                 + prims.normal[:, 1] * l_cam[1]
                 + prims.normal[:, 2] * l_cam[2])
    lit = shading.ambient + shading.diffuse * jnp.maximum(ndotl_tri, 0.0)
    lit = jnp.where(prims.kind == KIND_CAPSULE, shading.trail_boost, lit)
    pre_rgb = jnp.clip(prims.color * lit[:, None], 0.0, 1.0)
    is_disc = prims.kind == KIND_DISC
    inv_r = 1.0 / jnp.maximum(prims.params[:, 3], 1e-6)
    rgb = jnp.where(is_disc[:, None], prims.color, pre_rgb)
    flag = jnp.where(is_disc, inv_r, -1.0)
    return rgb, flag


def _pack_rows8(prims, sorted_prims, e_pad, big_list, shade_rgb, shade_flag,
                background):
    """(e_pad + BIG + 1, 8) f32 rows [px, py, z, r^2, c0, c1, c2, flag].

    Rows [0, e_pad) are the sorted binned entries (pad rows are zeros —
    r^2 = 0 covers no pixel-center, so kernel overrun is inert); rows
    [e_pad, e_pad + BIG) are the big-list primitives (shade-only); the
    last row is the preshaded background (empty pixels resolve there).
    """
    e = sorted_prims.shape[0]
    prims_p = jnp.pad(sorted_prims, (0, e_pad - e), constant_values=-1)
    safe = jnp.maximum(prims_p, 0)
    # ONE (P, 8) table -> ONE row gather: gathers are row-count bound
    # (~6 ns/row), so splitting params/rgb/flag into separate gathers
    # triples the cost.  r^2 is squared AFTER the gather (elementwise).
    table8 = jnp.concatenate([
        prims.params[:, 0:4], shade_rgb, shade_flag[:, None],
    ], axis=1)
    g = table8[safe]  # (e_pad, 8): px, py, z, r, c0, c1, c2, flag
    live = prims_p >= 0
    r2 = jnp.where(live, g[:, 3] * g[:, 3], 0.0)
    binned = jnp.concatenate([g[:, 0:3], r2[:, None], g[:, 4:8]], axis=1)

    big_safe = jnp.maximum(big_list, 0)
    gb = table8[big_safe]
    big_rows = jnp.concatenate(
        [gb[:, 0:3], gb[:, 3:4] * gb[:, 3:4], gb[:, 4:8]], axis=1)

    bg_row = jnp.concatenate([
        jnp.zeros((4,), jnp.float32),
        jnp.asarray(background, jnp.float32).reshape(3),
        jnp.full((1,), -1.0, jnp.float32),
    ])[None, :]
    return jnp.concatenate([binned, big_rows, bg_row], axis=0)


def _make_kernel3(tiles_x, tile_h, tile_w, unroll, n_chunk_block,
                  chunk_rows):
    def kernel(starts_ref,  # scalar prefetch: (T+2,) i32; [T+1] = big count
               rows_hbm,  # (E_pad/16, 128) f32 in ANY/HBM
               big_params_ref,  # SMEM (16, BIG) f32
               big_ids_ref,  # SMEM (1, BIG) i32
               big_kinds_ref,  # SMEM (1, BIG) i32
               depth_out,  # VMEM (1, TH, TW) f32
               ent_out,  # VMEM (1, TH, TW) i32 — global ENTRY index
               scratch,  # SMEM (2, n_chunk_block, 128) f32
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
        n_chunks = pl.cdiv(count, chunk_rows)
        big_n = starts_ref[pl.num_programs(0) + 1]

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

        # Big primitives (furniture) first, with the FULL tie-break merge
        # (big ids must be below every binned id — see the entry-point
        # preconditions — so a binned strict-< loss on a tie is correct).
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
        # Big winners travel as NEGATIVE entries: ent = -(pid + 2)
        # (distinct from the IMAX empty sentinel).
        e_bg = jnp.where(i_bg == IMAX, IMAX, -(i_bg + 2))

        # `unroll` independent (depth, entry) chains (see pallas_csr2).
        accs = [d_bg, e_bg]
        for _ in range(unroll - 1):
            accs += [jnp.full((tile_h, tile_w), INF, jnp.float32),
                     jnp.full((tile_h, tile_w), IMAX, jnp.int32)]
        init = tuple(accs)

        def chunk_body(ci, accs_in):
            slot = jax.lax.rem(ci, 2)

            @pl.when(ci + 1 < n_chunks)
            def _():
                get_dma(jax.lax.rem(ci + 1, 2), ci + 1).start()

            get_dma(slot, ci).wait()

            g0 = start + ci * chunk_rows
            o0 = jax.lax.rem(g0, PACK)
            m = jnp.minimum(chunk_rows, count - ci * chunk_rows)

            def eval_one(j, d0, e0):
                # j may overrun m up to unroll-1 entries into the next
                # tile's range (or zero padding): both are inert (the
                # overrun disc cannot cover this tile; pads have r^2=0),
                # and strict < means +inf never displaces anything.
                lin = o0 + j
                br = lin // PACK
                lane = jax.lax.rem(lin, PACK) * ROW_F
                px = scratch[slot, br, lane]
                py = scratch[slot, br, lane + 1]
                z = scratch[slot, br, lane + 2]
                r2 = scratch[slot, br, lane + 3]
                dx = qx - px
                dy = qy - py
                better = (dx * dx + dy * dy <= r2) & (z < d0)
                ent = g0 + j  # global entry index (scalar, broadcast)
                return (jnp.where(better, z, d0),
                        jnp.where(better, ent, e0))

            def prim_body(s, c2):
                out = list(c2)
                base = s * unroll
                for u in range(unroll):
                    out[2 * u], out[2 * u + 1] = eval_one(
                        base + u, out[2 * u], out[2 * u + 1])
                return tuple(out)

            return jax.lax.fori_loop(0, pl.cdiv(m, unroll), prim_body,
                                     accs_in)

        out = jax.lax.fori_loop(0, n_chunks, chunk_body, init)
        depth, ent = out[0], out[1]
        for u in range(1, unroll):
            du, eu = out[2 * u], out[2 * u + 1]
            # Equal-depth ties across chains resolve by entry index,
            # which inside one tile run equals primitive-id order.
            better = (du < depth) | ((du == depth) & (eu < ent))
            depth = jnp.where(better, du, depth)
            ent = jnp.where(better, eu, ent)

        depth_out[0, :, :] = depth
        ent_out[0, :, :] = ent

    return kernel


def true_entry_count3(prims, width: int, height: int, tile_h: int = 8,
                      tile_w: int = 128):
    """() int32 non-sentinel entries under the 2x2 binning (the exactness
    precondition for a finite entry_capacity, as in pallas_csr2)."""
    tiles_y = -(-height // tile_h)
    tiles_x = -(-width // tile_w)
    num_tiles = tiles_y * tiles_x
    sorted_keys, *_ = _bin_csr_2x2(prims, tile_h, tile_w, num_tiles,
                                   tiles_x, tiles_y)
    return jnp.searchsorted(
        sorted_keys, jnp.int32(num_tiles)).astype(jnp.int32)


def bin_diagnostics3(prims, width: int, height: int, tile_h: int = 8,
                     tile_w: int = 128, max_big: int = DEFAULT_MAX_BIG):
    """Big-list overflow count under the 2x2 binning (0 = exact)."""
    tiles_y = -(-height // tile_h)
    tiles_x = -(-width // tile_w)
    num_tiles = tiles_y * tiles_x
    _, _, big_list, big_count = _bin_csr_2x2(
        prims, tile_h, tile_w, num_tiles, tiles_x, tiles_y, max_big=max_big)
    return jnp.maximum(big_count - big_list.shape[0], 0)


def _raster_core(prims, width, height, tile_h, tile_w, unroll,
                 entry_capacity, chunk_rows, interpret, shade_rgb,
                 shade_flag, background):
    """Shared binning + kernel launch.  Returns (depth, ent, rows_flat,
    sorted_prims, e_pad) — ent encodes binned entries >= 0, big winners
    as -(pid+2), empties as IMAX."""
    tiles_y = -(-height // tile_h)
    tiles_x = -(-width // tile_w)
    num_tiles = tiles_y * tiles_x

    sorted_keys, sorted_prims, big_list, big_count = _bin_csr_2x2(
        prims, tile_h, tile_w, num_tiles, tiles_x, tiles_y)

    starts = jnp.searchsorted(
        sorted_keys,
        np.arange(num_tiles + 1, dtype=np.int32)).astype(jnp.int32)

    e = sorted_prims.shape[0]
    if entry_capacity is not None:
        e = min(e, int(entry_capacity))
        sorted_prims = sorted_prims[:e]
        starts = jnp.minimum(starts, e)
    e_pad = -(-(e + chunk_rows + PACK) // chunk_rows) * chunk_rows
    if prims.count >= (1 << 24):
        raise ValueError("CSR kernel id encoding supports < 2^24 primitives")
    rows_flat = _pack_rows8(prims, sorted_prims, e_pad, big_list,
                            shade_rgb, shade_flag, background)
    rows = rows_flat[:e_pad].reshape(e_pad // PACK, 128)

    big_safe = jnp.maximum(big_list, 0)
    big_kinds = jnp.where((big_list >= 0) & prims.valid[big_safe],
                          prims.kind[big_safe], -1)[None, :]
    big_params = jnp.zeros((16, big_list.shape[0]), jnp.float32)
    big_params = big_params.at[:12, :].set(prims.params[big_safe].T)
    big_ids = big_list[None, :]

    scalars = jnp.concatenate([
        starts, jnp.minimum(big_count, big_list.shape[0])[None].astype(
            jnp.int32)])

    n_chunk_block = chunk_rows // PACK + 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((16, big_list.shape[0]), lambda i, c: (0, 0),
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
            pltpu.SMEM((2, n_chunk_block, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = _make_kernel3(tiles_x, tile_h, tile_w, unroll, n_chunk_block,
                           chunk_rows)
    depth_t, ent_t = pl.pallas_call(
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
    ent = ent_t.reshape(tiles_y, tiles_x, tile_h, tile_w) \
        .transpose(0, 2, 1, 3).reshape(tiles_y * tile_h, tiles_x * tile_w)
    return depth[:height, :width], ent[:height, :width], rows_flat, \
        sorted_prims, e_pad


def _resolve_ids(ent, depth, sorted_prims):
    """Entry image -> primitive-id image (one gather; lazily DCE'd when
    callers only consume rgb/depth)."""
    prims_pad = jnp.pad(sorted_prims, (0, 1), constant_values=-1)
    binned_id = prims_pad[jnp.clip(ent, 0, prims_pad.shape[0] - 1)]
    idx = jnp.where(ent < 0, -ent - 2, binned_id)
    return jnp.where(jnp.isinf(depth), -1, idx)


def rasterize_pallas_csr3(prims, width: int, height: int, tile_h: int = 8,
                          tile_w: int = 128, unroll: int = 4,
                          entry_capacity=None,
                          chunk_rows: int = DEFAULT_CHUNK_ROWS,
                          interpret: bool = False):
    """Returns (depth (H,W) f32 +inf-empty, index (H,W) i32 -1-empty).

    Disc fast path: every binned entry is a 2x2-tile-span disc;
    capsules, triangles, and wider discs ride the big list (exact, but
    O(T x big) — use pallas_csr2 for trail/droplet-heavy scenes).

    EXACTNESS PRECONDITIONS (see module docstring):
    * big-list primitives (non-discs / wide discs) must carry LOWER
      primitive ids than every binned disc — true for the pipeline's
      furniture-first soups; violating scenes must use pallas_csr2;
    * with a finite ``entry_capacity``, true_entry_count3(scene) must be
      <= entry_capacity (same policy as pallas_csr2).
    """
    zeros3 = jnp.zeros((prims.count, 3), jnp.float32)
    zerosf = jnp.zeros((prims.count,), jnp.float32)
    depth, ent, _, sorted_prims, _ = _raster_core(
        prims, width, height, tile_h, tile_w, unroll, entry_capacity,
        chunk_rows, interpret, zeros3, zerosf, (0.0, 0.0, 0.0))
    return depth, _resolve_ids(ent, depth, sorted_prims)


def render_shaded_csr3(prims, camera, shading, tile_h: int = 8,
                       tile_w: int = 128, unroll: int = 4,
                       entry_capacity=None,
                       chunk_rows: int = DEFAULT_CHUNK_ROWS,
                       interpret: bool = False):
    """Rasterize + shade in one pass: (rgb, depth, index).

    Matches shading.shade_framebuffer bit-for-bit (lambert and flat
    modes) while paying ONE 8-float per-pixel gather instead of the
    id-resolve + 10-float attribute gathers (~2.6x cheaper shade+resolve
    at 1080p — docs/KERNEL_NOTES.md).  Same exactness preconditions as
    rasterize_pallas_csr3.
    """
    width, height = camera.width, camera.height
    shade_rgb, shade_flag = _preshade(prims, camera, shading)
    depth, ent, rows_flat, sorted_prims, e_pad = _raster_core(
        prims, width, height, tile_h, tile_w, unroll, entry_capacity,
        chunk_rows, interpret, shade_rgb, shade_flag, shading.background)

    # Winner attribute rows: binned entries index directly; big winners
    # live at [e_pad, e_pad + BIG); empties resolve to the final
    # background row.
    n_rows = rows_flat.shape[0]
    shade_idx = jnp.where(ent == IMAX, n_rows - 1,
                          jnp.where(ent < 0, e_pad + (-ent - 2), ent))
    a = rows_flat[jnp.clip(shade_idx, 0, n_rows - 1)]  # (H, W, 8)

    if shading.mode == "flat":
        rgb = a[..., 4:7]
    else:
        qx = (np.arange(width, dtype=np.float32) + 0.5)[None, :]
        qy = (np.arange(height, dtype=np.float32) + 0.5)[:, None]
        m = camera.world_to_camera_matrix()
        l_cam = jnp.stack([m[0, 2], m[1, 2], m[2, 2]])
        inv_r = a[..., 7]
        u = (qx - a[..., 0]) * inv_r
        v = -(qy - a[..., 1]) * inv_r
        w2 = jnp.maximum(0.0, 1.0 - u * u - v * v)
        nz = -jnp.sqrt(w2)
        ndotl = u * l_cam[0] + v * l_cam[1] + nz * l_cam[2]
        lit = shading.ambient + shading.diffuse * jnp.maximum(ndotl, 0.0)
        is_disc = inv_r > 0
        rgb = jnp.where(is_disc[..., None], a[..., 4:7] * lit[..., None],
                        a[..., 4:7])

    bg = np.asarray(shading.background, np.float32)
    hit = jnp.isfinite(depth)
    rgb = jnp.clip(jnp.where(hit[..., None], rgb, bg), 0.0, 1.0)
    return rgb, depth, _resolve_ids(ent, depth, sorted_prims)
