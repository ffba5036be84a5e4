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
  - exact-depth ties between a big-list primitive and a binned disc
    keep the big one (the big loop runs first; strict < never
    displaces it) — lexicographically correct iff big ids sit below
    binned ids, as in the pipeline's furniture-first soups;
  - per-pixel depth of a binned entry must be CONSTANT (true for
    discs; capsules/triangles ride the big list on this path).
* the inner loop processes whole PACK-aligned 16-entry scratch rows at
  STATIC lane offsets (no per-pair address arithmetic); out-of-run
  slots are inert, idempotent, or scalar-masked (the soundness cases
  are spelled out at ``_make_kernel3.make_row_body``);
* tile runs are sorted near-to-far by a z-bucket packed into the sort
  key (``_bin_csr_2x2``), and the kernel STOPS STREAMING once the next
  bucket's depth floor can no longer beat any pixel's winner — the
  depth early-exit that skips most far-side overdraw;
* the (8, 128) f32 VREG can represent a square (32, 32) or (16, 64)
  PIXEL block instead of an (8, 128) strip (``tile_h``/``tile_w``):
  squarer tiles cut multi-tile entry duplication.

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


def _zq_bits(num_tiles: int) -> int:
    """Depth-bucket bits packed below the tile id in the int16 sort key
    ((num_tiles+1) << bits must stay within int16)."""
    b = 0
    while b < 4 and ((num_tiles + 1) << (b + 1)) <= 32767:
        b += 1
    return b


def _bin_csr_2x2(prims, tile_h, tile_w, num_tiles, tiles_x, tiles_y,
                 max_big=DEFAULT_MAX_BIG):
    """Fixed-pattern 2x2 expansion + stable (tile, z-bucket) int16 sort.

    Only DISC (kind 0) primitives whose bbox spans at most 2x2 tiles are
    binned; everything else (capsules, triangles, wide/tall discs) is a
    big-list primitive.  Returns (sorted_keys, sorted_prims, big_list,
    big_count, zmeta) with zmeta = f32 [zmin, s, thr_scale] describing
    the depth quantization (see below; all zeros when no bucket bits fit
    the key, disabling the kernel's early exit).

    Sort key = ``tile << zq_bits | qz`` where ``qz = clip(floor((z -
    zmin) * s), 0, 2^zq_bits - 1)`` linearly buckets the BINNED discs'
    depth range.  The stable sort therefore orders each tile's run by
    (z-bucket, primitive id):
    * depth TIES share a bucket, so tie order is id order and the
      strict-< kernel's first-wins merge still realizes the
      lexicographic (depth, id) contract;
    * runs ascend near-to-far, enabling the kernel's depth early-exit:
      every entry after one with bucket qz has true depth >= zmin +
      qz * (1/s) (floor property), so once that bound >= the tile's
      worst winning depth nothing remaining can win.  The kernel
      recomputes qz from the last streamed depth with the same f32
      arithmetic and applies a one-bucket + (1 - 1e-6) safety margin
      (zmeta[2] = (1 - 1e-6) / s), keeping the exit sound under f32
      rounding.
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
    fits = (ntx <= 2) & (nty <= 2) & (prims.kind == KIND_DISC)
    is_small = prims.valid & fits
    is_big = prims.valid & ~fits

    prim_id = np.arange(p, dtype=np.int32)
    home = ty0 * tiles_x + tx0
    sent = np.int32(num_tiles << zq_bits)

    if zq_bits > 0:
        nb = np.float32(1 << zq_bits)
        z = prims.params[:, 2]
        zmin = jnp.min(jnp.where(is_small, z, INF))
        zmax = jnp.max(jnp.where(is_small, z, -INF))
        rngz = zmax - zmin
        s = jnp.where(rngz > 0, nb / rngz, 0.0)
        qz = jnp.clip(jnp.floor((z - zmin) * s), 0.0,
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
    # id-major flattening (axis=1 stack): a disc contributes at most one
    # entry per DISTINCT tile, so each tile run of the stable sort below
    # ascends in (z-bucket, primitive id) with no repeated ids.
    flat_key = jnp.stack(keys, axis=1).reshape(-1)
    flat_prims = jnp.broadcast_to(prim_id[:, None], (p, 4)).reshape(-1)
    # int16 keys only when the sentinel fits (the tiles.py guard):
    # >32767-tile grids (>8K renders at 32x32 blocks) silently wrap
    # int16 and interleave sentinel/real keys.
    if ((num_tiles + 1) << zq_bits) <= 32767:
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
    big_list = big_list.at[big_idx].set(prim_id, mode="drop")
    big_list = big_list[:-1]
    big_count = jnp.sum(is_big.astype(jnp.int32))
    return sorted_keys, sorted_prims, big_list, big_count, zmeta


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
    # Pad entries index the all-zero sentinel row (index P): the gather
    # output IS the row buffer — no post-gather masking or re-concat.
    prims_p = jnp.pad(sorted_prims, (0, e_pad - e),
                      constant_values=prims.count)
    # ONE (P+1, 8) table -> ONE row gather: gathers are row-count bound
    # (~6 ns/row), so splitting params/rgb/flag into separate gathers
    # triples the cost.  r^2 is squared at TABLE build (P rows), not
    # per entry — bit-identical (same f32 multiply on the same input).
    r = prims.params[:, 3]
    table8 = jnp.concatenate([
        prims.params[:, 0:3], (r * r)[:, None], shade_rgb,
        shade_flag[:, None],
    ], axis=1)
    # INVALID prims (z-clipped / off-film) keep live — possibly
    # covering, possibly non-finite — params, and the sentinel-keyed
    # sort tail sits right after the LAST tile's run, inside its
    # PACK-aligned stranger slop: zero their rows (r^2 = 0 covers no
    # pixel center).  jnp.where, not *, so inf/NaN params can't leak
    # NaNs into the row.  (Big rows are unaffected: big_list indexes
    # valid prims only.)
    table8 = jnp.where(prims.valid[:, None], table8, 0.0)
    table8 = jnp.pad(table8, ((0, 1), (0, 0)))
    binned = table8[prims_p]  # (e_pad, 8): px, py, z, r^2, c0-c2, flag

    big_safe = jnp.where(big_list >= 0, big_list, prims.count)
    big_rows = table8[big_safe]

    bg_row = jnp.concatenate([
        jnp.zeros((4,), jnp.float32),
        jnp.asarray(background, jnp.float32).reshape(3),
        jnp.full((1,), -1.0, jnp.float32),
    ])[None, :]
    return jnp.concatenate([binned, big_rows, bg_row], axis=0)


def _make_kernel3(tiles_x, tile_h, tile_w, unroll, n_chunk_block,
                  chunk_rows, allow_exit):
    assert chunk_rows % PACK == 0

    def kernel(starts_ref,  # scalar prefetch: (T+2,) i32; [T+1] = big count
               rows_hbm,  # (E_pad/16, 128) f32 in ANY/HBM
               big_params_ref,  # SMEM (16, BIG) f32
               big_kinds_ref,  # SMEM (1, BIG) i32
               zmeta_ref,  # SMEM (1, 3) f32: zmin, s, thr_scale
               depth_out,  # VMEM (1, 8, 128) f32 — one pixel block
               ent_out,  # VMEM (1, 8, 128) i32 — global ENTRY index
               scratch,  # SMEM (2, n_chunk_block, 128) f32
               sems):  # DMA sems (2,)
        tile = pl.program_id(0)
        ty = tile // tiles_x
        tx = tile % tiles_x
        # The (8, 128) f32 VREG covers a (tile_h, tile_w) PIXEL block:
        # lane l, sublane s -> pixel (x = l % tile_w,
        # y = s + 8 * (l // tile_w)).  All divisors are constants
        # (shifts); tile_w = 128 reduces to the plain row-major tile.
        ix = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        iy = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        qx = (tx * tile_w + ix % tile_w).astype(jnp.float32) + 0.5
        qy = (ty * tile_h + iy + 8 * (ix // tile_w)).astype(
            jnp.float32) + 0.5

        start = starts_ref[tile]
        count = starts_ref[tile + 1] - start
        n_chunks = pl.cdiv(count, chunk_rows)
        big_n = starts_ref[pl.num_programs(0) + 1]
        # Every chunk's DMA block is PACK-row aligned; the run starts o0
        # entries into the first row (o0 is the same for every chunk
        # because chunk_rows is a PACK multiple).
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

        # Big primitives (furniture) first.  The big list ascends in
        # primitive id (rank order == id order), so processing in rank
        # order with strict < keeps the FIRST == lowest id on ties —
        # the winner is tracked by RANK, which is also how big_params /
        # big_rows are laid out (the id is recovered on the XLA side
        # via big_list[rank]).
        def big_body(j, carry):
            d, rk = carry
            kind = big_kinds_ref[0, j]
            p = tuple(big_params_ref[r, j] for r in range(12))
            zc = _eval_scalar(kind, p, qx, qy)
            better = zc < d
            return jnp.where(better, zc, d), jnp.where(better, j, rk)

        d_bg, r_bg = jax.lax.fori_loop(
            0, big_n, big_body,
            (jnp.full((8, 128), INF, jnp.float32),
             jnp.full((8, 128), IMAX, jnp.int32)))
        # Big winners travel as NEGATIVE entries: ent = -(rank + 2)
        # (distinct from the IMAX empty sentinel).
        e_bg = jnp.where(r_bg == IMAX, IMAX, -(r_bg + 2))

        # `unroll` independent (depth, entry) chains (see pallas_csr2).
        accs = [d_bg, e_bg]
        for _ in range(unroll - 1):
            accs += [jnp.full((8, 128), INF, jnp.float32),
                     jnp.full((8, 128), IMAX, jnp.int32)]
        init = tuple(accs)

        def make_row_body(slot, base_ent, lf_chunk):
            # One PACK-aligned scratch row: 16 entries at STATIC lane
            # offsets — no per-entry address arithmetic.  Rows always
            # process all 16 slots; the out-of-run slots are sound:
            #  * slots before the run start (chunk 0 row 0, u < o0) hold
            #    the previous tile's run tail.  Such an entry CAN cover
            #    this tile (it then also appears later in our own run),
            #    and processing it early would beat an equal-depth
            #    lower-id entry — so those slots are masked via a SCALAR
            #    select to +inf depth (lf = live-from index, 0 for every
            #    other row);
            #  * slots past the run end are the next tiles' runs or zero
            #    padding.  They come AFTER every own entry, so an
            #    equal-depth own entry has already won under strict <;
            #    a differing-depth cover resolves by true depth; zero
            #    padding (r^2 = 0) covers no pixel center.  All inert or
            #    idempotent — left unmasked;
            #  * row overlap between consecutive chunks reprocesses the
            #    same (z, ent) pairs — idempotent under strict <.
            def row_body(br, c2):
                out = list(c2)
                row_ent = base_ent + br * PACK
                lf = jnp.where(br == 0, lf_chunk, 0)
                for u in range(PACK):
                    lane = u * ROW_F
                    px = scratch[slot, br, lane]
                    py = scratch[slot, br, lane + 1]
                    z = jnp.where(u >= lf, scratch[slot, br, lane + 2], INF)
                    r2 = scratch[slot, br, lane + 3]
                    ch = u % unroll
                    d0, e0 = out[2 * ch], out[2 * ch + 1]
                    dx = qx - px
                    dy = qy - py
                    better = (dx * dx + dy * dy <= r2) & (z < d0)
                    out[2 * ch] = jnp.where(better, z, d0)
                    out[2 * ch + 1] = jnp.where(better, row_ent + u, e0)
                return tuple(out)

            return row_body

        def process_chunk(ci, slot, accs_in):
            g0 = start + ci * chunk_rows
            mc = jnp.minimum(chunk_rows, count - ci * chunk_rows)
            n_rows = (o0 + mc + (PACK - 1)) // PACK
            lf_chunk = jnp.where(ci == 0, o0, 0)
            row_body = make_row_body(slot, g0 - o0, lf_chunk)
            return jax.lax.fori_loop(0, n_rows, row_body, accs_in), n_rows

        if allow_exit:
            # Runs are sorted near-to-far (z-bucket order, _bin_csr_2x2):
            # every unprocessed entry's depth is >= its bucket's floor
            # >= the last streamed bucket's floor, so once that floor
            # (minus a one-bucket + 1e-6 rounding margin) >= the tile's
            # worst winning depth, nothing remaining can win under
            # strict < — stop streaming.  (The last scratch slot may
            # hold a NEXT tile's entry or padding — both quantize to an
            # earlier-or-equal bucket, which only delays the exit,
            # never wrongs it.)
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
                last_z = scratch[slot, n_rows - 1, (PACK - 1) * ROW_F + 2]
                # Same f32 quantization as the binning, one bucket back.
                qz = jnp.maximum(jnp.floor((last_z - zmin) * zs) - 1.0,
                                 0.0)
                done = zmin + qz * thr_scale >= dmax
                return (ci + 1, done) + accs_out

            final = jax.lax.while_loop(
                cond, body, (jnp.int32(0), jnp.bool_(False)) + init)
            ci_end, done = final[0], final[1]
            out = final[2:]

            # Drain the prefetch issued for the never-processed chunk.
            @pl.when(done & (ci_end < n_chunks))
            def _():
                get_dma(jax.lax.rem(ci_end, 2), ci_end).wait()
        else:
            def chunk_body(ci, accs_in):
                slot = jax.lax.rem(ci, 2)

                @pl.when(ci + 1 < n_chunks)
                def _():
                    get_dma(jax.lax.rem(ci + 1, 2), ci + 1).start()

                get_dma(slot, ci).wait()
                accs_out, _ = process_chunk(ci, slot, accs_in)
                return accs_out

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


def true_entry_count3(prims, width: int, height: int, tile_h: int = 32,
                      tile_w: int = 32):
    """() int32 non-sentinel entries under the 2x2 binning (the exactness
    precondition for a finite entry_capacity, as in pallas_csr2)."""
    tiles_y = -(-height // tile_h)
    tiles_x = -(-width // tile_w)
    num_tiles = tiles_y * tiles_x
    sorted_keys, *_ = _bin_csr_2x2(prims, tile_h, tile_w, num_tiles,
                                   tiles_x, tiles_y)  # noqa: F841
    return jnp.searchsorted(
        sorted_keys,
        jnp.int32(num_tiles << _zq_bits(num_tiles))).astype(jnp.int32)


def bin_diagnostics3(prims, width: int, height: int, tile_h: int = 32,
                     tile_w: int = 32, max_big: int = DEFAULT_MAX_BIG):
    """Big-list overflow count under the 2x2 binning (0 = exact)."""
    tiles_y = -(-height // tile_h)
    tiles_x = -(-width // tile_w)
    num_tiles = tiles_y * tiles_x
    _, _, big_list, big_count, _ = _bin_csr_2x2(
        prims, tile_h, tile_w, num_tiles, tiles_x, tiles_y, max_big=max_big)
    return jnp.maximum(big_count - big_list.shape[0], 0)


def _raster_core(prims, width, height, tile_h, tile_w, unroll,
                 entry_capacity, chunk_rows, interpret, shade_rgb,
                 shade_flag, background):
    """Shared binning + kernel launch.  Returns (depth, ent, rows_flat,
    sorted_prims, e_pad) — ent encodes binned entries >= 0, big winners
    as -(pid+2), empties as IMAX."""
    if tile_h * tile_w != 1024 or tile_w not in (16, 32, 64, 128):
        raise ValueError(
            "pallas_csr3 pixel blocks must hold exactly one (8, 128) "
            "f32 VREG: tile_h * tile_w == 1024 with tile_w in "
            "{16, 32, 64, 128}")
    tiles_y = -(-height // tile_h)
    tiles_x = -(-width // tile_w)
    num_tiles = tiles_y * tiles_x

    sorted_keys, sorted_prims, big_list, big_count, zmeta = _bin_csr_2x2(
        prims, tile_h, tile_w, num_tiles, tiles_x, tiles_y)

    zq_bits = _zq_bits(num_tiles)
    starts = jnp.searchsorted(
        sorted_keys,
        np.arange(num_tiles + 1, dtype=np.int32) << zq_bits
    ).astype(jnp.int32)
    # True (pre-capacity) entry count — callers with a finite
    # entry_capacity can check the exactness precondition post hoc.
    true_count = starts[num_tiles]

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

    scalars = jnp.concatenate([
        starts, jnp.minimum(big_count, big_list.shape[0])[None].astype(
            jnp.int32)])

    n_chunk_block = chunk_rows // PACK + 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((16, big_list.shape[0]), lambda i, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, big_list.shape[0]), lambda i, c: (0, 0),
                         memory_space=pltpu.SMEM),
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
        ],
    )

    kernel = _make_kernel3(tiles_x, tile_h, tile_w, unroll, n_chunk_block,
                           chunk_rows, allow_exit=zq_bits > 0)
    depth_t, ent_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, 8, 128), jnp.int32),
        ],
        interpret=interpret,
    )(scalars, rows, big_params, big_kinds, zmeta[None, :])

    # Undo the kernel's VREG->pixel-block mapping: lane l, sublane s of
    # tile (ty, tx) is pixel (x = tx*tw + l % tw,
    # y = ty*th + s + 8*(l // tw)).
    nq = 128 // tile_w

    def assemble(t):
        return t.reshape(tiles_y, tiles_x, 8, nq, tile_w) \
            .transpose(0, 3, 2, 1, 4) \
            .reshape(tiles_y * tile_h, tiles_x * tile_w)

    depth = assemble(depth_t)
    ent = assemble(ent_t)
    big_overflow = jnp.maximum(big_count - big_list.shape[0], 0)
    return depth[:height, :width], ent[:height, :width], rows_flat, \
        sorted_prims, big_list, e_pad, true_count, big_overflow


def _resolve_ids(ent, depth, sorted_prims, big_list):
    """Entry image -> primitive-id image (two gathers; lazily DCE'd
    when callers only consume rgb/depth).  Big winners carry their big
    RANK (-(rank+2)); the id is big_list[rank]."""
    prims_pad = jnp.pad(sorted_prims, (0, 1), constant_values=-1)
    binned_id = prims_pad[jnp.clip(ent, 0, prims_pad.shape[0] - 1)]
    big_rank = jnp.clip(-ent - 2, 0, big_list.shape[0] - 1)
    idx = jnp.where(ent < 0, big_list[big_rank], binned_id)
    return jnp.where(jnp.isinf(depth), -1, idx)


def rasterize_pallas_csr3(prims, width: int, height: int, tile_h: int = 32,
                          tile_w: int = 32, unroll: int = 4,
                          entry_capacity=None,
                          chunk_rows: int = DEFAULT_CHUNK_ROWS,
                          interpret: bool = False,
                          return_entry_count: bool = False):
    """Returns (depth (H,W) f32 +inf-empty, index (H,W) i32 -1-empty).

    Disc fast path: every binned entry is a 2x2-tile-span disc;
    capsules, triangles, and wider discs ride the big list (exact, but
    O(T x big) — use pallas_csr2 for trail/droplet-heavy scenes).

    EXACTNESS PRECONDITIONS (see module docstring):
    * an exact-depth TIE between a big-list primitive and a binned disc
      resolves to the BIG one; that equals the lexicographic (depth, id)
      contract iff every big-list primitive's id is below the binned
      disc's — true for the pipeline's furniture-first soups.  Scenes
      mixing big and binned prims at identical depths across that order
      must use pallas_csr2 (per-pair id tie-break);
    * with a finite ``entry_capacity``, true_entry_count3(scene) must be
      <= entry_capacity (same policy as pallas_csr2).
    """
    zeros3 = jnp.zeros((prims.count, 3), jnp.float32)
    zerosf = jnp.zeros((prims.count,), jnp.float32)
    depth, ent, _, sorted_prims, big_list, _, true_count, _ = _raster_core(
        prims, width, height, tile_h, tile_w, unroll, entry_capacity,
        chunk_rows, interpret, zeros3, zerosf, (0.0, 0.0, 0.0))
    index = _resolve_ids(ent, depth, sorted_prims, big_list)
    if return_entry_count:
        return depth, index, true_count
    return depth, index


def render_shaded_csr3(prims, camera, shading, tile_h: int = 32,
                       tile_w: int = 32, unroll: int = 4,
                       entry_capacity=None,
                       chunk_rows: int = DEFAULT_CHUNK_ROWS,
                       uniform_look=None,
                       interpret: bool = False,
                       return_diag: bool = False):
    """Rasterize + shade in one pass: (rgb, depth, index).

    Matches shading.shade_framebuffer bit-for-bit (lambert and flat
    modes) while paying ONE 8-float per-pixel gather instead of the
    id-resolve + 10-float attribute gathers (~2.6x cheaper shade+resolve
    at 1080p — docs/KERNEL_NOTES.md).  Same exactness preconditions as
    rasterize_pallas_csr3.

    ``uniform_look``: optional ((r, g, b), (br, bg, bb)) for TWO-TONE
    scenes (the bench's gray cloud over the white ground): the per-pixel
    winner gather narrows to 4 floats [px, py, flag, 0] — the colors are
    injected as constants (first tuple: every binned disc's RAW color;
    second: every big prim's PRESHADED rgb).  Bit-identical to the
    generic path exactly when the scene satisfies that; lambert only.
    MEASURED NOTE (r3 A/B at 1M/1080p): the (E, 4) attr repack costs
    more than the narrower per-pixel gather saves when the row table is
    rebuilt every frame (42.70 vs 40.87 ms/frame) — use only where the
    table persists across many shade passes.
    """
    width, height = camera.width, camera.height
    shade_rgb, shade_flag = _preshade(prims, camera, shading)
    (depth, ent, rows_flat, sorted_prims, big_list, e_pad, _tc,
     _ovf) = _raster_core(
        prims, width, height, tile_h, tile_w, unroll, entry_capacity,
        chunk_rows, interpret, shade_rgb, shade_flag, shading.background)

    # Winner attribute rows: binned entries index directly; big winners
    # carry their big RANK, matching big_rows' rank-order layout at
    # [e_pad, e_pad + BIG); empties resolve to the final background row.
    n_rows = rows_flat.shape[0]
    shade_idx = jnp.where(ent == IMAX, n_rows - 1,
                          jnp.where(ent < 0, e_pad + (-ent - 2), ent))
    shade_idx = jnp.clip(shade_idx, 0, n_rows - 1)

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

    if uniform_look is not None and shading.mode != "flat":
        attr4 = jnp.concatenate(
            [rows_flat[:, 0:2], rows_flat[:, 7:8],
             jnp.zeros((n_rows, 1), jnp.float32)], axis=1)
        a = attr4[shade_idx]  # (H, W, 4)
        inv_r = a[..., 2]
        lit = lambert(a[..., 0], a[..., 1], inv_r)
        uc = np.asarray(uniform_look[0], np.float32)
        ub = np.asarray(uniform_look[1], np.float32)
        rgb = jnp.where((inv_r > 0)[..., None], uc * lit[..., None], ub)
    else:
        a = rows_flat[shade_idx]  # (H, W, 8)
        if shading.mode == "flat":
            rgb = a[..., 4:7]
        else:
            inv_r = a[..., 7]
            lit = lambert(a[..., 0], a[..., 1], inv_r)
            is_disc = inv_r > 0
            rgb = jnp.where(is_disc[..., None], a[..., 4:7] * lit[..., None],
                            a[..., 4:7])

    bg = np.asarray(shading.background, np.float32)
    hit = jnp.isfinite(depth)
    rgb = jnp.clip(jnp.where(hit[..., None], rgb, bg), 0.0, 1.0)
    index = _resolve_ids(ent, depth, sorted_prims, big_list)
    if return_diag:
        # The frame's OWN binning already produced both certificates —
        # re-running true_entry_count3/bin_diagnostics3 would pay two
        # extra O(4P log 4P) sorts per frame.
        return rgb, depth, index, dict(true_entries=_tc,
                                       big_overflow=_ovf)
    return rgb, depth, index
