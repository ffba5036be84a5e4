"""CSR Pallas rasterizer v6: ANCHOR-SORTED binning (per-prim sort).

v3/v4 bin by expanding every <=2x2-tile prim into 4 key slots and
sorting 4P entries; at 1M discs that sort is 4.6 ms and at the 9M-prim
trail soup it is 94 ms (benchmarks/v6_probe.py) — the dominant frame
cost.  v6 sorts each prim ONCE by its ANCHOR (top-left covered tile)
with its spill class and z-bucket in the key:

    key = ((anchor * 4 + cls) << ZQ) | qz        (int32)
    cls in (0=none, 1=x-spill, 2=both, 3=y-spill)   [span=2 ordinals]

The ordinals put every neighbor's spill subset CONTIGUOUS, so a tile
t's entries are FOUR contiguous ranges of the prim-sorted order
(B = searchsorted boundaries at every (anchor, cls)):

    r0: B[4t]          .. B[4t + 4]         every prim anchored at t
    r1: B[4(t-1) + 1]  .. B[4(t-1) + 3]     left neighbors, x-spill
    r2: B[4(t-tx) + 2] .. B[4(t-tx) + 4]    up neighbors, y-spill
    r3: B[4(t-tx-1)+2] .. B[4(t-tx-1) + 3]  diag neighbors, both

(with the early exit ON the kernel instead walks the NINE single-class
segments those ranges merge — see the exit note below; ``span=4``
generalizes the decomposition to 4x4-tile prims for long-segment
soups, big-list relief on trail fade frames).

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

The in-kernel depth early-exit is per SEGMENT: the exit bound needs
the streamed order to ascend in z-bucket, and the bucket resets at
every (anchor, class) boundary — so with the exit on, each range is a
single-class segment (nine per tile at span=2) and the jump target is
the next segment's first chunk.  Exiting inside a MERGED range would
unsoundly skip closer prims of its later classes (regression-tested:
test_csr_v6.test_exit_does_not_skip_cross_class_prims).

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
    _build_table16_rows,
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
# cap_rows10: tri-less exit-less capsule rows, 12 per 128-lane row
# (lanes 120-127 pad).  The 10 floats are exactly the capsule eval's
# operands: [x0, y0, z0, r0, sdx, sdy, sdz, sdr, il2, idf] — no zlb
# (exit off), no tri plane (triangles ride the big list).
ROW_F_CAP = 10
PACK_CAP = 128 // ROW_F_CAP  # 12 (the division floors; 8 slop lanes)
# rows9: kind-split 9-float rows, 14 per 128-lane row (2 slop lanes).
# The rows8 dual encoding with idf IN-ROW at a static lane — fixes the
# measured +3.5 ns/slot scalar cost of rows8's interleaved idf lanes
# (dynamic-lane reads) while keeping the renormalized capsule eval:
#   DISC    [px, py, z, r^2, idf, 0, 0, 0, 0]
#   CAPSULE [x0, y0, ux, -rho0, uy, rhod, z0, sdz, idf]
ROW_F_CAP9 = 9
PACK_CAP9 = 128 // ROW_F_CAP9  # 14
ZQ = 8  # z-bucket bits in the int32 key (256 buckets)
DEFAULT_CHUNK_ROWS = 256


def _key_layout(num_tiles, span, with_z, kind_split=False):
    """(dtype, shift) of the v6 sort key — shared by _bin_csr6 and the
    range-starts bounds so they can never disagree.  with_z packs the
    exit's z-bucket into the low ZQ bits (int32); exit-off walks need
    no z, and the bare (anchor, class) ordinal fits int16 at 1080p
    grids (<= 32642 values) — i16-key unstable sorts run ~1.5x the i32
    rate (KERNEL_NOTES: v3's measured int16-key lever).  kind_split
    (rows8) doubles the ordinal space: all discs sort before all
    capsules so each region walks its own kind-specialized row body."""
    if with_z:
        return np.int32, ZQ
    k2 = span * span
    factor = 2 if kind_split else 1
    fits16 = factor * num_tiles * k2 + 2 <= np.iinfo(np.int16).max
    return (np.int16 if fits16 else np.int32), 0


def _bin_csr6(prims, tile_h, tile_w, num_tiles, tiles_x, tiles_y,
              max_big=DEFAULT_MAX_BIG, bin_triangles=False,
              discs_only=False, span=2, with_z=True, kind_split=False,
              carry=()):
    """Per-prim (anchor, class, z-bucket) int32 keys + UNSTABLE sort.

    ``span``: prims whose bbox covers <= span x span tiles are binned
    (span*span classes; span=2 uses the reordered ordinals below,
    span=4 row-major (spany)*span + spanx); wider prims ride the big
    list.  span=2 is the default (4 merged ranges/tile); span=4 serves
    long-segment soups (fade-frame trails) whose segments would
    otherwise flood the big list.

    Returns (sorted_keys, sorted_prims, big_ids, big_count, zmeta) —
    big_ids (max_big,) holds prim ids (P for empty slots), sliced from
    the sorted tail (NO scatter);
    zmeta = f32 [zmin, s, thr_scale] over the binned prims' zlb exactly
    as pallas_csr4._bin_csr4 (the kernel's exit math is shared).

    ``with_z=False`` (exit-off walks): keys drop the z-bucket bits and
    the whole O(P) zlb pass — bare (anchor, class) ordinals in the
    _key_layout dtype (int16 when the grid fits), zmeta zeros.  Winners
    are unaffected: z-buckets only order entries WITHIN a range, the
    per-pair (depth, id) tie-break makes every walk order-independent.
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
    fits = (tx1 - tx0 < span) & (ty1 - ty0 < span) & binnable
    is_small = prims.valid & fits
    is_big = prims.valid & ~fits

    prim_id = np.arange(p, dtype=np.int32)
    sx = tx1 - tx0
    sy = ty1 - ty0
    if span == 2:
        # Class ordinals (0 = none, 1 = x-spill, 2 = both, 3 = y-spill)
        # chosen so every neighbor's class subset is CONTIGUOUS in the
        # sorted order: left needs {x-spill} = ordinals {1, 2}, up needs
        # {y-spill} = {2, 3}, diag = {2} — the kernel then walks FOUR
        # merged ranges per tile instead of five (one fewer tiny-chunk
        # DMA), or NINE single-class segments when the early exit is on
        # (each ascends in z-bucket, which the exit requires).
        cls = sx + 3 * sy - 2 * (sx * sy)
    else:
        cls = sy * span + sx
    anchor = ty0 * tiles_x + tx0
    # Sentinel keys: big (valid, non-binnable) prims sort into a
    # DEDICATED region just past the binned keys, invalids after them —
    # the sorted tail IS the big list (one dynamic slice), replacing
    # the big-list scatter (a 9M-index scatter costs ~15-20 ms at trail
    # scale; "every scatter is a sort in disguise", KERNEL_NOTES r3).
    # Big order is arbitrary (unstable sort) — exact under the per-pair
    # (depth, id) tie-break.
    if kind_split and (with_z or discs_only or bin_triangles):
        raise ValueError("kind_split serves the exit-off rows8 mixed "
                         "soup (discs + capsules) only")
    factor = 2 if kind_split else 1
    kdtype, shift = _key_layout(num_tiles, span, with_z, kind_split)
    sent_big = kdtype((factor * num_tiles * span * span) << shift)
    sent_invalid = kdtype(sent_big + (1 << shift))

    if with_z:
        nb = np.float32(1 << ZQ)
        zlb = _z_lower_bound(prims, with_triangles=bin_triangles)
        zmin = jnp.min(jnp.where(is_small, zlb, INF))
        zmax = jnp.max(jnp.where(is_small, zlb, -INF))
        rngz = zmax - zmin
        s = jnp.where(rngz > 0, nb / rngz, 0.0)
        qz = jnp.clip(jnp.floor((zlb - zmin) * s),
                      0.0, nb - 1).astype(jnp.int32)
        thr_scale = jnp.where(s > 0, np.float32(1.0 - 1e-6) / s, 0.0)
        zmeta = jnp.stack([jnp.where(jnp.isfinite(zmin), zmin, 0.0),
                           s, thr_scale])
        base = ((anchor * (span * span) + cls) << ZQ) | qz
    else:
        zmeta = jnp.zeros((3,), jnp.float32)
        base = anchor * (span * span) + cls
    if kind_split:
        # Capsules into the upper ordinal region: the per-tile walk then
        # streams its disc ranges and its capsule ranges separately.
        base = base + jnp.where(prims.kind == KIND_CAPSULE,
                                num_tiles * span * span, 0)

    key = jnp.where(is_small, base.astype(kdtype),
                    jnp.where(is_big, sent_big, sent_invalid))
    # ``carry``: extra per-prim columns permuted THROUGH the sort (the
    # rows8 sort-carried row build) — v6_probe measured the widened
    # sort against the post-sort gather it replaces.
    out = jax.lax.sort((key, jnp.asarray(prim_id)) + tuple(carry),
                       num_keys=1, is_stable=False)
    sorted_keys, sorted_prims = out[0], out[1]
    sorted_carry = out[2:]

    n_small = jnp.searchsorted(sorted_keys, sent_big).astype(jnp.int32)
    n_nonval = jnp.searchsorted(sorted_keys, sent_invalid).astype(jnp.int32)
    big_count = n_nonval - n_small
    # Slice the big segment out of the sorted order; pad first so the
    # slice never clamps (tiny scenes can have P < n_small + max_big).
    # Empty slots -> id P (the zero pad row).
    tail = jnp.pad(sorted_prims, (0, max_big), constant_values=p)
    big_ids = jax.lax.dynamic_slice(tail, (n_small,), (max_big,))
    big_ids = jnp.where(
        jnp.arange(max_big, dtype=jnp.int32)
        < jnp.minimum(big_count, max_big), big_ids, p)
    if carry:
        return (sorted_keys, sorted_prims, big_ids, big_count, zmeta,
                n_small, sorted_carry)
    return sorted_keys, sorted_prims, big_ids, big_count, zmeta, n_small


def bin_diagnostics6(prims, width: int, height: int, tile_h: int = 32,
                     tile_w: int = 32, max_big: int = DEFAULT_MAX_BIG,
                     bin_triangles: bool = False, span: int = 2,
                     discs_only: bool = False, return_binned: bool = False):
    """Big-list overflow count under the v6 binning (0 = exact).

    ``discs_only``/``bin_triangles``/``span`` must MIRROR the render
    config being certified — discs_only forces every capsule onto the
    big list, so probing without it under-counts and can certify a
    truncating run as exact.

    ``return_binned=True`` additionally returns the BINNED prim count
    (the sorted order's valid prefix length) — the probe input for
    sizing ``row_budget`` on soups with large invalid tails (adaptive
    trails)."""
    tiles_y = -(-height // tile_h)
    tiles_x = -(-width // tile_w)
    num_tiles = tiles_y * tiles_x
    _, _, big_list, big_count, _, n_small = _bin_csr6(
        prims, tile_h, tile_w, num_tiles, tiles_x, tiles_y,
        max_big=max_big, bin_triangles=bin_triangles, span=span,
        discs_only=discs_only)
    ovf = jnp.maximum(big_count - big_list.shape[0], 0)
    return (ovf, n_small) if return_binned else ovf


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


def _make_row_body10(scr, slot, nchains, qx, qy):
    """fori_loop body over one 10-float CAPSULE-row scratch slab:
    [x0, y0, z0, r0, sdx, sdy, sdz, sdr, il2, idf] x 12 per 128-lane
    row (lanes 120-127 are zero pad).  The narrow cap_rows10 mode:
    identical f32 expression order to _make_row_body16's capsule
    branch, so winners are bit-identical — usable exactly when the
    binned stream is tri-less (triangles ride the big list) and the
    depth exit is off (no zlb lane).  A zero row is inert: rad = 0 and
    every tile pixel has qx, qy >= 0.5, so cov is false everywhere —
    the same stranger/pad argument as the 8/16-float bodies."""

    def row_body(br, c2):
        out = list(c2)
        for u in range(PACK_CAP):
            lane = u * ROW_F_CAP
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
            better = cov & ((z < d0) | ((z == d0) & (idf < di)))
            out[2 * ch] = jnp.where(better, z, d0)
            out[2 * ch + 1] = jnp.where(better, idf, di)
        return tuple(out)

    return row_body


def _row8_addr(m, br):
    """Scratch addressing of the rows8 interleaved layout: 9 scratch
    rows per 128 entries — 8 packed 16-entry rows followed by 1 idf
    row (idf = the sort payload as f32, NO gather: it is already
    contiguous in sorted order).  ``m`` is the walk start's packed-row
    offset within its group ((g0 // 16) % 8), ``br`` the fori packed-row
    counter; returns (row-slab row, idf row, idf lane base)."""
    j = m + br
    g8 = j // 8
    j8 = jax.lax.rem(j, 8)
    return g8 * 9 + j8, g8 * 9 + 8, j8 * 16


def _make_row_body8d(scr, slot, nchains, qx, qy, m):
    """rows8 DISC body: same eval/reads as _make_row_body8 (idf rides
    in-row lane 4), remapped through the interleaved layout.  Capsule
    strangers at the region boundary are inert BY ENCODING: their lane 3
    holds -rho0 < 0 (never a valid r^2), so cov is false everywhere;
    NaN (invalid/pad) rows fail every compare."""

    def row_body(br, c2):
        out = list(c2)
        sr, _, _ = _row8_addr(m, br)
        for u in range(PACK_DISC):
            lane = u * ROW_F_DISC
            px = scr[slot, sr, lane]
            py = scr[slot, sr, lane + 1]
            z = scr[slot, sr, lane + 2]
            r2 = scr[slot, sr, lane + 3]
            idf = scr[slot, sr, lane + 4]
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


def _make_row_body8c(scr, slot, nchains, qx, qy, m):
    """rows8 CAPSULE body: the renormalized segment-frame eval on
    8-float rows [x0, y0, ux, -rho0, uy, rhod, z0, sdz] with
    ux = sdx*il2, uy = sdy*il2, rho = r*sqrt(il2) — the point-to-segment
    test divided through by the axis length, so the row fits ONE 32 B
    gather granule (v6_probe r5: 40 B and 64 B rows gather at the same
    ~11 ns/row; 32 B at ~6.6).  idf comes from the interleaved sort-
    payload lanes.  Same geometry as _make_row_body10, different f32
    rounding — a certified-fidelity mode, NOT bit-compatible with cap10
    (see rasterize_reference capsule_eval='cap8' for the oracle twin).

    Inertness (cov false everywhere) holds for: NaN rows (compares
    fail); DISC strangers (lane 5 = 0 so rad = t*0 - r^2 <= -0, and the
    coverage test requires STRICTLY rad > 0 — also why a valid capsule
    must project with r0 > 0, which screen projection guarantees for
    positive world radii)."""

    def row_body(br, c2):
        out = list(c2)
        sr, ir, lb = _row8_addr(m, br)
        for u in range(PACK_DISC):
            lane = u * ROW_F_DISC
            x0 = scr[slot, sr, lane]
            y0 = scr[slot, sr, lane + 1]
            ux = scr[slot, sr, lane + 2]
            nr0 = scr[slot, sr, lane + 3]
            uy = scr[slot, sr, lane + 4]
            rhod = scr[slot, sr, lane + 5]
            z0 = scr[slot, sr, lane + 6]
            sdz = scr[slot, sr, lane + 7]
            idf = scr[slot, ir, lb + u]
            ch = u % nchains
            d0, di = out[2 * ch], out[2 * ch + 1]
            dx = qx - x0
            dy = qy - y0
            a = dx * ux + dy * uy
            g = dy * ux - dx * uy
            t = jnp.clip(a, 0.0, 1.0)
            am = a - t
            d2 = am * am + g * g
            rad = rhod * t - nr0
            z = z0 + sdz * t
            cov = (d2 <= rad * rad) & (rad > 0)
            better = cov & ((z < d0) | ((z == d0) & (idf < di)))
            out[2 * ch] = jnp.where(better, z, d0)
            out[2 * ch + 1] = jnp.where(better, idf, di)
        return tuple(out)

    return row_body


def _make_row_body9d(scr, slot, nchains, qx, qy):
    """rows9 DISC body: the exact disc eval over 9-float rows with ALL
    STATIC lane offsets (lane = u*9 + field) — no interleave, no
    dynamic reads.  Cross-kind strangers inert by the same encoding
    argument as rows8 (lane 3 = -rho0 < 0 fails the r^2 test); NaN
    rows fail every compare."""

    def row_body(br, c2):
        out = list(c2)
        for u in range(PACK_CAP9):
            lane = u * ROW_F_CAP9
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


def _make_row_body9c(scr, slot, nchains, qx, qy):
    """rows9 CAPSULE body: the renormalized segment-frame eval of
    _make_row_body8c with idf IN-ROW (static lane 8) — the f32
    expressions are IDENTICAL to rows8's, so the cap8 oracle and the
    '<segments>+rows8' fidelity records cover this mode unchanged.
    Inertness: NaN rows and the strict rad > 0 against disc strangers
    (their lane 5 = 0 makes rad = -r^2 <= -0)."""

    def row_body(br, c2):
        out = list(c2)
        for u in range(PACK_CAP9):
            lane = u * ROW_F_CAP9
            x0 = scr[slot, br, lane]
            y0 = scr[slot, br, lane + 1]
            ux = scr[slot, br, lane + 2]
            nr0 = scr[slot, br, lane + 3]
            uy = scr[slot, br, lane + 4]
            rhod = scr[slot, br, lane + 5]
            z0 = scr[slot, br, lane + 6]
            sdz = scr[slot, br, lane + 7]
            idf = scr[slot, br, lane + 8]
            ch = u % nchains
            d0, di = out[2 * ch], out[2 * ch + 1]
            dx = qx - x0
            dy = qy - y0
            a = dx * ux + dy * uy
            g = dy * ux - dx * uy
            t = jnp.clip(a, 0.0, 1.0)
            am = a - t
            d2 = am * am + g * g
            rad = rhod * t - nr0
            z = z0 + sdz * t
            cov = (d2 <= rad * rad) & (rad > 0)
            better = cov & ((z < d0) | ((z == d0) & (idf < di)))
            out[2 * ch] = jnp.where(better, z, d0)
            out[2 * ch + 1] = jnp.where(better, idf, di)
        return tuple(out)

    return row_body


def _make_row_body8_uv(scr, slot, nchains, qx, qy):
    """``_make_row_body8`` with the winner's lambert plane coordinates
    carried through the merge.  Rows [px, py, z, r^2, idf, inv_r, 0, 0]
    (lane 5 = _preshade's disc flag); carry per chain = (depth, idf,
    u, v) with u = (qx - px) * inv_r and v = -(qy - py) * inv_r — the
    EXACT expressions _shade_by_id evaluates after its per-pixel
    gather, so the fused epilogue needs NO gather at all for two-tone
    scenes.  Big-list winners keep the chain-init u = +inf (the 'not a
    binned disc' marker the epilogue tests with isfinite)."""

    def row_body(br, c4):
        out = list(c4)
        for k in range(PACK_DISC):
            lane = k * ROW_F_DISC
            px = scr[slot, br, lane]
            py = scr[slot, br, lane + 1]
            z = scr[slot, br, lane + 2]
            r2 = scr[slot, br, lane + 3]
            idf = scr[slot, br, lane + 4]
            invr = scr[slot, br, lane + 5]
            ch = k % nchains
            d0, di, u0, v0 = out[4 * ch], out[4 * ch + 1], \
                out[4 * ch + 2], out[4 * ch + 3]
            dx = qx - px
            dy = qy - py
            cov = dx * dx + dy * dy <= r2
            better = cov & ((z < d0) | ((z == d0) & (idf < di)))
            out[4 * ch] = jnp.where(better, z, d0)
            out[4 * ch + 1] = jnp.where(better, idf, di)
            out[4 * ch + 2] = jnp.where(better, dx * invr, u0)
            out[4 * ch + 3] = jnp.where(better, -dy * invr, v0)
        return tuple(out)

    return row_body


def _make_big_body16_uv(scr, nchains, qx, qy):
    """Resident-big row body for the fused (u, v) path: the EXACT
    16-float tri-aware eval of pallas_csr4._make_row_body16, with the
    winner's lambert coordinates carried at stride 4.  Big-list WIDE
    DISCS (kind flag 0, _preshade flag > 0 at lane 13) get real (u, v)
    — the gather path lights them as lambert discs, so the fused path
    must too; triangles/capsules (preshaded) carry u = +inf."""

    def row_body(br, c4):
        out = list(c4)
        for k in range(PACK):
            lane = k * ROW_F
            x0 = scr[0, br, lane]
            y0 = scr[0, br, lane + 1]
            z0 = scr[0, br, lane + 2]
            r0 = scr[0, br, lane + 3]
            sdx = scr[0, br, lane + 4]
            sdy = scr[0, br, lane + 5]
            sdz = scr[0, br, lane + 6]
            sdr = scr[0, br, lane + 7]
            il2 = scr[0, br, lane + 8]
            idf = scr[0, br, lane + 9]
            flag = scr[0, br, lane + 13]
            t9 = scr[0, br, lane + 10]
            t10 = scr[0, br, lane + 11]
            t11 = scr[0, br, lane + 12]
            kf = scr[0, br, lane + 15]
            ch = k % nchains
            d0, di, u0, v0 = out[4 * ch], out[4 * ch + 1], \
                out[4 * ch + 2], out[4 * ch + 3]
            dx = qx - x0
            dy = qy - y0
            t = jnp.clip((dx * sdx + dy * sdy) * il2, 0.0, 1.0)
            cx = dx - t * sdx
            cy = dy - t * sdy
            rad = r0 + sdr * t
            z = z0 + sdz * t
            cov = cx * cx + cy * cy <= rad * rad
            e0 = x0 * qy - y0 * qx + z0
            e1 = r0 * qy - sdx * qx + sdy
            e2 = sdz * qy - sdr * qx + il2
            iz = e0 * t9 + e1 * t10 + e2 * t11
            cov_t = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & (iz > 0)
            z_t = 1.0 / jnp.where(iz > 0, iz, 1.0)
            is_tri = kf > 0
            z = jnp.where(is_tri, z_t, z)
            cov = (is_tri & cov_t) | (~is_tri & cov)
            better = cov & ((z < d0) | ((z == d0) & (idf < di)))
            is_disc = jnp.logical_not(is_tri) & (flag > 0)
            uc = jnp.where(is_disc, dx * flag, INF)
            vc = jnp.where(is_disc, -dy * flag, INF)
            out[4 * ch] = jnp.where(better, z, d0)
            out[4 * ch + 1] = jnp.where(better, idf, di)
            out[4 * ch + 2] = jnp.where(better, uc, u0)
            out[4 * ch + 3] = jnp.where(better, vc, v0)
        return tuple(out)

    return row_body


def _make_kernel6(tiles_x, tile_h, tile_w, unroll, n_chunk_block,
                  chunk_rows, allow_exit, num_tiles, with_triangles=False,
                  big_chunk=DEFAULT_BIG_CHUNK, row_f=ROW_F, span=2,
                  dma_slots=2, big_resident=False, fused_uv=False,
                  tiles_per_program=1, rows8=False, rows9=False):
    k2 = span * span
    pack = 128 // row_f
    assert chunk_rows % pack == 0
    assert big_chunk % PACK == 0
    assert not (fused_uv and allow_exit)
    assert not (allow_exit and row_f == ROW_F_CAP)  # no zlb lane
    assert tiles_per_program == 1 or not allow_exit
    assert not (rows8 and (allow_exit or fused_uv or row_f != ROW_F_DISC))
    assert not (rows9 and (allow_exit or fused_uv or row_f != ROW_F_CAP9))
    n_bounds = (2 if (rows8 or rows9) else 1) * k2 * num_tiles

    def kernel(starts_ref,  # scalar prefetch: (k2*T+2,) i32; [-1] = big n
               rows_hbm,  # (P_pad/8, 128) f32 in ANY/HBM, anchor-sorted
               big_hbm,  # (BIG_pad/8, 128) f32: ANY/HBM, or SMEM block
               zmeta_ref,  # SMEM (1, 3) f32: zmin, s, thr_scale
               *refs):  # outs (2 or 4 VMEM (G,8,128)), then scratch
        if fused_uv:
            depth_out, idf_out, u_out, v_out = refs[:4]
            rest = refs[4:]
        else:
            depth_out, idf_out = refs[:2]
            rest = refs[2:]
        scratch, sems = rest[0], rest[1]
        big_scratch = rest[2] if not big_resident else None
        big_sems = rest[3] if not big_resident else None
        pid = pl.program_id(0)
        big_n = starts_ref[n_bounds + 1]

        # Grid fusion: one program renders ``tiles_per_program``
        # consecutive tiles (Python-unrolled below), amortizing the
        # per-grid-step Mosaic prologue/epilogue and output-block swap;
        # the DMA ring and the cross-tile chunk-0 prefetch flow across
        # the in-program tiles exactly as they do across grid steps
        # (scratch and semaphores persist either way).
        run_tile = _make_tile_body(
            tiles_x, tile_h, tile_w, unroll, n_chunk_block, chunk_rows,
            allow_exit, num_tiles, with_triangles, big_chunk, row_f,
            span, dma_slots, big_resident, fused_uv, tiles_per_program,
            rows8=rows8, rows9=rows9)

        for g in range(tiles_per_program):
            if num_tiles % tiles_per_program == 0:
                run_tile(g, pid, big_n, starts_ref, rows_hbm, big_hbm,
                         zmeta_ref, depth_out, idf_out,
                         u_out if fused_uv else None,
                         v_out if fused_uv else None,
                         scratch, sems, big_scratch, big_sems)
            else:
                # Padded grid tail: skip tiles past the image. Their
                # output rows stay unwritten (sliced away at assemble),
                # and skipping keeps the prefetch/semaphore chain
                # consistent (the last real tile's tail prefetch is
                # already predicated off at the image edge).
                @pl.when(pid * tiles_per_program + g < num_tiles)
                def _(g=g):
                    run_tile(g, pid, big_n, starts_ref, rows_hbm,
                             big_hbm, zmeta_ref, depth_out, idf_out,
                             u_out if fused_uv else None,
                             v_out if fused_uv else None,
                             scratch, sems, big_scratch, big_sems)

    return kernel


def _make_tile_body(tiles_x, tile_h, tile_w, unroll, n_chunk_block,
                    chunk_rows, allow_exit, num_tiles, with_triangles,
                    big_chunk, row_f, span, dma_slots, big_resident,
                    fused_uv, tiles_per_program, rows8=False,
                    rows9=False):
    """The per-tile walk of the v6 kernel (see _make_kernel6): bin
    ranges -> flat chunk schedule -> DMA ring -> row eval -> out[g].

    ``rows8``: kind-split interleaved 8-float rows — the schedule walks
    the tile's DISC ranges first, then its CAPSULE ranges (the kind-
    split sort regions), each through its own row body; the DMA ring is
    kind-agnostic (same rows array, same chunk shape), so prefetching
    flows across the kind boundary untouched."""
    k2 = span * span
    pack = 128 // row_f
    zlb_lane = 14 if row_f == ROW_F else 2  # disc rows: zlb == z
    assert not ((rows8 or rows9) and allow_exit)
    kind_walk = rows8 or rows9  # disc ranges then capsule ranges

    def run_tile(g, pid, big_n, starts_ref, rows_hbm, big_hbm, zmeta_ref,
                 depth_out, idf_out, u_out, v_out, scratch, sems,
                 big_scratch, big_sems):
        tile = pid * tiles_per_program + g
        ty = tile // tiles_x
        tx = tile % tiles_x
        # VREG (8, 128) -> (tile_h, tile_w) pixel block (pallas_csr3).
        ix = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        iy = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        qx = (tx * tile_w + ix % tile_w).astype(jnp.float32) + 0.5
        qy = (ty * tile_h + iy + 8 * (ix // tile_w)).astype(
            jnp.float32) + 0.5

        # --- the contiguous ranges (starts, counts), guarded at grid
        # edges.  Tile t owns every prim anchored at itself (all
        # classes, one range) plus each neighbor's spill-class subset.
        # span=2 uses the reordered ordinals (0=none, 1=x, 2=both,
        # 3=y, _bin_csr6) so those subsets are contiguous: FOUR merged
        # ranges — or, when the early exit is on, NINE single-class
        # segments, because the exit bound needs each streamed range to
        # ascend in z-bucket and the bucket resets at class boundaries
        # (a merged range is NOT globally ascending; exiting inside its
        # first class would unsoundly skip closer prims of the later
        # classes).  span=4 (exit unsupported) walks the row-major
        # class grid: the subset {spanx > dx, spany > dy} of anchor
        # t - dy*tiles_x - dx is contiguous per spany row. --
        def schedule_for(t, tx_, ty_):
            """Ranges + flat chunk schedule of tile t -> (locate, total).

            The flat schedule maps chunk ci to (range r, offset j) via
            the cumulative chunk counts, so the DMA pipeline spans
            range boundaries without a per-range restart stall.
            Parameterized by t so a tile can also compute its RIGHT
            neighbor's first chunk (cross-tile prefetch below)."""
            def rng(anchor, c_lo, c_hi, ok, reg=0):
                a = jnp.maximum(anchor, 0)
                s = starts_ref[reg + k2 * a + c_lo]
                n = starts_ref[reg + k2 * a + c_hi] - s
                return s, jnp.where(ok, n, 0)

            def kind_ranges(reg):
                if span == 2:
                    left = tx_ >= 1
                    up = ty_ >= 1
                    both = left & up
                    if allow_exit:
                        rs = [rng(t, c, c + 1, True, reg)
                              for c in range(4)]
                        rs += [
                            rng(t - 1, 1, 2, left, reg),
                            rng(t - 1, 2, 3, left, reg),
                            rng(t - tiles_x, 2, 3, up, reg),
                            rng(t - tiles_x, 3, 4, up, reg),
                            rng(t - tiles_x - 1, 2, 3, both, reg),
                        ]
                    else:
                        rs = [
                            rng(t, 0, 4, True, reg),
                            rng(t - 1, 1, 3, left, reg),
                            rng(t - tiles_x, 2, 4, up, reg),
                            rng(t - tiles_x - 1, 2, 3, both, reg),
                        ]
                else:
                    rs = [rng(t, 0, k2, True, reg)]
                    for dy in range(span):
                        for dx in range(span):
                            if dx == 0 and dy == 0:
                                continue
                            a = t - dy * tiles_x - dx
                            ok = (tx_ >= dx) & (ty_ >= dy)
                            if dx == 0:
                                rs.append(rng(a, dy * span, k2, ok, reg))
                            else:
                                for cy in range(dy, span):
                                    rs.append(rng(a, cy * span + dx,
                                                  cy * span + span, ok,
                                                  reg))
                return rs

            if kind_walk:
                disc_ranges = kind_ranges(0)
                ranges = disc_ranges + kind_ranges(k2 * num_tiles)
                n_disc_ranges = len(disc_ranges)
            else:
                ranges = kind_ranges(0)
                n_disc_ranges = len(ranges)

            ncs = [pl.cdiv(n, chunk_rows) for _, n in ranges]
            cums = []
            acc = jnp.int32(0)
            for nc in ncs:
                acc = acc + nc
                cums.append(acc)
            total_chunks = cums[-1]
            disc_chunks = cums[n_disc_ranges - 1]

            def locate(ci):
                """ci -> (g0 entry offset, mc live entries, next_cum)."""
                g0 = ranges[0][0] + ci * chunk_rows
                mc = ranges[0][1] - ci * chunk_rows
                nxt = cums[0]
                for r in range(1, len(ranges)):
                    inr = ci >= cums[r - 1]
                    j = ci - cums[r - 1]
                    g0 = jnp.where(inr, ranges[r][0] + j * chunk_rows, g0)
                    mc = jnp.where(inr, ranges[r][1] - j * chunk_rows, mc)
                    nxt = jnp.where(inr, cums[r], nxt)
                return g0, jnp.minimum(mc, chunk_rows), nxt

            return locate, total_chunks, disc_chunks

        locate, total_chunks, disc_chunks = schedule_for(tile, tx, ty)

        def rows_base(g0):
            # rows8: the interleaved array is addressed in 9-row GROUPS
            # of 128 entries (8 packed rows + the idf row); a chunk's
            # DMA starts at its walk start's group.
            if rows8:
                return ((g0 // pack) // 8) * 9
            return g0 // pack

        def start_dma(slot, g0):
            pltpu.make_async_copy(
                rows_hbm.at[pl.ds(rows_base(g0), n_chunk_block), :],
                scratch.at[slot],
                sems.at[slot],
            ).start()

        def get_dma(slot, ci):
            g0, _, _ = locate(ci)
            return pltpu.make_async_copy(
                rows_hbm.at[pl.ds(rows_base(g0), n_chunk_block), :],
                scratch.at[slot],
                sems.at[slot],
            )

        n_slots = 2 if allow_exit else dma_slots
        if allow_exit:
            @pl.when(total_chunks > 0)
            def _():
                get_dma(0, 0).start()
        else:
            # Chunk 0 of every tile > 0 was prefetched by the PREVIOUS
            # grid step (cross-tile prefetch at the kernel tail):
            # scratch and semaphores persist across steps, so the first
            # chunk's HBM latency overlaps the neighbor's epilogue
            # instead of stalling this tile's start (one exposed DMA
            # round-trip per tile otherwise — 2040 at 1080p).
            @pl.when((tile == 0) & (total_chunks > 0))
            def _():
                get_dma(0, 0).start()

            for j in range(1, n_slots - 1):
                @pl.when(j < total_chunks)
                def _(j=j):
                    get_dma(j, j).start()

        inf = jnp.full((8, 128), INF, jnp.float32)
        emp = jnp.full((8, 128), F_EMPTY, jnp.float32)
        n_big_rows = (big_n + PACK - 1) // PACK
        if big_resident and fused_uv:
            # Resident big list with the fused (u, v) carry: big WIDE
            # DISCS get real lambert coordinates (the gather path
            # lights them; the fused path must match), preshaded
            # tris/capsules carry the +inf marker.
            big8 = jax.lax.fori_loop(
                0, n_big_rows, _make_big_body16_uv(big_hbm, 2, qx, qy),
                (inf, emp, inf, inf, inf, emp, inf, inf))
            bbetter = (big8[4] < big8[0]) | ((big8[4] == big8[0])
                                             & (big8[5] < big8[1]))
            bg = tuple(jnp.where(bbetter, big8[4 + j], big8[j])
                       for j in range(4))
        elif big_resident:
            # One-chunk big list rides an SMEM block with a CONSTANT
            # index map: Mosaic fetches it once for the whole grid, so
            # the per-tile DMA start/wait round-trip of the streamed
            # path (2040 of them at 1080p — measurable when the big
            # list is just the ground) disappears.  Same 16-float
            # tri-aware eval; pad rows are zero (inert).
            body = _make_row_body16(big_hbm, 0, 2, True, qx, qy)
            big4 = jax.lax.fori_loop(0, n_big_rows, body,
                                     (inf, emp, inf, emp))
            bbetter = (big4[2] < big4[0]) | ((big4[2] == big4[0])
                                             & (big4[3] < big4[1]))
            bg = (jnp.where(bbetter, big4[2], big4[0]),
                  jnp.where(bbetter, big4[3], big4[1]))
        else:
            bg = _stream_big(big_hbm, big_scratch, big_sems,
                             big_n, big_chunk, qx, qy)

        if fused_uv:
            # Chain carry (depth, idf, u, v).
            accs = list(bg)
            for _ in range(unroll - 1):
                accs += [inf, emp, inf, inf]
        else:
            accs = list(bg)
            for _ in range(unroll - 1):
                accs += [inf, emp]
        init = tuple(accs)

        def make_body_fn(slot, g0=None, cap=False):
            if rows9:
                if cap:
                    return _make_row_body9c(scratch, slot, unroll, qx, qy)
                return _make_row_body9d(scratch, slot, unroll, qx, qy)
            if rows8:
                m = jax.lax.rem(g0 // pack, 8)
                if cap:
                    return _make_row_body8c(scratch, slot, unroll,
                                            qx, qy, m)
                return _make_row_body8d(scratch, slot, unroll, qx, qy, m)
            if fused_uv:
                return _make_row_body8_uv(scratch, slot, unroll, qx, qy)
            if row_f == ROW_F:
                return _make_row_body16(scratch, slot, unroll,
                                        with_triangles, qx, qy)
            if row_f == ROW_F_CAP:
                return _make_row_body10(scratch, slot, unroll, qx, qy)
            return _make_row_body8(scratch, slot, unroll, qx, qy)

        if not allow_exit:
            # Straight-line schedule: fori over the flat chunk list with
            # an n-slot DMA ring (slot = ci % n; chunks ci..ci+n-1 in
            # flight) — no jump bookkeeping, and the static trip
            # structure lets Mosaic pipeline the chunk loop.
            def chunk_body_for(cap):
                def chunk_body(ci, accs_in):
                    slot = jax.lax.rem(ci, n_slots)

                    @pl.when(ci + n_slots - 1 < total_chunks)
                    def _():
                        get_dma(jax.lax.rem(ci + n_slots - 1, n_slots),
                                ci + n_slots - 1).start()

                    get_dma(slot, ci).wait()
                    g0, mc, _ = locate(ci)
                    o0 = jax.lax.rem(g0, pack)
                    n_rows = (o0 + mc + (pack - 1)) // pack
                    return jax.lax.fori_loop(
                        0, n_rows, make_body_fn(slot, g0, cap), accs_in)
                return chunk_body

            if kind_walk:
                # Two-phase walk over ONE flat schedule: chunks
                # [0, disc_chunks) are disc ranges, the rest capsule
                # ranges.  The ring prefetch inside each body is
                # kind-agnostic, so the boundary costs nothing.
                out = jax.lax.fori_loop(0, disc_chunks,
                                        chunk_body_for(False), init)
                out = jax.lax.fori_loop(disc_chunks, total_chunks,
                                        chunk_body_for(True), out)
            else:
                out = jax.lax.fori_loop(0, total_chunks,
                                        chunk_body_for(False), init)
        else:
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
                accs_out = jax.lax.fori_loop(0, n_rows,
                                             make_body_fn(slot), accs_in)

                # Each range is a SINGLE (anchor, class) segment (see
                # the range construction above), so it ascends in
                # zlb-bucket; once the last streamed bucket's floor
                # (one bucket + 1e-6 margin back, STRICT >) beats the
                # tile's worst winning depth, the REST OF THIS RANGE
                # cannot win — jump to the next range's first chunk.
                # The bucket is read at the chunk's LAST REAL entry
                # (o0 + mc - 1), never a PACK-slop slot, keeping the
                # bound's soundness local to this ascending segment
                # (pallas_csr4 has the same guard).
                dmin = accs_out[0]
                for u in range(1, unroll):
                    dmin = jnp.minimum(dmin, accs_out[2 * u])
                dmax = jnp.max(dmin)
                e = o0 + mc - 1
                last_zlb = scratch[slot, e // pack,
                                   jax.lax.rem(e, pack) * row_f + zlb_lane]
                qz = jnp.maximum(
                    jnp.floor((last_zlb - zmin) * zs) - 1.0, 0.0)
                done = zmin + qz * thr_scale > dmax
                ci_next = jnp.where(done, nxt, ci + 1)

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

        if fused_uv:
            depth, idf, uu, vv = out[0], out[1], out[2], out[3]
            for c in range(1, unroll):
                dc, ic, uc, vc = out[4 * c:4 * c + 4]
                better = (dc < depth) | ((dc == depth) & (ic < idf))
                depth = jnp.where(better, dc, depth)
                idf = jnp.where(better, ic, idf)
                uu = jnp.where(better, uc, uu)
                vv = jnp.where(better, vc, vv)
            u_out[g, :, :] = uu
            v_out[g, :, :] = vv
        else:
            depth, idf = out[0], out[1]
            for u in range(1, unroll):
                du, iu = out[2 * u], out[2 * u + 1]
                better = (du < depth) | ((du == depth) & (iu < idf))
                depth = jnp.where(better, du, depth)
                idf = jnp.where(better, iu, idf)

        depth_out[g, :, :] = depth
        idf_out[g, :, :] = idf

        if not allow_exit:
            # Cross-tile prefetch: start the NEXT tile's first chunk
            # into slot 0 (all of this tile's DMAs are consumed by
            # now).  The next step skips its own chunk-0 start under
            # the same (tile > 0, total > 0) predicate.  t+1's reads
            # are clamped so the last tile stays in bounds; its start
            # is predicated off.
            tn = jnp.minimum(tile + 1, num_tiles - 1)
            loc_n, total_n, _ = schedule_for(tn, jax.lax.rem(tn, tiles_x),
                                             tn // tiles_x)

            @pl.when((tile + 1 < num_tiles) & (total_n > 0))
            def _():
                start_dma(0, loc_n(0)[0])

    return run_tile


def _rows8_columns(prims):
    """The 8 per-prim row columns of the rows8 dual encoding (see
    _raster_core6's rows8 branch): disc [px, py, z, r^2, idf, 0, 0, 0],
    capsule [x0, y0, ux, -rho0, uy, rhod, z0, sdz]; NaN where invalid.
    Shared by the gather build and the sort-carried build so both are
    bit-identical by construction."""
    p = prims.count
    pk = prims.params
    il2 = pk[:, 8]
    il = jnp.sqrt(il2)
    iscap = prims.kind == KIND_CAPSULE
    r = pk[:, 3]
    idf_col = jnp.arange(p, dtype=jnp.float32)
    nanf = np.float32(np.nan)
    cols = (
        pk[:, 0],
        pk[:, 1],
        jnp.where(iscap, pk[:, 4] * il2, pk[:, 2]),
        jnp.where(iscap, -(r * il), r * r),
        jnp.where(iscap, pk[:, 5] * il2, idf_col),
        jnp.where(iscap, pk[:, 7] * il, 0.0),
        jnp.where(iscap, pk[:, 2], 0.0),
        jnp.where(iscap, pk[:, 6], 0.0),
    )
    return tuple(jnp.where(prims.valid, c, nanf) for c in cols)


def _rows9_columns(prims):
    """rows9 = the rows8 dual-encoding columns plus idf as the 9th
    field (capsules; discs already carry idf at field 4 and zero-fill
    field 8).  NaN where invalid, exactly as _rows8_columns."""
    p = prims.count
    iscap = prims.kind == KIND_CAPSULE
    idf_col = jnp.arange(p, dtype=jnp.float32)
    nanf = np.float32(np.nan)
    c8 = jnp.where(iscap, idf_col, 0.0)
    return _rows8_columns(prims) + (
        jnp.where(prims.valid, c8, nanf),)


def _cap10_columns(prims):
    """The 10 per-prim row columns of the cap_rows10 layout
    ([params 0..8, idf]; zeros where invalid — the zero row is inert
    for the cap10 body).  Sort-carried build input; values identical
    to the gathered table10 by construction."""
    p = prims.count
    cols = tuple(prims.params[:, j] for j in range(9)) \
        + (jnp.arange(p, dtype=jnp.float32),)
    return tuple(jnp.where(prims.valid, c, 0.0) for c in cols)


def _raster_core6(prims, width, height, tile_h, tile_w, unroll,
                  chunk_rows, interpret, shade_rgb, shade_flag,
                  max_big=DEFAULT_MAX_BIG, bin_triangles=False,
                  discs_only=False, allow_exit=None, span=2,
                  dma_slots=2, fused_uv=False, tiles_per_program=1,
                  starts_method="scan", cap_rows10=False,
                  row_budget=None, rows8=False, rows8_carry=False,
                  cap10_carry=False, rows9=False, rows9_carry=False):
    """Binning + kernel launch.  Returns (depth, idf_img, uv, table16,
    diag) — ``uv`` is None unless ``fused_uv`` (then the winner's
    lambert (u, v) images; +inf marks big-list winners); ``table16``
    is None under ``discs_only`` (big rows are built at the big ids
    directly, see _build_table16_rows).  diag's
    ``big_overflow`` must be 0 for exactness (``true_entries`` reports
    the would-be v4 entry count for observability — v6 itself has no
    capacity precondition)."""
    if fused_uv and not discs_only:
        raise ValueError("fused_uv requires discs_only rows")
    if fused_uv and max_big + 1 > DEFAULT_BIG_CHUNK:
        raise ValueError(
            "fused_uv requires a RESIDENT big list (max_big <= "
            f"{DEFAULT_BIG_CHUNK - 1}): its (u, v) carry has no "
            "streamed-big variant")
    if cap_rows10 and discs_only:
        raise ValueError("cap_rows10 is the generic-soup narrow-row "
                         "mode — discs_only already rides 8-float rows")
    if cap_rows10 and bin_triangles:
        raise ValueError("cap_rows10 rows have no triangle lanes — "
                         "triangles must ride the big list "
                         "(bin_triangles=False)")
    if rows8 or rows9:
        if cap_rows10 or discs_only or bin_triangles or fused_uv \
                or (rows8 and rows9):
            raise ValueError(
                "rows8/rows9 are kind-split narrow-row modes for mixed "
                "disc+capsule soups: mutually exclusive with each other "
                "and with cap_rows10 / discs_only / bin_triangles / "
                "fused_uv")
        if allow_exit:
            raise ValueError("rows8/rows9 rows carry no zlb lane — "
                             "allow_exit must be off")
        allow_exit = False
    elif rows8_carry:
        raise ValueError("rows8_carry is a rows8 build variant — "
                         "requires rows8=True")
    elif rows9_carry:
        raise ValueError("rows9_carry is a rows9 build variant — "
                         "requires rows9=True")
    if cap10_carry and not cap_rows10:
        raise ValueError("cap10_carry is a cap_rows10 build variant — "
                         "requires cap_rows10=True")
    if allow_exit is None:
        # Measured policy (benchmarks/kernel6_sweep.py): the per-range
        # exit WINS 13% on the deep-run trail scene but LOSES ~1 ms on
        # shallow disc runs (the jump's prefetch drain/restart outweighs
        # the skipped chunks) — auto: on for generic span=2, off for
        # discs and for span=4 (whose exit would need 100 single-class
        # segments per tile; unsupported).  cap_rows10 rows carry no
        # zlb lane, so the narrow mode forces the exit off.
        allow_exit = (not discs_only) and span == 2 and not cap_rows10
    elif allow_exit and cap_rows10:
        raise ValueError("cap_rows10 rows carry no zlb lane — "
                         "allow_exit must be off")
    elif allow_exit and fused_uv:
        raise ValueError("fused_uv carries (u, v) through the stride-2 "
                         "exit merge — allow_exit must be off")
    elif allow_exit and span != 2:
        raise ValueError(
            "allow_exit requires span=2: the exit bound needs single-"
            "class segments, and span=4 would take 100 of them per "
            "tile ((span*(span+1)/2)**2)")
    if tiles_per_program < 1:
        raise ValueError("tiles_per_program must be >= 1")
    if dma_slots < 2:
        raise ValueError(
            "dma_slots must be >= 2: the exit-off walk prefetches chunk "
            "ci + n_slots - 1 from chunk ci's body (plus the cross-tile "
            "chunk-0 prefetch), so a single slot would double-start the "
            "same DMA/semaphore and race its own wait")
    if tiles_per_program > 1 and allow_exit:
        raise ValueError(
            "tiles_per_program > 1 fuses tiles on the straight-line "
            "fori walk — allow_exit must be off")
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
    k2 = span * span
    factor = 2 if (rows8 or rows9) else 1
    if (factor * num_tiles * k2 + 2) << (ZQ if allow_exit else 0) \
            >= (1 << 31):
        raise ValueError("tile grid too large for the int32 v6 key")

    # Exit-off walks need no z-buckets in the keys (_bin_csr6 with_z
    # docstring): smaller/int16 sort keys and no O(P) zlb pass.
    if rows8 and rows8_carry:
        carry = _rows8_columns(prims)
    elif rows9 and rows9_carry:
        carry = _rows9_columns(prims)
    elif cap_rows10 and cap10_carry:
        carry = _cap10_columns(prims)
    else:
        carry = ()
    bin_out = _bin_csr6(
        prims, tile_h, tile_w, num_tiles, tiles_x, tiles_y,
        max_big=max_big, bin_triangles=bin_triangles,
        discs_only=discs_only, span=span, with_z=allow_exit,
        kind_split=rows8 or rows9, carry=carry)
    sorted_keys, sorted_prims, big_ids, big_count, zmeta, n_small = \
        bin_out[:6]
    sorted_carry = bin_out[6] if carry else ()

    # (anchor, class) boundaries: B[j] = first sorted position with
    # anchor*k2+cls >= j.  B[k2*T] = number of binned prims (2x the
    # ordinal space under rows8's kind-split regions).
    kdtype, kshift = _key_layout(num_tiles, span, allow_exit,
                                 kind_split=rows8 or rows9)
    bounds = (np.arange(factor * num_tiles * k2 + 1,
                        dtype=np.int64) << kshift).astype(kdtype)
    # method: integer searchsorted is method-invariant (side='left'),
    # so this is a pure perf knob — 'scan' costs ~320 ns/bound (8k-32k
    # bounds), 'sort' one extra (P+B) merge-sort (benchmarks/
    # starts_probe.py + kernel6_sweep A/B it in-frame).
    starts = jnp.searchsorted(sorted_keys, jnp.asarray(bounds),
                              method=starts_method).astype(jnp.int32)
    # Entry count (sum over tiles of range lengths = per-class tile
    # coverage) — reported for observability/tests, not a precondition.
    cls_counts = starts[1:] - starts[:-1]
    c = cls_counts.reshape(factor * num_tiles, k2)
    if span == 2:
        # Reordered ordinals (0=none, 1=x, 2=both, 3=y) -> tile coverage.
        w_cls = np.asarray([1, 2, 4, 2], np.int32)
    else:
        w_cls = np.asarray([(cy + 1) * (cx + 1) for cy in range(span)
                            for cx in range(span)], np.int32)
    true_entries = jnp.sum(jnp.sum(c, axis=0) * jnp.asarray(w_cls))
    diag = dict(true_entries=true_entries.astype(jnp.int32),
                big_overflow=jnp.maximum(big_count - big_ids.shape[0], 0))

    p = prims.count
    # row_budget: static cap on the SORTED-ORDER row gather.  Binned
    # prims occupy the sorted prefix [0, n_small); big and invalid
    # prims sort past them (sentinel keys), so a soup with a large
    # invalid tail (adaptive trails: rows past a trail's per-frame k)
    # only needs rows for the prefix.  Exact iff n_small <= row_budget
    # — certified per frame by diag["row_overflow"] (same pattern as
    # big_overflow; probe with bin_diagnostics6(return_binned=True)).
    if row_budget is not None:
        n_rows = min(int(row_budget), p)
        diag["row_overflow"] = jnp.maximum(n_small - n_rows, 0) \
            .astype(jnp.int32)
        sorted_prims = sorted_prims[:n_rows]
    else:
        n_rows = p
        diag["row_overflow"] = jnp.zeros((), jnp.int32)
    row_f = (ROW_F_DISC if (discs_only or rows8)
             else ROW_F_CAP9 if rows9
             else ROW_F_CAP if cap_rows10 else ROW_F)
    pack = 128 // row_f
    if rows8 and chunk_rows % 128:
        # The interleaved idf lanes are addressed in 128-entry groups.
        chunk_rows = max(128, chunk_rows // 128 * 128)
    if chunk_rows % pack:
        # pack=12 (cap_rows10) does not divide the power-of-two
        # defaults — round the chunk DOWN to a pack multiple (252 for
        # 256; a pure DMA-granularity change, winners unaffected).
        chunk_rows = max(pack, chunk_rows // pack * pack)
    p_pad = -(-(n_rows + chunk_rows + pack) // chunk_rows) * chunk_rows
    if rows8:
        # Two slack groups: a chunk's group-aligned DMA window reaches
        # up to 128 entries past the packed-row window's end.
        p_pad += 256

    big_chunk = DEFAULT_BIG_CHUNK
    big = big_ids.shape[0]
    big_pad = -(-(big + 1) // big_chunk) * big_chunk
    big_ids_p = jnp.pad(big_ids, (0, big_pad - big), constant_values=p)

    prims_p = jnp.pad(sorted_prims, (0, p_pad - n_rows), constant_values=p)
    if discs_only:
        # Narrow 8-float disc rows: [px, py, z, r^2, idf, 0, 0, 0] —
        # 32 B gathers are ~40% cheaper than 64 B at equal row count
        # (benchmarks/v6_probe.py).  Invalid rows zeroed as table16.
        r = prims.params[:, 3]
        # Lane 5 carries _preshade's disc flag (inv_r) for the fused
        # (u, v) row body; zeros otherwise (rasterize passes zerosf).
        table8 = jnp.concatenate([
            prims.params[:, 0:3], (r * r)[:, None],
            jnp.arange(p, dtype=jnp.float32)[:, None],
            shade_flag[:, None],
            jnp.zeros((p, 2), jnp.float32),
        ], axis=1)
        table8 = jnp.where(prims.valid[:, None], table8, 0.0)
        table8 = jnp.pad(table8, ((0, 1), (0, 0)))
        rows = table8[prims_p].reshape(p_pad // pack, 128)
        # Only the big list needs 16-float rows here: build them at the
        # big ids directly instead of materializing the whole P x 16
        # table (a ~P*64 B write per frame saved; bit-equal rows).
        table16 = None
        big_rows = _build_table16_rows(prims, shade_rgb, shade_flag,
                                       big_ids_p,
                                       bin_triangles=bin_triangles)
    elif rows8:
        # Kind-split dual-encoding 8-float rows (ONE 32 B gather
        # granule per row — v6_probe r5 measured 40 B and 64 B gathers
        # at the same ~11 ns/row vs ~6.6 for 32 B):
        #   DISC    [px, py, z, r^2, idf, 0, 0, 0]  (_make_row_body8d)
        #   CAPSULE [x0, y0, ux, -rho0, uy, rhod, z0, sdz]
        #           (_make_row_body8c; ux = sdx*il2, rho = r*sqrt(il2))
        # Invalid and pad rows are NaN (every compare fails); the
        # cross-kind stranger encodings are mutually inert (lane 3 is
        # -rho0 < 0 under the disc body's r^2 test; rhod*t - r^2 <= -0
        # fails the capsule body's strict rad > 0).  idf lanes ride the
        # interleaved layout from the sort payload — no gather at all.
        nanf = np.float32(np.nan)
        # Mask sorted positions past the binned prefix to NaN rows:
        # the last capsule range's stranger window can reach into the
        # big-prim region of the sorted order, and a big capsule's row
        # is a VALID cap8 row — the cap10/cap16 modes tolerate that
        # duplicate because their stranger eval is bit-identical to
        # the big-list eval, but rows8's renormalized eval is not
        # (1-ulp depth skew, caught by the permutation-invariance
        # test).
        live = jnp.arange(p_pad, dtype=jnp.int32) < n_small
        prims_masked = jnp.where(live, prims_p, p)
        if rows8_carry:
            # Sort-carried build: the 8 columns were permuted through
            # the binning sort itself (v6_probe: the widened sort vs
            # the 32 B gather it replaces) — same values, same order,
            # bit-identical rows to the gather build below.
            def prep(c):
                c = c[:n_rows]
                c = jnp.pad(c, (0, p_pad - n_rows),
                            constant_values=nanf)
                return jnp.where(live, c, nanf)

            g8 = jnp.stack([prep(c) for c in sorted_carry],
                           axis=1).reshape(p_pad // 128, 8, 128)
        else:
            table8 = jnp.stack(_rows8_columns(prims), axis=1)
            table8 = jnp.pad(table8, ((0, 1), (0, 0)),
                             constant_values=nanf)
            g8 = table8[prims_masked].reshape(p_pad // 128, 8, 128)
        idf_lanes = prims_masked.astype(jnp.float32) \
            .reshape(p_pad // 128, 1, 128)
        rows = jnp.concatenate([g8, idf_lanes], axis=1) \
            .reshape(p_pad // 128 * 9, 128)
        table16 = None
        big_rows = _build_table16_rows(prims, shade_rgb, shade_flag,
                                       big_ids_p,
                                       bin_triangles=bin_triangles)
    elif rows9:
        # Kind-split 9-float rows: the rows8 dual encoding with idf
        # IN-ROW at a static lane (no interleave, no dynamic-lane
        # reads — queue H measured those at +3.5 ns/slot in rows8's
        # kernel).  Standard pack-14 machinery, 2 slop lanes zero.
        # NaN invalid/pad rows + the n_small mask for big-capsule
        # strangers (same renormalized-eval argument as rows8).
        nanf = np.float32(np.nan)
        live = jnp.arange(p_pad, dtype=jnp.int32) < n_small
        prims_masked = jnp.where(live, prims_p, p)
        if rows9_carry:
            def prep9(c):
                c = c[:n_rows]
                c = jnp.pad(c, (0, p_pad - n_rows),
                            constant_values=nanf)
                return jnp.where(live, c, nanf)

            rows = jnp.stack([prep9(c) for c in sorted_carry],
                             axis=1).reshape(p_pad // pack,
                                             pack * ROW_F_CAP9)
        else:
            table9 = jnp.stack(_rows9_columns(prims), axis=1)
            table9 = jnp.pad(table9, ((0, 1), (0, 0)),
                             constant_values=nanf)
            rows = table9[prims_masked].reshape(p_pad // pack,
                                                pack * ROW_F_CAP9)
        rows = jnp.pad(rows, ((0, 0), (0, 128 - pack * ROW_F_CAP9)))
        table16 = None
        big_rows = _build_table16_rows(prims, shade_rgb, shade_flag,
                                       big_ids_p,
                                       bin_triangles=bin_triangles)
    elif cap_rows10:
        # Narrow 10-float capsule rows: the tri-less exit-less soup
        # fast path (see _make_row_body10).  40 B gathers instead of
        # 64 B at equal row count, and the (P+1, 16) table16
        # materialization disappears (big rows are built at the big
        # ids, as in discs_only).  The 8 slop lanes per 128-lane HBM
        # row are zero (inert).
        if cap10_carry:
            # Sort-carried build: a 40 B row spans TWO 32 B gather
            # granules (v6_probe r5: same ~11.6 ns/row as 64 B), so
            # replacing the gather with sort-carried columns wins
            # exactly where it lost for rows8's one-granule rows.
            # Bit-identical rows: same values, same order; zero pad
            # (inert for the cap10 body) exactly as the gathered path.
            def prep10(c):
                c = c[:n_rows]
                return jnp.pad(c, (0, p_pad - n_rows))

            rows = jnp.stack([prep10(c) for c in sorted_carry],
                             axis=1).reshape(p_pad // pack,
                                             pack * ROW_F_CAP)
        else:
            table10 = jnp.concatenate([
                prims.params[:, 0:9],
                jnp.arange(p, dtype=jnp.float32)[:, None],
            ], axis=1)
            table10 = jnp.where(prims.valid[:, None], table10, 0.0)
            table10 = jnp.pad(table10, ((0, 1), (0, 0)))
            rows = table10[prims_p].reshape(p_pad // pack,
                                            pack * ROW_F_CAP)
        rows = jnp.pad(rows, ((0, 0), (0, 128 - pack * ROW_F_CAP)))
        table16 = None
        big_rows = _build_table16_rows(prims, shade_rgb, shade_flag,
                                       big_ids_p,
                                       bin_triangles=bin_triangles)
    else:
        table16 = _build_table16(prims, shade_rgb, shade_flag,
                                 bin_triangles=bin_triangles)
        rows = table16[prims_p].reshape(p_pad // pack, 128)
        big_rows = table16[big_ids_p]
    big_rows = big_rows.reshape(big_pad // PACK, 128)
    # A one-chunk big list (e.g. just the ground) rides a constant-
    # index SMEM block — fetched once for the whole grid instead of a
    # per-tile DMA round-trip (see the kernel's big_resident branch).
    big_resident = big_pad <= big_chunk
    if big_resident:
        big_rows = big_rows[None]

    scalars = jnp.concatenate([
        starts, jnp.minimum(big_count, big)[None].astype(jnp.int32)])

    if rows8:
        # Group-aligned DMA: (chunk + one boundary group) x 9 rows
        # (8 packed + 1 idf per 128 entries).
        n_chunk_block = (chunk_rows // 128 + 1) * 9
    else:
        n_chunk_block = chunk_rows // pack + 1
    n_slots = 2 if allow_exit else dma_slots

    big_spec = (pl.BlockSpec((1, big_pad // PACK, 128),
                             lambda i, c: (0, 0, 0),
                             memory_space=pltpu.SMEM)
                if big_resident else pl.BlockSpec(memory_space=pl.ANY))
    scratch_shapes = [
        pltpu.SMEM((n_slots, n_chunk_block, 128), jnp.float32),
        pltpu.SemaphoreType.DMA((n_slots,)),
    ]
    if not big_resident:
        scratch_shapes += [
            pltpu.SMEM((2, big_chunk // PACK, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    n_out = 4 if fused_uv else 2
    tpp = tiles_per_program
    grid_steps = -(-num_tiles // tpp)
    out_spec = pl.BlockSpec((tpp, 8, 128), lambda i, c: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            big_spec,
            pl.BlockSpec((1, 3), lambda i, c: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[out_spec] * n_out,
        scratch_shapes=scratch_shapes,
    )

    kernel = _make_kernel6(tiles_x, tile_h, tile_w, unroll, n_chunk_block,
                           chunk_rows, allow_exit=allow_exit,
                           num_tiles=num_tiles,
                           with_triangles=bin_triangles,
                           big_chunk=big_chunk, row_f=row_f, span=span,
                           dma_slots=dma_slots, big_resident=big_resident,
                           fused_uv=fused_uv, tiles_per_program=tpp,
                           rows8=rows8, rows9=rows9)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((grid_steps * tpp, 8, 128),
                                        jnp.float32)] * n_out,
        interpret=interpret,
    )(scalars, rows, big_rows, zmeta[None, :])

    nq = 128 // tile_w

    def assemble(t):
        return t[:num_tiles].reshape(tiles_y, tiles_x, 8, nq, tile_w) \
            .transpose(0, 3, 2, 1, 4) \
            .reshape(tiles_y * tile_h, tiles_x * tile_w)

    depth = assemble(outs[0])[:height, :width]
    idf = assemble(outs[1])[:height, :width]
    uv = ((assemble(outs[2])[:height, :width],
           assemble(outs[3])[:height, :width]) if fused_uv else None)
    return depth, idf, uv, table16, diag


def _shade_uv(camera, shading, depth, idf, u, v, uniform_look):
    """Gather-free two-tone epilogue over the fused (u, v) images.

    Bit-compatible with _shade_by_id's uniform_look path: u and v are
    the same f32 expressions ((qx - px) * inv_r, -(qy - py) * inv_r)
    evaluated in-kernel at the winning pair instead of after a
    per-pixel gather, and the lambert body below is copied verbatim.
    Big-list winners carry u = +inf (isfinite(u) == is_disc); their
    inf/nan lambert garbage is select()ed away.
    """
    hit = jnp.isfinite(depth)
    index = jnp.where(hit, idf.astype(jnp.int32), -1)
    m = camera.world_to_camera_matrix()
    l_cam = jnp.stack([m[0, 2], m[1, 2], m[2, 2]])
    w2 = jnp.maximum(0.0, 1.0 - u * u - v * v)
    nz = -jnp.sqrt(w2)
    ndotl = u * l_cam[0] + v * l_cam[1] + nz * l_cam[2]
    lit = shading.ambient + shading.diffuse * jnp.maximum(ndotl, 0.0)
    uc = np.asarray(uniform_look[0], np.float32)
    ub = np.asarray(uniform_look[1], np.float32)
    rgb = jnp.where(jnp.isfinite(u)[..., None], uc * lit[..., None], ub)
    bg = np.asarray(shading.background, np.float32)
    rgb = jnp.clip(jnp.where(hit[..., None], rgb, bg), 0.0, 1.0)
    return rgb, index


def rasterize_pallas_csr6(prims, width: int, height: int, tile_h: int = 32,
                          tile_w: int = 32, unroll: int = 4,
                          chunk_rows: int = DEFAULT_CHUNK_ROWS,
                          max_big: int = DEFAULT_MAX_BIG,
                          bin_triangles: bool = False,
                          discs_only: bool = False,
                          interpret: bool = False,
                          return_diag: bool = False,
                          allow_exit=None, span: int = 2,
                          dma_slots: int = 2,
                          tiles_per_program: int = 1,
                          starts_method: str = "scan",
                          cap_rows10: bool = False,
                          row_budget=None, rows8: bool = False,
                          rows8_carry: bool = False,
                          cap10_carry: bool = False,
                          rows9: bool = False,
                          rows9_carry: bool = False):
    """Returns (depth (H,W) f32 +inf-empty, index (H,W) i32 -1-empty).

    Same semantics and eval as rasterize_pallas_csr4 (per-pair exact
    ties, big list for wide prims/triangles, optional bin_triangles),
    with the anchor-sorted binning — and therefore NO entry_capacity
    precondition: nothing is ever truncated except big-list overflow
    (check diag/bin_diagnostics6).  ``discs_only`` narrows binned rows
    to 8 floats (capsules AND triangles ride the big list) — the disc-
    cloud fast path, ~40% cheaper row gathers.  ``cap_rows10`` narrows
    the GENERIC soup's binned rows to 10 floats (12 per 128-lane row;
    requires bin_triangles=False and forces the depth exit off) — same
    winners, ~37% fewer row-gather/DMA bytes and no (P+1, 16) table
    materialization.  ``rows8`` narrows further to kind-split 8-float
    rows (one 32 B gather granule; idf rides the sort payload) — discs
    stay bit-exact, binned capsules evaluate the renormalized
    segment-frame expressions (same geometry, ULP-level f32 rounding
    drift, certified through the same fidelity gate as the
    segment-count knob; oracle twin: rasterize_reference
    capsule_eval='cap8').
    """
    zeros3 = jnp.zeros((prims.count, 3), jnp.float32)
    zerosf = jnp.zeros((prims.count,), jnp.float32)
    depth, idf, _, _, diag = _raster_core6(
        prims, width, height, tile_h, tile_w, unroll, chunk_rows,
        interpret, zeros3, zerosf, max_big=max_big,
        bin_triangles=bin_triangles, discs_only=discs_only,
        allow_exit=allow_exit, span=span, dma_slots=dma_slots,
        tiles_per_program=tiles_per_program,
        starts_method=starts_method, cap_rows10=cap_rows10,
        row_budget=row_budget, rows8=rows8, rows8_carry=rows8_carry,
        cap10_carry=cap10_carry, rows9=rows9, rows9_carry=rows9_carry)
    index = jnp.where(jnp.isinf(depth), -1, idf.astype(jnp.int32))
    if return_diag:
        return depth, index, diag
    return depth, index


def derive_three_tone(prims):
    """Representative prim ids per kind + the exactness certificate for
    the ``three_tone`` shade (pallas_csr4._shade_by_id).

    Returns ``(reps, ok)`` — ``reps`` int32[3] = (disc, capsule,
    triangle) representative ids (argmax over each kind mask; 0 and
    inert when a kind is absent) and ``ok`` a scalar bool that is True
    iff every prim of a kind shares its representative's color AND
    every triangle shares its representative's normal — exactly the
    precondition under which the three-tone shade reproduces the
    per-prim ``_preshade`` table bit-for-bit.  Pure jittable function
    of the soup; callers must fall back to the preshade path when
    ``ok`` is False (bench.py does, so the tuned-file contract — knobs
    can only cost milliseconds, never correctness — holds even for
    scenes that stop being per-kind-constant).
    """
    reps = []
    ok = jnp.bool_(True)
    for k in (KIND_DISC, KIND_CAPSULE, KIND_TRIANGLE):
        # VALID prims only: invalid rows (culled points, the near-clip
        # path's unused triangle block) never render, and their color /
        # normal lanes are whatever the build left there — at some
        # frames they differ and would veto a perfectly constant scene.
        mask = (prims.kind == k) & prims.valid
        rep = jnp.argmax(mask)
        reps.append(rep)
        same = prims.color == prims.color[rep]
        ok = ok & jnp.all(jnp.where(mask[:, None], same, True))
    tri = (prims.kind == KIND_TRIANGLE) & prims.valid
    same_n = prims.normal == prims.normal[reps[2]]
    ok = ok & jnp.all(jnp.where(tri[:, None], same_n, True))
    return jnp.stack(reps).astype(jnp.int32), ok


def derive_four_tone(prims):
    """Like :func:`derive_three_tone`, for soups whose capsules carry
    TWO colors in two contiguous id runs — the droplet presets (tail
    capsules in the point color, then velocity trails in the trail
    color; run/pipeline.build_primitives emits parts in that order).

    Returns ``(vals, ok)`` — ``vals`` int32[5] = (disc_rep, capA_rep,
    capB_rep, cap_split, tri_rep) where capsules with id < cap_split
    shade from capA_rep and the rest from capB_rep, and ``ok`` is True
    iff discs/triangles are per-kind constant (triangles also
    normal-constant) AND each capsule run is color-constant.  A
    single-color capsule soup degenerates to capB == capA with split
    past the last capsule (== three_tone).  Pure jittable; callers fall
    back to the preshade path when ``ok`` is False.
    """
    n = prims.count
    ok = jnp.bool_(True)
    reps = {}
    for k in (KIND_DISC, KIND_TRIANGLE):
        # Valid prims only — see derive_three_tone.
        mask = (prims.kind == k) & prims.valid
        rep = jnp.argmax(mask)
        reps[k] = rep
        same = prims.color == prims.color[rep]
        ok = ok & jnp.all(jnp.where(mask[:, None], same, True))
    tri = (prims.kind == KIND_TRIANGLE) & prims.valid
    same_n = prims.normal == prims.normal[reps[KIND_TRIANGLE]]
    ok = ok & jnp.all(jnp.where(tri[:, None], same_n, True))

    cap = (prims.kind == KIND_CAPSULE) & prims.valid
    cap_a = jnp.argmax(cap)  # first valid capsule (0 if none)
    c0 = prims.color[cap_a]
    differs = cap & jnp.any(prims.color != c0[None, :], axis=1)
    has_b = jnp.any(differs)
    split = jnp.where(has_b, jnp.argmax(differs), n).astype(jnp.int32)
    cap_b = jnp.where(has_b, jnp.argmax(differs), cap_a)
    ids = jnp.arange(n)
    # Run A: capsules below split share c0 (by construction of split);
    # run B: capsules at/after split must share color[cap_b].
    same_b = prims.color == prims.color[cap_b]
    ok = ok & jnp.all(jnp.where((cap & (ids >= split))[:, None],
                                same_b, True))
    return (jnp.stack([reps[KIND_DISC], cap_a, cap_b, split,
                       reps[KIND_TRIANGLE]]).astype(jnp.int32), ok)


def render_shaded_csr6(prims, camera, shading, tile_h: int = 32,
                       tile_w: int = 32, unroll: int = 4,
                       chunk_rows: int = DEFAULT_CHUNK_ROWS,
                       max_big: int = DEFAULT_MAX_BIG,
                       bin_triangles: bool = False,
                       discs_only: bool = False,
                       uniform_look=None,
                       interpret: bool = False,
                       return_diag: bool = False,
                       allow_exit=None, span: int = 2,
                       dma_slots: int = 2,
                       tiles_per_program: int = 1,
                       starts_method: str = "scan",
                       cap_rows10: bool = False,
                       three_tone=None, row_budget=None,
                       rows8: bool = False, rows8_carry: bool = False,
                       cap10_carry: bool = False, rows9: bool = False,
                       rows9_carry: bool = False):
    """Rasterize + shade in one pass: (rgb, depth, index).

    Matches shading.shade_framebuffer bit-for-bit (lambert and flat
    modes); the shade epilogue is pallas_csr4's (compact 8-float
    per-pixel winner gather by id) — except TWO-TONE disc scenes
    (``uniform_look`` + ``discs_only``), where the kernel carries the
    winner's lambert (u, v) through the merge and the epilogue is pure
    per-pixel math with NO gather and NO per-frame table repack (the
    reason pallas3's gather-based uniform_look lost its measured A/B).

    ``three_tone``: (disc_rep, capsule_rep, tri_rep) prim ids for
    PER-KIND-CONSTANT generic soups (trail presets) — skips the O(P)
    _preshade rgb pass and narrows the shade table to 4 floats (see
    pallas_csr4._shade_by_id).  Also accepts the FOUR-tone 5-tuple
    (disc, capA, capB, cap_split, tri) for soups whose capsules carry
    two colors in two contiguous runs (droplet presets;
    derive_four_tone).  Lambert mode only; mutually exclusive with
    uniform_look.
    """
    from pointcloud_render_tpu.raster import pallas_csr4 as _v4

    if three_tone is not None and uniform_look is not None:
        raise ValueError("three_tone and uniform_look are exclusive")
    width, height = camera.width, camera.height
    three = three_tone is not None and shading.mode != "flat"
    if three:
        # Nothing reads shade_rgb/flag in the non-fused kernels (the
        # table16 mid lanes are kernel-inert for capsules/discs and
        # triangles take theirs from params) — zeros skip the pass.
        shade_rgb = jnp.zeros((prims.count, 3), jnp.float32)
        shade_flag = jnp.zeros((prims.count,), jnp.float32)
    else:
        shade_rgb, shade_flag = _preshade(prims, camera, shading)
    fused = (uniform_look is not None and discs_only
             and shading.mode != "flat" and allow_exit is not True
             and max_big + 1 <= DEFAULT_BIG_CHUNK)
    depth, idf, uv, _, diag = _raster_core6(
        prims, width, height, tile_h, tile_w, unroll, chunk_rows,
        interpret, shade_rgb, shade_flag, max_big=max_big,
        bin_triangles=bin_triangles, discs_only=discs_only,
        allow_exit=False if fused else allow_exit, span=span,
        dma_slots=dma_slots, fused_uv=fused,
        tiles_per_program=tiles_per_program,
        starts_method=starts_method, cap_rows10=cap_rows10,
        row_budget=row_budget, rows8=rows8, rows8_carry=rows8_carry,
        cap10_carry=cap10_carry, rows9=rows9, rows9_carry=rows9_carry)
    if fused:
        rgb, index = _shade_uv(camera, shading, depth, idf, uv[0],
                               uv[1], uniform_look)
    else:
        rgb, index = _v4._shade_by_id(prims, camera, shading, depth, idf,
                                      shade_rgb, shade_flag,
                                      uniform_look=uniform_look,
                                      three_tone=three_tone if three
                                      else None)
    if return_diag:
        return rgb, depth, index, diag
    return rgb, depth, index
