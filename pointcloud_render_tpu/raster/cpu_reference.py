"""NumPy reference rasterizer — the correctness oracle.

Slow, loopy, independent: iterates primitives in index order and updates
each one's integer bbox window with a strict depth test (z < zbuf), which
together with ascending iteration implements the shared contract —
winner per pixel = lexicographic min of (depth, primitive index).

All arithmetic is float32 with the exact expression shapes of
coverage.eval_coverage_depth, so TPU/XLA backends are expected to match
this oracle bit-for-bit on discs and capsules (see coverage.py for the
triangle 1-ulp caveat).  SURVEY.md §4 item 2: this oracle is the
north-star metric's ground truth; Mitsuba's Monte Carlo output cannot be
a pixel oracle.
"""

from __future__ import annotations

import numpy as np

from pointcloud_render_tpu.raster.primitives import (
    KIND_CAPSULE,
    KIND_DISC,
    KIND_TRIANGLE,
)


def _binnable_mask(bbox, width, height, tile_h, tile_w, span):
    """Which prims the v6 binning treats as SMALL (<= span x span tiles)
    — the exact f32 tile arithmetic of pallas_csr6._bin_csr6 (floor of a
    division by a power-of-two tile size is exact in f32), so the cap8
    oracle splits binned-vs-big capsules exactly as the kernel does."""
    tiles_y = -(-height // tile_h)
    tiles_x = -(-width // tile_w)
    tx0 = np.clip(np.floor(bbox[:, 0] / np.float32(tile_w)).astype(np.int32),
                  0, tiles_x - 1)
    tx1 = np.clip(np.floor(bbox[:, 1] / np.float32(tile_w)).astype(np.int32),
                  0, tiles_x - 1)
    ty0 = np.clip(np.floor(bbox[:, 2] / np.float32(tile_h)).astype(np.int32),
                  0, tiles_y - 1)
    ty1 = np.clip(np.floor(bbox[:, 3] / np.float32(tile_h)).astype(np.int32),
                  0, tiles_y - 1)
    return (tx1 - tx0 < span) & (ty1 - ty0 < span)


def rasterize_reference(prims, width: int, height: int,
                        capsule_eval: str = "cap10", tile_h: int = 32,
                        tile_w: int = 32, span: int = 2):
    """Rasterize a ScreenPrimitives soup (numpy-converted) on the CPU.

    ``capsule_eval="cap8"`` mirrors the rows8 backend mode
    (pallas_csr6._make_row_body8_cap): BINNED capsules evaluate the
    renormalized segment-frame expressions (same geometry, different f32
    rounding — fidelity-certified like the segment-count knob), while
    big-list capsules (bbox wider than span x span tiles, classified
    with _binnable_mask's exact arithmetic) and all discs keep the
    default expressions, exactly as the kernel routes them.

    Returns:
      depth: (H, W) float32, +inf where empty.
      index: (H, W) int32 winning primitive row, -1 where empty.
    """
    kind = np.asarray(prims.kind)
    params = np.asarray(prims.params, np.float32)
    valid = np.asarray(prims.valid)
    bbox = np.asarray(prims.bbox, np.float32)

    if capsule_eval not in ("cap10", "cap8"):
        raise ValueError(capsule_eval)
    cap8 = (_binnable_mask(bbox, width, height, tile_h, tile_w, span)
            if capsule_eval == "cap8"
            else np.zeros(kind.shape[0], bool))

    depth = np.full((height, width), np.inf, np.float32)
    index = np.full((height, width), -1, np.int32)

    for i in range(kind.shape[0]):
        if not valid[i]:
            continue
        xmin, xmax, ymin, ymax = bbox[i]
        # Pixel centers at col + 0.5: covered cols satisfy col + 0.5 in
        # [xmin, xmax] -> ceil(xmin - 0.5) .. floor(xmax - 0.5).
        c0 = max(int(np.ceil(xmin - 0.5)), 0)
        c1 = min(int(np.floor(xmax - 0.5)), width - 1)
        r0 = max(int(np.ceil(ymin - 0.5)), 0)
        r1 = min(int(np.floor(ymax - 0.5)), height - 1)
        if c1 < c0 or r1 < r0:
            continue
        qx = (np.arange(c0, c1 + 1, dtype=np.float32) + np.float32(0.5))[None, :]
        qy = (np.arange(r0, r1 + 1, dtype=np.float32) + np.float32(0.5))[:, None]
        p = params[i]
        if kind[i] == KIND_CAPSULE and cap8[i]:
            # rows8 binned-capsule expressions, identical order to
            # _make_row_body8_cap: row fields derived in f32 exactly as
            # the table build derives them.
            il2 = p[8]
            il = np.float32(np.sqrt(il2))
            ux = np.float32(p[4] * il2)
            uy = np.float32(p[5] * il2)
            nr0 = np.float32(-(p[3] * il))
            rhod = np.float32(p[7] * il)
            dx = qx - p[0]
            dy = qy - p[1]
            a = dx * ux + dy * uy
            g = dy * ux - dx * uy
            t = np.clip(a, np.float32(0.0),
                        np.float32(1.0)).astype(np.float32)
            am = a - t
            d2 = am * am + g * g
            rad = rhod * t - nr0
            cov = (d2 <= rad * rad) & (rad > 0)
            z = p[2] + p[6] * t
        elif kind[i] in (KIND_DISC, KIND_CAPSULE):
            dx = qx - p[0]
            dy = qy - p[1]
            t = np.clip((dx * p[4] + dy * p[5]) * p[8], np.float32(0.0),
                        np.float32(1.0)).astype(np.float32)
            cx = dx - t * p[4]
            cy = dy - t * p[5]
            rad = p[3] + p[7] * t
            cov = cx * cx + cy * cy <= rad * rad
            z = p[2] + p[6] * t
        elif kind[i] == KIND_TRIANGLE:
            e0 = p[0] * qy - p[1] * qx + p[2]
            e1 = p[3] * qy - p[4] * qx + p[5]
            e2 = p[6] * qy - p[7] * qx + p[8]
            iz = e0 * p[9] + e1 * p[10] + e2 * p[11]
            cov = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & (iz > 0)
            z = np.where(iz > 0, np.float32(1.0) / np.where(iz > 0, iz, 1), np.inf)
            z = z.astype(np.float32)
        else:
            continue
        window_d = depth[r0:r1 + 1, c0:c1 + 1]
        window_i = index[r0:r1 + 1, c0:c1 + 1]
        better = cov & (z < window_d)  # strict: earlier index wins ties
        window_d[better] = np.broadcast_to(z, better.shape)[better]
        window_i[better] = i
    return depth, index
