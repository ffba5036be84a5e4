"""Spatial (Morton) ordering of point clouds.

The v5 chunk-binned rasterizer (raster/pallas_csr5.py) bins CHUNKS of 16
consecutive primitives by their joint screen bbox; its cost model assumes
consecutive points are world-space neighbors.  This module provides the
one-time reorder that establishes that invariant: quantize positions to a
2^bits^3 grid over the cloud's own bounding box and sort by the
interleaved (Morton/Z-order) code.

The reorder is a pure permutation of the scene state — winner images on
the REORDERED soup match every other backend bit-for-bit on the same
soup (ids refer to soup rows, identically everywhere).  It runs once per
cloud at load/ingest time (host NumPy; a 1M-point argsort is ~100 ms,
amortized over a 220-frame trajectory), replacing nothing in the
reference (which has no spatial structure at all — every point is a
standalone XML shape, e.g. traj_ball_renderer.py:318-330).
"""

from __future__ import annotations

import numpy as np


def _part1by2(x: np.ndarray) -> np.ndarray:
    """Spread the low 21 bits of x so there are two zero bits between
    every payload bit (uint64 in, uint64 out)."""
    x = x.astype(np.uint64) & np.uint64(0x1FFFFF)
    x = (x | (x << np.uint64(32))) & np.uint64(0x1F00000000FFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x1F0000FF0000FF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x100F00F00F00F00F)
    x = (x | (x << np.uint64(4))) & np.uint64(0x10C30C30C30C30C3)
    x = (x | (x << np.uint64(2))) & np.uint64(0x1249249249249249)
    return x


def morton_codes(positions, bits: int = 10) -> np.ndarray:
    """(N, 3) float positions -> (N,) uint64 Morton codes on a
    2^bits-per-axis grid over the cloud's own AABB (NaN/inf-safe:
    non-finite coordinates clamp to the grid edge)."""
    p = np.asarray(positions, np.float64)
    finite = np.isfinite(p)
    safe = np.where(finite, p, 0.0)
    lo = safe.min(axis=0)
    hi = safe.max(axis=0)
    span = np.where(hi > lo, hi - lo, 1.0)
    n = (1 << bits) - 1
    q = np.clip(((safe - lo) / span) * n, 0, n).astype(np.uint64)
    q = np.where(finite, q, n).astype(np.uint64)
    return (_part1by2(q[:, 0]) | (_part1by2(q[:, 1]) << np.uint64(1))
            | (_part1by2(q[:, 2]) << np.uint64(2)))


def spatial_order(positions, bits: int = 10) -> np.ndarray:
    """(N,) int64 permutation sorting the cloud into Morton order
    (stable: equal cells keep their original relative order)."""
    return np.argsort(morton_codes(positions, bits=bits), kind="stable")


def spatial_sort(positions, *arrays, bits: int = 10):
    """Reorder positions (and any per-point companion arrays) into
    Morton order.  Returns (sorted_positions, *sorted_arrays, order)."""
    order = spatial_order(positions, bits=bits)
    out = [np.asarray(positions)[order]]
    for a in arrays:
        out.append(None if a is None else np.asarray(a)[order])
    out.append(order)
    return tuple(out)
