"""The per-pixel coverage/depth evaluator shared by every accelerated backend.

Pure mul/add/compare float32 (no sqrt; the only division is the triangle's
perspective 1/iz) — see primitives.py: IEEE elementwise ops are
bit-identical between the NumPy oracle, XLA CPU and the TPU VPU, which is
what makes the "depth-exact match rate" metric meaningful.  (NumPy and XLA
CPU divisions are correctly rounded; TPU f32 division is accurate to
<=1 ulp — triangle depth ties within 1 ulp are broken by primitive index.)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pointcloud_render_tpu.raster.primitives import KIND_TRIANGLE


def eval_coverage_depth(kind, params, qx, qy):
    """Evaluate primitives against pixel centers, fully broadcast.

    Args:
      kind: (...,) int32 primitive kinds.
      params: (..., 12) float32 parameter rows.
      qx, qy: (H, W) pixel-center coordinates (or any shape broadcastable
        against (..., 1, 1)).

    Returns:
      covered: (..., H, W) bool; depth: (..., H, W) float32 (garbage where
      not covered).
    """

    def p(i):
        return params[..., i][..., None, None]

    k = kind[..., None, None]

    # --- disc OR capsule (discs are degenerate capsules; one path) ---
    dxd = qx - p(0)
    dyd = qy - p(1)
    t = jnp.clip((dxd * p(4) + dyd * p(5)) * p(8), 0.0, 1.0)
    cx = dxd - t * p(4)
    cy = dyd - t * p(5)
    rad = p(3) + p(7) * t
    cap_cov = cx * cx + cy * cy <= rad * rad
    cap_depth = p(2) + p(6) * t

    # --- triangle: [ex0,ey0,c0, ex1,ey1,c1, ex2,ey2,c2, a0,a1,a2] ---
    e0 = p(0) * qy - p(1) * qx + p(2)
    e1 = p(3) * qy - p(4) * qx + p(5)
    e2 = p(6) * qy - p(7) * qx + p(8)
    iz = e0 * p(9) + e1 * p(10) + e2 * p(11)
    tri_cov = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & (iz > 0)
    tri_depth = 1.0 / jnp.where(iz > 0, iz, 1.0)

    is_tri = k == KIND_TRIANGLE
    covered = jnp.where(is_tri, tri_cov, cap_cov)
    depth = jnp.where(is_tri, tri_depth, cap_depth)
    return covered, jnp.asarray(depth, jnp.float32)


def pixel_centers(height, width, y0=0, x0=0):
    """(H, W) pixel-center coordinate grids for a screen region."""
    qy = (np.arange(height, dtype=np.float32) + np.float32(y0) + 0.5)[:, None]
    qx = (np.arange(width, dtype=np.float32) + np.float32(x0) + 0.5)[None, :]
    return (np.broadcast_to(qx, (height, width)),
            np.broadcast_to(qy, (height, width)))
