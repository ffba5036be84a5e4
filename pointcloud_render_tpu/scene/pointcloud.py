"""PointCloud: the core scene-state pytree.

The reference keeps point data as a raw (N, 3) or (N, 6) ndarray threaded
through free functions (reference: traj_ball_renderer.py:190-221).  Here the
state is a registered JAX pytree so it flows through jit / vmap / shard_map
unchanged, with optional per-point velocity, color and radius channels.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np

# Default constants of the reference scene model.
DEFAULT_POINT_COLOR = (0.3, 0.3, 0.3)  # reference: traj_ball_renderer.py:94-96
DEFAULT_SPHERE_RADIUS = 0.01  # reference: traj_ball_renderer.py:39 (sphere radius)
TRAIL_RADIUS = 0.0007  # reference: traj_ball_renderer.py:160
TRAIL_COLOR = (0.2, 1.0, 0.4)  # reference: traj_ball_renderer.py:179


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PointCloud:
    """A batch of N points with optional per-point channels.

    Attributes:
      positions: (N, 3) float array, world-space positions.
      velocities: (N, 3) float array or None. When loaded from PLY files the
        reference falls back to normals (nx, ny, nz) as velocity
        (reference: traj_ball_renderer.py:253-273).
      colors: (N, 3) float array or None; None means the constant gray of the
        reference (0.3, 0.3, 0.3).
      radii: (N,) float array or None; None means the constant sphere splat
        radius 0.01 of the reference.
    """

    positions: jax.Array
    velocities: Optional[jax.Array] = None
    colors: Optional[jax.Array] = None
    radii: Optional[jax.Array] = None

    @property
    def num_points(self) -> int:
        return self.positions.shape[0]

    @property
    def has_velocity(self) -> bool:
        return self.velocities is not None

    def as_array(self) -> np.ndarray:
        """Back-convert to the reference's raw (N, 3|6) layout."""
        pos = np.asarray(self.positions)
        if self.velocities is None:
            return pos
        return np.column_stack([pos, np.asarray(self.velocities)])

    @staticmethod
    def from_array(data) -> "PointCloud":
        """Build from the reference's raw (N, 3) / (N, 6) array layout."""
        data = np.asarray(data)
        if data.ndim != 2 or data.shape[1] not in (3, 6):
            raise ValueError(f"expected (N,3) or (N,6) array, got {data.shape}")
        if data.shape[1] == 6:
            return PointCloud(positions=data[:, :3], velocities=data[:, 3:6])
        return PointCloud(positions=data)
