"""Point-cloud normalization and coordinate-frame transforms (state layer).

These host-side functions replay the reference's preprocessing
bit-compatibly and are the entry contract of every pipeline:

* ``standardize_point_cloud`` — mean-center positions and divide by the
  scalar ``max(pcl - column_min)`` range, cast to float32, velocities pass
  through unscaled (reference: traj_ball_renderer.py:190-202).
* ``transform_coordinates`` — permute axes (z, x, y), optionally flip the
  new x axis, and lift z by +0.0125 (reference: traj_ball_renderer.py:204-221;
  the b0/b1/original variants remove the flip, reference: traj_b0.py:62-82).

NumPy (float64 intermediate, float32 result) matches the reference
exactly; ``standardize_point_cloud_jax`` / ``transform_coordinates_jax``
are jit-traceable float32 equivalents for in-graph trajectory stepping.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

Z_LIFT = 0.0125  # reference: traj_ball_renderer.py:211
POSITION_PERMUTATION = (2, 0, 1)  # reference: traj_ball_renderer.py:209
VELOCITY_PERMUTATION = (5, 3, 4)  # reference: traj_ball_renderer.py:213


def standardize_point_cloud(pcl: np.ndarray) -> np.ndarray:
    """Normalize positions to a unit-ish box centered at the origin.

    Scale is the single scalar ``max(positions - columnwise_min)`` — i.e. the
    largest extent over all coordinates, NOT a per-axis range
    (reference: traj_ball_renderer.py:195).
    """
    pcl = np.asarray(pcl)
    positions = pcl[:, :3]
    center = np.mean(positions, axis=0)
    scale = np.amax(positions - np.amin(positions, axis=0))
    normalized = ((positions - center) / scale).astype(np.float32)
    if pcl.shape[1] == 6:
        velocities = pcl[:, 3:6].astype(np.float32)
        return np.column_stack([normalized, velocities])
    return normalized


def transform_coordinates(pcl: np.ndarray, flip_x: bool = True) -> np.ndarray:
    """Re-axis the cloud into the render frame.

    Positions take axes (z, x, y); the new x is negated when ``flip_x``
    (all presets except b0/b1/original, reference: traj_b0.py:62-82);
    the new z is lifted by +0.0125.  Velocities get the same permutation
    and flip but no lift.
    """
    pcl = np.asarray(pcl)
    has_velocity = pcl.shape[1] == 6
    positions = pcl[:, list(POSITION_PERMUTATION)].copy()
    if flip_x:
        positions[:, 0] *= -1
    positions[:, 2] += Z_LIFT
    if has_velocity:
        velocities = pcl[:, list(VELOCITY_PERMUTATION)].copy()
        if flip_x:
            velocities[:, 0] *= -1
        return np.column_stack([positions, velocities])
    return positions


def standardize_point_cloud_jax(positions, velocities=None):
    """Float32, jit-traceable version of :func:`standardize_point_cloud`."""
    positions = jnp.asarray(positions, jnp.float32)
    center = jnp.mean(positions, axis=0)
    scale = jnp.max(positions - jnp.min(positions, axis=0))
    normalized = (positions - center) / scale
    if velocities is None:
        return normalized, None
    return normalized, jnp.asarray(velocities, jnp.float32)


def transform_coordinates_jax(positions, velocities=None, flip_x: bool = True):
    """Jit-traceable version of :func:`transform_coordinates`."""
    sign = -1.0 if flip_x else 1.0
    positions = jnp.asarray(positions, jnp.float32)
    if velocities is not None:
        velocities = jnp.asarray(velocities, jnp.float32)
    p = positions[:, jnp.array([2, 0, 1])]
    p = p.at[:, 0].multiply(sign)
    p = p.at[:, 2].add(Z_LIFT)
    if velocities is None:
        return p, None
    v = velocities[:, jnp.array([2, 0, 1])]
    v = v.at[:, 0].multiply(sign)
    return p, v
