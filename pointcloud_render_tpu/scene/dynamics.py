"""Dynamic clouds: velocity advection and motion coloring (device-side).

The reference realizes dynamics by loading a different file per frame
(traj_ball_renderer.py:434-439); here a dynamic cloud can also be STEPPED
on device — positions advected by their velocities inside the jitted
frame loop (BASELINE.json config 4), with optional motion coloring.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def advect(positions, velocities, dt):
    """Forward-Euler advection: p + v * dt (the reference's implicit model:
    frame files are snapshots of particles moving along their velocity)."""
    return positions + velocities * jnp.float32(dt)


def motion_colors(velocities, v_max: float = 10.0,
                  slow=(0.2, 0.4, 1.0), fast=(1.0, 0.3, 0.1)):
    """Speed-mapped colors: lerp slow->fast on |v| / v_max (clamped).

    v_max defaults to the reference's velocity normalizer
    (traj_ball_renderer.py:134: min(|v| / 10, 1)).
    """
    speed = jnp.linalg.norm(jnp.asarray(velocities, jnp.float32), axis=1)
    t = jnp.clip(speed / jnp.float32(v_max), 0.0, 1.0)[:, None]
    lo = np.asarray(slow, np.float32)
    hi = np.asarray(fast, np.float32)
    return lo + (hi - lo) * t
