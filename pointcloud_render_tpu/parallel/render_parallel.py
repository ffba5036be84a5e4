"""Distributed rendering over a TPU device mesh.

The reference is strictly serial (one frame at a time, one process,
SURVEY.md §2 "parallelism: NONE"); this module adds the two TPU-native
scale axes:

* **frame data-parallelism** — a batch of frames sharded over the mesh's
  'frames' axis via shard_map; each device renders its frames end-to-end
  (the rendering analogue of batch DP);
* **point sharding** — one frame whose cloud is split over the 'points'
  axis; every device rasterizes its shard into a private z-buffer with
  GLOBAL primitive indices, and the buffers merge with a two-collective
  lexicographic reduction over ICI:
      depth*  = pmin(depth)
      winner  = pmin(where(depth == depth*, global_id, INT_MAX))
  followed by a psum color resolve (each shard contributes the shaded
  color only where the winner is local).  This is the z-buffer analogue
  of a sequence-parallel all-reduce (SURVEY.md §5).

Both paths compose: a 2D ('frames', 'points') mesh renders F frames, each
point-sharded, in one jitted program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from pointcloud_render_tpu.raster import xla_tiled
from pointcloud_render_tpu.raster.primitives import discs_from_points

IMAX = np.int32(2147483647)
INF = np.float32(np.inf)


def make_render_mesh(n_frames_axis: int, n_points_axis: int,
                     devices=None) -> Mesh:
    """A ('frames', 'points') mesh over the available devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    need = n_frames_axis * n_points_axis
    if devices.size < need:
        raise ValueError(f"need {need} devices, have {devices.size}")
    grid = devices[:need].reshape(n_frames_axis, n_points_axis)
    return Mesh(grid, axis_names=("frames", "points"))


def _shard_frame(positions, radii, colors, camera, config, axis_name):
    """Per-device slice of one frame's point-sharded render.

    positions: (N_local, 3) on each device; primitive ids are globalized
    with the shard offset so the lexicographic tie-break is device-count
    invariant.
    """
    n_local = positions.shape[0]
    shard = jax.lax.axis_index(axis_name)
    offset = shard * n_local

    prims = discs_from_points(positions, camera, radii, colors)
    depth, index = xla_tiled.rasterize_tiled(
        prims, camera.width, camera.height,
        tile_h=config.tile_h, tile_w=config.tile_w,
        max_per_tile=config.max_per_tile)
    gindex = jnp.where(index >= 0, index + offset, IMAX)
    depth = jnp.where(index >= 0, depth, INF)

    # Ground plane drawn once, on shard 0, with ids above all points.
    # (Cheap: 2 triangles; avoids duplicate-geometry ties entirely.)
    # Collective lexicographic merge over ICI.
    best_depth = jax.lax.pmin(depth, axis_name)
    contender = jnp.where(depth == best_depth, gindex, IMAX)
    best_gidx = jax.lax.pmin(contender, axis_name)

    # Color resolve: my shard contributes where the winner is mine.
    local = (best_gidx >= offset) & (best_gidx < offset + n_local)
    local_idx = jnp.clip(best_gidx - offset, 0, n_local - 1)
    rgb_local = jnp.where(local[..., None], prims.color[local_idx], 0.0)
    rgb = jax.lax.psum(rgb_local, axis_name)

    hit = best_gidx != IMAX
    rgb = jnp.where(hit[..., None], rgb, 1.0)  # white background
    return rgb, jnp.where(hit, best_depth, INF), jnp.where(hit, best_gidx, -1)


def render_point_sharded(positions, radii, colors, camera,
                         config, mesh: Mesh, axis: str = "points"):
    """Rasterize one frame with the cloud sharded over `axis`.

    Returns replicated (H, W, 3) rgb, (H, W) depth and global index.
    """
    n = positions.shape[0]
    n_dev = mesh.shape[axis]
    if n % n_dev:
        raise ValueError(f"point count {n} not divisible by {n_dev}")

    other = tuple(a for a in mesh.axis_names if a != axis)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(*[None] * 3), P(*[None] * 2), P(*[None] * 2)),
        check_vma=False,
    )
    def run(pos, rad, col):
        # Collapse any leading unsharded axes contributed by `other`.
        rgb, depth, idx = _shard_frame(pos, rad, col, camera, config, axis)
        if other:
            # Identical across the other axes; keep as-is (replicated).
            pass
        return rgb, depth, idx

    return run(positions, radii, colors)


def render_batch_sharded(positions, radii, colors, camera, config,
                         mesh: Mesh):
    """Frames x points 2D-sharded batch render in ONE shard_map.

    positions: (F, N, 3); F divides mesh['frames'], N divides
    mesh['points'].  Each device holds a (F/df, N/dp) block, renders its
    point shards for its frames, and the z-buffers merge over the
    'points' axis only.  Returns (F, H, W[, 3]) rgb/depth/index with the
    frame axis sharded over 'frames'.
    """
    f = positions.shape[0]
    if f % mesh.shape["frames"] or positions.shape[1] % mesh.shape["points"]:
        raise ValueError("batch/point axes must divide the mesh axes")

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P("frames", "points"), P("frames", "points"),
                  P("frames", "points")),
        out_specs=(P("frames"), P("frames"), P("frames")),
        check_vma=False,
    )
    def run(pos, rad, col):
        def one(args):
            p, r, c = args
            return _shard_frame(p, r, c, camera, config, "points")

        return jax.vmap(one)((pos, rad, col))

    return run(positions, radii, colors)


def render_frames_dp(step_fn, frame_args, mesh: Mesh, axis: str = "frames"):
    """Map a single-frame render step over a frame batch, sharded on `axis`.

    Args:
      step_fn: callable(*per_frame_args) -> pytree (e.g. FrameBuffers).
      frame_args: tuple of arrays with a leading frame axis (F, ...).
      mesh: mesh containing `axis`; F must divide by its size.
    """
    in_specs = tuple(P(axis) for _ in frame_args)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(in_specs,),
        out_specs=P(axis), check_vma=False,
    )
    def run(args):
        return jax.vmap(lambda a: step_fn(*a))(args)

    return run(frame_args)
