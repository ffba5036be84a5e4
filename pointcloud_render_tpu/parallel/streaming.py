"""Streaming rasterization for clouds larger than device memory.

BASELINE.json config 5: a 10M+ point scene streams through the chip in
fixed-size chunks.  The device keeps only the running framebuffers plus
one chunk of points; chunks are dispatched asynchronously so host->device
transfer of chunk k+1 overlaps the rasterization of chunk k (XLA's async
dispatch pipelines the compiled step calls).

Primitive ids are globalized with the chunk offset, so the result is
IDENTICAL (winner-exact) to a hypothetical single-pass render of the
whole cloud — the merge is the same lexicographic (depth, id) min used
everywhere else.

Color/shading: the step carries winner ATTRIBUTE buffers (px, py, r_px,
rgb) through the merge alongside (depth, id) — one fused table gather per
chunk — and ``resolve_rgb`` shades the final buffers with the same
sphere-normal Lambert model as shading.shade (so a streamed frame matches
the monolithic render's look).

Scale composition: pass a ('points',)-meshed ``mesh`` and each chunk is
ALSO point-sharded across the mesh — every device rasterizes chunk_size /
n_devices points and the running buffers stay replicated, so 10M+ points
use all chips (VERDICT r1 item 6).
"""

from __future__ import annotations

import functools
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from pointcloud_render_tpu.raster import pallas_csr3, xla_tiled
from pointcloud_render_tpu.raster.primitives import discs_from_points
from pointcloud_render_tpu.utils import aot

IMAX = np.int32(2147483647)
INF = np.float32(np.inf)


def _shade_disc(px, py, r, rgb, hit, camera, ambient=0.3, diffuse=0.7,
                background=(1.0, 1.0, 1.0)):
    """Sphere-normal Lambert for disc winners (mirrors shading.shade)."""
    h, w = hit.shape
    m = camera.world_to_camera_matrix()
    l_cam = jnp.stack([m[0, 2], m[1, 2], m[2, 2]])
    qx = (np.arange(w, dtype=np.float32) + 0.5)[None, :]
    qy = (np.arange(h, dtype=np.float32) + 0.5)[:, None]
    inv_r = 1.0 / jnp.maximum(r, 1e-6)
    u = (qx - px) * inv_r
    v = -(qy - py) * inv_r
    w2 = jnp.maximum(0.0, 1.0 - u * u - v * v)
    nz = -jnp.sqrt(w2)
    ndotl = u * l_cam[0] + v * l_cam[1] + nz * l_cam[2]
    lit = ambient + diffuse * jnp.maximum(ndotl, 0.0)
    out = rgb * lit[..., None]
    bg = np.asarray(background, np.float32)
    return jnp.clip(jnp.where(hit[..., None], out, bg), 0.0, 1.0)


class StreamingRasterizer:
    """Chunked disc-splat rasterizer with persistent z/attribute buffers.

    Args:
      camera: the Camera.
      chunk_points: points per streamed chunk (static shape).
      radius_world: world-space splat radius.
      backend: "pallas" | "tiled" | None (auto).
      color: (3,) default color, used when a chunk has no per-point colors.
      mesh: optional jax Mesh with a 'points' axis — each chunk is
        point-sharded across it (composes streaming with the device mesh).
    """

    def __init__(self, camera, chunk_points: int, radius_world: float,
                 backend: Optional[str] = None,
                 color=(0.3, 0.3, 0.3), mesh=None,
                 entry_capacity: Optional[int] = None):
        self.camera = camera
        self.chunk_points = int(chunk_points)
        self.radius = float(radius_world)
        self.color = np.asarray(color, np.float32)
        self.backend = backend or (
            "pallas" if jax.default_backend() == "tpu" else "tiled")
        self.mesh = mesh
        self.entry_capacity = entry_capacity
        self._step = None
        self._max_entries = 0

    # -- device step ---------------------------------------------------------

    def _raster_local(self, chunk, colors):
        """One device's (or the whole chip's) rasterization of a chunk."""
        cam = self.camera
        prims = discs_from_points(
            chunk, cam, jnp.full((chunk.shape[0],), self.radius, jnp.float32),
            colors)
        if self.backend == "pallas":
            # v3 disc fast path with the primitive id riding the row's
            # flag slot (exact as f32 below 2^24): ONE winner gather
            # yields id AND shading attributes — no separate entry->id
            # resolve or attribute gather.  The true (pre-capacity)
            # entry count rides along so rasterize() can assert the
            # finite-capacity exactness precondition post hoc.
            idf = jnp.arange(prims.count, dtype=jnp.float32)
            d, ent, rows_flat, _sp, _bl, e_pad, tc = \
                pallas_csr3._raster_core(
                    prims, cam.width, cam.height, 32, 32, 4,
                    self.entry_capacity, pallas_csr3.DEFAULT_CHUNK_ROWS,
                    jax.default_backend() != "tpu", prims.color, idf,
                    (0.0, 0.0, 0.0))
            n_rows = rows_flat.shape[0]
            shade_idx = jnp.where(
                ent == IMAX, n_rows - 1,
                jnp.where(ent < 0, e_pad + (-ent - 2), ent))
            a = rows_flat[jnp.clip(shade_idx, 0, n_rows - 1)]
            i = jnp.where(jnp.isinf(d), -1, a[..., 7].astype(jnp.int32))
            # (px, py, r, rgb); r = sqrt(r^2) is within 1 ulp of the
            # projected radius — resolve_rgb's Lambert tolerance.
            attr = jnp.concatenate(
                [a[..., 0:2], jnp.sqrt(a[..., 3:4]), a[..., 4:7]],
                axis=-1)
            return d, i, attr, tc
        d, i = xla_tiled.rasterize_tiled(prims, cam.width, cam.height)
        tc = jnp.int32(0)
        # Fused winner-attribute gather: (px, py, r, rgb) per hit pixel.
        table = jnp.concatenate([
            prims.params[:, 0:2], prims.params[:, 3:4], prims.color], axis=1)
        attr = table[jnp.maximum(i, 0)]  # (H, W, 6)
        return d, i, attr, tc

    def _merge(self, d, gi, attr, depth, index, attrs):
        take = (d < depth) | ((d == depth) & (gi < index))
        return (jnp.where(take, d, depth),
                jnp.where(take, gi, index),
                jnp.where(take[..., None], attr, attrs))

    def _make_step(self):
        cam = self.camera

        def step_single(chunk, colors, offset, depth, index, attrs):
            d, i, attr, tc = self._raster_local(chunk, colors)
            gi = jnp.where(i >= 0, i + offset, IMAX)
            d = jnp.where(i >= 0, d, INF)
            return self._merge(d, gi, attr, depth, index, attrs) + (tc,)

        if self.mesh is None:
            return step_single

        mesh = self.mesh
        n_dev = mesh.shape["points"]
        if self.chunk_points % n_dev:
            raise ValueError(
                f"chunk_points {self.chunk_points} not divisible by "
                f"{n_dev} devices")

        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P("points"), P("points"), P(), P(None, None),
                      P(None, None), P(None, None, None)),
            out_specs=(P(None, None), P(None, None), P(None, None, None),
                       P()),
            check_vma=False,
        )
        def step_sharded(chunk, colors, offset, depth, index, attrs):
            n_local = chunk.shape[0]
            shard = jax.lax.axis_index("points")
            d, i, attr, tc = self._raster_local(chunk, colors)
            gi = jnp.where(i >= 0, i + offset + shard * n_local, IMAX)
            d = jnp.where(i >= 0, d, INF)
            # Merge across the mesh first (lexicographic pmin), then fold
            # the replicated winner into the running buffers.
            best_d = jax.lax.pmin(d, "points")
            contender = jnp.where(d == best_d, gi, IMAX)
            best_gi = jax.lax.pmin(contender, "points")
            mine = (d == best_d) & (gi == best_gi) & (gi != IMAX)
            attr_sum = jax.lax.psum(
                jnp.where(mine[..., None], attr, 0.0), "points")
            return self._merge(best_d, best_gi, attr_sum, depth, index,
                               attrs) + (jax.lax.pmax(tc, "points"),)

        return step_sharded

    def _compile(self, example_chunk, example_colors, depth, index, attrs):
        self._step = aot.compile_const_free(
            self._make_step(), example_chunk, example_colors, jnp.int32(0),
            depth, index, attrs)

    # -- host loop -------------------------------------------------------------

    def rasterize(self, chunks: Iterable, return_attrs: bool = False):
        """Consume an iterable of (C, 3) position chunks — or (positions,
        colors) tuples for per-point colors; the last chunk may be short
        (padded with culled sentinels).  Returns (depth, index) with
        global point indices, plus the winner attribute buffer when
        ``return_attrs`` (use ``resolve_rgb`` to shade it)."""
        cam = self.camera
        depth = jnp.full((cam.height, cam.width), jnp.inf, jnp.float32)
        index = jnp.full((cam.height, cam.width), IMAX, jnp.int32)
        attrs = jnp.zeros((cam.height, cam.width, 6), jnp.float32)
        tc_max = jnp.int32(0)
        offset = 0
        for chunk in chunks:
            if isinstance(chunk, tuple):
                chunk, colors = chunk
                colors = np.asarray(colors, np.float32)
            else:
                colors = np.broadcast_to(self.color,
                                         (np.asarray(chunk).shape[0], 3))
            chunk = np.asarray(chunk, np.float32)
            n = chunk.shape[0]
            if n < self.chunk_points:
                pad = self.chunk_points - n
                chunk = np.concatenate(
                    [chunk, np.full((pad, 3), np.float32(1e30))])
                colors = np.concatenate(
                    [colors, np.zeros((pad, 3), np.float32)])
            dev = jnp.asarray(chunk)
            col = jnp.asarray(colors)
            if self._step is None:
                self._compile(dev, col, depth, index, attrs)
            depth, index, attrs, tc = self._step(dev, col, jnp.int32(offset),
                                                 depth, index, attrs)
            # Device-side running max: ONE scalar fetch at the end (a
            # per-chunk fetch costs a full tunnel RTT each).
            tc_max = jnp.maximum(tc_max, tc)
            offset += n
        if self.entry_capacity is not None and offset:
            worst = int(np.asarray(tc_max))
            self._max_entries = worst
            if worst > self.entry_capacity:
                raise RuntimeError(
                    f"streaming entry_capacity {self.entry_capacity} "
                    f"exceeded (a chunk binned {worst} entries) — the "
                    f"render silently truncated; rerun with capacity >= "
                    f"{worst}.")
        index = jnp.where(jnp.isinf(depth), -1, index)
        if return_attrs:
            return depth, index, attrs
        return depth, index

    def resolve_rgb(self, depth, index, attrs, shaded: bool = True):
        """Winner attributes -> final RGB image ((H, W, 3) float32)."""
        hit = index >= 0
        if not shaded:
            bg = np.ones(3, np.float32)
            return jnp.where(hit[..., None], attrs[..., 3:6], bg)
        return _shade_disc(attrs[..., 0], attrs[..., 1], attrs[..., 2],
                           attrs[..., 3:6], hit, self.camera)
