"""Streaming rasterization for clouds larger than device memory.

BASELINE.json config 5: a 10M+ point scene streams through the chip in
fixed-size chunks.  The device keeps only the running (depth, index)
framebuffers plus one chunk of points; chunks are dispatched
asynchronously so host->device transfer of chunk k+1 overlaps the
rasterization of chunk k (XLA's async dispatch pipelines the compiled
step calls).

Primitive ids are globalized with the chunk offset, so the result is
IDENTICAL (winner-exact) to a hypothetical single-pass render of the
whole cloud — the merge is the same lexicographic (depth, id) min used
everywhere else.  An optional second pass resolves per-chunk colors.
"""

from __future__ import annotations

from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pointcloud_render_tpu.raster import pallas_csr, xla_tiled
from pointcloud_render_tpu.raster.primitives import discs_from_points
from pointcloud_render_tpu.utils import aot

IMAX = np.int32(2147483647)


class StreamingRasterizer:
    """Chunked disc-splat rasterizer with a persistent z-buffer."""

    def __init__(self, camera, chunk_points: int, radius_world: float,
                 backend: Optional[str] = None,
                 color=(0.3, 0.3, 0.3)):
        self.camera = camera
        self.chunk_points = int(chunk_points)
        self.radius = float(radius_world)
        self.color = np.asarray(color, np.float32)
        self.backend = backend or (
            "pallas" if jax.default_backend() == "tpu" else "tiled")
        self._step = None

    def _compile(self, example_chunk, depth, index):
        cam, radius, color, backend = (self.camera, self.radius, self.color,
                                       self.backend)

        def step(chunk, offset, depth, index):
            prims = discs_from_points(
                chunk, cam, jnp.full((chunk.shape[0],), radius, jnp.float32),
                color)
            if backend == "pallas":
                d, i = pallas_csr.rasterize_pallas_csr(
                    prims, cam.width, cam.height, no_triangles=True,
                    interpret=jax.default_backend() != "tpu")
            else:
                d, i = xla_tiled.rasterize_tiled(prims, cam.width, cam.height)
            gi = jnp.where(i >= 0, i + offset, IMAX)
            d = jnp.where(i >= 0, d, jnp.inf)
            take = (d < depth) | ((d == depth) & (gi < index))
            return jnp.where(take, d, depth), jnp.where(take, gi, index)

        self._step = aot.compile_const_free(
            step, example_chunk, jnp.int32(0), depth, index)

    def rasterize(self, chunks: Iterable[np.ndarray]):
        """Consume an iterable of (C, 3) position chunks (the last may be
        short; it is padded with culled sentinels).  Returns (depth, index)
        with global point indices."""
        cam = self.camera
        depth = jnp.full((cam.height, cam.width), jnp.inf, jnp.float32)
        index = jnp.full((cam.height, cam.width), IMAX, jnp.int32)
        offset = 0
        for chunk in chunks:
            chunk = np.asarray(chunk, np.float32)
            n = chunk.shape[0]
            if n < self.chunk_points:
                pad = np.full((self.chunk_points - n, 3), np.float32(1e30))
                chunk = np.concatenate([chunk, pad])
            dev = jnp.asarray(chunk)
            if self._step is None:
                self._compile(dev, depth, index)
            depth, index = self._step(dev, jnp.int32(offset), depth, index)
            offset += n
        index = jnp.where(jnp.isinf(depth), -1, index)
        return depth, index
