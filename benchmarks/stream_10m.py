"""BASELINE.json config 5: stream a 10M+ point scene at 4K through one chip.

The cloud never resides on-device in full: fixed-size chunks stream
through the StreamingRasterizer's persistent z-buffer.  Prints chunk
throughput and total wall time.  Run: python benchmarks/stream_10m.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pointcloud_render_tpu.parallel.streaming import StreamingRasterizer
from pointcloud_render_tpu.scene.camera import Camera


def main(n_total=10_000_000, chunk=1_000_000, width=3840, height=2160):
    cam = Camera(origin=jnp.asarray(np.array([2., 2., 2.], np.float32)),
                 target=jnp.asarray(np.array([0., 0., -0.05], np.float32)),
                 width=width, height=height)
    sr = StreamingRasterizer(cam, chunk_points=chunk, radius_world=0.0015,
                             backend="pallas")
    rng = np.random.default_rng(0)

    def chunks():
        for k in range(n_total // chunk):
            # Host-side generation stands in for disk/DCN feed.
            yield rng.uniform(-0.5, 0.5, (chunk, 3)).astype(np.float32)

    # Warm up compile + first-execution program upload on a dummy chunk
    # (the remote-tunnel dev environment pays a large one-time cost to
    # load the 4K kernel; steady-state chunks are ~0.5 s).
    t0 = time.time()
    warm = rng.uniform(-0.5, 0.5, (chunk, 3)).astype(np.float32)
    d_w, _ = sr.rasterize([warm])
    float(jnp.isfinite(d_w).astype(jnp.float32).sum())  # force execution
    t1 = time.time()
    depth, index, attrs = sr.rasterize(chunks(), return_attrs=True)
    hit = float(jnp.mean((index >= 0).astype(jnp.float32)))
    t2 = time.time()
    n_chunks = n_total // chunk
    rgb = np.asarray(sr.resolve_rgb(depth, index, attrs))
    out_png = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "stream_10m_rgb.png")
    from pointcloud_render_tpu.io import png as png_io
    png_io.write_png(out_png, rgb)
    print(f"warmup (compile + program load): {t1 - t0:.1f}s")
    print(f"streamed {n_total / 1e6:.0f}M points @ {width}x{height}: "
          f"{t2 - t1:.1f}s steady-state = {(t2 - t1) / n_chunks:.2f}s/chunk "
          f"= {n_total / (t2 - t1) / 1e6:.1f}M pts/s (incl. host feed), "
          f"hit_frac={hit:.3f}, max_id={int(index.max())}")
    print(f"shaded RGB written: {out_png}")


if __name__ == "__main__":
    main()
