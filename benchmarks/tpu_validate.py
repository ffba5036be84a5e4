"""On-hardware exactness check: Pallas CSR kernel vs the tiled XLA backend.

CI forces CPU (interpret mode); this script validates the COMPILED kernel
on the real chip.  Run: python benchmarks/tpu_validate.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from pointcloud_render_tpu.raster import xla_tiled
from pointcloud_render_tpu.raster.pallas_csr import rasterize_pallas_csr
from pointcloud_render_tpu.raster.primitives import (
    ScreenPrimitives, capsules_from_polylines, discs_from_points)
from pointcloud_render_tpu.raster.render import ground_plane
from pointcloud_render_tpu.scene.camera import Camera


def main():
    from pointcloud_render_tpu.raster.pallas_csr import bin_diagnostics

    rng = np.random.default_rng(0)
    cam = Camera(origin=jnp.asarray(np.array([2., 2., 2.], np.float32)),
                 target=jnp.asarray(np.array([0., 0., -0.05], np.float32)))
    n = 20_000
    pos = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    # Realistic trails: short random-walk polylines (trail-like spans).
    base = rng.uniform(-0.4, 0.4, (500, 1, 3))
    steps = rng.normal(size=(500, 5, 3)) * 0.01
    pts = (base + np.cumsum(steps, axis=1)).astype(np.float32)
    soup = ScreenPrimitives.concatenate([
        ground_plane(cam, 10.0, (0., 0., -0.5)),
        discs_from_points(pos, cam, jnp.full((n,), 0.004),
                          np.array([0.3, 0.3, 0.3], np.float32)),
        capsules_from_polylines(jnp.asarray(pts), np.ones((500, 5), bool),
                                cam, 0.002,
                                np.array([0.2, 1.0, 0.4], np.float32)),
    ])
    dropped = int(bin_diagnostics(soup, cam.width, cam.height))
    print(f"big-list overflow: {dropped}")
    assert dropped == 0
    dp, ip = rasterize_pallas_csr(soup, cam.width, cam.height)
    dt, it = xla_tiled.rasterize_tiled(soup, cam.width, cam.height,
                                       max_per_tile=1024)
    match = float((np.asarray(ip) == np.asarray(it)).mean())
    print(f"winner match (pallas vs tiled, mixed 1080p scene): {match}")
    assert match == 1.0, "EXACTNESS REGRESSION"

    # Adversarial: huge random segments overflow capacity KNOWINGLY —
    # diagnostics must report it (silent truncation is the failure mode).
    wild = rng.uniform(-0.4, 0.4, (2000, 2, 3)).astype(np.float32)
    soup2 = capsules_from_polylines(jnp.asarray(wild),
                                    np.ones((2000, 2), bool), cam, 0.002,
                                    np.array([1.0, 0, 0], np.float32))
    over = int(bin_diagnostics(soup2, cam.width, cam.height, max_big=64))
    print(f"adversarial overflow reported: {over}")
    assert over > 0
    print("OK")


if __name__ == "__main__":
    main()
