"""On-hardware exactness check for the rows8 kind-split kernel mode.

CI pins rows8 against its cap8 oracle in interpret mode
(tests/test_csr_v6.py::TestRows8); this script validates the COMPILED
Mosaic path on the real chip — including the one risk CPU tests cannot
cover: the row derivation (ux = sdx*il2, rho = r*sqrt(il2)) runs on the
TPU in production, so TPU sqrt/mul rounding must agree with the numpy
oracle's.  A mismatch here means the derivation must move to a
TPU-exact formulation before rows8 can ship.

Run: python benchmarks/tpu_validate_rows8.py   (claims the TPU)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

from pointcloud_render_tpu.raster import cpu_reference
from pointcloud_render_tpu.raster.pallas_csr6 import rasterize_pallas_csr6
from pointcloud_render_tpu.raster.primitives import (
    ScreenPrimitives, capsules_from_polylines, discs_from_points)
from pointcloud_render_tpu.raster.render import ground_plane
from pointcloud_render_tpu.scene.camera import Camera


def main():
    rng = np.random.default_rng(0)
    cam = Camera(origin=jnp.asarray(np.array([2., 2., 2.], np.float32)),
                 target=jnp.asarray(np.array([0., 0., -.05], np.float32)))
    n = 20_000
    pos = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    base = rng.uniform(-0.4, 0.4, (2000, 1, 3))
    steps = rng.normal(size=(2000, 5, 3)) * 0.01
    pts = (base + np.cumsum(steps, axis=1)).astype(np.float32)
    vv = np.ones((2000, 5), bool)
    vv[rng.uniform(size=vv.shape) < 0.1] = False  # invalid segments
    long_poly = rng.uniform(-0.5, 0.5, (20, 2, 3)).astype(np.float32)
    soup = ScreenPrimitives.concatenate([
        ground_plane(cam, 10.0, (0., 0., -0.5)),
        discs_from_points(pos, cam, jnp.full((n,), 0.004),
                          np.array([0.3, 0.3, 0.3], np.float32)),
        capsules_from_polylines(jnp.asarray(pts), jnp.asarray(vv), cam,
                                0.002,
                                np.array([0.2, 1.0, 0.4], np.float32)),
        capsules_from_polylines(jnp.asarray(long_poly),
                                np.ones((20, 2), bool), cam, 0.004,
                                np.array([0.9, 0.1, 0.1], np.float32)),
    ])
    host = jax.tree_util.tree_map(np.asarray, soup)
    modes = [("rows8", dict(rows8=True)), ("rows9", dict(rows9=True)),
             ("rows9c", dict(rows9=True, rows9_carry=True))]
    for name, mkw in modes:
        for span in (2, 4):
            dk, ik = rasterize_pallas_csr6(soup, cam.width, cam.height,
                                           span=span, max_big=2048,
                                           **mkw)
            do, io = cpu_reference.rasterize_reference(
                host, cam.width, cam.height, capsule_eval="cap8",
                span=span)
            ik, io = np.asarray(ik), np.asarray(io)
            dk, do = np.asarray(dk), np.asarray(do)
            match = float((ik == io).mean())
            print(f"{name} span={span} winner match (TPU vs cap8 "
                  f"oracle): {match}", flush=True)
            assert match == 1.0, \
                f"{name.upper()} EXACTNESS REGRESSION on chip"
            hit = ik >= 0
            kind_img = np.where(hit, host.kind[ik.clip(0)], -1)
            disc_px = kind_img == 0
            assert np.array_equal(dk[disc_px], do[disc_px]), \
                f"disc depth not bit-exact under {name} on chip"
            cap_px = hit & (kind_img == 1)
            ok = np.allclose(dk[cap_px], do[cap_px], rtol=5e-7)
            print(f"{name} span={span} capsule depth within FMA "
                  f"tolerance: {ok}", flush=True)
            assert ok
    print("OK", flush=True)


if __name__ == "__main__":
    main()
