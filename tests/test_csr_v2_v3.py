"""Interpret-mode CI coverage for the pallas_csr2 / pallas_csr3 kernels.

The compiled kernels are additionally certified winner-exact on real TPU
hardware by bench.py's pre-timing gate; these tests pin the same contract
(winner = lexicographic min of (depth, id); disc depth bit-exact) on the
CPU interpreter, including the v3 fast path's documented edge cases:
exact depth ties, entry-capacity prefixes, and 2x2-span overflow routing.
"""

import jax.numpy as jnp
import numpy as np

from pointcloud_render_tpu.raster import cpu_reference
from pointcloud_render_tpu.raster.primitives import (
    ScreenPrimitives,
    capsules_from_polylines,
    discs_from_points,
)
from pointcloud_render_tpu.raster.render import RasterConfig, ground_plane, render
from pointcloud_render_tpu.scene.camera import Camera

from tests.test_raster import (
    H,
    W,
    assert_buffers_match,
    make_camera,
    random_cloud_prims,
    to_host,
)


def _disc_soup(cam, n=300, seed=3, radius=0.02, with_ground=True, ties=0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    if ties:
        pos[ties:2 * ties] = pos[:ties]  # exact duplicate discs -> depth ties
    discs = discs_from_points(jnp.asarray(pos), cam,
                              jnp.full((n,), radius, jnp.float32),
                              np.array([0.3, 0.3, 0.3], np.float32))
    parts = [ground_plane(cam, 10.0, (0, 0, -0.5))] if with_ground else []
    return ScreenPrimitives.concatenate(parts + [discs])


class TestPallasCsr2:
    def test_mixed_scene_matches_oracle(self):
        from pointcloud_render_tpu.raster.pallas_csr2 import rasterize_pallas_csr2

        cam = make_camera()
        rng = np.random.default_rng(8)
        discs = random_cloud_prims(cam, n=200, radius=0.025, seed=7)
        pts = rng.uniform(-0.4, 0.4, size=(30, 5, 3)).astype(np.float32)
        caps = capsules_from_polylines(
            jnp.asarray(pts), np.ones((30, 5), bool), cam, 0.003,
            np.array([0.2, 1.0, 0.4], np.float32))
        soup = ScreenPrimitives.concatenate(
            [ground_plane(cam, 10.0, (0, 0, -0.5)), discs, caps])
        d_o, i_o = cpu_reference.rasterize_reference(to_host(soup), W, H)
        d_p, i_p = rasterize_pallas_csr2(soup, W, H, no_triangles=True,
                                         unroll=4, interpret=True)
        assert_buffers_match(d_o, i_o, d_p, i_p, "csr2 mixed",
                             exact_depth=False, depth_rtol=2e-5)

    def test_disc_fast_path_with_capacity(self):
        from pointcloud_render_tpu.raster.pallas_csr2 import (
            rasterize_pallas_csr2,
            true_entry_count,
        )

        cam = make_camera()
        soup = _disc_soup(cam, ties=40)
        ec = int(true_entry_count(soup, W, H, no_triangles=True))
        cap = ((ec + 127) // 128) * 128
        d_o, i_o = cpu_reference.rasterize_reference(to_host(soup), W, H)
        d_p, i_p = rasterize_pallas_csr2(soup, W, H, discs_only=True,
                                         unroll=4, entry_capacity=cap,
                                         interpret=True)
        assert_buffers_match(d_o, i_o, d_p, i_p, "csr2 discs capacity",
                             exact_depth=False, depth_rtol=2e-5)


class TestPallasCsr3:
    def test_disc_scene_matches_oracle(self):
        from pointcloud_render_tpu.raster.pallas_csr3 import rasterize_pallas_csr3

        cam = make_camera()
        soup = _disc_soup(cam)
        d_o, i_o = cpu_reference.rasterize_reference(to_host(soup), W, H)
        d_p, i_p = rasterize_pallas_csr3(soup, W, H, unroll=4,
                                         interpret=True)
        assert_buffers_match(d_o, i_o, d_p, i_p, "csr3 discs",
                             exact_depth=False, depth_rtol=2e-5)

    def test_exact_depth_ties_keep_lowest_id(self):
        """Duplicated discs (identical z) must resolve to the LOWER id —
        the strict-< merge's stable-sort argument (pallas_csr3 docstring)."""
        from pointcloud_render_tpu.raster.pallas_csr3 import rasterize_pallas_csr3

        cam = make_camera()
        soup = _disc_soup(cam, n=200, ties=50)
        d_o, i_o = cpu_reference.rasterize_reference(to_host(soup), W, H)
        for unroll in (1, 4):
            d_p, i_p = rasterize_pallas_csr3(soup, W, H, unroll=unroll,
                                             interpret=True)
            assert_buffers_match(d_o, i_o, d_p, i_p,
                                 f"csr3 ties unroll={unroll}",
                                 exact_depth=False, depth_rtol=2e-5)

    def test_capacity_prefix_stays_exact(self):
        from pointcloud_render_tpu.raster.pallas_csr3 import (
            rasterize_pallas_csr3,
            true_entry_count3,
        )

        cam = make_camera()
        soup = _disc_soup(cam)
        ec = int(true_entry_count3(soup, W, H))
        cap = ((ec + 127) // 128) * 128
        d_o, i_o = cpu_reference.rasterize_reference(to_host(soup), W, H)
        d_p, i_p = rasterize_pallas_csr3(soup, W, H, unroll=4,
                                         entry_capacity=cap, interpret=True)
        assert_buffers_match(d_o, i_o, d_p, i_p, "csr3 capacity",
                             exact_depth=False, depth_rtol=2e-5)

    def test_wide_discs_ride_big_list(self):
        """Discs spanning more than 2x2 tiles are exact via the big list."""
        from pointcloud_render_tpu.raster.pallas_csr3 import (
            bin_diagnostics3,
            rasterize_pallas_csr3,
        )

        cam = make_camera()
        rng = np.random.default_rng(5)
        pos = rng.uniform(-0.3, 0.3, (50, 3)).astype(np.float32)
        big = discs_from_points(jnp.asarray(pos), cam,
                                jnp.full((50,), 0.15, jnp.float32),
                                np.array([0.5, 0.5, 0.5], np.float32))
        small = discs_from_points(
            jnp.asarray(rng.uniform(-0.5, 0.5, (200, 3)).astype(np.float32)),
            cam, jnp.full((200,), 0.01, jnp.float32),
            np.array([0.3, 0.3, 0.3], np.float32))
        # Big (wide) discs FIRST -> lower ids, per the v3 precondition.
        soup = ScreenPrimitives.concatenate([big, small])
        assert int(bin_diagnostics3(soup, W, H)) == 0
        d_o, i_o = cpu_reference.rasterize_reference(to_host(soup), W, H)
        d_p, i_p = rasterize_pallas_csr3(soup, W, H, unroll=4,
                                         interpret=True)
        assert_buffers_match(d_o, i_o, d_p, i_p, "csr3 wide discs",
                             exact_depth=True)

    def test_dense_tile_no_capacity_limit(self):
        from pointcloud_render_tpu.raster.pallas_csr3 import rasterize_pallas_csr3

        cam = make_camera()
        rng = np.random.default_rng(9)
        pos = (rng.uniform(-0.01, 0.01, (2000, 3))).astype(np.float32)
        prims = discs_from_points(pos, cam, jnp.full((2000,), 0.002),
                                  np.array([0.3, 0.3, 0.3], np.float32))
        d_o, i_o = cpu_reference.rasterize_reference(to_host(prims), W, H)
        d_p, i_p = rasterize_pallas_csr3(prims, W, H, interpret=True)
        assert_buffers_match(d_o, i_o, d_p, i_p, "csr3 dense",
                             exact_depth=True)

    def test_pixel_block_mappings_winner_exact(self):
        """Every supported VREG->pixel-block mapping (square and wide
        tiles) must produce the identical winner image — including the
        depth early-exit, which is active in all of them."""
        from pointcloud_render_tpu.raster.pallas_csr3 import rasterize_pallas_csr3

        cam = make_camera()
        soup = _disc_soup(cam, n=500, ties=30)
        d_o, i_o = cpu_reference.rasterize_reference(to_host(soup), W, H)
        for th, tw in ((32, 32), (16, 64), (64, 16)):
            d_p, i_p = rasterize_pallas_csr3(soup, W, H, tile_h=th,
                                             tile_w=tw, interpret=True)
            assert_buffers_match(d_o, i_o, d_p, i_p,
                                 f"csr3 block {th}x{tw}",
                                 exact_depth=False, depth_rtol=2e-5)

    def test_render_dispatch_backend_pallas3(self):
        cam = make_camera()
        soup = _disc_soup(cam)
        fb_t = render(soup, cam, RasterConfig(backend="tiled",
                                              max_per_tile=1024))
        fb_3 = render(soup, cam, RasterConfig(backend="pallas3"))
        np.testing.assert_array_equal(np.asarray(fb_t.index),
                                      np.asarray(fb_3.index))
        np.testing.assert_allclose(np.asarray(fb_t.rgb),
                                   np.asarray(fb_3.rgb), atol=1e-6)

    def test_fused_shading_matches_on_mixed_scene(self):
        """Trail capsules + wide discs ride the big list; the fused shade
        (preshaded rows) must match shade_framebuffer on every kind."""
        cam = make_camera()
        rng = np.random.default_rng(11)
        pts = rng.uniform(-0.4, 0.4, size=(20, 5, 3)).astype(np.float32)
        caps = capsules_from_polylines(
            jnp.asarray(pts), np.ones((20, 5), bool), cam, 0.003,
            np.array([0.2, 1.0, 0.4], np.float32))
        wide = discs_from_points(
            jnp.asarray(rng.uniform(-0.3, 0.3, (10, 3)).astype(np.float32)),
            cam, jnp.full((10,), 0.2, jnp.float32),
            np.array([0.6, 0.4, 0.2], np.float32))
        small = discs_from_points(
            jnp.asarray(rng.uniform(-0.5, 0.5, (300, 3)).astype(np.float32)),
            cam, jnp.full((300,), 0.01, jnp.float32),
            np.array([0.3, 0.3, 0.3], np.float32))
        soup = ScreenPrimitives.concatenate(
            [ground_plane(cam, 10.0, (0, 0, -0.5)), caps, wide, small])
        for mode in ("lambert", "flat"):
            from pointcloud_render_tpu.shading.shade import ShadingConfig

            cfg_t = RasterConfig(backend="tiled", max_per_tile=1024,
                                 shading=ShadingConfig(mode=mode))
            cfg_3 = RasterConfig(backend="pallas3",
                                 shading=ShadingConfig(mode=mode))
            fb_t = render(soup, cam, cfg_t)
            fb_3 = render(soup, cam, cfg_3)
            np.testing.assert_array_equal(np.asarray(fb_t.index),
                                          np.asarray(fb_3.index),
                                          err_msg=f"index {mode}")
            np.testing.assert_allclose(np.asarray(fb_t.rgb),
                                       np.asarray(fb_3.rgb), atol=1e-6,
                                       err_msg=f"rgb {mode}")
