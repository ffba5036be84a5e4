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

    def test_uniform_look_matches_generic_shading(self):
        """The 4-float uniform_look shade path == the generic 8-float
        path on a two-tone scene (gray discs over the white ground),
        winner-exact and rgb-equal to FMA noise."""
        from pointcloud_render_tpu.raster.pallas_csr3 import (
            render_shaded_csr3,
        )
        from pointcloud_render_tpu.shading.shade import ShadingConfig

        cam = make_camera()
        soup = _disc_soup(cam)
        cfg = ShadingConfig()
        rgb_g, d_g, i_g = render_shaded_csr3(soup, cam, cfg, interpret=True)
        rgb_u, d_u, i_u = render_shaded_csr3(
            soup, cam, cfg, interpret=True,
            uniform_look=((0.3, 0.3, 0.3), (1.0, 1.0, 1.0)))
        np.testing.assert_array_equal(np.asarray(i_g), np.asarray(i_u))
        np.testing.assert_array_equal(np.asarray(d_g), np.asarray(d_u))
        np.testing.assert_allclose(np.asarray(rgb_u), np.asarray(rgb_g),
                                   atol=2e-6)

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


class TestPallasCsr4:
    """Generic binned kernel: discs AND capsules bin; full per-pair
    (depth, id) tie-break — exact for every kind mix and any sort order."""

    def _mixed_soup(self, cam, seed=11):
        from pointcloud_render_tpu.raster.primitives import (
            capsules_from_polylines,
        )

        rng = np.random.default_rng(seed)
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
        dup_pos = rng.uniform(-0.5, 0.5, (40, 3)).astype(np.float32)
        dup = discs_from_points(jnp.asarray(dup_pos), cam,
                                jnp.full((40,), 0.05, jnp.float32),
                                np.array([0.9, 0.1, 0.1], np.float32))
        # Duplicated discs -> exact depth ties; wide discs interleave the
        # big list with binned ids (the case that breaks rank==id maps).
        return ScreenPrimitives.concatenate(
            [ground_plane(cam, 10.0, (0, 0, -0.5)), caps, wide, small,
             dup, dup])

    def test_mixed_scene_winner_exact(self):
        from pointcloud_render_tpu.raster.pallas_csr4 import rasterize_pallas_csr4

        cam = make_camera()
        soup = self._mixed_soup(cam)
        d_o, i_o = cpu_reference.rasterize_reference(to_host(soup), W, H)
        d_p, i_p = rasterize_pallas_csr4(soup, W, H, interpret=True)
        assert_buffers_match(d_o, i_o, d_p, i_p, "csr4 mixed",
                             exact_depth=False, depth_rtol=2e-5)
        # Disc depth stays bit-exact (CLAUDE.md invariant).
        kind = np.asarray(soup.kind)
        disc = (np.asarray(i_o) >= 0) & (kind[np.maximum(i_o, 0)] == 0)
        np.testing.assert_array_equal(np.asarray(d_p)[disc],
                                      np.asarray(d_o)[disc])

    def test_bin_triangles_mesh_lod_winner_exact(self):
        """bin_triangles=True (the mesh-LOD droplet mode, VERDICT r2
        item 5): small droplet-instance triangles BIN (branchless dual
        eval) instead of riding the capped big list, winner-exact vs the
        oracle on a ground + discs + triangle-mesh soup, including
        triangle/disc depth ties."""
        from pointcloud_render_tpu.geometry.droplet import droplet_mesh
        from pointcloud_render_tpu.raster.pallas_csr4 import (
            bin_diagnostics4,
            rasterize_pallas_csr4,
        )
        from pointcloud_render_tpu.raster.primitives import (
            triangles_from_mesh,
        )

        cam = make_camera()
        rng = np.random.default_rng(17)
        verts, faces = droplet_mesh()
        verts = np.asarray(verts, np.float32) * 4.0  # a few px per tri
        parts = [ground_plane(cam, 10.0, (0, 0, -0.5))]
        all_f = []
        all_v = []
        for k in range(12):
            c = rng.uniform(-0.35, 0.35, 3).astype(np.float32)
            all_f.append(np.asarray(faces) + len(all_v) * 0
                         + sum(v.shape[0] for v in all_v))
            all_v.append(verts + c)
        mesh_v = np.concatenate(all_v)
        mesh_f = np.concatenate(all_f)
        parts.append(triangles_from_mesh(
            jnp.asarray(mesh_v), jnp.asarray(mesh_f), cam,
            np.array([0.3, 0.3, 0.8], np.float32)))
        parts.append(discs_from_points(
            jnp.asarray(rng.uniform(-0.4, 0.4, (200, 3)).astype(np.float32)),
            cam, jnp.full((200,), 0.02, jnp.float32),
            np.array([0.3, 0.3, 0.3], np.float32)))
        soup = ScreenPrimitives.concatenate(parts)

        # Without triangle binning the mesh overflows a small big list;
        # with it, only the ground rides big.
        assert int(np.asarray(bin_diagnostics4(
            soup, W, H, max_big=64))) > 0
        assert int(np.asarray(bin_diagnostics4(
            soup, W, H, max_big=64, bin_triangles=True))) == 0

        d_o, i_o = cpu_reference.rasterize_reference(to_host(soup), W, H)
        d_p, i_p = rasterize_pallas_csr4(soup, W, H, interpret=True,
                                         bin_triangles=True)
        # Triangle-dense soup: edge-function cancellation near edges
        # reaches ~2.4e-5 relative (winners above are exact).
        assert_buffers_match(d_o, i_o, d_p, i_p, "csr4 bin_triangles",
                             exact_depth=False, depth_rtol=5e-5)
        kinds = np.asarray(soup.kind)[np.asarray(i_o)[np.asarray(i_o) >= 0]]
        assert (kinds == 2).any(), "no triangle winners"
        assert (kinds == 0).any(), "no disc winners"

    def test_bin_triangles_fused_shading(self):
        """Fused shading under bin_triangles: the shade table is built
        from the soup (not the kernel rows, whose rgb lanes now hold
        edge coefficients) — rgb must match shade_framebuffer."""
        from pointcloud_render_tpu.raster.pallas_csr4 import (
            render_shaded_csr4,
        )
        from pointcloud_render_tpu.raster.primitives import (
            triangles_from_mesh,
        )
        from pointcloud_render_tpu.shading.shade import (
            ShadingConfig,
            shade_framebuffer,
        )

        cam = make_camera()
        rng = np.random.default_rng(18)
        pts = np.array([[-0.2, 0, 0.1], [0.2, 0, 0.1], [0, 0.25, 0.1],
                        [0.05, -0.3, 0.0], [0.3, -0.1, 0.0],
                        [0.15, 0.1, 0.0]], np.float32)
        tris = triangles_from_mesh(
            jnp.asarray(pts), np.array([[0, 1, 2], [3, 4, 5]], np.int32),
            cam, np.array([0.8, 0.2, 0.2], np.float32))
        discs = discs_from_points(
            jnp.asarray(rng.uniform(-0.4, 0.4, (100, 3)).astype(np.float32)),
            cam, jnp.full((100,), 0.03, jnp.float32),
            np.array([0.3, 0.3, 0.3], np.float32))
        soup = ScreenPrimitives.concatenate(
            [ground_plane(cam, 10.0, (0, 0, -0.5)), tris, discs])
        cfg = ShadingConfig()
        rgb, d, i = render_shaded_csr4(soup, cam, cfg, interpret=True,
                                       bin_triangles=True)
        ref = np.asarray(shade_framebuffer(soup, cam, d, i, cfg))
        np.testing.assert_allclose(np.asarray(rgb), ref, atol=2e-6)

    def test_capacity_prefix_and_blocks(self):
        from pointcloud_render_tpu.raster.pallas_csr4 import (
            rasterize_pallas_csr4,
            true_entry_count4,
        )

        cam = make_camera()
        soup = self._mixed_soup(cam, seed=5)
        d_o, i_o = cpu_reference.rasterize_reference(to_host(soup), W, H)
        for th, tw in ((32, 32), (16, 64)):
            ec = int(true_entry_count4(soup, W, H, tile_h=th, tile_w=tw))
            cap = ((ec + 127) // 128) * 128
            d_p, i_p = rasterize_pallas_csr4(
                soup, W, H, tile_h=th, tile_w=tw, entry_capacity=cap,
                interpret=True)
            assert_buffers_match(d_o, i_o, d_p, i_p,
                                 f"csr4 {th}x{tw} cap={cap}",
                                 exact_depth=False, depth_rtol=2e-5)

    def test_fused_shading_matches_shade_framebuffer(self):
        from pointcloud_render_tpu.shading.shade import ShadingConfig

        cam = make_camera()
        soup = self._mixed_soup(cam)
        for mode in ("lambert", "flat"):
            cfg_t = RasterConfig(backend="tiled", max_per_tile=2048,
                                 shading=ShadingConfig(mode=mode))
            cfg_4 = RasterConfig(backend="pallas4",
                                 shading=ShadingConfig(mode=mode))
            fb_t = render(soup, cam, cfg_t)
            fb_4 = render(soup, cam, cfg_4)
            np.testing.assert_array_equal(np.asarray(fb_t.index),
                                          np.asarray(fb_4.index),
                                          err_msg=f"index {mode}")
            np.testing.assert_allclose(np.asarray(fb_t.rgb),
                                       np.asarray(fb_4.rgb), atol=1e-6,
                                       err_msg=f"rgb {mode}")

    def test_collapsed_velocity_trails_roundtrip(self):
        """The pipeline's 8-segment straight-trail collapse must render
        the same capsule coverage as the full 21-point chain."""
        from pointcloud_render_tpu.configs import PRESETS
        from pointcloud_render_tpu.geometry import trails as trails_mod
        from pointcloud_render_tpu.raster.primitives import (
            capsules_from_polylines,
        )
        from pointcloud_render_tpu.run.pipeline import build_primitives

        preset = PRESETS["traj_ball"]
        cam = make_camera()
        rng = np.random.default_rng(7)
        n = 120
        pos = jnp.asarray(rng.uniform(-0.4, 0.4, (n, 3)), jnp.float32)
        vel = jnp.asarray(rng.normal(0, 3, (n, 3)), jnp.float32)
        fi = jnp.int32(120)
        soup = build_primitives(preset, cam, pos, vel, fi)
        pts, valid = trails_mod.velocity_trails(pos, vel, fi,
                                                preset.trail_schedule)
        full_caps = capsules_from_polylines(
            pts, jnp.broadcast_to(valid[:, None], pts.shape[:2]), cam,
            preset.trail_radius,
            np.asarray(preset.trail_color, np.float32))
        d_c, i_c = cpu_reference.rasterize_reference(to_host(soup), W, H)
        # Chain soup: same parts but the full 21-point trails.
        chain = ScreenPrimitives.concatenate([
            ground_plane(cam, preset.ground_half_extent,
                         preset.ground_center),
            discs_from_points(pos, cam,
                              np.full((n,), preset.point_radius,
                                      np.float32),
                              np.asarray(preset.point_color, np.float32)),
            full_caps,
        ])
        d_f, i_f = cpu_reference.rasterize_reference(to_host(chain), W, H)
        kc = np.asarray(soup.kind)[np.maximum(np.asarray(i_c), 0)]
        kf = np.asarray(chain.kind)[np.maximum(np.asarray(i_f), 0)]
        cap_c = (np.asarray(i_c) >= 0) & (kc == 1)
        cap_f = (np.asarray(i_f) >= 0) & (kf == 1)
        assert cap_f.sum() > 100
        # Identical capsule-covered pixel sets (same union geometry).
        agree = (cap_c == cap_f).mean()
        assert agree > 0.999, f"trail coverage changed: {agree}"


class TestV4OverflowGuard:
    def test_trajectory_probe_grows_max_big_on_overflow(self):
        """run/trajectory's pre-flight probe must GROW max_big for
        scenes whose non-binnable prims exceed the default big-list cap
        (they would otherwise fail the scan's per-frame overflow
        certificate after a wasted render)."""
        from pointcloud_render_tpu.configs import PRESETS
        from pointcloud_render_tpu.raster.pallas_csr6 import (
            bin_diagnostics6,
        )
        from pointcloud_render_tpu.run.pipeline import build_primitives
        from pointcloud_render_tpu.run.trajectory import (
            TrajectoryScanRenderer,
        )
        from pointcloud_render_tpu.scene.camera import (
            IMAGE_HEIGHT,
            IMAGE_WIDTH,
            TARGETS,
            Camera,
            camera_origin,
        )

        # Giant splat radius -> every disc spans > 2x2 blocks -> all big.
        import dataclasses as _dc

        preset = _dc.replace(PRESETS["traj_ball"], point_radius=0.45,
                             trail="none")
        rng = np.random.default_rng(0)
        pos = rng.uniform(-0.4, 0.4, (3000, 3)).astype(np.float32)
        vel = np.zeros((3000, 3), np.float32)
        r = TrajectoryScanRenderer(preset)
        assert r.raster_config.max_big == 1024
        r._probe_max_big(jnp.asarray(pos), jnp.asarray(vel),
                         list(range(4)))
        assert r.raster_config.max_big > 3000
        cam = Camera(origin=jnp.asarray(camera_origin("traj_ball", 0, 220)),
                     target=np.asarray(TARGETS["traj_ball"], np.float32),
                     fov_x_degrees=preset.fov_x_degrees)
        prims = build_primitives(preset, cam, jnp.asarray(pos),
                                 jnp.asarray(vel), jnp.int32(0))
        assert int(np.asarray(bin_diagnostics6(
            prims, IMAGE_WIDTH, IMAGE_HEIGHT,
            max_big=r.raster_config.max_big))) == 0


class TestV4Determinism:
    def test_order_permutation_determinism(self):
        """Permuting primitive order changes ids but not the image —
        v4's unstable sort must not introduce order sensitivity (the
        per-pair (depth, id) tie-break makes winners order-free)."""
        from pointcloud_render_tpu.raster.pallas_csr4 import rasterize_pallas_csr4

        cam = make_camera()
        rng = np.random.default_rng(3)
        n = 300
        pos = rng.uniform(-0.5, 0.5, size=(n, 3)).astype(np.float32)
        perm = rng.permutation(n)
        a = discs_from_points(jnp.asarray(pos), cam, jnp.full((n,), 0.03),
                              jnp.array([0.3, 0.3, 0.3]))
        b = discs_from_points(jnp.asarray(pos[perm]), cam,
                              jnp.full((n,), 0.03),
                              jnp.array([0.3, 0.3, 0.3]))
        d_a, i_a = rasterize_pallas_csr4(a, W, H, interpret=True)
        d_b, i_b = rasterize_pallas_csr4(b, W, H, interpret=True)
        i_a, i_b = np.asarray(i_a), np.asarray(i_b)
        np.testing.assert_array_equal(np.asarray(d_a), np.asarray(d_b))
        hit = i_a >= 0
        np.testing.assert_array_equal(
            np.where(hit, perm[i_b.clip(0)], -1), np.where(hit, i_a, -1))


class TestInvalidStrangerSoundness:
    """Invalid prims (z-clipped, off-film) keep live params; PACK-aligned
    chunk reads evaluate up to PACK-1 'stranger' slots past a run's end.
    For the LAST anchor tile those strangers land in the sentinel-keyed
    sort tail, where invalid prims live — their table rows must be
    ZEROED or a clipped prim can win a pixel (found during the v6
    anchor-sort design review; no reference counterpart, the invariants
    are primitives.py's)."""

    def _soup(self):
        # One valid disc anchored in the LAST tile (bottom-right of the
        # 8x5 tile grid at 256x160) + 64 INVALID discs covering the same
        # pixels at half the depth.  Every invalid slot sorts into the
        # sentinel tail adjacent to the valid disc's 1-entry run.
        px, py = W - 12.0, H - 12.0
        n = 65
        params = np.zeros((n, 12), np.float32)
        params[:, 0] = px
        params[:, 1] = py
        params[:, 2] = 2.0  # invalid discs: closer
        params[0, 2] = 5.0  # the one valid disc: farther
        params[:, 3] = 6.0
        bbox = np.stack([params[:, 0] - 6, params[:, 0] + 6,
                         params[:, 1] - 6, params[:, 1] + 6], 1)
        valid = np.zeros((n,), bool)
        valid[0] = True
        return ScreenPrimitives(
            kind=jnp.full((n,), 0, jnp.int32),
            params=jnp.asarray(params),
            color=jnp.full((n, 3), 0.5, jnp.float32),
            valid=jnp.asarray(valid),
            bbox=jnp.asarray(bbox),
            normal=jnp.zeros((n, 3), jnp.float32),
        )

    def test_v3_invalid_tail_strangers_inert(self):
        from pointcloud_render_tpu.raster.pallas_csr3 import rasterize_pallas_csr3

        soup = self._soup()
        d_o, i_o = cpu_reference.rasterize_reference(to_host(soup), W, H)
        d_p, i_p = rasterize_pallas_csr3(soup, W, H, unroll=4,
                                         interpret=True)
        np.testing.assert_array_equal(np.asarray(i_p), i_o)
        np.testing.assert_array_equal(np.asarray(d_p), d_o)

    def test_v4_invalid_tail_strangers_inert(self):
        from pointcloud_render_tpu.raster.pallas_csr4 import rasterize_pallas_csr4

        soup = self._soup()
        d_o, i_o = cpu_reference.rasterize_reference(to_host(soup), W, H)
        d_p, i_p = rasterize_pallas_csr4(soup, W, H, unroll=4,
                                         interpret=True)
        np.testing.assert_array_equal(np.asarray(i_p), i_o)
        np.testing.assert_array_equal(np.asarray(d_p), d_o)

    def test_v5_invalid_tail_strangers_inert(self):
        from pointcloud_render_tpu.raster.pallas_csr5 import rasterize_pallas_csr5

        soup = self._soup()
        d_o, i_o = cpu_reference.rasterize_reference(to_host(soup), W, H)
        d_p, i_p = rasterize_pallas_csr5(soup, W, H, interpret=True)
        np.testing.assert_array_equal(np.asarray(i_p), i_o)
        np.testing.assert_array_equal(np.asarray(d_p), d_o)
