"""Tests: streaming z-merge, alpha compositing, advection trajectory scan."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloud_render_tpu.parallel.streaming import StreamingRasterizer
from pointcloud_render_tpu.raster import alpha, xla_tiled
from pointcloud_render_tpu.raster.primitives import discs_from_points
from pointcloud_render_tpu.raster.render import RasterConfig
from pointcloud_render_tpu.run.trajectory import TrajectoryScanRenderer
from pointcloud_render_tpu.scene import dynamics
from pointcloud_render_tpu.configs import PRESETS
from pointcloud_render_tpu.scene.camera import Camera

W, H = 256, 64


def make_camera():
    return Camera(origin=jnp.array([2.0, 2.0, 2.0], jnp.float32),
                  target=jnp.array([0.0, 0.0, -0.05], jnp.float32),
                  width=W, height=H)


class TestStreaming:
    def test_matches_single_pass(self):
        cam = make_camera()
        rng = np.random.default_rng(0)
        n = 1000
        pos = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
        sr = StreamingRasterizer(cam, chunk_points=256, radius_world=0.03,
                                 backend="tiled")
        depth_s, idx_s = sr.rasterize(
            pos[i:i + 256] for i in range(0, n, 256))

        prims = discs_from_points(pos, cam, jnp.full((n,), 0.03),
                                  np.array([0.3, 0.3, 0.3], np.float32))
        depth_1, idx_1 = xla_tiled.rasterize_tiled(prims, W, H)
        np.testing.assert_array_equal(np.asarray(idx_s), np.asarray(idx_1))
        hit = np.asarray(idx_1) >= 0
        assert hit.mean() > 0.05
        np.testing.assert_allclose(np.asarray(depth_s)[hit],
                                   np.asarray(depth_1)[hit], rtol=5e-7)

    def test_short_last_chunk_padding(self):
        cam = make_camera()
        rng = np.random.default_rng(1)
        pos = rng.uniform(-0.5, 0.5, (300, 3)).astype(np.float32)
        sr = StreamingRasterizer(cam, chunk_points=128, radius_world=0.03,
                                 backend="tiled")
        depth, idx = sr.rasterize([pos[:128], pos[128:256], pos[256:]])
        idx = np.asarray(idx)
        assert idx.max() < 300  # padding sentinels never win
        assert (idx >= 0).any()

    def test_max_big_knob_clears_overflow(self):
        """The big-list overflow RuntimeError tells the user to raise
        max_big — so the knob must exist on StreamingRasterizer and
        actually reach the kernel (review r3: it didn't)."""
        import pytest

        cam = make_camera()
        rng = np.random.default_rng(6)
        n = 1400  # > the 1024 default big list, all wide discs
        pos = rng.uniform(-0.4, 0.4, (n, 3)).astype(np.float32)
        sr = StreamingRasterizer(cam, chunk_points=n, radius_world=0.5,
                                 backend="pallas")
        with pytest.raises(RuntimeError, match="max_big"):
            sr.rasterize([pos])
        sr2 = StreamingRasterizer(cam, chunk_points=n, radius_world=0.5,
                                  backend="pallas", max_big=2048)
        d, i = sr2.rasterize([pos])
        assert (np.asarray(i) >= 0).any()

    def test_pallas_backend_capacity_assertion(self):
        """The pallas streaming path (v4 kernel) must match tiled
        winner-exactly AND
        raise loudly when a chunk's true entry count exceeds the
        configured capacity (the silent-truncation guard)."""
        import pytest

        cam = make_camera()
        rng = np.random.default_rng(2)
        n = 512
        pos = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
        sr = StreamingRasterizer(cam, chunk_points=256, radius_world=0.03,
                                 backend="pallas", entry_capacity=65536)
        d_s, i_s = sr.rasterize([pos[:256], pos[256:]])
        prims = discs_from_points(pos, cam, jnp.full((n,), 0.03),
                                  np.array([0.3, 0.3, 0.3], np.float32))
        d_1, i_1 = xla_tiled.rasterize_tiled(prims, W, H)
        np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_1))
        assert sr._max_entries > 0

        tiny = StreamingRasterizer(cam, chunk_points=256,
                                   radius_world=0.03, backend="pallas",
                                   entry_capacity=64)
        with pytest.raises(RuntimeError, match="entry_capacity"):
            tiny.rasterize([pos[:256]])

    def test_streamed_trail_scene_matches_monolithic(self):
        """A soup_fn streaming chunks of discs + velocity-trail capsules
        (the traj_ball primitive soup) == the monolithic v4 render of the
        concatenated soup, winner-exact, with capsule winners shaded by
        the shared trail-boost shader (VERDICT r2 item 7)."""
        from pointcloud_render_tpu.geometry.trails import velocity_trails
        from pointcloud_render_tpu.raster.pallas_csr4 import (
            rasterize_pallas_csr4,
        )
        from pointcloud_render_tpu.raster.primitives import (
            ScreenPrimitives,
            capsules_from_polylines,
        )
        from pointcloud_render_tpu.shading.shade import (
            ShadingConfig,
            shade_winner_attrs,
        )

        cam = make_camera()
        rng = np.random.default_rng(13)
        n, c = 512, 256
        pos = rng.uniform(-0.4, 0.4, (n, 3)).astype(np.float32)
        vel = (rng.normal(size=(n, 3)) * 3).astype(np.float32)
        green = np.array([0.2, 1.0, 0.4], np.float32)

        def soup_fn(p, colors, v):
            discs = discs_from_points(
                p, cam, jnp.full((p.shape[0],), 0.02, jnp.float32), colors)
            pts, ok = velocity_trails(p, v, jnp.int32(120))
            vv = jnp.broadcast_to(ok[:, None], pts.shape[:2])
            caps = capsules_from_polylines(pts, vv, cam, 0.003, green)
            return ScreenPrimitives.concatenate([discs, caps])

        sr = StreamingRasterizer(cam, chunk_points=c, radius_world=0.02,
                                 backend="pallas", soup_fn=soup_fn)
        d_s, i_s, attrs = sr.rasterize(
            [(pos[:c], np.broadcast_to(sr.color, (c, 3)), vel[:c]),
             (pos[c:], np.broadcast_to(sr.color, (c, 3)), vel[c:])],
            return_attrs=True)

        soup = ScreenPrimitives.concatenate([
            soup_fn(jnp.asarray(pos[:c]), jnp.broadcast_to(sr.color, (c, 3)),
                    jnp.asarray(vel[:c])),
            soup_fn(jnp.asarray(pos[c:]), jnp.broadcast_to(sr.color, (c, 3)),
                    jnp.asarray(vel[c:]))])
        d_1, i_1 = rasterize_pallas_csr4(soup, W, H, interpret=True)
        np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_1))
        hit = np.asarray(i_1) >= 0
        assert hit.mean() > 0.02
        kinds = np.asarray(soup.kind)[np.asarray(i_s)[hit]]
        assert (kinds == 1).any(), "no capsule winners streamed"
        # Shared-shader check: capsule pixels carry the flat trail boost.
        rgb = np.asarray(sr.resolve_rgb(d_s, i_s, attrs))
        cap_px = np.zeros_like(hit)
        cap_px[hit] = kinds == 1
        want = np.clip(green * ShadingConfig().trail_boost, 0, 1)
        np.testing.assert_allclose(rgb[cap_px],
                                   np.broadcast_to(want, rgb[cap_px].shape),
                                   atol=1e-6)
        assert shade_winner_attrs is not None

    def test_streamed_ground_triangles_shade_lambert(self):
        """A soup_fn that streams the ground (triangles) must shade
        triangle winners with face-normal Lambert like the monolithic
        shade_framebuffer — NOT the flat capsule trail boost (review
        r3: rflag used to lump every non-disc kind into the capsule
        branch)."""
        from pointcloud_render_tpu.raster.pallas_csr4 import (
            rasterize_pallas_csr4,
        )
        from pointcloud_render_tpu.raster.primitives import (
            KIND_TRIANGLE,
            ScreenPrimitives,
        )
        from pointcloud_render_tpu.raster.render import ground_plane
        from pointcloud_render_tpu.shading.shade import (
            ShadingConfig,
            shade_framebuffer,
        )

        cam = make_camera()
        rng = np.random.default_rng(5)
        n = 256
        pos = rng.uniform(-0.4, 0.4, (n, 3)).astype(np.float32)

        def soup_fn(p, colors):
            discs = discs_from_points(
                p, cam, jnp.full((p.shape[0],), 0.02, jnp.float32), colors)
            return ScreenPrimitives.concatenate(
                [ground_plane(cam, 10.0, (0.0, 0.0, -0.5)), discs])

        # Dim lighting so the ground does not clip to white — lambert
        # (~0.5x) and the old boost bug (1.5x) must be distinguishable.
        cfg = ShadingConfig(ambient=0.2, diffuse=0.3)
        sr = StreamingRasterizer(cam, chunk_points=n, radius_world=0.02,
                                 backend="pallas", soup_fn=soup_fn,
                                 shading=cfg)
        d, i, attrs = sr.rasterize(
            [(pos, np.broadcast_to(sr.color, (n, 3)))], return_attrs=True)
        rgb = np.asarray(sr.resolve_rgb(d, i, attrs))

        soup = soup_fn(jnp.asarray(pos),
                       jnp.broadcast_to(sr.color, (n, 3)))
        d1, i1 = rasterize_pallas_csr4(soup, W, H, interpret=True)
        rgb1 = np.asarray(shade_framebuffer(soup, cam, d1, i1, cfg))
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i1))
        idx = np.asarray(i)
        tri_px = np.zeros(idx.shape, bool)
        tri_px[idx >= 0] = (np.asarray(soup.kind)[idx[idx >= 0]]
                            == KIND_TRIANGLE)
        assert tri_px.any(), "no ground pixels in view"
        # Triangle pixels: bit-equal to the monolithic Lambert, and NOT
        # the boosted flat color the old code produced.
        np.testing.assert_array_equal(rgb[tri_px], rgb1[tri_px])
        boosted = np.clip(np.asarray(soup.color)[0] * cfg.trail_boost,
                          0, 1)
        assert not np.allclose(rgb[tri_px], boosted, atol=1e-3)
        # Disc-rim sqrt amplifies 1-ulp FMA differences (see above).
        np.testing.assert_allclose(rgb, rgb1, atol=5e-4)

    def test_streamed_rgb_matches_monolithic_shaded(self):
        """Per-point colors + winner attrs streamed in chunks == the
        monolithic render's shaded image (VERDICT r1 item 6)."""
        from pointcloud_render_tpu.raster.render import render
        from pointcloud_render_tpu.raster.primitives import ScreenPrimitives

        cam = make_camera()
        rng = np.random.default_rng(3)
        n = 1024
        pos = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
        col = rng.uniform(0.1, 1.0, (n, 3)).astype(np.float32)
        sr = StreamingRasterizer(cam, chunk_points=256, radius_world=0.03,
                                 backend="tiled")
        d, i, attrs = sr.rasterize(
            ((pos[k:k + 256], col[k:k + 256]) for k in range(0, n, 256)),
            return_attrs=True)
        rgb = np.asarray(sr.resolve_rgb(d, i, attrs))

        prims = discs_from_points(pos, cam, jnp.full((n,), 0.03), col)
        fb = render(prims, cam, RasterConfig(backend="tiled"))
        np.testing.assert_array_equal(np.asarray(i), np.asarray(fb.index))
        hit = np.asarray(fb.index) >= 0
        assert hit.mean() > 0.05
        # Disc-rim sqrt amplifies 1-ulp FMA differences (see test_parallel).
        np.testing.assert_allclose(rgb[hit], np.asarray(fb.rgb)[hit],
                                   atol=5e-4)

    def test_streaming_composes_with_point_mesh(self):
        """Streaming + ('points',) mesh: chunks sharded over 8 devices,
        result winner-exact vs single-device streaming."""
        from pointcloud_render_tpu.parallel.render_parallel import (
            make_render_mesh,
        )

        cam = make_camera()
        rng = np.random.default_rng(4)
        n = 2048
        pos = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
        mesh = make_render_mesh(1, 8)
        sr_m = StreamingRasterizer(cam, chunk_points=512, radius_world=0.03,
                                   backend="tiled", mesh=mesh)
        d_m, i_m = sr_m.rasterize(pos[k:k + 512] for k in range(0, n, 512))

        sr_1 = StreamingRasterizer(cam, chunk_points=512, radius_world=0.03,
                                   backend="tiled")
        d_1, i_1 = sr_1.rasterize(pos[k:k + 512] for k in range(0, n, 512))
        np.testing.assert_array_equal(np.asarray(i_m), np.asarray(i_1))
        hit = np.asarray(i_1) >= 0
        np.testing.assert_allclose(np.asarray(d_m)[hit],
                                   np.asarray(d_1)[hit], rtol=5e-7)


class TestShadows:
    def _scene(self, cam):
        from pointcloud_render_tpu.raster.render import ground_plane

        # One fat splat hovering above the ground, emitter overhead.
        disc = discs_from_points(
            jnp.asarray([[0.0, 0.0, 0.2]], jnp.float32), cam,
            jnp.full((1,), 0.15, jnp.float32),
            np.array([0.3, 0.3, 0.3], np.float32))
        from pointcloud_render_tpu.raster.primitives import ScreenPrimitives

        return ScreenPrimitives.concatenate(
            [ground_plane(cam, 3.0, (0, 0, -0.5)), disc])

    def _world_soup(self, camera):
        return self._scene(camera)

    def test_ground_darkens_under_occluder(self):
        """The light-view depth raster + shadow test darkens ground
        pixels beneath the splat (VERDICT r2 item 6) and leaves far
        ground fully lit; depth/index buffers are untouched."""
        from pointcloud_render_tpu.raster.render import RasterConfig, rasterize
        from pointcloud_render_tpu.shading.shade import (
            ShadingConfig,
            shade_framebuffer,
        )
        from pointcloud_render_tpu.shading.shadow import (
            light_camera,
            render_shadow_depth,
            shadow_factor,
        )
        from tests.test_raster import H, W, make_camera

        cam = make_camera()
        soup = self._scene(cam)
        lc = light_camera(size=256)
        soup_light = self._scene(lc)
        sdepth = render_shadow_depth(soup_light, lc)
        cfg = RasterConfig(backend="tiled", max_per_tile=512)
        depth, index = rasterize(soup, W, H, cfg)
        sf = shadow_factor(cam, depth, index, lc, sdepth)
        scfg = ShadingConfig()
        rgb_s = np.asarray(shade_framebuffer(soup, cam, depth, index, scfg,
                                             shadow=sf))
        rgb_0 = np.asarray(shade_framebuffer(soup, cam, depth, index, scfg))

        idx = np.asarray(index)
        kind = np.asarray(soup.kind)
        ground = (idx >= 0) & (kind[np.maximum(idx, 0)] == 2)
        sf_np = np.asarray(sf)
        shadowed = ground & (sf_np < 0.99)
        lit = ground & (sf_np > 0.99)
        assert shadowed.sum() > 50, "no shadowed ground pixels"
        assert lit.sum() > 1000, "no lit ground pixels"
        # Shadowed ground pixels got darker; lit ones are unchanged.
        assert (rgb_s[shadowed].mean() < rgb_0[shadowed].mean() - 0.05)
        np.testing.assert_array_equal(rgb_s[lit], rgb_0[lit])

    def test_shadow_determinism(self):
        """Same scene twice -> bit-identical shadowed images (no
        sampling anywhere in the pass)."""
        from pointcloud_render_tpu.raster.render import RasterConfig, rasterize
        from pointcloud_render_tpu.shading.shade import (
            ShadingConfig,
            shade_framebuffer,
        )
        from pointcloud_render_tpu.shading.shadow import (
            light_camera,
            render_shadow_depth,
            shadow_factor,
        )
        from tests.test_raster import H, W, make_camera

        cam = make_camera()
        outs = []
        for _ in range(2):
            soup = self._scene(cam)
            lc = light_camera(size=256)
            sdepth = render_shadow_depth(self._scene(lc), lc)
            cfg = RasterConfig(backend="tiled", max_per_tile=512)
            depth, index = rasterize(soup, W, H, cfg)
            sf = shadow_factor(cam, depth, index, lc, sdepth)
            outs.append(np.asarray(shade_framebuffer(
                soup, cam, depth, index, ShadingConfig(), shadow=sf)))
        np.testing.assert_array_equal(outs[0], outs[1])


class TestAA:
    def test_downsample_matches_reference(self):
        from pointcloud_render_tpu.shading import aa

        rng = np.random.default_rng(5)
        hi = rng.uniform(0, 1, (16, 24, 3)).astype(np.float32)
        for ss in (2, 3):
            got = np.asarray(aa.downsample(jnp.asarray(hi[:ss * 5, :ss * 6]),
                                           ss))
            want = aa.downsample_reference(hi[:ss * 5, :ss * 6], ss)
            np.testing.assert_allclose(got, want, atol=1e-5)

    def test_kernel_normalized(self):
        from pointcloud_render_tpu.shading import aa

        for ss in (2, 4):
            k = aa.gaussian_kernel(ss)
            assert abs(k.sum() - 1.0) < 1e-6
            # Reference rfilter support: radius 2 target px (= 4*stddev).
            assert k.shape == (4 * ss, 4 * ss)

    def test_kernel_matches_mitsuba_film_convolution(self):
        """Pin the filter against a direct NumPy evaluation of Mitsuba's
        gaussian rfilter (stddev 0.5, radius 2, per-axis offset
        truncation max(0, exp(-x^2/2s^2) - exp(-r^2/2s^2))) applied as a
        film convolution over the supersample texels (VERDICT r2 item 9;
        /root/reference/traj_ball_renderer.py:20-27)."""
        from pointcloud_render_tpu.shading import aa

        stddev, radius = 0.5, 2.0
        rng = np.random.default_rng(12)
        ss = 2
        h = w = 6
        hi = rng.uniform(0, 1, (h * ss, w * ss, 3)).astype(np.float32)

        def rfilter(x):
            return max(0.0, float(np.exp(-0.5 * (x / stddev) ** 2)
                                  - np.exp(-0.5 * (radius / stddev) ** 2)))

        want = np.zeros((h, w, 3), np.float32)
        for py in range(h):
            for px in range(w):
                acc = np.zeros(3)
                wsum = 0.0
                for ty in range(h * ss):
                    for tx in range(w * ss):
                        # Texel center in target-pixel coordinates.
                        dx = (tx + 0.5) / ss - (px + 0.5)
                        dy = (ty + 0.5) / ss - (py + 0.5)
                        if abs(dx) >= radius or abs(dy) >= radius:
                            continue
                        wgt = rfilter(dx) * rfilter(dy)
                        acc += wgt * hi[ty, tx]
                        wsum += wgt
                want[py, px] = acc / wsum
        got = np.asarray(aa.downsample(jnp.asarray(hi), ss))
        # Interior pixels see the full untruncated support; border pixels
        # differ by normalization policy (Mitsuba renormalizes per pixel,
        # the conv kernel pads with zeros), so pin the interior.
        np.testing.assert_allclose(got[2:-2, 2:-2], want[2:-2, 2:-2],
                                   atol=1e-5)

    def test_supersampled_pipeline_smooths_edges(self):
        """ss=2 produces intermediate values on disc edges; ss=1 keeps the
        hard single-sample contract (and identical winner buffers)."""
        from pointcloud_render_tpu.run.pipeline import _make_step
        from pointcloud_render_tpu.raster.render import RasterConfig

        preset = PRESETS["traj_ball"]
        rng = np.random.default_rng(6)
        n = 64
        pos = jnp.asarray(rng.uniform(-0.3, 0.3, (n, 3)), jnp.float32)
        vel = jnp.zeros((n, 3), jnp.float32)
        hist = jnp.zeros((0, n, 3), jnp.float32)
        rot = jnp.zeros((0, 4, 4), jnp.float32)
        fi = jnp.int32(0)

        def run(ss):
            step = _make_step(preset, RasterConfig(backend="tiled",
                                                   supersample=ss),
                              "capsule", True, False, False, film=(128, 64))
            return step(pos, vel, fi, hist, rot)[0]

        fb1, fb2 = run(1), run(2)
        assert fb1.rgb.shape == fb2.rgb.shape == (64, 128, 3)
        assert fb2.depth.shape == (64, 128)
        # ss=2 must introduce values strictly between splat color and
        # background on silhouette pixels (the point of the rfilter).
        gray1 = np.unique(np.round(np.asarray(fb1.rgb[..., 1]), 3)).size
        gray2 = np.unique(np.round(np.asarray(fb2.rgb[..., 1]), 3)).size
        assert gray2 > gray1 * 2, (gray1, gray2)
        # Winner buffers at target res exist and hit the same ballpark.
        assert fb2.index.shape == (64, 128)
        h1 = (np.asarray(fb1.index) >= 0).mean()
        h2 = (np.asarray(fb2.index) >= 0).mean()
        assert abs(h1 - h2) < 0.05


class TestAlpha:
    def test_tiled_matches_bruteforce(self):
        cam = make_camera()
        rng = np.random.default_rng(2)
        n = 400
        pos = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
        splats = alpha.splat_gaussians(
            pos, cam, jnp.full((n,), 0.04),
            rng.uniform(0.2, 1.0, (n, 3)).astype(np.float32),
            jnp.full((n,), 0.5))
        img_b = np.asarray(alpha.composite_bruteforce(splats, W, H))
        img_t = np.asarray(alpha.composite_tiled(splats, W, H))
        np.testing.assert_allclose(img_t, img_b, atol=2e-5)

    def test_order_independence(self):
        cam = make_camera()
        rng = np.random.default_rng(3)
        n = 200
        pos = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
        col = rng.uniform(0.2, 1.0, (n, 3)).astype(np.float32)
        perm = rng.permutation(n)
        a = alpha.splat_gaussians(pos, cam, jnp.full((n,), 0.05), col,
                                  jnp.full((n,), 0.7))
        b = alpha.splat_gaussians(pos[perm], cam, jnp.full((n,), 0.05),
                                  col[perm], jnp.full((n,), 0.7))
        img_a = np.asarray(alpha.composite_tiled(a, W, H))
        img_b = np.asarray(alpha.composite_tiled(b, W, H))
        np.testing.assert_allclose(img_a, img_b, atol=2e-5)

    def test_background_shows_through(self):
        cam = make_camera()
        splats = alpha.splat_gaussians(
            np.array([[0.0, 0.0, -0.05]], np.float32), cam,
            jnp.full((1,), 0.05), np.array([1.0, 0.0, 0.0], np.float32),
            jnp.full((1,), 0.9))
        img = np.asarray(alpha.composite_bruteforce(
            splats, W, H, background=(0.0, 0.0, 1.0)))
        # Far corners: pure background; center: red-dominant.
        np.testing.assert_allclose(img[0, 0], [0, 0, 1], atol=1e-6)
        assert img[H // 2, W // 2, 0] > 0.5


class TestDynamics:
    def test_advect(self):
        p = jnp.zeros((4, 3))
        v = jnp.ones((4, 3))
        np.testing.assert_allclose(np.asarray(dynamics.advect(p, v, 0.25)),
                                   0.25)

    def test_motion_colors_endpoints(self):
        v = np.array([[0, 0, 0], [20.0, 0, 0]], np.float32)
        c = np.asarray(dynamics.motion_colors(v))
        np.testing.assert_allclose(c[0], [0.2, 0.4, 1.0], atol=1e-6)
        np.testing.assert_allclose(c[1], [1.0, 0.3, 0.1], atol=1e-6)


class TestTrajectoryScan:
    def _small(self, monkeypatch):
        import pointcloud_render_tpu.scene.camera as cam_mod

        orig = cam_mod.Camera.__init__

        def patched(self, *a, **kw):
            kw.setdefault("width", 192)
            kw.setdefault("height", 104)
            orig(self, *a, **kw)

        monkeypatch.setattr(cam_mod.Camera, "__init__", patched)

    def test_static_flythrough(self, monkeypatch):
        self._small(monkeypatch)
        rng = np.random.default_rng(4)
        pos = rng.uniform(-0.4, 0.4, (64, 3)).astype(np.float32)
        vel = rng.normal(size=(64, 3)).astype(np.float32)
        tr = TrajectoryScanRenderer(
            PRESETS["traj_ball"],
            RasterConfig(backend="tiled", max_per_tile=256),
            frames_per_chunk=3)
        frames, final_pos = tr.render_frames(pos, vel, [0, 60, 120, 199])
        assert len(frames) == 4
        assert frames[0].dtype == np.uint8
        # The dolly-in makes the cloud occupy more pixels later.
        cover = [(f.min(axis=2) < 200).mean() for f in frames]
        assert cover[3] > cover[0]
        np.testing.assert_array_equal(np.asarray(final_pos), pos)  # dt=0

    def test_advected_cloud_moves(self, monkeypatch):
        self._small(monkeypatch)
        pos = np.array([[0.0, 0.0, 0.0]], np.float32)
        vel = np.array([[0.0, 0.0, 1.0]], np.float32)
        tr = TrajectoryScanRenderer(
            PRESETS["traj_original"],
            RasterConfig(backend="tiled", max_per_tile=256),
            dt=0.05, frames_per_chunk=4)
        frames, final_pos = tr.render_frames(pos, vel, [199, 199, 199, 199])
        np.testing.assert_allclose(np.asarray(final_pos)[0, 2], 0.2,
                                   atol=1e-6)
        # The splat should rise in the image as the point moves up (+z).
        def centroid_row(f):
            mask = f.min(axis=2) < 200
            rows = np.nonzero(mask.any(axis=1))[0]
            return rows.mean() if len(rows) else -1

        r0, r3 = centroid_row(frames[0]), centroid_row(frames[3])
        assert r0 > 0 and r3 > 0 and r3 < r0

    def test_chunk_padding_freezes_state(self, monkeypatch):
        """Padded scan steps (len(frames) % frames_per_chunk != 0)
        replay the last frame id with the carry FROZEN: the returned
        positions, the rolling trail history, and therefore the
        rendered frames must be identical whatever the chunk size
        (review r3: padding used to keep advecting, over-advancing the
        returned cloud by pad*dt and corrupting the next chunk's
        history)."""
        import dataclasses

        self._small(monkeypatch)
        rng = np.random.default_rng(7)
        pos = rng.uniform(-0.3, 0.3, (8, 3)).astype(np.float32)
        vel = (rng.normal(size=(8, 3)) * 0.5).astype(np.float32)
        preset = dataclasses.replace(PRESETS["traj"], trail_radius=0.01)

        def run(fpc):
            tr = TrajectoryScanRenderer(
                preset, RasterConfig(backend="tiled", max_per_tile=256),
                dt=0.05, frames_per_chunk=fpc, droplet_lod="capsule")
            return tr.render_frames(pos, vel, list(range(7)))

        f3, p3 = run(3)   # 7 % 3 -> last chunk pads 2 steps
        f7, p7 = run(7)   # exact multiple
        np.testing.assert_allclose(np.asarray(p3), pos + vel * (0.05 * 7),
                                   rtol=0, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(p3), np.asarray(p7))
        for a, b in zip(f3, f7):
            np.testing.assert_array_equal(a, b)

    def test_capacity_violation_is_loud(self, monkeypatch):
        """An UNPROBED frame that exceeds the fixed entry capacity must
        raise, not silently truncate (VERDICT r2 item 4): the scan
        carries the device-side running max of true_entry_count and the
        post-hoc certificate trips on it."""
        self._small(monkeypatch)
        rng = np.random.default_rng(4)
        pos = rng.uniform(-0.4, 0.4, (64, 3)).astype(np.float32)
        vel = rng.normal(size=(64, 3)).astype(np.float32)
        tr = TrajectoryScanRenderer(
            PRESETS["traj_ball"],
            RasterConfig(backend="pallas4", entry_capacity=8),
            frames_per_chunk=2)
        with pytest.raises(RuntimeError, match="entry capacity violated"):
            tr.render_frames(pos, vel, [0, 199])

    def test_motion_coloring(self, monkeypatch):
        self._small(monkeypatch)
        pos = np.array([[0.0, 0.0, 0.0]], np.float32)
        vel = np.array([[15.0, 0.0, 0.0]], np.float32)  # fast -> red
        tr = TrajectoryScanRenderer(
            PRESETS["traj_original"],
            RasterConfig(backend="tiled", max_per_tile=256),
            motion_color=True, frames_per_chunk=1)
        frames, _ = tr.render_frames(pos, vel, [199])
        f = frames[0]
        mask = f.min(axis=2) < 180
        assert mask.any()
        mean = f[mask].mean(axis=0)
        assert mean[0] > mean[2]  # red-dominant splat


class TestFaultToleranceResume:
    def test_batch_resumes_after_injected_failure(self, tmp_path, monkeypatch):
        from pointcloud_render_tpu.run import batch as batch_mod
        from pointcloud_render_tpu.run.batch import run_batch
        from pointcloud_render_tpu.run.metrics import MetricsSink
        from pointcloud_render_tpu.run.pipeline import FramePipeline
        from pointcloud_render_tpu.io import ply as plyio
        import pointcloud_render_tpu.scene.camera as cam_mod
        import os

        orig_init = cam_mod.Camera.__init__

        def patched(self, *a, **kw):
            kw.setdefault("width", 192)
            kw.setdefault("height", 104)
            orig_init(self, *a, **kw)

        monkeypatch.setattr(cam_mod.Camera, "__init__", patched)

        preset = PRESETS["traj_ball"]
        inp, out = str(tmp_path / "in"), str(tmp_path / "out")
        os.makedirs(inp)
        rng = np.random.default_rng(7)
        pos = rng.uniform(-1, 1, (40, 3)).astype(np.float32)
        vel = rng.normal(size=(40, 3)).astype(np.float32)
        for f in (0, 1, 2):
            plyio.write_ply(os.path.join(inp, preset.frame_file(f)), pos,
                            velocities=vel)

        pipeline = FramePipeline(preset, RasterConfig(backend="tiled",
                                                      max_per_tile=256))
        real = FramePipeline.render_array

        def flaky(self, pcl, fi, history=None):
            if fi == 1:
                raise RuntimeError("injected device fault")
            return real(self, pcl, fi, history)

        monkeypatch.setattr(FramePipeline, "render_array", flaky)
        sink = run_batch(preset, input_folder=inp, output_folder=out,
                         frames=[0, 1, 2], pipeline=pipeline,
                         sink=MetricsSink(quiet=True))
        assert sink.summary()["frames_ok"] == 2
        assert sink.summary()["frames_failed"] == 1

        # Heal the fault; resume renders ONLY the missing frame.
        monkeypatch.setattr(FramePipeline, "render_array", real)
        sink2 = run_batch(preset, input_folder=inp, output_folder=out,
                          frames=[0, 1, 2], pipeline=pipeline,
                          sink=MetricsSink(quiet=True))
        assert sink2.summary()["frames_ok"] == 1
        assert os.path.exists(
            os.path.join(out, preset.frame_file(1)[:-4] + ".png"))


class TestDifferentiability:
    def test_alpha_compositing_grad_flows_to_positions(self):
        """The alpha path is differentiable end-to-end — usable for
        gradient-based point-cloud optimization (new capability; the
        reference's Mitsuba path is external and opaque)."""
        cam = make_camera()
        rng = np.random.default_rng(5)
        pos = jnp.asarray(rng.uniform(-0.3, 0.3, (50, 3)), jnp.float32)

        def loss(p):
            splats = alpha.splat_gaussians(
                p, cam, jnp.full((50,), 0.05),
                np.array([1.0, 0.2, 0.2], np.float32), jnp.full((50,), 0.8))
            img = alpha.composite_bruteforce(splats, W, H)
            return jnp.sum(img[:, :, 0])  # push red coverage

        g = jax.grad(loss)(pos)
        g = np.asarray(g)
        assert np.isfinite(g).all()
        assert (np.abs(g) > 0).any()


class TestCameraPath:
    def test_reference_paths_equivalent(self):
        from pointcloud_render_tpu.scene import camera as cam_mod
        from pointcloud_render_tpu.scene.camera_path import REFERENCE_PATHS

        for name, path in REFERENCE_PATHS.items():
            for f in [0, 19, 100, 199, 200, 210, 219]:
                expect = cam_mod.camera_origin(name, f)
                got = path.origin(f)
                np.testing.assert_allclose(got, expect, atol=1e-12)
                traced = np.asarray(path.origin_jax(jnp.int32(f)))
                np.testing.assert_allclose(traced, expect, atol=1e-5)

    def test_multi_segment_custom_path(self):
        from pointcloud_render_tpu.scene.camera_path import CameraPath

        p = CameraPath(waypoints=((0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 2)),
                       segment_frames=(10, 10, 10))
        assert p.total_frames == 31
        np.testing.assert_allclose(p.origin(0), (0, 0, 1))
        np.testing.assert_allclose(p.origin(15), (1, 0.5, 1))
        np.testing.assert_allclose(p.origin(30), (0, 1, 2))
        np.testing.assert_allclose(np.asarray(p.origin_jax(jnp.int32(15))),
                                   (1, 0.5, 1), atol=1e-6)

    def test_catmull_smooth_passes_waypoints(self):
        from pointcloud_render_tpu.scene.camera_path import CameraPath

        p = CameraPath(waypoints=((0, 0, 0), (1, 1, 0), (2, 0, 0)),
                       segment_frames=(10, 10), interpolation="catmull")
        np.testing.assert_allclose(p.origin(10), (1, 1, 0), atol=1e-12)
        # midpoint bulges beyond the straight chord (smoothness)
        mid = np.asarray(p.origin(5))
        assert mid[1] > 0.5 - 1e-9

    def test_camera_object(self):
        from pointcloud_render_tpu.scene.camera_path import CameraPath

        p = CameraPath(waypoints=((2, 2, 2),), segment_frames=())
        cam = p.camera(0, width=128, height=64)
        assert cam.width == 128
        np.testing.assert_allclose(np.asarray(cam.origin), (2, 2, 2))

    def test_zero_segment_rejected(self):
        from pointcloud_render_tpu.scene.camera_path import CameraPath

        with pytest.raises(ValueError, match="positive"):
            CameraPath(waypoints=((0, 0, 0), (1, 1, 1), (2, 2, 2)),
                       segment_frames=(0, 20))


class TestVideoAndObj:
    def test_gif_roundtrip(self, tmp_path):
        from PIL import Image

        from pointcloud_render_tpu.run.video import write_gif

        frames = [np.full((16, 24, 3), v, np.uint8) for v in (0, 128, 255)]
        path = write_gif(str(tmp_path / "a.gif"), frames, fps=10)
        img = Image.open(path)
        assert getattr(img, "n_frames", 1) == 3

    def test_obj_roundtrip_droplet(self, tmp_path):
        from pointcloud_render_tpu.geometry.droplet import droplet_mesh
        from pointcloud_render_tpu.io.obj import read_obj, write_obj

        v, f = droplet_mesh()
        path = str(tmp_path / "d.obj")
        write_obj(path, v, f)
        v2, f2 = read_obj(path)
        np.testing.assert_allclose(v2, v, atol=1e-6)
        np.testing.assert_array_equal(f2, f)

    def test_obj_quads_and_slashes(self, tmp_path):
        from pointcloud_render_tpu.io.obj import read_obj

        p = tmp_path / "q.obj"
        p.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
                     "f 1/1/1 2/2/2 3/3/3 4/4/4\n")
        v, f = read_obj(str(p))
        assert v.shape == (4, 3)
        np.testing.assert_array_equal(f, [[0, 1, 2], [0, 2, 3]])


class TestHistoryTrailScan:
    def test_rolling_history_trails_grow(self, monkeypatch):
        """traj preset on the scan renderer: rolling history buffer in the
        scan state (SURVEY §7 build plan item 5) — trails appear as real
        motion accumulates, with no preload pass."""
        import pointcloud_render_tpu.scene.camera as cam_mod

        orig = cam_mod.Camera.__init__

        def patched(self, *a, **kw):
            kw.setdefault("width", 192)
            kw.setdefault("height", 104)
            orig(self, *a, **kw)

        monkeypatch.setattr(cam_mod.Camera, "__init__", patched)

        import dataclasses

        pos = np.array([[0.0, 0.0, 0.0]], np.float32)
        vel = np.array([[0.0, 0.0, 2.0]], np.float32)
        # Fatten the hair-thin reference trail so it resolves on the tiny
        # test film (0.0007 world is sub-pixel at 192x104).
        preset = dataclasses.replace(PRESETS["traj"], trail_radius=0.01)
        tr = TrajectoryScanRenderer(
            preset, RasterConfig(backend="tiled", max_per_tile=256),
            dt=0.02, frames_per_chunk=5, droplet_lod="capsule")
        frames, final_pos = tr.render_frames(pos, vel, list(range(10)))
        assert len(frames) == 10

        def green_px(f):
            # history-trail pixels: saturated green, dimmer red
            # (trail color (0.2,1,0.4)*boost -> sRGB ~ (140, 255, 186))
            return ((f[:, :, 1] > 200) & (f[:, :, 0] < 160)).sum()

        # Frame 0: degenerate history (all duplicates) -> no trail;
        # later frames: the advected point leaves a growing trail.
        assert green_px(frames[0]) == 0
        assert green_px(frames[9]) > 20
        np.testing.assert_allclose(np.asarray(final_pos)[0, 2], 0.4,
                                   atol=1e-6)


class TestPenumbraAndGGX:
    """Round-4 look passes: PCSS penumbra + the GGX ground lobe
    (VERDICT r3 item 7).  Both rgb-only; depth/index untouched."""

    def _scene(self, cam, disc_z):
        from pointcloud_render_tpu.raster.primitives import ScreenPrimitives
        from pointcloud_render_tpu.raster.render import ground_plane

        disc = discs_from_points(
            np.array([[0.0, 0.0, disc_z]], np.float32), cam,
            np.array([0.25], np.float32),
            np.array([0.3, 0.3, 0.3], np.float32))
        return ScreenPrimitives.concatenate(
            [ground_plane(cam, 3.0, (0, 0, -0.5)), disc])

    def _shadow_softness(self, disc_z):
        """Fraction of the occluder's shadow pixels that are PARTIALLY
        lit (penumbra) on an overhead view of the ground."""
        from pointcloud_render_tpu.raster.render import RasterConfig, rasterize
        from pointcloud_render_tpu.scene.camera import Camera
        from pointcloud_render_tpu.shading.shadow import (
            light_camera,
            render_shadow_depth,
            shadow_factor,
        )
        from tests.test_raster import H, W

        cam = Camera(origin=jnp.array([0.8, 0.8, 2.5], jnp.float32),
                     target=jnp.array([0.0, 0.0, -0.5], jnp.float32),
                     width=W, height=H)
        soup = self._scene(cam, disc_z)
        lc = light_camera(size=256)
        sdepth = render_shadow_depth(self._scene(lc, disc_z), lc)
        cfg = RasterConfig(backend="tiled", max_per_tile=512)
        depth, index = rasterize(soup, W, H, cfg)
        sf = np.asarray(shadow_factor(cam, depth, index, lc, sdepth))
        affected = sf < 0.999
        partial = (sf < 0.999) & (sf > 0.4)
        assert affected.sum() > 30, "no shadow cast at all"
        return partial.sum() / affected.sum()

    def test_penumbra_widens_with_blocker_gap(self):
        """PCSS: a HIGHER occluder (bigger blocker-receiver gap) casts a
        SOFTER shadow — more partially-lit pixels relative to its shadow
        area.  The fixed 2x2 PCF could not do this."""
        near = self._shadow_softness(-0.25)  # hovering just off ground
        far = self._shadow_softness(0.6)     # high above ground
        assert far > near + 0.05, (near, far)

    def test_ggx_adds_ground_highlight_rgb_only(self):
        from pointcloud_render_tpu.raster.render import RasterConfig, rasterize
        from pointcloud_render_tpu.scene.camera import Camera
        from pointcloud_render_tpu.shading.shade import (
            ShadingConfig,
            shade_framebuffer,
        )
        from tests.test_raster import H, W

        # Camera looking steeply down: ground points beneath it see the
        # mirror direction of the overhead key -> a visible lobe.
        cam = Camera(origin=jnp.array([0.3, 0.3, 2.5], jnp.float32),
                     target=jnp.array([0.0, 0.0, -0.5], jnp.float32),
                     width=W, height=H)
        soup = self._scene(cam, 0.1)
        cfg = RasterConfig(backend="tiled", max_per_tile=512)
        depth, index = rasterize(soup, W, H, cfg)
        rgb0 = np.asarray(shade_framebuffer(soup, cam, depth, index,
                                            ShadingConfig()))
        rgb1 = np.asarray(shade_framebuffer(
            soup, cam, depth, index, ShadingConfig(ground_spec=1.0)))
        idx = np.asarray(index)
        kind = np.asarray(soup.kind)
        ground = (idx >= 0) & (kind[np.maximum(idx, 0)] == 2)
        gain = (rgb1 - rgb0)[..., 0]
        # The roughplastic energy split visibly reshades the ground
        # (coat transmission < 1 away from the lobe)...
        assert gain[ground].min() < -0.005
        # ...nothing changes anywhere else.
        assert np.all(gain[~ground] == 0.0)
        # Grazing-angle falloff: the far (grazing-view) ground rows
        # darken MORE than the rows beneath the camera (Schlick F grows
        # toward grazing) — the path-traced look's radial gradient.
        rows = np.nonzero(ground.any(axis=1))[0]
        top, bot = rows[: len(rows) // 4], rows[-len(rows) // 4:]
        mean_top = gain[top][ground[top]].mean()    # far = image top
        mean_bot = gain[bot][ground[bot]].mean()    # near = image bottom
        assert mean_top < mean_bot - 0.002, (mean_top, mean_bot)

    def test_gi_fill_lights_splat_undersides_rgb_only(self):
        """ShadingConfig.gi approximates the reference's path-traced
        bounce light (VERDICT r4 #8): downward-facing disc-winner
        pixels BRIGHTEN (white-ground re-radiation), upward-facing disc
        pixels and every non-disc pixel are untouched, and depth/index
        never change (rgb-only by construction)."""
        from pointcloud_render_tpu.raster.render import RasterConfig, rasterize
        from pointcloud_render_tpu.scene.camera import Camera
        from pointcloud_render_tpu.shading.shade import (
            ShadingConfig,
            shade_framebuffer,
        )
        from tests.test_raster import H, W

        # Camera slightly BELOW the disc center so underside pixels
        # (downward-facing sphere normals) are visible.
        cam = Camera(origin=jnp.array([1.2, 1.2, -0.1], jnp.float32),
                     target=jnp.array([0.0, 0.0, 0.3], jnp.float32),
                     width=W, height=H)
        soup = self._scene(cam, 0.3)
        cfg = RasterConfig(backend="tiled", max_per_tile=512)
        depth, index = rasterize(soup, W, H, cfg)
        rgb0 = np.asarray(shade_framebuffer(soup, cam, depth, index,
                                            ShadingConfig()))
        rgb1 = np.asarray(shade_framebuffer(
            soup, cam, depth, index, ShadingConfig(gi=0.5)))
        idx = np.asarray(index)
        kind = np.asarray(soup.kind)
        disc = (idx >= 0) & (kind[np.maximum(idx, 0)] == 0)
        gain = (rgb1 - rgb0).sum(axis=-1)
        # Some disc pixels brighten (the underside)...
        assert (gain[disc] > 1e-4).sum() > 10
        # ...no pixel darkens, and nothing outside discs changes.
        assert gain.min() >= 0.0
        assert np.all(gain[~disc] == 0.0)

    def test_gi_determinism_and_pipeline_depth_index(self):
        """gi > 0 routes the pipeline through the re-shade branch: the
        depth/index contract is bit-identical to gi=0, and the shaded
        rgb is invariant under point-order permutation."""
        from pointcloud_render_tpu.configs import PRESETS
        from pointcloud_render_tpu.raster.render import RasterConfig
        from pointcloud_render_tpu.run.pipeline import _make_step
        from pointcloud_render_tpu.shading.shade import ShadingConfig
        from tests.test_raster import H, W

        preset = PRESETS["traj_ball"]
        rng = np.random.default_rng(5)
        pos = rng.uniform(-0.4, 0.4, (64, 3)).astype(np.float32)
        vel = (rng.normal(size=(64, 3)) * 2).astype(np.float32)
        placeholder = jnp.zeros((0,), jnp.float32)

        def run(gi, p, v):
            cfg = RasterConfig(backend="tiled", max_per_tile=4096,
                               shading=ShadingConfig(gi=gi))
            step = _make_step(preset, cfg, "capsule", True, False, False,
                              film=(W, H))
            return step(jnp.asarray(p), jnp.asarray(v), jnp.int32(120),
                        placeholder, placeholder)

        fb0, _, _ = run(0.0, pos, vel)
        fb1, _, _ = run(0.4, pos, vel)
        np.testing.assert_array_equal(np.asarray(fb0.index),
                                      np.asarray(fb1.index))
        np.testing.assert_array_equal(np.asarray(fb0.depth),
                                      np.asarray(fb1.depth))
        assert np.any(np.asarray(fb0.rgb) != np.asarray(fb1.rgb))
        # Permutation invariance of the lit image (same scene, shuffled
        # point order -> identical rgb).
        perm = rng.permutation(64)
        fb2, _, _ = run(0.4, pos[perm], vel[perm])
        np.testing.assert_array_equal(np.asarray(fb1.rgb),
                                      np.asarray(fb2.rgb))

    def test_ggx_pipeline_branch_keeps_depth_index(self):
        """ground_spec > 0 routes the pipeline through the re-shade
        branch: same depth/index as the fused path, rgb re-lit."""
        from pointcloud_render_tpu.configs import PRESETS
        from pointcloud_render_tpu.raster.render import RasterConfig
        from pointcloud_render_tpu.run.pipeline import _make_step
        from pointcloud_render_tpu.shading.shade import ShadingConfig
        from tests.test_raster import H, W

        preset = PRESETS["traj_ball"]
        rng = np.random.default_rng(3)
        pos = jnp.asarray(rng.uniform(-0.4, 0.4, (64, 3)), jnp.float32)
        vel = jnp.asarray(rng.normal(size=(64, 3)) * 2, jnp.float32)
        placeholder = jnp.zeros((0,), jnp.float32)

        def run(spec):
            cfg = RasterConfig(backend="tiled", max_per_tile=4096,
                               shading=ShadingConfig(ground_spec=spec))
            step = _make_step(preset, cfg, "capsule", True, False, False,
                              film=(W, H))
            return step(pos, vel, jnp.int32(120), placeholder, placeholder)

        fb0, _, _ = run(0.0)
        fb1, _, _ = run(0.8)
        np.testing.assert_array_equal(np.asarray(fb0.index),
                                      np.asarray(fb1.index))
        np.testing.assert_array_equal(np.asarray(fb0.depth),
                                      np.asarray(fb1.depth))
        assert not np.array_equal(np.asarray(fb0.rgb), np.asarray(fb1.rgb))
