"""Interpret-mode CI coverage for the pallas_csr5 chunk-binned kernel.

v5 requires spatial (Morton) order for performance but must stay EXACT
for any input: these tests pin the lexicographic (depth, id) winner
contract against the CPU oracle — including cross-chunk exact depth
ties, unordered clouds (everything routed to the big list), capacity
prefixes, mixed soups (capsules/triangles big-listed), and the fused
in-kernel shading against shading.shade_framebuffer.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pointcloud_render_tpu.raster import cpu_reference
from pointcloud_render_tpu.raster.pallas_csr5 import (
    bin_diagnostics5,
    rasterize_pallas_csr5,
    render_shaded_csr5,
    true_entry_count5,
)
from pointcloud_render_tpu.raster.primitives import (
    ScreenPrimitives,
    capsules_from_polylines,
    discs_from_points,
)
from pointcloud_render_tpu.raster.render import ground_plane
from pointcloud_render_tpu.scene.spatial import morton_codes, spatial_sort
from pointcloud_render_tpu.shading.shade import ShadingConfig, shade_framebuffer

from tests.test_raster import (
    H,
    W,
    assert_buffers_match,
    make_camera,
    to_host,
)


def _sorted_cloud(n=600, seed=3, ties=0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    if ties:
        # Exact duplicates placed FAR APART in the array so the Morton
        # sort puts them in the same cell but (usually) different
        # chunks' neighborhoods — still exact depth ties on screen.
        pos[n - ties:] = pos[:ties]
    pos, _ = spatial_sort(pos)
    return pos


def _soup(cam, pos, radius=0.02, with_ground=True, colors=None):
    n = pos.shape[0]
    c = np.array([0.3, 0.3, 0.3], np.float32) if colors is None else colors
    discs = discs_from_points(jnp.asarray(pos), cam,
                              jnp.full((n,), radius, jnp.float32), c)
    parts = [ground_plane(cam, 10.0, (0, 0, -0.5))] if with_ground else []
    return ScreenPrimitives.concatenate(parts + [discs])


class TestRasterV5:
    def test_sorted_discs_match_oracle(self):
        cam = make_camera()
        soup = _soup(cam, _sorted_cloud())
        d_o, i_o = cpu_reference.rasterize_reference(to_host(soup), W, H)
        d_p, i_p, diag = rasterize_pallas_csr5(soup, W, H, interpret=True,
                                               return_diag=True)
        assert (np.asarray(i_o) >= 0).mean() > 0.05
        assert int(np.asarray(diag["big_overflow"])) == 0
        assert_buffers_match(d_o, i_o, d_p, i_p, "csr5 sorted discs",
                             exact_depth=False, depth_rtol=2e-5)

    def test_discs_only_bit_exact(self):
        # Without the (big-listed, FMA-sensitive) ground triangles the
        # winner DEPTH must be bit-exact: binned disc z rides the rows
        # untouched.
        cam = make_camera()
        soup = _soup(cam, _sorted_cloud(), with_ground=False)
        d_o, i_o = cpu_reference.rasterize_reference(to_host(soup), W, H)
        d_p, i_p = rasterize_pallas_csr5(soup, W, H, interpret=True)
        assert_buffers_match(d_o, i_o, d_p, i_p, "csr5 discs bit-exact")

    def test_cross_chunk_depth_ties(self):
        cam = make_camera()
        soup = _soup(cam, _sorted_cloud(ties=60), radius=0.03)
        d_o, i_o = cpu_reference.rasterize_reference(to_host(soup), W, H)
        d_p, i_p = rasterize_pallas_csr5(soup, W, H, interpret=True)
        assert_buffers_match(d_o, i_o, d_p, i_p, "csr5 ties",
                             exact_depth=False, depth_rtol=2e-5)

    def test_order_independence(self):
        # Reversing chunk order within the soup permutes ids; rendering
        # the reversed soup must equal the oracle on the SAME soup.
        cam = make_camera()
        pos = _sorted_cloud()[::-1].copy()
        soup = _soup(cam, pos)
        d_o, i_o = cpu_reference.rasterize_reference(to_host(soup), W, H)
        d_p, i_p = rasterize_pallas_csr5(soup, W, H, interpret=True)
        assert_buffers_match(d_o, i_o, d_p, i_p, "csr5 reversed",
                             exact_depth=False, depth_rtol=2e-5)

    def test_unsorted_cloud_rides_singleton_spill(self):
        # A shuffled cloud has huge chunk bboxes -> every disc SPILLS to
        # a per-prim singleton row (own 2x2 span) and stays EXACT with a
        # tiny big list (only the ground triangles ride big).
        cam = make_camera()
        rng = np.random.default_rng(11)
        pos = rng.uniform(-0.5, 0.5, (200, 3)).astype(np.float32)
        soup = _soup(cam, pos)
        assert int(np.asarray(bin_diagnostics5(soup, W, H,
                                               max_big=8))) == 0
        d_o, i_o = cpu_reference.rasterize_reference(to_host(soup), W, H)
        d_p, i_p = rasterize_pallas_csr5(soup, W, H, interpret=True,
                                         max_big=8)
        assert_buffers_match(d_o, i_o, d_p, i_p, "csr5 unsorted spill",
                             exact_depth=False, depth_rtol=2e-5)

    def test_spill_cap_overflow_goes_big(self):
        # Beyond max_spill, discs fall through to the big list — and
        # past max_big the overflow diagnostic counts them loudly.
        cam = make_camera()
        rng = np.random.default_rng(12)
        pos = rng.uniform(-0.5, 0.5, (200, 3)).astype(np.float32)
        soup = _soup(cam, pos)
        d_o, i_o = cpu_reference.rasterize_reference(to_host(soup), W, H)
        # Tiny spill, big list takes the rest: still exact.
        d_p, i_p = rasterize_pallas_csr5(soup, W, H, interpret=True,
                                         max_spill=16)
        assert_buffers_match(d_o, i_o, d_p, i_p, "csr5 spill cap",
                             exact_depth=False, depth_rtol=2e-5)
        # Tiny spill AND tiny big list: overflow counted, not silent.
        assert int(np.asarray(bin_diagnostics5(
            soup, W, H, max_spill=16, max_big=8))) > 0

    def test_entry_capacity_prefix(self):
        cam = make_camera()
        soup = _soup(cam, _sorted_cloud())
        ec = int(np.asarray(true_entry_count5(soup, W, H)))
        assert ec > 0
        d_u, i_u = rasterize_pallas_csr5(soup, W, H, interpret=True)
        d_c, i_c, diag = rasterize_pallas_csr5(
            soup, W, H, entry_capacity=ec, interpret=True, return_diag=True)
        assert int(np.asarray(diag["true_entries"])) == ec
        assert_buffers_match(d_u, i_u, d_c, i_c, "csr5 capacity")

    def test_mixed_soup_capsules_big(self):
        cam = make_camera()
        rng = np.random.default_rng(8)
        pts = rng.uniform(-0.4, 0.4, size=(25, 5, 3)).astype(np.float32)
        caps = capsules_from_polylines(
            jnp.asarray(pts), np.ones((25, 5), bool), cam, 0.003,
            np.array([0.2, 1.0, 0.4], np.float32))
        soup = ScreenPrimitives.concatenate(
            [ground_plane(cam, 10.0, (0, 0, -0.5)),
             discs_from_points(jnp.asarray(_sorted_cloud(n=300)), cam,
                               jnp.full((300,), 0.02, jnp.float32),
                               np.array([0.3, 0.3, 0.3], np.float32)),
             caps])
        d_o, i_o = cpu_reference.rasterize_reference(to_host(soup), W, H)
        d_p, i_p = rasterize_pallas_csr5(soup, W, H, interpret=True)
        assert_buffers_match(d_o, i_o, d_p, i_p, "csr5 mixed",
                             exact_depth=False, depth_rtol=2e-5)

    @pytest.mark.parametrize("chunk_rows,check_every,unroll,max_span,k",
                             [(8, 1, 1, 2, 16), (16, 4, 4, 4, 16),
                              (16, 2, 2, 4, 8), (8, 2, 1, 2, 4)])
    def test_knob_sweep_exact(self, chunk_rows, check_every, unroll,
                              max_span, k):
        cam = make_camera()
        soup = _soup(cam, _sorted_cloud(n=400))
        d_o, i_o = cpu_reference.rasterize_reference(to_host(soup), W, H)
        d_p, i_p = rasterize_pallas_csr5(
            soup, W, H, interpret=True, chunk_rows=chunk_rows,
            check_every=check_every, unroll=unroll, max_span=max_span,
            k=k)
        assert_buffers_match(d_o, i_o, d_p, i_p,
                             f"csr5 knobs {chunk_rows}/{check_every}/{unroll}",
                             exact_depth=False, depth_rtol=2e-5)


class TestShadedV5:
    def _reference_rgb(self, soup, cam, cfg, d, i):
        return np.asarray(shade_framebuffer(soup, cam, d, i, cfg))

    @pytest.mark.parametrize("mode", ["lambert", "flat"])
    def test_fused_shading_matches_xla(self, mode):
        cam = make_camera()
        rng = np.random.default_rng(5)
        colors = rng.uniform(0.1, 0.9, (500, 3)).astype(np.float32)
        soup = _soup(cam, _sorted_cloud(n=500, seed=9), colors=colors)
        cfg = ShadingConfig(mode=mode)
        rgb, d, i = render_shaded_csr5(soup, cam, cfg, interpret=True)
        d_o, i_o = cpu_reference.rasterize_reference(to_host(soup), W, H)
        assert_buffers_match(d_o, i_o, d, i, f"csr5 shaded {mode}",
                             exact_depth=False, depth_rtol=2e-5)
        ref = self._reference_rgb(soup, cam, cfg, d, i)
        np.testing.assert_allclose(np.asarray(rgb), ref, atol=2e-6,
                                   err_msg=f"csr5 fused rgb {mode}")

    def test_uniform_color_path(self):
        cam = make_camera()
        soup = _soup(cam, _sorted_cloud(n=500, seed=9))
        cfg = ShadingConfig()
        rgb_u, d_u, i_u = render_shaded_csr5(
            soup, cam, cfg, interpret=True, uniform_color=(0.3, 0.3, 0.3))
        rgb_g, d_g, i_g = render_shaded_csr5(soup, cam, cfg, interpret=True)
        assert_buffers_match(d_g, i_g, d_u, i_u, "csr5 uniform winners")
        np.testing.assert_array_equal(np.asarray(rgb_u), np.asarray(rgb_g))


class TestSpatial:
    def test_morton_locality(self):
        rng = np.random.default_rng(0)
        pos = rng.uniform(-1, 1, (4096, 3)).astype(np.float32)
        srt, order = spatial_sort(pos)
        # Sorted neighbors are much closer on average than unsorted.
        d_sorted = np.linalg.norm(np.diff(srt, axis=0), axis=1).mean()
        d_raw = np.linalg.norm(np.diff(pos, axis=0), axis=1).mean()
        assert d_sorted < 0.25 * d_raw
        assert sorted(order.tolist()) == list(range(4096))

    def test_codes_monotone_per_axis(self):
        line = np.zeros((8, 3), np.float32)
        line[:, 0] = np.arange(8)
        codes = morton_codes(line, bits=3)
        assert (np.diff(codes.astype(np.int64)) > 0).all()

    def test_nonfinite_safe(self):
        pos = np.array([[0, 0, 0], [np.nan, 1, 1], [np.inf, 0, 1]],
                       np.float32)
        codes = morton_codes(pos)
        assert codes.shape == (3,)
