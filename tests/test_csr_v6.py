"""Interpret-mode CI coverage for the pallas_csr6 anchor-sorted kernel.

v6 shares v4's eval and contract (winner = lexicographic min of
(depth, id), exact for every kind mix) but bins with ONE sort slot per
prim and streams five contiguous CSR ranges per tile — these tests pin
the range decomposition against the oracle and against v4, including
the cases that stress it: spill-heavy radii, tile-boundary anchors,
exact ties across ranges, grid-edge tiles, and the per-range early-exit
jump.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pointcloud_render_tpu.raster import cpu_reference
from pointcloud_render_tpu.raster.pallas_csr4 import (
    rasterize_pallas_csr4,
    true_entry_count4,
)
from pointcloud_render_tpu.raster.pallas_csr6 import (
    bin_diagnostics6,
    rasterize_pallas_csr6,
    render_shaded_csr6,
)
from pointcloud_render_tpu.raster.primitives import (
    ScreenPrimitives,
    capsules_from_polylines,
    discs_from_points,
)
from pointcloud_render_tpu.raster.render import ground_plane

from tests.test_raster import (
    H,
    W,
    make_camera,
    random_cloud_prims,
    to_host,
)


def _screen_discs(px, py, z, r):
    """Screen-space discs with EXACT pixel placement (no camera) — for
    tests that need a prim in a specific tile/class at a chosen depth."""
    from pointcloud_render_tpu.raster.primitives import KIND_DISC

    px, py, z, r = (np.asarray(a, np.float32) for a in (px, py, z, r))
    n = px.shape[0]
    params = np.zeros((n, 12), np.float32)
    params[:, 0], params[:, 1], params[:, 2], params[:, 3] = px, py, z, r
    bbox = np.stack([px - r, px + r, py - r, py + r], axis=1)
    return ScreenPrimitives(
        kind=jnp.full((n,), KIND_DISC, jnp.int32),
        params=jnp.asarray(params),
        color=jnp.full((n, 3), 0.3, jnp.float32),
        valid=jnp.ones((n,), bool),
        bbox=jnp.asarray(bbox),
        normal=jnp.zeros((n, 3), jnp.float32),
    )


def _mixed_soup(cam, n=400, trails=30, seed=7, radius=0.025):
    rng = np.random.default_rng(seed)
    discs = random_cloud_prims(cam, n=n, radius=radius, seed=seed)
    pts = rng.uniform(-0.4, 0.4, size=(trails, 5, 3)).astype(np.float32)
    caps = capsules_from_polylines(
        jnp.asarray(pts), np.ones((trails, 5), bool), cam, 0.003,
        np.array([0.2, 1.0, 0.4], np.float32))
    return ScreenPrimitives.concatenate(
        [ground_plane(cam, 10.0, (0, 0, -0.5)), discs, caps])


def _assert_matches_oracle(soup, depth_rtol=2e-5, **kw):
    d_o, i_o = cpu_reference.rasterize_reference(to_host(soup), W, H)
    assert (i_o >= 0).any(), "empty render — the comparison is vacuous"
    d_p, i_p = rasterize_pallas_csr6(soup, W, H, interpret=True, **kw)
    np.testing.assert_array_equal(np.asarray(i_p), i_o)
    hit = np.isfinite(d_o)
    np.testing.assert_allclose(np.asarray(d_p)[hit], d_o[hit],
                               rtol=depth_rtol)


class TestPallasCsr6:
    def test_mixed_scene_matches_oracle(self):
        _assert_matches_oracle(_mixed_soup(make_camera()))

    def test_no_exit_matches_oracle(self):
        _assert_matches_oracle(_mixed_soup(make_camera()), allow_exit=False)

    def test_spill_heavy_radii(self):
        # ~2-tile radii make most discs class 1/2/3 — every range live.
        _assert_matches_oracle(
            _mixed_soup(make_camera(), n=250, radius=0.08, seed=11))

    def test_exact_depth_ties_keep_lowest_id(self):
        cam = make_camera()
        rng = np.random.default_rng(3)
        pos = rng.uniform(-0.5, 0.5, (300, 3)).astype(np.float32)
        pos[40:80] = pos[:40]  # duplicated discs -> exact depth ties
        discs = discs_from_points(jnp.asarray(pos), cam,
                                  jnp.full((300,), 0.03, jnp.float32),
                                  np.array([0.3, 0.3, 0.3], np.float32))
        soup = ScreenPrimitives.concatenate(
            [ground_plane(cam, 10.0, (0, 0, -0.5)), discs])
        _assert_matches_oracle(soup)

    def test_order_permutation_invariance(self):
        # Permuting primitive order changes ids but not the image (the
        # per-pair tie-break is shared with v4; exact-duplicate ties
        # are pinned against the oracle in the dedicated tie test —
        # under relabeling a tie legitimately picks a different label
        # of the same geometry, so this scene has no duplicates).
        cam = make_camera()
        rng = np.random.default_rng(5)
        pos = rng.uniform(-0.5, 0.5, (200, 3)).astype(np.float32)
        perm = rng.permutation(200)
        a = discs_from_points(jnp.asarray(pos), cam,
                              jnp.full((200,), 0.03, jnp.float32),
                              np.array([0.3, 0.3, 0.3], np.float32))
        b = discs_from_points(jnp.asarray(pos[perm]), cam,
                              jnp.full((200,), 0.03, jnp.float32),
                              np.array([0.3, 0.3, 0.3], np.float32))
        d_a, i_a = rasterize_pallas_csr6(a, W, H, interpret=True)
        d_b, i_b = rasterize_pallas_csr6(b, W, H, interpret=True)
        i_a, i_b = np.asarray(i_a), np.asarray(i_b)
        np.testing.assert_array_equal(np.asarray(d_a), np.asarray(d_b))
        hit = i_a >= 0
        np.testing.assert_array_equal(
            np.where(hit, perm[i_b.clip(0)], -1), np.where(hit, i_a, -1))

    def test_wide_discs_ride_big_list_and_overflow_is_loud(self):
        cam = make_camera()
        rng = np.random.default_rng(9)
        pos = rng.uniform(-0.3, 0.3, (40, 3)).astype(np.float32)
        wide = discs_from_points(jnp.asarray(pos), cam,
                                 jnp.full((40,), 0.5, jnp.float32),
                                 np.array([0.8, 0.2, 0.2], np.float32))
        soup = ScreenPrimitives.concatenate(
            [ground_plane(cam, 10.0, (0, 0, -0.5)), wide])
        _assert_matches_oracle(soup, max_big=64)
        ovf = int(np.asarray(bin_diagnostics6(soup, W, H, max_big=8)))
        assert ovf > 0  # 2 ground tris + 40 wide discs > 8

    def test_matches_v4_on_mixed_scene(self):
        soup = _mixed_soup(make_camera(), seed=13)
        d_4, i_4 = rasterize_pallas_csr4(soup, W, H, interpret=True)
        d_6, i_6 = rasterize_pallas_csr6(soup, W, H, interpret=True)
        np.testing.assert_array_equal(np.asarray(i_6), np.asarray(i_4))
        np.testing.assert_array_equal(np.asarray(d_6), np.asarray(d_4))

    def test_diag_true_entries_matches_v4(self):
        soup = _mixed_soup(make_camera(), seed=17)
        _, _, diag = rasterize_pallas_csr6(soup, W, H, interpret=True,
                                           return_diag=True)
        tc4 = int(np.asarray(true_entry_count4(soup, W, H)))
        assert int(np.asarray(diag["true_entries"])) == tc4
        assert int(np.asarray(diag["big_overflow"])) == 0

    def test_bin_triangles_mesh_lod(self):
        from pointcloud_render_tpu.geometry.droplet import droplet_mesh
        from pointcloud_render_tpu.raster.primitives import (
            triangles_from_mesh,
        )

        cam = make_camera()
        verts, faces = droplet_mesh()
        rng = np.random.default_rng(2)
        parts = [ground_plane(cam, 10.0, (0, 0, -0.5))]
        for k in range(6):
            c = rng.uniform(-0.3, 0.3, 3).astype(np.float32)
            parts.append(triangles_from_mesh(
                np.asarray(verts) * 4.0 + c, np.asarray(faces), cam,
                np.array([0.2, 0.5, 0.9], np.float32)))
        soup = ScreenPrimitives.concatenate(parts)
        # Triangle-dense soup: edge-function cancellation near edges
        # reaches ~2.4e-5 relative vs the oracle (winners are exact) —
        # cf. the v4 bin_triangles test.  Against v4 (shared row body)
        # the buffers must be BIT-equal.
        _assert_matches_oracle(soup, bin_triangles=True, depth_rtol=5e-5)
        d_4, i_4 = rasterize_pallas_csr4(soup, W, H, interpret=True,
                                         bin_triangles=True)
        d_6, i_6 = rasterize_pallas_csr6(soup, W, H, interpret=True,
                                         bin_triangles=True)
        np.testing.assert_array_equal(np.asarray(i_6), np.asarray(i_4))
        np.testing.assert_array_equal(np.asarray(d_6), np.asarray(d_4))

    def test_fused_shading_matches_v4(self):
        from pointcloud_render_tpu.raster.pallas_csr4 import (
            render_shaded_csr4,
        )
        from pointcloud_render_tpu.shading.shade import ShadingConfig

        cam = make_camera()
        soup = _mixed_soup(cam, seed=21)
        cfg = ShadingConfig()
        rgb4, d4, i4, _ = render_shaded_csr4(soup, cam, cfg,
                                             interpret=True,
                                             return_diag=True)
        rgb6, d6, i6, diag = render_shaded_csr6(soup, cam, cfg,
                                                interpret=True,
                                                return_diag=True)
        np.testing.assert_array_equal(np.asarray(i6), np.asarray(i4))
        np.testing.assert_array_equal(np.asarray(rgb6), np.asarray(rgb4))
        assert int(np.asarray(diag["big_overflow"])) == 0

    def test_single_dense_tile(self):
        # Everything lands on a handful of tiles: deep per-range chunk
        # loops + early-exit jumps inside one range.
        cam = make_camera()
        rng = np.random.default_rng(4)
        pos = np.concatenate([
            rng.uniform(-0.02, 0.02, (500, 2)),
            rng.uniform(-0.5, 0.5, (500, 1)),
        ], axis=1).astype(np.float32)
        discs = discs_from_points(jnp.asarray(pos), cam,
                                  jnp.full((500,), 0.01, jnp.float32),
                                  np.array([0.3, 0.3, 0.3], np.float32))
        _assert_matches_oracle(ScreenPrimitives.concatenate([discs]))

    @pytest.mark.parametrize("tile_w", [16, 64, 128])
    def test_pixel_block_mappings(self, tile_w):
        _assert_matches_oracle(_mixed_soup(make_camera(), n=150),
                               tile_h=1024 // tile_w, tile_w=tile_w)

    def test_sparse_tiles_cross_tile_prefetch(self):
        """Empty/non-empty tile alternation stresses the cross-tile
        chunk-0 prefetch predicates (a step must start its right
        neighbor's first DMA iff the neighbor has chunks, and skip its
        own start iff its left neighbor started it).  Discs cluster in
        a checkerboard of tiles; every other tile is empty."""
        rng = np.random.default_rng(8)
        pxs, pys = [], []
        for tyy in range(H // 32):
            for txx in range(W // 32):
                if (txx + tyy) % 2 == 0:
                    continue  # empty tile
                pxs.append(rng.uniform(txx * 32 + 3, txx * 32 + 29, 40))
                pys.append(rng.uniform(tyy * 32 + 3, tyy * 32 + 29, 40))
        px = np.concatenate(pxs)
        py = np.concatenate(pys)
        n = px.shape[0]
        soup = _screen_discs(px, py, rng.uniform(1.0, 5.0, n),
                             np.full(n, 2.0))
        _assert_matches_oracle(soup, allow_exit=False)
        _assert_matches_oracle(soup, allow_exit=False, dma_slots=4)
        # Empty tiles inside a fused program stress the per-g prefetch
        # predicates (a live tile must not wait on a chunk its empty
        # left neighbor never started).
        _assert_matches_oracle(soup, allow_exit=False, tiles_per_program=4)

    def test_tiles_per_program_grid_fusion(self):
        """Grid fusion (several tiles per pallas program) must be
        BIT-identical to the one-tile grid: same walk, same DMA ring,
        outputs indexed by the in-program tile.  tpp=4 divides the
        40-tile test grid; tpp=7 exercises the padded tail (grid 6,
        2 skipped pad tiles whose output rows are sliced away)."""
        soup = _mixed_soup(make_camera(), seed=13, radius=0.05)
        d1, i1 = rasterize_pallas_csr6(soup, W, H, interpret=True,
                                       allow_exit=False)
        for tpp in (4, 7):
            d, i = rasterize_pallas_csr6(soup, W, H, interpret=True,
                                         allow_exit=False,
                                         tiles_per_program=tpp)
            np.testing.assert_array_equal(np.asarray(i), np.asarray(i1))
            np.testing.assert_array_equal(np.asarray(d), np.asarray(d1))
        with pytest.raises(ValueError, match="tiles_per_program"):
            rasterize_pallas_csr6(soup, W, H, interpret=True,
                                  allow_exit=True, tiles_per_program=2)

    def test_resident_big_list_matches_streamed(self):
        """max_big <= one DMA chunk rides the constant-index SMEM block
        (fetched once for the grid); larger big lists stream per tile.
        Both must produce BIT-equal buffers."""
        soup = _mixed_soup(make_camera(), seed=31, radius=0.06)
        d_r, i_r = rasterize_pallas_csr6(soup, W, H, interpret=True,
                                         max_big=64)  # one chunk
        d_s, i_s = rasterize_pallas_csr6(soup, W, H, interpret=True,
                                         max_big=1024)  # streamed
        np.testing.assert_array_equal(np.asarray(i_r), np.asarray(i_s))
        np.testing.assert_array_equal(np.asarray(d_r), np.asarray(d_s))

    def test_exit_does_not_skip_cross_class_prims(self):
        """Regression: the early exit must not fire across a CLASS
        boundary.  One anchor holds >256 far cls-0 discs followed (in
        sorted order) by one NEAR x-spill disc; a big-list disc at a
        middle depth sets the tile's dmax between them.  A merged
        own-anchor range would exit after the first (far, high-bucket)
        chunk and skip the near disc — the z-bucket ascent RESETS at
        the class boundary, so exit-on kernels must walk single-class
        segments."""
        rng = np.random.default_rng(0)
        n_far = 300
        mid = _screen_discs([128.0], [80.0], [1.0], [400.0])  # big list
        far = _screen_discs(rng.uniform(68, 92, n_far),
                            rng.uniform(68, 92, n_far),
                            rng.uniform(5.0, 6.0, n_far),
                            np.full(n_far, 2.0))
        # Crosses x=96 (anchored with the far discs, x-spill class),
        # in FRONT of the mid disc: must win its pixels.
        near = _screen_discs([95.5], [80.0], [0.5], [2.0])
        soup = ScreenPrimitives.concatenate([mid, far, near])
        _assert_matches_oracle(soup, allow_exit=True)
        _assert_matches_oracle(soup, allow_exit=False)

    def test_invalid_tail_strangers_inert(self):
        from tests.test_csr_v2_v3 import TestInvalidStrangerSoundness

        soup = TestInvalidStrangerSoundness()._soup()
        _assert_matches_oracle(soup)

    def test_render_dispatch_backend_pallas6(self):
        from pointcloud_render_tpu.raster.render import (
            RasterConfig,
            render,
        )

        cam = make_camera()
        soup = _mixed_soup(cam, seed=23)
        fb4, diag4 = render(soup, cam, RasterConfig(backend="pallas4"),
                            return_diag=True)
        fb6, diag6 = render(soup, cam, RasterConfig(backend="pallas6"),
                            return_diag=True)
        np.testing.assert_array_equal(np.asarray(fb6.index),
                                      np.asarray(fb4.index))
        np.testing.assert_array_equal(np.asarray(fb6.rgb),
                                      np.asarray(fb4.rgb))
        assert int(np.asarray(diag6["big_overflow"])) == 0

    def test_cap_rows10_matches_oracle_both_spans(self):
        """Narrow 10-float capsule rows (12 per 128-lane row, exit off,
        tri-less binned stream): winners bit-identical to the oracle at
        both spans — the eval reads the same 10 operands in the same
        f32 expression order as the 16-float rows."""
        soup = _mixed_soup(make_camera(), n=300, trails=40, seed=17)
        _assert_matches_oracle(soup, cap_rows10=True)
        _assert_matches_oracle(soup, cap_rows10=True, span=4)

    def test_cap_rows10_knob_matrix_bit_identical(self):
        """tpp / dma ring / chunk rounding (256 -> 252) on the cap10
        walk: pure perf levers, winners unchanged."""
        soup = _mixed_soup(make_camera(), n=300, trails=40, seed=19)
        base = rasterize_pallas_csr6(soup, W, H, cap_rows10=True,
                                     interpret=True)
        hit = np.isfinite(np.asarray(base[0]))
        for kw in (dict(tiles_per_program=4),
                   dict(dma_slots=4, chunk_rows=96),
                   dict(span=4, tiles_per_program=2)):
            d, i = rasterize_pallas_csr6(soup, W, H, cap_rows10=True,
                                         interpret=True, **kw)
            np.testing.assert_array_equal(np.asarray(i),
                                          np.asarray(base[1]))
            # Depth at FMA-contraction tolerance: different compiles
            # may fuse z0 + sdz*t differently (suite convention).
            np.testing.assert_allclose(np.asarray(d)[hit],
                                       np.asarray(base[0])[hit],
                                       rtol=2e-6)

    def test_exit_off_i16_keys_match_exit_on(self):
        """Exit-off binning drops the z-bucket bits (int16 keys when
        the grid fits, no zlb pass) — winners must match the exit-on
        int32-key walk and the oracle (z order within a range is
        irrelevant under the per-pair tie-break)."""
        from pointcloud_render_tpu.raster.pallas_csr6 import _key_layout

        assert _key_layout(2040, 2, False) == (np.int16, 0)
        assert _key_layout(2040, 4, False) == (np.int16, 0)
        assert _key_layout(2040, 2, True)[0] == np.int32
        # 16k tiles x 4 classes overflows int16 -> unshifted int32.
        assert _key_layout(16384, 2, False) == (np.int32, 0)
        soup = _mixed_soup(make_camera(), n=300, trails=40, seed=29)
        d_on, i_on = rasterize_pallas_csr6(soup, W, H, allow_exit=True,
                                           interpret=True)
        d_off, i_off = rasterize_pallas_csr6(soup, W, H, allow_exit=False,
                                             interpret=True)
        np.testing.assert_array_equal(np.asarray(i_off), np.asarray(i_on))
        _assert_matches_oracle(soup, allow_exit=False,
                               starts_method="sort")

    def test_three_tone_shade_bit_equal(self):
        """three_tone (per-kind-constant shade, no O(P) preshade pass)
        reproduces the preshade-table path bit-for-bit on a soup whose
        colors are constant per kind — the trail/droplet preset shape.
        Reps come from derive_three_tone (the shared bench helper),
        whose certificate must hold on this soup."""
        from pointcloud_render_tpu.raster.pallas_csr6 import (
            derive_three_tone,
        )
        from pointcloud_render_tpu.shading.shade import ShadingConfig

        cam = make_camera()
        soup = _mixed_soup(cam, n=250, trails=35, seed=37)
        reps_d, ok = derive_three_tone(soup)
        assert bool(np.asarray(ok))
        reps = tuple(int(v) for v in np.asarray(reps_d))
        cfg = ShadingConfig()
        rgb_a, d_a, i_a = render_shaded_csr6(soup, cam, cfg,
                                             interpret=True,
                                             allow_exit=False)
        rgb_b, d_b, i_b = render_shaded_csr6(soup, cam, cfg,
                                             interpret=True,
                                             cap_rows10=True,
                                             three_tone=reps)
        np.testing.assert_array_equal(np.asarray(i_b), np.asarray(i_a))
        np.testing.assert_array_equal(np.asarray(rgb_b),
                                      np.asarray(rgb_a))

    def test_derive_three_tone_rejects_varied_colors(self):
        """The device-side certificate is what keeps three_tone inside
        the tuned-file contract: a soup whose disc colors are NOT all
        equal must come back ok=False (bench then falls back to the
        always-exact preshade path)."""
        import dataclasses

        from pointcloud_render_tpu.raster.pallas_csr6 import (
            derive_three_tone,
        )
        from pointcloud_render_tpu.raster.primitives import KIND_DISC

        soup = _mixed_soup(make_camera(), n=50, trails=5)
        _, ok = derive_three_tone(soup)
        assert bool(np.asarray(ok))
        colors = np.asarray(soup.color).copy()
        kind = np.asarray(soup.kind)
        last_disc = int(np.where(kind == KIND_DISC)[0][-1])
        colors[last_disc] = [0.9, 0.1, 0.1]
        varied = dataclasses.replace(soup, color=jnp.asarray(colors))
        _, ok2 = derive_three_tone(varied)
        assert not bool(np.asarray(ok2))

    def test_four_tone_shade_bit_equal_on_droplet_soup(self):
        """The 5-tuple four-tone form (two contiguous capsule color
        runs — the droplet presets' tail-capsules-then-trails shape)
        reproduces the preshade path bit-for-bit, on the REAL traj_vel
        soup builder."""
        from pointcloud_render_tpu.configs import PRESETS
        from pointcloud_render_tpu.raster.pallas_csr6 import (
            derive_four_tone,
            derive_three_tone,
        )
        from pointcloud_render_tpu.run.pipeline import build_primitives
        from pointcloud_render_tpu.shading.shade import ShadingConfig

        cam = make_camera()
        rng = np.random.default_rng(11)
        n = 120
        pos = jnp.asarray(rng.uniform(-0.4, 0.4, (n, 3)), jnp.float32)
        vel = jnp.asarray(rng.normal(size=(n, 3)) * 2, jnp.float32)
        soup = build_primitives(PRESETS["traj_vel"], cam, pos, vel,
                                jnp.int32(120))
        # Two capsule colors (tail + trail) -> three_tone refuses,
        # four_tone certifies.
        _, ok3 = derive_three_tone(soup)
        assert not bool(np.asarray(ok3))
        vals_d, ok4 = derive_four_tone(soup)
        assert bool(np.asarray(ok4))
        vals = tuple(int(v) for v in np.asarray(vals_d))
        kind = np.asarray(soup.kind)
        assert kind[vals[1]] == 1 and kind[vals[2]] == 1
        assert vals[1] < vals[3] <= vals[2]
        cfg = ShadingConfig()
        rgb_a, d_a, i_a = render_shaded_csr6(soup, cam, cfg,
                                             interpret=True,
                                             allow_exit=False)
        rgb_b, d_b, i_b = render_shaded_csr6(soup, cam, cfg,
                                             interpret=True,
                                             three_tone=vals)
        np.testing.assert_array_equal(np.asarray(i_b), np.asarray(i_a))
        np.testing.assert_array_equal(np.asarray(rgb_b),
                                      np.asarray(rgb_a))
        # Both capsule runs must actually win pixels for the equality
        # to mean anything.
        i = np.asarray(i_a)
        hit_ids = i[i >= 0]
        caps = hit_ids[kind[hit_ids] == 1]
        assert (caps < vals[3]).any() and (caps >= vals[3]).any()

    def test_derive_four_tone_rejects_three_capsule_colors(self):
        import dataclasses

        from pointcloud_render_tpu.raster.pallas_csr6 import (
            derive_four_tone,
        )
        from pointcloud_render_tpu.raster.primitives import KIND_CAPSULE

        soup = _mixed_soup(make_camera(), n=50, trails=8)
        _, ok = derive_four_tone(soup)
        assert bool(np.asarray(ok))  # one capsule color: degenerate ok
        colors = np.asarray(soup.color).copy()
        kind = np.asarray(soup.kind)
        cap_ids = np.where(kind == KIND_CAPSULE)[0]
        colors[cap_ids[len(cap_ids) // 2]] = [0.9, 0.1, 0.1]
        colors[cap_ids[-1]] = [0.1, 0.1, 0.9]
        varied = dataclasses.replace(soup, color=jnp.asarray(colors))
        _, ok3 = derive_four_tone(varied)
        assert not bool(np.asarray(ok3))

    def test_three_tone_excludes_uniform_look(self):
        from pointcloud_render_tpu.shading.shade import ShadingConfig

        soup = _mixed_soup(make_camera(), n=50, trails=5)
        with pytest.raises(ValueError, match="exclusive"):
            render_shaded_csr6(soup, make_camera(), ShadingConfig(),
                               interpret=True, three_tone=(0, 1, 2),
                               uniform_look=((0.3,) * 3, (1.0,) * 3))

    def test_cap_rows10_rejects_incompatible_modes(self):
        soup = _mixed_soup(make_camera(), n=50, trails=5)
        with pytest.raises(ValueError, match="discs_only"):
            rasterize_pallas_csr6(soup, W, H, cap_rows10=True,
                                  discs_only=True, interpret=True)
        with pytest.raises(ValueError, match="triangle"):
            rasterize_pallas_csr6(soup, W, H, cap_rows10=True,
                                  bin_triangles=True, interpret=True)
        with pytest.raises(ValueError, match="allow_exit"):
            rasterize_pallas_csr6(soup, W, H, cap_rows10=True,
                                  allow_exit=True, interpret=True)

    def test_render_config_tunable_knobs_bit_identical(self):
        """The sweep-tunable RasterConfig knobs (chunk_rows, allow_exit,
        starts_method — filled from tuned_defaults.json by bench.py) are
        pure perf levers: every value must produce the same winners."""
        from pointcloud_render_tpu.raster.render import (
            RasterConfig,
            render,
        )

        cam = make_camera()
        soup = _mixed_soup(cam, seed=31)
        base = render(soup, cam, RasterConfig(backend="pallas6"))
        for cfg in (RasterConfig(backend="pallas6", chunk_rows=512),
                    RasterConfig(backend="pallas6", allow_exit=True),
                    RasterConfig(backend="pallas6", allow_exit=False),
                    RasterConfig(backend="pallas6", starts_method="sort"),
                    RasterConfig(backend="pallas6", cap_rows10=True),
                    RasterConfig(backend="pallas6", cap_rows10=True,
                                 tiles_per_program=2),
                    RasterConfig(backend="pallas6", chunk_rows=512,
                                 allow_exit=False, starts_method="sort",
                                 dma_slots=4)):
            fb = render(soup, cam, cfg)
            np.testing.assert_array_equal(np.asarray(fb.index),
                                          np.asarray(base.index))
            np.testing.assert_array_equal(np.asarray(fb.rgb),
                                          np.asarray(base.rgb))


class TestPallasCsr6DiscMode:
    """discs_only=True narrows binned rows to 8 floats (capsules AND
    triangles ride the big list) — the disc-cloud fast path."""

    def _disc_soup(self, ties=0, n=300, radius=0.03):
        cam = make_camera()
        rng = np.random.default_rng(3)
        pos = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
        if ties:
            pos[ties:2 * ties] = pos[:ties]
        discs = discs_from_points(jnp.asarray(pos), cam,
                                  jnp.full((n,), radius, jnp.float32),
                                  np.array([0.3, 0.3, 0.3], np.float32))
        return ScreenPrimitives.concatenate(
            [ground_plane(cam, 10.0, (0, 0, -0.5)), discs])

    def test_disc_mode_matches_oracle_with_ties(self):
        _assert_matches_oracle(self._disc_soup(ties=40), discs_only=True)

    def test_disc_mode_capsules_ride_big_list(self):
        # The mixed soup's capsules must still render exactly (big list).
        _assert_matches_oracle(_mixed_soup(make_camera(), trails=10),
                               discs_only=True)

    def test_disc_mode_matches_generic_v6(self):
        soup = self._disc_soup(ties=25)
        d_g, i_g = rasterize_pallas_csr6(soup, W, H, interpret=True)
        d_d, i_d = rasterize_pallas_csr6(soup, W, H, interpret=True,
                                         discs_only=True)
        np.testing.assert_array_equal(np.asarray(i_d), np.asarray(i_g))
        np.testing.assert_array_equal(np.asarray(d_d), np.asarray(d_g))

    def test_disc_mode_fused_shading(self):
        from pointcloud_render_tpu.raster.pallas_csr6 import (
            render_shaded_csr6,
        )
        from pointcloud_render_tpu.shading.shade import ShadingConfig

        cam = make_camera()
        soup = self._disc_soup()
        cfg = ShadingConfig()
        rgb_g, d_g, i_g = render_shaded_csr6(soup, cam, cfg,
                                             interpret=True)
        rgb_d, d_d, i_d = render_shaded_csr6(soup, cam, cfg,
                                             interpret=True,
                                             discs_only=True)
        np.testing.assert_array_equal(np.asarray(i_d), np.asarray(i_g))
        np.testing.assert_array_equal(np.asarray(rgb_d), np.asarray(rgb_g))

    def test_uniform_look_matches_generic(self):
        """The uniform_look + discs_only combination rides the FUSED
        (u, v) path (kernel carries the winner's lambert coordinates,
        gather-free epilogue) — it must match the generic by-id gather
        shade to FMA-contraction tolerance, big-list (ground) pixels
        and background included."""
        from pointcloud_render_tpu.raster.pallas_csr6 import (
            render_shaded_csr6,
        )
        from pointcloud_render_tpu.shading.shade import ShadingConfig

        cam = make_camera()
        soup = self._disc_soup()
        cfg = ShadingConfig()
        rgb_g, d_g, i_g = render_shaded_csr6(soup, cam, cfg,
                                             interpret=True,
                                             discs_only=True)
        rgb_u, d_u, i_u = render_shaded_csr6(
            soup, cam, cfg, interpret=True, discs_only=True,
            uniform_look=((0.3, 0.3, 0.3), (1.0, 1.0, 1.0)))
        np.testing.assert_array_equal(np.asarray(i_u), np.asarray(i_g))
        np.testing.assert_array_equal(np.asarray(d_u), np.asarray(d_g))
        np.testing.assert_allclose(np.asarray(rgb_u), np.asarray(rgb_g),
                                   atol=2e-6)

    def test_fused_uv_exact_ties_and_big_marker(self):
        """Fused (u, v) merge keeps the per-pair (depth, id) contract:
        duplicated discs (exact z ties) and a big wide disc overlapping
        binned discs must produce the oracle winners, with the big
        winner's pixels taking the second tone."""
        from pointcloud_render_tpu.raster.pallas_csr6 import (
            render_shaded_csr6,
        )
        from pointcloud_render_tpu.shading.shade import ShadingConfig

        cam = make_camera()
        rng = np.random.default_rng(3)
        pos = rng.uniform(-0.5, 0.5, (300, 3)).astype(np.float32)
        pos[40:80] = pos[:40]  # exact depth ties
        discs = discs_from_points(jnp.asarray(pos), cam,
                                  jnp.full((300,), 0.03, jnp.float32),
                                  np.array([0.3, 0.3, 0.3], np.float32))
        # Big-list (wide) LAMBERT discs must keep tone-1 lighting in
        # the fused path — the uniform premise: every lambert disc has
        # the tone-1 color.
        wide = discs_from_points(jnp.asarray(pos[:2] * 0.2), cam,
                                 jnp.full((2,), 0.4, jnp.float32),
                                 np.array([0.3, 0.3, 0.3], np.float32))
        soup = ScreenPrimitives.concatenate([wide, discs])
        cfg = ShadingConfig()
        look = ((0.3, 0.3, 0.3), (1.0, 1.0, 1.0))
        rgb_u, d_u, i_u = render_shaded_csr6(soup, cam, cfg,
                                             interpret=True,
                                             discs_only=True,
                                             uniform_look=look)
        rgb_g, d_g, i_g = render_shaded_csr6(soup, cam, cfg,
                                             interpret=True,
                                             discs_only=True)
        d_o, i_o = cpu_reference.rasterize_reference(to_host(soup), W, H)
        np.testing.assert_array_equal(np.asarray(i_u), i_o)
        np.testing.assert_allclose(np.asarray(rgb_u), np.asarray(rgb_g),
                                   atol=2e-6)


class TestPallasCsr6Span4:
    """span=4 binning: prims covering up to 4x4 tiles bin (16 classes,
    generated ranges) instead of flooding the big list — the close-
    dolly trail-segment mode."""

    def _long_capsule_soup(self):
        cam = make_camera()
        rng = np.random.default_rng(3)
        base = rng.uniform(-0.4, 0.4, (60, 1, 3))
        steps = rng.normal(size=(60, 3, 3)) * 0.25
        pts = (base + np.cumsum(steps, axis=1)).astype(np.float32)
        caps = capsules_from_polylines(
            jnp.asarray(pts), np.ones((60, 3), bool), cam, 0.004,
            np.array([0.2, 1.0, 0.4], np.float32))
        return ScreenPrimitives.concatenate(
            [ground_plane(cam, 10.0, (0, 0, -0.5)), caps])

    def test_span4_bins_what_span2_overflows(self):
        soup = self._long_capsule_soup()
        ov2 = int(np.asarray(bin_diagnostics6(soup, W, H, max_big=16,
                                              span=2)))
        ov4 = int(np.asarray(bin_diagnostics6(soup, W, H, max_big=16,
                                              span=4)))
        assert ov2 > 0 and ov4 == 0

    def test_span4_long_capsules_match_oracle(self):
        _assert_matches_oracle(self._long_capsule_soup(), span=4)

    def test_span4_mixed_spill_heavy(self):
        _assert_matches_oracle(
            _mixed_soup(make_camera(), n=250, radius=0.08, seed=11),
            span=4)

    def test_span8_bins_what_span4_overflows(self):
        """span=8 (64 classes, same generated ranges) serves the
        1-2-segment trail mode whose fade-frame capsules pass 128 px —
        measured 26k span-4 bigs at 1M pts / segments 2 / frame 219."""
        cam = make_camera()
        rng = np.random.default_rng(5)
        a = rng.uniform(-0.35, 0.35, (40, 1, 3)).astype(np.float32)
        b = a + rng.normal(size=(40, 1, 3)).astype(np.float32) * 1.1
        pts = np.concatenate([a, b], axis=1)
        caps = capsules_from_polylines(
            jnp.asarray(pts), np.ones((40, 2), bool), cam, 0.004,
            np.array([0.2, 1.0, 0.4], np.float32))
        soup = ScreenPrimitives.concatenate(
            [ground_plane(cam, 10.0, (0, 0, -0.5)), caps])
        ov4 = int(np.asarray(bin_diagnostics6(soup, W, H, max_big=8,
                                              span=4)))
        ov8 = int(np.asarray(bin_diagnostics6(soup, W, H, max_big=8,
                                              span=8)))
        assert ov4 > 0 and ov8 == 0
        _assert_matches_oracle(soup, span=8, max_big=8)

    def test_span8_mixed_matches_oracle_with_cap10(self):
        _assert_matches_oracle(
            _mixed_soup(make_camera(), n=200, radius=0.06, seed=13),
            span=8, cap_rows10=True)

    def test_span4_matches_span2_on_small_prims(self):
        soup = _mixed_soup(make_camera(), seed=29)
        d2, i2 = rasterize_pallas_csr6(soup, W, H, interpret=True, span=2)
        d4, i4 = rasterize_pallas_csr6(soup, W, H, interpret=True, span=4)
        np.testing.assert_array_equal(np.asarray(i4), np.asarray(i2))
        # Winners exact; capsule depth may differ by <= 2 ulp between
        # the two compiled programs (XLA FMA contraction — the
        # test_raster convention).
        hit = np.asarray(i2) >= 0
        np.testing.assert_allclose(np.asarray(d4)[hit],
                                   np.asarray(d2)[hit], rtol=2e-5)

    def test_span4_exact_ties(self):
        cam = make_camera()
        rng = np.random.default_rng(3)
        pos = rng.uniform(-0.5, 0.5, (300, 3)).astype(np.float32)
        pos[40:80] = pos[:40]
        discs = discs_from_points(jnp.asarray(pos), cam,
                                  jnp.full((300,), 0.03, jnp.float32),
                                  np.array([0.3, 0.3, 0.3], np.float32))
        soup = ScreenPrimitives.concatenate(
            [ground_plane(cam, 10.0, (0, 0, -0.5)), discs])
        _assert_matches_oracle(soup, span=4)


class TestBuildTable16Rows:
    """_build_table16_rows == _build_table16(...)[ids] bit-for-bit (the
    discs_only big-row path builds rows at the big ids directly instead
    of materializing the (P+1, 16) table)."""

    def test_bit_equal_incl_sentinels(self):
        from pointcloud_render_tpu.raster.pallas_csr3 import _preshade
        from pointcloud_render_tpu.raster.pallas_csr4 import (
            _build_table16,
            _build_table16_rows,
        )
        from pointcloud_render_tpu.shading.shade import ShadingConfig

        cam = make_camera()
        soup = _mixed_soup(cam)
        rgb, flag = _preshade(soup, cam, ShadingConfig())
        p = soup.count
        rng = np.random.default_rng(11)
        ids = np.concatenate([
            rng.integers(0, p, 64),
            [p, p, -1, -1, 0, p - 1],  # pad sentinel / big-list empties
        ]).astype(np.int32)
        for bt in (False, True):
            full = _build_table16(soup, rgb, flag, bin_triangles=bt)
            want = np.asarray(full)[np.clip(ids, 0, p)]
            want[ids < 0] = 0.0  # -1 empties: zero row (inert), by spec
            got = np.asarray(_build_table16_rows(
                soup, rgb, flag, jnp.asarray(ids), bin_triangles=bt))
            np.testing.assert_array_equal(got, want)


class TestCombinedKnobs:
    def test_span4_tpp_dma_ring_combined(self):
        """The A/B knobs compose: span=4 binning x grid fusion x a deep
        DMA ring must stay bit-identical to the default walk (the TPU
        sweep runs these combinations; this pins the index math)."""
        soup = _mixed_soup(make_camera(), seed=17, radius=0.04)
        d1, i1 = rasterize_pallas_csr6(soup, W, H, interpret=True,
                                       allow_exit=False)
        d, i = rasterize_pallas_csr6(soup, W, H, interpret=True, span=4,
                                     allow_exit=False, tiles_per_program=4,
                                     dma_slots=4)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i1))
        # Winners exact; capsule depth may differ by <= 2 ulp between
        # the two compiled programs (XLA FMA contraction — the
        # test_raster convention for cross-program comparisons).
        hit = np.asarray(i1) >= 0
        np.testing.assert_allclose(np.asarray(d)[hit],
                                   np.asarray(d1)[hit], rtol=2e-5)


def test_bin_diagnostics6_mirrors_discs_only():
    """The overflow certificate must count under the SAME binnable set
    as the render it certifies: discs_only forces every capsule onto
    the big list, so probing without the flag under-counts and can
    certify a truncating run as exact (review r3)."""
    cam = make_camera()
    soup = _mixed_soup(cam, n=60, trails=40, seed=9)
    # Capsule-heavy soup, tiny big list: binned-capsule probing sees
    # little overflow, the discs_only probe must see a lot.
    base = int(np.asarray(bin_diagnostics6(soup, W, H, max_big=4)))
    forced = int(np.asarray(bin_diagnostics6(soup, W, H, max_big=4,
                                             discs_only=True)))
    assert forced > base

    from pointcloud_render_tpu.raster.pallas_csr import bin_diagnostics

    base2 = int(np.asarray(bin_diagnostics(soup, W, H, max_big=4)))
    forced2 = int(np.asarray(bin_diagnostics(soup, W, H, max_big=4,
                                             discs_only=True)))
    assert forced2 > base2


def test_huge_tile_grid_keys_fall_back_to_int32():
    """>32767-tile grids overflow int16 sort keys; v3/v4 must fall back
    to int32 like tiles.py/v2/v6 instead of silently wrapping (review
    r3).  Exercised via the binning functions directly with an inflated
    tile grid — the kernel contract only needs ascending keys with the
    sentinel region last."""
    from pointcloud_render_tpu.raster.pallas_csr3 import (
        _bin_csr_2x2,
        _zq_bits,
    )
    from pointcloud_render_tpu.raster.pallas_csr4 import _bin_csr4

    # Discs anchored near the bottom-right of a 250x160 = 40000-tile
    # grid (tile ids far past 32767).
    px = np.array([250.0 * 32 - 40, 250.0 * 32 - 400], np.float32)
    py = np.array([160.0 * 32 - 40, 160.0 * 32 - 200], np.float32)
    soup = _screen_discs(px, py, np.array([1.0, 2.0]),
                         np.array([5.0, 5.0]))
    nt, tx, ty = 250 * 160, 250, 160
    for bin_fn in (lambda s: _bin_csr_2x2(s, 32, 32, nt, tx, ty),
                   lambda s: _bin_csr4(s, 32, 32, nt, tx, ty)):
        keys, prims_s, *_ = bin_fn(soup)
        k = np.asarray(keys)
        assert k.dtype == np.int32
        assert (np.diff(k) >= 0).all()
        sent = nt << _zq_bits(nt)
        binned = k[k < sent]
        assert binned.size == 2  # both discs really binned, keys valid
        assert (binned >= 0).all()


def test_dma_slots_one_rejected():
    """dma_slots=1 would double-start chunk 0's DMA into the same slot/
    semaphore (the prefetch starts chunk ci+n_slots-1 from chunk ci's
    body) — must be a loud ValueError, not a stale-data race."""
    soup = _mixed_soup(make_camera(), n=40, trails=4)
    with pytest.raises(ValueError, match="dma_slots"):
        rasterize_pallas_csr6(soup, W, H, interpret=True, dma_slots=1,
                              allow_exit=False)


class TestRowBudget:
    """row_budget: static cap on the sorted-order row gather.  Binned
    prims occupy the sorted prefix; big/invalid prims sort past it
    (sentinel keys), so soups with large invalid tails (adaptive
    trails leave rows past each trail's per-frame k invalid) need rows
    only for the prefix.  Exactness contract: bit-equal whenever
    diag["row_overflow"] == 0; a too-small budget must REPORT overflow."""

    def _tail_heavy_soup(self):
        """A mixed soup whose last half is invalidated — the adaptive-
        trail shape (static rows, data-dependent validity)."""
        soup = _mixed_soup(make_camera(), n=300, trails=24)
        import jax.numpy as jnp  # noqa: PLC0415

        keep = np.ones((soup.count,), bool)
        keep[soup.count // 2:] = False
        # keep the ground (row 0-1) and the first half of everything
        return ScreenPrimitives(
            kind=soup.kind, params=soup.params, color=soup.color,
            valid=soup.valid & jnp.asarray(keep), bbox=soup.bbox,
            normal=soup.normal)

    @pytest.mark.parametrize("span,cap10", [(2, False), (4, True)])
    def test_row_budget_bit_equal_when_certified(self, span, cap10):
        soup = self._tail_heavy_soup()
        _, nb = bin_diagnostics6(soup, W, H, span=span, max_big=64,
                                 return_binned=True)
        budget = (int(nb) + 63) // 64 * 64
        kw = dict(span=span, max_big=64, cap_rows10=cap10,
                  allow_exit=False, interpret=True, return_diag=True)
        d0, i0, g0 = rasterize_pallas_csr6(soup, W, H, **kw)
        d1, i1, g1 = rasterize_pallas_csr6(soup, W, H, row_budget=budget,
                                           **kw)
        assert int(np.asarray(g1["row_overflow"])) == 0
        assert int(np.asarray(g0["row_overflow"])) == 0  # None = always 0
        np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        assert (np.asarray(i1) >= 0).any()

    def test_row_budget_matches_oracle(self):
        soup = self._tail_heavy_soup()
        _, nb = bin_diagnostics6(soup, W, H, span=2, max_big=64,
                                 return_binned=True)
        _assert_matches_oracle(soup, max_big=64,
                               row_budget=(int(nb) + 63) // 64 * 64)

    def test_row_budget_overflow_reported(self):
        soup = self._tail_heavy_soup()
        _, nb = bin_diagnostics6(soup, W, H, span=2, max_big=64,
                                 return_binned=True)
        small = max(16, int(nb) // 2)
        _, _, g = rasterize_pallas_csr6(soup, W, H, span=2, max_big=64,
                                        row_budget=small, interpret=True,
                                        return_diag=True)
        assert int(np.asarray(g["row_overflow"])) == int(nb) - small

    def test_row_budget_larger_than_p_is_inert(self):
        soup = self._tail_heavy_soup()
        kw = dict(span=2, max_big=64, interpret=True)
        d0, i0 = rasterize_pallas_csr6(soup, W, H, **kw)
        d1, i1 = rasterize_pallas_csr6(soup, W, H,
                                       row_budget=soup.count + 999, **kw)
        np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def _rows8_soup(cam, n=300, trails=40, seed=7, with_big=True,
                with_invalid=True):
    """Mixed soup for the rows8 mode: discs + short capsule trails +
    (optionally) long big-list capsules and invalid segments + the
    ground triangles — every routing class the kind-split walk serves."""
    rng = np.random.default_rng(seed)
    discs = random_cloud_prims(cam, n=n, radius=0.025, seed=seed)
    pts = rng.uniform(-0.4, 0.4, size=(trails, 5, 3)).astype(np.float32)
    vv = np.ones((trails, 5), bool)
    if with_invalid:
        vv[rng.uniform(size=vv.shape) < 0.15] = False
    caps = capsules_from_polylines(
        jnp.asarray(pts), vv, cam, 0.003,
        np.array([0.2, 1.0, 0.4], np.float32))
    parts = [ground_plane(cam, 10.0, (0, 0, -0.5)), discs, caps]
    if with_big:
        long_poly = np.array(
            [[[-0.6, -0.6, 0.0], [0.6, 0.6, 0.1]],
             [[-0.6, 0.6, -0.1], [0.6, -0.6, 0.2]]], np.float32)
        parts.append(capsules_from_polylines(
            jnp.asarray(long_poly), np.ones((2, 2), bool), cam, 0.01,
            np.array([0.1, 0.9, 0.1], np.float32)))
    return ScreenPrimitives.concatenate(parts)


def _assert_matches_cap8_oracle(soup, span=2, **kw):
    """rows8 contract: winners exactly match the cap8 oracle (which
    routes binned capsules through the renormalized eval and big
    capsules/discs through the default one, exactly as the kernel
    does); disc depth bit-exact; capsule depth within the repo's
    FMA-contraction caveat; triangles within the 1/iz division drift."""
    host = to_host(soup)
    d_o, i_o = cpu_reference.rasterize_reference(
        host, W, H, capsule_eval="cap8", span=span)
    assert (i_o >= 0).any(), "empty render — the comparison is vacuous"
    d_p, i_p = rasterize_pallas_csr6(soup, W, H, interpret=True,
                                     rows8=True, span=span, **kw)
    d_p, i_p = np.asarray(d_p), np.asarray(i_p)
    np.testing.assert_array_equal(i_p, i_o)
    hit = i_p >= 0
    kind_img = np.where(hit, np.asarray(host.kind)[i_p.clip(0)], -1)
    disc_px = kind_img == 0
    np.testing.assert_array_equal(d_p[disc_px], d_o[disc_px])
    rest = hit & ~disc_px
    np.testing.assert_allclose(d_p[rest], d_o[rest], rtol=2e-5)


class TestRows8:
    """Kind-split 8-float rows (one 32 B gather granule, idf from the
    sort payload).  Discs stay bit-exact; binned capsules use the
    renormalized segment-frame eval whose oracle twin is
    rasterize_reference(capsule_eval='cap8') — a certified-fidelity
    mode, gated like the segment-count knob (benchmarks/pick_tuned)."""

    def test_rows8_matches_cap8_oracle_span2(self):
        _assert_matches_cap8_oracle(_rows8_soup(make_camera()))

    def test_rows8_matches_cap8_oracle_span4(self):
        _assert_matches_cap8_oracle(_rows8_soup(make_camera(), seed=11),
                                    span=4)

    def test_rows8_single_kind_soups(self):
        # Empty capsule region (discs only) and empty disc region
        # (capsules only): one of the two kind walks is a no-op.
        cam = make_camera()
        discs_only_soup = ScreenPrimitives.concatenate(
            [ground_plane(cam, 10.0, (0, 0, -0.5)),
             random_cloud_prims(cam, n=200, radius=0.03, seed=3)])
        _assert_matches_cap8_oracle(discs_only_soup)
        rng = np.random.default_rng(5)
        pts = rng.uniform(-0.4, 0.4, size=(50, 5, 3)).astype(np.float32)
        caps_soup = ScreenPrimitives.concatenate(
            [ground_plane(cam, 10.0, (0, 0, -0.5)),
             capsules_from_polylines(jnp.asarray(pts),
                                     np.ones((50, 5), bool), cam, 0.004,
                                     np.array([0.8, 0.2, 0.2],
                                              np.float32))])
        _assert_matches_cap8_oracle(caps_soup)

    def test_rows8_knob_matrix_bit_identical(self):
        # chunk_rows (incl. a non-128-multiple that rounds down),
        # dma_slots, grid fusion: pure scheduling knobs — images
        # bit-identical across the matrix.
        soup = _rows8_soup(make_camera(), seed=19)
        base = rasterize_pallas_csr6(soup, W, H, rows8=True,
                                     interpret=True)
        for kw in (dict(chunk_rows=128), dict(chunk_rows=384),
                   dict(chunk_rows=200),  # rounds down to 128
                   dict(dma_slots=3), dict(tiles_per_program=4),
                   dict(starts_method="sort")):
            d, i = rasterize_pallas_csr6(soup, W, H, rows8=True,
                                         interpret=True, **kw)
            np.testing.assert_array_equal(np.asarray(d),
                                          np.asarray(base[0]), err_msg=str(kw))
            np.testing.assert_array_equal(np.asarray(i),
                                          np.asarray(base[1]), err_msg=str(kw))

    def test_rows8_mode_exclusions(self):
        soup = _rows8_soup(make_camera(), trails=5, n=40, with_big=False)
        with pytest.raises(ValueError, match="allow_exit"):
            rasterize_pallas_csr6(soup, W, H, rows8=True, allow_exit=True,
                                  interpret=True)
        with pytest.raises(ValueError, match="mutually exclusive"):
            rasterize_pallas_csr6(soup, W, H, rows8=True, cap_rows10=True,
                                  interpret=True)
        with pytest.raises(ValueError, match="mutually exclusive"):
            rasterize_pallas_csr6(soup, W, H, rows8=True, discs_only=True,
                                  interpret=True)
        with pytest.raises(ValueError, match="mutually exclusive"):
            rasterize_pallas_csr6(soup, W, H, rows8=True,
                                  bin_triangles=True, interpret=True)

    def test_rows8_winner_flips_vs_cap10_are_ulp_rare(self):
        # The renormalized eval only reorders f32 rounding — winner
        # flips vs the cap10 mode need an exact ULP boundary and are
        # expected at ~0 on a generic scene (the fidelity certificate
        # bounds them at production scale on the real trajectories).
        soup = _rows8_soup(make_camera(), seed=23)
        _, i8 = rasterize_pallas_csr6(soup, W, H, rows8=True,
                                      interpret=True)
        _, i10 = rasterize_pallas_csr6(soup, W, H, cap_rows10=True,
                                       interpret=True)
        flips = (np.asarray(i8) != np.asarray(i10)).mean()
        assert flips < 1e-3, flips

    def test_rows8_permutation_invariance(self):
        cam = make_camera()
        rng = np.random.default_rng(31)
        pos = rng.uniform(-0.5, 0.5, (150, 3)).astype(np.float32)
        pts = rng.uniform(-0.4, 0.4, size=(30, 4, 3)).astype(np.float32)

        def build(dperm, cperm):
            discs = discs_from_points(
                jnp.asarray(pos[dperm]), cam,
                jnp.full((150,), 0.03, jnp.float32),
                np.array([0.3, 0.3, 0.3], np.float32))
            caps = capsules_from_polylines(
                jnp.asarray(pts[cperm]), np.ones((30, 4), bool), cam,
                0.004, np.array([0.8, 0.2, 0.2], np.float32))
            return ScreenPrimitives.concatenate(
                [ground_plane(cam, 10.0, (0, 0, -0.5)), discs, caps])

        a = build(np.arange(150), np.arange(30))
        b = build(rng.permutation(150), rng.permutation(30))
        d_a, _ = rasterize_pallas_csr6(a, W, H, rows8=True, interpret=True)
        d_b, _ = rasterize_pallas_csr6(b, W, H, rows8=True, interpret=True)
        np.testing.assert_array_equal(np.asarray(d_a), np.asarray(d_b))

    def test_rows8_row_budget(self):
        soup = _rows8_soup(make_camera(), seed=37)
        _, nb = bin_diagnostics6(soup, W, H, span=2, return_binned=True)
        budget = (int(nb) + 127) // 128 * 128
        base = rasterize_pallas_csr6(soup, W, H, rows8=True,
                                     interpret=True)
        d, i, g = rasterize_pallas_csr6(soup, W, H, rows8=True,
                                        row_budget=budget, interpret=True,
                                        return_diag=True)
        assert int(np.asarray(g["row_overflow"])) == 0
        np.testing.assert_array_equal(np.asarray(d), np.asarray(base[0]))
        np.testing.assert_array_equal(np.asarray(i), np.asarray(base[1]))

    def test_rows8_shaded_three_tone(self):
        # The shade path is idf-image-driven and mode-agnostic: rows8 +
        # three_tone must equal the cap10 + three_tone shade wherever
        # winners agree (and winners agree everywhere on this scene).
        from pointcloud_render_tpu.raster.pallas_csr6 import (
            derive_three_tone,
        )
        from pointcloud_render_tpu.shading.shade import ShadingConfig

        cam = make_camera()
        soup = _rows8_soup(cam, seed=41, with_invalid=False,
                           with_big=False)
        shading = ShadingConfig()
        reps, ok = derive_three_tone(soup)
        assert bool(ok)
        reps = tuple(int(x) for x in np.asarray(reps))
        rgb8, d8, i8, _ = render_shaded_csr6(
            soup, cam, shading, rows8=True, three_tone=reps,
            interpret=True, return_diag=True)
        rgb10, d10, i10, _ = render_shaded_csr6(
            soup, cam, shading, cap_rows10=True, three_tone=reps,
            interpret=True, return_diag=True)
        same = np.asarray(i8) == np.asarray(i10)
        assert same.mean() == 1.0
        np.testing.assert_array_equal(np.asarray(rgb8), np.asarray(rgb10))

    def test_rows8_carry_bit_identical(self):
        # Sort-carried rows vs gathered rows: same values in the same
        # order by construction — images bit-identical, incl. under
        # row_budget and at span 4.
        soup = _rows8_soup(make_camera(), seed=47)
        for kw in (dict(), dict(span=4), dict(chunk_rows=384)):
            a = rasterize_pallas_csr6(soup, W, H, rows8=True,
                                      interpret=True, **kw)
            b = rasterize_pallas_csr6(soup, W, H, rows8=True,
                                      rows8_carry=True, interpret=True,
                                      **kw)
            np.testing.assert_array_equal(np.asarray(a[0]),
                                          np.asarray(b[0]), err_msg=str(kw))
            np.testing.assert_array_equal(np.asarray(a[1]),
                                          np.asarray(b[1]), err_msg=str(kw))
        with pytest.raises(ValueError, match="rows8_carry"):
            rasterize_pallas_csr6(soup, W, H, rows8_carry=True,
                                  interpret=True)

    def test_cap10_carry_bit_identical(self):
        # Sort-carried cap10 rows vs gathered: bit-identical images,
        # incl. under row_budget-free span4 and odd chunking.
        soup = _rows8_soup(make_camera(), seed=53)
        for kw in (dict(), dict(span=4), dict(chunk_rows=384)):
            a = rasterize_pallas_csr6(soup, W, H, cap_rows10=True,
                                      interpret=True, **kw)
            b = rasterize_pallas_csr6(soup, W, H, cap_rows10=True,
                                      cap10_carry=True, interpret=True,
                                      **kw)
            np.testing.assert_array_equal(np.asarray(a[0]),
                                          np.asarray(b[0]), err_msg=str(kw))
            np.testing.assert_array_equal(np.asarray(a[1]),
                                          np.asarray(b[1]), err_msg=str(kw))
        with pytest.raises(ValueError, match="cap10_carry"):
            rasterize_pallas_csr6(soup, W, H, cap10_carry=True,
                                  interpret=True)

    def test_rows9_matches_cap8_oracle_both_spans(self):
        # rows9 evaluates the SAME renormalized expressions as rows8 —
        # the cap8 oracle covers it unchanged.
        soup = _rows9_mode_soup = _rows8_soup(make_camera(), seed=59)
        for span in (2, 4):
            host = to_host(soup)
            d_o, i_o = cpu_reference.rasterize_reference(
                host, W, H, capsule_eval="cap8", span=span)
            d_p, i_p = rasterize_pallas_csr6(soup, W, H, interpret=True,
                                             rows9=True, span=span)
            d_p, i_p = np.asarray(d_p), np.asarray(i_p)
            np.testing.assert_array_equal(i_p, i_o)
            hit = i_p >= 0
            kind_img = np.where(hit, np.asarray(host.kind)[i_p.clip(0)],
                                -1)
            disc_px = kind_img == 0
            np.testing.assert_array_equal(d_p[disc_px], d_o[disc_px])
            rest = hit & ~disc_px
            np.testing.assert_allclose(d_p[rest], d_o[rest], rtol=2e-5)

    def test_rows9_matches_rows8_bit_exact(self):
        # Identical eval + identical (depth, id) merges -> identical
        # images between the two kind-split modes.
        soup = _rows8_soup(make_camera(), seed=61)
        a = rasterize_pallas_csr6(soup, W, H, rows8=True, interpret=True)
        b = rasterize_pallas_csr6(soup, W, H, rows9=True, interpret=True)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))

    def test_rows9_carry_and_knobs_bit_identical(self):
        soup = _rows8_soup(make_camera(), seed=67)
        base = rasterize_pallas_csr6(soup, W, H, rows9=True,
                                     interpret=True)
        for kw in (dict(rows9_carry=True), dict(chunk_rows=392),
                   dict(rows9_carry=True, span=4), dict(span=4),
                   dict(tiles_per_program=4)):
            d, i = rasterize_pallas_csr6(soup, W, H, rows9=True,
                                         interpret=True, **kw)
            if kw.get("span", 2) == 2:
                np.testing.assert_array_equal(np.asarray(d),
                                              np.asarray(base[0]),
                                              err_msg=str(kw))
                np.testing.assert_array_equal(np.asarray(i),
                                              np.asarray(base[1]),
                                              err_msg=str(kw))
        # span=4 pair: carry vs gather must agree at that span too.
        a4 = rasterize_pallas_csr6(soup, W, H, rows9=True, span=4,
                                   interpret=True)
        b4 = rasterize_pallas_csr6(soup, W, H, rows9=True, span=4,
                                   rows9_carry=True, interpret=True)
        np.testing.assert_array_equal(np.asarray(a4[0]), np.asarray(b4[0]))
        np.testing.assert_array_equal(np.asarray(a4[1]), np.asarray(b4[1]))
        with pytest.raises(ValueError, match="rows9_carry"):
            rasterize_pallas_csr6(soup, W, H, rows9_carry=True,
                                  interpret=True)
        with pytest.raises(ValueError, match="mutually exclusive"):
            rasterize_pallas_csr6(soup, W, H, rows9=True, rows8=True,
                                  interpret=True)
