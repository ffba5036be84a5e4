"""Stage budget of the v6 anchor-sorted frame (disc or trail scene).

Cumulative stages (each includes the previous ones):
  build   — soup construction (projection, trails, concat)
  bin     — + per-prim (anchor, class, qz) keys + i32 sort
  starts  — + the 4T+1-bound searchsorted
  rows    — + the per-prim row gather (8 or 16 floats)
  raster  — + the Pallas CSR v6 kernel (depth + idf image)
  shade   — + the by-id shade epilogue (= the full frame)

Run: python benchmarks/stage_profile6.py [--scene disc|trail]
     [--points N] [--frame F]
     [--segments K] [--span S] [--cap10] [--three-tone]

The knob flags mirror bench.py's tuned trail/droplet lanes so the
stage budget can be taken AT the tuned winner (e.g. --segments 4
--span 4 --cap10 --three-tone = queue B's r4 trail winner).  cap10
(and span 4) force the depth exit off, so the bin/starts stages drop
the z-bucket pass exactly as _raster_core6 does (with_z=False,
_key_layout's i16 keys).
"""
import argparse
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(name, fn, *a, reps=6):
    from pointcloud_render_tpu.utils import aot

    c = aot.compile_const_free(fn, *a)
    out = c(*a)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = c(*a)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="disc",
                    choices=["disc", "trail", "droplet"])
    ap.add_argument("--points", type=int, default=1_000_000)
    ap.add_argument("--frame", type=int, default=120)
    ap.add_argument("--radius", type=float, default=0.002)
    ap.add_argument("--unroll", type=int, default=4)
    ap.add_argument("--max-big", type=int, default=20480)
    ap.add_argument("--segments", default=None,
                    type=lambda s: s if s == "adaptive" else int(s),
                    help="trail_segments override (trail scene only); "
                         "'adaptive' = per-trail slot-optimal k")
    ap.add_argument("--row-budget", type=int, default=None,
                    help="static sorted-order row-gather cap (pair with "
                         "--segments adaptive; size from bench.py's "
                         "probe: binned max * 1.1 + 8192, 4096-rounded)")
    ap.add_argument("--span", type=int, default=2, choices=[2, 4, 8])
    ap.add_argument("--rows8", action="store_true",
                    help="kind-split 8-float rows (32 B granule + "
                         "interleaved idf lanes; r5 rows-stage lever)")
    ap.add_argument("--cap10", action="store_true",
                    help="narrow 10-float capsule rows (exit off)")
    ap.add_argument("--three-tone", action="store_true",
                    help="no-preshade shade (derive reps from the soup)")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

    from pointcloud_render_tpu.configs import PRESETS
    from pointcloud_render_tpu.raster import pallas_csr6
    from pointcloud_render_tpu.raster.primitives import (
        ScreenPrimitives,
        discs_from_points,
    )
    from pointcloud_render_tpu.raster.render import ground_plane
    from pointcloud_render_tpu.run.pipeline import build_primitives
    from pointcloud_render_tpu.scene.camera import (
        TARGETS,
        TOTAL_FRAMES,
        Camera,
        camera_origin_jax,
    )
    from pointcloud_render_tpu.shading.shade import ShadingConfig

    n = args.points
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)), jnp.float32)
    vel = jnp.asarray(rng.normal(0, 2, (n, 3)), jnp.float32)
    radii = jnp.full((n,), args.radius, jnp.float32)
    fi = jnp.int32(args.frame)
    gray = np.array([0.3, 0.3, 0.3], np.float32)
    discs_only = args.scene == "disc"
    max_big = 1024 if discs_only else args.max_big
    span = args.span
    cap10 = args.cap10
    rows8 = args.rows8
    if rows8 and cap10:
        raise SystemExit("--rows8 and --cap10 are mutually exclusive")
    interp = jax.default_backend() != "tpu"  # CPU smoke runs
    # Mirror _raster_core6's exit policy: auto-off for discs_only /
    # span != 2 / cap10 / rows8 — bin/starts stages follow with_z.
    with_z = (not discs_only) and span == 2 and not cap10 and not rows8

    cam_preset = "traj_vel" if args.scene == "droplet" else "traj_ball"

    def make(p, v):
        cam = Camera(
            origin=camera_origin_jax(cam_preset, fi, TOTAL_FRAMES),
            target=np.asarray(TARGETS[cam_preset], np.float32))
        if args.scene == "disc":
            soup = ScreenPrimitives.concatenate([
                ground_plane(cam, 10.0, (0.0, 0.0, -0.5)),
                discs_from_points(p, cam, radii, gray)])
        elif args.scene == "droplet":
            # bench.py's tertiary metric: traj_vel preset, capsule LOD.
            soup = build_primitives(PRESETS["traj_vel"], cam, p, v, fi,
                                    droplet_lod="capsule",
                                    trail_segments=args.segments)
        else:
            soup = build_primitives(PRESETS["traj_ball"], cam, p, v, fi,
                                    trail_segments=args.segments)
        return soup, cam

    soup0, cam0 = make(pos, vel)
    W, H = cam0.width, cam0.height
    th = tw = 32
    tiles_y, tiles_x = -(-H // th), -(-W // tw)
    num_tiles = tiles_y * tiles_x
    print(f"scene={args.scene} prims {soup0.count} "
          f"discs_only={discs_only} segments={args.segments} "
          f"span={span} cap10={cap10} rows8={rows8} "
          f"three_tone={args.three_tone}",
          flush=True)

    def stage_build(p, v):
        soup, _ = make(p, v)
        return soup.params.sum()

    k2 = span * span
    kdtype, kshift = pallas_csr6._key_layout(num_tiles, span, with_z,
                                             kind_split=rows8)
    factor = 2 if rows8 else 1
    bounds = np.asarray(
        (np.arange(factor * num_tiles * k2 + 1, dtype=np.int64)
         << kshift).astype(kdtype))

    def _bin(soup):
        return pallas_csr6._bin_csr6(
            soup, th, tw, num_tiles, tiles_x, tiles_y, max_big=max_big,
            discs_only=discs_only, span=span, with_z=with_z,
            kind_split=rows8)

    def stage_bin(p, v):
        soup, _ = make(p, v)
        sk, sp, bl, bc, zm, _ns = _bin(soup)
        return sk[0].astype(jnp.int32) + sp[0] + bc

    def stage_starts(p, v):
        soup, _ = make(p, v)
        sk, sp, bl, bc, zm, _ns = _bin(soup)
        starts = jnp.searchsorted(sk, jnp.asarray(bounds))
        return starts[0] + sp[0]

    def stage_rows(p, v):
        soup, _ = make(p, v)
        sk, sp, bl, bc, zm, _ns = _bin(soup)
        starts = jnp.searchsorted(sk, jnp.asarray(bounds))
        pp = soup.count
        n_rows = pp if args.row_budget is None else min(args.row_budget,
                                                        pp)
        sp = sp[:n_rows]
        row_f = 8 if (discs_only or rows8) else 10 if cap10 else 16
        pack = 128 // row_f
        chunk = 256 if 256 % pack == 0 else 256 // pack * pack
        p_pad = -(-(n_rows + chunk + pack) // chunk) * chunk
        if rows8:
            p_pad += 256
        prims_p = jnp.pad(sp, (0, p_pad - n_rows), constant_values=pp)
        if rows8:
            # Mirror _raster_core6's rows8 branch: dual-encoding 8-float
            # table + NaN invalid + interleaved idf lanes.
            from pointcloud_render_tpu.raster.primitives import (
                KIND_CAPSULE,
            )
            pk = soup.params
            il2 = pk[:, 8]
            il = jnp.sqrt(il2)
            iscap = soup.kind == KIND_CAPSULE
            r = pk[:, 3]
            idf_col = jnp.arange(pp, dtype=jnp.float32)
            tab = jnp.stack([
                pk[:, 0], pk[:, 1],
                jnp.where(iscap, pk[:, 4] * il2, pk[:, 2]),
                jnp.where(iscap, -(r * il), r * r),
                jnp.where(iscap, pk[:, 5] * il2, idf_col),
                jnp.where(iscap, pk[:, 7] * il, 0.0),
                jnp.where(iscap, pk[:, 2], 0.0),
                jnp.where(iscap, pk[:, 6], 0.0)], axis=1)
            nanf = np.float32(np.nan)
            tab = jnp.where(soup.valid[:, None], tab, nanf)
            tab = jnp.pad(tab, ((0, 1), (0, 0)), constant_values=nanf)
            g8 = tab[prims_p].reshape(p_pad // 128, 8, 128)
            idf_lanes = prims_p.astype(jnp.float32) \
                .reshape(p_pad // 128, 1, 128)
            rows = jnp.concatenate([g8, idf_lanes], axis=1) \
                .reshape(p_pad // 128 * 9, 128)
            return rows.sum() + starts[0].astype(jnp.float32)
        if discs_only:
            r = soup.params[:, 3]
            tab = jnp.concatenate([
                soup.params[:, 0:3], (r * r)[:, None],
                jnp.arange(pp, dtype=jnp.float32)[:, None],
                jnp.zeros((pp, 3), jnp.float32)], axis=1)
            tab = jnp.where(soup.valid[:, None], tab, 0.0)
            tab = jnp.pad(tab, ((0, 1), (0, 0)))
        elif cap10:
            tab = jnp.concatenate([
                soup.params[:, 0:9],
                jnp.arange(pp, dtype=jnp.float32)[:, None]], axis=1)
            tab = jnp.where(soup.valid[:, None], tab, 0.0)
            tab = jnp.pad(tab, ((0, 1), (0, 0)))
        else:
            z3 = jnp.zeros((pp, 3), jnp.float32)
            zf = jnp.zeros((pp,), jnp.float32)
            tab = pallas_csr6._build_table16(soup, z3, zf)
        rows = tab[prims_p].reshape(p_pad // pack, pack * row_f)
        return rows.sum() + starts[0].astype(jnp.float32)

    def stage_raster(p, v):
        soup, _ = make(p, v)
        d, i = pallas_csr6.rasterize_pallas_csr6(
            soup, W, H, unroll=args.unroll, max_big=max_big,
            discs_only=discs_only, span=span, cap_rows10=cap10,
            rows8=rows8,
            row_budget=args.row_budget, interpret=interp)
        return jnp.sum(jnp.where(jnp.isfinite(d), d, 0.0))

    three_tone = None
    if args.three_tone:
        from pointcloud_render_tpu.utils import aot as _aot

        def reps_fn(p, v):
            s, _ = make(p, v)
            r3, ok3 = pallas_csr6.derive_three_tone(s)
            r4, ok4 = pallas_csr6.derive_four_tone(s)
            return r3, ok3, r4, ok4

        rc = _aot.compile_const_free(reps_fn, pos, vel)
        reps3, ok3, reps4, ok4 = rc(pos, vel)
        if bool(np.asarray(ok3)):
            three_tone = tuple(int(x) for x in np.asarray(reps3))
        elif bool(np.asarray(ok4)):
            three_tone = tuple(int(x) for x in np.asarray(reps4))
        print(f"three_tone reps: {three_tone}", flush=True)

    def stage_shade(p, v):
        soup, cam = make(p, v)
        rgb, d, i = pallas_csr6.render_shaded_csr6(
            soup, cam, ShadingConfig(), unroll=args.unroll,
            max_big=max_big, discs_only=discs_only, span=span,
            cap_rows10=cap10, rows8=rows8, three_tone=three_tone,
            row_budget=args.row_budget, interpret=interp)
        return (jnp.sum(jnp.where(jnp.isfinite(d), d, 0.0))
                + jnp.sum(rgb[::8, ::8]))

    # Standalone shade-stage split (NOT cumulative): what the 'shade'
    # delta is made of, to size a possible three-tone/no-preshade path
    # (preshade rgb is O(P) math; table8 is a P x 32 B repack; the
    # rest of the delta is the 2M-pixel winner gather + epilogue).
    from pointcloud_render_tpu.raster.pallas_csr3 import _preshade

    def stage_preshade(p, v):
        soup, cam = make(p, v)
        srgb, sflag = _preshade(soup, cam, ShadingConfig())
        return srgb[0, 0] + sflag[0] + soup.params[0, 0]

    def stage_table8(p, v):
        soup, cam = make(p, v)
        srgb, sflag = _preshade(soup, cam, ShadingConfig())
        table8 = jnp.pad(jnp.concatenate([
            soup.params[:, 0:2], srgb, sflag[:, None],
            jnp.zeros((soup.count, 2), jnp.float32)], axis=1),
            ((0, 1), (0, 0)))
        return table8.sum()

    t1 = timed("build (soup construction)", stage_build, pos, vel)
    t2 = timed("+ bin (keys + 1-slot sort)", stage_bin, pos, vel)
    t3 = timed("+ starts (searchsorted 4T+1)", stage_starts, pos, vel)
    t4 = timed("+ per-prim row gather", stage_rows, pos, vel)
    t5 = timed("+ CSR v6 kernel", stage_raster, pos, vel)
    t6 = timed("+ by-id shade (full frame)", stage_shade, pos, vel)
    timed("standalone: build + preshade", stage_preshade, pos, vel)
    timed("standalone: build + preshade + table8", stage_table8,
          pos, vel)
    if not discs_only:
        # The narrow-row mode at the same scene (raster-only A/B; the
        # rows stage difference shows in kernel6_sweep's CAP10 lines).
        def stage_raster_cap10(p, v):
            soup, _ = make(p, v)
            d, i = pallas_csr6.rasterize_pallas_csr6(
                soup, W, H, unroll=args.unroll, max_big=max_big,
                span=span, cap_rows10=True, interpret=interp)
            return jnp.sum(jnp.where(jnp.isfinite(d), d, 0.0))

        if not cap10:
            timed("standalone: full raster CAP10", stage_raster_cap10,
                  pos, vel)
    print(f"\ndeltas: bin={1e3 * (t2 - t1):.1f} "
          f"starts={1e3 * (t3 - t2):.1f} rows={1e3 * (t4 - t3):.1f} "
          f"kernel={1e3 * (t5 - t4):.1f} shade={1e3 * (t6 - t5):.1f} "
          f"total={1e3 * t6:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
