"""Fine-grained probe of the frame's BUILD stage.

The v6 stage budget (stage_profile6) shows build as one number (disc
~6 ms, trail ~52 ms at 1M pts); this splits it — projection alone, the
per-part soup blocks, the concat, and the bin-key computation that
consumes it — to decide whether a soup-free fast path or a concat-free
layout would pay.

Run on the TPU: python benchmarks/build_probe.py [--scene disc|trail]
    [--points N]
"""
import argparse
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(name, fn, *a, reps=8):
    from pointcloud_render_tpu.utils import aot

    c = aot.compile_const_free(fn, *a)
    out = c(*a)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = c(*a)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:40s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="disc", choices=["disc", "trail"])
    ap.add_argument("--points", type=int, default=1_000_000)
    ap.add_argument("--frame", type=int, default=120)
    ap.add_argument("--radius", type=float, default=0.002)
    ap.add_argument("--segments", type=int, default=None,
                    help="trail_segments override (trail scene)")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

    from pointcloud_render_tpu.raster import pallas_csr6
    from pointcloud_render_tpu.raster.primitives import (
        ScreenPrimitives,
        discs_from_points,
    )
    from pointcloud_render_tpu.raster.project import project_points
    from pointcloud_render_tpu.raster.render import ground_plane
    from pointcloud_render_tpu.scene.camera import (
        TARGETS,
        TOTAL_FRAMES,
        Camera,
        camera_origin_jax,
    )

    n = args.points
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)), jnp.float32)
    radii = jnp.full((n,), args.radius, jnp.float32)
    fi = jnp.int32(args.frame)
    gray = np.array([0.3, 0.3, 0.3], np.float32)

    def cam_of(fi):
        return Camera(
            origin=camera_origin_jax("traj_ball", fi, TOTAL_FRAMES),
            target=np.asarray(TARGETS["traj_ball"], np.float32))

    def s_project(p, fi):
        proj = project_points(p, cam_of(fi), radii=radii)
        return proj["px"].sum() + proj["r_px"].sum()

    def s_discs(p, fi):
        soup = discs_from_points(p, cam_of(fi), radii, gray)
        return soup.params.sum() + soup.bbox.sum()

    def s_concat(p, fi):
        cam = cam_of(fi)
        soup = ScreenPrimitives.concatenate([
            ground_plane(cam, 10.0, (0.0, 0.0, -0.5)),
            discs_from_points(p, cam, radii, gray)])
        return soup.params.sum() + soup.bbox.sum()

    def s_bin(p, fi):
        cam = cam_of(fi)
        soup = ScreenPrimitives.concatenate([
            ground_plane(cam, 10.0, (0.0, 0.0, -0.5)),
            discs_from_points(p, cam, radii, gray)])
        tiles_y, tiles_x = -(-cam.height // 32), -(-cam.width // 32)
        sk, sp, bl, bc, zm, _ns = pallas_csr6._bin_csr6(
            soup, 32, 32, tiles_y * tiles_x, tiles_x, tiles_y,
            max_big=1024, discs_only=True)
        return sk[0] + sp[0] + bc

    if args.scene == "disc":
        t1 = timed("projection only", s_project, pos, fi)
        t2 = timed("disc soup (params/bbox/color)", s_discs, pos, fi)
        t3 = timed("+ ground concat", s_concat, pos, fi)
        t4 = timed("+ bin keys + sort", s_bin, pos, fi)
        print(f"\ndeltas: soup={1e3 * (t2 - t1):.2f} "
              f"concat={1e3 * (t3 - t2):.2f} bin={1e3 * (t4 - t3):.2f} ms",
              flush=True)
        return

    # --- trail scene: the 9M-prim traj_ball soup, part by part.
    from pointcloud_render_tpu.configs import PRESETS
    from pointcloud_render_tpu.geometry import trails as trails_mod
    from pointcloud_render_tpu.raster.primitives import (
        capsules_from_polylines,
    )
    from pointcloud_render_tpu.run.pipeline import (
        VEL_TRAIL_RENDER_SEGMENTS,
        build_primitives,
    )

    vel = jnp.asarray(rng.normal(0, 2, (n, 3)), jnp.float32)
    preset = PRESETS["traj_ball"]
    segs = (VEL_TRAIL_RENDER_SEGMENTS if args.segments is None
            else args.segments)
    sub = np.round(np.linspace(0, trails_mod.N_TRAIL_POINTS,
                               segs + 1)).astype(np.int32)

    def s_verts(p, v, fi):
        ends, valid = trails_mod.velocity_trails_sampled(
            p, v, fi, sub, preset.trail_schedule)
        return ends.sum() + valid.sum()

    def s_caps(p, v, fi):
        ends, valid = trails_mod.velocity_trails_sampled(
            p, v, fi, sub, preset.trail_schedule)
        vv = jnp.broadcast_to(valid[:, None], ends.shape[:2])
        caps = capsules_from_polylines(
            ends, vv, cam_of(fi), preset.trail_radius,
            np.asarray(preset.trail_color, np.float32))
        return caps.params.sum() + caps.bbox.sum()

    def s_full(p, v, fi):
        soup = build_primitives(preset, cam_of(fi), p, v, fi,
                                trail_segments=args.segments)
        return soup.params.sum() + soup.bbox.sum()

    def s_table16(p, v, fi):
        from pointcloud_render_tpu.raster.pallas_csr4 import _build_table16

        soup = build_primitives(preset, cam_of(fi), p, v, fi,
                                trail_segments=args.segments)
        tab = _build_table16(soup, jnp.zeros((soup.count, 3), jnp.float32),
                             jnp.zeros((soup.count,), jnp.float32))
        return tab.sum() + soup.bbox.sum()

    # Packed-column twin (r5): same f32 expressions, fully packed (N,)
    # layout (capsules_from_vertex_columns docstring).  The BITCHECK
    # lane certifies on-chip bit-identity of every soup field — CPU
    # equality is pinned by tests, but TPU fusion/FMA decisions are the
    # backend's own, so the chip gets its own certificate before the
    # packed build ships as the pipeline default.
    from pointcloud_render_tpu.raster.primitives import (
        capsules_from_vertex_columns,
    )

    def s_caps_packed(p, v, fi):
        vcols, valid = trails_mod.velocity_trail_vertex_columns(
            p, v, fi, sub, preset.trail_schedule)
        caps = capsules_from_vertex_columns(
            vcols, [valid] * len(vcols), cam_of(fi), preset.trail_radius,
            np.asarray(preset.trail_color, np.float32))
        return caps.params.sum() + caps.bbox.sum()

    def s_full_packed(p, v, fi):
        soup = build_primitives(preset, cam_of(fi), p, v, fi,
                                trail_segments=args.segments,
                                packed_build=True)
        return soup.params.sum() + soup.bbox.sum()

    def s_bitcheck(p, v, fi):
        sp = build_primitives(preset, cam_of(fi), p, v, fi,
                              trail_segments=args.segments,
                              packed_build=True)
        so = build_primitives(preset, cam_of(fi), p, v, fi,
                              trail_segments=args.segments,
                              packed_build=False)
        bad = jnp.int32(0)
        bad += jnp.sum(sp.valid != so.valid)
        vm = (sp.valid & so.valid)[:, None]
        bad += jnp.sum(jnp.where(vm, sp.params != so.params, False))
        bad += jnp.sum(sp.color != so.color) + jnp.sum(sp.kind != so.kind)
        # bbox: conservative binning bound, allowed to drift a rounding
        # error across compilations (fma contraction — see
        # capsules_from_vertex_columns).  Harmless when the max ABS
        # drift stays far under 0.5 px: a winner could only change if a
        # truly-covered pixel fell in a tile the drifted bbox dropped,
        # and the nearest pixel center of a dropped tile sits >=
        # (0.5 - drift) px beyond the exact extent while f32 coverage
        # cannot exceed it by more than ~1e-4 px of eval rounding.
        bu = jnp.abs(sp.bbox - so.bbox)
        bbox_px = jnp.max(jnp.where(vm, bu, 0.0))
        return bad, bbox_px

    t1 = timed("trail vertices (sampled)", s_verts, pos, vel, fi)
    t2 = timed("capsule part (proj + blocks)", s_caps, pos, vel, fi)
    t2p = timed("capsule part PACKED columns", s_caps_packed, pos, vel, fi)
    t3 = timed("full soup (discs + concat)", s_full, pos, vel, fi)
    t3p = timed("full soup PACKED", s_full_packed, pos, vel, fi)
    t4 = timed("+ table16 build", s_table16, pos, vel, fi)
    from pointcloud_render_tpu.utils import aot as _aot

    out = _aot.compile_const_free(s_bitcheck, pos, vel, fi)(pos, vel, fi)
    bad = int(np.asarray(out[0]))
    bbox_px = float(np.asarray(out[1]))
    ok = bad == 0 and bbox_px < 0.01
    print(f"packed-vs-polyline BITCHECK: {bad} winner-field mismatches, "
          f"bbox max drift {bbox_px:.2e} px "
          f"({'OK' if ok else 'FAIL — do not ship packed'})",
          flush=True)
    print(f"\ndeltas: caps={1e3 * (t2 - t1):.2f} "
          f"capsPACKED={1e3 * (t2p - t1):.2f} "
          f"rest={1e3 * (t3 - t2):.2f} table16={1e3 * (t4 - t3):.2f} "
          f"fullPACKED={1e3 * t3p:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
