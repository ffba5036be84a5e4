"""Sweep the v6 kernel knobs on the 1M-disc bench frame.

The v6-disc kernel measured 18.3 ms where v3's was 8.6 on the same
pairs (stage_profile6) — sweep chunk_rows / allow_exit / unroll to
find where the overhead lives (exit-jump DMA drains, chunk-schedule
scalar work, or chunk size).

Run: python benchmarks/kernel6_sweep.py [--scene disc|trail]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Machine-readable mirror of every timed line (one JSON record per
# config) so benchmarks/pick_tuned.py can distill the winners into
# tuned_defaults.json unattended — the sweep runs from the TPU probe
# queue with nobody watching (utils/tuned.py docstring).
_JSONL = [None]


def timed(name, fn, *a, reps=6, knobs=None):
    from pointcloud_render_tpu.utils import aot

    c = aot.compile_const_free(fn, *a)
    out = c(*a)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = c(*a)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:52s} {dt * 1e3:8.2f} ms", flush=True)
    if _JSONL[0] and knobs is not None:
        with open(_JSONL[0], "a") as f:
            f.write(json.dumps({"label": name,
                                "ms": round(dt * 1e3, 3), **knobs}) + "\n")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="disc", choices=["disc", "trail"])
    ap.add_argument("--points", type=int, default=1_000_000)
    ap.add_argument("--frame", type=int, default=120)
    ap.add_argument("--segments", default=None,
                    type=lambda s: s if s == "adaptive" else int(s),
                    help="trail_segments override (trail scene) — sweep "
                         "the kernel knobs AT the tuned soup (r5: seg4)")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

    results_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "results")
    os.makedirs(results_dir, exist_ok=True)
    _JSONL[0] = os.path.join(results_dir, f"sweep6_{args.scene}.jsonl")
    open(_JSONL[0], "w").close()  # fresh sweep, fresh records

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

    n = args.points
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)), jnp.float32)
    vel = jnp.asarray(rng.normal(0, 2, (n, 3)), jnp.float32)
    radii = jnp.full((n,), 0.002, jnp.float32)
    fi = jnp.int32(args.frame)
    discs_only = args.scene == "disc"
    max_big = 1024 if discs_only else 20480

    def make(p, v):
        cam = Camera(
            origin=camera_origin_jax("traj_ball", fi, TOTAL_FRAMES),
            target=np.asarray(TARGETS["traj_ball"], np.float32))
        if args.scene == "disc":
            soup = ScreenPrimitives.concatenate([
                ground_plane(cam, 10.0, (0.0, 0.0, -0.5)),
                discs_from_points(p, cam, radii,
                                  np.array([0.3, 0.3, 0.3], np.float32))])
        else:
            soup = build_primitives(PRESETS["traj_ball"], cam, p, v, fi,
                                    trail_segments=args.segments)
        return soup, cam

    _, cam0 = make(pos, vel)
    W, H = cam0.width, cam0.height

    def raster(chunk_rows, allow_exit, unroll, dma_slots=2, span=2,
               mb=None, tpp=1, sm="scan", cap10=False, rows8=False,
               rows8c=False, cap10c=False, rows9=False, rows9c=False):
        def f(p, v):
            soup, _ = make(p, v)
            d, i = pallas_csr6.rasterize_pallas_csr6(
                soup, W, H, unroll=unroll, max_big=mb or max_big,
                discs_only=discs_only, chunk_rows=chunk_rows,
                allow_exit=allow_exit, dma_slots=dma_slots, span=span,
                tiles_per_program=tpp, starts_method=sm,
                cap_rows10=cap10, rows8=rows8, rows8_carry=rows8c,
                cap10_carry=cap10c, rows9=rows9, rows9_carry=rows9c)
            return jnp.sum(jnp.where(jnp.isfinite(d), d, 0.0))

        return f

    def tr(label, chunk_rows=256, allow_exit=False, unroll=4,
           dma_slots=2, span=2, mb=None, tpp=1, sm="scan", cap10=False,
           rows8=False, rows8c=False, cap10c=False, rows9=False,
           rows9c=False):
        timed(label,
              raster(chunk_rows, allow_exit, unroll, dma_slots=dma_slots,
                     span=span, mb=mb, tpp=tpp, sm=sm, cap10=cap10,
                     rows8=rows8, rows8c=rows8c, cap10c=cap10c,
                     rows9=rows9, rows9c=rows9c),
              pos, vel,
              knobs=dict(kind="raster", scene=args.scene,
                         chunk_rows=chunk_rows, allow_exit=allow_exit,
                         unroll=unroll, dma_slots=dma_slots, span=span,
                         max_big=mb or max_big, tiles_per_program=tpp,
                         starts_method=sm, cap_rows10=cap10, rows8=rows8,
                         rows8_carry=rows8c, cap10_carry=cap10c,
                         rows9=rows9, rows9_carry=rows9c,
                         segments=args.segments))

    for cr in (256, 512, 1024):
        for ex in (True, False):
            for un in (4,) if cr != 512 else (2, 4, 8):
                tr(f"chunk={cr} exit={int(ex)} unroll={un}",
                   chunk_rows=cr, allow_exit=ex, unroll=un)
    # DMA ring depth (exit-off fori path only) and span A/B.
    for ds in (3, 4, 8):
        tr(f"chunk=256 exit=0 unroll=4 dma_slots={ds}", dma_slots=ds)
    # span=4 needs a fraction of the big list (fade-frame trail
    # segments bin; 14052 -> 4 bigs at frame 219) — mb=384 also rides
    # the resident SMEM big path.
    tr("chunk=256 exit=0 unroll=4 span=4 mb=384", span=4, mb=384)
    # Grid fusion: several tiles per program amortize the per-grid-step
    # prologue/epilogue (the 2.4x chunk-overhead suspect list).
    for tpp in (2, 4, 8):
        tr(f"chunk=256 exit=0 unroll=4 tpp={tpp}", tpp=tpp)
    # starts stage: searchsorted method A/B in-frame (scan = default;
    # sort merges the bounds into the keys — see starts_probe.py).
    tr("chunk=256 exit=0 unroll=4 starts=sort", sm="sort")
    if not discs_only:
        tr("chunk=256 exit=0 u=4 span=4 starts=sort",
           span=4, mb=max_big, sm="sort")
        tr("chunk=256 exit=0 u=4 span=4 starts=scan", span=4, mb=max_big)
        # cap_rows10 narrow capsule rows (40 B gathers, no table16) on
        # the trail soup — chunk rounds to 252 internally (pack 12).
        tr("chunk=256 exit=0 u=4 span=4 CAP10", span=4, mb=max_big,
           cap10=True)
        tr("chunk=256 exit=0 u=4 span=2 CAP10", mb=max_big, cap10=True)
        tr("chunk=256 exit=0 u=4 span=4 CAP10 tpp=2", span=4,
           mb=max_big, cap10=True, tpp=2)
        tr("chunk=256 exit=0 u=4 span=4 CAP10 tpp=4", span=4,
           mb=max_big, cap10=True, tpp=4)
        tr("chunk=256 exit=0 u=4 span=4 CAP10 tpp=8", span=4,
           mb=max_big, cap10=True, tpp=8)
        tr("chunk=256 exit=0 u=4 span=4 CAP10 dma_slots=4", span=4,
           mb=max_big, cap10=True, dma_slots=4)
        tr("chunk=512 exit=0 u=4 span=4 CAP10", span=4, mb=max_big,
           cap10=True, chunk_rows=512)
        tr("chunk=256 exit=0 u=4 span=4 CAP10 tpp=4 dma=4", span=4,
           mb=max_big, cap10=True, tpp=4, dma_slots=4)
        # rows8 kind-split 32 B rows (one gather granule, interleaved
        # idf lanes): the r5 rows-stage lever — A/B vs CAP10 at the
        # same span/chunk, plus the chunk ladder (group-aligned DMA
        # windows are 128-entry; 256/512 both legal).
        tr("chunk=256 exit=0 u=4 span=4 ROWS8", span=4, mb=max_big,
           rows8=True)
        tr("chunk=512 exit=0 u=4 span=4 ROWS8", span=4, mb=max_big,
           rows8=True, chunk_rows=512)
        tr("chunk=1024 exit=0 u=4 span=4 ROWS8", span=4, mb=max_big,
           rows8=True, chunk_rows=1024)
        tr("chunk=256 exit=0 u=4 span=2 ROWS8", mb=max_big, rows8=True)
        # Sort-carried build (bit-identical rows, no gather at all) —
        # the v6_probe carried-rows verdict, A/B'd in-frame.
        tr("chunk=256 exit=0 u=4 span=4 ROWS8c", span=4, mb=max_big,
           rows8=True, rows8c=True)
        tr("chunk=1024 exit=0 u=4 span=4 ROWS8c", span=4, mb=max_big,
           rows8=True, rows8c=True, chunk_rows=1024)
        # Sort-carried CAP10 build: keeps the fast cap10 kernel while
        # replacing the two-granule 40 B gather with the widened sort.
        tr("chunk=512 exit=0 u=4 span=4 CAP10c", span=4, mb=max_big,
           cap10=True, cap10c=True, chunk_rows=512)
        tr("chunk=1024 exit=0 u=4 span=4 CAP10c", span=4, mb=max_big,
           cap10=True, cap10c=True, chunk_rows=1024)
        # rows9: the renormalized eval with idf IN-ROW (static lanes)
        # — rows8's kernel cost without the interleave scalar tax.
        tr("chunk=512 exit=0 u=4 span=4 ROWS9", span=4, mb=max_big,
           rows9=True, chunk_rows=512)
        tr("chunk=1024 exit=0 u=4 span=4 ROWS9", span=4, mb=max_big,
           rows9=True, chunk_rows=1024)
        tr("chunk=1024 exit=0 u=4 span=4 ROWS9c", span=4, mb=max_big,
           rows9=True, rows9c=True, chunk_rows=1024)
    if discs_only:
        # max_big <= 511 -> one chunk -> RESIDENT SMEM big list
        # (no per-tile big-DMA round-trip).
        tr("chunk=256 exit=0 unroll=4 max_big=256 (resident big)",
           mb=256)
        tr("chunk=256 exit=0 u=4 mb=256 dma_slots=4",
           dma_slots=4, mb=256)
        tr("chunk=256 exit=0 u=4 mb=256 tpp=4", mb=256, tpp=4)
        tr("chunk=256 exit=0 u=4 mb=256 tpp=4 dma_slots=4",
           mb=256, tpp=4, dma_slots=4)
        tr("chunk=512 exit=0 u=4 mb=256 tpp=4",
           chunk_rows=512, mb=256, tpp=4)
        tr("chunk=256 exit=0 u=4 mb=256 tpp=8", mb=256, tpp=8)

        # Full shaded frame: generic by-id gather vs the FUSED (u, v)
        # two-tone epilogue (no per-pixel gather, no table repack).
        from pointcloud_render_tpu.shading.shade import ShadingConfig

        def shaded(uniform, unroll=4):
            look = (((0.3, 0.3, 0.3), (1.0, 1.0, 1.0))
                    if uniform else None)

            def f(p, v):
                soup, cam = make(p, v)
                rgb, d, i = pallas_csr6.render_shaded_csr6(
                    soup, cam, ShadingConfig(), discs_only=True,
                    max_big=256, unroll=unroll, uniform_look=look)
                return (jnp.sum(jnp.where(jnp.isfinite(d), d, 0.0))
                        + jnp.sum(rgb[::8, ::8]))

            return f

        def sknobs(uniform, unroll):
            return dict(kind="shaded", scene=args.scene,
                        uniform_look=uniform, unroll=unroll, max_big=256)

        timed("shaded mb=256 generic by-id gather", shaded(False),
              pos, vel, knobs=sknobs(False, 4))
        timed("shaded mb=256 FUSED uv two-tone", shaded(True), pos, vel,
              knobs=sknobs(True, 4))
        timed("shaded mb=256 FUSED uv unroll=2", shaded(True, 2),
              pos, vel, knobs=sknobs(True, 2))
    else:
        # Full shaded TRAIL frame: the O(P) preshade + 32 B table vs
        # the THREE-TONE 16 B table (no preshade; per-kind colors from
        # representative prims), each with/without the narrow rows.
        from pointcloud_render_tpu.shading.shade import ShadingConfig
        from pointcloud_render_tpu.utils import aot as _aot

        def reps_fn(p, v):
            soup, _ = make(p, v)
            return pallas_csr6.derive_three_tone(soup)

        reps_d, ok = _aot.compile_const_free(reps_fn, pos, vel)(pos, vel)
        if bool(np.asarray(ok)):
            reps = tuple(int(x) for x in np.asarray(reps_d))
            print(f"three-tone reps {reps}", flush=True)
        else:
            # Certificate failed: still time the preshade baseline and
            # the cap10 shaded line (the unattended queue must not lose
            # the whole shade A/B to one disabled knob).
            reps = None
            print("three-tone certificate failed — skipping its lines",
                  flush=True)

        def shaded_t(three, cap10, span=4):
            def f(p, v):
                soup, cam = make(p, v)
                rgb, d, i = pallas_csr6.render_shaded_csr6(
                    soup, cam, ShadingConfig(), max_big=max_big,
                    span=span, allow_exit=False, cap_rows10=cap10,
                    three_tone=reps if three else None)
                return (jnp.sum(jnp.where(jnp.isfinite(d), d, 0.0))
                        + jnp.sum(rgb[::8, ::8]))

            return f

        def tknobs(three, cap10):
            return dict(kind="shaded", scene=args.scene, span=4,
                        three_tone=three, cap_rows10=cap10,
                        max_big=max_big)

        timed("shaded span=4 preshade by-id", shaded_t(False, False),
              pos, vel, knobs=tknobs(False, False))
        if reps is not None:
            timed("shaded span=4 THREE-TONE", shaded_t(True, False),
                  pos, vel, knobs=tknobs(True, False))
            timed("shaded span=4 CAP10 + THREE-TONE", shaded_t(True, True),
                  pos, vel, knobs=tknobs(True, True))
        else:
            timed("shaded span=4 CAP10", shaded_t(False, True),
                  pos, vel, knobs=tknobs(False, True))


if __name__ == "__main__":
    main()
