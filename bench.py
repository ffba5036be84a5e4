"""Benchmark harness: 1080p frames/sec at 1M points on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is the ratio against the 500 FPS/chip north-star target
(BASELINE.md; the reference publishes no numbers of its own).

Workload: the FULL traj_ball 220-frame dolly flythrough over a 1M-point
uniform cloud (world radius 0.002, ~2-6 px splats), rendered at 1080p
with shading by ONE `lax.scan` dispatch whose per-frame camera is the
reference trajectory (scene/camera.py; reference:
traj_ball_renderer.py:281-307).  This is the production serving shape —
run/trajectory renders exactly this way — and timing whole trajectories
keeps the dev tunnel's ~25 ms per-dispatch RTT out of the per-frame
number without hiding any per-frame work (projection, binning, sort,
gather, kernel, and shading all re-run per frame inside the scan).

Robustness (the artifact-of-record contract):
* every device-touching stage retries on transient runtime errors
  (fresh compile + buffers, small backoff, 3 attempts) — the tunnel to
  the dev TPU occasionally drops a dispatch with FAILED_PRECONDITION;
* the JSON line is ALWAYS printed (value 0.0 + "error" on total failure);
* before timing, the compiled kernels' exactness is certified ON THE
  REAL CHIP: a mixed 1080p scene (ground + 20k discs + trail capsules)
  must winner-match the tiled XLA backend 100% (CI only ever runs the
  kernels in CPU interpret mode; this is the hardware gate);
* the pallas6 disc kernel has NO entry capacity (anchor-sorted rows);
  its only truncation risk, big-list overflow, is carried device-side
  through the scan and asserted zero over EVERY frame.

Usage: python bench.py [--points N] [--backend pallas6] [--radius R]
"""

import argparse
import json
import os
import sys
import threading
import time
import traceback

import numpy as np

TARGET_FPS = 500.0  # BASELINE.md north star
LAST_GOOD_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "benchmarks", "results", "last_bench.json")


def _last_good():
    try:
        with open(LAST_GOOD_PATH) as f:
            return json.load(f)
    except Exception:  # noqa: BLE001 — absent/corrupt file = no context
        return None


def _emit(metric, value, vs=None, **extra):
    rec = {"metric": metric, "value": round(float(value), 3),
           "unit": "frames/sec/chip",
           "vs_baseline": round(float(vs if vs is not None
                                      else value / TARGET_FPS), 4)}
    rec.update(extra)
    if "error" in rec and "last_known_good" not in rec:
        lg = _last_good()
        if lg is not None:
            rec["last_known_good"] = lg
    if "error" not in rec and rec["value"] > 0:
        # Persist the last REAL-chip success so a later run that dies on
        # a wedged tunnel can attach it (honestly labelled) for context.
        try:
            import jax

            if jax.default_backend() == "tpu":
                os.makedirs(os.path.dirname(LAST_GOOD_PATH), exist_ok=True)
                with open(LAST_GOOD_PATH, "w") as f:
                    json.dump({"ts": time.time(),
                               "utc": time.strftime(
                                   "%Y-%m-%d %H:%M:%S UTC", time.gmtime()),
                               "record": rec}, f)
        except Exception:  # noqa: BLE001 — persistence is best-effort
            pass
    print(json.dumps(rec))


def _arm_deadline(args, seconds):
    """The JSON line must ALWAYS print — including when the tunneled TPU
    wedges and the first device op hangs forever (observed: jax.devices()
    blocking >17 min at idle CPU after a half-recovered outage).  A
    daemon timer emits the error record and hard-exits at the deadline;
    legitimate runs (compile ~minutes + scan rounds) finish far inside
    it.  Self-termination after a stuck claim is also the documented
    remedy (CLAUDE.md tunnel discipline: kill by PID past ~15 min)."""

    def fire():
        _emit(f"1080p_fps_{args.points // 1000}k_points", 0.0, vs=0.0,
              error=f"deadline: no result within {seconds}s "
                    "(wedged device claim?)")
        sys.stdout.flush()
        os._exit(0)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def _seg_arg(s):
    """--trail-segments/--droplet-segments value: an int count or
    "adaptive" (per-trail slot-optimal k; run/pipeline's
    _adaptive_trail_segment_counts)."""
    return s if s == "adaptive" else int(s)


def _apply_tuned(args):
    """Fill every knob the user left unset from tuned_defaults.json —
    the sweep queue's measured-best winners (utils/tuned.py docstring).
    Explicit CLI flags always win; absent file = builtin defaults."""
    from pointcloud_render_tpu.utils import tuned as _t

    t = _t.load_tuned()
    disc = t.get("disc") or {}
    trail = t.get("trail") or {}
    args.tiles_per_program = _t.fill(args.tiles_per_program, disc,
                                     "tiles_per_program", 1)
    args.dma_slots = _t.fill(args.dma_slots, disc, "dma_slots", 2)
    args.chunk_rows = _t.fill(args.chunk_rows, disc, "chunk_rows", None)
    args.unroll = _t.fill(args.unroll, disc, "unroll", 4)
    ae = _t.fill(args.allow_exit, disc, "allow_exit", "auto")
    args.allow_exit = {True: "on", False: "off"}.get(ae, ae)
    args.starts_method = _t.fill(args.starts_method, disc,
                                 "starts_method", "scan")
    if not args.no_uniform_look and disc.get("uniform_look") is False:
        args.no_uniform_look = True
    args.trail_span = _t.fill(args.trail_span, trail, "span", "auto")
    args.trail_segments = _t.fill(args.trail_segments, trail,
                                  "segments", None)
    args.trail_starts_method = trail.get("starts_method", "scan")
    c10 = _t.fill(args.trail_cap10, trail, "cap_rows10", "off")
    args.trail_cap10 = {True: "on", False: "off"}.get(c10, c10)
    c10c = _t.fill(getattr(args, "trail_cap10_carry", None), trail,
                   "cap10_carry", "off")
    args.trail_cap10_carry = {True: "on", False: "off"}.get(c10c, c10c)
    r8 = _t.fill(getattr(args, "trail_rows8", None), trail, "rows8",
                 "off")
    args.trail_rows8 = {True: "on", False: "off"}.get(r8, r8)
    r8c = _t.fill(getattr(args, "trail_rows8_carry", None), trail,
                  "rows8_carry", "off")
    args.trail_rows8_carry = {True: "on", False: "off"}.get(r8c, r8c)
    r9 = _t.fill(getattr(args, "trail_rows9", None), trail, "rows9",
                 "off")
    args.trail_rows9 = {True: "on", False: "off"}.get(r9, r9)
    r9c = _t.fill(getattr(args, "trail_rows9_carry", None), trail,
                  "rows9_carry", "off")
    args.trail_rows9_carry = {True: "on", False: "off"}.get(r9c, r9c)
    t3 = _t.fill(args.trail_three_tone, trail, "three_tone", "off")
    args.trail_three_tone = {True: "on", False: "off"}.get(t3, t3)
    # Trail-lane kernel knobs (r5): the seg4 sweep measures tpp /
    # dma_slots at the tuned trail soup, so the flagship lanes carry
    # their own grid-fusion/ring-depth picks (exactness-neutral).
    args.trail_tpp = _t.fill(getattr(args, "trail_tpp", None), trail,
                             "tiles_per_program", 1)
    args.trail_dma_slots = _t.fill(getattr(args, "trail_dma_slots", None),
                                   trail, "dma_slots", 2)
    args.trail_chunk_rows = _t.fill(
        getattr(args, "trail_chunk_rows", None), trail, "chunk_rows", None)
    drop = t.get("droplet") or {}
    args.droplet_segments = _t.fill(args.droplet_segments, drop,
                                    "segments", None)
    d10 = _t.fill(args.droplet_cap10, drop, "cap_rows10", "off")
    args.droplet_cap10 = {True: "on", False: "off"}.get(d10, d10)
    d10c = _t.fill(getattr(args, "droplet_cap10_carry", None), drop,
                   "cap10_carry", "off")
    args.droplet_cap10_carry = {True: "on", False: "off"}.get(d10c, d10c)
    d8 = _t.fill(getattr(args, "droplet_rows8", None), drop, "rows8",
                 "off")
    args.droplet_rows8 = {True: "on", False: "off"}.get(d8, d8)
    d8c = _t.fill(getattr(args, "droplet_rows8_carry", None), drop,
                  "rows8_carry", "off")
    args.droplet_rows8_carry = {True: "on", False: "off"}.get(d8c, d8c)
    d9 = _t.fill(getattr(args, "droplet_rows9", None), drop, "rows9",
                 "off")
    args.droplet_rows9 = {True: "on", False: "off"}.get(d9, d9)
    d9c = _t.fill(getattr(args, "droplet_rows9_carry", None), drop,
                  "rows9_carry", "off")
    args.droplet_rows9_carry = {True: "on", False: "off"}.get(d9c, d9c)
    d3 = _t.fill(args.droplet_three_tone, drop, "three_tone", "off")
    args.droplet_three_tone = {True: "on", False: "off"}.get(d3, d3)
    args.droplet_tpp = _t.fill(getattr(args, "droplet_tpp", None), drop,
                               "tiles_per_program", 1)
    args.droplet_dma_slots = _t.fill(
        getattr(args, "droplet_dma_slots", None), drop, "dma_slots", 2)
    args.droplet_chunk_rows = _t.fill(
        getattr(args, "droplet_chunk_rows", None), drop, "chunk_rows",
        None)
    if t:
        print(f"# tuned defaults applied ({_t.TUNED_PATH}): "
              f"{t.get('note', '')}", file=sys.stderr)


def _retry(what, fn, attempts=3, backoff=2.0):
    """Run fn() with retries on device runtime errors (fresh state each
    try is the CALLER's job — fn should recompile/reallocate inside)."""
    import jax

    last = None
    for k in range(attempts):
        try:
            return fn()
        except jax.errors.JaxRuntimeError as e:  # transient tunnel/device
            last = e
            print(f"# retry {k + 1}/{attempts} after {what} failed: "
                  f"{type(e).__name__}: {str(e)[:200]}", file=sys.stderr)
            time.sleep(backoff * (k + 1))
    raise last


def validate_on_chip(verbose=False, tpp=1, dma_slots=2, chunk_rows=None,
                     allow_exit=None, starts_method="scan", unroll6=4):
    """Mixed-scene winner-exactness of the compiled kernel vs the tiled
    backend, on whatever platform is live (the real chip under the
    driver).  Cheap (~20k prims).  Raises on mismatch.  The v6 knob
    params mirror the TIMED configuration (tuned or flagged) so the
    certified kernel is the benched kernel."""
    import jax.numpy as jnp

    from pointcloud_render_tpu.raster import xla_tiled
    from pointcloud_render_tpu.raster.primitives import (
        ScreenPrimitives,
        capsules_from_polylines,
        discs_from_points,
    )
    from pointcloud_render_tpu.raster.render import ground_plane
    from pointcloud_render_tpu.scene.camera import Camera
    from pointcloud_render_tpu.utils import aot

    rng = np.random.default_rng(0)
    cam = Camera(origin=jnp.asarray(np.array([2., 2., 2.], np.float32)),
                 target=jnp.asarray(np.array([0., 0., -0.05], np.float32)))
    n = 20_000
    pos = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    base = rng.uniform(-0.4, 0.4, (500, 1, 3))
    steps = rng.normal(size=(500, 5, 3)) * 0.01
    pts = (base + np.cumsum(steps, axis=1)).astype(np.float32)

    def build(pos, pts):
        return ScreenPrimitives.concatenate([
            ground_plane(cam, 10.0, (0., 0., -0.5)),
            discs_from_points(pos, cam, jnp.full((n,), 0.004),
                              np.array([0.3, 0.3, 0.3], np.float32)),
            capsules_from_polylines(pts, np.ones((500, 5), bool),
                                    cam, 0.002,
                                    np.array([0.2, 1.0, 0.4], np.float32)),
        ])

    def both(pos, pts):
        soup = build(pos, pts)
        dt, it = xla_tiled.rasterize_tiled(soup, cam.width, cam.height,
                                           max_per_tile=1024)
        # v2 kernel, generic rows (the trail/droplet path).
        d2, i2 = rasterize_pallas_csr2(soup, cam.width, cam.height,
                                       no_triangles=True, unroll=4)
        # v2 disc fast path with a measured-capacity prefix gather.
        disc_soup = build_discs(pos)
        ec = true_entry_count(disc_soup, cam.width, cam.height,
                              no_triangles=True)
        d3, i3 = rasterize_pallas_csr2(
            disc_soup, cam.width, cam.height, discs_only=True, unroll=4,
            entry_capacity=262144)
        dt3, it3 = xla_tiled.rasterize_tiled(disc_soup, cam.width,
                                             cam.height, max_per_tile=1024)
        # v3 disc fast path (strict-< merge + entry-index winners), both
        # uncapped and with a capacity prefix — the timed configuration.
        d4, i4 = rasterize_pallas_csr3(disc_soup, cam.width, cam.height,
                                       unroll=4)
        d5, i5 = rasterize_pallas_csr3(disc_soup, cam.width, cam.height,
                                       unroll=4, entry_capacity=262144)
        # v4 generic path on the MIXED scene (capsules binned).
        d6, i6 = rasterize_pallas_csr4(soup, cam.width, cam.height,
                                       unroll=4)
        # v6 anchor-sorted path on the MIXED scene — the pipeline's TPU
        # default for splat/trail scenes — plus its 8-float discs_only
        # mode on the disc soup (the TIMED bench configuration).
        d7, i7 = rasterize_pallas_csr6(soup, cam.width, cam.height,
                                       unroll=4)
        # cap_rows10 narrow capsule rows (exit-off, span 2 AND the trail
        # metric's span-4 walk) — certify Mosaic accepts the 12-per-row
        # packing and winners stay exact before any sweep/bench times it.
        d7a, i7a = rasterize_pallas_csr6(soup, cam.width, cam.height,
                                         unroll=4, cap_rows10=True)
        d7b, i7b = rasterize_pallas_csr6(soup, cam.width, cam.height,
                                         unroll=4, cap_rows10=True, span=4)
        ck = {} if chunk_rows is None else {"chunk_rows": chunk_rows}
        d8, i8 = rasterize_pallas_csr6(disc_soup, cam.width, cam.height,
                                       unroll=unroll6, discs_only=True,
                                       tiles_per_program=tpp,
                                       dma_slots=dma_slots,
                                       allow_exit=allow_exit,
                                       starts_method=starts_method, **ck)
        # v6 FUSED (u, v) two-tone shade (the TIMED shading path) vs
        # the generic by-id gather: same winners, rgb within the
        # FMA-contraction tolerance the interpret tests pin.
        cfg = ShadingConfig()
        look = ((0.3, 0.3, 0.3), (1.0, 1.0, 1.0))
        rgb_f, _, i_f = render_shaded_csr6(
            disc_soup, cam, cfg, discs_only=True, max_big=256,
            uniform_look=look, tiles_per_program=tpp,
            dma_slots=dma_slots, unroll=unroll6,
            starts_method=starts_method, **ck)
        rgb_g, _, i_g = render_shaded_csr6(
            disc_soup, cam, cfg, discs_only=True, max_big=256)
        m_fused = jnp.mean(
            ((i_f == i_g)
             & jnp.all(jnp.abs(rgb_f - rgb_g) <= 2e-6, axis=-1)
             ).astype(jnp.float32))
        return (jnp.mean((i2 == it).astype(jnp.float32)),
                jnp.mean((i3 == it3).astype(jnp.float32)),
                jnp.mean(((i4 == it3) & (i5 == it3)
                          & (i8 == it3)).astype(jnp.float32)),
                jnp.mean(((i6 == it) & (i7 == it) & (i7a == it)
                          & (i7b == it)).astype(jnp.float32)),
                m_fused,
                ec)

    def build_discs(pos):
        return ScreenPrimitives.concatenate([
            ground_plane(cam, 10.0, (0., 0., -0.5)),
            discs_from_points(pos, cam, jnp.full((n,), 0.004),
                              np.array([0.3, 0.3, 0.3], np.float32)),
        ])

    from pointcloud_render_tpu.raster.pallas_csr2 import (
        rasterize_pallas_csr2,
        true_entry_count,
    )
    from pointcloud_render_tpu.raster.pallas_csr3 import rasterize_pallas_csr3
    from pointcloud_render_tpu.raster.pallas_csr4 import rasterize_pallas_csr4
    from pointcloud_render_tpu.raster.pallas_csr6 import (
        rasterize_pallas_csr6,
        render_shaded_csr6,
    )
    from pointcloud_render_tpu.shading.shade import ShadingConfig

    compiled = aot.compile_const_free(both, jnp.asarray(pos),
                                      jnp.asarray(pts))
    m2, m3, m4, m5, m6, ec = (np.asarray(v)
                              for v in compiled(jnp.asarray(pos),
                                                jnp.asarray(pts)))
    if verbose:
        print(f"# on-chip exactness: v2={float(m2)} "
              f"v2disc={float(m3)} v3disc={float(m4)} v4v6mixed={float(m5)} "
              f"v6fused={float(m6)} (entries {int(ec)})", file=sys.stderr)
    assert int(ec) <= 262144, "validation scene outgrew its capacity"
    if not (float(m2) == float(m3) == float(m4)
            == float(m5) == float(m6) == 1.0):
        raise AssertionError(
            f"EXACTNESS REGRESSION on this chip: winner match "
            f"v2={float(m2)} v2disc={float(m3)} "
            f"v3disc={float(m4)} v4v6mixed={float(m5)} "
            f"v6fused={float(m6)} != 1.0")


def run_bench(args):
    import jax
    import jax.numpy as jnp

    from pointcloud_render_tpu.raster.primitives import (
        ScreenPrimitives,
        discs_from_points,
    )
    from pointcloud_render_tpu.raster.render import (
        RasterConfig,
        ground_plane,
        render,
    )
    from pointcloud_render_tpu.scene.camera import (
        TARGETS,
        TOTAL_FRAMES,
        Camera,
        camera_origin_jax,
    )
    from pointcloud_render_tpu.utils import aot

    n = args.points
    rng = np.random.default_rng(0)
    positions = jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)), jnp.float32)
    radii = jnp.full((n,), args.radius, jnp.float32)
    target = np.asarray(TARGETS["traj_ball"], np.float32)

    def make_camera(frame_index):
        return Camera(
            origin=camera_origin_jax("traj_ball", frame_index, TOTAL_FRAMES),
            target=target)

    def soup(camera, positions, radii):
        return ScreenPrimitives.concatenate([
            ground_plane(camera, 10.0, (0.0, 0.0, -0.5)),
            discs_from_points(positions, camera, radii,
                              np.array([0.3, 0.3, 0.3], np.float32)),
        ])

    # The bench scene is discs over big-list furniture.  The default
    # pallas6 disc path needs NO capacity probe (the anchor-sorted row
    # buffer is always exactly P prims); the scan carries the big-list
    # overflow certificate and it is asserted 0 after warmup.  The
    # legacy v2/v3 backends keep their measured-entry-capacity probes.
    entry_capacity = None
    probe_frames = (0, 120, 199, 219)
    if args.backend == "pallas3":
        from pointcloud_render_tpu.raster import pallas_csr3

        cam0 = make_camera(jnp.int32(0))
        w, h = cam0.width, cam0.height

        def probe(fi):
            s = soup(make_camera(fi), positions, radii)
            return (pallas_csr3.true_entry_count3(s, w, h),
                    pallas_csr3.bin_diagnostics3(s, w, h))

        probe_c = aot.compile_const_free(probe, jnp.int32(0))
        ecs, ovf = zip(*[map(int, map(np.asarray, probe_c(jnp.int32(f))))
                         for f in probe_frames])
        assert max(ovf) == 0, f"2x2-span big-list overflow: {ovf}"
        entry_capacity = ((int(max(ecs) * 1.15) + 127) // 128) * 128
        if args.verbose:
            print(f"# true entries over trajectory {ecs}, "
                  f"capacity {entry_capacity}", file=sys.stderr)
    elif args.backend in ("auto", "pallas"):
        from pointcloud_render_tpu.raster import pallas_csr2

        cam0 = make_camera(jnp.int32(0))

        def probe2(fi):
            # Compiled const-free like every other dispatch (CLAUDE.md:
            # eager per-op dispatch pays ~25 ms tunnel RTT each and
            # re-exposes the buffer-loss hazard once compiled programs
            # coexist).
            return pallas_csr2.true_entry_count(
                soup(make_camera(fi), positions, radii),
                cam0.width, cam0.height,
                max_tiles_per_prim=args.max_tiles_per_prim,
                no_triangles=True)

        probe2_c = aot.compile_const_free(probe2, jnp.int32(0))
        ecs = [int(np.asarray(probe2_c(jnp.int32(f))))
               for f in probe_frames]
        entry_capacity = ((int(max(ecs) * 1.15) + 127) // 128) * 128
        if args.verbose:
            print(f"# true entries over trajectory {ecs}, "
                  f"capacity {entry_capacity}", file=sys.stderr)
    # Measured A/B at 1M (r3): the pallas3 uniform_look 4-float shade
    # gather LOSES 1.8 ms/frame — the (E, 4) attr repack costs more
    # than the narrower per-pixel gather saves (42.70 vs 40.87 ms).
    # The option stays available (--uniform-look) for scenes where the
    # row table is reused across frames; the bench keeps the generic
    # gather.
    # pallas6 + discs_only + uniform_look rides the FUSED (u, v) shade:
    # the kernel carries the winner's lambert coordinates and the
    # epilogue is gather-free (unlike the pallas3 gather-based
    # uniform_look, which lost its A/B).  --no-uniform-look reverts to
    # the generic by-id gather for comparison.
    uniform_look = (((0.3, 0.3, 0.3), (1.0, 1.0, 1.0))
                    if (args.backend == "pallas3" and args.uniform_look)
                    or (args.backend == "pallas6"
                        and not args.no_uniform_look) else None)
    # max_big 256 <= one DMA chunk puts the v6 big list (the 2 ground
    # tris + a handful of wide discs; 4 measured over the trajectory)
    # on the RESIDENT SMEM path — no per-tile big-DMA round-trip.  The
    # per-frame big_overflow certificate below fails loudly if a frame
    # ever exceeds it.
    config = RasterConfig(backend=args.backend,
                          max_per_tile=args.max_per_tile,
                          max_tiles_per_prim=args.max_tiles_per_prim,
                          no_triangles=True, discs_only=True,
                          entry_capacity=entry_capacity,
                          max_big=256 if args.backend == "pallas6" else 1024,
                          uniform_look=uniform_look,
                          tiles_per_program=args.tiles_per_program,
                          dma_slots=args.dma_slots,
                          chunk_rows=args.chunk_rows,
                          allow_exit={"on": True,
                                      "off": False}.get(args.allow_exit),
                          starts_method=args.starts_method,
                          unroll=args.unroll)

    with_diag = args.backend == "pallas6"

    def episode(positions, radii):
        """The full 220-frame flythrough as ONE scan: per-frame camera
        eval, projection, binning, sort, gather, kernel, and shading all
        run inside the loop; only a scalar checksum (plus the pallas6
        big-overflow certificate) leaves the device."""

        def body(acc, frame_index):
            camera = make_camera(frame_index)
            s = soup(camera, positions, radii)
            if with_diag:
                fb, diag = render(s, camera, config, return_diag=True)
                ovf = jnp.maximum(acc[1], diag["big_overflow"])
            else:
                fb = render(s, camera, config)
                ovf = acc[1]
            c = (jnp.sum(jnp.where(jnp.isfinite(fb.depth), fb.depth, 0.0))
                 + jnp.sum(fb.rgb[::8, ::8]))
            return (acc[0] + c, ovf), None

        frames = jnp.arange(args.frames, dtype=jnp.int32)
        acc, _ = jax.lax.scan(body, (jnp.float32(0.0), jnp.int32(0)),
                              frames)
        return acc

    # Exactness gate: certify the compiled kernels on this platform
    # before timing (skippable for quick local loops).
    if not args.skip_validate and jax.default_backend() == "tpu":
        _retry("on-chip validation",
               lambda: validate_on_chip(
                   args.verbose,
                   tpp=args.tiles_per_program,
                   dma_slots=args.dma_slots,
                   chunk_rows=args.chunk_rows,
                   allow_exit={"on": True,
                               "off": False}.get(args.allow_exit),
                   starts_method=args.starts_method,
                   unroll6=args.unroll))

    state = {}

    def compile_and_warm():
        state["compiled"] = aot.compile_const_free(episode, positions, radii)
        out = state["compiled"](positions, radii)
        float(np.asarray(out[0]))
        if with_diag and int(np.asarray(out[1])) > 0:
            raise RuntimeError(
                f"disc-scene big-list overflow {int(np.asarray(out[1]))} "
                f"(max_big default) — certificate failed")

    _retry("compile+warmup", compile_and_warm)

    def one_round():
        t0 = time.perf_counter()
        out = state["compiled"](positions, radii)
        # Fetch BOTH scalars: blocking one leaf of an AOT result does
        # not await the program on the tunneled backend.
        float(np.asarray(out[0])), float(np.asarray(out[1]))
        return (time.perf_counter() - t0) / args.frames

    times = []
    k = 0
    while len(times) < args.rounds:
        try:
            times.append(one_round())
        except Exception as e:
            k += 1
            if k > 3:
                raise
            print(f"# round failed ({type(e).__name__}); "
                  f"recompiling ({k}/3)", file=sys.stderr)
            time.sleep(2.0 * k)
            _retry("recompile+warmup", compile_and_warm)
    dt = float(np.median(times))
    fps = 1.0 / dt

    if args.verbose:
        print(f"# backend={args.backend} platform={jax.default_backend()} "
              f"frames={args.frames} median={dt * 1e3:.2f}ms/frame "
              f"splats/s={n * fps:.3e}", file=sys.stderr)

    extra = {}
    if args.trail_frames > 0:
        key = f"trail_fps_{n // 1000}k_points"
        try:
            extra[key] = round(_bench_trail_scene(args, positions), 3)
        except Exception as e:  # noqa: BLE001 — secondary metric
            traceback.print_exc()
            extra[key] = 0.0
            extra["trail_error"] = f"{type(e).__name__}: {str(e)[:200]}"
    if args.droplet_frames > 0:
        key = f"droplet_fps_{n // 1000}k_points"
        try:
            extra[key] = round(_bench_droplet_scene(args, positions), 3)
        except Exception as e:  # noqa: BLE001 — tertiary metric
            traceback.print_exc()
            extra[key] = 0.0
            extra["droplet_error"] = f"{type(e).__name__}: {str(e)[:200]}"

    _emit(f"1080p_fps_{n // 1000}k_points", fps, **extra)


def _bench_trail_scene(args, positions):
    """The flagship traj_ball TRAIL scene (ground + spheres + velocity
    trails, /root/reference/traj_ball_renderer.py:309-333) at the same
    point count / 1080p through the production pipeline soup builder —
    one lax.scan over a spread of trajectory frames (VERDICT r2 item 2:
    a driver-visible number for the reference's primary workload)."""
    return _bench_soup_scene(args, positions, "traj_ball", "capsule",
                             args.trail_frames,
                             trail_segments=args.trail_segments,
                             cap10=getattr(args, "trail_cap10",
                                           "off") == "on",
                             cap10_carry=getattr(
                                 args, "trail_cap10_carry",
                                 "off") == "on",
                             rows8=getattr(args, "trail_rows8",
                                           "off") == "on",
                             rows8_carry=getattr(
                                 args, "trail_rows8_carry",
                                 "off") == "on",
                             rows9=getattr(args, "trail_rows9",
                                           "off") == "on",
                             rows9_carry=getattr(
                                 args, "trail_rows9_carry",
                                 "off") == "on",
                             three_tone_on=getattr(args,
                                                   "trail_three_tone",
                                                   "off") == "on",
                             span_arg=args.trail_span or "auto",
                             starts_method=getattr(
                                 args, "trail_starts_method", "scan"),
                             tpp=getattr(args, "trail_tpp", 1) or 1,
                             dma_slots=getattr(args, "trail_dma_slots",
                                               2) or 2,
                             chunk_rows=getattr(args, "trail_chunk_rows",
                                                None))


def _bench_droplet_scene(args, positions):
    """The traj_vel DROPLET scene (ground + droplet splats + fading
    velocity trails, /root/reference/traj_vel_renderer.py:409-439) at
    the same point count / 1080p, capsule LOD (disc head + tapered tail
    capsule — the production LOD at cloud scale; mesh LOD instances
    640 triangles per point).  Carries its own tuned knob set
    (tuned_defaults.json "droplet"; geometry knobs certified against
    the traj_vel fidelity scene)."""
    return _bench_soup_scene(args, positions, "traj_vel", "capsule",
                             args.droplet_frames,
                             trail_segments=args.droplet_segments,
                             cap10=getattr(args, "droplet_cap10",
                                           "off") == "on",
                             cap10_carry=getattr(
                                 args, "droplet_cap10_carry",
                                 "off") == "on",
                             rows8=getattr(args, "droplet_rows8",
                                           "off") == "on",
                             rows8_carry=getattr(
                                 args, "droplet_rows8_carry",
                                 "off") == "on",
                             rows9=getattr(args, "droplet_rows9",
                                           "off") == "on",
                             rows9_carry=getattr(
                                 args, "droplet_rows9_carry",
                                 "off") == "on",
                             three_tone_on=getattr(args,
                                                   "droplet_three_tone",
                                                   "off") == "on",
                             tpp=getattr(args, "droplet_tpp", 1) or 1,
                             dma_slots=getattr(args, "droplet_dma_slots",
                                               2) or 2,
                             chunk_rows=getattr(args,
                                                "droplet_chunk_rows",
                                                None))


def _bench_soup_scene(args, positions, preset_name, droplet_lod,
                      n_frames, trail_segments=None, cap10=False,
                      three_tone_on=False, span_arg="auto",
                      starts_method="scan", tpp=1, dma_slots=2,
                      chunk_rows=None, rows8=False, rows8_carry=False,
                      cap10_carry=False, rows9=False, rows9_carry=False):
    """Scan-render ``n_frames`` trajectory frames of a full pipeline
    soup scene (ground + splats + trails) on the v6 kernel; returns
    device-side FPS.  Big-list capacity is probed over the trajectory
    (span auto-selected) and certified per frame by the scan-carried
    overflow diag.  cap10/three_tone are passed EXPLICITLY by the
    caller: the tuned trail knobs apply to the trail metric only — the
    droplet metric was never A/B'd under them."""
    import jax
    import jax.numpy as jnp

    from pointcloud_render_tpu.configs import PRESETS
    from pointcloud_render_tpu.raster.render import RasterConfig, render
    from pointcloud_render_tpu.run.pipeline import build_primitives
    from pointcloud_render_tpu.scene.camera import (
        TARGETS,
        TOTAL_FRAMES,
        Camera,
        camera_origin_jax,
    )
    from pointcloud_render_tpu.utils import aot

    preset = PRESETS[preset_name]
    target = np.asarray(TARGETS[preset.camera_preset], np.float32)

    def make_camera(frame_index):
        return Camera(
            origin=camera_origin_jax(preset.camera_preset, frame_index,
                                     TOTAL_FRAMES),
            target=target)

    n = positions.shape[0]
    rng = np.random.default_rng(1)
    velocities = jnp.asarray(rng.normal(0, 2, (n, 3)), jnp.float32)
    # Trail length peaks at frame 19 and holds (trail_length_scale);
    # sample the whole full-trail phase 20..219 INCLUDING the 200-219
    # fade tail (closest camera), whose ~13k past-2x2-span segments ride
    # the big list — streamed from HBM in DMA chunks since r3, so there
    # is no SMEM-resident size ceiling on max_big anymore.
    frames = np.linspace(20, 219, n_frames).astype(np.int32)

    def soup(fi):
        camera = make_camera(fi)
        return build_primitives(preset, camera, positions, velocities,
                                fi, droplet_lod=droplet_lod,
                                trail_segments=trail_segments), camera

    cam0 = make_camera(jnp.int32(0))
    w, h = cam0.width, cam0.height

    # The v6 anchor-sorted kernel (the pipeline's TPU default) has no
    # entry capacity to probe — only the big list needs sizing: closest-
    # dolly frames push long trail segments past the 2x2 span (+margin;
    # the kernel big loop is O(tiles x actual count) so only those
    # frames pay; the scan's diag certificate re-checks every frame).
    from pointcloud_render_tpu.raster import pallas_csr6

    probe_frames = tuple(dict.fromkeys(
        [frames[0], frames[len(frames) // 2]]
        + ([frames[-2]] if len(frames) >= 2 else []) + [frames[-1]]))

    def probe(fi):
        # bin_diagnostics6 returns overflow past max_big; max_big=0
        # makes it the raw big COUNT.  return_binned adds the binned
        # prefix length — the row_budget probe input for adaptive
        # trails.  All spans in one compile (each extra sort is ~15 ms
        # next to the probe's compile time).
        s, _ = soup(fi)
        return (pallas_csr6.bin_diagnostics6(s, w, h, span=2, max_big=0,
                                             return_binned=True),
                pallas_csr6.bin_diagnostics6(s, w, h, span=4, max_big=0,
                                             return_binned=True),
                pallas_csr6.bin_diagnostics6(s, w, h, span=8, max_big=0,
                                             return_binned=True))

    pc = aot.compile_const_free(probe, jnp.int32(0))
    counts = [tuple(tuple(int(np.asarray(x)) for x in v)
                    for v in pc(jnp.int32(int(f))))
              for f in probe_frames]
    bigs_by_span = {2: [c[0][0] for c in counts],
                    4: [c[1][0] for c in counts],
                    8: [c[2][0] for c in counts]}
    binned_by_span = {2: [c[0][1] for c in counts],
                      4: [c[1][1] for c in counts],
                      8: [c[2][1] for c in counts]}
    if span_arg == "auto":
        # Fade-frame trail segments flood the big list at narrow spans
        # (14k at span 2 / segments 8; 26k at span 4 / segments 2):
        # each big prim is evaluated at EVERY tile, so past ~2k the
        # next span up (4x the classes, a wider searchsorted) wins.
        # Pick the smallest span whose worst frame stays under 2k.
        span = next((s for s in (2, 4, 8)
                     if max(bigs_by_span[s]) <= 2048), 8)
    else:
        span = int(span_arg)
    bigs = bigs_by_span[span]
    # max_big 384 -> big_pad 512 = one chunk = the RESIDENT SMEM big
    # list (no per-tile big DMA); bigger lists round up to 256s.
    need = int(max(bigs) * 1.5) + 64
    max_big = 384 if need <= 384 else ((need + 255) // 256) * 256
    if max_big > 65536:
        # A big list this size means the span/segments combination is
        # wrong for the scene (every tile walks every big prim) — and a
        # ~650k-row big list has FAULTED the TPU worker outright
        # (queue B, segments=1 at span 4).  Fail the metric BEFORE
        # compiling anything the chip has to execute.
        raise RuntimeError(
            f"{preset_name}: probed big list {max_big} rows at span "
            f"{span} — refusing to compile (pick a wider span or more "
            f"segments)")
    if args.verbose:
        print(f"# {preset_name} big counts {bigs} max_big {max_big} "
              f"span {span}",
              file=sys.stderr)
    three_tone = None
    if three_tone_on:
        # Per-kind representative prim ids + the device-side exactness
        # certificate (per-kind-constant colors, shared tri normal).
        # One tiny compiled dispatch; the soup layout is static across
        # frames.  Soups whose capsules carry TWO colors (droplet
        # presets: tail capsules + trails) fall through to the
        # four-tone derivation; a failed certificate falls back to the
        # preshade path — a tuned knob may cost milliseconds, never
        # correctness.
        def reps_fn(fi):
            s, _ = soup(fi)
            r3, ok3 = pallas_csr6.derive_three_tone(s)
            r4, ok4 = pallas_csr6.derive_four_tone(s)
            return r3, ok3, r4, ok4

        rc = aot.compile_const_free(reps_fn, jnp.int32(int(frames[0])))
        reps3, ok3, reps4, ok4 = rc(jnp.int32(int(frames[0])))
        if bool(np.asarray(ok3)):
            three_tone = tuple(int(v) for v in np.asarray(reps3))
        elif bool(np.asarray(ok4)):
            three_tone = tuple(int(v) for v in np.asarray(reps4))
        else:
            print(f"# {preset_name} NOT per-part-constant — "
                  "three_tone disabled for this scene", file=sys.stderr)
        if args.verbose:
            print(f"# {preset_name} tone reps {three_tone}",
                  file=sys.stderr)
    row_budget = None
    if trail_segments == "adaptive":
        # Adaptive trails leave rows past each trail's per-frame k
        # INVALID: the sorted order's binned prefix is the only part
        # the row gather needs.  Size the static cap from the probed
        # worst frame (+10% + slack for the unprobed frames); the
        # scan-carried row_overflow certificate below fails the run
        # loudly if any frame exceeds it.
        need_rows = int(max(binned_by_span[span]) * 1.10) + 8192
        row_budget = -(-need_rows // 4096) * 4096
        if args.verbose:
            print(f"# {preset_name} adaptive trails: binned "
                  f"{binned_by_span[span]} -> row_budget {row_budget}",
                  file=sys.stderr)
    if rows9 and (cap10 or rows8):
        # Mutually exclusive kernel modes; precedence for mixed flag
        # sets: rows9 > rows8 > cap10 (tuned files never carry two).
        print(f"# {preset_name}: rows9 supersedes cap_rows10/rows8",
              file=sys.stderr)
        cap10 = rows8 = False
    if rows8 and cap10:
        print(f"# {preset_name}: rows8 supersedes cap_rows10",
              file=sys.stderr)
        cap10 = False
    config = RasterConfig(backend="pallas6", no_triangles=True,
                          max_big=max_big, span=span,
                          starts_method=starts_method,
                          cap_rows10=cap10, rows8=rows8,
                          rows8_carry=rows8 and rows8_carry,
                          cap10_carry=cap10 and cap10_carry,
                          rows9=rows9,
                          rows9_carry=rows9 and rows9_carry,
                          row_budget=row_budget,
                          three_tone=three_tone,
                          tiles_per_program=tpp, dma_slots=dma_slots,
                          chunk_rows=chunk_rows,
                          # tpp > 1 rides the straight-line fori walk;
                          # the generic span-2 soup would otherwise
                          # auto-enable the depth exit and conflict.
                          allow_exit=False if tpp > 1 else None)

    def episode(positions, velocities):
        def body(acc, fi):
            s, camera = soup(fi)
            fb, diag = render(s, camera, config, return_diag=True)
            c = (jnp.sum(jnp.where(jnp.isfinite(fb.depth), fb.depth, 0.0))
                 + jnp.sum(fb.rgb[::8, ::8]))
            return (acc[0] + c,
                    jnp.maximum(acc[1], diag["big_overflow"]),
                    jnp.maximum(acc[2], diag["row_overflow"])), None

        acc, _ = jax.lax.scan(
            body, (jnp.float32(0.0), jnp.int32(0), jnp.int32(0)),
            jnp.asarray(frames))
        return acc

    compiled = _retry(f"{preset_name} compile", lambda: aot.compile_const_free(
        episode, positions, velocities))
    out = compiled(positions, velocities)
    _, ovf, rovf = (np.asarray(v) for v in out)
    if int(ovf) > 0:
        raise RuntimeError(
            f"{preset_name}-scene certificate failed: big-list overflow "
            f"{int(ovf)} (max_big {max_big})")
    if int(rovf) > 0:
        raise RuntimeError(
            f"{preset_name}-scene certificate failed: row-budget overflow "
            f"{int(rovf)} (row_budget {row_budget})")
    times = []
    for _ in range(max(1, args.rounds - 1)):
        t0 = time.perf_counter()
        out = compiled(positions, velocities)
        float(np.asarray(out[0]))
        times.append((time.perf_counter() - t0) / len(frames))
    dt = float(np.median(times))
    if args.verbose:
        print(f"# {preset_name} scene: {dt * 1e3:.2f} ms/frame over "
              f"{len(frames)} frames", file=sys.stderr)
    return 1.0 / dt


def main():
    # Persistent compile cache (works with the axon backend; saves the
    # multi-minute scan/kernel compiles on every rerun).
    try:
        import jax  # noqa: PLC0415

        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    except Exception:
        pass
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=1_000_000)
    ap.add_argument("--backend", default="pallas6",
                    help="pallas6 (anchor-sorted disc path, the default)"
                         " | pallas3 | pallas | tiled | ...")
    ap.add_argument("--radius", type=float, default=0.002)
    ap.add_argument("--frames", type=int, default=220,
                    help="trajectory frames per scan dispatch")
    ap.add_argument("--rounds", type=int, default=3,
                    help="timing rounds (median taken)")
    ap.add_argument("--max-per-tile", type=int, default=4096)
    ap.add_argument("--max-tiles-per-prim", type=int, default=4)
    ap.add_argument("--trail-frames", type=int, default=24,
                    help="frames for the secondary trail-scene metric "
                         "(0 disables)")
    ap.add_argument("--droplet-frames", type=int, default=12,
                    help="frames for the tertiary traj_vel droplet-scene "
                         "metric, capsule LOD (default ON: the driver's "
                         "flagless artifact run must carry all three "
                         "metrics — VERDICT r3 weak #5; 0 disables)")
    ap.add_argument("--trail-segments", type=_seg_arg, default=None,
                    help="capsules per velocity trail for the trail "
                         "metric (default: pipeline's 8; fewer segments "
                         "shrink the 9M-prim soup ~linearly but bin "
                         "quadratically more tiles on diagonal trails "
                         "— a per-scene A/B lever)")
    ap.add_argument("--trail-span", default=None,
                    choices=("auto", "2", "4", "8"),
                    help="v6 binning span for the trail metric: wider "
                         "spans bin the long segments that flood the "
                         "big list at narrower ones (auto: smallest "
                         "span whose probed worst-frame big count "
                         "stays <= 2048; 8 serves segments <= 2 whose "
                         "fade-frame capsules pass 128 px)")
    ap.add_argument("--uniform-look", action="store_true",
                    help="pallas3 two-tone 4-float shade gather "
                         "(measured 1.8 ms SLOWER at 1M — see bench "
                         "source comment)")
    ap.add_argument("--no-uniform-look", action="store_true",
                    help="disable the pallas6 fused (u, v) two-tone "
                         "shade (A/B escape)")
    # v6 knob flags default to None = "tuned_defaults.json, else builtin"
    # (utils/tuned.py): the sweep queue distills its winners into that
    # file so the driver's FLAGLESS end-of-round run times the
    # measured-best configuration without anyone re-editing defaults.
    ap.add_argument("--tiles-per-program", type=int, default=None,
                    help="v6 grid fusion: tiles per pallas program "
                         "(exit-off walk; kernel6_sweep A/B knob; "
                         "default tuned|1)")
    ap.add_argument("--dma-slots", type=int, default=None,
                    help="v6 exit-off DMA ring depth (default tuned|2)")
    ap.add_argument("--chunk-rows", type=int, default=None,
                    help="v6 binned-row DMA chunk (default tuned|kernel)")
    ap.add_argument("--unroll", type=int, default=None,
                    help="merge-accumulator chains (default tuned|4)")
    ap.add_argument("--allow-exit", default=None,
                    choices=("auto", "on", "off"),
                    help="v6 depth early-exit walk (default tuned|auto "
                         "policy; the fused uv shade forces off)")
    ap.add_argument("--starts-method", default=None,
                    choices=("scan", "sort"),
                    help="v6 CSR range-starts stage (default tuned|scan)")
    ap.add_argument("--trail-cap10", default=None, choices=("on", "off"),
                    help="v6 narrow 10-float capsule rows for the trail "
                         "metric (exit-off tri-less soups; default "
                         "tuned|off until measured on chip)")
    ap.add_argument("--trail-cap10-carry", default=None,
                    choices=("on", "off"),
                    help="cap10 build variant: carry the 10 row "
                         "columns through the binning sort (the 40 B "
                         "row pays two 32 B gather granules; "
                         "bit-identical, pure perf A/B)")
    ap.add_argument("--trail-rows8", default=None, choices=("on", "off"),
                    help="v6 kind-split 8-float rows for the trail "
                         "metric (one 32 B gather granule; renormalized "
                         "capsule eval — a FIDELITY knob, selected by "
                         "pick_tuned only against a certificate)")
    ap.add_argument("--trail-rows8-carry", default=None,
                    choices=("on", "off"),
                    help="rows8 build variant: carry row columns "
                         "through the binning sort (bit-identical; "
                         "pure perf A/B)")
    ap.add_argument("--trail-rows9", default=None, choices=("on", "off"),
                    help="v6 kind-split 9-float rows (rows8's "
                         "renormalized eval with idf in-row; same "
                         "certificate records)")
    ap.add_argument("--trail-rows9-carry", default=None,
                    choices=("on", "off"),
                    help="rows9 sort-carried build (bit-identical)")
    ap.add_argument("--trail-three-tone", default=None,
                    choices=("on", "off"),
                    help="per-kind-constant shade for the trail metric "
                         "(skips the O(P) preshade pass; default "
                         "tuned|off until measured on chip)")
    ap.add_argument("--trail-tpp", type=int, default=None,
                    help="trail lane tiles_per_program (grid fusion; "
                         "tuned trail.tiles_per_program)")
    ap.add_argument("--trail-dma-slots", type=int, default=None,
                    help="trail lane DMA ring depth (tuned "
                         "trail.dma_slots)")
    ap.add_argument("--trail-chunk-rows", type=int, default=None,
                    help="trail lane binned-row DMA chunk (tuned "
                         "trail.chunk_rows; cap10 rounds to pack 12)")
    ap.add_argument("--droplet-tpp", type=int, default=None,
                    help="droplet lane tiles_per_program")
    ap.add_argument("--droplet-dma-slots", type=int, default=None,
                    help="droplet lane DMA ring depth")
    ap.add_argument("--droplet-chunk-rows", type=int, default=None,
                    help="droplet lane binned-row DMA chunk")
    ap.add_argument("--droplet-segments", type=_seg_arg, default=None,
                    help="capsules per velocity trail for the DROPLET "
                         "metric (default tuned|pipeline's 8; geometry "
                         "knob — pick_tuned only selects it against the "
                         "traj_vel fidelity certificate)")
    ap.add_argument("--droplet-cap10", default=None, choices=("on", "off"),
                    help="v6 narrow capsule rows for the droplet metric "
                         "(default tuned|off)")
    ap.add_argument("--droplet-cap10-carry", default=None,
                    choices=("on", "off"),
                    help="cap10 sort-carried build for the droplet "
                         "metric (bit-identical; pure perf A/B)")
    ap.add_argument("--droplet-rows8", default=None,
                    choices=("on", "off"),
                    help="v6 kind-split 8-float rows for the droplet "
                         "metric (fidelity knob, certificate-gated)")
    ap.add_argument("--droplet-rows8-carry", default=None,
                    choices=("on", "off"),
                    help="rows8 sort-carried build for the droplet "
                         "metric (bit-identical; pure perf A/B)")
    ap.add_argument("--droplet-rows9", default=None,
                    choices=("on", "off"),
                    help="v6 kind-split 9-float rows for the droplet "
                         "metric")
    ap.add_argument("--droplet-rows9-carry", default=None,
                    choices=("on", "off"),
                    help="rows9 sort-carried build (bit-identical)")
    ap.add_argument("--droplet-three-tone", default=None,
                    choices=("on", "off"),
                    help="per-kind-constant shade for the droplet metric "
                         "(default tuned|off)")
    ap.add_argument("--deadline", type=int,
                    default=int(os.environ.get("BENCH_DEADLINE_S", 2400)),
                    help="hard wall-clock cap in seconds; past it the "
                         "error JSON line prints and the process exits "
                         "(0 disables)")
    ap.add_argument("--skip-validate", action="store_true")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()
    _apply_tuned(args)

    timer = _arm_deadline(args, args.deadline) if args.deadline else None
    try:
        run_bench(args)
        if timer is not None:
            timer.cancel()
    except BaseException as e:  # noqa: BLE001 — the JSON line must ALWAYS print
        traceback.print_exc()
        _emit(f"1080p_fps_{args.points // 1000}k_points", 0.0, vs=0.0,
              error=f"{type(e).__name__}: {str(e)[:300]}")
        sys.exit(0)


if __name__ == "__main__":
    main()
