"""Certify the trail_segments GEOMETRY knob's winner-flip rate.

``trail_segments`` is the one tuned knob that changes geometry (coarser
capsule chord/z interpolation vs the reference's 21-point polyline —
run/pipeline.build_primitives docstring).  The tuned-defaults contract
is "knobs cost milliseconds, never correctness", so pick_tuned refuses
to flip production to a segment count unless this certificate says its
measured per-trail-pixel flip rate is under BOUND (VERDICT r3 item 3).

Writes benchmarks/results/fidelity_trail_segments.json:
  {"bound": ..., "scene": {...}, "rates": {"4": {...}, "8": {...}}}
where each rate record is utils.fidelity.trail_segments_flip_rate's
output (frame_rate = flips/all pixels, trail_rate = flips/trail pixels —
the density-invariant number the bound applies to).

Run (CPU is fine — the tiled backend is exact everywhere):
  python benchmarks/fidelity_trail.py [--segments 4,8] [--points 1500]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Acceptance bound on the per-trail-pixel winner-flip rate.  Measured:
# 1.1e-4 at CI scale (1500 pts / 480x270) and ~2.4e-3 at the 4x-denser
# certificate scene — for segments 4 AND 8 ALIKE (2.46e-3 vs 2.32e-3:
# the production default of 8 is already this far from the 21-point
# polyline, so dropping to 4 adds ~1e-4).  0.5% = 2x the densest
# measured rate: loose enough to absorb scene noise, tight enough that
# a knob that actually broke geometry (rates in the percents) is
# refused.
BOUND = 5e-3

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results",
                   "fidelity_trail_segments.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--segments", default="4,8,adaptive")
    ap.add_argument("--points", type=int, default=6000,
                    help="6000 = the production-gating scale (4x the "
                         "CI scene's density; the rates pick_tuned "
                         "records in tuned_defaults.json)")
    # 120,199 = the gating scene's frames (the r4 queue certificate that
    # tuned_defaults.json records; reproduced bit-exactly on this tree).
    # Frame 60 is deliberately EXCLUDED: at the certificate film
    # (480x270) the far-dolly camera renders trails at ~subpixel scale,
    # so the per-trail-pixel DENOMINATOR starves and the ratio inflates
    # ~10x (2.66e-2 vs 2.46e-3) while becoming segment-INDEPENDENT —
    # the flips it counts are the constant per-head end-cap ulp
    # difference (the k=20 build's duplicated final vertex renders a
    # degenerate trail end-cap at the point position; any k<20 build
    # has no such cap), not chord-interpolation error.  See
    # benchmarks/fidelity_decompose.py for the attribution.
    ap.add_argument("--frames", default="120,199")
    ap.add_argument("--presets", default="traj_ball,traj_vel",
                    help="one certificate per preset: the trail metric "
                         "certifies against traj_ball, the droplet "
                         "metric against traj_vel (its trails fade on a "
                         "different schedule)")
    ap.add_argument("--rows8", action="store_true",
                    help="additionally certify each segment count WITH "
                         "the rows8 renormalized capsule eval (records "
                         "keyed '<segments>+rows8'; the candidate "
                         "renders through the cap8 oracle at the "
                         "production span)")
    ap.add_argument("--rows8-span", type=int, default=4,
                    help="binned-vs-big classification span for the "
                         "rows8 records (the production trail span)")
    args = ap.parse_args()

    import jax

    # Exactness work, not perf work — never claim the TPU tunnel.
    # (Set BEFORE any device op; probing default_backend() first would
    # itself initialize — and claim — the tunneled chip.)
    jax.config.update("jax_platforms", "cpu")

    from pointcloud_render_tpu.utils.fidelity import trail_segments_flip_rate

    frames = tuple(int(f) for f in args.frames.split(","))
    scenes = {}
    for preset in args.presets.split(","):
        rates = {}
        for segs in (s if s == "adaptive" else int(s)
                     for s in args.segments.split(",")):
            variants = [("", {})]
            if args.rows8:
                variants.append(("+rows8",
                                 dict(capsule_eval="cap8",
                                      capsule_span=args.rows8_span)))
            for suffix, extra in variants:
                r = trail_segments_flip_rate(segs, n_points=args.points,
                                             frames=frames,
                                             preset_name=preset, **extra)
                rates[f"{segs}{suffix}"] = r
                status = ("OK" if r["trail_rate"] <= BOUND
                          else "over abs bound")
                print(f"{preset} segments={segs}{suffix} "
                      f"trail_rate={r['trail_rate']:.2e} "
                      f"frame_rate={r['frame_rate']:.2e}  [{status}]",
                      flush=True)
        anchor = (rates.get("8") or {}).get("trail_rate")
        if anchor is not None:
            # The tuner's actual criterion (pick_tuned.certify_geometry)
            # is max(bound, default-8 rate + margin): a scene whose
            # BASELINE discrepancy exceeds the absolute bound still
            # takes knobs with negligible marginal cost.
            print(f"{preset} default-8 anchor {anchor:.2e}; marginal "
                  f"cost of coarser counts: "
                  + ", ".join(f"{s}: {rates[s]['trail_rate'] - anchor:+.1e}"
                              for s in rates if s != "8"), flush=True)
        scenes[preset] = {
            "scene": {"preset": preset, "points": args.points,
                      "frames": list(frames), "film": [480, 270],
                      "reference_segments": 20},
            "rates": rates}

    # Provenance stamp (VERDICT r4 weak #3: the certificate that gates
    # production must be reconstructible from the committed file alone —
    # round 4's gating numbers were generated on the TPU queue at a
    # denser scale and never committed, leaving three mutually
    # inconsistent flip-rate sets in the repo).
    import subprocess
    import time as _time

    try:
        git = subprocess.run(
            ["git", "-C", os.path.dirname(OUT), "rev-parse", "HEAD"],
            capture_output=True, text=True, timeout=10).stdout.strip()
    except Exception:
        git = ""
    record = {"bound": BOUND, "scenes": scenes,
              "provenance": {
                  "git": git or "unknown",
                  "generated_utc": _time.strftime(
                      "%Y-%m-%d %H:%M:%S", _time.gmtime()),
                  "argv": sys.argv[1:],
                  "note": ("production-gating scale is --points 6000 "
                           "(the r4 queue's 4x-denser scene); CI "
                           "re-measures at 1500 against the bound "
                           "only (tests/test_tuned.py)")}}
    # Back-compat top-level view of the traj_ball rates (the trail
    # metric's preset) so older readers keep working.
    if "traj_ball" in scenes:
        record["scene"] = scenes["traj_ball"]["scene"]
        record["rates"] = scenes["traj_ball"]["rates"]
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(record, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
