"""Distill sweep results into tuned_defaults.json (see utils/tuned.py).

The TPU sits behind a single-claimant tunnel that drops for hours, so
the knob sweeps run unattended from a probe queue.  This script closes
the loop: it reads the machine-readable sweep records
(benchmarks/results/sweep6_*.jsonl, written by kernel6_sweep.py) plus
the trail A/B bench JSON lines from the queue log, picks the
measured-best configuration, and writes ``tuned_defaults.json`` at the
repo root — which bench.py then uses to fill any knob not passed
explicitly.  A flagless driver run therefore times the winners without
anyone editing defaults by hand.

Every knob is exactness-neutral (the interpret-mode knob-matrix tests
pin bit-identical winners across all values; three_tone verifies its
per-kind-constant precondition device-side in bench.py and falls back
otherwise), so the worst a bad pick can do is cost milliseconds — and
the queue re-runs bench.py after this script as confirmation.

Run: python benchmarks/pick_tuned.py [--log /tmp/tpu_batch.log] [--dry]
"""
import argparse
import json
import os
import re
import sys

# The queue log's step-header format — ONE definition (queue_summary.py
# imports it; a header tweak must not silently desynchronize the two
# parsers).
SECTION_RE = re.compile(r"=== (.+?) \w{3} \w{3} .*===")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(ROOT, "benchmarks", "results")
OUT = os.path.join(ROOT, "tuned_defaults.json")

# The builtin bench disc configuration (bench.py's hard defaults) —
# used as the do-nothing baseline so sweep noise under ~1.5% never
# churns the tuned file.
BUILTIN = dict(chunk_rows=256, allow_exit=False, unroll=4, dma_slots=2,
               tiles_per_program=1, starts_method="scan")

RASTER_KEYS = ("tiles_per_program", "dma_slots", "chunk_rows", "unroll",
               "allow_exit", "starts_method")

# Knobs that change GEOMETRY/RENDERING, not just milliseconds.  The
# tuner may only select them when a fidelity certificate bounds their
# winner-flip rate (benchmarks/fidelity_trail.py; VERDICT r3 item 3) —
# everything else in tuned_defaults.json is exactness-neutral by
# construction.  rows8 (renormalized capsule eval, ULP-level rounding
# drift) certifies via the "<segments>+rows8" record.
GEOMETRY_KNOBS = ("segments", "rows8", "rows9")
FIDELITY_CERT = os.path.join(RESULTS, "fidelity_trail_segments.json")


# Marginal fidelity allowance over the PRODUCTION DEFAULT segment
# count: a scene whose baseline already sits past the absolute bound
# (traj_vel measures ~8.9e-3 at the shipped default of 8 — its fading
# trails diverge more from the 21-point polyline at EVERY count) may
# still take a knob whose marginal flip cost is negligible; a knob that
# adds more than this on top of the default is refused regardless.
GEOMETRY_REL_MARGIN = 2e-3
DEFAULT_SEGMENTS = "8"  # run/pipeline.VEL_TRAIL_RENDER_SEGMENTS


def certify_geometry(trail, preset="traj_ball"):
    """Drop uncertified geometry knobs from a scene pick, in place.

    Returns a note string.  A ``segments`` pick survives only when the
    fidelity certificate has a measured rate for that exact count ON
    THIS PRESET and it is within ``max(bound, default_rate + margin)``
    — the absolute bound, relaxed to a marginal allowance over the
    production default where the scene's BASELINE discrepancy already
    exceeds it.  The certified rate is copied into the tuned file
    (``segments_flip_rate``) so the bound travels with the knob.

    A ``rows8`` pick certifies the same way against the COMBINED
    "<segments>+rows8" record (the candidate rendered with the
    renormalized capsule eval vs the reference polyline) and records
    ``rows8_flip_rate``."""
    notes = []
    try:
        with open(FIDELITY_CERT) as f:
            cert = json.load(f)
        scenes = cert.get("scenes") or {"traj_ball": cert}
        rates = scenes[preset]["rates"]
        bound = float(cert["bound"])
    except (OSError, KeyError, ValueError, TypeError):
        rates, bound = None, None
    anchor = None if rates is None else \
        (rates.get(DEFAULT_SEGMENTS) or {}).get("trail_rate")

    def limit():
        return bound if anchor is None else max(
            bound, anchor + GEOMETRY_REL_MARGIN)

    def refuse(knob, extra_pop, why):
        val = trail.pop(knob, None)
        trail.pop(extra_pop, None)
        notes.append(f"REFUSED {knob}={val}: {why}")

    if trail.get("segments") is None:
        trail.pop("segments", None)
        trail.pop("segments_flip_rate", None)
    elif rates is None:
        refuse("segments", "segments_flip_rate",
               f"no {preset} fidelity certificate ({FIDELITY_CERT}) — "
               "run benchmarks/fidelity_trail.py")
    else:
        rec = rates.get(str(trail["segments"]))
        if rec is None:
            refuse("segments", "segments_flip_rate",
                   f"no {preset} certificate record")
        elif rec["trail_rate"] > limit():
            refuse("segments", "segments_flip_rate",
                   f"flip rate {rec['trail_rate']:.2e} over limit "
                   f"{limit():.1e}"
                   + ("" if anchor is None
                      else f" (default-{DEFAULT_SEGMENTS} anchor "
                           f"{anchor:.2e} + {GEOMETRY_REL_MARGIN:.0e})"))
        else:
            trail["segments_flip_rate"] = rec["trail_rate"]
            notes.append(
                f"segments={trail['segments']} certified on {preset} "
                f"(flip {rec['trail_rate']:.2e} <= {limit():.1e})")

    if not trail.get("cap_rows10"):
        trail.pop("cap10_carry", None)  # build variant of cap10 only
    # rows8 AND rows9 evaluate the identical renormalized capsule
    # expressions, so both certify against the "<segments>+rows8"
    # combined record.
    for knob in ("rows8", "rows9"):
        carry_knob = f"{knob}_carry"
        rate_key = f"{knob}_flip_rate"
        if not trail.get(knob):
            trail.pop(knob, None)
            trail.pop(rate_key, None)
            trail.pop(carry_knob, None)  # build variant of its mode
            continue
        if rates is None:
            refuse(knob, rate_key,
                   f"no {preset} fidelity certificate — run "
                   "benchmarks/fidelity_trail.py --rows8")
            trail.pop(carry_knob, None)
            continue
        seg_key = str(trail.get("segments", DEFAULT_SEGMENTS))
        rec = rates.get(f"{seg_key}+rows8")
        if rec is None:
            refuse(knob, rate_key,
                   f"no {preset} '{seg_key}+rows8' record — run "
                   "benchmarks/fidelity_trail.py --rows8")
            trail.pop(carry_knob, None)
        elif rec["trail_rate"] > limit():
            refuse(knob, rate_key,
                   f"combined flip rate {rec['trail_rate']:.2e} over "
                   f"limit {limit():.1e}")
            trail.pop(carry_knob, None)
        else:
            trail[rate_key] = rec["trail_rate"]
            notes.append(
                f"{knob} certified on {preset} (combined flip "
                f"{rec['trail_rate']:.2e} <= {limit():.1e})")
    return "; ".join(n for n in notes if n)


def _read_jsonl(path):
    """Per-line tolerant: a sweep killed mid-append (wedged-tunnel PID
    kill) leaves one truncated line — losing ONLY that line, not the
    whole file (which would also delete the previous good tuned file)."""
    out = []
    try:
        with open(path) as f:
            for line in f:
                if not line.strip():
                    continue
                try:
                    out.append(json.loads(line))
                except ValueError:
                    print(f"# skipping corrupt line in {path}",
                          file=sys.stderr)
    except OSError:
        pass
    return out


def _best(records):
    return min(records, key=lambda r: r["ms"]) if records else None


def pick_disc(records):
    """Disc-scene knobs from the sweep's raster + shaded records."""
    raster = [r for r in records
              if r.get("kind") == "raster" and r.get("span") == 2]
    shaded = [r for r in records if r.get("kind") == "shaded"]
    if not raster:
        return None, "no disc raster records"
    b_off = _best([r for r in raster if not r.get("allow_exit")])
    b_on = _best([r for r in raster if r.get("allow_exit")])
    f_best = _best([r for r in shaded if r.get("uniform_look")])
    g_best = _best([r for r in shaded if not r.get("uniform_look")])
    # How much the fused (u, v) epilogue saves over the generic by-id
    # gather (exit-off only: fused forces the exit off).  Clamped at 0:
    # a SLOWER fused shade won't be chosen below, so it must not also
    # hand the exit-on raster an unearned head start.
    shade_delta = (max(0.0, g_best["ms"] - f_best["ms"])
                   if f_best and g_best else 0.0)
    if b_on and b_off and b_on["ms"] < b_off["ms"] - shade_delta:
        chosen, fused = b_on, False
    else:
        chosen, fused = (b_off or b_on), bool(
            f_best and (not g_best or f_best["ms"] <= g_best["ms"]))
    disc = {k: chosen[k] for k in RASTER_KEYS if k in chosen}
    disc["uniform_look"] = fused
    # The shaded A/B is the truer word on unroll when fused is chosen.
    if fused and f_best:
        disc["unroll"] = f_best.get("unroll", disc.get("unroll", 4))
    # No-churn guard: against the record that IS the builtin config.
    base = [r for r in raster
            if all(r.get(k) == v for k, v in BUILTIN.items())
            and r.get("max_big", 0) <= 511]
    if base and chosen["ms"] > base[0]["ms"] * 0.985:
        # Raster knobs within noise — but the fused-vs-generic SHADE
        # verdict is independent evidence: if the generic by-id gather
        # measurably beats the fused uv shade, record uniform_look=False
        # alone (the builtin bench default is fused).
        if f_best and g_best and g_best["ms"] < f_best["ms"] * 0.985:
            return ({"uniform_look": False},
                    (f"disc raster within noise; shade A/B: generic "
                     f"{g_best['ms']:.2f} beats fused {f_best['ms']:.2f} "
                     f"ms — uniform_look off"))
        return None, (f"best {chosen['ms']:.2f} ms within 1.5% of builtin "
                      f"{base[0]['ms']:.2f} ms — keeping builtins")
    return disc, (f"disc: {chosen['label']} @ {chosen['ms']:.2f} ms, "
                  f"fused={fused} (delta {shade_delta:+.2f} ms)")


def pick_trail(records, log_text):
    """Trail span/segments from the queue's bench A/B JSON lines, plus
    starts_method from the trail sweep records."""
    trail = {}
    notes = []
    # Sections in the queue log: "=== <label> <date> ===" followed by
    # that step's output, including bench.py's one JSON line.
    sections = {}
    label = None
    for line in log_text.splitlines():
        m = SECTION_RE.match(line)
        if m:
            label = m.group(1).strip()
            continue
        if label and line.startswith("{"):
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            for k, v in rec.items():
                if k.startswith("trail_fps_") and v:
                    sections.setdefault(label, v)
    # Every A/B step label maps to the FULL explicit flag set of its
    # bench invocation — the queue scripts pass every trail knob
    # explicitly on A/B lines, so a winning label IS the winning config
    # (a label that relied on tuned-file fill-ins would record a pick
    # that drops the very knob it was measured with).
    flags = {"bench verbose (HEADLINE)": {},
             "bench trail span2 A/B": {"span": "2"},
             "bench trail span4 A/B": {"span": "4"},
             "bench trail segments=4 A/B": {"segments": 4},
             "bench trail cap10 A/B": {"cap_rows10": True},
             "bench trail 3tone A/B": {"cap_rows10": True,
                                       "three_tone": True},
             "bench trail seg8 base A/B": {
                 "segments": None, "cap_rows10": False,
                 "three_tone": False},
             "bench trail seg8 cap10 3tone A/B": {
                 "segments": None, "cap_rows10": True,
                 "three_tone": True},
             "bench trail seg1 cap10 3tone A/B": {
                 "segments": 1, "cap_rows10": True, "three_tone": True},
             "bench trail seg2 cap10 3tone A/B": {
                 "segments": 2, "cap_rows10": True, "three_tone": True},
             "bench trail seg4 cap10 3tone A/B": {
                 "segments": 4, "cap_rows10": True, "three_tone": True},
             "bench trail seg2 span8 cap10 3tone A/B": {
                 "segments": 2, "span": "8", "cap_rows10": True,
                 "three_tone": True},
             "bench trail seg1 span8 cap10 3tone A/B": {
                 "segments": 1, "span": "8", "cap_rows10": True,
                 "three_tone": True},
             "bench trail adaptive cap10 3tone A/B": {
                 "segments": "adaptive", "cap_rows10": True,
                 "three_tone": True},
             "bench trail seg4 cap10 3tone tpp2 A/B": {
                 "segments": 4, "cap_rows10": True, "three_tone": True,
                 "tiles_per_program": 2},
             "bench trail seg4 cap10 3tone tpp4 A/B": {
                 "segments": 4, "cap_rows10": True, "three_tone": True,
                 "tiles_per_program": 4},
             "bench trail seg4 cap10 3tone dma4 A/B": {
                 "segments": 4, "cap_rows10": True, "three_tone": True,
                 "dma_slots": 4},
             "bench trail seg4 cap10 3tone tpp4 dma4 A/B": {
                 "segments": 4, "cap_rows10": True, "three_tone": True,
                 "tiles_per_program": 4, "dma_slots": 4},
             "bench trail seg4 cap10 3tone chunk512 A/B": {
                 "segments": 4, "cap_rows10": True, "three_tone": True,
                 "chunk_rows": 512},
             "bench trail seg4 cap10 3tone chunk1024 A/B": {
                 "segments": 4, "cap_rows10": True, "three_tone": True,
                 "chunk_rows": 1024},
             "bench trail seg4 rows8 3tone A/B": {
                 "segments": 4, "rows8": True, "three_tone": True},
             "bench trail seg4 rows8 3tone chunk512 A/B": {
                 "segments": 4, "rows8": True, "three_tone": True,
                 "chunk_rows": 512},
             "bench trail adaptive rows8 3tone A/B": {
                 "segments": "adaptive", "rows8": True,
                 "three_tone": True},
             "bench trail seg4 rows8 3tone chunk1024 A/B": {
                 "segments": 4, "rows8": True, "three_tone": True,
                 "chunk_rows": 1024},
             "bench trail seg4 rows8c 3tone A/B": {
                 "segments": 4, "rows8": True, "rows8_carry": True,
                 "three_tone": True},
             "bench trail seg4 rows8c 3tone chunk1024 A/B": {
                 "segments": 4, "rows8": True, "rows8_carry": True,
                 "three_tone": True, "chunk_rows": 1024},
             "bench trail seg4 cap10c 3tone chunk512 A/B": {
                 "segments": 4, "cap_rows10": True, "cap10_carry": True,
                 "three_tone": True, "chunk_rows": 512},
             "bench trail seg4 cap10c 3tone chunk1024 A/B": {
                 "segments": 4, "cap_rows10": True, "cap10_carry": True,
                 "three_tone": True, "chunk_rows": 1024},
             "bench trail seg4 rows9 3tone chunk512 A/B": {
                 "segments": 4, "rows9": True, "three_tone": True,
                 "chunk_rows": 512},
             "bench trail seg4 rows9 3tone chunk1024 A/B": {
                 "segments": 4, "rows9": True, "three_tone": True,
                 "chunk_rows": 1024},
             "bench trail seg4 rows9c 3tone chunk1024 A/B": {
                 "segments": 4, "rows9": True, "rows9_carry": True,
                 "three_tone": True, "chunk_rows": 1024},
             "bench trail seg4 rows9c 3tone chunk2048 A/B": {
                 "segments": 4, "rows9": True, "rows9_carry": True,
                 "three_tone": True, "chunk_rows": 2048}}
    cand = [(fps, flags[lab], lab) for lab, fps in sections.items()
            if lab in flags]
    # Knobs with END-TO-END bench-line evidence (including a negative
    # "within noise" verdict) must not be re-decided by the raster-only
    # sweep fallbacks below.  The builtin-config base is either the
    # flagless headline or the explicit all-defaults A/B line.
    base = (sections.get("bench verbose (HEADLINE)", 0.0)
            or sections.get("bench trail seg8 base A/B", 0.0))
    decided = set()
    if base:
        for lab in sections:
            decided |= set(flags.get(lab, ()))
    if cand:
        cand.sort(key=lambda c: -c[0])
        best_fps, best_flags, _ = cand[0]
        if base and best_fps < base * 1.02:
            notes.append(f"trail A/B best {best_fps:.2f} fps within 2% of "
                         f"base {base:.2f} — keeping auto")
        else:
            trail.update({"span": "auto", "segments": None})
            trail.update(best_flags)
            notes.append(f"trail: {best_flags or 'base config'} "
                         f"@ {best_fps:.2f} fps")
    # starts_method at the span the trail metric will actually run
    # (auto resolves to 4 at 1M points — the >2048-bigs probe).
    span_val = 4 if trail.get("span", "auto") in ("auto", "4") else 2
    sm = [r for r in records if r.get("kind") == "raster"
          and r.get("span") == span_val]
    # Compare at ONE max_big: the sweep also emits a resident-SMEM
    # (mb=384) line that is inherently faster — mixing it into the
    # baselines would make every knob A/B fight an unfair opponent.
    mbs = [r.get("max_big") for r in sm if r.get("max_big")]
    if mbs:
        mb_main = max(set(mbs), key=mbs.count)
        sm = [r for r in sm if r.get("max_big") == mb_main]
    b_scan = _best([r for r in sm if r.get("starts_method") == "scan"
                    and not r.get("cap_rows10")])
    b_sort = _best([r for r in sm if r.get("starts_method") == "sort"
                    and not r.get("cap_rows10")])
    if b_scan and b_sort and b_sort["ms"] < b_scan["ms"] * 0.985:
        trail["starts_method"] = "sort"
        notes.append(f"trail starts=sort {b_sort['ms']:.2f} vs "
                     f"scan {b_scan['ms']:.2f} ms")
    # three_tone (no-preshade shade) from the trail shaded A/B records —
    # compared at MATCHING cap_rows10 so a cap10-only win cannot be
    # credited to three_tone; skipped when the bench-line A/B already
    # ruled end to end.
    if "three_tone" not in decided:
        sh = [r for r in records if r.get("kind") == "shaded"
              and r.get("scene") == "trail" and not r.get("cap_rows10")]
        s_pre = _best([r for r in sh if not r.get("three_tone")])
        s_3 = _best([r for r in sh if r.get("three_tone")])
        if s_pre and s_3 and s_3["ms"] < s_pre["ms"] * 0.985:
            trail["three_tone"] = True
            notes.append(f"trail three-tone {s_3['ms']:.2f} vs "
                         f"{s_pre['ms']:.2f} ms")
    # cap_rows10 from the sweep's same-span raster A/B — only when the
    # bench-line A/B produced NO end-to-end verdict on it at all.
    if "cap_rows10" not in trail and "cap_rows10" not in decided:
        c_on = _best([r for r in sm if r.get("cap_rows10")])
        c_off = _best([r for r in sm if not r.get("cap_rows10")])
        if c_on and c_off and c_on["ms"] < c_off["ms"] * 0.985:
            trail["cap_rows10"] = True
            notes.append(f"trail cap10 {c_on['ms']:.2f} vs "
                         f"{c_off['ms']:.2f} ms")
    return (trail or None), "; ".join(notes) or "no trail evidence"


DROPLET_FLAGS = {
    "bench droplet seg8 base A/B": {
        "segments": None, "cap_rows10": False, "three_tone": False},
    "bench droplet seg8 cap10 3tone A/B": {
        "segments": None, "cap_rows10": True, "three_tone": True},
    "bench droplet seg1 cap10 3tone A/B": {
        "segments": 1, "cap_rows10": True, "three_tone": True},
    "bench droplet seg2 cap10 3tone A/B": {
        "segments": 2, "cap_rows10": True, "three_tone": True},
    "bench droplet seg4 cap10 3tone A/B": {
        "segments": 4, "cap_rows10": True, "three_tone": True},
    "bench droplet adaptive cap10 3tone A/B": {
        "segments": "adaptive", "cap_rows10": True, "three_tone": True},
    "bench droplet seg4 cap10 3tone tpp2 A/B": {
        "segments": 4, "cap_rows10": True, "three_tone": True,
        "tiles_per_program": 2},
    "bench droplet seg4 cap10 3tone tpp4 A/B": {
        "segments": 4, "cap_rows10": True, "three_tone": True,
        "tiles_per_program": 4},
    "bench droplet seg4 cap10 3tone dma4 A/B": {
        "segments": 4, "cap_rows10": True, "three_tone": True,
        "dma_slots": 4},
    "bench droplet seg4 cap10 3tone tpp4 dma4 A/B": {
        "segments": 4, "cap_rows10": True, "three_tone": True,
        "tiles_per_program": 4, "dma_slots": 4},
    "bench droplet seg4 cap10 3tone chunk512 A/B": {
        "segments": 4, "cap_rows10": True, "three_tone": True,
        "chunk_rows": 512},
    "bench droplet seg4 rows8 3tone A/B": {
        "segments": 4, "rows8": True, "three_tone": True},
    "bench droplet seg4 rows8 3tone chunk512 A/B": {
        "segments": 4, "rows8": True, "three_tone": True,
        "chunk_rows": 512},
    "bench droplet adaptive rows8 3tone A/B": {
        "segments": "adaptive", "rows8": True, "three_tone": True},
    "bench droplet seg4 rows8c 3tone A/B": {
        "segments": 4, "rows8": True, "rows8_carry": True,
        "three_tone": True},
    "bench droplet seg4 cap10c 3tone A/B": {
        "segments": 4, "cap_rows10": True, "cap10_carry": True,
        "three_tone": True},
    "bench droplet seg4 rows9 3tone A/B": {
        "segments": 4, "rows9": True, "three_tone": True},
    "bench droplet seg4 rows9c 3tone A/B": {
        "segments": 4, "rows9": True, "rows9_carry": True,
        "three_tone": True},
    "bench droplet seg4 rows9c 3tone chunk1024 A/B": {
        "segments": 4, "rows9": True, "rows9_carry": True,
        "three_tone": True, "chunk_rows": 1024},
    "bench droplet seg4 rows9c 3tone chunk2048 A/B": {
        "segments": 4, "rows9": True, "rows9_carry": True,
        "three_tone": True, "chunk_rows": 2048},
}


def pick_droplet(log_text):
    """Droplet-scene knobs from the queue's droplet bench A/B lines —
    same shape as the trail pick (explicit-flag labels, a base line,
    2% noise guard), keyed on the droplet_fps metric."""
    sections = {}
    label = None
    for line in log_text.splitlines():
        m = SECTION_RE.match(line)
        if m:
            label = m.group(1).strip()
            continue
        if label and line.startswith("{"):
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            for k, v in rec.items():
                if k.startswith("droplet_fps_") and v:
                    sections.setdefault(label, v)
    cand = [(fps, DROPLET_FLAGS[lab], lab) for lab, fps in sections.items()
            if lab in DROPLET_FLAGS]
    if not cand:
        return None, "no droplet evidence"
    cand.sort(key=lambda c: -c[0])
    best_fps, best_flags, _ = cand[0]
    base = sections.get("bench droplet seg8 base A/B", 0.0)
    if base and best_fps < base * 1.02:
        return None, (f"droplet A/B best {best_fps:.2f} fps within 2% of "
                      f"base {base:.2f} — keeping builtins")
    droplet = dict(best_flags)
    return droplet, f"droplet: {best_flags} @ {best_fps:.2f} fps"


def distill(disc_recs, trail_recs, log_text, old=None):
    """Pure distillation step: (sweep records, queue log, existing tuned
    file) -> (tuned dict or None, action, notes).

    ``action``: "write" (tuned holds the new file), "keep" (leave the
    existing file untouched), "remove" (a COMPLETE sweep concluded
    builtins-best everywhere — stale winners must not outlive it).

    A queue that dies mid-run (wedged tunnel, round end) leaves a
    PARTIAL log: scenes with no new evidence CARRY FORWARD their
    existing tuned section instead of silently losing it — dropping a
    measured winner because a later queue never got to re-measure it
    would regress the driver's flagless scored run (the round-4 queue-E
    abort was one kill away from exactly that).  Evidence is per scene
    AND per evidence class, INCLUDING negative verdicts (a measured
    "builtins within noise" rightly drops the section):

    * disc — sweep records (its only evidence source);
    * trail — bench ``trail_fps_`` lines decide the BENCH-derived knobs
      (segments / cap10 / three_tone / span).  The git-tracked
      sweep6_trail.jsonl is persistent, so sweep records alone are NOT
      evidence against a measured bench winner: with no trail bench
      lines in the log, the old bench-derived knobs carry forward and
      fresh sweep-fallback picks (starts_method) merge on top (advisor
      r4 medium: counting the persistent records as evidence made trail
      carry-forward unreachable — a lost queue log silently dropped the
      measured segments/cap10/3tone winner);
    * droplet — bench ``droplet_fps_`` lines.

    The keep/drop decision is also per scene: a scene whose evidence
    refuted its old section drops it even when OTHER scenes carry
    forward (advisor r4 low: the old all-or-nothing "keep" preserved
    refuted sections whenever any scene lacked evidence)."""
    old = old or {}
    trail_bench_ev = "trail_fps_" in log_text
    droplet_ev = "droplet_fps_" in log_text

    disc, dnote = pick_disc(disc_recs)
    trail, tnote = pick_trail(trail_recs, log_text)
    droplet, pnote = pick_droplet(log_text)
    if disc is None and not disc_recs and old.get("disc"):
        disc, dnote = dict(old["disc"]), "disc carried (no new evidence)"
    if not trail_bench_ev and old.get("trail"):
        carried = dict(old["trail"])
        if trail:
            # Fresh sweep-derived picks (starts_method, or the raster/
            # shaded fallbacks when no bench line ever ruled) fill gaps
            # but never override a measured bench winner.
            for k, v in trail.items():
                carried.setdefault(k, v)
            tnote = f"trail carried (no bench evidence); sweep: {tnote}"
        else:
            tnote = "trail carried (no bench evidence)"
        trail = carried
    if droplet is None and not droplet_ev and old.get("droplet"):
        droplet, pnote = (dict(old["droplet"]),
                          "droplet carried (no new evidence)")
    # Geometry knobs re-certify on every path — carried sections too, so
    # a tightened fidelity certificate still evicts a stale segments pick.
    if trail:
        gnote = certify_geometry(trail, preset="traj_ball")
        if gnote:
            tnote = f"{tnote}; {gnote}"
        if not trail:
            trail = None
    if droplet:
        gnote = certify_geometry(droplet, preset="traj_vel")
        if gnote:
            pnote = f"{pnote}; {gnote}"
        if not droplet:
            droplet = None
    notes = (dnote, tnote, pnote)
    if disc is None and trail is None and droplet is None:
        # Nothing survives: every scene was either refuted by fresh
        # evidence or had nothing to carry.  Remove a stale file rather
        # than keep refuted winners alive.
        if any(old.get(s) for s in ("disc", "trail", "droplet")):
            return None, "remove", notes
        return None, "keep", notes
    tuned = {"note": f"pick_tuned: {dnote} | {tnote} | {pnote}"}
    if disc:
        tuned["disc"] = disc
    if trail:
        tuned["trail"] = trail
    if droplet:
        tuned["droplet"] = droplet
    return tuned, "write", notes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", default="/tmp/tpu_batch.log")
    ap.add_argument("--dry", action="store_true")
    args = ap.parse_args()

    disc_recs = _read_jsonl(os.path.join(RESULTS, "sweep6_disc.jsonl"))
    trail_recs = _read_jsonl(os.path.join(RESULTS, "sweep6_trail.jsonl"))
    try:
        log_text = open(args.log).read()
    except OSError:
        log_text = ""
    try:
        with open(OUT) as f:
            old = json.load(f)
    except (OSError, ValueError):
        old = {}

    tuned, action, notes = distill(disc_recs, trail_recs, log_text, old)
    for n in notes:
        print(f"# {n}", file=sys.stderr)
    if action == "remove":
        print("# full sweep, nothing beats builtins — removing "
              "tuned_defaults.json", file=sys.stderr)
        if os.path.exists(OUT) and not args.dry:
            os.remove(OUT)  # stale winners must not outlive their sweep
        return
    if action == "keep":
        print("# partial evidence, nothing to write — tuned file left "
              "as is", file=sys.stderr)
        return
    print(json.dumps(tuned, indent=1))
    if not args.dry:
        with open(OUT, "w") as f:
            json.dump(tuned, f, indent=1)
        print(f"# wrote {OUT}", file=sys.stderr)


if __name__ == "__main__":
    main()
