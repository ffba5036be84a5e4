"""Measured-best bench knobs, persisted across the intermittent TPU link.

The chip sits behind a single-claimant tunnel that drops for hours at a
time, so kernel-knob sweeps (benchmarks/kernel6_sweep.py) run unattended
from a probe queue and cannot hand their winners back interactively.
``benchmarks/pick_tuned.py`` distills the sweep JSONL + the trail A/B
bench lines into ``tuned_defaults.json`` at the repo root; bench.py
fills every knob the user did NOT pass explicitly from that file, so a
flagless run (in particular the driver's end-of-round artifact run)
times the measured-best configuration automatically.

File shape (all keys optional; absent file = builtin defaults)::

    {
      "disc":  {"tiles_per_program": 4, "dma_slots": 4, "chunk_rows": 256,
                "unroll": 4, "allow_exit": false, "starts_method": "scan",
                "uniform_look": true},
      "trail": {"span": "auto", "segments": null, "starts_method": "scan"},
      "note":  "provenance string written by pick_tuned.py"
    }

Every knob is a pure performance lever — all values render bit-identical
images (the interpret-mode knob-matrix tests pin this), so a stale or
hand-edited file can only cost milliseconds, never correctness.  The one
conditionally-exact knob, ``trail.three_tone``, keeps that contract
operationally: bench.py re-derives the representative prims per scene
and verifies the per-kind-constant precondition DEVICE-SIDE
(pallas_csr6.derive_three_tone) before applying it, falling back to the
always-exact preshade path otherwise.
"""
from __future__ import annotations

import json
import os

TUNED_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))),
    "tuned_defaults.json")


def load_tuned(path: str | None = None) -> dict:
    """The tuned-defaults dict, or {} when absent/unreadable."""
    try:
        with open(path or TUNED_PATH) as f:
            data = json.load(f)
        return data if isinstance(data, dict) else {}
    except (OSError, ValueError):
        return {}


def fill(args_value, tuned_section: dict, key: str, builtin):
    """Resolve one knob: explicit CLI value > tuned file > builtin."""
    if args_value is not None:
        return args_value
    v = tuned_section.get(key)
    return builtin if v is None else v
