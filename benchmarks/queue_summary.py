"""Summarize an unattended TPU queue run (tpu_queue*.sh -> tpu_batch.log).

Prints, in one screen: every bench JSON line by step label, the top
sweep configurations per scene (benchmarks/results/sweep6_*.jsonl), the
stage-profile delta lines, and the tuned_defaults.json that
pick_tuned distilled — everything needed to decide the next kernel
move after the tunnel has been up.

Run: python benchmarks/queue_summary.py [--log /tmp/tpu_batch.log]
"""
import argparse
import json
import os
import re

import pick_tuned

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(ROOT, "benchmarks", "results")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", default="/tmp/tpu_batch.log")
    ap.add_argument("--top", type=int, default=6)
    args = ap.parse_args()

    try:
        log = open(args.log).read()
    except OSError:
        print(f"no log at {args.log}")
        return

    print("== bench JSON lines by step ==")
    label = "(pre-queue)"
    for line in log.splitlines():
        m = pick_tuned.SECTION_RE.match(line)
        if m:
            label = m.group(1).strip()
        elif line.startswith("{") and '"metric"' in line:
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            extras = {k: v for k, v in rec.items()
                      if k not in ("metric", "unit", "vs_baseline")}
            print(f"  [{label}] {extras}")

    print("\n== stage-profile / probe delta lines ==")
    for line in log.splitlines():
        if line.startswith("deltas:") or "standalone:" in line:
            print(f"  {line.strip()}")

    for scene in ("disc", "trail"):
        path = os.path.join(RESULTS, f"sweep6_{scene}.jsonl")
        try:
            recs = [json.loads(ln) for ln in open(path) if ln.strip()]
        except OSError:
            continue
        recs.sort(key=lambda r: r["ms"])
        print(f"\n== sweep6_{scene}: fastest {args.top} of {len(recs)} ==")
        for r in recs[:args.top]:
            print(f"  {r['ms']:8.2f} ms  {r['label']}")

    tuned = os.path.join(ROOT, "tuned_defaults.json")
    if os.path.exists(tuned):
        print("\n== tuned_defaults.json ==")
        print(open(tuned).read())
    else:
        print("\n(no tuned_defaults.json — builtins stand)")


if __name__ == "__main__":
    main()
