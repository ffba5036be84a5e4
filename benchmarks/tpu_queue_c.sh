#!/bin/bash
# Queue C — round-4 adaptive-trail A/B + tuning handoff.
#
# Follows queue B's contract (see tpu_queue_b.sh): one unattended
# claimant, step labels parsed by benchmarks/pick_tuned.py (a winning
# label IS the winning config — every knob explicit on A/B lines),
# pick_tuned BEFORE the final flagless scored bench.
#
#   cd /root/repo
#   nohup bash benchmarks/tpu_queue_c.sh >> /tmp/tpu_batch_c.log 2>&1 &
#   echo $! > /tmp/queue.pid
#
# The new lever under test: --trail-segments adaptive (per-trail
# slot-optimal k in 1..4, run/pipeline._adaptive_trail_segment_counts)
# + the row_budget gather cap it unlocks (rows past each trail's k are
# invalid, so the sorted prefix is all the row gather needs).  The
# seg4 lines are re-measured in-session so the A/B shares compiles and
# thermal/tunnel conditions.
set -u
cd "$(dirname "$0")/.."

AB="--frames 20 --rounds 2 --skip-validate"

step() {
  local label="$1"; shift
  if [ -e /tmp/queue_stop ]; then
    echo "### queue_stop present — aborting before: $label"
    exit 1
  fi
  echo
  echo "=== $label $(date) ==="
  "$@"
  echo "### step exit=$? ($label)"
}

step "bench verbose (HEADLINE)" python bench.py --verbose

# --- trail scene: tuned seg4 vs adaptive ------------------------------
step "bench trail seg4 cap10 3tone A/B" python bench.py $AB \
  --trail-frames 24 --droplet-frames 0 --trail-segments 4 \
  --trail-span auto --trail-cap10 on --trail-three-tone on
step "bench trail adaptive cap10 3tone A/B" python bench.py $AB \
  --trail-frames 24 --droplet-frames 0 --trail-segments adaptive \
  --trail-span auto --trail-cap10 on --trail-three-tone on

# --- droplet scene ----------------------------------------------------
step "bench droplet seg4 cap10 3tone A/B" python bench.py $AB \
  --trail-frames 0 --droplet-frames 12 --droplet-segments 4 \
  --droplet-cap10 on --droplet-three-tone on
step "bench droplet adaptive cap10 3tone A/B" python bench.py $AB \
  --trail-frames 0 --droplet-frames 12 --droplet-segments adaptive \
  --droplet-cap10 on --droplet-three-tone on

# --- distill winners, then the scored run ----------------------------
step "pick_tuned" python benchmarks/pick_tuned.py --log /tmp/tpu_batch_c.log
step "bench FINAL (scored, tuned)" python bench.py --verbose

echo
echo "### queue C complete $(date)"
