#!/bin/bash
# Queue D — round-4 stage/build budgets at the adaptive winner knobs.
#
# Runs AFTER queue C (one tunnel claimant at a time):
#   nohup bash benchmarks/tpu_queue_d.sh >> /tmp/tpu_batch_d.log 2>&1 &
#
# Output feeds docs/KERNEL_NOTES.md's adaptive section: where the
# adaptive trail/droplet frame spends its milliseconds, and the build
# split that decides whether a fused pallas soup-build kernel is the
# next lever.  ROW_BUDGET values: read the "adaptive trails: binned ...
# -> row_budget N" lines in /tmp/tpu_batch_c.log and export before
# launch (defaults below are the frame-120 probe ballpark).
set -u
cd "$(dirname "$0")/.."

TRAIL_RB="${TRAIL_RB:-2883584}"
DROP_RB="${DROP_RB:-2883584}"

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

step "build_probe trail seg4" python benchmarks/build_probe.py \
  --scene trail --segments 4
step "stage_profile trail adaptive" python benchmarks/stage_profile6.py \
  --scene trail --segments adaptive --row-budget "$TRAIL_RB" \
  --span 4 --cap10 --three-tone
step "stage_profile droplet adaptive" python benchmarks/stage_profile6.py \
  --scene droplet --segments adaptive --row-budget "$DROP_RB" \
  --span 4 --cap10 --three-tone

echo
echo "### queue D complete $(date)"
