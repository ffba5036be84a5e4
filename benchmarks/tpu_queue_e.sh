#!/bin/bash
# Queue E — round-4 SLIM adaptive-trail A/B (queue C minus the two
# ~18-minute flagless benches, which the driver's end-of-round scored
# run replaces).  Budget: ~40 min on the chip, sized for the round-4
# wall clock; queue C remains the reference shape for a full session.
#
#   cd /root/repo
#   nohup bash benchmarks/tpu_queue_e.sh >> /tmp/tpu_batch_e.log 2>&1 &
#   echo $! > /tmp/queue.pid
#
# Labels MUST match benchmarks/pick_tuned.py's flag tables (a winning
# label IS the winning config).  pick_tuned runs LAST so the driver's
# flagless scored bench inherits the measured winners (r3 weak #3).
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

# --- trail scene: tuned seg4 vs adaptive (in-session pair) ------------
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

# --- distill winners for the driver's scored run ----------------------
step "pick_tuned" python benchmarks/pick_tuned.py --log /tmp/tpu_batch_e.log

cp /tmp/tpu_batch_e.log benchmarks/results/queue_e_r4.log 2>/dev/null || true
echo
echo "### queue E complete $(date)"
