#!/bin/bash
# Queue I — the cap10_carry pass + the round's closing numbers.
# Queue H's sweep measured ROWS8 at parity with CAP10 (the one-granule
# gather win repaid in kernel scalar overhead) and ROWS8c slightly
# behind; CAP10's 40 B gather pays TWO granules, so the carried build
# belongs on the cap10 kernel.  Measure it, A/B end to end, re-pick,
# and finish with the v6_probe rerun (the fixed sort-carried pack lane)
# plus a full-scope flagless preview.
#
#   cd /root/repo
#   nohup bash benchmarks/tpu_queue_i.sh >> /tmp/tpu_batch_i.log 2>&1 &
#   echo $! > /tmp/queue.pid
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

# --- kernel-level CAP10c delta (in-frame, vs queue H's CAP10 lanes) --
step "kernel6_sweep trail seg4" python benchmarks/kernel6_sweep.py \
  --scene trail --segments 4

# --- end-to-end A/Bs -------------------------------------------------
step "bench trail seg4 cap10c 3tone chunk512 A/B" python bench.py $AB \
  --trail-frames 24 --droplet-frames 0 --trail-segments 4 \
  --trail-span auto --trail-cap10 on --trail-cap10-carry on \
  --trail-three-tone on --trail-chunk-rows 512
step "bench trail seg4 cap10c 3tone chunk1024 A/B" python bench.py $AB \
  --trail-frames 24 --droplet-frames 0 --trail-segments 4 \
  --trail-span auto --trail-cap10 on --trail-cap10-carry on \
  --trail-three-tone on --trail-chunk-rows 1024
step "bench droplet seg4 cap10c 3tone A/B" python bench.py $AB \
  --trail-frames 0 --droplet-frames 12 --droplet-segments 4 \
  --droplet-cap10 on --droplet-cap10-carry on --droplet-three-tone on

# --- re-pick over the whole round's logs (I shadows H shadows G) -----
cat /tmp/tpu_batch_i.log /tmp/tpu_batch_h.log /tmp/tpu_batch_g.log \
  > /tmp/tpu_batch_ghi.log 2>/dev/null || true
step "pick_tuned" python benchmarks/pick_tuned.py \
  --log /tmp/tpu_batch_ghi.log

# --- the corrected carried-rows probe record (for KERNEL_NOTES) ------
step "v6_probe carried verdict" python benchmarks/v6_probe.py

# --- flagless preview of the scored run ------------------------------
step "bench flagless preview" python bench.py --frames 20 --rounds 2 \
  --skip-validate --trail-frames 24 --droplet-frames 12

cp /tmp/tpu_batch_i.log benchmarks/results/queue_i_r5.log 2>/dev/null || true
echo
echo "### queue I complete $(date)"
