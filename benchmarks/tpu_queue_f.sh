#!/bin/bash
# Queue F — round-5 measurement pass (VERDICT r4 items 1+2, "first
# measure"):
#   1. build/stage budgets AT the tuned winner config (seg4 + span4 +
#      cap10 + three_tone) — the numbers queue D was written for and
#      never produced; they feed the trail floor arithmetic in
#      docs/KERNEL_NOTES.md.
#   2. kernel6_sweep at the tuned seg4 soup — tpp / dma_slots / chunk
#      lines sized to the chunk-machinery overhead hunt.
#   3. The adaptive-vs-seg4 A/B queue E never finished (killed at round
#      end mid-step), then pick_tuned so the winners land in
#      tuned_defaults.json.
#
#   cd /root/repo
#   nohup bash benchmarks/tpu_queue_f.sh >> /tmp/tpu_batch_f.log 2>&1 &
#   echo $! > /tmp/queue.pid
#
# Labels MUST match benchmarks/pick_tuned.py's flag tables (a winning
# label IS the winning config).
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

# --- stage budgets at the TUNED config (r4 verdict: "no stage budget
# --- recorded at the tuned seg4 config") --------------------------------
step "build_probe trail seg4" python benchmarks/build_probe.py \
  --scene trail --segments 4
step "stage_profile trail seg4 tuned" python benchmarks/stage_profile6.py \
  --scene trail --segments 4 --span 4 --cap10 --three-tone
step "stage_profile droplet seg4 tuned" python benchmarks/stage_profile6.py \
  --scene droplet --segments 4 --span 4 --cap10 --three-tone

# --- kernel knob sweep at the tuned seg4 soup ---------------------------
step "kernel6_sweep trail seg4" python benchmarks/kernel6_sweep.py \
  --scene trail --segments 4

# --- trail scene: tuned seg4 vs adaptive (in-session pair) --------------
step "bench trail seg4 cap10 3tone A/B" python bench.py $AB \
  --trail-frames 24 --droplet-frames 0 --trail-segments 4 \
  --trail-span auto --trail-cap10 on --trail-three-tone on
step "bench trail adaptive cap10 3tone A/B" python bench.py $AB \
  --trail-frames 24 --droplet-frames 0 --trail-segments adaptive \
  --trail-span auto --trail-cap10 on --trail-three-tone on

# --- droplet scene ------------------------------------------------------
step "bench droplet seg4 cap10 3tone A/B" python bench.py $AB \
  --trail-frames 0 --droplet-frames 12 --droplet-segments 4 \
  --droplet-cap10 on --droplet-three-tone on
step "bench droplet adaptive cap10 3tone A/B" python bench.py $AB \
  --trail-frames 0 --droplet-frames 12 --droplet-segments adaptive \
  --droplet-cap10 on --droplet-three-tone on

# --- distill winners for the driver's scored run ------------------------
step "pick_tuned" python benchmarks/pick_tuned.py --log /tmp/tpu_batch_f.log

cp /tmp/tpu_batch_f.log benchmarks/results/queue_f_r5.log 2>/dev/null || true
echo
echo "### queue F complete $(date)"
