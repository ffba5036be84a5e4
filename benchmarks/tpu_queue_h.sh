#!/bin/bash
# Queue H — the rows8 campaign (r5): validate the kind-split 32 B-row
# kernel on chip, measure its kernel/stage deltas at the tuned seg4
# soups, A/B it end to end on both flagship lanes, and let pick_tuned
# decide with the fidelity certificate in the loop.
#
#   cd /root/repo
#   nohup bash benchmarks/tpu_queue_h.sh >> /tmp/tpu_batch_h.log 2>&1 &
#   echo $! > /tmp/queue.pid
#
# pick_tuned runs on H's log CONCATENATED BEFORE G's (first occurrence
# per label wins, so fresh H lines shadow stale G ones and G's
# adaptive/chunk verdicts still compete for labels H doesn't re-run).
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

# --- gate: the compiled Mosaic rows8 path must match the cap8 oracle
# --- (incl. TPU sqrt/mul row derivation vs numpy) before any A/B ----
echo
echo "=== rows8 on-chip validation $(date) ==="
if ! python benchmarks/tpu_validate_rows8.py; then
  echo "### rows8 VALIDATION FAILED — skipping rows8 A/Bs"
  exit 1
fi
echo "### step exit=0 (rows8 on-chip validation)"

# --- kernel-level delta at the tuned seg4 soup (ROWS8 lanes) ---------
step "v6_probe carried-rows verdict" python benchmarks/v6_probe.py
step "kernel6_sweep trail seg4" python benchmarks/kernel6_sweep.py \
  --scene trail --segments 4
step "stage_profile trail seg4 rows8" python benchmarks/stage_profile6.py \
  --scene trail --segments 4 --span 4 --rows8 --three-tone
step "stage_profile droplet seg4 rows8" python benchmarks/stage_profile6.py \
  --scene droplet --segments 4 --span 4 --rows8 --three-tone

# --- end-to-end flagship A/Bs (labels = pick_tuned flag tables) ------
step "bench trail seg4 rows8 3tone A/B" python bench.py $AB \
  --trail-frames 24 --droplet-frames 0 --trail-segments 4 \
  --trail-span auto --trail-cap10 off --trail-rows8 on \
  --trail-three-tone on
step "bench trail seg4 rows8 3tone chunk512 A/B" python bench.py $AB \
  --trail-frames 24 --droplet-frames 0 --trail-segments 4 \
  --trail-span auto --trail-cap10 off --trail-rows8 on \
  --trail-three-tone on --trail-chunk-rows 512
step "bench droplet seg4 rows8 3tone A/B" python bench.py $AB \
  --trail-frames 0 --droplet-frames 12 --droplet-segments 4 \
  --droplet-cap10 off --droplet-rows8 on --droplet-three-tone on
step "bench droplet seg4 rows8 3tone chunk512 A/B" python bench.py $AB \
  --trail-frames 0 --droplet-frames 12 --droplet-segments 4 \
  --droplet-cap10 off --droplet-rows8 on --droplet-three-tone on \
  --droplet-chunk-rows 512

# --- sort-carried rows8 build (bit-identical rows; v6_probe verdict
# --- decides whether these lanes are worth their chip time, but the
# --- bench A/B is the number pick_tuned trusts) ----------------------
step "bench trail seg4 rows8c 3tone A/B" python bench.py $AB \
  --trail-frames 24 --droplet-frames 0 --trail-segments 4 \
  --trail-span auto --trail-cap10 off --trail-rows8 on \
  --trail-rows8-carry on --trail-three-tone on
step "bench droplet seg4 rows8c 3tone A/B" python bench.py $AB \
  --trail-frames 0 --droplet-frames 12 --droplet-segments 4 \
  --droplet-cap10 off --droplet-rows8 on --droplet-rows8-carry on \
  --droplet-three-tone on

# --- distill winners (H shadows G per label; fidelity gate in loop) --
cat /tmp/tpu_batch_h.log /tmp/tpu_batch_g.log /tmp/tpu_batch_f.log \
  > /tmp/tpu_batch_fgh.log 2>/dev/null || true
step "pick_tuned" python benchmarks/pick_tuned.py \
  --log /tmp/tpu_batch_fgh.log

# --- preview the scored flagless run at the new tuned file -----------
step "bench flagless preview" python bench.py --frames 20 --rounds 2 \
  --skip-validate --trail-frames 24 --droplet-frames 12

cp /tmp/tpu_batch_h.log benchmarks/results/queue_h_r5.log 2>/dev/null || true
echo
echo "### queue H complete $(date)"
