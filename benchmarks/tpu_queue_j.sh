#!/bin/bash
# Queue J — rows9 (the rows8 postmortem applied: renormalized eval,
# idf IN-ROW at static lanes, standard pack-14 machinery) + its carried
# build, then the round's final pick + scored-config preview.  Replaces
# queue I's closing steps; runs the cap10_carry A/Bs queue I defined
# too, so one queue decides the whole rows-mode family.
#
#   cd /root/repo
#   nohup bash benchmarks/tpu_queue_j.sh >> /tmp/tpu_batch_j.log 2>&1 &
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

# --- gate: compiled rows8/rows9/rows9c vs the cap8 oracle on chip ----
echo
echo "=== rows modes on-chip validation $(date) ==="
if ! python benchmarks/tpu_validate_rows8.py; then
  echo "### rows-mode VALIDATION FAILED — skipping the A/Bs"
  exit 1
fi
echo "### step exit=0 (rows modes on-chip validation)"

# --- kernel-level lanes (CAP10c + ROWS9 + ROWS9c vs queue H's bases) -
step "kernel6_sweep trail seg4" python benchmarks/kernel6_sweep.py \
  --scene trail --segments 4

# --- end-to-end A/Bs.  CARRIED lanes LAST: queue H's trail rows8c
# --- bench lane FAULTED the TPU worker (the widened bench-scale sort;
# --- the same sweep lane at frame 120 ran fine), so a repeat only
# --- costs the tail of the queue. ------------------------------------
step "bench trail seg4 rows9 3tone chunk1024 A/B" python bench.py $AB \
  --trail-frames 24 --droplet-frames 0 --trail-segments 4 \
  --trail-span auto --trail-cap10 off --trail-rows9 on \
  --trail-three-tone on --trail-chunk-rows 1024
step "bench droplet seg4 rows9 3tone A/B" python bench.py $AB \
  --trail-frames 0 --droplet-frames 12 --droplet-segments 4 \
  --droplet-cap10 off --droplet-rows9 on --droplet-three-tone on
step "bench trail seg4 cap10c 3tone chunk1024 A/B" python bench.py $AB \
  --trail-frames 24 --droplet-frames 0 --trail-segments 4 \
  --trail-span auto --trail-cap10 on --trail-cap10-carry on \
  --trail-three-tone on --trail-chunk-rows 1024
step "bench droplet seg4 cap10c 3tone A/B" python bench.py $AB \
  --trail-frames 0 --droplet-frames 12 --droplet-segments 4 \
  --droplet-cap10 on --droplet-cap10-carry on --droplet-three-tone on
step "bench trail seg4 rows9c 3tone chunk1024 A/B" python bench.py $AB \
  --trail-frames 24 --droplet-frames 0 --trail-segments 4 \
  --trail-span auto --trail-cap10 off --trail-rows9 on \
  --trail-rows9-carry on --trail-three-tone on --trail-chunk-rows 1024
step "bench droplet seg4 rows9c 3tone A/B" python bench.py $AB \
  --trail-frames 0 --droplet-frames 12 --droplet-segments 4 \
  --droplet-cap10 off --droplet-rows9 on --droplet-rows9-carry on \
  --droplet-three-tone on

# --- the round's final pick over every log (J > H > G precedence) ----
cat /tmp/tpu_batch_j.log /tmp/tpu_batch_h.log /tmp/tpu_batch_g.log \
  > /tmp/tpu_batch_ghj.log 2>/dev/null || true
step "pick_tuned" python benchmarks/pick_tuned.py \
  --log /tmp/tpu_batch_ghj.log

# --- corrected carried-rows probe record -----------------------------
step "v6_probe carried verdict" python benchmarks/v6_probe.py

# --- flagless preview of the scored run ------------------------------
step "bench flagless preview" python bench.py --frames 20 --rounds 2 \
  --skip-validate --trail-frames 24 --droplet-frames 12

cp /tmp/tpu_batch_j.log benchmarks/results/queue_j_r5.log 2>/dev/null || true
echo
echo "### queue J complete $(date)"
