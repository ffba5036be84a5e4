#!/bin/bash
# Queue G — round-5 second pass: the packed-build verdict, the trail
# stage budget queue F lost to a tunnel drop, the rows-stage
# decomposition, grid-fusion A/Bs at the flagship lanes, and the v6
# streaming numbers (VERDICT r4 #1 + #7).
#
#   cd /root/repo
#   nohup bash benchmarks/tpu_queue_g.sh >> /tmp/tpu_batch_g.log 2>&1 &
#   echo $! > /tmp/queue.pid
#
# pick_tuned runs on G's log CONCATENATED BEFORE F's (sections keep the
# first occurrence per label, so fresh G lines shadow stale F ones and
# F's adaptive-vs-seg4 verdict still competes for labels G doesn't
# re-run).
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

# --- measurement ------------------------------------------------------
step "build_probe trail seg4 packed" python benchmarks/build_probe.py \
  --scene trail --segments 4
step "stage_profile trail seg4 tuned" python benchmarks/stage_profile6.py \
  --scene trail --segments 4 --span 4 --cap10 --three-tone
step "stage_profile droplet seg4 tuned" python benchmarks/stage_profile6.py \
  --scene droplet --segments 4 --span 4 --cap10 --three-tone
step "v6_probe rows decomposition" python benchmarks/v6_probe.py

# --- flagship A/Bs (packed build is the new base; queue F's seg4
# --- sweep REFUTED tpp/dma at trail scale — within 0.4 ms of base —
# --- and found chunk_rows=512 worth -7 ms on the CAP10 kernel) --------
step "bench trail seg4 cap10 3tone A/B" python bench.py $AB \
  --trail-frames 24 --droplet-frames 0 --trail-segments 4 \
  --trail-span auto --trail-cap10 on --trail-three-tone on \
  --trail-chunk-rows 256
step "bench trail seg4 cap10 3tone chunk512 A/B" python bench.py $AB \
  --trail-frames 24 --droplet-frames 0 --trail-segments 4 \
  --trail-span auto --trail-cap10 on --trail-three-tone on \
  --trail-chunk-rows 512
step "bench trail seg4 cap10 3tone chunk1024 A/B" python bench.py $AB \
  --trail-frames 24 --droplet-frames 0 --trail-segments 4 \
  --trail-span auto --trail-cap10 on --trail-three-tone on \
  --trail-chunk-rows 1024
step "bench droplet seg4 cap10 3tone A/B" python bench.py $AB \
  --trail-frames 0 --droplet-frames 12 --droplet-segments 4 \
  --droplet-cap10 on --droplet-three-tone on \
  --droplet-chunk-rows 256
step "bench droplet seg4 cap10 3tone chunk512 A/B" python bench.py $AB \
  --trail-frames 0 --droplet-frames 12 --droplet-segments 4 \
  --droplet-cap10 on --droplet-three-tone on \
  --droplet-chunk-rows 512

# --- adaptive-vs-seg4 (queue F ran these but its log died with /tmp on
# --- the session VM swap; the verdict needs committed evidence) -------
step "bench trail adaptive cap10 3tone A/B" python bench.py $AB \
  --trail-frames 24 --droplet-frames 0 --trail-segments adaptive \
  --trail-span auto --trail-cap10 on --trail-three-tone on
step "bench droplet adaptive cap10 3tone A/B" python bench.py $AB \
  --trail-frames 0 --droplet-frames 12 --droplet-segments adaptive \
  --droplet-cap10 on --droplet-three-tone on

# --- distill winners (G shadows F per label) --------------------------
cat /tmp/tpu_batch_g.log /tmp/tpu_batch_f.log > /tmp/tpu_batch_fg.log \
  2>/dev/null || true
step "pick_tuned" python benchmarks/pick_tuned.py --log /tmp/tpu_batch_fg.log

# --- v6 streaming records (informational; after the picks) ------------
step "stream_10m disc v6" python benchmarks/stream_10m.py --scene disc
step "stream_10m trail v6" python benchmarks/stream_10m.py --scene trail

cp /tmp/tpu_batch_g.log benchmarks/results/queue_g_r5.log 2>/dev/null || true
echo
echo "### queue G complete $(date)"
