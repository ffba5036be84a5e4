#!/bin/bash
# Queue B — round-4 trail/droplet A/B matrix + tuning handoff.
#
# The TPU sits behind a single-claimant tunnel, so this runs unattended:
#
#   cd /root/repo
#   nohup bash benchmarks/tpu_queue_b.sh >> /tmp/tpu_batch.log 2>&1 &
#   echo $! > /tmp/queue.pid
#
# Afterwards: python benchmarks/queue_summary.py   (one-screen harvest).
#
# Step headers are parsed by benchmarks/pick_tuned.py (SECTION_RE); the
# label set below matches its trail/droplet flag tables EXACTLY — a
# winning label IS the winning config, so every knob is passed
# explicitly on A/B lines (tuned-file fill-ins would otherwise leak the
# stale r3 winners into a "base" measurement).
#
# Ordering: headline first (it is pick_tuned's base line AND pays the
# big compiles into /tmp/jaxcache), then trail A/Bs by expected value,
# then droplet A/Bs, then pick_tuned -> final flagless scored bench
# (VERDICT r3 weak #3: the scored artifact must POSTDATE the tuning).
#
# Touch /tmp/queue_stop to abort between steps (never kill a step
# mid-dispatch: a killed TPU claim wedges the tunnel for ~15 min).
set -u
cd "$(dirname "$0")/.."

# A/B runs share one small disc scan (same flags => one cached compile)
# and skip the exactness gate (the headline and final runs keep it).
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

# --- trail scene: segments x span x cap10/three_tone ------------------
# seg8 = the pipeline builtin (pick_tuned maps these labels to
# segments: None).  At segments <= 2 the fade-frame capsules flood the
# narrow-span big lists (a 650k-row list faulted the chip in the first
# queue-B attempt), so those lines force span 8; bench.py's probe guard
# refuses any config whose big list exceeds 64k rows before compiling.
step "bench trail seg8 base A/B" python bench.py $AB \
  --trail-frames 24 --droplet-frames 0 --trail-segments 8 \
  --trail-span auto --trail-cap10 off --trail-three-tone off
step "bench trail seg8 cap10 3tone A/B" python bench.py $AB \
  --trail-frames 24 --droplet-frames 0 --trail-segments 8 \
  --trail-span auto --trail-cap10 on --trail-three-tone on
step "bench trail seg4 cap10 3tone A/B" python bench.py $AB \
  --trail-frames 24 --droplet-frames 0 --trail-segments 4 \
  --trail-span auto --trail-cap10 on --trail-three-tone on
step "bench trail seg2 span8 cap10 3tone A/B" python bench.py $AB \
  --trail-frames 24 --droplet-frames 0 --trail-segments 2 \
  --trail-span 8 --trail-cap10 on --trail-three-tone on
step "bench trail seg1 span8 cap10 3tone A/B" python bench.py $AB \
  --trail-frames 24 --droplet-frames 0 --trail-segments 1 \
  --trail-span 8 --trail-cap10 on --trail-three-tone on

# --- droplet scene: its own tuned lane (traj_vel fidelity certs) ------
step "bench droplet seg8 base A/B" python bench.py $AB \
  --trail-frames 0 --droplet-frames 12 --droplet-segments 8 \
  --droplet-cap10 off --droplet-three-tone off
step "bench droplet seg8 cap10 3tone A/B" python bench.py $AB \
  --trail-frames 0 --droplet-frames 12 --droplet-segments 8 \
  --droplet-cap10 on --droplet-three-tone on
step "bench droplet seg4 cap10 3tone A/B" python bench.py $AB \
  --trail-frames 0 --droplet-frames 12 --droplet-segments 4 \
  --droplet-cap10 on --droplet-three-tone on
step "bench droplet seg2 cap10 3tone A/B" python bench.py $AB \
  --trail-frames 0 --droplet-frames 12 --droplet-segments 2 \
  --droplet-cap10 on --droplet-three-tone on
step "bench droplet seg1 cap10 3tone A/B" python bench.py $AB \
  --trail-frames 0 --droplet-frames 12 --droplet-segments 1 \
  --droplet-cap10 on --droplet-three-tone on

# --- distill winners, then the scored run ----------------------------
step "pick_tuned" python benchmarks/pick_tuned.py --log /tmp/tpu_batch.log
step "bench FINAL (scored, tuned)" python bench.py --verbose

echo
echo "### queue B complete $(date)"
