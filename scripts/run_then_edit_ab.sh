#!/bin/bash
# --then_edit A/B on chip (VERDICT r04 task #5): the reference workflow is
# two cold processes (preprocess.py then run_tokenflow_pnp.py —
# /root/reference preprocess.py:333-354, run_tokenflow_pnp.py:283-300);
# on this runtime that costs a second TPU-claim handshake (16 s–10 min)
# plus a cold editor start. `preprocess --then_edit` runs the editor
# in-process, reusing the loaded stack and the edit program prewarmed
# during the inversion. Both arms run with a FRESH compile cache so the
# comparison is cold-vs-cold; walls + the per-phase metrics.json
# decomposition land in the logs.
#
#   bash scripts/run_then_edit_ab.sh [WORKDIR=/tmp/te_ab] [VIDEO]
#
# Workload: 16 frames @512p, 50-step inversion + recon, 50-step PnP edit
# (segmented 25/10) — small enough to keep each arm ~15-25 min cold.
set -u

REPO=$(cd "$(dirname "$0")/.." && pwd)
WORK=${1:-/tmp/te_ab}
VIDEO=${2:-/root/reference/data/wolf.mp4}
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"

mkdir -p "$WORK"
cd "$WORK"

log() { echo "[te-ab $(date +%H:%M:%S)] $*"; }
stamp() { date +%s; }

if [ ! -f data/wolf/00015.png ]; then
  log "extracting 16 frames at 512p from $VIDEO"
  python - "$VIDEO" <<'EOF'
import sys
from tokenflow_tpu.io import video as video_io
video_io.video_to_frames(sys.argv[1], img_size=(512, 512))
EOF
fi

mk_config() {  # $1 = output_path
  cat > "config_$1.yaml" <<EOF
seed: 1
output_path: $1
data_path: data/wolf
latents_path: latents
n_inversion_steps: 50
n_frames: 16
sd_version: '2.1'
guidance_scale: 7.5
n_timesteps: 50
prompt: a wolf carved from ice
negative_prompt: ugly, blurry
batch_size: 8
pnp_attn_t: 0.5
pnp_f_t: 0.8
image_size: 512
steps_per_dispatch: 10
data_parallel: off
init: random
EOF
}

PRE_ARGS=(--data_path data/wolf --H 512 --W 512 --sd_version 2.1
  --steps 50 --save_steps 50 --n_frames 16 --batch_size 16
  --inversion_prompt "a wolf" --init random --data_parallel off
  --steps_per_dispatch 25)

# ---- arm A: reference-style TWO processes, fresh cache -----------------
mk_config results_2proc
log "arm A: two cold processes (preprocess, then editor)"
T0=$(stamp)
JAX_COMPILATION_CACHE_DIR="$WORK/cache_a" \
  python "$REPO/preprocess.py" "${PRE_ARGS[@]}" > a_pre.log 2>&1
T1=$(stamp)
JAX_COMPILATION_CACHE_DIR="$WORK/cache_a" \
  python "$REPO/run_tokenflow_pnp.py" --config_path config_results_2proc.yaml \
  > a_edit.log 2>&1
T2=$(stamp)
log "arm A: preprocess $((T1-T0))s + editor process $((T2-T1))s = $((T2-T0))s"
grep -h "inversion (\|reconstruction:\|edit loop\|compile-ahead" a_pre.log a_edit.log || true

# ---- arm B: ONE process via --then_edit, fresh cache -------------------
mk_config results_1proc
log "arm B: one process (preprocess --then_edit), fresh cache"
T3=$(stamp)
JAX_COMPILATION_CACHE_DIR="$WORK/cache_b" \
  python "$REPO/preprocess.py" "${PRE_ARGS[@]}" \
  --then_edit config_results_1proc.yaml > b_all.log 2>&1
T4=$(stamp)
log "arm B: single process total $((T4-T3))s"
grep -h "inversion (\|reconstruction:\|edit loop\|compile-ahead\|prewarm\|then_edit" b_all.log || true

log "A/B: two-process $((T2-T0))s vs then_edit $((T4-T3))s"
