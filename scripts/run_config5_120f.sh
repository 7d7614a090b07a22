#!/bin/bash
# BASELINE config-5 at full scale — woman-running.mp4, 120 frames, 768p —
# through the REAL CLIs on one chip (VERDICT r04 task #3), segmented
# against the axon relay's ~60 s execution watchdog (PERF.md round 3) and
# checkpointed, WITH a mid-run kill + resume of each stage to prove
# checkpoint/resume at its real surface on hardware.
#
#   bash scripts/run_config5_120f.sh [WORKDIR=/tmp/c5_120] [VIDEO]
#
# Stages (each its own process = its own TPU claim, like the reference's
# two-process workflow):
#   1a. preprocess (50-step inversion, 10x5-step dispatches, checkpointed,
#       --prewarm_edit_config so the stage-2 edit program compiles during
#       the inversion) — KILLED after >=2 inversion dispatches
#   1b. preprocess rerun — must log "resuming at dispatch N/10"
#   2a. run_tokenflow_pnp (50-step edit, 25x2-step dispatches,
#       checkpoint_edit) — KILLED after >=4 edit dispatches
#   2b. run_tokenflow_pnp rerun — must resume and complete
set -u

REPO=$(cd "$(dirname "$0")/.." && pwd)
WORK=${1:-/tmp/c5_120}
VIDEO=${2:-/root/reference/data/woman-running.mp4}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache}
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"

mkdir -p "$WORK"
cd "$WORK"

stamp() { date +%s; }
log() { echo "[c5-120f $(date +%H:%M:%S)] $*"; }

# --- inputs -----------------------------------------------------------
if [ ! -f data/woman-running/00119.png ] || \
   [ "$(python -c "from PIL import Image; print(Image.open('data/woman-running/00000.png').size[0])" 2>/dev/null)" != 768 ]; then
  log "extracting 120 frames at 768p from $VIDEO"
  rm -rf data/woman-running
  python - "$VIDEO" <<'EOF'
import sys
from tokenflow_tpu.io import video as video_io
video_io.video_to_frames(sys.argv[1], img_size=(768, 768))
EOF
fi

cat > config_c5.yaml <<'EOF'
seed: 1
output_path: results
data_path: data/woman-running
latents_path: latents
n_inversion_steps: 50
n_frames: 120
sd_version: '2.1'
guidance_scale: 7.5
n_timesteps: 50
prompt: a marble sculpture of a woman running, Venus de Milo
negative_prompt: ugly, blurry, low res
batch_size: 8
pnp_attn_t: 0.5
pnp_f_t: 0.8
image_size: 768
propagate_chunk: 40
steps_per_dispatch: 2
frames_per_dispatch: 24
checkpoint_edit: true
data_parallel: off
init: random
EOF

PREPROCESS=(python "$REPO/preprocess.py"
  --data_path data/woman-running --H 768 --W 768
  --sd_version 2.1 --steps 50 --save_steps 50
  --n_frames 120 --batch_size 40
  --inversion_prompt "a woman running"
  --init random --data_parallel off
  --steps_per_dispatch 5 --frames_per_dispatch 24
  --checkpoint_inversion
  --prewarm_edit_config config_c5.yaml)

CKPT_INV=latents/sd_2.1/woman-running/steps_50/nframes_120/inversion_checkpoint.npz

wait_for_segments() {  # $1 = npz path, $2 = min segments_done, $3 = max wait s
  python - "$1" "$2" "$3" <<'EOF'
import sys, time, numpy as np
path, want, budget = sys.argv[1], int(sys.argv[2]), float(sys.argv[3])
t0 = time.time()
while time.time() - t0 < budget:
    try:
        with np.load(path) as z:
            done = int(z["segments_done"])
        if done >= want:
            print(f"checkpoint has {done} segments done")
            sys.exit(0)
    except Exception:
        pass
    time.sleep(5)
print("TIMEOUT waiting for checkpoint", file=sys.stderr)
sys.exit(1)
EOF
}

# --- stage 1a: preprocess, killed mid-inversion ------------------------
# Idempotent: a completed stage 1 leaves the trajectory behind; skip the
# ~25 min inversion instead of redoing it when the driver is re-run after
# an interruption (the kill+resume proof is in the preserved pre_1b.log).
TRAJ=latents/sd_2.1/woman-running/steps_50/nframes_120/latents/trajectory.npz
if [ -f "$TRAJ" ] && [ ! -f "$CKPT_INV" ]; then
  log "stage 1 already complete ($TRAJ exists) -- skipping to stage 2"
  T0=$(stamp); T1=$T0; T2=$T0
else

T0=$(stamp)
log "stage 1a: preprocess (will be killed after 2 inversion dispatches)"
"${PREPROCESS[@]}" > pre_1a.log 2>&1 &
PRE_PID=$!
if wait_for_segments "$CKPT_INV" 2 2400; then
  log "killing preprocess pid $PRE_PID mid-inversion"
  kill "$PRE_PID"
  wait "$PRE_PID" 2>/dev/null
else
  log "WARN: no checkpoint appeared; letting 1a run to completion"
  wait "$PRE_PID"
fi
T1=$(stamp)

# --- stage 1b: preprocess resume to completion --------------------------
log "stage 1b: preprocess resume"
"${PREPROCESS[@]}" > pre_1b.log 2>&1
T2=$(stamp)
grep -h "resuming at dispatch\|inversion (\|reconstruction:\|prewarm\|compile-ahead" pre_1b.log || true
fi  # stage-1 skip guard

# --- stage 2a: edit, killed mid-loop ------------------------------------
log "stage 2a: run_tokenflow_pnp (killed after 4 edit dispatches)"
python "$REPO/run_tokenflow_pnp.py" --config_path config_c5.yaml > edit_2a.log 2>&1 &
EDIT_PID=$!
CKPT_EDIT="results_pnp_SD_2.1/woman-running/a marble sculpture of a woman running, Venus de Milo/attn_0.5_f_0.8/batch_size_8/50/edit_checkpoint.npz"
if wait_for_segments "$CKPT_EDIT" 4 2400; then
  log "killing edit pid $EDIT_PID mid-loop"
  kill "$EDIT_PID"
  wait "$EDIT_PID" 2>/dev/null
else
  log "WARN: no edit checkpoint appeared; letting 2a run to completion"
  wait "$EDIT_PID"
fi
T3=$(stamp)

# --- stage 2b: edit resume to completion ---------------------------------
log "stage 2b: edit resume"
python "$REPO/run_tokenflow_pnp.py" --config_path config_c5.yaml > edit_2b.log 2>&1
T4=$(stamp)
grep -h "resuming at dispatch\|edit loop\|compile-ahead\|Done" edit_2b.log || true

log "walls: 1a(kill)=$((T1-T0))s 1b(resume->done)=$((T2-T1))s 2a(kill)=$((T3-T2))s 2b(resume->done)=$((T4-T3))s total=$((T4-T0))s"
log "artifacts:"
ls "results_pnp_SD_2.1/woman-running/a marble sculpture of a woman running, Venus de Milo/attn_0.5_f_0.8/batch_size_8/50" 2>/dev/null || true

# --- stages 3/4 (optional, C5_COLDSTART=0 to skip): cold-start A/B -------
# Stage 3: fully cold edit — fresh compile cache, compile_ahead off.
# Stage 4: fresh compile cache but in-process compile-ahead on (the edit
# compile rides the vae_recon wall). Together with the 2b wall (persistent
# cache + preprocess prewarm), these decompose the cold-start PERF table.
if [ "${C5_COLDSTART:-1}" = 1 ]; then
  sed -e 's/^checkpoint_edit: true/checkpoint_edit: false/' \
      -e 's/^output_path: results/output_path: results_cold/' config_c5.yaml > config_c5_cold.yaml
  echo "compile_ahead: false" >> config_c5_cold.yaml
  log "stage 3: fully cold edit (fresh cache, compile_ahead off)"
  JAX_COMPILATION_CACHE_DIR="$WORK/cache_cold" \
    python "$REPO/run_tokenflow_pnp.py" --config_path config_c5_cold.yaml > edit_3_cold.log 2>&1
  T5=$(stamp)
  grep -h "edit loop\|vae_recon\|Done" edit_3_cold.log || true

  sed -e 's/^checkpoint_edit: true/checkpoint_edit: false/' \
      -e 's/^output_path: results/output_path: results_ca/' config_c5.yaml > config_c5_ca.yaml
  echo "compile_ahead: true" >> config_c5_ca.yaml
  log "stage 4: cold edit with in-process compile-ahead"
  JAX_COMPILATION_CACHE_DIR="$WORK/cache_cold2" \
    python "$REPO/run_tokenflow_pnp.py" --config_path config_c5_ca.yaml > edit_4_ca.log 2>&1
  T6=$(stamp)
  grep -h "compile-ahead\|edit loop\|Done" edit_4_ca.log || true
  log "coldstart walls: stage3(cold)=$((T5-T4))s stage4(compile-ahead)=$((T6-T5))s vs 2b(prewarmed+resume)=$((T4-T3))s"
fi
