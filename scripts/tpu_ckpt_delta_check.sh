#!/bin/bash
# On-chip check of the round-5 delta checkpointing (SegmentCheckpointer
# ``appended`` — see PERF.md "Finding -> fix (delta checkpointing)"):
# rerun the config-5 stage-1 inversion (120 frames @768p, 10x5-step
# checkpointed dispatches, flags identical to run_config5_120f.sh stage 1,
# including the cross-process edit prewarm riding the inversion) in a
# FRESH workdir, with the checkpointer now pulling only the trajectory
# rows each dispatch appended (~88 MB/save) instead of the full ~0.88 GB
# carry. Compare the logged "inversion (50 steps)" wall against the
# round-5 full-pull runs: 1792.9 s (run A) / 1251.4 s (run B)
# (perf_logs/c5_120f_r5/), vs the 233.9 s un-checkpointed reconstruction.
#
#   bash scripts/tpu_ckpt_delta_check.sh [WORKDIR=/tmp/c5_ckpt] [SRC=/tmp/c5_120]
set -u

REPO=$(cd "$(dirname "$0")/.." && pwd)
WORK=${1:-/tmp/c5_ckpt}
SRC=${2:-/tmp/c5_120}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/.jax_cache}
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"

mkdir -p "$WORK"
cd "$WORK"
if [ ! -f data/woman-running/00119.png ]; then
  mkdir -p data
  cp -r "$SRC/data/woman-running" data/
fi
cp "$SRC/config_c5.yaml" config_c5.yaml

T0=$(date +%s)
python "$REPO/preprocess.py" \
  --data_path data/woman-running --H 768 --W 768 \
  --sd_version 2.1 --steps 50 --save_steps 50 \
  --n_frames 120 --batch_size 40 \
  --inversion_prompt "a woman running" \
  --init random --data_parallel off \
  --steps_per_dispatch 5 --frames_per_dispatch 24 \
  --checkpoint_inversion \
  --prewarm_edit_config config_c5.yaml > pre_delta.log 2>&1
rc=$?
T1=$(date +%s)
echo "[ckpt-delta] rc=$rc total_wall=$((T1 - T0))s"
grep -h "inversion (\|reconstruction:\|compile-ahead\|resuming\|dispatches" \
  pre_delta.log || true
