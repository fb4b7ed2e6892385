#!/bin/bash
# Round-5 phase 3: cloning identity continuation with the centroid-hinge
# loss (VERDICT r4 #3).  Resumes runs/cloning at step 260000.
#
# - waits for the phase-2 unit-vocoder slot to free the TPU
#   (runs/logs/r5_uv_done), up to WAIT_MAX seconds;
# - identity_weight 20 (the r4 rendition-cosine at weight 8 never moved;
#   the hinge form is silent on passing pairs so a larger weight is safe);
# - spc=8 is a NEW graph for the new loss — grace 1800 covers the relay
#   compile; the eval-protocol probe logs verified-rate at every write
#   so the run is judged by trend, not hope.
set -u
cd /root/repo
log() { echo "[q5p3 $(date +%H:%M:%S)] $*"; }
WAIT_MAX=${WAIT_MAX:-6000}
waited=0
while [ ! -f runs/logs/r5_uv_done ] && [ "$waited" -lt "$WAIT_MAX" ]; do
  sleep 30; waited=$((waited + 30))
done
log "TPU slot free (waited ${waited}s); starting cloning continuation"
python tools/watchdog.py --metrics runs/cloning/metrics.jsonl \
  --grace 1800 --limit 600 --max-wall "${CLONE_MAX_WALL:-5400}" \
  --log runs/logs/r5_clone_child.log -- \
  python -m hifigan_tpu.cli train-clone --checkpoint_dir runs/cloning \
  --bf16 --resume --identity_weight 20.0 --identity_margin 0.8 --identity_finetune \
  --max_steps 400000 --steps_per_call 8 --save_steps 1600 --log_every 320
log "done rc=$?"
touch runs/logs/r5_clone_done
