#!/bin/bash
# Round-5 phase 4: s2st3 continuation past the 0.73-token-F1 plateau
# (VERDICT r4 #5).  Same flags as the round-4 continuation so the
# relay's compiled graph is reused; the formant corpus samples fresh
# utterances every step, so longer training is real signal, not
# memorization.  Chained on the phase-3 cloning slot.
set -u
cd /root/repo
log() { echo "[q5p4 $(date +%H:%M:%S)] $*"; }
WAIT_MAX=${WAIT_MAX:-12000}
waited=0
while [ ! -f runs/logs/r5_clone_done ] && [ "$waited" -lt "$WAIT_MAX" ]; do
  sleep 30; waited=$((waited + 30))
done
log "TPU slot free (waited ${waited}s); starting s2st3 continuation"
python tools/watchdog.py --metrics runs/s2st3/metrics.jsonl \
  --grace 3000 --limit 600 --max-wall "${S2ST_MAX_WALL:-3000}" \
  --log runs/logs/r5_s2st_child.log -- \
  python -m hifigan_tpu.cli train-s2st --checkpoint_dir runs/s2st3 --resume \
  --max_steps 160000 --prefix_mask_prob 0.65 --prefix_min_frac 0.1 \
  --eval_samples 32
log "done rc=$?"
touch runs/logs/r5_s2st_done
