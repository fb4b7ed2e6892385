#!/bin/bash
# Round-5 phase 7: third unit-vocoder continuation.  The phase-5 tail
# (step 24000) ships speech ASR-BLEU 15.3-16.7 (independent judge, n=24)
# against the 20.0 fluency bar, and the uv mel loss is still falling
# (0.166 @ 4800 -> 0.101 @ 24400), so more vocoder convergence remains
# the cheapest BLEU.  Same flags as phases 2/5 => the relay's compiled
# graph is reused; resumes from the phase-5 tail (24400).  Chained on
# the phase-6 flagship done-marker (one TPU job at a time).
set -u
cd /root/repo
log() { echo "[q5p7 $(date +%H:%M:%S)] $*"; }
WAIT_MAX=${WAIT_MAX:-7200}
waited=0
while [ ! -f runs/logs/r5_flag_done ] && [ "$waited" -lt "$WAIT_MAX" ]; do
  sleep 30; waited=$((waited + 30))
done
log "TPU slot free (waited ${waited}s); starting unit-vocoder continuation 3"
python tools/watchdog.py --metrics runs/unit_vocoder/metrics.jsonl \
  --grace 1500 --limit 600 --max-wall "${UV_MAX_WALL:-4800}" \
  --log runs/logs/r5_uv3_child.log -- \
  python -m hifigan_tpu.cli train-unit-vocoder --bf16 --resume \
  --checkpoint_dir runs/unit_vocoder --max_steps 100000 \
  --save_steps 1600 --log_every 400
log "done rc=$?"
touch runs/logs/r5_uv3_done
