#!/bin/bash
# Round-5 phase 5: second unit-vocoder continuation (VERDICT r4 #1i —
# the speech path is the quality bottleneck; smoke eval puts speech
# ASR-BLEU right at the 20.0 bar, so more vocoder convergence is the
# cheapest insurance).  Same flags as phase 2 => the relay's compiled
# graph is reused; resumes from the phase-2 tail (~16.4k steps).
# Chained on the phase-4 done-marker.
set -u
cd /root/repo
log() { echo "[q5p5 $(date +%H:%M:%S)] $*"; }
WAIT_MAX=${WAIT_MAX:-7200}
waited=0
while [ ! -f runs/logs/r5_s2st_done ] && [ "$waited" -lt "$WAIT_MAX" ]; do
  sleep 30; waited=$((waited + 30))
done
log "TPU slot free (waited ${waited}s); starting unit-vocoder continuation 2"
python tools/watchdog.py --metrics runs/unit_vocoder/metrics.jsonl \
  --grace 1500 --limit 600 --max-wall "${UV_MAX_WALL:-4200}" \
  --log runs/logs/r5_uv2_child.log -- \
  python -m hifigan_tpu.cli train-unit-vocoder --bf16 --resume \
  --checkpoint_dir runs/unit_vocoder --max_steps 100000 \
  --save_steps 1600 --log_every 400
log "done rc=$?"
touch runs/logs/r5_uv2_done
