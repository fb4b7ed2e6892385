#!/bin/bash
# Round-5 phase 6: flagship fidelity continuation (VERDICT r4 #7 —
# MCD <= 7.5 full-utterance; the 192k checkpoint was untouched since
# round 3 and train loss was still falling).  Same deep-FM + multi-res
# STFT recipe and graph shape as the r3 continuation (053f0eb) so the
# relay compile cache can hit.  Chained on the phase-5 uv2 done-marker.
set -u
cd /root/repo
log() { echo "[q5p6 $(date +%H:%M:%S)] $*"; }
WAIT_MAX=${WAIT_MAX:-7200}
waited=0
while [ ! -f runs/logs/r5_uv2_done ] && [ "$waited" -lt "$WAIT_MAX" ]; do
  sleep 30; waited=$((waited + 30))
done
log "TPU slot free (waited ${waited}s); starting flagship continuation"
python tools/watchdog.py --metrics runs/flagship/metrics.jsonl \
  --grace 1800 --limit 600 --max-wall "${FLAG_MAX_WALL:-6000}" \
  --log runs/logs/r5_flag_child.log -- \
  python -m hifigan_tpu.cli train --dataset formant --dataset_size 512 \
  --batch_size 16 --segment_samples 8192 --bf16 --steps_per_call 32 \
  --device_data --resume --checkpoint_dir runs/flagship \
  --max_steps 400000 --save_steps 4000 --log_every 320 --auto_recover \
  --deep_fm --stft_weight 1.0
log "done rc=$?"
touch runs/logs/r5_flag_done
