#!/bin/bash
# Round-5 phase 8: PLAIN-RECIPE cloning-GAN continuation (no identity
# loss).  Round-5 diagnosis (docs/ROUND_NOTES.md): the verification bar
# is bound by cloning-GAN synthesis fidelity (train mel-L1 ~0.49 vs
# 0.26 flagship), not identity conditioning — both identity-loss
# lineages DEGRADED eval-protocol verification.  So the remaining lever
# is plain GAN convergence from the shipping 220000 checkpoint, ranked
# by the eval-protocol probe (probe_verified / probe_eval_cos) that the
# trainer now logs at every metrics write even with the loss off.
# Chained on the phase-7 uv3 done-marker (one TPU job at a time).
set -u
cd /root/repo
log() { echo "[q5p8 $(date +%H:%M:%S)] $*"; }
WAIT_MAX=${WAIT_MAX:-14400}
waited=0
while [ ! -f runs/logs/r5_uv3_done ] && [ "$waited" -lt "$WAIT_MAX" ]; do
  sleep 30; waited=$((waited + 30))
done
log "TPU slot free (waited ${waited}s); starting plain cloning continuation"
python tools/watchdog.py --metrics runs/cloning/metrics.jsonl \
  --grace 1800 --limit 600 --max-wall "${CLONE_MAX_WALL:-5400}" \
  --log runs/logs/r5_clone2_child.log -- \
  python -m hifigan_tpu.cli train-clone --checkpoint_dir runs/cloning \
  --bf16 --resume --max_steps 400000 --steps_per_call 8 \
  --save_steps 1600 --log_every 320
log "done rc=$?"
touch runs/logs/r5_clone2_done
