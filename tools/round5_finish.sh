#!/bin/bash
# Round-5 final eval pass (CPU backend — safe while the TPU trains).
# Waits for each training phase's done-marker, then measures with the
# FINAL checkpoints and assembles EVAL_r05.json.  Logs under runs/logs/.
set -u
cd /root/repo
log() { echo "[finish $(date +%H:%M:%S)] $*"; }

log "waiting for phase 3 (cloning)"
while [ ! -f runs/logs/r5_clone_evalready ]; do sleep 30; done  # touched manually after best-checkpoint selection
log "1/4 voice-cloning transfer grid (final cloning checkpoint)"
python -m hifigan_tpu.cli --cpu eval-clone --full_pairs \
  --output /tmp/eval_clone_r05.json > runs/logs/r5_eval_clone.log 2>&1
log "eval-clone rc=$?"

log "waiting for phase 4 (s2st3)"
while [ ! -f runs/logs/r5_s2st_done ]; do sleep 30; done
log "2/4 stage-chain diagnostic (final stack)"
python tools/stage_chain.py --samples 8 --cpu \
  --output /tmp/stage_chain_r05.json > runs/logs/r5_stage_chain.log 2>&1
log "stage-chain rc=$?"

log "3/4 streaming policy grid + per-policy speech ASR-BLEU"
python -m hifigan_tpu.cli --cpu eval-s2st --samples 24 \
  --speech_policies offline,stride1,waitk3 \
  --save_wavs docs/eval_wavs_r05/s2st \
  --output /tmp/eval_s2st_r05.json > runs/logs/r5_eval_s2st.log 2>&1
log "eval-s2st rc=$?"

log "4/4 assemble EVAL_r05.json"
python tools/make_eval_r05.py /tmp/EVAL_r05_fidelity.json \
  /tmp/eval_clone_r05.json /tmp/eval_s2st_r05.json
log "done"
touch runs/logs/r5_finish_done
