#!/bin/bash
# Round-5 final eval pass, take 2 (CPU backend — runs while the TPU
# trains the flagship continuation).  Supersedes tools/round5_finish.sh,
# which was stopped mid-run when checkpoint ranking showed the phase-4
# s2st continuation had DEGRADED offline F1 (0.741 -> 0.60) — its
# eval-s2st was scoring a checkpoint that will not ship.  This pass
# waits for the phase-5 unit-vocoder slot so the speech path is final,
# then measures everything against the SHIPPING checkpoints:
#   s2st3 @ 60002 (restored), cloning @ 220000 (eval already done),
#   unit_vocoder @ phase-5 final, flagship @ phase-6 final.
set -u
cd /root/repo
log() { echo "[finish2 $(date +%H:%M:%S)] $*"; }

log "waiting for phase 5 (unit vocoder continuation 2)"
while [ ! -f runs/logs/r5_uv2_done ]; do sleep 30; done

log "1/4 stage-chain diagnostic (final speech stack)"
python tools/stage_chain.py --samples 8 --cpu \
  --output /tmp/stage_chain_r05.json > runs/logs/r5_stage_chain2.log 2>&1
log "stage-chain rc=$?"

log "2/4 streaming policy grid + per-policy speech ASR-BLEU"
python -m hifigan_tpu.cli --cpu eval-s2st --samples 24 \
  --speech_policies offline,stride1,waitk3 \
  --save_wavs docs/eval_wavs_r05/s2st \
  --output /tmp/eval_s2st_r05.json > runs/logs/r5_eval_s2st2.log 2>&1
log "eval-s2st rc=$?"

log "waiting for phase 6 (flagship continuation)"
while [ ! -f runs/logs/r5_flag_done ]; do sleep 30; done
log "3/4 copy-synthesis fidelity (final flagship checkpoint)"
python -m hifigan_tpu.cli --cpu eval --compare_random --samples 8 \
  --save_wavs docs/eval_wavs_r05 \
  --output /tmp/EVAL_r05_fidelity.json > runs/logs/r5_eval_fidelity2.log 2>&1
log "fidelity rc=$?"

log "4/4 assemble EVAL_r05.json"
python tools/make_eval_r05.py /tmp/EVAL_r05_fidelity.json \
  /tmp/eval_clone_r05.json /tmp/eval_s2st_r05.json
log "done"
touch runs/logs/r5_finish2_done
