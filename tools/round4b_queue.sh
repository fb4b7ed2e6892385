#!/bin/bash
# Round-4 (session b) sequential TPU queue — one chip, phases must not overlap.
# Budgeted for ~55 min of wall clock:
#   1. unit-vocoder continuation (speech-path BLEU bottleneck, VERDICT #3)
#      — launched separately; waited on via /tmp/uv_wd2.pid
#   2. independent ASR judge: fresh train-s2st run, seed 7 (ADVICE r3 #5 —
#      eval-s2st must not self-grade with the system under test's encoder)
#   3. cloning identity continuation (verified_rate, VERDICT #6)
set -u
cd /root/repo
log() { echo "[queue4b $(date +%H:%M:%S)] $*"; }

if [ -f /tmp/uv_wd2.pid ]; then
  while kill -0 "$(cat /tmp/uv_wd2.pid)" 2>/dev/null; do sleep 15; done
fi
log "phase 1 (unit vocoder) done"; touch /tmp/q4b_uv_done

log "phase 2: independent ASR judge (seed 7)"
python tools/watchdog.py --metrics runs/asr_judge/metrics.jsonl \
  --grace 2400 --limit 300 --max-wall 850 --log /tmp/judge_child.log -- \
  python -m hifigan_tpu.cli train-s2st --checkpoint_dir runs/asr_judge \
  --bf16 --resume --seed 7 --max_steps 30000 --save_steps 6000 \
  >> /tmp/judge_wd.log 2>&1
log "phase 2 done"; touch /tmp/q4b_judge_done

log "phase 3: cloning identity continuation"
python tools/watchdog.py --metrics runs/cloning/metrics.jsonl \
  --grace 2400 --limit 400 --max-wall 1100 --log /tmp/clone_child.log -- \
  python -m hifigan_tpu.cli train-clone --checkpoint_dir runs/cloning \
  --bf16 --resume --identity_weight 8.0 --max_steps 260000 --steps_per_call 8 \
  --save_steps 1600 --log_every 320 >> /tmp/clone_wd.log 2>&1
log "phase 3 done"; touch /tmp/q4b_clone_done
log "queue finished"
