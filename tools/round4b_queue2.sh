#!/bin/bash
# Round-4 session-b queue, rev 2.  Lesson learned (see git log): wrapping
# the unit-vocoder GAN step in an 8-step scan produced a remote compile
# that outlived its own training budget (>23 min vs ~2.5 min for the
# spc=1 graph already in the relay's cache) — run hot-path continuations
# with the graph shape that is already compiled.
#   1. unit-vocoder continuation, spc=1  (speech-path BLEU, VERDICT #3)
#   2. cloning identity continuation     (verified_rate, VERDICT #6)
#   3. independent ASR judge, best-effort (ADVICE r3 #5)
set -u
cd /root/repo
log() { echo "[queue4b2 $(date +%H:%M:%S)] $*"; }

log "phase 1: unit vocoder spc=1"
python tools/watchdog.py --metrics runs/unit_vocoder/metrics.jsonl \
  --grace 600 --limit 240 --max-wall 900 --log /tmp/uv_child.log -- \
  python -m hifigan_tpu.cli train-unit-vocoder --bf16 --resume \
  --checkpoint_dir runs/unit_vocoder --max_steps 100000 \
  --save_steps 800 --log_every 400 >> /tmp/uv_wd.log 2>&1
log "phase 1 done"; touch /tmp/q4b_uv_done

log "phase 2: cloning identity continuation (spc=8, same graph as r4a)"
python tools/watchdog.py --metrics runs/cloning/metrics.jsonl \
  --grace 900 --limit 400 --max-wall 700 --log /tmp/clone_child.log -- \
  python -m hifigan_tpu.cli train-clone --checkpoint_dir runs/cloning \
  --bf16 --resume --identity_weight 8.0 --max_steps 260000 --steps_per_call 8 \
  --save_steps 1600 --log_every 320 >> /tmp/clone_wd.log 2>&1
log "phase 2 done"; touch /tmp/q4b_clone_done

log "phase 3: independent ASR judge (seed 7, best-effort)"
python tools/watchdog.py --metrics runs/asr_judge/metrics.jsonl \
  --grace 900 --limit 300 --max-wall 700 --log /tmp/judge_child.log -- \
  python -m hifigan_tpu.cli train-s2st --checkpoint_dir runs/asr_judge \
  --bf16 --resume --seed 7 --max_steps 20000 --save_steps 4000 \
  >> /tmp/judge_wd.log 2>&1
log "phase 3 done"; touch /tmp/q4b_judge_done
log "queue finished"
