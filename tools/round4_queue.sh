#!/bin/bash
# Round-4 sequential TPU training queue (one chip — phases must not overlap).
# Each phase runs under tools/watchdog.py (relay wedges every ~40-80 min;
# remote compile is silent for 10-25 min — docs/ROUND_NOTES.md).
set -u
cd /root/repo
log() { echo "[queue $(date +%H:%M:%S)] $*"; }

# 1. wait for the unit-vocoder watchdog (launched separately) to finish
if [ -f /tmp/uv_watchdog.pid ]; then
  while kill -0 "$(cat /tmp/uv_watchdog.pid)" 2>/dev/null; do sleep 30; done
fi
log "unit-vocoder phase done"; touch /tmp/q_uv_done

# 2. s2st3 continuation: balanced transition head + stronger prefix masking
python tools/watchdog.py --metrics runs/s2st3/metrics.jsonl \
  --grace 3000 --limit 300 --max-wall 5400 --log /tmp/s2st3_child.log -- \
  python -m hifigan_tpu.cli train-s2st --checkpoint_dir runs/s2st3 --resume \
  --max_steps 90000 --prefix_mask_prob 0.65 --prefix_min_frac 0.1 \
  --eval_samples 32 >> /tmp/s2st3_wd.log 2>&1
log "s2st3 done"; touch /tmp/q_s2st3_done

# 3. independent ASR judge (different seed, disjoint run)
python tools/watchdog.py --metrics runs/asr_judge/metrics.jsonl \
  --grace 3000 --limit 300 --max-wall 3600 --log /tmp/judge_child.log -- \
  python -m hifigan_tpu.cli train-s2st --checkpoint_dir runs/asr_judge \
  --resume --seed 7 --max_steps 30000 --eval_samples 16 \
  >> /tmp/judge_wd.log 2>&1
log "asr_judge done"; touch /tmp/q_judge_done

# 4. cloning identity continuation (frozen-judge cosine loss)
python tools/watchdog.py --metrics runs/cloning/metrics.jsonl \
  --grace 3000 --limit 400 --max-wall 8000 --log /tmp/clone_child.log -- \
  python -m hifigan_tpu.cli train-clone --checkpoint_dir runs/cloning \
  --resume --identity_weight 8.0 --max_steps 260000 --steps_per_call 8 \
  --log_every 320 >> /tmp/clone_wd.log 2>&1
log "cloning done"; touch /tmp/q_clone_done
log "queue finished"
