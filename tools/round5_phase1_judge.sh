#!/bin/bash
# Round-5 phase 1: independent ASR judge (VERDICT r4 #2).
# Train runs/asr_judge (seed 7) to 30k steps so `cli eval`/`eval-s2st`
# can report "independent": true with a judge that transcribes ground
# truth near-correctly.  Logs under runs/logs/ (VERDICT r4 hygiene #9).
set -u
cd /root/repo
echo "[q5p1 $(date +%H:%M:%S)] asr_judge -> 30k steps"
python tools/watchdog.py --metrics runs/asr_judge/metrics.jsonl \
  --grace 600 --limit 240 --max-wall 5400 --log runs/logs/r5_judge_child.log -- \
  python -m hifigan_tpu.cli train-s2st --checkpoint_dir runs/asr_judge \
  --bf16 --resume --seed 7 --max_steps 30000 --save_steps 6000 \
  --log_every 200
echo "[q5p1 $(date +%H:%M:%S)] done rc=$?"
touch runs/logs/r5_judge_done
