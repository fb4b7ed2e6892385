#!/bin/bash
# Round-5 phase 2: unit-vocoder long continuation (VERDICT r4 #1i).
# spc=1 — the graph shape already in the relay compile cache (the r4
# spc=8 recompile outlived its own budget; lesson recorded in
# tools/round4b_queue2.sh).  ~2 steps/s on TPU v5e.
#
# Rev 2: --grace 1500 (first-launch compile takes >600 s through the
# relay) and the watchdog now survives the resume-prune truncation of
# metrics.jsonl (tools/watchdog.py last_step offset reset) — rev 1
# kill-looped for ~80 min because the pruned file left the byte offset
# past EOF and every healthy child died at step=None.
set -u
cd /root/repo
echo "[q5p2 $(date +%H:%M:%S)] unit vocoder continuation"
python tools/watchdog.py --metrics runs/unit_vocoder/metrics.jsonl \
  --grace 1500 --limit 600 --max-wall "${UV_MAX_WALL:-5100}" \
  --log runs/logs/r5_uv_child.log -- \
  python -m hifigan_tpu.cli train-unit-vocoder --bf16 --resume \
  --checkpoint_dir runs/unit_vocoder --max_steps 100000 \
  --save_steps 1600 --log_every 400
echo "[q5p2 $(date +%H:%M:%S)] done rc=$?"
touch runs/logs/r5_uv_done
