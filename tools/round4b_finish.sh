#!/bin/bash
# Round-4 (session b) final eval refresh — CPU only, safe to run while the
# TPU is busy.  Re-measures everything the session-b trainings changed:
#   - end-to-end simultaneous-speech ASR-BLEU (new unit-vocoder steps,
#     independent runs/asr_judge when trained)
#   - voice-cloning transfer grid (identity-loss continuation)
#   - copy-synthesis fidelity (same flagship weights; re-judged by
#     runs/asr_judge for a single consistent judge across the report)
# then splices the results into EVAL_r04.json.
set -eu
cd /root/repo
log() { echo "[finish $(date +%H:%M:%S)] $*"; }

# NB: env JAX_PLATFORMS=cpu is overridden by the rig's sitecustomize —
# the CLI's --cpu flag forces the backend through jax.config instead.
log "1/4 speech-path ASR-BLEU (32 samples, text-policy grid skipped)"
python -m hifigan_tpu.cli --cpu eval-s2st --samples 32 --policies none \
  --save_wavs docs/eval_wavs_r04/s2st --output /tmp/eval_s2st_speech.json

log "2/4 voice-cloning transfer grid"
python -m hifigan_tpu.cli --cpu eval-clone --full_pairs \
  --output /tmp/eval_clone_r04.json

log "3/4 copy-synthesis fidelity"
python -m hifigan_tpu.cli --cpu eval --compare_random --samples 8 \
  --save_wavs docs/eval_wavs_r04 --output /tmp/EVAL_r04_fidelity.json

log "4/4 splice into EVAL_r04.json"
python - <<'PY'
import json
import os

doc = json.load(open("EVAL_r04.json"))
trade = doc["s2st_policy_tradeoff"]
speech = json.load(open("/tmp/eval_s2st_speech.json"))
# fail loudly rather than splicing a partial speech run: a missing key
# here means step 1 upstream failed and the stale EVAL value must not
# silently survive next to refreshed judge metadata (ADVICE r4 #2)
missing = [k for k in ("s2st_asr_bleu", "asr_judge", "restored_step",
                       "checkpoint_dir") if k not in speech]
if missing:
    raise SystemExit(f"speech eval output incomplete — missing {missing}; "
                     "not splicing")
for k in ("s2st_asr_bleu", "asr_judge", "restored_step", "checkpoint_dir"):
    trade[k] = speech[k]
trade["unit_vocoder_note"] = (
    "policy rows (token_f1/AL) are from the 32-sample full-grid run on the "
    "same s2st3 step; s2st_asr_bleu/asr_judge re-measured after the "
    "session-b unit-vocoder continuation")
doc["voice_cloning"] = json.load(open("/tmp/eval_clone_r04.json"))
doc["fidelity_copy_synthesis"] = json.load(open("/tmp/EVAL_r04_fidelity.json"))
# serialize fully before touching the target, then swap atomically
tmp = "EVAL_r04.json.tmp"
with open(tmp, "w") as f:
    json.dump(doc, f, indent=1)
os.replace(tmp, "EVAL_r04.json")
print("EVAL_r04.json updated")
PY
log "done"
