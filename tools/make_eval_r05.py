"""Assemble EVAL_r05.json from the round-5 evaluation artifacts.

Inputs (produced by ``hifigan_tpu.cli``, CPU backend, final round-5
checkpoints):
  - fidelity: ``cli --cpu eval --compare_random --samples 8
    --save_wavs docs/eval_wavs_r05 --output /tmp/EVAL_r05_fidelity.json``
    (full-utterance copy-synthesis; round 5 masks speaker/emotion SIM to
    valid frames like mel-L1/MCD — the round-4 per-sample emo-SIM 0.418
    outlier was a padded-bucket artifact)
  - cloning: ``cli --cpu eval-clone --output /tmp/eval_clone_r05.json``
    (cross-speaker transfer grid after the centroid-hinge identity
    continuation)
  - s2st text: the trained stack's held-out eval
    (``runs/s2st3/s2st_eval.json``)
  - s2st streaming: ``cli --cpu eval-s2st --samples 32
    --speech_policies offline,stride1,waitk3 --output
    /tmp/eval_s2st_r05.json`` — text-policy AL/F1 grid plus the
    per-policy SPEECH ASR-BLEU tradeoff (VERDICT r4 #8), judged by the
    competence-gated independent CTC judge (runs/asr_judge @ 30k).

A missing input is recorded as a loud ``{"status": "SKIPPED"}`` row,
and the output is written atomically (temp file + os.replace).
"""
import json
import os
import sys

OUT = "EVAL_r05.json"


def load(path, what):
    if path and os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {"status": "SKIPPED",
            "reason": f"{what}: input artifact {path!r} not found — "
                      "the producing eval was not run"}


def main():
    fid = load(sys.argv[1] if len(sys.argv) > 1 else
               "/tmp/EVAL_r05_fidelity.json",
               "copy-synthesis fidelity (cli eval)")
    clone = load(sys.argv[2] if len(sys.argv) > 2 else
                 "/tmp/eval_clone_r05.json",
                 "voice-cloning transfer (cli eval-clone)")
    s2st_dir = next((d for d in ("runs/s2st3", "runs/s2st2")
                     if os.path.exists(os.path.join(d, "s2st_eval.json"))),
                    None)
    s2st = load(os.path.join(s2st_dir, "s2st_eval.json") if s2st_dir
                else None, "held-out offline token-F1 (cli train-s2st)")
    tradeoff = load(sys.argv[3] if len(sys.argv) > 3 else
                    "/tmp/eval_s2st_r05.json",
                    "streaming AL/quality policy tradeoff (cli eval-s2st)")
    report = {
        "round": 5,
        "fidelity_copy_synthesis": fid,
        "voice_cloning": clone,
        "s2st_heldout_text": s2st,
        "s2st_policy_tradeoff": tradeoff,
        "notes": {
            "fidelity": "full held-out utterances in one shared compile "
                        "bucket; ALL metrics (mel-L1/MCD AND speaker/"
                        "emotion SIM) masked to valid frames — round 4's "
                        "single emo-SIM collapse (0.418) was the padded "
                        "bucket tail corrupting the pooled embedding.",
            "voice_cloning": "cloning GAN continued with a CENTROID-HINGE "
                             "identity loss (judge cosine to the target "
                             "speaker's centroid, squared hinge at margin "
                             "0.8) after the round-4 rendition-cosine "
                             "form stayed flat for 40k steps; an "
                             "eval-protocol probe (16 held-out transfer "
                             "pairs, 0.7 bar) was logged at every save.",
            "streaming": "agents rate-limited by the target-CTC emission "
                         "budget (reference agent.py:495-509); AL is "
                         "standard Average Lagging (Ma et al., 2019), "
                         "unclamped; round 5 adds the per-policy SPEECH "
                         "ASR-BLEU tradeoff (offline/stride1/waitk3) — "
                         "speech is the reference's output modality.",
            "asr_bleu": "offline, via a competence-gated CTC judge: every "
                        "candidate must transcribe ground-truth clips at "
                        "phone-CER <= 0.4 or is rejected loudly; the "
                        "shipped independent judge (runs/asr_judge, seed "
                        "7, 30k steps) passes at CER 0.084.",
        },
    }
    if isinstance(clone, dict) and "pairs" in clone:
        pairs = clone.get("pairs")
        if pairs and len(pairs) > 24:
            clone["pairs"] = pairs[:24]
    skipped = [k for k, v in report.items()
               if isinstance(v, dict) and v.get("status") == "SKIPPED"]
    tmp = OUT + ".tmp"
    with open(tmp, "w") as f:
        json.dump(report, f, indent=1)
    os.replace(tmp, OUT)
    print(json.dumps({"written": OUT, "skipped_sections": skipped}))
    if skipped:
        print(f"WARNING: {len(skipped)} section(s) SKIPPED: "
              f"{', '.join(skipped)}", file=sys.stderr)


if __name__ == "__main__":
    main()
