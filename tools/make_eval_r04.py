"""Assemble EVAL_r04.json from the round-4 evaluation artifacts.

Inputs (produced by ``hifigan_tpu.cli``):
  - fidelity: ``cli eval --compare_random --samples 8 --save_wavs
    docs/eval_wavs_r04 --output /tmp/EVAL_r04_fidelity.json``
    (FULL-utterance copy-synthesis on held-out formant clips —
    round 3 cropped to 0.5 s which broke ASR-BLEU by construction;
    valid-frame-masked fidelity; trained-encoder SIM; offline
    ASR-BLEU via an independent self-trained CTC judge)
  - cloning: ``cli eval-clone --output /tmp/eval_clone_r04.json``
    (cross-speaker transfer grid + conditioning ablation; identity-loss
    fine-tuned checkpoint)
  - s2st: the trained stack's own held-out eval
    (``runs/s2st3/s2st_eval.json``) and the streaming AL/quality
    policy-tradeoff table from ``cli eval-s2st --samples 32``.

Unlike round 3's assembler, a missing input is recorded as a loud
``{"status": "SKIPPED", "reason": ...}`` row (the evaluator's own
convention) — never a silent ``null`` (VERDICT r3 weak #9).
"""
import json
import os
import sys

OUT = "EVAL_r04.json"


def load(path, what):
    if path and os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {"status": "SKIPPED",
            "reason": f"{what}: input artifact {path!r} not found — "
                      "the producing eval was not run"}


def main():
    fid = load(sys.argv[1] if len(sys.argv) > 1 else
               "/tmp/EVAL_r04_fidelity.json",
               "copy-synthesis fidelity (cli eval)")
    clone = load(sys.argv[2] if len(sys.argv) > 2 else
                 "/tmp/eval_clone_r04.json",
                 "voice-cloning transfer (cli eval-clone)")
    s2st_dir = next((d for d in ("runs/s2st3", "runs/s2st2")
                     if os.path.exists(os.path.join(d, "s2st_eval.json"))),
                    None)
    s2st = load(os.path.join(s2st_dir, "s2st_eval.json") if s2st_dir
                else None, "held-out offline token-F1 (cli train-s2st)")
    tradeoff = load(sys.argv[3] if len(sys.argv) > 3 else
                    "/tmp/eval_s2st_r04.json",
                    "streaming AL/quality policy tradeoff (cli eval-s2st)")
    report = {
        "round": 4,
        "fidelity_copy_synthesis": fid,
        "voice_cloning": clone,
        "s2st_heldout_text": s2st,
        "s2st_policy_tradeoff": tradeoff,
        "notes": {
            "fidelity": "full held-out utterances in one shared compile "
                        "bucket; mel-L1/MCD masked to valid frames; "
                        "ASR-BLEU scores whole synthesized utterances "
                        "against whole reference transcripts (the "
                        "round-3 0.5 s-crop-vs-full-transcript artifact "
                        "is fixed).",
            "voice_cloning": "cloning GAN continued with a frozen-judge "
                             "speaker-identity cosine loss; verified = "
                             "trained-encoder cosine-to-target above the "
                             "reference's 0.7 threshold "
                             "(speaker_embedding/ecapa_tdnn.py:198-225).",
            "streaming": "agents rate-limited by the target-CTC emission "
                         "budget (reference agent.py:495-509); AL is "
                         "standard Average Lagging (Ma et al., 2019), "
                         "unclamped.",
            "asr_bleu": "offline, via a self-trained CTC judge "
                        "(runs/asr_judge when present — independent of "
                        "the system under test); no network models.",
        },
    }
    if isinstance(clone, dict) and "pairs" in clone:
        pairs = clone.get("pairs")
        if pairs and len(pairs) > 24:
            clone["pairs"] = pairs[:24]
    skipped = [k for k, v in report.items()
               if isinstance(v, dict) and v.get("status") == "SKIPPED"]
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"written": OUT, "skipped_sections": skipped}))
    if skipped:
        print(f"WARNING: {len(skipped)} section(s) SKIPPED: "
              f"{', '.join(skipped)}", file=sys.stderr)


if __name__ == "__main__":
    main()
