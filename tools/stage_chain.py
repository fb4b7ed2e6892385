"""Stage-isolation diagnostic for the simultaneous-speech quality chain.

Round 4 measured this ad-hoc (docs/ROUND_NOTES.md round-4 table); this
makes it a one-command, reproducible probe of WHERE speech ASR-BLEU is
lost between the trained stages (reference capability: the agent emits
listenable translated speech via a converged CodeHiFiGAN,
/root/reference/agent/tts/vocoder.py:30-108):

  A. teacher units + teacher durations  -> unit-vocoder ceiling
  B. teacher units + predicted durations -> + duration-predictor loss
  C. decoder-fed T2U units from gold text -> + T2U/decoder-feature loss
  (D. the full simultaneous agent lives in `cli eval-s2st`)

Usage:  python tools/stage_chain.py [--samples 8] [--cpu] [--output f]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--checkpoint_dir", default="runs/s2st3")
    ap.add_argument("--unit_vocoder", default="runs/unit_vocoder")
    ap.add_argument("--uv_step", type=int, default=None,
                    help="restore this unit-vocoder step instead of latest "
                         "(round-5 checkpoint ranking)")
    ap.add_argument("--output", default=None)
    ap.add_argument("--stages", default=None,
                    help="comma-separated subset of stages to run (default "
                         "all four) — e.g. 'encoder_fed_units' for fast "
                         "end-to-end checkpoint ranking")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from hifigan_tpu.eval.asr import load_competent_ctc
    from hifigan_tpu.eval.metrics import corpus_bleu
    from hifigan_tpu.models.code_vocoder import CodeVocoderConfig
    from hifigan_tpu.models.streamspeech import StreamSpeechConfig
    from hifigan_tpu.streaming.decode import ctc_greedy_collapse
    from hifigan_tpu.streaming.runtime import S2STInference, S2STInferenceConfig
    from hifigan_tpu.train import TrainConfig
    from hifigan_tpu.train.checkpoint import CheckpointManager
    from hifigan_tpu.train.corpus import PHONES, FormantSpeechCorpus, plan_phone_ids
    from hifigan_tpu.train.s2st_task import (
        TOKEN_OFFSET,
        S2STTaskConfig,
        create_s2st_state,
        translate,
    )
    from hifigan_tpu.train.unit_vocoder import (
        UnitVocoderTaskConfig,
        create_unit_vocoder_state,
        plan_units_durations,
        translate_plan,
    )

    # trained stack (config loader checks the checkpoint's _feature_rev)
    from hifigan_tpu.cli import _load_streamspeech_config

    cfg = _load_streamspeech_config(
        os.path.join(args.checkpoint_dir, "streamspeech_config.json"),
        StreamSpeechConfig)
    state, model, _ = create_s2st_state(jax.random.PRNGKey(0), cfg,
                                        S2STTaskConfig())
    state = CheckpointManager(args.checkpoint_dir).restore(state)

    with open(os.path.join(args.unit_vocoder, "code_config.json")) as f:
        cd = json.load(f)
    cd["upsample_factors"] = tuple(cd["upsample_factors"])
    task = UnitVocoderTaskConfig(code=CodeVocoderConfig(**cd))
    uv_state, cv, _ = create_unit_vocoder_state(
        jax.random.PRNGKey(0), TrainConfig(), task)
    uv_state = CheckpointManager(args.unit_vocoder).restore(
        uv_state, step=args.uv_step)
    cvp = uv_state.gen_params
    inf = S2STInference(model, state.params, cv, cvp,
                        S2STInferenceConfig(max_target_len=64))

    def detok(ids):
        return " ".join(
            PHONES[i - TOKEN_OFFSET + 1]
            if 1 <= i - TOKEN_OFFSET + 1 < len(PHONES) else f"<{i}>"
            for i in ids)

    def synth_units(units, durations=None):
        U = len(units)
        bucket = -(-U // 8) * 8
        ub = np.zeros((1, bucket), np.int32)
        ub[0, :U] = units
        if durations is not None:
            db = np.zeros((1, bucket), np.int32)
            db[0, :U] = durations
            wav, dur, n = cv.apply(cvp, jnp.asarray(ub),
                                   durations=jnp.asarray(db))
        else:
            wav, dur, n = cv.apply(cvp, jnp.asarray(ub))
        dur = np.asarray(dur)[0]
        ratio = 1
        for f in cv.config.upsample_factors:
            ratio *= f
        real = int(np.asarray(n)[0]) - int(dur[U:].sum()) * ratio
        return np.asarray(wav)[0, 0, :max(real, 0)]

    corpus = FormantSpeechCorpus(n_speakers=32)
    all_stages = ("teacher_units_teacher_dur", "teacher_units_pred_dur",
                  "decoder_fed_gold_text", "encoder_fed_units")
    if args.stages:
        want = set(args.stages.split(","))
        unknown = want - set(all_stages)
        if unknown:
            raise SystemExit(f"unknown stages: {sorted(unknown)} "
                             f"(choose from {all_stages})")
    else:
        want = set(all_stages)
    rows = {k: {"hyps": [], "refs": []} for k in all_stages if k in want}
    gate_wavs, gate_texts = [], []
    samples = []
    for i in range(args.samples):
        wav, plan, _ar = corpus.utterance(i % 32, 0, content=2_000_000 + i,
                                          return_plan=True)
        src_ids = plan_phone_ids(plan)
        gate_wavs.append(wav)
        gate_texts.append(" ".join(PHONES[p] for p in src_ids if p != 0))
        samples.append((wav, plan, src_ids))

    asr, gate = load_competent_ctc(
        ["runs/asr_judge", args.checkpoint_dir], gate_wavs[:4], gate_texts[:4])
    if asr is None:
        raise SystemExit(f"no competent judge: {json.dumps(gate)}")

    for wav, plan, src_ids in samples:
        ref_ids = translate(src_ids)
        ref_text = detok(list(ref_ids))
        tplan = translate_plan(plan)
        units, durs = plan_units_durations(
            tplan, max_dur=cv.config.max_duration_per_unit,
            frame_seconds=task.frame_seconds)
        # A: teacher everything — the unit-vocoder ceiling
        if "teacher_units_teacher_dur" in rows:
            out = synth_units(units, durs)
            rows["teacher_units_teacher_dur"]["hyps"].append(asr(out))
            rows["teacher_units_teacher_dur"]["refs"].append(ref_text)
        # B: predicted durations
        if "teacher_units_pred_dur" in rows:
            out = synth_units(units)
            rows["teacher_units_pred_dur"]["hyps"].append(asr(out))
            rows["teacher_units_pred_dur"]["refs"].append(ref_text)
        enc = None
        if "decoder_fed_gold_text" in rows or "encoder_fed_units" in rows:
            from hifigan_tpu.streaming.features import OnlineFbank

            fb = OnlineFbank()
            fb.push(np.asarray(wav, np.float32))
            enc = inf.encode_prefix(fb.frames())
        # C: decoder-fed units from the gold text prefix
        if "decoder_fed_gold_text" in rows:
            dec_units, _tot = inf.units_from_text(enc["enc"],
                                                  list(ref_ids), 0)
            out = (synth_units(np.asarray(dec_units, np.int32))
                   if len(dec_units) else np.zeros(0, np.float32))
            rows["decoder_fed_gold_text"]["hyps"].append(
                asr(out) if len(out) else "")
            rows["decoder_fed_gold_text"]["refs"].append(ref_text)
        # encoder-fed units (the reference's L2 wiring,
        # streamspeech_integration.py:357): unit CTC over encoder output
        if "encoder_fed_units" in rows:
            enc_units, _ = inf.units_from_prefix(enc["unit_argmax"], 0)
            out = (synth_units(np.asarray(enc_units, np.int32))
                   if len(enc_units) else np.zeros(0, np.float32))
            rows["encoder_fed_units"]["hyps"].append(
                asr(out) if len(out) else "")
            rows["encoder_fed_units"]["refs"].append(ref_text)

    report = {"n": args.samples,
              "unit_vocoder_step": int(uv_state.step),
              "s2st_step": int(state.step),
              "asr_judge": gate.get("selected"),
              "stages": {}}
    for k, v in rows.items():
        report["stages"][k] = round(corpus_bleu(v["hyps"], v["refs"]), 2)
    print(json.dumps(report, indent=1))
    if args.output:
        tmp = args.output + ".tmp"
        with open(tmp, "w") as f:
            json.dump(report, f, indent=1)
        os.replace(tmp, args.output)


if __name__ == "__main__":
    main()
