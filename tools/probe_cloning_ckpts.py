#!/usr/bin/env python3
"""Rank surviving cloning checkpoints by the eval-protocol transfer grid.

Round-5 best-checkpoint selection (VERDICT r4 next #3/#4): the in-trainer
probe (cli.py train-clone) logs a 16-pair verified rate at every metrics
write, but 16 pairs is +-0.06 noise per pair flip, too coarse to pick a
shipping checkpoint.  This tool replays the REAL eval protocol
(`hifigan_tpu.eval.cloning_eval.evaluate_cloning_transfer`, same held-out
eval keys, same 0.7 bar as /root/reference/speaker_embedding/
ecapa_tdnn.py:212-225) over every checkpoint step present in
--checkpoint_dir, at a reduced content count for speed, and prints a
ranking.  The winner is then pruned-to and committed; the full 224-pair
eval-clone runs on it afterwards (tools/round5_finish.sh).

Usage:
  JAX_PLATFORMS=cpu python tools/probe_cloning_ckpts.py \
      --n_contents 1 --output /tmp/clone_probe_r05.json
"""
import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

log = logging.getLogger("probe_cloning")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint_dir", default="runs/cloning")
    ap.add_argument("--encoders", default="runs/encoders7")
    ap.add_argument("--steps", type=int, nargs="*", default=None,
                    help="explicit step list (default: all in dir)")
    ap.add_argument("--n_speakers", type=int, default=8)
    ap.add_argument("--n_contents", type=int, default=1,
                    help="1 content -> 56 transfer pairs at 8 speakers")
    ap.add_argument("--output", default=None)
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO,
                        format="[%(name)s %(asctime)s] %(message)s",
                        datefmt="%H:%M:%S")

    import jax

    # the rig's sitecustomize pins JAX_PLATFORMS=axon; env overrides do
    # not work — force the CPU backend through jax.config (same trick as
    # cli --cpu) so the probe never contends with the training TPU.
    jax.config.update("jax_platforms", "cpu")

    from hifigan_tpu.eval.cloning_eval import (
        evaluate_cloning_transfer,
        speaker_centroids,
    )
    from hifigan_tpu.models.embeddings import EcapaTdnn
    from hifigan_tpu.train import TrainConfig, create_train_state
    from hifigan_tpu.train.checkpoint import CheckpointManager
    from hifigan_tpu.train.corpus import FormantSpeechCorpus
    from hifigan_tpu.train.encoder_pretrain import (
        EncoderTrainConfig,
        create_encoder_state,
        strip_classifier,
    )
    from hifigan_tpu.train.train_step import audio_to_mel

    cfg = TrainConfig()
    state_tpl, vocoder, _ = create_train_state(
        jax.random.PRNGKey(0), cfg, mel_frames=32, batch_size=1)
    mgr = CheckpointManager(args.checkpoint_dir)
    steps = args.steps or mgr.all_steps()
    log.info("probing steps: %s", steps)

    ecfg = EncoderTrainConfig()
    etpl, _, _, _ = create_encoder_state(jax.random.PRNGKey(0), ecfg)
    etpl = CheckpointManager(args.encoders).restore(etpl)
    spk_infer = EcapaTdnn(channels=ecfg.ecapa_channels)
    spk_params = strip_classifier(etpl.ecapa_params)
    embed = jax.jit(lambda m: spk_infer.apply(spk_params, m))
    mel_of_wav = jax.jit(lambda w: audio_to_mel(w, cfg))

    corpus = FormantSpeechCorpus(n_speakers=32)
    cents = speaker_centroids(embed, mel_of_wav, corpus,
                              n_speakers=args.n_speakers)

    results = []
    for step in steps:
        state = mgr.restore(state_tpl, step=int(step))
        gen_params = state.gen_params
        synth = jax.jit(lambda m, r: vocoder.apply(
            gen_params, m, reference_mel=r)["waveform"])
        rep = evaluate_cloning_transfer(
            synth, embed, mel_of_wav, mel_of_wav, corpus,
            n_speakers=args.n_speakers, n_contents=args.n_contents,
            centroids=cents)
        rep.pop("pairs", None)
        row = {"step": int(step),
               "transfer_verified_rate": rep["transfer_verified_rate"],
               "transfer_sim_target_mean": rep["transfer_sim_target_mean"],
               "correct_ref_sim_to_own": rep["ablation"][
                   "correct_ref_sim_to_own"]}
        log.info("step %d: verified %.3f sim_tgt %.3f own %.3f",
                 row["step"], row["transfer_verified_rate"],
                 row["transfer_sim_target_mean"],
                 row["correct_ref_sim_to_own"])
        results.append(row)

    results.sort(key=lambda r: (r["transfer_verified_rate"],
                                r["transfer_sim_target_mean"]), reverse=True)
    out = {"n_pairs": args.n_speakers * (args.n_speakers - 1) * args.n_contents,
           "ranking": results}
    print(json.dumps(out, indent=2))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
