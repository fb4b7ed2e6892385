"""Transplant the trained ECAPA branch of an old-config encoder
checkpoint into a fresh state under the current
:class:`~hifigan_tpu.train.encoder_pretrain.EncoderTrainConfig`.

Round-3 context: the judge Emotion2Vec moved from the reference's 6x512
post-norm stack (untrainable on the arousal task at any probed lr; see
EncoderTrainConfig docstring) to 3x256.  Speaker checkpoints trained
under the old config carry a 6x512 emotion branch, so their pytree no
longer matches the default restore template.  This tool restores with
an explicit old-config template, keeps the (good) speaker branch, and
re-initialises the emotion branch + optimizer under the new config so
training can continue in a new directory.

Usage:
    python tools/transplant_encoders.py --src runs/encoders6 \
        --dst runs/encoders7 [--src_emo 512,6,8]
"""

import argparse
import sys

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--src_emo", default="512,6,8",
                    help="hidden,layers,heads of the SOURCE emotion branch")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from dataclasses import replace

    from hifigan_tpu.train.checkpoint import CheckpointManager
    from hifigan_tpu.train.encoder_pretrain import (
        EncoderTrainConfig,
        create_encoder_state,
    )

    hidden, layers, heads = (int(x) for x in args.src_emo.split(","))
    new_cfg = EncoderTrainConfig()
    old_cfg = replace(new_cfg, emo_hidden=hidden, emo_layers=layers,
                      emo_heads=heads)

    old_tpl, _, _, _ = create_encoder_state(jax.random.PRNGKey(0), old_cfg)
    src = CheckpointManager(args.src).restore(old_tpl)
    print(f"restored {args.src} step {int(src.step)}")

    new_state, _, _, _ = create_encoder_state(jax.random.PRNGKey(1), new_cfg)
    out = new_state.replace(
        step=src.step,
        ecapa_params=src.ecapa_params,
        ecapa_opt=src.ecapa_opt,
    )
    dst = CheckpointManager(args.dst)
    assert dst.save(out, force=True), "save failed"
    dst.wait()
    print(f"saved transplant to {args.dst} step {int(out.step)} "
          f"(speaker: kept; emotion: fresh {new_cfg.emo_layers}x"
          f"{new_cfg.emo_hidden})")


if __name__ == "__main__":
    main()
