"""GAN training: losses, train state, the jitted alternating train step,
and orbax checkpointing."""

from hifigan_tpu.train.losses import (
    LossWeights,
    discriminator_loss,
    generator_adversarial_loss,
    feature_matching_loss,
    mel_l1_loss,
)
from hifigan_tpu.train.state import GanTrainState, create_train_state, TrainConfig
from hifigan_tpu.train.train_step import make_train_step, make_eval_step

# heavier optional subsystems are imported lazily by their users:
#   hifigan_tpu.train.encoder_pretrain — discriminative encoder training
#   hifigan_tpu.train.cloning          — voice-cloning GAN fine-tune
#   hifigan_tpu.train.s2st_task        — StreamSpeech multitask trainer
#   hifigan_tpu.train.unit_vocoder     — CodeHiFiGAN unit-vocoder trainer

__all__ = [
    "LossWeights",
    "discriminator_loss",
    "generator_adversarial_loss",
    "feature_matching_loss",
    "mel_l1_loss",
    "GanTrainState",
    "TrainConfig",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
]
