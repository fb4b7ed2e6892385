"""Pallas TPU kernels for the hot ops."""

from hifigan_tpu.ops.pallas.grc_kernel import fused_grc_step, grc_chain

__all__ = ["fused_grc_step", "grc_chain"]
