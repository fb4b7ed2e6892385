"""Utilities: benchmarking, profiling, logging helpers."""

from hifigan_tpu.utils.benchit import chained_time
from hifigan_tpu.utils.model_info import model_info
from hifigan_tpu.utils.profiling import StageTimer, annotate, device_time, trace_to

__all__ = ["chained_time", "StageTimer", "annotate", "device_time", "trace_to", "model_info"]
