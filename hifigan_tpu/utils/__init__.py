"""Utilities: benchmarking, logging, profiling helpers."""

from hifigan_tpu.utils.benchit import chained_time

__all__ = ["chained_time"]
