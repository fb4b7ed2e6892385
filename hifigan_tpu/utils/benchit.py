"""Reliable device timing under asynchronous/remote dispatch.

The axon relay acknowledges dispatch long before device completion, so
naive ``block_until_ready`` wall-clocking measures dispatch throughput,
not compute (observed: 500+ TFLOP/s "throughput" on a 197 TFLOP/s
chip).  ``chained_time`` forces truth two ways:

1. the measured function is iterated inside one jitted ``lax.scan``
   whose carry makes every iteration data-dependent on the previous one
   (no overlap, no elision), and
2. the final scalar is fetched to the host, which cannot complete
   before the device work has.

Per-iteration time = (fetch-to-fetch wall time − single-iteration
baseline RTT) / extra iterations, amortising the relay round trip.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp


def chained_time(
    fn: Callable,
    args: Sequence,
    *,
    n: int = 16,
    perturb_arg: int = 0,
    repeats: int = 2,
) -> float:
    """Median seconds per call of ``fn(*args)`` measured on device.

    ``fn`` must return an array; ``args[perturb_arg]`` must be a float
    array (it gets an infinitesimal data-dependent perturbation each
    iteration to serialise the chain).
    """

    def make(length):
        @jax.jit
        def chained(*a):
            x0 = a[perturb_arg]

            def body(carry, _):
                a2 = list(a)
                a2[perturb_arg] = x0 + carry.astype(x0.dtype)
                out = fn(*a2)
                leaf = jax.tree_util.tree_leaves(out)[0]
                return jnp.mean(leaf).astype(jnp.float32) * 1e-12, None

            carry, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=length)
            return carry

        return chained

    short, long_ = make(1), make(n + 1)
    float(short(*args))  # compile + warm
    float(long_(*args))
    best = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(short(*args))
        t_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(long_(*args))
        t_long = time.perf_counter() - t0
        best.append((t_long - t_short) / n)
    best.sort()
    return max(best[len(best) // 2], 1e-9)
