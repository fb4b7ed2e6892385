"""Model introspection.

Capability parity with the reference's ``get_model_info`` methods
(``/root/reference/hifigan_modified/conditioned_hifigan.py:183-194`` and
the app model wrappers): parameter counts, memory footprint, config.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np


def model_info(params: Any, config: Optional[Any] = None) -> dict:
    """Parameter count / byte size / per-top-level-module breakdown."""
    leaves = jax.tree_util.tree_leaves(params)
    n_params = int(sum(np.prod(l.shape) for l in leaves))
    n_bytes = int(sum(np.prod(l.shape) * l.dtype.itemsize for l in leaves))
    breakdown = {}
    flat = jax.tree_util.tree_leaves_with_path(params)
    for path, leaf in flat:
        keys = [getattr(k, "key", getattr(k, "idx", str(k))) for k in path]
        top = next((str(k) for k in keys if str(k) != "params"), "root")
        breakdown[top] = breakdown.get(top, 0) + int(np.prod(leaf.shape))
    info = {
        "total_parameters": n_params,
        "parameter_bytes": n_bytes,
        "parameter_mb": round(n_bytes / 1e6, 2),
        "per_module_parameters": dict(sorted(breakdown.items())),
    }
    if config is not None:
        info["config"] = str(config)
    return info
