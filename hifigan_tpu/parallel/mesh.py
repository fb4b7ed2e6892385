"""Mesh construction and sharding rules.

Strategy (SURVEY.md §5.8): the vocoder is ~10M parameters, so the
dominant axis is **data parallelism** — batch sharded over the ``data``
axis, parameters replicated, gradient all-reduce riding ICI via XLA's
automatic collectives.  An optional ``model`` axis provides tensor
parallelism for the wide generator layers: ODConv kernel banks and the
hidden-channel dimensions of dense/conv kernels are sharded on their
output-channel axis, which makes XLA partition the big per-sample
einsums and insert all-gathers/reduce-scatters where layers change
sharding.

On a single chip everything degenerates to no-ops; the same code runs
1-chip, 8-chip, or multi-slice (add a ``dcn`` outer axis) unchanged.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a ``(data, model)`` mesh.  Defaults: all devices on ``data``."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"mesh {n_data}x{n_model} != {len(devices)} devices"
    )
    dev_array = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(dev_array, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the ``data`` axis."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _tp_spec_for(path: tuple, leaf: jax.Array, model_axis: int) -> P:
    """Tensor-parallel PartitionSpec for one parameter.

    Rules (applied only when the dim is divisible by the model-axis size):
    - ODConv kernel banks ``[K, Cin, Cout, k]`` / ``[K, k, Cin, Cout]``:
      shard Cout;
    - **attention** (Megatron layout): q/k/v DenseGeneral kernels
      ``[D, H, hd]`` shard the head axis (column-parallel); the ``out``
      projection ``[H, hd, D]`` shards its head axis (row-parallel, so
      XLA inserts one psum per attention block);
    - **FFN / Conformer pointwise**: the expanding matmul
      (``ffn1``/``pw1``) is column-parallel on its output, the
      contracting one (``ffn2``/``pw2``) row-parallel on its input —
      one psum per FFN, no activation all-gather in between;
    - conv kernels ``[k, Cin, Cout]`` and dense kernels ``[Cin, Cout]``:
      shard Cout (the last axis);
    - biases/scales stay replicated (cheap).
    """
    name = str(path[-1]) if path else ""
    parent = str(path[-2]) if len(path) >= 2 else ""
    shape = leaf.shape

    def ok(dim: int) -> bool:
        return shape[dim] % model_axis == 0 and shape[dim] >= 2 * model_axis

    if name == "kernel":
        # attention projections (MultiHeadAttention submodule names)
        if parent in ("q", "k", "v") and leaf.ndim == 3 and ok(1):
            return P(None, "model", None)       # [D, H, hd] — column
        if parent == "out" and leaf.ndim == 3 and ok(0):
            return P("model", None, None)       # [H, hd, D] — row (psum)
        # FFN pairs (transformer + conformer pointwise convs)
        if parent in ("ffn1", "pw1") and leaf.ndim == 2 and ok(1):
            return P(None, "model")             # column
        if parent in ("ffn2", "pw2") and leaf.ndim == 2 and ok(0):
            return P("model", None)             # row (psum)
    if leaf.ndim >= 2 and shape[-1] % model_axis == 0 and shape[-1] >= 2 * model_axis:
        if "kernels" in name:  # ODConv bank: [K, Cin, Cout, k] -> shard Cout (axis -2)
            if leaf.ndim == 4 and shape[-2] % model_axis == 0 and shape[-2] >= 2 * model_axis:
                return P(*([None] * (leaf.ndim - 2) + ["model", None]))
            return P(*([None] * (leaf.ndim - 1) + ["model"]))
        if "kernel" in name or name in ("embedding",):
            return P(*([None] * (leaf.ndim - 1) + ["model"]))
    return P()


def shard_params_tp(params: Any, mesh: Mesh) -> Any:
    """Apply tensor-parallel shardings to a parameter pytree (replicated
    when the ``model`` axis has size 1)."""
    model_axis = mesh.shape["model"]

    def place(path, leaf):
        spec = _tp_spec_for(path, leaf, model_axis) if model_axis > 1 else P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(
        lambda p, l: place(tuple(getattr(k, "key", getattr(k, "idx", k)) for k in p), l),
        params,
    )


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def make_sharded_train_step(train_step, mesh: Mesh):
    """Wrap an (already jitted or pure) train step with mesh-aware
    in/out shardings: state replicated/TP-sharded, batch data-sharded.

    Under ``jit`` XLA partitions the whole step: per-device batch shards
    flow through the model, gradient all-reduce is inserted
    automatically at the replicated parameter update."""
    fn = train_step.__wrapped__ if hasattr(train_step, "__wrapped__") else train_step
    return jax.jit(
        fn,
        in_shardings=(None, batch_sharding(mesh)),
        out_shardings=None,
        donate_argnums=(0,),
    )
