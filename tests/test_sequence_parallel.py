"""Sequence parallelism (SURVEY §5.7): time-sharded chunked-Conformer
forward over the virtual mesh must match the unsharded forward exactly
(all-gathered K/V + global-position block-causal mask + ppermute conv
halo)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from hifigan_tpu.models.conformer import ChunkedConformer
from hifigan_tpu.parallel.sequence import conformer_forward_seq_sharded


@pytest.mark.parametrize("n_shards", [4, 8])
def test_seq_sharded_conformer_matches_unsharded(rng, n_shards):
    model = ChunkedConformer(
        input_dim=16, hidden_dim=32, num_layers=2, num_heads=4, chunk_size=8,
    )
    B, T = 2, 64
    mel = jnp.asarray(rng.standard_normal((B, T, 16)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), mel)
    ref = model.apply(params, mel, chunked=True)

    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("data",))
    out = conformer_forward_seq_sharded(
        params, mel, mesh,
        num_layers=2, num_heads=4, chunk_size=8,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_seq_sharded_rejects_ragged_time(rng):
    model = ChunkedConformer(input_dim=16, hidden_dim=32, num_layers=1,
                             num_heads=4, chunk_size=8)
    mel = jnp.zeros((1, 30, 16))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 16)))
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    with pytest.raises(ValueError, match="not divisible"):
        conformer_forward_seq_sharded(params, mel, mesh,
                                      num_layers=1, num_heads=4, chunk_size=8)
