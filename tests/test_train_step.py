"""GAN train-step tests: losses finite & decreasing structure, params
update, alternating D/G semantics, and data-parallel execution over the
8-device virtual mesh (SURVEY.md §4 implication: multi-device tests via
CPU mesh simulation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hifigan_tpu.models.generator import GeneratorConfig
from hifigan_tpu.ops.stft import MelConfig
from hifigan_tpu.parallel import make_mesh, make_sharded_train_step, shard_params_tp
from hifigan_tpu.parallel.mesh import shard_batch
from hifigan_tpu.train import TrainConfig, create_train_state, make_train_step, make_eval_step

TINY = TrainConfig(
    generator=GeneratorConfig(
        input_channels=16,
        hidden_channels=32,
        upsample_factors=(4, 2),
        resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 3),),
        lora_rank=4,
    ),
    mel=MelConfig(n_fft=32, hop_length=8, win_length=32, n_mels=16),
    warmup_steps=0,  # warmup starts at lr=0; step 1 must already update
    decay_steps=100,
    ecapa_channels=32,
    emo_hidden=32,
    emo_layers=1,
    emo_heads=4,
)


@pytest.fixture(scope="module")
def tiny_setup():
    state, vocoder, discs = create_train_state(
        jax.random.PRNGKey(0), TINY, mel_frames=16, batch_size=2
    )
    return state, vocoder, discs


def _batch(batch_size=2, n_samples=128, seed=0):
    rng = np.random.default_rng(seed)
    return {"audio": jnp.asarray(
        rng.standard_normal((batch_size, n_samples)).astype(np.float32) * 0.1
    )}


def test_train_step_runs_and_updates(tiny_setup):
    state, vocoder, discs = tiny_setup
    step = make_train_step(vocoder, discs, TINY, donate=False)
    new_state, metrics = step(state, _batch())
    for k in ("generator_loss", "discriminator_loss", "adv_loss", "fm_loss", "mel_loss"):
        assert np.isfinite(float(metrics[k])), k
    assert int(new_state.step) == 1
    # both parameter sets changed
    g0 = jax.tree_util.tree_leaves(state.gen_params)
    g1 = jax.tree_util.tree_leaves(new_state.gen_params)
    assert any(float(jnp.abs(a - b).max()) > 0 for a, b in zip(g0, g1))
    d0 = jax.tree_util.tree_leaves(state.disc_params)
    d1 = jax.tree_util.tree_leaves(new_state.disc_params)
    assert any(float(jnp.abs(a - b).max()) > 0 for a, b in zip(d0, d1))


def test_multiple_steps_stay_finite(tiny_setup):
    state, vocoder, discs = tiny_setup
    step = make_train_step(vocoder, discs, TINY, donate=False)
    for i in range(3):
        state, metrics = step(state, _batch(seed=i))
        assert np.isfinite(float(metrics["generator_loss"]))
        assert np.isfinite(float(metrics["discriminator_loss"]))


def test_multi_steps_matches_sequential(tiny_setup):
    """`multi_steps=K` (one lax.scan program per dispatch) must produce
    the same final state as K sequential single-step calls, and report
    window-mean metrics."""
    state, vocoder, discs = tiny_setup
    K = 3
    step = make_train_step(vocoder, discs, TINY, donate=False)
    multi = make_train_step(vocoder, discs, TINY, donate=False, multi_steps=K)

    batches = [_batch(seed=i) for i in range(K)]
    s_seq = state
    losses = []
    for b in batches:
        s_seq, m = step(s_seq, b)
        losses.append(float(m["generator_loss"]))

    stacked = {"audio": jnp.stack([b["audio"] for b in batches])}
    s_multi, m_multi = multi(state, stacked)

    assert int(s_multi.step) == int(s_seq.step)
    np.testing.assert_allclose(
        float(m_multi["generator_loss"]), np.mean(losses), rtol=2e-4)
    # scanned vs standalone programs fuse differently → float-rounding
    # divergence gets amplified by Adam's per-parameter normalisation on
    # near-zero leaves; the window-mean metric check above pins the
    # semantics, this bounds the drift
    for a, b in zip(jax.tree_util.tree_leaves(s_seq.gen_params),
                    jax.tree_util.tree_leaves(s_multi.gen_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-3)


def test_eval_step(tiny_setup):
    state, vocoder, discs = tiny_setup
    ev = make_eval_step(vocoder, TINY)
    out = ev(state.gen_params, _batch())
    assert out["waveform"].shape == (2, 1, 128)
    assert np.isfinite(float(out["mel_l1"]))


def test_data_parallel_train_step_matches_single_device(tiny_setup):
    """The pjit-sharded step over the 8-device mesh must produce the same
    metrics as the single-device step (same math, partitioned)."""
    state, vocoder, discs = tiny_setup
    step = make_train_step(vocoder, discs, TINY, donate=False)
    batch = _batch(batch_size=8, n_samples=128)
    _, metrics_1dev = step(state, batch)

    mesh = make_mesh(n_data=8, n_model=1)
    sharded_step = make_sharded_train_step(step, mesh)
    state_r = jax.device_put(state, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()))
    sbatch = shard_batch(batch, mesh)
    new_state, metrics_8dev = sharded_step(state_r, sbatch)
    for k in metrics_1dev:
        np.testing.assert_allclose(
            float(metrics_1dev[k]), float(metrics_8dev[k]), rtol=2e-3, atol=1e-4
        )


def test_tensor_parallel_sharding_applies():
    mesh = make_mesh(n_data=4, n_model=2)
    state, vocoder, discs = create_train_state(
        jax.random.PRNGKey(0), TINY, mel_frames=16, batch_size=2
    )
    sharded = shard_params_tp(state.gen_params, mesh)
    # at least one parameter actually got model-sharded
    def is_sharded(leaf):
        return any(
            "model" in str(s) for s in [leaf.sharding.spec]
        ) if hasattr(leaf.sharding, "spec") else False
    leaves = jax.tree_util.tree_leaves(sharded)
    assert any(is_sharded(l) for l in leaves)
    # and values are preserved
    orig = jax.tree_util.tree_leaves(state.gen_params)
    for a, b in zip(orig, leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bf16_train_step(tiny_setup):
    """Regression: the GAN step must trace and run under bfloat16
    (conv gradient transposes used to mismatch dtypes)."""
    state, vocoder, discs = create_train_state(
        jax.random.PRNGKey(0), TINY, mel_frames=16, batch_size=2,
        dtype=jnp.bfloat16,
    )
    step = make_train_step(vocoder, discs, TINY, donate=False)
    new_state, metrics = step(state, _batch())
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # remat variant also traces
    step_r = make_train_step(vocoder, discs, TINY, donate=False, remat=True)
    _, metrics_r = step_r(state, _batch())
    assert np.isfinite(float(metrics_r["generator_loss"]))


def test_checkpoint_duplicate_save_is_noop(tmp_path):
    """Saving the same step twice (end-of-chunk + end-of-run force saves)
    must be a no-op, not an orbax StepAlreadyExistsError.  Uses its own
    state: fixture buffers may have been donated by sharded-step tests."""
    from hifigan_tpu.train.checkpoint import CheckpointManager

    state, _, _ = create_train_state(
        jax.random.PRNGKey(3), TINY, mel_frames=16, batch_size=2
    )
    mgr = CheckpointManager(str(tmp_path))
    assert mgr.save(state, force=True)
    mgr.wait()
    assert mgr.save(state, force=True) is False  # duplicate tolerated
    assert mgr.latest_step() == int(state.step)
    mgr.close()
