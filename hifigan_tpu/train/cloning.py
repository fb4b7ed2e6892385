"""Voice-cloning training: make the FiLM conditioning *necessary*.

The reference's thesis claim is expressive voice cloning via FiLM
speaker/emotion conditioning (``/root/reference/hifigan_modified/
generator.py:174-199, 263-303``), but it only ever trains/evaluates
copy-synthesis — where the input mel already determines the output, so
the conditioning pathway is redundant and nothing shows it *does*
anything.  This module trains the same vocoder on a task where the
speaker embedding is load-bearing:

    input   = mel of (content c, speaker A)
    ref     = clip of speaker B (matched arousal)
    target  = waveform of (content c, speaker B)

The formant corpus renders *parallel* utterances (same phone plan,
prosody and timing; different vocal identity — see
:class:`~hifigan_tpu.train.corpus.FormantSpeechCorpus` ``content=``), so
the pair is time-aligned sample-for-sample and the generator can only
match the target by taking vocal identity from the FiLM pathway.
A=B pairs occur naturally (1/n_speakers), covering plain copy-synthesis.

TPU shape: both banks (content renditions ``[S, C, L]`` and
arousal-matched reference clips ``[S, C, L]``) live in HBM; pair
sampling, cropping and mel extraction all happen inside the jitted GAN
step (host traffic per call: one PRNG key) — the
:mod:`hifigan_tpu.train.device_data` pattern.

The parameter tree is identical to the copy-synthesis flagship
(``reference_mel`` only reroutes the extractor input), so training
warm-starts from ``runs/flagship`` and the pretrained discriminative
encoders (:mod:`hifigan_tpu.train.encoder_pretrain`) graft straight in.
"""

from __future__ import annotations

import logging
import os
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hifigan_tpu.models.discriminators import Discriminators
from hifigan_tpu.models.vocoder import ModifiedVocoder
from hifigan_tpu.train.corpus import FormantSpeechCorpus
from hifigan_tpu.train.losses import (
    discriminator_loss,
    feature_matching_loss,
    generator_adversarial_loss,
    mel_l1_loss,
)
from hifigan_tpu.train.state import GanTrainState, TrainConfig, make_optimizer
from hifigan_tpu.train.train_step import audio_to_mel

Array = jax.Array
log = logging.getLogger(__name__)

# content keys disjoint from every legacy draw (legacy keys are
# speaker*1_000_003 + idx with small idx; eval clips use 10_000+)
CONTENT_KEY_BASE = 50_000_000
REF_KEY_BASE = 60_000_000


def _corpus_rev() -> int:
    """A stable fingerprint of the corpus renderer: hash of the corpus
    module source.  Any change to the renderer invalidates cached
    banks."""
    import hashlib
    import inspect

    from hifigan_tpu.train import corpus as _corpus_mod

    src = inspect.getsource(_corpus_mod).encode()
    return int.from_bytes(hashlib.sha256(src).digest()[:6], "big")


def build_cloning_banks(
    *,
    n_speakers: int = 32,
    n_contents: int = 32,
    pad_to_multiple: int = 128,
    cache_path: Optional[str] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Render the parallel corpus.  Returns ``(content_bank [S, C, L],
    ref_bank [S, C, L_ref], lengths [C])`` — lengths are per-content
    (identical across speakers by construction).  ``ref_bank[s, c]`` is
    an *other-content* clip of speaker ``s`` rendered at content ``c``'s
    arousal, so the emotion embedding matches the target."""
    # cache key: corpus rev + key bases + grid, so a stale cache from a
    # different corpus version or content-key base cannot silently train
    # on wrong pairs (ADVICE r3)
    cache_key = np.array([_corpus_rev(), CONTENT_KEY_BASE, REF_KEY_BASE,
                          n_speakers, n_contents, pad_to_multiple],
                         np.int64)
    if cache_path and os.path.exists(cache_path):
        z = np.load(cache_path)
        if "cache_key" in z and np.array_equal(z["cache_key"], cache_key):
            return z["content_bank"], z["ref_bank"], z["lengths"]
        log.warning("cloning bank cache %s is stale (key mismatch) — "
                    "re-rendering", cache_path)
    corpus = FormantSpeechCorpus(n_speakers=n_speakers)
    contents = [CONTENT_KEY_BASE + j for j in range(n_contents)]
    utts: list[list[np.ndarray]] = []
    refs: list[list[np.ndarray]] = []
    for s in range(n_speakers):
        row, ref_row = [], []
        for j, ck in enumerate(contents):
            row.append(corpus.utterance(s, 0, content=ck))
            ar = corpus.content_arousal(ck)
            ref_row.append(corpus.utterance(
                s, 0, content=REF_KEY_BASE + (j * 7 + s) % (4 * n_contents),
                arousal=ar))
        utts.append(row)
        refs.append(ref_row)

    def pack(rows):
        L = max(len(u) for row in rows for u in row)
        L = -(-L // pad_to_multiple) * pad_to_multiple
        bank = np.zeros((len(rows), len(rows[0]), L), np.float32)
        for s, row in enumerate(rows):
            for c, u in enumerate(row):
                bank[s, c, : len(u)] = u
        return bank

    content_bank = pack(utts)
    ref_bank = pack(refs)
    lengths = np.array([len(utts[0][c]) for c in range(n_contents)], np.int32)
    if cache_path:
        os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
        np.savez(cache_path, content_bank=content_bank, ref_bank=ref_bank,
                 lengths=lengths, cache_key=cache_key)
    return content_bank, ref_bank, lengths


def make_pair_sampler(
    lengths: Array,        # [C] true per-content lengths
    segment_samples: int,
    ref_samples: int,
    batch_size: int,
) -> Callable[[Array, Array, Array], dict]:
    """``sample(key, content_bank, ref_bank) -> {input, target, ref}`` —
    input/target are the SAME (content, offset) crop rendered by
    speakers A and B; ref is a random crop of B's arousal-matched
    reference clip.

    The banks are *arguments*, not closure constants: closing over
    ~600 MB of device arrays embeds them in the lowered HLO, which the
    relay's remote-compile endpoint rejects (HTTP 413 — observed on this
    rig).  As arguments they are ordinary buffer parameters."""
    seg, rseg = segment_samples, ref_samples

    def sample(key: Array, content_bank: Array, ref_bank: Array) -> dict:
        S, C = content_bank.shape[0], content_bank.shape[1]
        ks = jax.random.split(key, 5)
        c = jax.random.randint(ks[0], (batch_size,), 0, C)
        a = jax.random.randint(ks[1], (batch_size,), 0, S)
        b = jax.random.randint(ks[2], (batch_size,), 0, S)
        span = jnp.maximum(lengths[c] - seg, 1)
        off = (jax.random.uniform(ks[3], (batch_size,)) * span).astype(jnp.int32)
        rspan = jnp.maximum(lengths[c] * 0 + ref_bank.shape[-1] - rseg, 1)
        roff = (jax.random.uniform(ks[4], (batch_size,)) * rspan).astype(jnp.int32)

        def crop(bank, s_i, c_i, o, n):
            return jax.lax.dynamic_slice(bank[s_i, c_i], (o,), (n,))

        inp = jax.vmap(lambda s_i, c_i, o: crop(content_bank, s_i, c_i, o, seg))(a, c, off)
        tgt = jax.vmap(lambda s_i, c_i, o: crop(content_bank, s_i, c_i, o, seg))(b, c, off)
        ref = jax.vmap(lambda s_i, c_i, o: crop(ref_bank, s_i, c_i, o, rseg))(b, c, roff)
        return {"input": inp, "target": tgt, "ref": ref, "tgt_spk": b}

    return sample


def make_cloning_train_step(
    vocoder: ModifiedVocoder,
    discs: Discriminators,
    cfg: TrainConfig,
    sample_fn: Callable[[Array, Array, Array], dict],
    *,
    deep_feature_matching: bool = True,
    multi_steps: int = 1,
    identity_fn: Optional[Callable[[Array], Array]] = None,
    identity_weight: float = 0.0,
    identity_centroids: Optional[Array] = None,
    identity_margin: float = 0.8,
    identity_finetune: bool = False,
) -> Callable[..., Tuple[GanTrainState, dict]]:
    """The jitted cloning GAN step.  Same loss family as the
    copy-synthesis step (:mod:`hifigan_tpu.train.train_step` — LSGAN /
    hinge + FM + mel per ``/root/reference/hifigan_modified/
    complete_vocoder.py:89-184``), but the generator is conditioned on a
    *reference-clip* embedding and reconstructs the *target speaker's*
    rendition, so gradients teach the FiLM pathway to carry identity."""
    tx = make_optimizer(cfg)
    w = cfg.loss_weights

    def _is_conditioning(path) -> bool:
        keys = "/".join(str(getattr(p, "key", p)) for p in path)
        return "embedding_extractor" in keys or "film_" in keys

    def _mask_to_conditioning(grads):
        return jax.tree_util.tree_map_with_path(
            lambda p, g: g if _is_conditioning(p) else jnp.zeros_like(g),
            grads)

    def _restore_frozen(new_params, old_params):
        return jax.tree_util.tree_map_with_path(
            lambda p, n, o: n if _is_conditioning(p) else o,
            new_params, old_params)

    def step(state: GanTrainState, key: Array, content_bank: Array,
             ref_bank: Array):
        batch = sample_fn(key, content_bank, ref_bank)
        content_mel = audio_to_mel(batch["input"], cfg)
        ref_mel = audio_to_mel(batch["ref"], cfg)
        real = batch["target"][:, : content_mel.shape[-1] * cfg.mel.hop_length]
        target_mel = audio_to_mel(real, cfg)

        def generate(gen_params):
            out = vocoder.apply(gen_params, content_mel, reference_mel=ref_mel)
            return out["waveform"][:, 0, :]

        fake = generate(state.gen_params)
        fake_sg = jax.lax.stop_gradient(fake)

        def d_loss_fn(disc_params):
            out_real = discs.apply(disc_params, real)
            out_fake = discs.apply(disc_params, fake_sg)
            return discriminator_loss(
                out_real["mpd_outputs"] + out_real["msd_outputs"],
                out_fake["mpd_outputs"] + out_fake["msd_outputs"],
                w.adversarial_type,
            )

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(state.disc_params)
        d_updates, d_opt_state = tx.update(d_grads, state.disc_opt_state,
                                           state.disc_params)
        disc_params = optax.apply_updates(state.disc_params, d_updates)

        def g_loss_fn(gen_params):
            fake_g = generate(gen_params)
            out_real = discs.apply(disc_params, real)
            out_fake = discs.apply(disc_params, fake_g)
            adv = generator_adversarial_loss(
                out_fake["mpd_outputs"] + out_fake["msd_outputs"],
                w.adversarial_type,
            )
            if deep_feature_matching:
                fm = feature_matching_loss(
                    out_real["mpd_features"] + out_real["msd_features"],
                    out_fake["mpd_features"] + out_fake["msd_features"],
                )
            else:
                fm = feature_matching_loss(
                    out_real["mpd_outputs"] + out_real["msd_outputs"],
                    out_fake["mpd_outputs"] + out_fake["msd_outputs"],
                )
            gen_mel = audio_to_mel(fake_g, cfg)
            mel_loss = mel_l1_loss(gen_mel, target_mel)
            total = w.adversarial * adv + w.feature_matching * fm + w.mel * mel_loss
            aux = {"adv_loss": adv, "fm_loss": fm, "mel_loss": mel_loss}
            if w.multi_res_stft > 0:
                from hifigan_tpu.ops.stft import multi_resolution_stft_loss

                stft_loss = multi_resolution_stft_loss(fake_g, real)
                total = total + w.multi_res_stft * stft_loss
                aux["stft_loss"] = stft_loss
            if identity_fn is not None and identity_weight > 0:
                # identity (speaker-similarity) term: cosine of a FROZEN
                # trained judge encoder's embedding — pushes output
                # cosine past the reference's 0.7 verification bar
                # (/root/reference/speaker_embedding/ecapa_tdnn.py:212-225)
                # that reconstruction losses alone leave at ~0.63
                e_fake = identity_fn(gen_mel)
                if identity_centroids is not None:
                    # centroid-hinge form (round 5): verification scores
                    # the clone against the target speaker's CENTROID,
                    # not the parallel rendition, and the round-4
                    # rendition-cosine (1 − cos) stayed flat for 40k
                    # steps.  Hinge at the margin focuses gradient on
                    # pairs still failing verification and goes silent
                    # on pairs already past it.
                    e_n = e_fake / jnp.maximum(
                        jnp.linalg.norm(e_fake, axis=-1, keepdims=True),
                        1e-8)
                    cos = (e_n * identity_centroids[batch["tgt_spk"]]).sum(-1)
                    id_loss = (jax.nn.relu(identity_margin - cos) ** 2).mean()
                else:
                    e_tgt = jax.lax.stop_gradient(identity_fn(target_mel))
                    cos = (e_fake * e_tgt).sum(-1) / jnp.maximum(
                        jnp.linalg.norm(e_fake, axis=-1)
                        * jnp.linalg.norm(e_tgt, axis=-1), 1e-8)
                    id_loss = (1.0 - cos).mean()
                total = total + identity_weight * id_loss
                aux["identity_loss"] = id_loss
                aux["identity_cos"] = cos.mean()
            return total, aux

        (g_loss, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.gen_params)
        if identity_finetune:
            # conditioning-only fine-tune: the identity objective may
            # only move the speaker pathway (embedding extractor + FiLM);
            # the synthesis trunk is frozen so fidelity cannot be
            # destroyed (round 4's full-model identity continuation
            # silently dropped eval verification 0.50 -> 0.00 — see
            # docs/ROUND_NOTES.md round-5 notes).  Grads are zeroed AND
            # frozen params restored post-update (belt and braces: adamw
            # weight decay would otherwise still shrink frozen params).
            g_grads = _mask_to_conditioning(g_grads)
        g_updates, g_opt_state = tx.update(g_grads, state.gen_opt_state,
                                           state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, g_updates)
        if identity_finetune:
            gen_params = _restore_frozen(gen_params, state.gen_params)

        new_state = state.replace(
            step=state.step + 1,
            gen_params=gen_params,
            disc_params=disc_params,
            gen_opt_state=g_opt_state,
            disc_opt_state=d_opt_state,
        )
        return new_state, {"generator_loss": g_loss,
                           "discriminator_loss": d_loss, **aux}

    if multi_steps > 1:

        def multi(state, keys, content_bank, ref_bank):
            state, ms = jax.lax.scan(
                lambda s, k: step(s, k, content_bank, ref_bank),
                state, keys, length=multi_steps)
            return state, jax.tree_util.tree_map(jnp.mean, ms)

        return jax.jit(multi, donate_argnums=(0,))

    return jax.jit(step, donate_argnums=(0,))
