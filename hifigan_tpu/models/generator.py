"""Modified HiFi-GAN generator — ODConv + GRC-LoRA + FiLM, TPU-native.

Capability parity with
``/root/reference/hifigan_modified/generator.py:201-303``:

    mel [B, 80, T] + speaker [B, 192] + emotion [B, 256]
      → input conv (80→512, k=7) → FiLM
      → 4 ODConv upsample stages (factors 8·8·2·2, kernel 2f, stride f,
        channels halving 512→256→128→64→32), LeakyReLU(0.1) + FiLM each
      → 3 MRF stacks of GRC-LoRA blocks (k ∈ {3,7,11} × dilations {1,3,5})
        with residual + FiLM
      → output conv (→1, k=7) → tanh → wav [B, 1, 256·T]

Deliberate deviations from the reference, per SURVEY.md §7 ("implement
the stated architecture, record deviations"):

* **Upsampling actually upsamples.** The reference's generator calls its
  ODConv with ``stride=f`` through ``F.conv1d`` (``generator.py:92-94``),
  which *downsamples*; its own ``ODConvTranspose1d``
  (``odconv.py:110-205``) shows the stated intent.  We use the dynamic
  *transposed* conv so 80-mel frames → 256× audio samples.
* **All four ODConv attentions are applied** (the reference's
  ``odconv.py`` forward computes but drops spatial/channel attention).
* **FiLM conditions on concat(spk, emo)** (the reference's generator
  FiLM adds a 192-d and a 256-d vector, which cannot broadcast; its
  ``grc_lora.py`` FiLM variant concatenates — we follow the latter).
* **LoRA ``B`` initialises to zero** (stated LoRA design) instead of
  ``randn``.

All compute runs channels-last ``[B, T, C]`` with static shapes; the
dynamic convs lower to batched einsums on the MXU
(:mod:`hifigan_tpu.ops.conv`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from hifigan_tpu.ops import conv as conv_ops
from hifigan_tpu.ops import fold as fold_ops
from hifigan_tpu.ops import grc_lora as lora_ops
from hifigan_tpu.ops import odconv as od_ops
from hifigan_tpu.ops.film import film

Array = jax.Array


@dataclass(frozen=True)
class GeneratorConfig:
    """Hyper-parameters (defaults = reference ``generator.py:204-208``)."""

    input_channels: int = 80
    hidden_channels: int = 512
    kernel_size: int = 7
    upsample_factors: Tuple[int, ...] = (8, 8, 2, 2)
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    speaker_dim: int = 192
    emotion_dim: int = 256
    odconv_k: int = 4
    lora_rank: int = 8
    grc_groups: int = 4
    leaky_slope: float = 0.1
    mrf_backend: str = "auto"  # "auto" | "xla" | "pallas" | "pallas2" (tap-concat)

    @property
    def cond_dim(self) -> int:
        return self.speaker_dim + self.emotion_dim

    @property
    def upsample_ratio(self) -> int:
        r = 1
        for f in self.upsample_factors:
            r *= f
        return r


class FiLM(nn.Module):
    """Concat-conditioning FiLM: ``concat(spk, emo) → Linear → (γ, β)``.

    Mirrors ``/root/reference/hifigan_modified/grc_lora.py:70-129`` (the
    working FiLM variant).  γ is produced as ``1 + δ`` so an untrained
    layer starts as identity.
    """

    features: int
    fold: int = 1  # x may be time-folded [B, T/F, F*features]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, cond: Array) -> Array:
        gb = nn.Dense(
            2 * self.features,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.normal(0.01),
            name="proj",
        )(cond.astype(jnp.float32))
        gamma, beta = jnp.split(gb, 2, axis=-1)
        if self.fold > 1:
            gamma = jnp.tile(gamma, (1, self.fold))
            beta = jnp.tile(beta, (1, self.fold))
        return film(x, 1.0 + gamma, beta)


class _ODAttentionHeads(nn.Module):
    """The four ODConv attention heads over the time-pooled input.

    ``AdaptiveAvgPool1d(1) → Conv1d(C, ·, 1) → softmax/sigmoid`` from the
    reference (``odconv.py:40-63``) is exactly mean-pool → Linear."""

    in_features: int
    out_features: int
    kernel_taps: int
    num_kernels: int

    @nn.compact
    def __call__(self, x: Array) -> od_ops.ODAttention:
        pooled = jnp.mean(x.astype(jnp.float32), axis=1)  # [B, Cin]
        dense = lambda n, name: nn.Dense(
            n, dtype=jnp.float32, param_dtype=jnp.float32,
            kernel_init=nn.initializers.normal(0.02), name=name,
        )
        return od_ops.ODAttention(
            kernel=jax.nn.softmax(dense(self.num_kernels, "kernel_head")(pooled), axis=-1),
            spatial=jax.nn.softmax(dense(self.kernel_taps, "spatial_head")(pooled), axis=-1),
            in_channel=jax.nn.sigmoid(dense(self.in_features, "in_ch_head")(pooled)),
            out_channel=jax.nn.sigmoid(dense(self.out_features, "out_ch_head")(pooled)),
        )


class ODConvTranspose1d(nn.Module):
    """Omni-dimensional dynamic *transposed* conv — the upsampler.

    Per-sample filters: ``W_b = (Σ_k a_bk W_k)``; spatial attention folds
    into the taps, in-/out-channel attention into input/output activations
    (rank-1 separability — see :mod:`hifigan_tpu.ops.odconv`)."""

    in_features: int
    out_features: int
    kernel_size: int
    stride: int
    padding: int = 0
    num_kernels: int = 4
    fold_in: int = 1  # input is time-folded [B, U, fold_in*Cin]
    unfold_output: bool = True  # False: return folded [B, U, fold_in*stride*Cout]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        F = self.fold_in
        if F > 1:
            # pool per true channel: mean over blocks and fold phases
            pooled_x = jnp.mean(
                x.astype(jnp.float32).reshape(x.shape[0], -1, F, self.in_features),
                axis=(1, 2),
            )[:, None, :]  # [B, 1, Cin] (attention heads re-pool over axis 1)
        else:
            pooled_x = x
        attn = _ODAttentionHeads(
            self.in_features, self.out_features, self.kernel_size, self.num_kernels,
            name="attention",
        )(pooled_x)
        kernels = self.param(
            "kernels",
            nn.initializers.normal(0.01),
            (self.num_kernels, self.in_features, self.out_features, self.kernel_size),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.num_kernels, self.out_features), jnp.float32
        )
        b = od_ops.mix_bias(bias, attn.kernel)
        exact = self.kernel_size == 2 * self.padding + self.stride
        if exact:
            # folded path (fold_in == 1 included): output stays time-folded
            # [B, U, fold_in*stride*Cout] — lanes never shrink below 128.
            # The polyphase transform is applied to the K *static* banks
            # (no batch dim), then the per-sample kernel mix and the
            # spatial (tap) attention happen directly in polyphase space —
            # this avoids materialising + transposing a per-batch
            # [B, Cin, Cout, k] kernel tensor every call.
            wp_banks, deltas = conv_ops.folded_polyphase_kernel(
                kernels.astype(self.dtype), self.stride, self.padding, F
            )  # [K, |D|*F*Cin, F*f*Cout]
            w_poly = jnp.einsum(
                "bk,kpq->bpq", attn.kernel.astype(self.dtype), wp_banks,
                preferred_element_type=jnp.float32,
            ).astype(self.dtype)
            tap, valid, _ = conv_ops.folded_tap_map(
                self.kernel_size, self.stride, self.padding, F
            )
            sp = attn.spatial.astype(self.dtype)[:, jnp.asarray(tap)]  # [B, DQ, CR]
            sp = sp * jnp.asarray(valid, dtype=self.dtype)
            Bn, P, Q = w_poly.shape
            dq, cr = tap.shape
            w_poly = (
                w_poly.reshape(Bn, dq, self.in_features, cr, self.out_features)
                * sp[:, :, None, :, None]
            ).reshape(Bn, P, Q)
            ic = jnp.tile(attn.in_channel, (1, F)) if F > 1 else attn.in_channel
            x = (x * ic[:, None, :]).astype(self.dtype)
            y = conv_ops.folded_polyphase_apply(
                x, w_poly, deltas, b, stride=self.stride, fold_in=F
            )
            oc = jnp.tile(attn.out_channel, (1, F * self.stride))
            y = (y * oc[:, None, :]).astype(self.dtype)
            if self.unfold_output:
                B, U = y.shape[0], y.shape[1]
                y = y.reshape(B, U * F * self.stride, self.out_features)
            return y
        assert F == 1, "folded input requires exact-length upsampling"
        w = od_ops.mix_kernels(kernels, attn.kernel, self.dtype)  # [B, Cin, Cout, k]
        w = w * attn.spatial[:, None, None, :].astype(self.dtype)
        x = (x * attn.in_channel[:, None, :]).astype(self.dtype)
        y = conv_ops.dynamic_conv_transpose1d(
            x, w.astype(self.dtype), b, stride=self.stride, padding=self.padding
        )
        return (y * attn.out_channel[:, None, :]).astype(self.dtype)


class ODConv1d(nn.Module):
    """Omni-dimensional dynamic forward conv (reference ``odconv.py:5-108``)."""

    in_features: int
    out_features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    num_kernels: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        attn = _ODAttentionHeads(
            self.in_features, self.out_features, self.kernel_size, self.num_kernels,
            name="attention",
        )(x)
        kernels = self.param(
            "kernels",
            nn.initializers.normal(0.01),
            (self.num_kernels, self.kernel_size, self.in_features, self.out_features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.num_kernels, self.out_features), jnp.float32
        )
        w = od_ops.mix_kernels(kernels, attn.kernel, self.dtype)  # [B, k, Cin, Cout]
        w = w * attn.spatial[:, :, None, None].astype(self.dtype)
        b = od_ops.mix_bias(bias, attn.kernel)
        x = (x * attn.in_channel[:, None, :]).astype(self.dtype)
        y = conv_ops.dynamic_conv1d(
            x, w.astype(self.dtype), b,
            stride=self.stride, padding=self.padding, dilation=self.dilation,
        )
        return (y * attn.out_channel[:, None, :]).astype(self.dtype)


class GRCLoRABlock(nn.Module):
    """Grouped residual conv + shared low-rank path
    (reference ``generator.py:109-172``): grouped dilated conv ⊕
    α·LoRA(x) → 1×1 mixer → (+residual) → GroupNorm → LeakyReLU.

    TPU layout: with ``fold = F > 1`` the block consumes *time-folded*
    activations ``[B, T/F, F·C]`` (see :mod:`hifigan_tpu.ops.fold`) so
    the audio-rate layers run at full 128-lane width; parameters are
    identical in either mode (the fold transforms are applied to the
    kernels at trace time), so ``fold`` is a pure execution-layout
    choice."""

    channels: int
    kernel_size: int = 3
    dilation: int = 1
    groups: int = 4
    lora_rank: int = 8
    leaky_slope: float = 0.1
    fold: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, return_fused: bool = False):
        c, g, F = self.channels, self.groups, self.fold
        x = x.astype(self.dtype)
        residual = x
        w = self.param(
            "grouped_kernel", nn.initializers.normal(0.01),
            (self.kernel_size, c // g, c), jnp.float32,
        )
        wb = self.param("grouped_bias", nn.initializers.zeros, (c,), jnp.float32)
        pad = (self.kernel_size - 1) * self.dilation // 2
        # grouped conv as a dense block-diagonal kernel (the grouped-conv
        # HLO with C=32 tiles at ~3% of roofline)
        w_dense = lora_ops.blockdiag_conv_kernel(w, g)
        lora_a = self.param(
            "lora_A", nn.initializers.normal(0.02), (self.lora_rank, c // g), jnp.float32
        )
        lora_b = self.param("lora_B", nn.initializers.zeros, (c // g, self.lora_rank), jnp.float32)
        alpha = self.param("lora_alpha", nn.initializers.ones, (1,), jnp.float32)
        w_lora = lora_ops.lora_block_matrix(lora_a, lora_b, g)  # [C, C]
        wm = self.param("mixer_kernel", nn.initializers.normal(0.01), (1, c, c), jnp.float32)
        bm = self.param("mixer_bias", nn.initializers.zeros, (c,), jnp.float32)
        gamma = self.param("norm_gamma", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("norm_beta", nn.initializers.zeros, (c,), jnp.float32)

        # Algebraic fusion (matmul-chain reassociation XLA does not do):
        #   mixed = (conv_W(x) + wb + α·lora(x)) @ Wmix + bm
        #         = conv_{W·Wmix}(x)  +  x @ (α·Wlora·Wmix)  +  (wb·Wmix + bm)
        # and the α·Wlora·Wmix term merges into the zero-shift conv tap,
        # so the whole pre-norm block is ONE conv + constant bias.
        if F > 1:
            wf, lo, hi = fold_ops.fold_conv_kernel(
                w_dense, F, padding=pad, dilation=self.dilation
            )
            wm_f = fold_ops.fold_blockdiag(wm[0], F).astype(jnp.float32)
            w2 = jnp.einsum("kab,bc->kac", wf.astype(jnp.float32), wm_f)
            w_lora_f = fold_ops.fold_blockdiag(w_lora, F).astype(jnp.float32)
            w2 = w2.at[lo].add(alpha[0] * (w_lora_f @ wm_f))
            bias_const = (fold_ops.fold_channel_vector(wb, F) @ wm_f
                          + fold_ops.fold_channel_vector(bm, F))
            if return_fused:
                # components for the fused Pallas chain (ops/pallas)
                return {
                    "w2": w2.astype(self.dtype),
                    "bias": bias_const.astype(jnp.float32),
                    "lo": lo,
                    "gamma": gamma,
                    "beta": beta,
                }
            mixed = conv_ops.conv1d(
                x, w2.astype(self.dtype), bias_const, padding=(lo, hi)
            )
            y = fold_ops.folded_group_norm(mixed + residual, gamma, beta, g, c, F)
        else:
            wm0 = wm[0].astype(jnp.float32)
            w2 = jnp.einsum("kab,bc->kac", w_dense.astype(jnp.float32), wm0)
            # zero-shift tap of a (k, dilation) conv with symmetric padding
            mid = self.kernel_size // 2
            w2 = w2.at[mid].add(alpha[0] * (w_lora.astype(jnp.float32) @ wm0))
            bias_const = wb @ wm0 + bm
            mixed = conv_ops.conv1d_via_matmul(
                x, w2.astype(self.dtype), bias_const,
                padding=pad, dilation=self.dilation,
            )
            y = lora_ops.group_norm(mixed + residual, gamma, beta, g)
        return conv_ops.leaky_relu(y, self.leaky_slope)


class Generator(nn.Module):
    """The modified HiFi-GAN generator (flagship model).

    ``__call__(mel [B, n_mels, T], spk [B, 192], emo [B, 256])
    → wav [B, 1, T * 256]`` (reference API,
    ``generator.py:263-303``)."""

    config: GeneratorConfig = GeneratorConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: Array, speaker_emb: Array, emotion_emb: Array) -> Array:
        cfg = self.config
        cond = jnp.concatenate(
            [speaker_emb.astype(jnp.float32), emotion_emb.astype(jnp.float32)], axis=-1
        )
        x = jnp.transpose(mel, (0, 2, 1)).astype(self.dtype)  # [B, T, n_mels]

        w_in = self.param(
            "input_kernel", nn.initializers.normal(0.01),
            (cfg.kernel_size, cfg.input_channels, cfg.hidden_channels), jnp.float32,
        )
        b_in = self.param("input_bias", nn.initializers.zeros, (cfg.hidden_channels,), jnp.float32)
        x = conv_ops.conv1d(x, w_in.astype(self.dtype), b_in, padding=(cfg.kernel_size - 1) // 2)
        x = FiLM(cfg.hidden_channels, dtype=self.dtype, name="film_0")(x, cond)

        # --- upsampling runs time-folded end-to-end: the polyphase
        # transposed conv naturally emits fold_in*f packed steps per
        # block; we renormalise the fold after each stage so the lane
        # dimension stays >= 128 true channels (ops/fold.py — unfolded
        # small-channel layouts run at <10% HBM efficiency) ---
        ch = cfg.hidden_channels
        fold = 1
        for i, f in enumerate(cfg.upsample_factors):
            out_ch = ch // 2
            exact = (2 * f == 2 * (f // 2) + f)  # k = 2p + f, i.e. f even
            x = ODConvTranspose1d(
                in_features=ch,
                out_features=out_ch,
                kernel_size=2 * f,
                stride=f,
                padding=f // 2,
                num_kernels=cfg.odconv_k,
                fold_in=fold,
                unfold_output=False,
                dtype=self.dtype,
                name=f"upsample_{i}",
            )(x)
            fold = fold * f if exact else 1
            target = min(max(1, 128 // out_ch), fold)
            if fold != target:  # partial unfold: free contiguous reshape
                B, U = x.shape[0], x.shape[1]
                x = x.reshape(B, U * (fold // target), target * out_ch)
                fold = target
            x = conv_ops.leaky_relu(x, cfg.leaky_slope)
            x = FiLM(out_ch, fold=fold, dtype=self.dtype, name=f"film_{i + 1}")(x, cond)
            ch = out_ch

        # --- MRF section: (re)fold to the audio-rate target ---
        T_audio = x.shape[1] * fold
        cand = max(1, 128 // ch)
        if cand != fold and T_audio % cand == 0:
            x = x.reshape(x.shape[0], T_audio // cand, cand * ch)
            fold = cand

        # measured on v5e: XLA's own fusion of the folded GRC chain is
        # currently slightly faster than the Pallas kernel (4.6ms vs
        # 5.4ms full forward), so "auto" resolves to XLA; the Pallas
        # backend stays available and parity-tested (ops/pallas).
        use_pallas = cfg.mrf_backend in ("pallas", "pallas2")
        n_up = len(cfg.upsample_factors)
        for i, (ks, dils) in enumerate(zip(cfg.resblock_kernel_sizes, cfg.resblock_dilations)):
            residual = x
            # Reference zips a scalar kernel size with the dilation tuple:
            # each MRF stack i applies len(dils) sequential GRC blocks at
            # kernel size ks (generator.py:239-246, 290-297).
            blocks = [
                GRCLoRABlock(
                    channels=ch,
                    kernel_size=ks,
                    dilation=d,
                    groups=cfg.grc_groups,
                    lora_rank=cfg.lora_rank,
                    leaky_slope=cfg.leaky_slope,
                    fold=fold,
                    dtype=self.dtype,
                    name=f"mrf_{i}_grc_{j}",
                )
                for j, d in enumerate(dils)
            ]
            if use_pallas and fold > 1:
                from hifigan_tpu.ops.pallas import grc_chain

                comps = [blk(x, return_fused=True) for blk in blocks]
                x = grc_chain(
                    x, comps,
                    groups=cfg.grc_groups, channels=ch, fold=fold,
                    slope=cfg.leaky_slope,
                    interpret=jax.default_backend() != "tpu",
                    tap_concat=cfg.mrf_backend == "pallas2",
                )
            else:
                for blk in blocks:
                    x = blk(x)
            x = x + residual
            x = FiLM(ch, fold=fold, dtype=self.dtype, name=f"film_{n_up + i + 1}")(x, cond)

        w_out = self.param(
            "output_kernel", nn.initializers.normal(0.01), (7, ch, 1), jnp.float32
        )
        b_out = self.param("output_bias", nn.initializers.zeros, (1,), jnp.float32)
        if fold > 1:
            wf, lo, hi = fold_ops.fold_conv_kernel(w_out, fold, padding=3)
            x = conv_ops.conv1d(
                x, wf.astype(self.dtype),
                fold_ops.fold_channel_vector(b_out, fold), padding=(lo, hi),
            )
            x = fold_ops.unfold_time(x, fold)  # [B, T, 1]
        else:
            x = conv_ops.conv1d(x, w_out.astype(self.dtype), b_out, padding=3)
        wav = jnp.tanh(x.astype(jnp.float32))
        return jnp.transpose(wav, (0, 2, 1))  # [B, 1, T_samples]


class _ResBlock1(nn.Module):
    """HiFi-GAN V1 ResBlock (static convs, dilated + plain pairs).

    ``fold > 1``: operates on time-folded activations (kernels
    transformed at trace time — ops/fold.py) so audio-rate small-channel
    stages keep 128-lane tiles."""

    channels: int
    kernel_size: int
    dilations: Tuple[int, ...]
    leaky_slope: float = 0.1
    fold: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c, k, F = self.channels, self.kernel_size, self.fold

        def conv(h, w, b, dilation):
            pad = (k - 1) * dilation // 2
            if F > 1:
                wf, lo, hi = fold_ops.fold_conv_kernel(w, F, padding=pad,
                                                       dilation=dilation)
                return conv_ops.conv1d(
                    h, wf.astype(self.dtype),
                    fold_ops.fold_channel_vector(b, F), padding=(lo, hi))
            return conv_ops.conv1d(h, w.astype(self.dtype), b,
                                   padding=pad, dilation=dilation)

        for j, d in enumerate(self.dilations):
            h = conv_ops.leaky_relu(x, self.leaky_slope)
            w1 = self.param(f"w1_{j}", nn.initializers.normal(0.01), (k, c, c), jnp.float32)
            b1 = self.param(f"b1_{j}", nn.initializers.zeros, (c,), jnp.float32)
            h = conv(h, w1, b1, d)
            h = conv_ops.leaky_relu(h, self.leaky_slope)
            w2 = self.param(f"w2_{j}", nn.initializers.normal(0.01), (k, c, c), jnp.float32)
            b2 = self.param(f"b2_{j}", nn.initializers.zeros, (c,), jnp.float32)
            h = conv(h, w2, b2, 1)
            x = x + h
        return x


class HiFiGANV1Generator(nn.Module):
    """Plain (unconditioned) HiFi-GAN V1 generator — baseline model for
    BASELINE.json config 1; static convs throughout."""

    input_channels: int = 80
    hidden_channels: int = 512
    upsample_factors: Tuple[int, ...] = (8, 8, 2, 2)
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    leaky_slope: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: Array) -> Array:
        x = jnp.transpose(mel, (0, 2, 1)).astype(self.dtype)
        w_in = self.param(
            "input_kernel", nn.initializers.normal(0.01),
            (7, self.input_channels, self.hidden_channels), jnp.float32,
        )
        b_in = self.param("input_bias", nn.initializers.zeros, (self.hidden_channels,), jnp.float32)
        x = conv_ops.conv1d(x, w_in.astype(self.dtype), b_in, padding=3)
        ch = self.hidden_channels
        for i, f in enumerate(self.upsample_factors):
            out_ch = ch // 2
            x = conv_ops.leaky_relu(x, self.leaky_slope)
            w = self.param(
                f"up_{i}_kernel", nn.initializers.normal(0.01),
                (ch, out_ch, 2 * f), jnp.float32,
            )
            b = self.param(f"up_{i}_bias", nn.initializers.zeros, (out_ch,), jnp.float32)
            x = conv_ops.conv_transpose1d(x, w.astype(self.dtype), b, stride=f, padding=f // 2)
            ch = out_ch
            # time-fold the resblocks when channels drop below 128 lanes
            T_cur = x.shape[1]
            fold = max(1, 128 // ch)
            fold = fold if (fold > 1 and T_cur % fold == 0) else 1
            if fold > 1:
                x = fold_ops.fold_time(x, fold)
            acc = None
            for k, dils in zip(self.resblock_kernel_sizes, self.resblock_dilations):
                h = _ResBlock1(ch, k, dils, self.leaky_slope, fold, self.dtype,
                               name=f"res_{i}_{k}")(x)
                acc = h if acc is None else acc + h
            x = acc / len(self.resblock_kernel_sizes)
            if fold > 1:
                x = fold_ops.unfold_time(x, fold)
        x = conv_ops.leaky_relu(x, self.leaky_slope)
        w_out = self.param("output_kernel", nn.initializers.normal(0.01), (7, ch, 1), jnp.float32)
        b_out = self.param("output_bias", nn.initializers.zeros, (1,), jnp.float32)
        x = conv_ops.conv1d(x, w_out.astype(self.dtype), b_out, padding=3)
        wav = jnp.tanh(x.astype(jnp.float32))
        return jnp.transpose(wav, (0, 2, 1))
