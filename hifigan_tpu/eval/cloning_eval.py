"""Voice-cloning evaluation: does the conditioning pathway *work*?

Implements the three demonstrations the thesis claim needs (reference
context: FiLM conditioning ``/root/reference/hifigan_modified/
generator.py:174-199``; speaker verification utilities with cosine
threshold 0.7 ``/root/reference/speaker_embedding/ecapa_tdnn.py:198-225``):

1. **Encoder separation** — with *trained* encoders, same-speaker
   cosine similarity must exceed cross-speaker similarity by a wide
   margin (random-init encoders map everything near one point, which is
   why round-2 SIM numbers were vacuous).
2. **Cross-speaker transfer** — content from speaker A + reference clip
   of speaker B → the output must verify as B (cosine to B's centroid ≥
   threshold AND closer to B than to A).  The parallel corpus provides
   a ground-truth target rendition (B speaking the same content), so
   transfer fidelity is measured as mel-L1 against real audio, not just
   embedding proximity.
3. **Conditioning ablation** — replacing the reference clip with zeros
   or a wrong-speaker clip must degrade target-speaker similarity;
   otherwise the generator ignores FiLM.
"""

from __future__ import annotations

import logging
from typing import Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np

from hifigan_tpu.eval.metrics import cosine_similarity
from hifigan_tpu.train.cloning import CONTENT_KEY_BASE, REF_KEY_BASE
from hifigan_tpu.train.corpus import FormantSpeechCorpus

log = logging.getLogger(__name__)

# held-out content keys: disjoint from the training banks' keys
EVAL_CONTENT_BASE = CONTENT_KEY_BASE + 500_000
EVAL_REF_BASE = REF_KEY_BASE + 500_000

VERIFY_THRESHOLD = 0.7  # reference ecapa_tdnn.py:212-225


def _pad(audio: np.ndarray, n: int) -> np.ndarray:
    out = np.zeros(n, np.float32)
    out[: min(n, len(audio))] = audio[:n]
    return out


def speaker_centroids(
    embed_fn: Callable,
    mel_fn: Callable,
    corpus: FormantSpeechCorpus,
    *,
    n_speakers: int,
    clips_per_speaker: int = 4,
    segment_samples: int = 32_768,
    key_base: int = EVAL_REF_BASE + 100_000,
) -> np.ndarray:
    """Per-speaker mean embedding over held-out clips → ``[S, D]``
    (L2-normalised)."""
    cents = []
    for s in range(n_speakers):
        embs = []
        for j in range(clips_per_speaker):
            wav = corpus.utterance(s, 0, content=key_base + j)
            mel = mel_fn(jnp.asarray(_pad(wav, segment_samples)[None]))
            embs.append(np.asarray(embed_fn(mel))[0])
        c = np.mean(embs, axis=0)
        cents.append(c / max(np.linalg.norm(c), 1e-9))
    return np.stack(cents)


def encoder_separation(
    embed_fn: Callable,
    mel_fn: Callable,
    corpus: FormantSpeechCorpus,
    *,
    n_speakers: int = 8,
    clips_per_speaker: int = 4,
    segment_samples: int = 32_768,
) -> Dict[str, float]:
    """Same-speaker vs cross-speaker cosine statistics on held-out
    clips.  A useful (discriminative) encoder has
    ``same_mean − cross_mean`` well above zero."""
    embs = []
    for s in range(n_speakers):
        for j in range(clips_per_speaker):
            wav = corpus.utterance(s, 0, content=EVAL_REF_BASE + 7_000 + s * 101 + j)
            mel = mel_fn(jnp.asarray(_pad(wav, segment_samples)[None]))
            embs.append((s, np.asarray(embed_fn(mel))[0]))
    same, cross = [], []
    for i in range(len(embs)):
        for j in range(i + 1, len(embs)):
            sim = float(np.dot(embs[i][1], embs[j][1])
                        / max(np.linalg.norm(embs[i][1])
                              * np.linalg.norm(embs[j][1]), 1e-9))
            (same if embs[i][0] == embs[j][0] else cross).append(sim)
    same, cross = np.array(same), np.array(cross)
    # verification accuracy at the reference 0.7 threshold
    acc = (np.concatenate([(same >= VERIFY_THRESHOLD),
                           (cross < VERIFY_THRESHOLD)]).mean()
           if len(same) and len(cross) else 0.0)
    return {
        "same_speaker_mean": float(same.mean()),
        "same_speaker_std": float(same.std()),
        "cross_speaker_mean": float(cross.mean()),
        "cross_speaker_std": float(cross.std()),
        "separation": float(same.mean() - cross.mean()),
        "verification_accuracy_at_0.7": float(acc),
    }


def evaluate_cloning_transfer(
    synthesize_fn: Callable,  # (content_mel, ref_mel) -> wav [1,1,T]
    embed_fn: Callable,       # mel -> [1, D]  (trained speaker encoder)
    mel_fn: Callable,         # wav [1,T] -> mel [1,80,T']
    audio_mel_fn: Callable,   # np audio [1,S] -> mel (same transform)
    corpus: FormantSpeechCorpus,
    *,
    n_speakers: int = 8,
    n_contents: int = 4,
    segment_samples: int = 32_768,
    ref_samples: int = 16_384,
    centroids: Optional[np.ndarray] = None,
) -> Dict:
    """Cross-speaker transfer grid + conditioning ablation.

    For every (content c, source speaker A, target speaker B≠A):
    synthesize A's content mel conditioned on B's reference clip, then
    check the output (i) verifies as B, (ii) is closer to B than to A,
    and (iii) tracks B's ground-truth parallel rendition in mel-L1
    (vs the mismatched-speaker baseline of A's own rendition)."""
    if centroids is None:
        centroids = speaker_centroids(
            embed_fn, audio_mel_fn, corpus, n_speakers=n_speakers,
            segment_samples=segment_samples)
    rows = []
    abl_correct, abl_zero, abl_shuffle = [], [], []
    mel_to_target, mel_to_source = [], []
    rng = np.random.default_rng(0)
    for ci in range(n_contents):
        ck = EVAL_CONTENT_BASE + ci
        ar = corpus.content_arousal(ck)
        renditions = {
            s: _pad(corpus.utterance(s, 0, content=ck), segment_samples)
            for s in range(n_speakers)
        }
        refs = {
            s: _pad(corpus.utterance(s, 0, content=EVAL_REF_BASE + 31 * ci + s,
                                     arousal=ar), ref_samples)
            for s in range(n_speakers)
        }
        for a in range(n_speakers):
            content_mel = audio_mel_fn(jnp.asarray(renditions[a][None]))
            tgt_mels = {}
            for b in range(n_speakers):
                if a == b:
                    continue
                ref_mel = audio_mel_fn(jnp.asarray(refs[b][None]))
                wav = synthesize_fn(content_mel, ref_mel)
                gen_mel = mel_fn(wav[:, 0, :])
                emb = np.asarray(embed_fn(gen_mel))[0]
                emb = emb / max(np.linalg.norm(emb), 1e-9)
                sim_b = float(np.dot(emb, centroids[b]))
                sim_a = float(np.dot(emb, centroids[a]))
                if b not in tgt_mels:
                    tgt_mels[b] = audio_mel_fn(jnp.asarray(renditions[b][None]))
                frames = min(gen_mel.shape[-1], tgt_mels[b].shape[-1],
                             content_mel.shape[-1])
                l1_tgt = float(jnp.mean(jnp.abs(
                    gen_mel[..., :frames] - tgt_mels[b][..., :frames])))
                l1_src = float(jnp.mean(jnp.abs(
                    gen_mel[..., :frames] - content_mel[..., :frames])))
                rows.append({
                    "content": ci, "source": a, "target": b,
                    "sim_target": sim_b, "sim_source": sim_a,
                    "verified_as_target": bool(
                        sim_b >= VERIFY_THRESHOLD and sim_b > sim_a),
                    "mel_l1_to_target_rendition": l1_tgt,
                    "mel_l1_to_source_rendition": l1_src,
                })
                mel_to_target.append(l1_tgt)
                mel_to_source.append(l1_src)

            # --- ablation on the identity pair (clone A with A's ref) ---
            ref_mel_own = audio_mel_fn(jnp.asarray(refs[a][None]))
            wav_c = synthesize_fn(content_mel, ref_mel_own)
            emb_c = np.asarray(embed_fn(mel_fn(wav_c[:, 0, :])))[0]
            emb_c = emb_c / max(np.linalg.norm(emb_c), 1e-9)
            abl_correct.append(float(np.dot(emb_c, centroids[a])))
            wav_z = synthesize_fn(content_mel,
                                  jnp.zeros_like(ref_mel_own))
            emb_z = np.asarray(embed_fn(mel_fn(wav_z[:, 0, :])))[0]
            emb_z = emb_z / max(np.linalg.norm(emb_z), 1e-9)
            abl_zero.append(float(np.dot(emb_z, centroids[a])))
            wrong = int(rng.choice([s for s in range(n_speakers) if s != a]))
            ref_mel_wrong = audio_mel_fn(jnp.asarray(refs[wrong][None]))
            wav_s = synthesize_fn(content_mel, ref_mel_wrong)
            emb_s = np.asarray(embed_fn(mel_fn(wav_s[:, 0, :])))[0]
            emb_s = emb_s / max(np.linalg.norm(emb_s), 1e-9)
            abl_shuffle.append(float(np.dot(emb_s, centroids[a])))

    n = len(rows)
    verified = sum(r["verified_as_target"] for r in rows)
    closer = sum(r["sim_target"] > r["sim_source"] for r in rows)
    return {
        "n_transfer_pairs": n,
        "transfer_verified_rate": verified / max(n, 1),
        "transfer_closer_to_target_rate": closer / max(n, 1),
        "transfer_sim_target_mean": float(np.mean(
            [r["sim_target"] for r in rows])) if rows else 0.0,
        "transfer_sim_source_mean": float(np.mean(
            [r["sim_source"] for r in rows])) if rows else 0.0,
        "mel_l1_to_target_rendition_mean": float(np.mean(mel_to_target))
        if mel_to_target else 0.0,
        "mel_l1_to_source_rendition_mean": float(np.mean(mel_to_source))
        if mel_to_source else 0.0,
        "ablation": {
            "correct_ref_sim_to_own": float(np.mean(abl_correct)),
            "zero_ref_sim_to_own": float(np.mean(abl_zero)),
            "wrong_ref_sim_to_own": float(np.mean(abl_shuffle)),
        },
        "pairs": rows,
    }
