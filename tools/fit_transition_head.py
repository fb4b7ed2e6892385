"""Fit the HMT READ/WRITE transition head on frozen decoder features.

The head (reference HMT transition model,
``/root/reference/agent/mt/hmt_sim_sequence_generator.py:449-470``) is a
single ``Dense(hidden → 1)`` over stop-gradiented decoder features
(``models/streamspeech.py::transition_head``), i.e. logistic regression.
Training it therefore does not need the TPU at all: run the frozen
stack forward under random source-prefix cross-masks, collect
(feature, decoder-correct) pairs, fit the 257-parameter head with a
class-balanced objective, and write it back into the checkpoint.

Why this exists: round 3 trained the head jointly with an unbalanced
BCE whose teacher-forced label is ~98% positive — it collapsed to
"always WRITE" (VERDICT r3 weak #3).  This tool refits it balanced and
reports *balanced* accuracy on held-out batches (0.5 = degenerate).

Usage:
  python tools/fit_transition_head.py --src runs/s2st2 --dst runs/s2st3
"""

from __future__ import annotations

import argparse
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="runs/s2st2",
                    help="checkpoint to read the frozen stack from")
    ap.add_argument("--dst", default="runs/s2st3",
                    help="checkpoint dir to write the refit head into")
    ap.add_argument("--batches", type=int, default=48)
    ap.add_argument("--heldout_batches", type=int, default=8)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--min_frac", type=float, default=0.1,
                    help="lower bound of the sampled prefix fraction")
    ap.add_argument("--target_tpr", type=float, default=0.9,
                    help="calibrate the bias so the head writes through "
                         "this fraction of genuinely-correct positions "
                         "at the beam's 0.5 threshold — the balanced "
                         "decision boundary itself is far more "
                         "READ-happy than the HMT gate expects")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (e.g. while the TPU "
                         "relay is busy/down)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from hifigan_tpu.train.checkpoint import CheckpointManager
    from hifigan_tpu.train.s2st_task import (
        S2STTaskConfig,
        batched_fbank,
        build_s2st_bank,
        create_s2st_state,
    )
    from hifigan_tpu.models.streamspeech import StreamSpeechConfig

    with open(os.path.join(args.src, "streamspeech_config.json")) as f:
        d = json.load(f)
    d.pop("_feature_rev", None)
    d["vocoder_upsample"] = tuple(d["vocoder_upsample"])
    cfg = StreamSpeechConfig(**d)
    task = S2STTaskConfig()
    state, model, _tx = create_s2st_state(jax.random.PRNGKey(0), cfg, task)
    state = CheckpointManager(args.src).restore(state)
    print(f"frozen stack: {args.src} step {int(state.step)}")

    bank = build_s2st_bank(task)
    B, T = task.batch_size, task.n_frames
    N = bank["audio"].shape[0]

    @jax.jit
    def features_and_labels(params, key):
        """One prefix-masked batch → (decoder feats, correct, keep)."""
        k_idx, k_cut = jax.random.split(key)
        idx = jax.random.randint(k_idx, (B,), 0, N)
        audio = jnp.asarray(bank["audio"])[idx]
        nf = jnp.asarray(bank["n_frames"])[idx]
        feats = batched_fbank(audio, T, task.hop, task.win, valid_frames=nf)
        frac = jax.random.uniform(k_cut, (B,), minval=args.min_frac,
                                  maxval=1.0)
        cutoff = jnp.maximum((frac * nf).astype(jnp.int32), 1)
        cross_mask = (jnp.arange(T)[None, None, None, :]
                      < cutoff[:, None, None, None])
        dec_in = jnp.asarray(bank["dec_in"])[idx]
        dec_out = jnp.asarray(bank["dec_out"])[idx]
        keep = 1.0 - jnp.asarray(bank["dec_pad"])[idx]
        enc = model.apply(params, feats, True,
                          method=lambda m, x, c: m.encoder(x, chunked=c))
        logits, dfeats = model.apply(
            params, enc, dec_in, cross_mask,
            method=lambda m, mem, tgt, cm: m.text_decoder(
                mem, tgt, cross_mask=cm, return_features=True))
        correct = (jnp.argmax(logits, -1) == dec_out).astype(jnp.float32)
        return dfeats.astype(jnp.float32), correct, keep

    def collect(n, key_base):
        xs, ys = [], []
        for i in range(n):
            f, c, k = features_and_labels(
                state.params, jax.random.fold_in(jax.random.PRNGKey(key_base), i))
            m = np.asarray(k).reshape(-1) > 0.5
            xs.append(np.asarray(f).reshape(-1, f.shape[-1])[m])
            ys.append(np.asarray(c).reshape(-1)[m])
        return np.concatenate(xs), np.concatenate(ys)

    X, y = collect(args.batches, 100)
    Xh, yh = collect(args.heldout_batches, 900)
    pos = float(y.mean())
    print(f"train rows {len(y)} (pos {pos:.3f}); held-out {len(yh)} "
          f"(pos {float(yh.mean()):.3f})")

    # class-balanced logistic regression, full-batch Adam
    Xd, yd = jnp.asarray(X), jnp.asarray(y)
    w_pos = 0.5 / max(pos, 1e-6)
    w_neg = 0.5 / max(1.0 - pos, 1e-6)
    wts = jnp.where(yd > 0.5, w_pos, w_neg)
    wts = wts / wts.sum()

    def loss_fn(p):
        z = Xd @ p["kernel"][:, 0] + p["bias"][0]
        return (optax.sigmoid_binary_cross_entropy(z, yd) * wts).sum()

    head = state.params["params"]["transition_head"]
    p = {"kernel": jnp.asarray(np.asarray(head["kernel"], np.float32)),
         "bias": jnp.asarray(np.asarray(head["bias"], np.float32))}
    tx = optax.adam(args.lr)
    opt = tx.init(p)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    def bacc(p, Xa, ya):
        z = np.asarray(Xa @ np.asarray(p["kernel"])[:, 0]
                       + np.asarray(p["bias"])[0])
        pred = z > 0
        tpr = (pred & (ya > 0.5)).sum() / max((ya > 0.5).sum(), 1)
        tnr = (~pred & (ya <= 0.5)).sum() / max((ya <= 0.5).sum(), 1)
        return 0.5 * (tpr + tnr), tpr, tnr

    b0 = bacc(p, Xh, yh)
    print(f"held-out balanced acc BEFORE: {b0[0]:.3f} "
          f"(TPR {b0[1]:.3f} TNR {b0[2]:.3f})")
    for i in range(args.steps):
        loss, g = grad_fn(p)
        upd, opt = tx.update(g, opt)
        p = optax.apply_updates(p, upd)
        if (i + 1) % 500 == 0:
            ba = bacc(p, Xh, yh)
            print(f"step {i+1}: loss {float(loss):.4f} "
                  f"held-out bacc {ba[0]:.3f}")
    b1, tpr, tnr = bacc(p, Xh, yh)
    print(f"held-out balanced acc AFTER (balanced point): {b1:.3f} "
          f"(TPR {tpr:.3f} TNR {tnr:.3f})")

    # operating-point calibration: shift the bias so that at the HMT
    # beam's fixed 0.5 probability threshold the head writes through
    # target_tpr of genuinely-correct positions.  The learned DIRECTION
    # stays; only the threshold moves — a balanced boundary gates half
    # the good writes and starves the simultaneous beam.
    zh = np.asarray(Xh @ np.asarray(p["kernel"])[:, 0]
                    + np.asarray(p["bias"])[0])
    z_pos = np.sort(zh[yh > 0.5])
    cut = z_pos[int((1.0 - args.target_tpr) * len(z_pos))]
    p["bias"] = p["bias"] - cut
    b1, tpr, tnr = bacc(p, Xh, yh)
    print(f"held-out AFTER calibration (target TPR "
          f"{args.target_tpr}): bacc {b1:.3f} TPR {tpr:.3f} "
          f"TNR {tnr:.3f}")

    # write the refit head into dst (same tree, bumped step)
    dst_state, _, _ = create_s2st_state(jax.random.PRNGKey(0), cfg, task)
    src_mgr = CheckpointManager(args.dst if os.path.isdir(
        os.path.join(args.dst, str(int(state.step)))) else args.src)
    dst_state = src_mgr.restore(dst_state)
    params = jax.tree_util.tree_map(lambda x: x, dst_state.params)
    hd = params["params"]["transition_head"]
    params["params"]["transition_head"] = {
        "kernel": jnp.asarray(p["kernel"], hd["kernel"].dtype),
        "bias": jnp.asarray(p["bias"], hd["bias"].dtype),
    }
    dst_state = dst_state.replace(params=params,
                                  step=dst_state.step + 1)
    os.makedirs(args.dst, exist_ok=True)
    mgr = CheckpointManager(args.dst)
    mgr.save(dst_state, force=True)
    mgr.wait()
    if not os.path.exists(os.path.join(args.dst,
                                       "streamspeech_config.json")):
        import shutil

        shutil.copy(os.path.join(args.src, "streamspeech_config.json"),
                    os.path.join(args.dst, "streamspeech_config.json"))
    with open(os.path.join(args.dst, "transition_fit.json"), "w") as f:
        json.dump({"balanced_acc_before": float(b0[0]),
                   "balanced_acc_after": float(b1),
                   "tpr": float(tpr), "tnr": float(tnr),
                   "train_rows": int(len(y)),
                   "label_pos_rate": pos,
                   "src": args.src, "src_step": int(state.step)}, f,
                  indent=2)
    print(f"wrote refit head into {args.dst} step "
          f"{int(dst_state.step)}")


if __name__ == "__main__":
    main()
