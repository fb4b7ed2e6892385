#!/usr/bin/env python3
"""Standalone held-out token-F1 eval for a trained S2ST checkpoint.

Produces ``<checkpoint_dir>/s2st_eval.json`` — normally written by
``cli train-s2st`` at the end of training, but a watchdog wall-kill
stops the trainer before it gets there (round-5 phase 4).  This replays
exactly that code path (cli.py cmd_train_s2st tail): restore the latest
checkpoint, build the held-out bank at idx_offset 1M, score token-F1.

Runs on the CPU backend so it never contends with a training TPU.
"""
import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

log = logging.getLogger("eval_s2st_text")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint_dir", default="runs/s2st3")
    ap.add_argument("--eval_samples", type=int, default=32)
    ap.add_argument("--steps", type=int, nargs="*", default=None,
                    help="rank these checkpoint steps instead of writing "
                         "s2st_eval.json for the latest")
    ap.add_argument("--dataset_size", type=int, default=512)
    ap.add_argument("--batch_size", type=int, default=16)
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax

    jax.config.update("jax_platforms", "cpu")
    from dataclasses import replace

    from hifigan_tpu.train.checkpoint import CheckpointManager
    from hifigan_tpu.train.s2st_task import (
        S2STTaskConfig,
        build_s2st_bank,
        create_s2st_state,
        evaluate_token_f1,
        small_config,
    )

    task = S2STTaskConfig(n_utterances=args.dataset_size,
                          batch_size=args.batch_size)
    state, model, _ = create_s2st_state(
        jax.random.PRNGKey(0), small_config(), task)
    mgr = CheckpointManager(args.checkpoint_dir)
    held = build_s2st_bank(replace(task, n_utterances=args.eval_samples),
                           idx_offset=1_000_000)
    if args.steps:
        rows = []
        for s in args.steps:
            st = mgr.restore(state, step=int(s))
            rep = evaluate_token_f1(model, st.params, task, held)
            rep["step"] = int(s)
            log.info("step %d: token_f1 %.3f exact %.3f", s,
                     rep["token_f1"], rep["exact_match"])
            rows.append(rep)
        rows.sort(key=lambda r: r["token_f1"], reverse=True)
        print(json.dumps({"ranking": rows}, indent=2))
        return

    state = mgr.restore(state)
    log.info("restored %s step %d", args.checkpoint_dir, int(state.step))
    report = evaluate_token_f1(model, state.params, task, held)
    report["step"] = int(state.step)
    out = os.path.join(args.checkpoint_dir, "s2st_eval.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
