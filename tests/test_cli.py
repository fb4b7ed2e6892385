"""CLI smoke tests: train → resume → summary, and simulate (tiny)."""

import json
import os

import pytest


def test_cli_train_resume_and_summary(tmp_path):
    from hifigan_tpu.cli import main

    ckpt = str(tmp_path / "ckpt")
    main(["train", "--tiny", "--batch_size", "2", "--max_steps", "2",
          "--log_every", "1", "--checkpoint_dir", ckpt])
    summary = json.load(open(os.path.join(ckpt, "training_summary.json")))
    assert summary["steps"] == 2
    metrics = [json.loads(l) for l in open(os.path.join(ckpt, "metrics.jsonl"))]
    assert metrics and "generator_loss" in metrics[0]
    # resume continues from step 2
    main(["train", "--tiny", "--batch_size", "2", "--max_steps", "4",
          "--log_every", "1", "--checkpoint_dir", ckpt, "--resume"])
    summary = json.load(open(os.path.join(ckpt, "training_summary.json")))
    assert summary["steps"] == 4


def test_cli_simulate_tiny(capsys):
    from hifigan_tpu.cli import main

    main(["simulate", "--tiny", "--agent", "asr", "--segment_size", "320"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["agent"] == "asr"
    assert out["source_seconds"] == pytest.approx(1.0)


def test_cli_info(capsys):
    from hifigan_tpu.cli import main

    main(["info"])
    out = json.loads(capsys.readouterr().out)
    assert out["total_parameters"] > 1_000_000
    assert "upsample_0" in out["per_module_parameters"]


def test_cli_train_device_data(tmp_path):
    """--device_data: corpus banked to device memory, batches sampled
    in-program from PRNG keys (train/device_data.py), fused with
    --steps_per_call."""
    from hifigan_tpu.cli import main

    ckpt = str(tmp_path / "ckpt")
    # batch_size 1 forces n_dev==1 on the virtual mesh so the
    # device-data branch (not the host-loader fallback) is exercised
    main(["train", "--tiny", "--dataset", "formant", "--dataset_size", "4",
          "--batch_size", "1", "--max_steps", "4", "--steps_per_call", "2",
          "--device_data", "--log_every", "2", "--checkpoint_dir", ckpt])
    summary = json.load(open(os.path.join(ckpt, "training_summary.json")))
    assert summary["steps"] == 4
    metrics = [json.loads(l) for l in open(os.path.join(ckpt, "metrics.jsonl"))]
    assert metrics and all("generator_loss" in m for m in metrics)
