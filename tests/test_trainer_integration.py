"""Trainer integration: halt-and-resume + watchdog halt (reference
train_showcase.py .HALT/--resume contract, run in-process with a tiny
model)."""

import json
import os

import numpy as np

from nsa_vibe_tpu.core.config import ModelConfig, NSAConfig, TrainConfig
from nsa_vibe_tpu.train.trainer import train

NSA = NSAConfig(dim=32, n_heads=2, n_kv_groups=1, d_k=16, d_v=16,
                l=8, d=4, l_sel=8, n_sel=2, w=8, kernel="reference")


def _cfgs(out_dir, steps):
    mcfg = ModelConfig(vocab_size=256, n_layers=1, nsa=NSA, dtype="float32")
    tcfg = TrainConfig(steps=steps, batch_size=8, seq_len=32, lr=1e-3,
                       warmup_steps=2, log_every=2, save_every=4,
                       out_dir=str(out_dir))
    return mcfg, tcfg


def test_train_and_resume(tmp_path):
    out = tmp_path / "run"
    mcfg, tcfg = _cfgs(out, steps=5)
    s1 = train(mcfg, tcfg, "synthetic")
    assert s1["steps"] == 5 and np.isfinite(s1["final_loss"])
    assert (out / "training.csv").exists()
    assert (out / "heartbeat.jsonl").exists()
    assert (out / "env.json").exists()

    # resume continues from the checkpoint (reference --resume)
    mcfg, tcfg = _cfgs(out, steps=8)
    s2 = train(mcfg, tcfg, "synthetic", resume=True)
    assert s2["steps"] == 8

    hb = [json.loads(line) for line in (out / "heartbeat.jsonl").read_text().splitlines()]
    assert hb[-1]["step"] >= 6


def test_halt_file_stops_training(tmp_path):
    out = tmp_path / "run"
    out.mkdir()
    (out / ".HALT").write_text("test halt\n")
    mcfg, tcfg = _cfgs(out, steps=50)
    s = train(mcfg, tcfg, "synthetic")
    assert s["steps"] == 0  # halted before the first step


def test_env_snapshot_contents(tmp_path):
    out = tmp_path / "run"
    mcfg, tcfg = _cfgs(out, steps=1)
    train(mcfg, tcfg, "synthetic")
    env = json.loads((out / "env.json").read_text())
    assert env["model"]["n_layers"] == 1
    assert "jax" in env and "devices" in env
    assert os.path.exists(os.path.join(str(out), "ckpt"))


def test_synthetic_fallback_on_bad_source(tmp_path):
    """--synthetic-on-fail: a broken data source falls back to synthetic
    (reference train_showcase.py:914-940)."""
    out = tmp_path / "run"
    mcfg, tcfg = _cfgs(out, steps=2)
    s = train(mcfg, tcfg, "fineweb:no/such-dataset", synthetic_on_fail=True,
              first_batch_timeout_s=30.0)
    assert s["steps"] == 2 and np.isfinite(s["final_loss"])


def test_bad_source_raises_without_fallback(tmp_path):
    import pytest

    out = tmp_path / "run"
    mcfg, tcfg = _cfgs(out, steps=2)
    with pytest.raises(Exception):
        train(mcfg, tcfg, "/no/such/file.jsonl", first_batch_timeout_s=10.0)
