"""Data pipeline + ops tooling (watchdog, heartbeat, debug log)."""

import json
import os
import time

import numpy as np

from nsa_vibe_tpu.train.data import (
    Shard,
    collate_varlen,
    local_docs,
    make_batches,
    pack_token_stream,
    synthetic_docs,
    tokenize_bytes,
)
from nsa_vibe_tpu.utils.heartbeat import Heartbeat
from nsa_vibe_tpu.utils.watchdog import WatchdogPolicy, check_once


def test_tokenize_bytes_roundtrip():
    t = tokenize_bytes("hello")
    assert t.tolist() == [104, 101, 108, 108, 111]
    assert t.dtype == np.int32


def test_pack_token_stream_shapes():
    docs = [np.arange(100, dtype=np.int32), np.arange(50, dtype=np.int32)]
    batches = list(pack_token_stream(iter(docs), seq_len=16, batch_size=2))
    assert all(b.shape == (2, 17) for b in batches)
    # stream is contiguous: first row starts the first doc
    assert batches[0][0, :5].tolist() == [0, 1, 2, 3, 4]


def test_doc_sharding_disjoint():
    s0, s1 = Shard(2, 0), Shard(2, 1)
    owned0 = {i for i in range(10) if s0.owns(i)}
    owned1 = {i for i in range(10) if s1.owns(i)}
    assert owned0 & owned1 == set()
    assert owned0 | owned1 == set(range(10))


def test_synthetic_batches_deterministic():
    a = next(make_batches("synthetic", 32, 2, seed=7))
    b = next(make_batches("synthetic", 32, 2, seed=7))
    np.testing.assert_array_equal(a, b)
    c = next(make_batches("synthetic", 32, 2, seed=8))
    assert not np.array_equal(a, c)


def test_local_jsonl_loader(tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text('{"text": "abc"}\n{"text": "defg"}\nnot json\n{"text": ""}\n')
    docs = list(local_docs(str(p)))
    assert [d.tolist() for d in docs] == [[97, 98, 99], [100, 101, 102, 103]]
    # sharded: rank 1 of 2 sees only doc index 1
    docs1 = list(local_docs(str(p), Shard(2, 1)))
    assert [d.tolist() for d in docs1] == [[100, 101, 102, 103]]


def test_local_docs_epoch_cycling(tmp_path):
    """epochs=N replays the file N times; epochs=0 cycles forever (the
    trainer's mode — a small corpus must not exhaust mid-run)."""
    p = tmp_path / "c.txt"
    p.write_text("xyz")
    assert len(list(local_docs(str(p), epochs=1))) == 1
    assert len(list(local_docs(str(p), epochs=3))) == 3
    it = local_docs(str(p), epochs=0)
    for _ in range(7):
        assert next(it).tolist() == [120, 121, 122]


def test_make_batches_local_epochs(tmp_path):
    p = tmp_path / "c.txt"
    p.write_text("abcdefgh" * 20)  # 160 bytes
    # one epoch of 160 tokens yields 4 batches of 2x(16+1)=34 tokens
    assert len(list(make_batches(str(p), 16, 2, native=False))) == 4
    it = make_batches(str(p), 16, 2, native=False, epochs=0)
    for _ in range(20):
        assert next(it).shape == (2, 17)


def test_make_varlen_batches_local_file(tmp_path):
    """Regression: varlen batching from a local file (the tokenizer spec
    is resolved to a callable before reaching local_docs)."""
    from nsa_vibe_tpu.ops.varlen import make_varlen_batches

    p = tmp_path / "docs.jsonl"
    p.write_text("".join(f'{{"text": "{"ab" * 30}"}}\n' for _ in range(16)))
    toks, seq_start, loss_mask = next(
        make_varlen_batches(str(p), seq_len=64, batch_size=2, align=16,
                            epochs=0))
    assert toks.shape == (2, 65)
    assert seq_start.shape == (2, 64) and loss_mask.shape == (2, 64)


def test_collate_varlen():
    out = collate_varlen([np.array([1, 2, 3]), np.array([4, 5])], seq_len=4)
    np.testing.assert_array_equal(out["tokens"], [[1, 2, 3, 0], [4, 5, 0, 0]])
    np.testing.assert_array_equal(out["attn_mask"], [[1, 1, 1, 0], [1, 1, 0, 0]])
    np.testing.assert_array_equal(out["labels"][0, :2], [2, 3])
    np.testing.assert_array_equal(out["loss_mask"], [[1, 1, 0, 0], [1, 0, 0, 0]])
    assert out["cu_seqlens"].tolist() == [0, 3, 5]


def test_heartbeat_write_read(tmp_path):
    hb = Heartbeat(str(tmp_path / "hb.jsonl"), rank=0)
    hb.beat(1, loss=2.5, toks_per_s=100.0)
    hb.beat(2, loss=2.4, toks_per_s=120.0)
    last = Heartbeat.last_beat(str(tmp_path / "hb.jsonl"))
    assert last["step"] == 2 and last["loss"] == 2.4


def _write_hb(path, records):
    with open(path, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")


def test_watchdog_heartbeat_stall(tmp_path):
    # watchdog has been attached for a while (watch_start in the past)
    # and the last heartbeat is older than the stall threshold
    _write_hb(tmp_path / "heartbeat.jsonl", [{"ts": time.time() - 1000, "step": 1}])
    state = {"watch_start": time.time() - 1000}
    anomaly = check_once(str(tmp_path), WatchdogPolicy(heartbeat_stall_s=180), state)
    assert anomaly == "heartbeat_stall"


def test_watchdog_resume_does_not_stall_on_stale_heartbeat(tmp_path):
    """A watchdog attached to a RESUMED run must not fire on the
    previous life's heartbeat age (found live in the r5 sustained run:
    phase-2's watchdog halted the resume during its compile phase). The
    stall clock runs from max(last heartbeat, watchdog start), and other
    checks skip pre-existing samples until a fresh beat arrives."""
    _write_hb(tmp_path / "heartbeat.jsonl",
              [{"ts": time.time() - 1000, "step": 2600, "toks_per_s": 0.0,
                "gate_entropy": 0.01, "gate_max": 0.99,
                "gate_collapse_frac": 1.0, "grad_norm": 0.0}] * 8)
    state = {}          # fresh watchdog: watch_start = now
    for _ in range(5):
        assert check_once(
            str(tmp_path), WatchdogPolicy(heartbeat_stall_s=180), state) is None
    # ... but once the watchdog has genuinely waited past the threshold
    # with no fresh beat, the stall is real
    state["watch_start"] = time.time() - 300
    assert check_once(
        str(tmp_path), WatchdogPolicy(heartbeat_stall_s=180),
        state) == "heartbeat_stall"


def test_watchdog_gate_collapse(tmp_path):
    now = time.time()
    recs = [{"ts": now, "step": i, "toks_per_s": 100.0, "gate_entropy": 0.05,
             "gate_max": 0.99, "gate_collapse_frac": 0.9} for i in range(5)]
    _write_hb(tmp_path / "heartbeat.jsonl", recs)
    policy = WatchdogPolicy(gate_consecutive=3)
    state = {"watch_start": now - 60}   # watchdog attached before the beats
    results = [check_once(str(tmp_path), policy, state) for _ in range(3)]
    assert results[-1] == "gate_collapse"


def test_watchdog_healthy_run_no_halt(tmp_path):
    now = time.time()
    recs = [{"ts": now, "step": i, "toks_per_s": 500.0, "gate_entropy": 1.0,
             "gate_max": 0.4, "gate_collapse_frac": 0.0, "grad_norm": 0.5}
            for i in range(8)]
    _write_hb(tmp_path / "heartbeat.jsonl", recs)
    state = {"watch_start": now - 60}
    for _ in range(5):
        assert check_once(str(tmp_path), WatchdogPolicy(), state) is None
    assert not os.path.exists(tmp_path / ".HALT")


def test_debug_log_gating(capsys, monkeypatch):
    from nsa_vibe_tpu.utils import debug

    debug.reset_counts()
    monkeypatch.delenv("NSA_DEBUG_LOG", raising=False)
    debug.log("decode.reads", total=100)
    assert capsys.readouterr().err == ""
    monkeypatch.setenv("NSA_DEBUG_LOG", "1")
    debug.log("decode.reads", total=100)
    assert "NSA-LOG decode.reads total=100" in capsys.readouterr().err
    monkeypatch.setenv("NSA_LOG_LIMIT", "1")
    debug.reset_counts()
    debug.log("x", a=1)
    debug.log("x", a=2)
    assert capsys.readouterr().err.count("NSA-LOG x") == 1


def test_make_tokenizer_specs():
    from nsa_vibe_tpu.train.data import make_tokenizer, tokenize_bytes

    assert make_tokenizer("byte") is tokenize_bytes
    import pytest

    with pytest.raises(ValueError):
        make_tokenizer("bogus")


def test_multi_process_batches_disjoint_and_cover(tmp_path):
    """Simulated n_proc=2 run (VERDICT r1 #7): each rank's make_batches
    stream draws from a disjoint doc subset and together they cover every
    doc — the per-rank sharding the trainer applies via Shard(n_proc, rank)."""
    import json as _json

    p = tmp_path / "docs.jsonl"
    # doc i is 40 copies of byte (i + 1): doc identity readable from tokens
    with open(p, "w") as f:
        for i in range(8):
            f.write(_json.dumps({"text": chr(i + 1) * 40}) + "\n")
    seen = []
    for rank in (0, 1):
        vals = set()
        for b in make_batches(str(p), seq_len=16, batch_size=1,
                              shard=Shard(2, rank)):
            vals.update(int(v) for v in np.unique(b) if v != 0)
        seen.append(vals)
    assert seen[0] & seen[1] == set(), seen
    assert seen[0] | seen[1] == {i + 1 for i in range(8)}, seen
