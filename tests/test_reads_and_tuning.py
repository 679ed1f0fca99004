"""Decode read-counter trend + kernel tuning registry contracts."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from nsa_vibe_tpu.core.cache import init_cache
from nsa_vibe_tpu.core.config import NSAConfig
from nsa_vibe_tpu.core.decode import nsa_decode_step
from nsa_vibe_tpu.core.nsa import init_nsa_params
from nsa_vibe_tpu.ops.block_index import num_cmp_blocks
from nsa_vibe_tpu.ops.selection import effective_sel_blocks

CFG = NSAConfig(dim=32, n_heads=2, n_kv_groups=1, d_k=16, d_v=16,
                l=8, d=4, l_sel=8, n_sel=2, w=8, kernel="reference")
# n_sel=2 < forced init+2 local slots: the true gather width is 3 blocks
N_EFF = effective_sel_blocks(CFG.n_sel, CFG.force_init, CFG.force_local)


def test_decode_reads_trend():
    """Reference test_decode_reads_trend: reads grow with S following
    num_cmp(S) + n*l' + min(w, S) — win saturates at w, cmp grows by 1
    every d steps, sel is constant."""
    params = init_nsa_params(jax.random.PRNGKey(0), CFG)
    cache = init_cache(CFG, 1, capacity=64)
    step = jax.jit(lambda p, x, c: nsa_decode_step(p, x, c, CFG))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 1, CFG.dim))
    preds = []
    for t in range(40):
        _, cache, info = step(params, x, cache)
        s = t + 1
        expect = (int(num_cmp_blocks(s, CFG.l, CFG.d))
                  + N_EFF * CFG.l_sel + min(CFG.w, s))
        assert int(info.reads_pred) == expect, (t, int(info.reads_pred), expect)
        preds.append(int(info.reads_pred))
    assert preds == sorted(preds)                       # monotone non-decreasing
    # win saturated + cmp still growing at the tail
    assert preds[-1] - preds[-CFG.d - 1] == 1


def test_decode_actual_reads_bounded_by_pred():
    """reads_actual_* are counted from the masks the step really applied
    (not the budget formula): always <= the per-branch predictions, with
    selection strictly under its padded n*l' width once blocks clamp at
    the sequence head — the divergence the formula-only column could
    never show (reference kv_cache.py:51-65 actual counters)."""
    params = init_nsa_params(jax.random.PRNGKey(0), CFG)
    cache = init_cache(CFG, 1, capacity=64)
    step = jax.jit(lambda p, x, c: nsa_decode_step(p, x, c, CFG))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 1, CFG.dim))
    saw_sel_underfill = False
    for t in range(40):
        _, cache, info = step(params, x, cache)
        a_cmp, a_sel, a_win = (float(info.reads_actual_cmp),
                               float(info.reads_actual_sel),
                               float(info.reads_actual_win))
        assert a_cmp == int(info.reads_cmp), t      # cmp mask == formula
        assert a_win == int(info.reads_win), t      # win mask == formula
        assert a_sel <= int(info.reads_sel) + 1e-6, t
        assert abs(float(info.reads_actual) - (a_cmp + a_sel + a_win)) < 1e-4
        assert float(info.reads_actual) <= float(info.reads_pred) + 1e-6, t
        # early steps: < n*l_sel tokens exist, so the padded gather is
        # necessarily under-filled — actual must see it
        if t + 1 < N_EFF * CFG.l_sel:
            assert a_sel <= t + 1 + 1e-6, (t, a_sel)
            saw_sel_underfill = saw_sel_underfill or a_sel < N_EFF * CFG.l_sel
    assert saw_sel_underfill


def test_tuning_defaults_and_override(tmp_path, monkeypatch):
    from nsa_vibe_tpu.ops import tuning

    assert tuning.tuned("win.block_k") >= 128
    assert tuning.tuned("sel.kv_batch") >= 1

    # file override wins over defaults (autotune writes this file)
    cfgf = tmp_path / "kernel_tuning.json"
    cfgf.write_text(json.dumps({"win.block_k": 256, "bogus.key": 1}))
    monkeypatch.setattr(tuning, "_TUNING_PATH", str(cfgf))
    tuning._load.cache_clear()
    try:
        assert tuning.tuned("win.block_k") == 256
        assert "bogus.key" not in tuning._load()        # unknown keys dropped
        assert tuning.tuned("sel.kv_batch") == tuning.DEFAULTS["sel.kv_batch"]
    finally:
        tuning._load.cache_clear()


def test_sel_kv_batches_length_gate():
    """Per-direction length-adaptive sel kv batching (ab_queue
    s4k-*/s8k-*): bwd widens from sel.bwd_long_s=4096 (+4.7% at 4k,
    +7.6% at 8k), fwd only from sel.long_s=8192 (-0.3% at 4k)."""
    from nsa_vibe_tpu.ops.attention import _sel_kv_batches
    from nsa_vibe_tpu.ops import tuning

    kb8_f = tuning.tuned("sel.kv_batch")
    kb8_b = tuning.tuned("sel.bwd_kv_batch")
    assert _sel_kv_batches(2048) == (kb8_f, kb8_b)      # both narrow
    assert _sel_kv_batches(4096) == (kb8_f, 16)         # bwd-only wide
    assert _sel_kv_batches(8192) == (16, 16)            # both wide
    assert _sel_kv_batches(65536) == (16, 16)


def test_scorer_vmem_guard_scales():
    from nsa_vibe_tpu.ops.pallas.scorer import scorer_fits_vmem

    assert scorer_fits_vmem(h=6, S_sel=32)       # m7c @ 2k
    assert scorer_fits_vmem(h=6, S_sel=1024)     # m7c @ 64k (streamed M)
    assert not scorer_fits_vmem(h=6, S_sel=65536)  # absurd


def test_decode_reads_independent_of_batch():
    params = init_nsa_params(jax.random.PRNGKey(0), CFG)
    step = jax.jit(lambda p, x, c: nsa_decode_step(p, x, c, CFG))
    for B in (1, 3):
        cache = init_cache(CFG, B, capacity=32)
        x = jax.random.normal(jax.random.PRNGKey(1), (B, 1, CFG.dim))
        _, _, info = step(params, x, cache)
        assert int(info.reads_pred) == N_EFF * CFG.l_sel + 1
        assert np.isfinite(float(info.sel_valid_tokens))


def test_sel_fwd_smem_guard():
    """The sel forward's order table ([B,G,nq,J] int32, ~4x in smem) must
    degrade block_q before the 1 MB smem limit (B=64/S=2048/bq=128
    compile-OOM'd on v5e at 1.06M/1.00M; the guard doubles to 256)."""
    from nsa_vibe_tpu.ops.pallas.sel_flash import _smem_safe_block_q

    assert _smem_safe_block_q(64, 2, 2048, 32, 128) == 256   # the OOM case
    assert _smem_safe_block_q(16, 2, 2048, 32, 128) == 128   # train config fits
    assert _smem_safe_block_q(256, 2, 2048, 32, 128) == 1024  # keeps doubling
    assert _smem_safe_block_q(4096, 2, 2048, 32, 128) == 2048  # capped at S


def test_apply_tpu_env(monkeypatch):
    """vmem.scoped_kib != default propagates to LIBTPU_INIT_ARGS exactly
    once (idempotent), appends to an existing value, and is a no-op at
    the 16 MB default."""
    import os

    from nsa_vibe_tpu.ops import tuning

    base = dict(tuning.DEFAULTS)
    monkeypatch.setenv("LIBTPU_INIT_ARGS", "--preexisting=1")
    # point away from the repo config (it carries the merged 24576)
    monkeypatch.setattr(tuning, "_TUNING_PATH", "/nonexistent.json")
    monkeypatch.setattr(tuning, "DEFAULTS", {**base, "vmem.scoped_kib": 16384})
    tuning._load.cache_clear()
    try:
        tuning.apply_tpu_env()
        assert os.environ["LIBTPU_INIT_ARGS"] == "--preexisting=1"  # no-op

        monkeypatch.setattr(tuning, "DEFAULTS",
                            {**base, "vmem.scoped_kib": 24576})
        tuning._load.cache_clear()
        tuning.apply_tpu_env()
        tuning.apply_tpu_env()                                      # idempotent
        val = os.environ["LIBTPU_INIT_ARGS"]
        assert val.startswith("--preexisting=1")
        assert val.count("--xla_tpu_scoped_vmem_limit_kib=24576") == 1
        assert tuning.scoped_vmem_bytes() == 24576 * 1024
    finally:
        tuning._load.cache_clear()
