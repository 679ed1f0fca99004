"""Debug-compare utilities + branch edge-case NaN guards.

Reference analogues: NSA_DEBUG_COMPARE branch-MAE prints
(nsa_attention.py:1406-1447), selection validators
(selection_scorer.py:714-758), empty-row NaN guard
(test_selection_masked_empty_rows.py), and the masked cmp/win NaN-safety
tests (test_sliding_sdpa_mask_nan.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsa_vibe_tpu.core.config import NSAConfig
from nsa_vibe_tpu.core.nsa import init_nsa_params, nsa_prefill
from nsa_vibe_tpu.utils.compare import debug_compare_prefill, validate_selection

CFG = NSAConfig(dim=64, n_heads=4, n_kv_groups=2, d_k=16, d_v=16,
                l=8, d=4, l_sel=16, n_sel=4, w=32, kernel="reference")


@pytest.fixture(scope="module")
def setup():
    params = init_nsa_params(jax.random.PRNGKey(0), CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, CFG.dim))
    return params, x


def test_debug_compare_branches_close(setup):
    params, x = setup
    report = debug_compare_prefill(params, x, CFG)
    for k in ("cmp", "sel", "win", "all"):
        assert report[k] < 5e-5, report
    assert report["sel_idx_mismatch"] == 0.0


def test_validate_selection_accepts_real_output(setup):
    params, x = setup
    _, aux = jax.jit(lambda p, xx: nsa_prefill(p, xx, CFG))(params, x)
    t_pos = np.arange(x.shape[1])
    assert validate_selection(aux["sel_idx"], t_pos, CFG.l_sel) is None


def test_validate_selection_rejects_violations():
    t_pos = np.array([3])
    bad_causal = np.full((1, 1, 1, 4), -1, np.int32)
    bad_causal[0, 0, 0, :2] = [0, 3]          # block 3 starts at 48 > t=3
    assert "causality" in validate_selection(bad_causal, t_pos, 16)
    no_init = np.full((1, 1, 1, 4), -1, np.int32)
    no_init[0, 0, 0, 0] = 0
    assert validate_selection(no_init, t_pos, 16) is None
    dup = np.full((1, 1, 1, 4), -1, np.int32)
    dup[0, 0, 0, :3] = [0, 0, 0]
    assert "duplicate" in validate_selection(dup, t_pos, 16)


@pytest.mark.parametrize("kernel", ["reference", "pallas"])
def test_short_sequence_no_nans(kernel):
    """S < l: zero compressed tokens — cmp branch must output zeros, the
    module must stay finite end to end (reference empty-row NaN guard)."""
    cfg = CFG.replace(kernel=kernel)
    params = init_nsa_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, CFG.l - 2, cfg.dim))
    out, aux = jax.jit(lambda p, xx: nsa_prefill(p, xx, cfg))(params, x)
    assert bool(jnp.isfinite(out).all())


@pytest.mark.parametrize("kernel", ["reference", "pallas"])
def test_forced_cmp_short_sequence_zero(kernel):
    """With the gate forced to cmp and no compressed tokens, the branch
    contributes exactly zero (no first-key degeneracy — SURVEY §2.6#2)."""
    cfg = CFG.replace(kernel=kernel, force_branch="cmp")
    params = init_nsa_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, CFG.l - 2, cfg.dim))
    out, _ = jax.jit(lambda p, xx: nsa_prefill(p, xx, cfg))(params, x)
    # out = W_O @ 0 + bias-free -> exactly 0
    assert float(jnp.abs(out).max()) == 0.0
