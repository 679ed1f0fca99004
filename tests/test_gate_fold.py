"""Gate-epilogue fold (nsa.gate_fold): forward parity + gradient contract.

The fold makes branch kernels emit the GATED output Y = g*O and routes
the gate-logit gradient through the D-form softmax vjp
(core.gate._softmax_dform): dz_k = D_k - g_k*sum_j D_j with
D_k = rowsum(dO*Y_k). This must match the standard combine
(out = sum g_k*O_k with plain autodiff) exactly in infinite precision —
these tests check value AND gradient parity against the unfused Pallas
path (f32, interpret mode on CPU), including near-collapsed gates where
the naive dg = D/g recovery would blow up (the r4 hazard that motivated
the design; reference gate MLP: nsa/core/nsa_attention.py:32-82).
"""

import jax
import jax.numpy as jnp
import pytest

from nsa_vibe_tpu.core.config import NSAConfig
from nsa_vibe_tpu.core.nsa import init_nsa_params, nsa_prefill
from nsa_vibe_tpu.ops import tuning

CFG = NSAConfig(dim=32, n_heads=4, n_kv_groups=2, d_k=8, d_v=8,
                l=4, d=2, l_sel=8, n_sel=3, w=8, kernel="pallas")


def _set_fold(monkeypatch, on: int):
    base = dict(tuning._load())
    base["nsa.gate_fold"] = on
    monkeypatch.setattr(tuning, "_load", lambda: base)


def _loss(params, x, cfg, seq_start=None):
    out, _ = nsa_prefill(params, x, cfg, seq_start=seq_start)
    return jnp.sum(out.astype(jnp.float32) ** 2)


def _grads(params, x, cfg, seq_start=None):
    return jax.grad(lambda p, xx: _loss(p, xx, cfg, seq_start))(params, x)


def _tree_allclose(a, b, atol, rtol):
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    flat_b = jax.tree_util.tree_leaves(b)
    for (path, la), lb in zip(flat_a, flat_b):
        assert jnp.allclose(la, lb, atol=atol, rtol=rtol), (
            f"grad mismatch at {jax.tree_util.keystr(path)}: "
            f"max abs diff {jnp.max(jnp.abs(la - lb))}")


@pytest.fixture
def setup():
    params = init_nsa_params(jax.random.PRNGKey(0), CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, CFG.dim)) * 0.5
    return params, x


def test_fold_forward_matches_unfused(setup, monkeypatch):
    params, x = setup
    _set_fold(monkeypatch, 0)
    ref_out, ref_aux = nsa_prefill(params, x, CFG)
    _set_fold(monkeypatch, 1)
    out, aux = nsa_prefill(params, x, CFG)
    assert jnp.allclose(out, ref_out, atol=1e-5, rtol=1e-5)
    assert jnp.allclose(aux["gates"], ref_aux["gates"], atol=1e-6, rtol=1e-6)
    assert jnp.array_equal(aux["sel_idx"], ref_aux["sel_idx"])


def test_fold_grads_match_unfused(setup, monkeypatch):
    params, x = setup
    _set_fold(monkeypatch, 0)
    ref = _grads(params, x, CFG)
    _set_fold(monkeypatch, 1)
    got = _grads(params, x, CFG)
    _tree_allclose(got, ref, atol=2e-4, rtol=2e-3)


def test_fold_grads_match_with_collapsed_gates(setup, monkeypatch):
    """Near-collapsed gates (g ~ 1e-22 for two branches): the D-form path
    must stay finite and equal the standard autodiff combine — the naive
    dg = D/g recovery would be 0/0 here."""
    params, x = setup
    params = jax.tree_util.tree_map(lambda v: v, params)
    params["gate"] = dict(params["gate"])
    params["gate"]["b2"] = jnp.asarray([50.0, 0.0, 0.0], jnp.float32)
    _set_fold(monkeypatch, 0)
    ref = _grads(params, x, CFG)
    _set_fold(monkeypatch, 1)
    got = _grads(params, x, CFG)
    for leaf in jax.tree_util.tree_leaves(got):
        assert jnp.all(jnp.isfinite(leaf))
    _tree_allclose(got, ref, atol=2e-4, rtol=2e-3)


def test_fold_grads_match_unfused_varlen(setup, monkeypatch):
    params, x = setup
    B, S = x.shape[:2]
    # two docs per row, l_sel-aligned starts
    seq_start = jnp.where(jnp.arange(S) < 8, 0, 8)[None, :].repeat(B, 0)
    _set_fold(monkeypatch, 0)
    ref = _grads(params, x, CFG, seq_start)
    _set_fold(monkeypatch, 1)
    got = _grads(params, x, CFG, seq_start)
    _tree_allclose(got, ref, atol=2e-4, rtol=2e-3)


def test_fold_grads_match_nonfused_scorer_path(setup, monkeypatch):
    """When the fused scorer is VMEM-gated off, the standalone cmp branch
    takes the gated _flash_vjp_gated path — same parity must hold."""
    from nsa_vibe_tpu.ops.pallas import scorer as scorer_mod

    params, x = setup
    monkeypatch.setattr(scorer_mod, "scorer_fits_vmem",
                        lambda *a, **k: False)
    _set_fold(monkeypatch, 0)
    ref = _grads(params, x, CFG)
    _set_fold(monkeypatch, 1)
    got = _grads(params, x, CFG)
    _tree_allclose(got, ref, atol=2e-4, rtol=2e-3)


def test_fold_force_branch_keeps_standard_combine(setup, monkeypatch):
    """Force overrides bypass the fold (constant gates): outputs match
    the unfused path bit-for-bit."""
    params, x = setup
    cfg = CFG.replace(force_branch="win")
    _set_fold(monkeypatch, 1)
    out, _ = nsa_prefill(params, x, cfg)
    _set_fold(monkeypatch, 0)
    ref_out, _ = nsa_prefill(params, x, cfg)
    assert jnp.array_equal(out, ref_out)


def test_softmax_dform_pairs_to_exact_softmax_grad():
    """Unit check of the paired-vjp identity: for out = sum g_k*c_k with
    g = softmax(z), grad via (_softmax_dform + D cotangents) equals plain
    autodiff."""
    from nsa_vibe_tpu.core.gate import _softmax_dform

    key = jax.random.PRNGKey(2)
    z = jax.random.normal(key, (5, 3), jnp.float32) * 3
    c = jax.random.normal(jax.random.PRNGKey(3), (5, 3, 7), jnp.float32)
    dO = jax.random.normal(jax.random.PRNGKey(4), (5, 7), jnp.float32)

    def loss_plain(z):
        g = jax.nn.softmax(z, axis=-1)
        out = jnp.einsum("bk,bkd->bd", g, c)
        return jnp.sum(out * dO)

    def loss_dform(z):
        g = _softmax_dform(z)

        # gated "branch": emits g*c with the D-form cotangent for g —
        # mirrors the gated kernel vjps (ops.attention)
        @jax.custom_vjp
        def gated(gk, ck):
            return gk[:, None] * ck

        def fwd(gk, ck):
            Y = gk[:, None] * ck
            return Y, (gk, ck, Y)

        def bwd(res, dY):
            gk, ck, Y = res
            D = jnp.sum(dY * Y, axis=-1)          # = g*dg, no division
            return D, gk[:, None] * dY

        gated.defvjp(fwd, bwd)
        out = sum(gated(g[:, k], c[:, k]) for k in range(3))
        return jnp.sum(out * dO)

    g_plain = jax.grad(loss_plain)(z)
    g_dform = jax.grad(loss_dform)(z)
    assert jnp.allclose(g_plain, g_dform, atol=1e-5, rtol=1e-5)


def _set_fold_flat(monkeypatch, fold: int, flat: int):
    base = dict(tuning._load())
    base["nsa.gate_fold"] = fold
    base["nsa.flat_io"] = flat
    monkeypatch.setattr(tuning, "_load", lambda: base)


def test_flat_io_forward_and_grads_match(setup, monkeypatch):
    """flat-IO (kernels emit the unpadded [B,S,H*Dv] layout): values and
    gradients match the unfused 5-D path."""
    params, x = setup
    _set_fold_flat(monkeypatch, 0, 0)
    ref_out, _ = nsa_prefill(params, x, CFG)
    ref = _grads(params, x, CFG)
    _set_fold_flat(monkeypatch, 1, 1)
    out, aux = nsa_prefill(params, x, CFG)
    got = _grads(params, x, CFG)
    assert out.shape == ref_out.shape
    assert jnp.allclose(out, ref_out, atol=1e-5, rtol=1e-5)
    _tree_allclose(got, ref, atol=2e-4, rtol=2e-3)


def test_flat_io_varlen_grads_match(setup, monkeypatch):
    params, x = setup
    B, S = x.shape[:2]
    seq_start = jnp.where(jnp.arange(S) < 8, 0, 8)[None, :].repeat(B, 0)
    _set_fold_flat(monkeypatch, 0, 0)
    ref = _grads(params, x, CFG, seq_start)
    _set_fold_flat(monkeypatch, 1, 1)
    got = _grads(params, x, CFG, seq_start)
    _tree_allclose(got, ref, atol=2e-4, rtol=2e-3)


def test_flat_io_odd_h_falls_back(monkeypatch):
    """Odd heads-per-group (pad-head path) disables flat-IO but keeps the
    fold; output still matches the unfused path."""
    cfg = CFG.replace(n_heads=6, n_kv_groups=2)   # h = 3
    params = init_nsa_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, cfg.dim)) * 0.5
    _set_fold_flat(monkeypatch, 0, 0)
    ref_out, _ = nsa_prefill(params, x, cfg)
    _set_fold_flat(monkeypatch, 1, 1)
    out, _ = nsa_prefill(params, x, cfg)
    assert jnp.allclose(out, ref_out, atol=1e-5, rtol=1e-5)
