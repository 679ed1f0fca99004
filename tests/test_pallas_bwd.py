"""Analytical Pallas backward kernels vs reference autodiff gradients
(interpret mode). Coverage model: the reference's gradcheck suites
(test_gradcheck_cpu.py, test_selection_backward_*.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsa_vibe_tpu.ops import attention as attn
from nsa_vibe_tpu.ops import reference as ref
from nsa_vibe_tpu.ops.block_index import num_cmp_blocks
from nsa_vibe_tpu.ops.selection import select_topn_blocks

ATOL = 2e-4


def _rand(*shape):
    return jnp.asarray(np.random.randn(*shape), jnp.float32)


def _grads(loss_fn, *args):
    return jax.grad(loss_fn, argnums=tuple(range(len(args))))(*args)


def _compare(g1, g2, atol=ATOL):
    for a, b, name in zip(g1, g2, ("dQ", "dK", "dV")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol,
                                   err_msg=name)


@pytest.mark.parametrize("S,w", [(64, 16), (100, 32), (32, 256)])
def test_win_backward(S, w):
    B, G, h, Dk, Dv = 1, 2, 2, 32, 32
    Q, K, V = _rand(B, S, G, h, Dk), _rand(B, G, S, Dk), _rand(B, G, S, Dv)
    t = jnp.arange(S, dtype=jnp.int32)
    co = _rand(B, S, G, h, Dv)  # random cotangent direction

    def loss_pl(q, k, v):
        return jnp.sum(attn.sliding_window_attention(q, k, v, t, w, 0.2, kernel="pallas") * co)

    def loss_ref(q, k, v):
        return jnp.sum(ref.sliding_window_attention(q, k, v, t, w, 0.2) * co)

    _compare(_grads(loss_pl, Q, K, V), _grads(loss_ref, Q, K, V))


@pytest.mark.parametrize("S,l,d", [(64, 8, 4), (100, 16, 8), (48, 32, 16)])
def test_cmp_backward(S, l, d):
    B, G, h, Dk, Dv = 1, 2, 2, 32, 32
    S_cmp = (S - l) // d + 1
    Q = _rand(B, S, G, h, Dk)
    Kc, Vc = _rand(B, G, S_cmp, Dk), _rand(B, G, S_cmp, Dv)
    nct = jnp.asarray(np.minimum(num_cmp_blocks(np.arange(1, S + 1), l, d), S_cmp),
                      jnp.int32)
    co = _rand(B, S, G, h, Dv)

    def loss_pl(q, k, v):
        return jnp.sum(attn.compressed_attention(q, k, v, nct, l, d, 0.2, kernel="pallas") * co)

    def loss_ref(q, k, v):
        return jnp.sum(ref.compressed_attention(q, k, v, nct, 0.2) * co)

    _compare(_grads(loss_pl, Q, Kc, Vc), _grads(loss_ref, Q, Kc, Vc))


@pytest.mark.parametrize("S,l_sel,n_top", [(64, 8, 4), (128, 16, 5)])
def test_sel_backward(S, l_sel, n_top):
    B, G, h, Dk, Dv = 1, 2, 2, 32, 32
    Q, K, V = _rand(B, S, G, h, Dk), _rand(B, G, S, Dk), _rand(B, G, S, Dv)
    t = jnp.arange(S, dtype=jnp.int32)
    S_sel = (S + l_sel - 1) // l_sel
    sel = select_topn_blocks(jnp.asarray(np.random.rand(B, S, G, S_sel), jnp.float32),
                             n_top, t, l_sel)
    co = _rand(B, S, G, h, Dv)

    def loss_pl(q, k, v):
        return jnp.sum(attn.selection_attention(q, k, v, sel, t, l_sel, 0.2, kernel="pallas") * co)

    def loss_ref(q, k, v):
        return jnp.sum(ref.selection_attention(q, k, v, sel, t, l_sel, 0.2) * co)

    _compare(_grads(loss_pl, Q, K, V), _grads(loss_ref, Q, K, V))


def test_sel_backward_unselected_blocks_zero_grad():
    # K/V rows in never-selected blocks must receive exactly zero gradient
    B, G, h, D, S = 1, 1, 2, 16, 64
    l_sel = 8
    Q, K, V = _rand(B, S, G, h, D), _rand(B, G, S, D), _rand(B, G, S, D)
    t = jnp.arange(S, dtype=jnp.int32)
    # force selection to blocks {0, last, last-1} only (n_top == n_forced)
    sel = select_topn_blocks(jnp.zeros((B, S, G, 8), jnp.float32), 3, t, l_sel)

    def loss(k):
        return jnp.sum(attn.selection_attention(Q, k, V, sel, t, l_sel, 0.25,
                                                kernel="pallas") ** 2)

    dk = np.asarray(jax.grad(loss)(K))
    sel_np = np.asarray(sel)
    ever = set(sel_np[sel_np >= 0].tolist())
    for j in range(8):
        blk = dk[:, :, j * l_sel : (j + 1) * l_sel]
        if j not in ever:
            assert np.abs(blk).max() == 0.0, f"block {j} should have zero grad"


def test_win_backward_bf16_tolerance():
    B, G, h, Dk, S, w = 1, 1, 2, 32, 64, 16
    Q = _rand(B, S, G, h, Dk).astype(jnp.bfloat16)
    K = _rand(B, G, S, Dk).astype(jnp.bfloat16)
    V = _rand(B, G, S, Dk).astype(jnp.bfloat16)
    t = jnp.arange(S, dtype=jnp.int32)

    def loss_pl(q, k, v):
        o = attn.sliding_window_attention(q, k, v, t, w, 0.2, kernel="pallas")
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        o = ref.sliding_window_attention(q, k, v, t, w, 0.2)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    g1 = _grads(loss_pl, Q, K, V)
    g2 = _grads(loss_ref, Q, K, V)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a, np.float32), np.asarray(b, np.float32),
                                   atol=0.05, rtol=0.02)


def test_onepass_backward_matches_twopass():
    """One-pass (kv-major, ring dq scratch) backward == two-pass dq+dkv
    kernels, across modes / offsets / varlen / tile sizes incl ring wrap."""
    from nsa_vibe_tpu.ops.pallas.flash import flash_banded, stats_rows
    from nsa_vibe_tpu.ops.pallas.flash_bwd import (
        flash_banded_bwd,
        flash_banded_bwd_onepass,
    )

    def check(mode, kw, S=96, S_kv=None, t0=None, ds=None, bq=16, bk=16):
        B, G, h, Dk = 2, 2, 2, 32
        S_kv = S_kv if S_kv is not None else S
        Q = jax.random.normal(jax.random.PRNGKey(0), (B, S, G, h, Dk))
        K = jax.random.normal(jax.random.PRNGKey(1), (B, G, S_kv, Dk))
        V = jax.random.normal(jax.random.PRNGKey(2), (B, G, S_kv, Dk))
        dO = jax.random.normal(jax.random.PRNGKey(3), (B, S, G, h, Dk))
        O, lse = flash_banded(Q, K, V, mode=mode, scale=0.2, return_lse=True,
                              interpret=True, t_start=t0, seq_start=ds, **kw)
        d0 = jnp.sum(dO * O, axis=-1)
        flat = d0.transpose(0, 2, 1, 3).reshape(B * G, 1, S * h)
        pad = stats_rows(S, h) - S * h
        if pad:
            flat = jnp.pad(flat, ((0, 0), (0, 0), (0, pad)))
        args = (Q, K, V, dO, lse, flat)
        kw2 = dict(mode=mode, scale=0.2, interpret=True, t_start=t0,
                   seq_start=ds, block_q=bq, block_k=bk, **kw)
        for x, y in zip(flash_banded_bwd(*args, **kw2),
                        flash_banded_bwd_onepass(*args, **kw2)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)

    check("win", dict(w=16))
    check("win", dict(w=48), bq=8, bk=16)   # ring wraps (nslots < nq)
    check("cmp", dict(l=8, d=4), S_kv=(96 - 8) // 4 + 1)
    check("win", dict(w=16), t0=jnp.asarray([32], jnp.int32), S_kv=128)
    ds = jnp.zeros((2, 96), jnp.int32).at[:, 48:].set(48)
    check("win", dict(w=16), ds=ds)
    check("cmp", dict(l=8, d=4), S_kv=(96 - 8) // 4 + 1, ds=ds)
    check("cmp", dict(l=32, d=4), S_kv=(96 - 32) // 4 + 1, bq=16)  # fallback path


def test_sel_onepass_backward_matches_twopass():
    from nsa_vibe_tpu.ops.pallas.flash import stats_rows
    from nsa_vibe_tpu.ops.pallas.sel_flash import (
        selection_flash_bwd,
        selection_flash_bwd_onepass,
        selection_flash_pallas,
    )
    from nsa_vibe_tpu.ops.selection import select_topn_blocks

    B, S, G, h, Dk, l_sel, n = 2, 96, 2, 2, 32, 16, 4
    Q = jax.random.normal(jax.random.PRNGKey(0), (B, S, G, h, Dk))
    K = jax.random.normal(jax.random.PRNGKey(1), (B, G, S, Dk))
    V = jax.random.normal(jax.random.PRNGKey(2), (B, G, S, Dk))
    dO = jax.random.normal(jax.random.PRNGKey(3), (B, S, G, h, Dk))
    sel = select_topn_blocks(
        jax.random.uniform(jax.random.PRNGKey(4), (B, S, G, S // l_sel)),
        n, jnp.arange(S, dtype=jnp.int32), l_sel)
    for bq, kb, off in ((16, 2, 0), (32, 3, 0), (16, 2, 32)):
        Sq = S - off
        O, lse = selection_flash_pallas(
            Q[:, off:], K, V, sel[:, off:], l_sel=l_sel, scale=0.2,
            pos_offset=off, return_lse=True, interpret=True, block_q=bq,
            kv_batch=kb)
        d0 = jnp.sum(dO[:, off:] * O, axis=-1)
        flat = d0.transpose(0, 2, 1, 3).reshape(B * G, 1, Sq * h)
        pad = stats_rows(Sq, h) - Sq * h
        if pad:
            flat = jnp.pad(flat, ((0, 0), (0, 0), (0, pad)))
        args = (Q[:, off:], K, V, sel[:, off:], dO[:, off:], lse, flat)
        kw = dict(l_sel=l_sel, scale=0.2, pos_offset=off, block_q=bq,
                  kv_batch=kb, interpret=True)
        for x, y in zip(selection_flash_bwd(*args, **kw),
                        selection_flash_bwd_onepass(*args, **kw)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)
