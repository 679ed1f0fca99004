"""Diagonal-tiled win forward (ops/pallas/flash_diag.py) vs flash_banded.

The diag kernel replaces axis-aligned kv tiles with an exact band fetch
(KB 128-wide operands per q-tile) and a single-pass softmax; outputs must
match the online-softmax kernel to fp32 ulp. Also covers the backward
path: the dispatch flag only reroutes the FORWARD — lse stays in the flat
stats layout, so the one-pass backward consumes it unchanged.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nsa_vibe_tpu.ops.pallas.flash import flash_banded
from nsa_vibe_tpu.ops.pallas.flash_diag import flash_banded_diag


def _mk(B, S, G, h, Dk, Dv, S_kv, seed=0):
    rng = np.random.default_rng(seed)
    Q = jnp.asarray(rng.normal(size=(B, S, G, h, Dk)), jnp.float32)
    K = jnp.asarray(rng.normal(size=(B, G, S_kv, Dk)), jnp.float32)
    V = jnp.asarray(rng.normal(size=(B, G, S_kv, Dv)), jnp.float32)
    return Q, K, V


@pytest.mark.parametrize("S,w,bq,t0,S_kv", [
    (256, 64, 128, 0, 256),
    (256, 512, 256, 0, 256),      # w > S: band covers the whole prefix
    (256, 64, 128, 512, 768),     # chunked prefill (t_start offset)
    (250, 64, 128, 0, 250),       # ragged S / S_kv (OOB zeroing path)
])
def test_diag_matches_flash(S, w, bq, t0, S_kv):
    B, G, h, Dk, Dv = 2, 2, 6, 64, 64
    Q, K, V = _mk(B, S, G, h, Dk, Dv, S_kv)
    scale = Dk ** -0.5
    O1, lse1 = flash_banded(Q, K, V, mode="win", w=w, scale=scale,
                            return_lse=True, interpret=True, t_start=t0,
                            fastpath=False)
    O2, lse2 = flash_banded_diag(Q, K, V, w=w, scale=scale, return_lse=True,
                                 interpret=True, block_q=bq, t_start=t0)
    np.testing.assert_allclose(np.asarray(O1), np.asarray(O2),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(lse1[:, :, :S * h]),
                               np.asarray(lse2[:, :, :S * h]),
                               atol=2e-5, rtol=2e-5)


def test_diag_varlen():
    B, S, G, h, Dk, Dv, w = 2, 256, 2, 4, 64, 64, 64
    Q, K, V = _mk(B, S, G, h, Dk, Dv, S, seed=3)
    scale = Dk ** -0.5
    rng = np.random.default_rng(7)
    starts = np.zeros((B, S), np.int32)
    for b in range(B):
        cuts = sorted(rng.choice(np.arange(16, S - 16), 3, replace=False))
        prev = 0
        for c in list(cuts) + [S]:
            starts[b, prev:c] = prev
            prev = c
    ds = jnp.asarray(starts)
    O1 = flash_banded(Q, K, V, mode="win", w=w, scale=scale, interpret=True,
                      seq_start=ds, fastpath=False)
    O2 = flash_banded_diag(Q, K, V, w=w, scale=scale, interpret=True,
                           block_q=128, seq_start=ds)
    np.testing.assert_allclose(np.asarray(O1), np.asarray(O2),
                               atol=2e-5, rtol=2e-5)


def test_diag_flag_gradcheck(monkeypatch):
    """With win.fwd_diag forced on, the win branch's custom_vjp (diag
    forward + one-pass backward) must match reference gradients."""
    from nsa_vibe_tpu.ops import reference as ref
    from nsa_vibe_tpu.ops import tuning
    from nsa_vibe_tpu.ops.attention import sliding_window_attention

    base = dict(tuning._load())
    base["win.fwd_diag"] = 1
    base["win.diag_block_q"] = 128
    monkeypatch.setattr(tuning, "_load", lambda: base)

    B, S, G, h, Dk, Dv, w = 1, 256, 1, 2, 64, 64, 64
    Q, K, V = _mk(B, S, G, h, Dk, Dv, S, seed=5)
    t_pos = jnp.arange(S, dtype=jnp.int32)
    scale = Dk ** -0.5

    def f_pallas(q, k, v):
        return (sliding_window_attention(q, k, v, t_pos, w, scale,
                                         kernel="pallas") ** 2).sum()

    def f_ref(q, k, v):
        return (ref.sliding_window_attention(q, k, v, t_pos, w, scale) ** 2).sum()

    g1 = jax.grad(f_pallas, argnums=(0, 1, 2))(Q, K, V)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(Q, K, V)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)


@pytest.mark.parametrize("S,w,bq,t0,S_kv", [
    (256, 64, 128, 0, 256),
    (256, 512, 128, 0, 256),      # w > S: band covers the whole prefix
    (256, 64, 128, 512, 768),     # chunked offset (t_start)
    (250, 64, 128, 0, 250),       # ragged S / S_kv (OOB sanitizing path)
])
def test_diag_bwd_matches_onepass(S, w, bq, t0, S_kv):
    """Diagonal backward == kv-major one-pass backward (dQ, dK, dV)."""
    from nsa_vibe_tpu.ops.pallas.flash import stats_rows
    from nsa_vibe_tpu.ops.pallas.flash_bwd import flash_banded_bwd_onepass
    from nsa_vibe_tpu.ops.pallas.flash_diag import flash_banded_bwd_diag

    B, G, h, Dk, Dv = 2, 2, 6, 64, 64
    Q, K, V = _mk(B, S, G, h, Dk, Dv, S_kv, seed=13)
    rng = np.random.default_rng(17)
    dO = jnp.asarray(rng.normal(size=(B, S, G, h, Dv)), jnp.float32)
    scale = Dk ** -0.5
    O, lse = flash_banded(Q, K, V, mode="win", w=w, scale=scale,
                          return_lse=True, interpret=True, t_start=t0,
                          fastpath=False)
    delta = jnp.sum(dO * O, axis=-1).transpose(0, 2, 1, 3).reshape(B * G, 1, S * h)
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, stats_rows(S, h) - S * h)))
    r1 = flash_banded_bwd_onepass(Q, K, V, dO, lse, delta, mode="win", w=w,
                                  scale=scale, block_q=128, block_k=256,
                                  interpret=True, t_start=t0, fastpath=False)
    r2 = flash_banded_bwd_diag(Q, K, V, dO, lse, delta, w=w, scale=scale,
                               block_q=bq, interpret=True, t_start=t0)
    for name, a, b in zip(("dQ", "dK", "dV"), r1, r2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=3e-5, err_msg=name)


def test_diag_bwd_varlen_matches_onepass():
    from nsa_vibe_tpu.ops.pallas.flash import stats_rows
    from nsa_vibe_tpu.ops.pallas.flash_bwd import flash_banded_bwd_onepass
    from nsa_vibe_tpu.ops.pallas.flash_diag import flash_banded_bwd_diag

    B, S, G, h, Dk, Dv, w = 2, 256, 2, 4, 64, 64, 64
    Q, K, V = _mk(B, S, G, h, Dk, Dv, S, seed=21)
    rng = np.random.default_rng(23)
    dO = jnp.asarray(rng.normal(size=(B, S, G, h, Dv)), jnp.float32)
    starts = np.zeros((B, S), np.int32)
    starts[0, 128:] = 128
    starts[1, 64:] = 64
    ds = jnp.asarray(starts)
    scale = Dk ** -0.5
    O, lse = flash_banded(Q, K, V, mode="win", w=w, scale=scale,
                          return_lse=True, interpret=True, seq_start=ds,
                          fastpath=False)
    delta = jnp.sum(dO * O, axis=-1).transpose(0, 2, 1, 3).reshape(B * G, 1, S * h)
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, stats_rows(S, h) - S * h)))
    r1 = flash_banded_bwd_onepass(Q, K, V, dO, lse, delta, mode="win", w=w,
                                  scale=scale, block_q=128, block_k=256,
                                  interpret=True, seq_start=ds,
                                  fastpath=False)
    r2 = flash_banded_bwd_diag(Q, K, V, dO, lse, delta, w=w, scale=scale,
                               block_q=128, interpret=True, seq_start=ds)
    for name, a, b in zip(("dQ", "dK", "dV"), r1, r2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=3e-5, err_msg=name)


def test_bwd_diag_flag_gradcheck(monkeypatch):
    """With win.bwd_diag forced on, the win branch custom_vjp gradients
    must match the reference."""
    from nsa_vibe_tpu.ops import reference as ref
    from nsa_vibe_tpu.ops import tuning
    from nsa_vibe_tpu.ops.attention import sliding_window_attention

    base = dict(tuning._load())
    base["win.bwd_diag"] = 1
    base["win.bwd_diag_block_q"] = 128
    monkeypatch.setattr(tuning, "_load", lambda: base)

    B, S, G, h, Dk, Dv, w = 1, 256, 1, 2, 64, 64, 64
    Q, K, V = _mk(B, S, G, h, Dk, Dv, S, seed=5)
    t_pos = jnp.arange(S, dtype=jnp.int32)
    scale = Dk ** -0.5

    def f_pallas(q, k, v):
        return (sliding_window_attention(q, k, v, t_pos, w, scale,
                                         kernel="pallas") ** 2).sum()

    def f_ref(q, k, v):
        return (ref.sliding_window_attention(q, k, v, t_pos, w, scale) ** 2).sum()

    g1 = jax.grad(f_pallas, argnums=(0, 1, 2))(Q, K, V)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(Q, K, V)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)
