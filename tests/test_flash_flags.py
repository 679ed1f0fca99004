"""Flash-kernel micro-op flags (ops/tuning.py flash.*):

  * fastpath — scalar-branched unmasked body for fully-live tile pairs.
    Must be BIT-IDENTICAL to the masked path (the band select and OOB
    zeroing are no-ops on fully-live tiles).
  * scale_on_q — scale*LOG2E folded into the [rows,Dk] Q operand instead
    of the [rows,block_k] logits. Last-ulp numeric change only.

Block sizes are chosen so the band genuinely straddles tiles (some
fully-live, some partial) — exercising both branches of the fastpath.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsa_vibe_tpu.ops.pallas.flash import flash_banded
from nsa_vibe_tpu.ops.pallas.flash_bwd import (
    flash_banded_bwd,
    flash_banded_bwd_onepass,
)

B, S, G, h, Dk, Dv = 2, 256, 2, 2, 32, 32
W, L, D = 64, 16, 8


@pytest.fixture(scope="module")
def data():
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    Q = jax.random.normal(ks[0], (B, S, G, h, Dk), jnp.float32)
    K = jax.random.normal(ks[1], (B, G, S, Dk), jnp.float32)
    V = jax.random.normal(ks[2], (B, G, S, Dv), jnp.float32)
    dO = jax.random.normal(ks[3], (B, S, G, h, Dv), jnp.float32)
    return Q, K, V, dO


def _fwd(data, mode, **kw):
    Q, K, V, _ = data
    kv = dict(w=W) if mode == "win" else dict(l=L, d=D)
    return flash_banded(Q, K, V, mode=mode, scale=0.3, block_q=64, block_k=32,
                        interpret=True, return_lse=True, **kv, **kw)


@pytest.mark.parametrize("mode", ["win", "cmp"])
def test_fastpath_bit_identical_fwd(data, mode):
    o_fast, lse_fast = _fwd(data, mode, fastpath=True, scale_on_q=False)
    o_slow, lse_slow = _fwd(data, mode, fastpath=False, scale_on_q=False)
    np.testing.assert_array_equal(np.asarray(o_fast), np.asarray(o_slow))
    np.testing.assert_array_equal(np.asarray(lse_fast), np.asarray(lse_slow))


@pytest.mark.parametrize("mode", ["win", "cmp"])
def test_scale_on_q_last_ulp_fwd(data, mode):
    o_a, _ = _fwd(data, mode, scale_on_q=True)
    o_b, _ = _fwd(data, mode, scale_on_q=False)
    np.testing.assert_allclose(np.asarray(o_a), np.asarray(o_b),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("mode", ["win", "cmp"])
def test_fastpath_bit_identical_onepass_bwd(data, mode):
    Q, K, V, dO = data
    o, lse = _fwd(data, mode, fastpath=True, scale_on_q=False)
    delta = jnp.einsum("bsghv,bsghv->bsgh", dO, o)
    from nsa_vibe_tpu.ops.pallas.flash import stats_rows
    rows = stats_rows(S, h)
    dflat = jnp.zeros((B * G, 1, rows), jnp.float32)
    didx = (jnp.arange(S)[:, None] * h + jnp.arange(h)[None, :]).reshape(-1)
    for b in range(B):
        for g in range(G):
            dflat = dflat.at[b * G + g, 0, didx].set(
                delta[b, :, g, :].reshape(-1))
    kv = dict(w=W) if mode == "win" else dict(l=L, d=D)
    bwd = functools.partial(
        flash_banded_bwd_onepass, Q, K, V, dO, lse, dflat,
        mode=mode, scale=0.3, block_q=64, block_k=32, interpret=True, **kv)
    outs_fast = bwd(fastpath=True, scale_on_q=False)
    outs_slow = bwd(fastpath=False, scale_on_q=False)
    for a, b_ in zip(outs_fast, outs_slow):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
    # two-pass backward with scale_on_q both ways agrees within tolerance
    tp_a = flash_banded_bwd(Q, K, V, dO, lse, dflat, mode=mode, scale=0.3,
                            block_q=64, block_k=32, interpret=True,
                            scale_on_q=True, **kv)
    tp_b = flash_banded_bwd(Q, K, V, dO, lse, dflat, mode=mode, scale=0.3,
                            block_q=64, block_k=32, interpret=True,
                            scale_on_q=False, **kv)
    for a, b_ in zip(tp_a, tp_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-5, rtol=1e-4)


def test_fastpath_bit_identical_varlen(data):
    """Document-masked rows must take the slow path at boundaries and the
    fast path inside long documents — outputs identical either way."""
    Q, K, V, _ = data
    starts = np.zeros((B, S), np.int32)
    starts[:, 128:] = 128  # two docs, l_sel-aligned
    seq_start = jnp.asarray(starts)
    out = {}
    for fp in (True, False):
        out[fp] = flash_banded(Q, K, V, mode="win", w=W, scale=0.3,
                               block_q=64, block_k=32, interpret=True,
                               seq_start=seq_start, fastpath=fp,
                               scale_on_q=False)
    np.testing.assert_array_equal(np.asarray(out[True]), np.asarray(out[False]))
