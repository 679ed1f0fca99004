"""RoPE and ϕ-compression correctness."""

import jax
import jax.numpy as jnp
import numpy as np

from nsa_vibe_tpu.ops.compress import (
    avg_pool_phi,
    conv_phi,
    init_conv_phi_weight,
    pool_phi_rope_kv,
)
from nsa_vibe_tpu.ops.rope import apply_rope


def test_rope_preserves_norm_and_dtype():
    x = jnp.asarray(np.random.randn(2, 16, 64), jnp.float32)
    pos = jnp.arange(16)
    y = apply_rope(x, pos)
    assert y.dtype == x.dtype
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(x), axis=-1),
        np.linalg.norm(np.asarray(y), axis=-1),
        rtol=1e-5,
    )
    xb = x.astype(jnp.bfloat16)
    assert apply_rope(xb, pos).dtype == jnp.bfloat16


def test_rope_position_zero_identity():
    x = jnp.asarray(np.random.randn(1, 4, 32), jnp.float32)
    y = apply_rope(x, jnp.zeros(4, jnp.int32))
    np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_rope_relative_property():
    # <rope(q, m), rope(k, n)> depends only on (m - n)
    q = np.random.randn(64).astype(np.float32)
    k = np.random.randn(64).astype(np.float32)

    def dot(m, n):
        qm = apply_rope(jnp.asarray(q)[None, :], jnp.array([m]))
        kn = apply_rope(jnp.asarray(k)[None, :], jnp.array([n]))
        return float(jnp.sum(qm * kn))

    assert abs(dot(5, 3) - dot(102, 100)) < 1e-3


def test_rope_scale_long_context():
    # scale=2 at position 2p equals scale=1 at position p
    x = jnp.asarray(np.random.randn(1, 1, 64), jnp.float32)
    a = apply_rope(x, jnp.array([10]), scale=1.0)
    b = apply_rope(x, jnp.array([20]), scale=2.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def _avg_pool_oracle(x, l, d):
    S = x.shape[-2]
    if S < l:
        return x[..., :0, :]
    n = (S - l) // d + 1
    outs = [x[..., i * d : i * d + l, :].mean(axis=-2) for i in range(n)]
    return jnp.stack(outs, axis=-2)


def test_avg_pool_matches_windowed_oracle():
    for S in (32, 33, 47, 48, 128, 100):
        x = jnp.asarray(np.random.randn(2, 3, S, 8), jnp.float32)
        got = avg_pool_phi(x, 32, 16)
        want = _avg_pool_oracle(x, 32, 16)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_avg_pool_short_sequence_empty():
    x = jnp.ones((1, 1, 31, 8))
    assert avg_pool_phi(x, 32, 16).shape == (1, 1, 0, 8)


def test_conv_phi_equals_avg_at_init():
    # learnable ϕ initialized to 1/l coincides with average pooling
    # (reference test_phi_mlp_equiv.py)
    x = jnp.asarray(np.random.randn(2, 2, 96, 16), jnp.float32)
    w = init_conv_phi_weight(16, 32)
    got = conv_phi(x, w, 32, 16)
    want = avg_pool_phi(x, 32, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pool_phi_rope_applies_rope_before_pooling():
    K = jnp.asarray(np.random.randn(1, 1, 64, 32), jnp.float32)
    V = jnp.asarray(np.random.randn(1, 1, 64, 16), jnp.float32)
    K_cmp, V_cmp = pool_phi_rope_kv(K, V, 32, 16)
    K_roped = apply_rope(K, jnp.arange(64))
    np.testing.assert_allclose(
        np.asarray(K_cmp), np.asarray(avg_pool_phi(K_roped, 32, 16)), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(V_cmp), np.asarray(avg_pool_phi(V, 32, 16)), atol=1e-5
    )


def test_pool_phi_differentiable():
    K = jnp.asarray(np.random.randn(1, 1, 64, 8), jnp.float32)
    V = jnp.asarray(np.random.randn(1, 1, 64, 8), jnp.float32)

    def loss(k):
        kc, vc = pool_phi_rope_kv(k, V, 32, 16)
        return jnp.sum(kc**2)

    g = jax.grad(loss)(K)
    assert np.isfinite(np.asarray(g)).all()
