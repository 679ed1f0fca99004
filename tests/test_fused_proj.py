"""Fused QKV projection (proj.fused): one [dim, H*Dk + 3G*(Dk+Dv)] matmul
vs seven separate matmuls. Output columns of a matmul are independent, so
the sliced fused product must match each per-branch projection exactly
(same contraction, same dtype) and gradients must match leaf-for-leaf."""

import jax
import jax.numpy as jnp
import numpy as np

from nsa_vibe_tpu.core.config import NSAConfig
from nsa_vibe_tpu.core.nsa import init_nsa_params, project_qkv

CFG = NSAConfig(dim=96, n_heads=4, n_kv_groups=2, d_k=24, d_v=16,
                l=8, d=4, l_sel=16, n_sel=4, w=32)


def _setup(dtype):
    params = init_nsa_params(jax.random.PRNGKey(0), CFG, dtype)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 40, CFG.dim), dtype)
    return params, x


def test_fused_proj_forward_matches():
    params, x = _setup(jnp.float32)
    a = project_qkv(params, x, CFG, fused=False)
    b = project_qkv(params, x, CFG, fused=True)
    assert len(a) == len(b) == 7
    for ua, ub in zip(a, b):
        assert ua.shape == ub.shape
        np.testing.assert_allclose(np.asarray(ua), np.asarray(ub),
                                   rtol=0, atol=1e-6)


def test_fused_proj_grads_match():
    params, x = _setup(jnp.float32)

    def loss(p, xx, fused):
        outs = project_qkv(p, xx, CFG, fused=fused)
        return sum(jnp.sum(o * (i + 1)) for i, o in enumerate(outs))

    ga = jax.grad(loss)(params, x, False)
    gb = jax.grad(loss)(params, x, True)
    for k in ("W_Q", "W_K_sel", "W_V_sel", "W_K_win", "W_V_win",
              "W_K_cmp", "W_V_cmp"):
        np.testing.assert_allclose(np.asarray(ga[k]), np.asarray(gb[k]),
                                   rtol=0, atol=1e-4, err_msg=k)


def test_fused_proj_bf16_close():
    params, x = _setup(jnp.bfloat16)
    a = project_qkv(params, x, CFG, fused=False)
    b = project_qkv(params, x, CFG, fused=True)
    for ua, ub in zip(a, b):
        np.testing.assert_allclose(
            np.asarray(ua, np.float32), np.asarray(ub, np.float32),
            rtol=0, atol=2e-2)
