"""Numerical gradient checks on the NSA forward (per branch + combined).

Reference: nsa/tests/test_gradcheck_cpu.py:10-51 — torch.autograd.gradcheck
in fp64 per branch. JAX equivalent: jax.test_util.check_grads (numerical
vs reverse-mode) on tiny shapes; selection indices are stop-gradient'd by
design, so the sel branch checks grads through the gathered attention
only — matching the reference, whose top-k is likewise non-differentiable.
"""

import jax
import jax.numpy as jnp
import pytest
from jax.test_util import check_grads

from nsa_vibe_tpu.core.config import NSAConfig
from nsa_vibe_tpu.core.nsa import init_nsa_params, nsa_prefill

CFG = NSAConfig(dim=32, n_heads=2, n_kv_groups=1, d_k=8, d_v=8,
                l=4, d=2, l_sel=8, n_sel=3, w=8, kernel="reference")


def _loss_fn(branch):
    cfg = CFG.replace(force_branch=branch)

    def loss(params, x):
        out, _ = nsa_prefill(params, x, cfg)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    return loss


@pytest.mark.parametrize("branch", ["cmp", "sel", "win", None])
def test_gradcheck_branches(branch):
    params = init_nsa_params(jax.random.PRNGKey(0), CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 12, CFG.dim)) * 0.5
    check_grads(_loss_fn(branch), (params, x), order=1, modes=["rev"],
                atol=5e-2, rtol=5e-2)


def test_gradcheck_conv_phi():
    cfg = CFG.replace(phi="conv")
    params = init_nsa_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 12, cfg.dim)) * 0.5

    def loss(params, x):
        out, _ = nsa_prefill(params, x, cfg)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    check_grads(loss, (params, x), order=1, modes=["rev"], atol=5e-2, rtol=5e-2)
