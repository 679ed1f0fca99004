"""Flax Linen wrapper parity with the functional core."""

import jax
import jax.numpy as jnp
import pytest

flax = pytest.importorskip("flax")

from nsa_vibe_tpu.core.config import ModelConfig, NSAConfig  # noqa: E402
from nsa_vibe_tpu.core.nsa import init_nsa_params, nsa_prefill  # noqa: E402
from nsa_vibe_tpu.models.flax_module import LlamaBlockNSA, NSAAttention  # noqa: E402

CFG = NSAConfig(dim=64, n_heads=4, n_kv_groups=2, d_k=16, d_v=16,
                l=8, d=4, l_sel=16, n_sel=4, w=16, kernel="reference")


def test_flax_attention_matches_functional():
    mod = NSAAttention(cfg=CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, CFG.dim))
    variables = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(variables, x)

    # same init key -> same params -> same output as the functional API
    params = init_nsa_params(jax.random.PRNGKey(0), CFG)
    want, _ = nsa_prefill(params, x, CFG)
    # flax folds the RNG differently; compare via the module's own params
    y2, _ = nsa_prefill(variables["params"]["nsa"], x, CFG)
    assert jnp.abs(y - y2).max() == 0
    assert y.shape == want.shape


def test_flax_block_trains():
    mcfg = ModelConfig(vocab_size=256, n_layers=1, nsa=CFG)
    mod = LlamaBlockNSA(mcfg=mcfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, CFG.dim))
    variables = mod.init(jax.random.PRNGKey(0), x)

    def loss(v):
        return jnp.mean(mod.apply(v, x).astype(jnp.float32) ** 2)

    g = jax.grad(loss)(variables)
    leaves = jax.tree_util.tree_leaves(g)
    assert leaves and all(jnp.isfinite(leaf).all() for leaf in leaves)
