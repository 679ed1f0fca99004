"""Sampling surface (utils.sampling + generate wiring): greedy limits,
top-k / nucleus support sets, and model-level equivalence of the scan
and per-token generators under forced-greedy sampling settings."""

import jax
import jax.numpy as jnp
import numpy as np

from nsa_vibe_tpu.utils.sampling import sample_logits

LOGITS = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))  # [1, 4]


def _draws(n, **kw):
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    return np.asarray(jax.vmap(
        lambda k: sample_logits(k, LOGITS[0], **kw))(keys))


def test_temperature_zero_is_argmax():
    ids = sample_logits(jax.random.PRNGKey(0), LOGITS, temperature=0.0)
    assert int(ids[0]) == 0


def test_top_k_one_is_greedy():
    assert set(_draws(64, temperature=1.0, top_k=1).tolist()) == {0}


def test_tiny_top_p_is_greedy():
    assert set(_draws(64, temperature=1.0, top_p=1e-6).tolist()) == {0}


def test_top_k_support_set():
    assert set(_draws(256, temperature=1.0, top_k=2).tolist()) <= {0, 1}


def test_top_p_support_set():
    # exclusive cumulative mass: token0 0.0, token1 0.5, token2 0.8 —
    # top_p=0.8 keeps tokens {0, 1} only
    draws = set(_draws(256, temperature=1.0, top_p=0.8).tolist())
    assert draws <= {0, 1} and 1 in draws


def test_full_top_p_matches_plain_categorical():
    k = jax.random.PRNGKey(3)
    a = sample_logits(k, LOGITS, temperature=1.0, top_p=1.0)
    b = jax.random.categorical(k, LOGITS.astype(jnp.float32))
    assert int(a[0]) == int(b[0])


def test_generate_top_k1_matches_greedy():
    from nsa_vibe_tpu.core.config import ModelConfig, NSAConfig
    from nsa_vibe_tpu.models.tinylm import generate_scan, init_model_params

    nsa = NSAConfig(dim=64, n_heads=4, n_kv_groups=2, d_k=16, d_v=16,
                    l=8, d=4, l_sel=8, n_sel=3, w=16)
    mcfg = ModelConfig(vocab_size=64, n_layers=2, nsa=nsa, dtype="float32")
    params = init_model_params(jax.random.PRNGKey(0), mcfg, jnp.float32)
    prompt = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]], jnp.int32)
    greedy = generate_scan(params, prompt, 8, mcfg, temperature=0.0)
    topk1 = generate_scan(params, prompt, 8, mcfg, temperature=0.7,
                          key=jax.random.PRNGKey(1), top_k=1)
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(topk1))


def test_generate_ragged_matches_per_row_greedy():
    """Ragged batch (prompt lengths 3/8/14) greedy-decodes each row
    exactly as that row decodes alone — padding never leaks into any
    row's attention, and each row's outputs start at its own length."""
    from nsa_vibe_tpu.core.config import ModelConfig, NSAConfig
    from nsa_vibe_tpu.models.tinylm import (
        generate_ragged,
        generate_scan,
        init_model_params,
    )

    nsa = NSAConfig(dim=64, n_heads=4, n_kv_groups=2, d_k=16, d_v=16,
                    l=8, d=4, l_sel=8, n_sel=3, w=16)
    mcfg = ModelConfig(vocab_size=64, n_layers=2, nsa=nsa, dtype="float32")
    params = init_model_params(jax.random.PRNGKey(0), mcfg, jnp.float32)
    lens = [3, 8, 14]
    L = max(lens)
    rng = np.random.default_rng(0)
    prompts = np.zeros((len(lens), L), np.int32)
    for i, ln in enumerate(lens):
        prompts[i, :ln] = rng.integers(1, 64, ln)
    n_new = 6
    got = generate_ragged(params, jnp.asarray(prompts),
                          jnp.asarray(lens, jnp.int32), n_new, mcfg)
    for i, ln in enumerate(lens):
        solo = generate_scan(params, jnp.asarray(prompts[i : i + 1, :ln]),
                             n_new, mcfg, temperature=0.0)
        np.testing.assert_array_equal(
            np.asarray(got[i]), np.asarray(solo[0, ln:]), err_msg=f"row {i}")
