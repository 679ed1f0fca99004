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


def test_model_decode_step_ragged_matches_uniform():
    """Model-level ragged decode (per-layer caches at per-row depths):
    admitted rows at different depths step exactly like each row alone."""
    from nsa_vibe_tpu.core.config import ModelConfig, NSAConfig
    from nsa_vibe_tpu.models.tinylm import (
        init_model_params,
        model_decode_step,
        model_decode_step_ragged,
        model_prefill_with_caches,
    )

    nsa = NSAConfig(dim=64, n_heads=4, n_kv_groups=2, d_k=16, d_v=16,
                    l=8, d=4, l_sel=8, n_sel=3, w=16)
    mcfg = ModelConfig(vocab_size=64, n_layers=2, nsa=nsa, dtype="float32")
    params = init_model_params(jax.random.PRNGKey(0), mcfg, jnp.float32)
    C = 64
    depths = [7, 30]
    rng = np.random.default_rng(0)
    # per-row solo prefill at each depth
    solo = []
    for t in depths:
        toks = jnp.asarray(rng.integers(1, 64, (1, t)), jnp.int32)
        _, caches = jax.jit(
            lambda p, tk: model_prefill_with_caches(p, tk, mcfg, C)
        )(params, toks)
        solo.append(caches)
    # stitch into one ragged batch (per layer: concat rows, t vector)
    ragged = []
    for li in range(mcfg.n_layers):
        rows = [solo[i][li] for i in range(len(depths))]
        ragged.append(type(rows[0])(*[
            jnp.concatenate([getattr(r, f) for r in rows], axis=0)
            for f in rows[0]._fields[:-1]
        ], t=jnp.asarray(depths, jnp.int32)))

    step_r = jax.jit(
        lambda p, tk, cs: model_decode_step_ragged(p, tk, cs, mcfg))
    step_u = jax.jit(lambda p, tk, cs: model_decode_step(p, tk, cs, mcfg))
    toks_new = jnp.asarray(rng.integers(1, 64, (2, 3)), jnp.int32)
    for k in range(3):
        lg_r, ragged = step_r(params, toks_new[:, k : k + 1], ragged)
        for i in range(2):
            lg_u, solo[i] = step_u(params, toks_new[i : i + 1, k : k + 1], solo[i])
            mae = float(jnp.abs(lg_r[i : i + 1] - lg_u).max())
            assert mae < 2e-4, (k, i, mae)
    assert ragged[0].t.tolist() == [d + 3 for d in depths]
