"""Sequential (via-decode) prefill parity with batched prefill.

Reference contract: sequential and batched prefill agree
(test_batched_parity.py; the reference needed MAE<=0.2 because its
batched path embedded the SURVEY.md §2.6 quirks — ours agree to fp32
noise because both paths implement the intended math).
"""

import jax
import jax.numpy as jnp

from nsa_vibe_tpu.core.cache import init_cache
from nsa_vibe_tpu.core.config import NSAConfig
from nsa_vibe_tpu.core.decode import nsa_prefill_via_decode
from nsa_vibe_tpu.core.nsa import init_nsa_params, nsa_prefill

CFG = NSAConfig(dim=64, n_heads=4, n_kv_groups=2, d_k=32, d_v=32,
                l=8, d=4, l_sel=16, n_sel=4, w=16, kernel="reference")


def test_via_decode_matches_batched_prefill():
    S = 48
    params = init_nsa_params(jax.random.PRNGKey(0), CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, S, CFG.dim))

    out_b, _ = jax.jit(lambda p, x: nsa_prefill(p, x, CFG))(params, x)
    cache = init_cache(CFG, 2, capacity=64)
    out_s, cache = jax.jit(
        lambda p, x, c: nsa_prefill_via_decode(p, x, c, CFG)
    )(params, x, cache)

    mae = float(jnp.abs(out_b - out_s).mean())
    assert mae < 2e-5, f"batched vs via-decode MAE {mae}"
    assert int(cache.t) == S


def test_via_decode_incremental_continuation():
    """Prefill the first half batched, the second half via decode-scan on
    the seeded cache; outputs must match a full batched prefill."""
    from nsa_vibe_tpu.core.cache import cache_from_prefill

    S, S1 = 48, 24
    params = init_nsa_params(jax.random.PRNGKey(0), CFG)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, S, CFG.dim))

    out_full, _ = jax.jit(lambda p, x: nsa_prefill(p, x, CFG))(params, x)
    _, aux1 = jax.jit(lambda p, x: nsa_prefill(p, x, CFG))(params, x[:, :S1])
    cache = cache_from_prefill(CFG, aux1, capacity=64)
    out_2, cache = jax.jit(
        lambda p, x, c: nsa_prefill_via_decode(p, x, c, CFG)
    )(params, x[:, S1:], cache)

    mae = float(jnp.abs(out_full[:, S1:] - out_2).mean())
    assert mae < 2e-5, f"incremental continuation MAE {mae}"
    assert int(cache.t) == S
