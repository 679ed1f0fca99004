"""Seeded shape-fuzz: random configs through prefill (reference +
pallas-interpret parity) and decode parity.

The deterministic parametrized suites pin the shapes the kernels were
designed around; this sweep guards the long tail (S < l so no compressed
tokens exist, S=1, S not divisible by l_sel/d/block_q, window larger
than the sequence, odd heads-per-group, B=1) with one invariant set:

  * reference forward is finite; gates sum to 1
  * pallas (interpret) forward matches the reference oracle
  * selection indices are causal (block * l_sel <= t) or -1 padding

Seeds are fixed — failures reproduce exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import pytest

from nsa_vibe_tpu.core.config import NSAConfig
from nsa_vibe_tpu.core.nsa import init_nsa_params, nsa_prefill

# (S, dim, n_heads, groups, d_k, d_v, l, d, l_sel, n_sel, w)
CASES = [
    # S < l: zero compressed tokens anywhere
    (6, 64, 2, 1, 16, 16, 8, 4, 8, 2, 4),
    # S == 1
    (1, 64, 4, 2, 16, 16, 8, 4, 8, 2, 8),
    # S not divisible by l_sel, d, or any tile size; odd heads-per-group
    (77, 96, 3, 1, 32, 32, 8, 4, 16, 3, 24),
    # window larger than the whole sequence (win == full causal)
    (40, 64, 4, 2, 16, 16, 8, 4, 8, 3, 512),
    # l == d (non-overlapping compression windows)
    (96, 64, 4, 1, 16, 32, 16, 16, 16, 4, 16),
    # asymmetric d_k != d_v, larger n_sel than available blocks
    (50, 80, 2, 2, 16, 32, 8, 4, 8, 12, 16),
]


@pytest.mark.parametrize("S,dim,H,G,dk,dv,l,d,lsel,nsel,w", CASES)
def test_fuzz_prefill_parity(S, dim, H, G, dk, dv, l, d, lsel, nsel, w):
    cfg = NSAConfig(dim=dim, n_heads=H, n_kv_groups=G, d_k=dk, d_v=dv,
                    l=l, d=d, l_sel=lsel, n_sel=nsel, w=w)
    key = jax.random.PRNGKey(S * 1000 + dim)
    params = init_nsa_params(key, cfg, jnp.float32)
    x = jax.random.normal(jax.random.fold_in(key, 1), (1, S, dim), jnp.float32)

    ref, aux = nsa_prefill(params, x, cfg.replace(kernel="reference"))
    assert bool(jnp.isfinite(ref).all())
    assert float(jnp.abs(aux["gates"].sum(-1) - 1).max()) < 1e-5

    sel = aux["sel_idx"]
    t = jnp.arange(S, dtype=jnp.int32)[None, :, None, None]
    assert bool(((sel < 0) | (sel * cfg.l_sel <= t)).all())

    got, _ = nsa_prefill(params, x, cfg.replace(kernel="pallas"))
    assert bool(jnp.isfinite(got).all())
    assert float(jnp.abs(got - ref).max()) < 2e-4


def test_fuzz_decode_parity():
    """Random configs through the decode scan: prefill-via-decode must
    reproduce batched prefill (cache rings + emission schedule hit the
    same long-tail shapes — S < l means nothing ever emits, capacity
    rounding, w > S windows)."""
    import random

    from nsa_vibe_tpu.core.cache import init_cache
    from nsa_vibe_tpu.core.decode import nsa_prefill_via_decode

    rnd = random.Random(4242)
    for trial in range(3):
        G = rnd.choice([1, 2])
        H = G * rnd.choice([1, 2, 3])
        l = rnd.choice([8, 16])
        cfg = NSAConfig(
            dim=rnd.choice([64, 96]), n_heads=H, n_kv_groups=G,
            d_k=rnd.choice([16, 32]), d_v=rnd.choice([16, 32]),
            l=l, d=l // 2, l_sel=rnd.choice([8, 16]),
            n_sel=rnd.randint(2, 6), w=rnd.choice([8, 32, 128]),
            kernel="reference",
        )
        S = rnd.randint(1, 70)
        key = jax.random.PRNGKey(9000 + trial)
        params = init_nsa_params(key, cfg, jnp.float32)
        x = jax.random.normal(jax.random.fold_in(key, 1),
                              (1, S, cfg.dim), jnp.float32)
        out_b, _ = nsa_prefill(params, x, cfg)
        cache = init_cache(cfg, 1, capacity=max(S, cfg.l, 8))
        out_s, cache = nsa_prefill_via_decode(params, x, cache, cfg)
        mae = float(jnp.abs(out_b - out_s).max())
        assert mae < 3e-5, (trial, cfg, S, mae)
        assert int(cache.t) == S


def test_fuzz_random_configs():
    """A handful of fully random (but seeded) configs, same invariants."""
    import random

    rnd = random.Random(1337)
    for trial in range(4):
        G = rnd.choice([1, 2])
        H = G * rnd.choice([1, 2, 3])
        l = rnd.choice([8, 16])
        cfg = NSAConfig(
            dim=rnd.choice([64, 96]), n_heads=H, n_kv_groups=G,
            d_k=rnd.choice([16, 32]), d_v=rnd.choice([16, 32]),
            l=l, d=l // 2, l_sel=rnd.choice([8, 16]),
            n_sel=rnd.randint(2, 6), w=rnd.choice([8, 32, 128]),
        )
        S = rnd.randint(1, 130)
        key = jax.random.PRNGKey(7000 + trial)
        params = init_nsa_params(key, cfg, jnp.float32)
        x = jax.random.normal(jax.random.fold_in(key, 1),
                              (1, S, cfg.dim), jnp.float32)
        ref, aux = nsa_prefill(params, x, cfg.replace(kernel="reference"))
        assert bool(jnp.isfinite(ref).all()), (trial, cfg)
        got, _ = nsa_prefill(params, x, cfg.replace(kernel="pallas"))
        assert float(jnp.abs(got - ref).max()) < 2e-4, (trial, cfg, S)
