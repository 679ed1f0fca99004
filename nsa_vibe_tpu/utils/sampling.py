"""Token sampling: temperature / top-k / nucleus (top-p).

The reference generates greedily only (scripts/demo_decode.py prints
argmax continuations); serving needs the standard sampling surface, so
this exceeds parity. Everything is jit-safe with static top_k/top_p:
masking is sort/threshold arithmetic (no data-dependent shapes), so the
whole sampler fuses into the decode step program (used inside
models.tinylm.generate_scan's lax.scan body).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_logits(
    key: jax.Array,
    logits: jnp.ndarray,
    temperature: float = 1.0,
    top_k: int = 0,
    top_p: float = 1.0,
) -> jnp.ndarray:
    """Sample token ids from logits [..., V] -> ids [...].

    temperature <= 0 means argmax (greedy); top_k == 0 disables top-k;
    top_p >= 1 disables nucleus filtering. Filters compose (top-k first,
    then nucleus over the survivors, matching the usual convention).
    The highest-probability token is never filtered out.
    """
    if temperature <= 0:
        return jnp.argmax(logits, axis=-1)
    logits = logits.astype(jnp.float32) / temperature
    V = logits.shape[-1]
    if top_k and 0 < top_k < V:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p < 1.0:
        srt = jnp.sort(logits, axis=-1)[..., ::-1]        # descending
        probs = jax.nn.softmax(srt, axis=-1)
        exclusive = jnp.cumsum(probs, axis=-1) - probs
        # keep the smallest prefix whose mass reaches top_p (the top
        # token's exclusive mass is 0 < top_p, so it always survives)
        keep = exclusive < top_p
        thresh = jnp.min(jnp.where(keep, srt, jnp.inf), axis=-1, keepdims=True)
        logits = jnp.where(logits < thresh, -jnp.inf, logits)
    return jax.random.categorical(key, logits)
