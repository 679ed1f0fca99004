"""Pure-jnp reference attention for the three NSA branches.

These are the *oracles*: explicit-mask attention with mathematically
correct semantics. They replace the reference's 5-rung kernel-routing
ladder (SDPA/FA-2/Triton/CUDA, nsa/core/attention_kernels.py) with a
single masked implementation per branch, and deliberately do NOT
reproduce the reference's `q_len=1 is_causal` first-key degeneracies
(SURVEY.md §2.6 #1-2). The Pallas kernels in nsa_vibe_tpu.ops.pallas are
tested for parity against these.

All branch functions share the layout:
  Q: [B, S, G, h, Dk]   (queries, RoPE applied)
  K: [B, G, S_kv, Dk]   V: [B, G, S_kv, Dv]
  -> O: [B, S, G, h, Dv]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nsa_vibe_tpu.ops.selection import selection_token_mask

NEG_INF = float("-inf")


def attend_masked(
    Q: jnp.ndarray, K: jnp.ndarray, V: jnp.ndarray, mask: jnp.ndarray, scale: float
) -> jnp.ndarray:
    """Masked grouped attention. mask broadcastable to [B,S,G,h,S_kv]; True
    = attend. Softmax in float32; rows with no visible keys return zeros."""
    logits = jnp.einsum(
        "bsghd,bgkd->bsghk", Q.astype(jnp.float32), K.astype(jnp.float32)
    ) * scale
    logits = jnp.where(mask, logits, NEG_INF)
    any_visible = jnp.any(mask, axis=-1, keepdims=True)
    p = jax.nn.softmax(logits, axis=-1)
    p = jnp.where(any_visible, p, 0.0)
    out = jnp.einsum("bsghk,bgkv->bsghv", p, V.astype(jnp.float32))
    return out.astype(Q.dtype)


def sliding_window_mask(t_pos: jnp.ndarray, S_kv: int, w: int) -> jnp.ndarray:
    """Banded mask: token t attends keys in [t-w+1, t]. [S] -> [S, S_kv]."""
    k = jnp.arange(S_kv, dtype=jnp.int32)[None, :]
    t = t_pos.astype(jnp.int32)[:, None]
    return (k <= t) & (k > t - w)


def compressed_mask(num_cmp_t: jnp.ndarray, S_cmp: int) -> jnp.ndarray:
    """Prefix mask over compressed tokens: t sees the first num_cmp(t). [S] -> [S, S_cmp]."""
    c = jnp.arange(S_cmp, dtype=jnp.int32)[None, :]
    return c < num_cmp_t.astype(jnp.int32)[:, None]


def sliding_window_attention(
    Q: jnp.ndarray, K: jnp.ndarray, V: jnp.ndarray, t_pos: jnp.ndarray, w: int, scale: float
) -> jnp.ndarray:
    m = sliding_window_mask(t_pos, K.shape[2], w)                 # [S, S_kv]
    return attend_masked(Q, K, V, m[None, :, None, None, :], scale)


def compressed_attention(
    Q: jnp.ndarray, K_cmp: jnp.ndarray, V_cmp: jnp.ndarray,
    num_cmp_t: jnp.ndarray, scale: float,
) -> jnp.ndarray:
    m = compressed_mask(num_cmp_t, K_cmp.shape[2])                # [S, S_cmp]
    return attend_masked(Q, K_cmp, V_cmp, m[None, :, None, None, :], scale)


def selection_attention(
    Q: jnp.ndarray, K: jnp.ndarray, V: jnp.ndarray,
    sel_idx: jnp.ndarray, t_pos: jnp.ndarray, l_sel: int, scale: float,
) -> jnp.ndarray:
    """Block-sparse selection attention over the union of selected blocks.

    Full softmax over the gathered token set (non-causal over the set,
    positions clamped to <= t) — the paper-correct semantics
    (cf. reference sel_cuda.cpp:28-73 and grouped_selection_attention_masked).
    """
    m = selection_token_mask(sel_idx, t_pos, l_sel, K.shape[2])   # [B,S,G,S_kv]
    return attend_masked(Q, K, V, m[:, :, :, None, :], scale)


def full_causal_attention(
    Q: jnp.ndarray, K: jnp.ndarray, V: jnp.ndarray, t_pos: jnp.ndarray, scale: float
) -> jnp.ndarray:
    """Plain causal attention oracle (for full-coverage equivalence tests)."""
    k = jnp.arange(K.shape[2], dtype=jnp.int32)[None, :]
    m = k <= t_pos.astype(jnp.int32)[:, None]
    return attend_masked(Q, K, V, m[None, :, None, None, :], scale)
