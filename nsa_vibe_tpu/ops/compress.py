"""Compression operator ϕ: overlapped pooling of K/V into compressed tokens.

Paper Eq. 7-8: blocks of length l, stride d. RoPE is applied to K at
absolute positions *before* pooling (reference: nsa/core/compress_pool.py:9-38).

TPU-first: instead of gathering l-wide windows (l× read amplification), we
exploit d | l — sum d-sized chunks once, then each length-l window is the
sum of r = l/d consecutive chunk sums, obtained from a cumulative sum.
This is O(S) HBM traffic and fuses into a handful of XLA ops.

The learnable ϕ ("conv") is a depthwise conv over time with kernel l and
stride d, initialized to 1/l so it coincides with average pooling at init
(reference: nsa/core/nsa_attention.py:279-291).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from nsa_vibe_tpu.ops.rope import apply_rope


def avg_pool_phi(x: jnp.ndarray, l: int, d: int, exact: bool = False) -> jnp.ndarray:
    """Overlapped average pooling over the time axis.

    x: [..., S, D]  ->  [..., S_cmp, D] with S_cmp = (S - l)//d + 1 (0 if S < l).

    exact=False (default): O(S) cumsum trick — window j is
    csum[j+r]-csum[j], so both terms carry ALL earlier mass; exact in
    real arithmetic, ~1 ulp of f32 round-off in packed varlen rows
    (cross-document influence bounded by pooling round-off).
    exact=True: each window touches ONLY its own l inputs — a depthwise
    conv with the constant 1/l kernel (conv ϕ machinery) — so
    cross-document influence through the cmp branch is exactly 0.0 for
    d-aligned document starts (cfg.varlen_exact; a strided conv instead
    of O(S) adds, off the hot path by default).
    """
    S = x.shape[-2]
    if S < l:
        return x[..., :0, :]
    r = l // d
    S_cmp = (S - l) // d + 1
    if exact:
        lead = x.shape[:-2]
        D = x.shape[-1]
        x4 = x.reshape(-1, 1, S, D)
        out = conv_phi(x4, jnp.full((D, l), 1.0 / float(l), jnp.float32), l, d)
        return out.reshape(*lead, S_cmp, D)
    n_chunks = S_cmp - 1 + r
    usable = n_chunks * d
    chunks = x[..., :usable, :].reshape(*x.shape[:-2], n_chunks, d, x.shape[-1])
    chunk_sum = chunks.sum(axis=-2)  # [..., n_chunks, D]
    csum = jnp.cumsum(chunk_sum, axis=-2)
    zero = jnp.zeros_like(csum[..., :1, :])
    csum = jnp.concatenate([zero, csum], axis=-2)  # [..., n_chunks+1, D]
    win_sum = csum[..., r:, :] - csum[..., :-r, :]  # [..., S_cmp, D]
    return win_sum / float(l)


def conv_phi(x: jnp.ndarray, weight: jnp.ndarray, l: int, d: int) -> jnp.ndarray:
    """Learnable depthwise ϕ: per-channel conv over time, kernel l, stride d.

    x: [B, G, S, D]; weight: [D, l]  ->  [B, G, S_cmp, D]
    """
    B, G, S, D = x.shape
    if S < l:
        return x[..., :0, :]
    lhs = x.reshape(B * G, S, D).transpose(0, 2, 1)           # [N, D, S]
    rhs = weight[:, None, :].astype(x.dtype)                  # [D, 1, l]
    out = jax.lax.conv_general_dilated(
        lhs, rhs,
        window_strides=(d,),
        padding="VALID",
        feature_group_count=D,
        dimension_numbers=("NCH", "OIH", "NCH"),
    )                                                          # [N, D, S_cmp]
    S_cmp = out.shape[-1]
    return out.transpose(0, 2, 1).reshape(B, G, S_cmp, D)


def init_conv_phi_weight(d_model: int, l: int, dtype=jnp.float32) -> jnp.ndarray:
    """Identity-to-average init: conv ϕ == avg ϕ at initialization."""
    return jnp.full((d_model, l), 1.0 / float(l), dtype=dtype)


def pool_phi_rope_kv(
    K_raw: jnp.ndarray,
    V_raw: jnp.ndarray,
    l: int,
    d: int,
    pos: Optional[jnp.ndarray] = None,
    k_weight: Optional[jnp.ndarray] = None,
    v_weight: Optional[jnp.ndarray] = None,
    rope_base: float = 10000.0,
    rope_scale: float = 1.0,
    exact: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ϕ over K (RoPE'd at absolute positions) and V.

    K_raw/V_raw: [B, G, S, D*]; pos: [S] absolute positions (default arange).
    Returns (K_cmp, V_cmp): [B, G, S_cmp, D*]. Average pooling unless conv
    weights are given. `exact`: window-exact avg pooling (see avg_pool_phi;
    conv ϕ is window-exact by construction — a real strided conv).
    """
    S = K_raw.shape[2]
    if pos is None:
        pos = jnp.arange(S)
    K_rope = apply_rope(K_raw, pos, base=rope_base, scale=rope_scale)
    if k_weight is not None:
        K_cmp = conv_phi(K_rope, k_weight, l, d)
        V_cmp = conv_phi(V_raw, v_weight, l, d)
    else:
        K_cmp = avg_pool_phi(K_rope, l, d, exact=exact)
        V_cmp = avg_pool_phi(V_raw, l, d, exact=exact)
    return K_cmp, V_cmp
