"""Rotary position embeddings (split-half convention).

Functionally equivalent to the reference's minimal RoPE
(nsa/core/rope.py:16-51): fp32 angles with inv_freq = base^(-2i/D),
NTK-style extension via effective position pos/scale, output cast back to
the input dtype. The rotation pairs are (x[i], x[i+half]) — the LLaMA
split-half layout — instead of the reference's interleaved (x[2i],
x[2i+1]): on TPU the interleaved form lowers to 2-element-lane strided
ops (~0.8 ms for a [2048, 768] tensor vs ~0.02 ms split-half). The two
conventions are unitarily equivalent; all framework paths (prefill,
decode, pooling) share this one.
"""

from __future__ import annotations

import jax.numpy as jnp


def build_inv_freq(dim: int, base: float = 10000.0) -> jnp.ndarray:
    if dim % 2 != 0:
        raise ValueError("RoPE requires an even dimension")
    half = dim // 2
    idx = jnp.arange(half, dtype=jnp.float32)
    return base ** (-2.0 * idx / dim)  # [half]


def apply_rope(
    x: jnp.ndarray,
    pos: jnp.ndarray,
    base: float = 10000.0,
    scale: float = 1.0,
) -> jnp.ndarray:
    """Apply RoPE along the last dimension.

    x:   [..., S, D] with even D
    pos: [S] or broadcastable-to-[..., S] integer positions
    """
    D = x.shape[-1]
    half = D // 2
    inv_freq = build_inv_freq(D, base)  # [half] float32
    if scale <= 0:
        scale = 1.0
    pos = jnp.asarray(pos)
    while pos.ndim < x.ndim - 1:
        pos = pos[None, ...]
    angles = (pos.astype(jnp.float32) / float(scale))[..., None] * inv_freq  # [..., S, half]
    sin = jnp.sin(angles).astype(x.dtype)
    cos = jnp.cos(angles).astype(x.dtype)
    x0 = x[..., :half]
    x1 = x[..., half:]
    y0 = x0 * cos - x1 * sin
    y1 = x0 * sin + x1 * cos
    return jnp.concatenate((y0, y1), axis=-1)
