"""LLaMA-style transformer block around NSA attention.

Reference: nsa/model/llama_block_nsa.py — RMSNorm (:10-19), SiLU MLP 4×
(:22-30), pre-norm residual block (:33-106). Unlike the reference block
(which builds a fresh empty cache every forward and is prefill-only,
SURVEY.md §2.6#5), this block supports real cached decode via
`block_decode_step`.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nsa_vibe_tpu.core.cache import NSACache
from nsa_vibe_tpu.core.config import ModelConfig, NSAConfig
from nsa_vibe_tpu.core.decode import nsa_decode_step
from nsa_vibe_tpu.core.nsa import init_nsa_params, nsa_prefill


def rmsnorm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    y = x.astype(jnp.float32) * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32)).astype(x.dtype)


def init_mlp_params(key: jax.Array, dim: int, hidden: int, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    lim1, lim2 = 1.0 / np.sqrt(dim), 1.0 / np.sqrt(hidden)
    return {
        "w_in": jax.random.uniform(k1, (dim, hidden), dtype, -lim1, lim1),
        "w_out": jax.random.uniform(k2, (hidden, dim), dtype, -lim2, lim2),
    }


def mlp(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x @ params["w_in"]) @ params["w_out"]


def init_block_params(key: jax.Array, mcfg: ModelConfig, dtype=jnp.float32) -> dict:
    cfg = mcfg.nsa
    k_attn, k_mlp = jax.random.split(key)
    hidden = int(cfg.dim * mcfg.mlp_ratio)
    return {
        "attn_norm": jnp.ones((cfg.dim,), dtype),
        "attn": init_nsa_params(k_attn, cfg, dtype),
        "mlp_norm": jnp.ones((cfg.dim,), dtype),
        "mlp": init_mlp_params(k_mlp, cfg.dim, hidden, dtype),
    }


def block_prefill(
    params: dict, x: jnp.ndarray, mcfg: ModelConfig, seq_start=None
) -> Tuple[jnp.ndarray, dict]:
    """Pre-norm residual block, batched prefill. Returns (y, attn aux).
    seq_start [B,S]: per-row document starts (varlen batching)."""
    cfg: NSAConfig = mcfg.nsa
    attn_out, aux = nsa_prefill(
        params["attn"], rmsnorm(x, params["attn_norm"], mcfg.rmsnorm_eps), cfg,
        seq_start=seq_start)
    x = x + attn_out
    mlp_fn = jax.checkpoint(mlp) if mcfg.remat == "mlp" else mlp
    x = x + mlp_fn(params["mlp"], rmsnorm(x, params["mlp_norm"], mcfg.rmsnorm_eps))
    return x, aux


def block_decode_step(
    params: dict, x: jnp.ndarray, cache: NSACache, mcfg: ModelConfig
) -> Tuple[jnp.ndarray, NSACache]:
    """Single-token cached decode through the block. x: [B,1,dim]."""
    cfg: NSAConfig = mcfg.nsa
    attn_out, cache, _ = nsa_decode_step(
        params["attn"], rmsnorm(x, params["attn_norm"], mcfg.rmsnorm_eps), cache, cfg
    )
    x = x + attn_out
    x = x + mlp(params["mlp"], rmsnorm(x, params["mlp_norm"], mcfg.rmsnorm_eps))
    return x, cache
