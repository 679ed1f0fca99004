"""Flax Linen wrapper around the functional NSA core.

The framework's native API is functional (params pytree + pure
functions, mirroring the reference's single nn.Module). This wrapper
exposes NSA attention and the full block as `flax.linen.Module`s so
flax-based codebases can drop them into existing model definitions; the
parameters are the same pytrees, registered under a single "nsa"
collection entry (no re-implementation, no divergence risk).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from nsa_vibe_tpu.core.config import ModelConfig, NSAConfig
from nsa_vibe_tpu.core.nsa import init_nsa_params, nsa_prefill
from nsa_vibe_tpu.models.llama_block import block_prefill, init_block_params


class NSAAttention(nn.Module):
    """Three-branch NSA attention (prefill path) as a Linen module.

    Usage:
        mod = NSAAttention(cfg=NSAConfig(dim=256, ...))
        params = mod.init(key, x)          # x: [B, S, dim]
        y = mod.apply(params, x)
    """

    cfg: NSAConfig
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, pos_offset: int = 0) -> jnp.ndarray:
        params = self.param(
            "nsa",
            lambda key: init_nsa_params(key, self.cfg, self.param_dtype),
        )
        out, _ = nsa_prefill(params, x, self.cfg, pos_offset=pos_offset)
        return out


class LlamaBlockNSA(nn.Module):
    """Pre-norm residual transformer block (NSA attention + SiLU MLP)."""

    mcfg: ModelConfig
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        params = self.param(
            "block",
            lambda key: init_block_params(key, self.mcfg, self.param_dtype),
        )
        out, _ = block_prefill(params, x, self.mcfg)
        return out
