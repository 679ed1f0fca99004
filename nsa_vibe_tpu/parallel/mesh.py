"""Device mesh and sharding rules.

Replaces the reference's DDP/FSDP stack (torch.distributed + NCCL,
scripts/train_showcase.py:410-448,603-696, train_showcase_fsdp.py) with
jax.sharding over a (dp, tp) mesh: batch rows shard over `dp`, attention
heads / MLP hidden / vocab shard over `tp`. Gradient all-reduce over ICI
is inserted by GSPMD inside the jitted step (no comm hooks, no bucketing
— XLA overlaps the collectives with compute).

Multi-host: call `jax.distributed.initialize()` before building the mesh
(initialize_distributed below); the same code runs single-chip, 8-chip,
and multi-host without modification.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: Optional[str] = None) -> None:
    """Multi-host bring-up (reference: dist.init_process_group, NCCL).
    On TPU pods jax.distributed.initialize() autodetects; no-op if already
    initialized or single-process."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator)
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process


def make_mesh(
    dp: Optional[int] = None, tp: int = 1, sp: int = 1, pp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """(dp, pp, sp, tp) mesh: batch over dp, pipeline stages over pp
    (parallel/pipeline.py), sequence over sp (context-parallel prefill,
    parallel/context.py), heads/hidden over tp. pp is adjacent-heavy
    traffic (stage-to-stage activations), so it sits next to the minor
    axes where mesh neighbors are ICI neighbors."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        if n % (tp * sp * pp) != 0:
            raise ValueError(f"{n} devices not divisible by pp*sp*tp={pp * sp * tp}")
        dp = n // (tp * sp * pp)
    if dp * pp * sp * tp != n:
        raise ValueError(f"mesh {dp}x{pp}x{sp}x{tp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, pp, sp, tp)
    return Mesh(arr, ("dp", "pp", "sp", "tp"))


# --- sharding rules -------------------------------------------------------
# Keyed by parameter name; anything unmatched is replicated. The NSA
# projections are [in, heads*d] so sharding the last axis over `tp` splits
# heads/groups; W_O / w_out are [heads*d, out] -> shard first axis.

_COL_SHARDED = {"W_Q", "W_K_sel", "W_V_sel", "W_K_win", "W_V_win", "W_K_cmp",
                "W_V_cmp", "w_in", "lm_head"}
_ROW_SHARDED = {"W_O", "w_out"}


def _spec_for(name: str, shape, fsdp_size: int, fsdp_min: int) -> P:
    """tp shards heads/hidden; fsdp_size > 1 additionally shards the
    largest remaining axis over dp (ZeRO-3-style fully-sharded parameters
    + optimizer state — the reference's FSDP FULL_SHARD,
    train_showcase_fsdp.py:434-441; XLA inserts the per-layer
    all-gathers/reduce-scatters that FSDP does by hand)."""
    ndim = len(shape)
    spec = [None] * ndim
    if name in _COL_SHARDED and ndim == 2:
        spec[1] = "tp"
    elif name in _ROW_SHARDED and ndim == 2:
        spec[0] = "tp"
    if fsdp_size > 1:
        # largest un-sharded axis that splits evenly and is long enough
        # (short axes stay replicated, like FSDP's min-wrap-size)
        for i in sorted(range(ndim), key=lambda i: -shape[i]):
            if spec[i] is None and shape[i] >= fsdp_min and shape[i] % fsdp_size == 0:
                spec[i] = "dp"
                break
    while spec and spec[-1] is None:   # P(None, None) != P() to jax
        spec.pop()
    return P(*spec)


def param_specs(params, fsdp_size: int = 1, fsdp_min: int = 512) -> object:
    """PartitionSpec pytree matching a parameter pytree (by leaf name).
    fsdp_size = dp-axis size when fully-sharding parameters, 1 = pure
    replication over dp (DDP-equivalent)."""

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if hasattr(v, "ndim"):
                    out[k] = _spec_for(k, v.shape, fsdp_size, fsdp_min)
                else:
                    out[k] = walk(v)
            return out
        if isinstance(node, (list, tuple)):
            t = [walk(v) for v in node]
            return type(node)(t)
        if hasattr(node, "ndim"):
            return P()
        return node

    return walk(params)


def param_shardings(params, mesh: Mesh, fsdp: bool = False, fsdp_min: int = 512):
    fsdp_size = mesh.shape["dp"] if fsdp else 1
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s),
        param_specs(params, fsdp_size=fsdp_size, fsdp_min=fsdp_min),
        is_leaf=lambda x: isinstance(x, P),
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
