"""Typed configuration tree.

Replaces the reference's three-tier env/OmegaConf/flag system
(reference: nsa/core/nsa_attention.py:300-394, configs/base.yaml) with one
frozen dataclass tree. The ~70 NSA_* routing flags collapse to a couple of
explicit switches because there is a single kernel path per branch
(Pallas) plus a jnp reference path used for parity/debug.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Optional


@dataclass(frozen=True)
class NSAConfig:
    """Core NSA attention hyperparameters (paper §3 + reference configs/base.yaml)."""

    dim: int = 256
    n_heads: int = 8
    n_kv_groups: int = 2
    d_k: int = 64
    d_v: int = 64

    # NSA block structure (paper defaults; reference configs/base.yaml:8-13)
    l: int = 32        # compression block length
    d: int = 16        # compression stride
    l_sel: int = 64    # selection block length
    n_sel: int = 16    # number of selected blocks
    w: int = 512       # sliding window length

    phi: str = "avg"           # "avg" | "conv" (learnable depthwise conv, init=avg)
    gate_hidden: Optional[int] = None  # default d_k // 2
    gate_temp: float = 1.0
    rope_base: float = 10000.0
    rope_scale: float = 1.0    # NTK-style position scaling for long-context

    # Selection policy (reference selection_scorer.py:124-135)
    force_init: bool = True    # always select block 0
    force_local: int = 2       # always select the last 2 blocks

    # Kernel routing: "pallas" on TPU, "reference" = pure-jnp oracle path.
    kernel: str = "auto"       # "auto" | "pallas" | "reference"
    # Debug toggles kept from the reference's flag system
    force_branch: Optional[str] = None    # "cmp" | "sel" | "win" gate override
    force_uniform_gate: bool = False

    # Long-context prefill: chunk the selection-scoring pipeline over query
    # chunks of this size to keep memory O(chunk * S_cmp), not O(S * S_cmp)
    # (reference docs/NSA_CHUNKED_SELECTION_SPEC.md). 0 = no chunking.
    prefill_chunk: int = 0

    # Window-exact avg-ϕ pooling: cross-document influence through the cmp
    # branch is exactly 0.0 under varlen packing (the default O(S) cumsum
    # pooling carries ~1 ulp of earlier-document round-off — see
    # ops/varlen.py header and ops/compress.py::avg_pool_phi). Off by
    # default: costs O(S*l/d) adds instead of O(S). conv ϕ is always exact.
    varlen_exact: bool = False

    def __post_init__(self) -> None:
        if self.n_heads % self.n_kv_groups != 0:
            raise ValueError("n_heads must be divisible by n_kv_groups")
        if self.l % self.d != 0 or self.l_sel % self.d != 0:
            raise ValueError("require d|l and d|l_sel")
        if self.d_k % 2 != 0:
            raise ValueError("RoPE requires even d_k")

    @property
    def h_per_group(self) -> int:
        return self.n_heads // self.n_kv_groups

    @property
    def n_forced(self) -> int:
        """Number of forced selection slots (block 0 + local blocks)."""
        return (1 if self.force_init else 0) + self.force_local

    def replace(self, **kw: Any) -> "NSAConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class ModelConfig:
    """TinyLM / LlamaBlockNSA model configuration (reference scripts/train_showcase.py:30)."""

    vocab_size: int = 256      # byte-LM
    n_layers: int = 2
    nsa: NSAConfig = dataclasses.field(default_factory=NSAConfig)
    mlp_ratio: float = 4.0
    rmsnorm_eps: float = 1e-6
    dtype: str = "float32"     # activation/computation dtype ("bfloat16" on TPU)
    # gradient checkpointing: False | True/"full" (remat whole blocks) |
    # "mlp" (remat only the MLP — recomputing the 4x hidden is ~5% extra
    # FLOPs but frees the largest activation buffer; attention residuals
    # [Q,K,V,O,lse] stay saved so the Pallas backwards never re-run fwd)
    remat: "bool | str" = False


@dataclass(frozen=True)
class TrainConfig:
    """Trainer configuration (reference configs/train_showcase.yaml + train: group)."""

    lr: float = 3e-4
    warmup_steps: int = 50
    steps: int = 1000
    max_grad_norm: float = 1.0
    weight_decay: float = 0.0
    batch_size: int = 8
    seq_len: int = 128
    accum_steps: int = 1
    seed: int = 1337
    log_every: int = 20
    save_every: int = 0        # 0 = only final
    eval_every: int = 0
    out_dir: str = "artifacts/train"
    # parallelism
    dp: int = 0                # data-parallel axis size; 0 = infer from devices
                               # (an explicit dp that mismatches the device
                               # count fails loudly in make_mesh)
    tp: int = 1                # tensor-parallel (head/group) axis size
    sp: int = 1                # sequence-parallel axis size (context-parallel attention)
    pp: int = 1                # pipeline-parallel stage count (GPipe-style
                               # microbatch pipelining over a pp mesh axis;
                               # parallel/pipeline.py)
    pp_microbatches: int = 0   # microbatches per step for pp (0 = pp)
    fsdp: bool = False         # fully shard params/optimizer over dp (ZeRO-3)
    fsdp_min_size: int = 512   # axes shorter than this stay replicated
    # varlen/document-masked packed batching (ops.varlen): batches carry
    # (tokens, seq_start, loss_mask); no attention crosses doc boundaries
    varlen: bool = False
    # collect per-step gate/selection observability stats (gate entropy,
    # collapse fraction, k-stats). Costs the stacked [L,B,S,G,*] aux
    # arrays every step; set False for maximum-throughput runs
    gate_stats: bool = True


def mesh_axes() -> tuple[str, ...]:
    """Canonical mesh axis names used across the framework."""
    return ("dp", "tp")
