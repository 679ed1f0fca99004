"""Context (sequence) parallel prefill over a mesh `sp` axis.

The reference has NO sequence parallelism (SURVEY.md §5: no ring
attention / context parallel / Ulysses anywhere in the tree); long
context is handled by NSA sparsity + single-device chunked prefill. On
TPU the natural upgrade is mesh sequence sharding (shard_map), which this
module provides:

  * queries are sharded over `sp`: each device projects + RoPEs its own
    S/sp token slice and computes attention for its rows only;
  * K/V are all-gathered over ICI per branch. For NSA this is the right
    trade: K_cmp is S/d-compressed (16x smaller), selection can address
    any block (gather-based partitioning would need data-dependent
    communication), and the showcase-scale KV (G=2, d_k=64) is a few MB
    per 64k tokens — ICI bandwidth dwarfs the recompute alternative.
    (SURVEY.md §7.1: "keep K_sel replicated per host for the 125M
    showcase; revisit ring-gather only if model size demands it".)
  * per-shard query positions enter the Pallas kernels as a traced
    `t_start` scalar (scalar prefetch), so banded/prefix tile skipping
    still works on shifted rows;
  * backward: shard_map transposes the all_gathers to reduce_scatters
    and psums the replicated-parameter cotangents — the ICI-collective
    equivalent of DDP gradient bucketing.

Composes with data parallelism: mesh ("dp", "sp", "tp"), batch rows over
dp, sequence over sp.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map as _shard_map  # jax >= 0.8

    def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
        return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                          check_vma=check_rep)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from nsa_vibe_tpu.core.config import NSAConfig
from nsa_vibe_tpu.core.nsa import combine_branches, project_qkv
from nsa_vibe_tpu.ops import attention as attn_ops
from nsa_vibe_tpu.ops.attention import resolve_kernel
from nsa_vibe_tpu.ops.block_index import build_block_meta, num_cmp_blocks
from nsa_vibe_tpu.ops.compress import pool_phi_rope_kv
from nsa_vibe_tpu.ops.rope import apply_rope
from nsa_vibe_tpu.ops.selection import select_topn_blocks, selection_scores


def num_cmp_traced(s_raw: jnp.ndarray, l: int, d: int) -> jnp.ndarray:
    """Traced num_cmp(s) = (s-l)//d + 1 for s >= l else 0 (jnp version of
    ops.block_index.num_cmp_blocks for use under shard_map)."""
    return jnp.where(s_raw >= l, (s_raw - l) // d + 1, 0).astype(jnp.int32)


def context_parallel_prefill(
    params: dict,
    x: jnp.ndarray,
    cfg: NSAConfig,
    mesh: Mesh,
    axis: str = "sp",
    batch_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Sequence-sharded batched prefill. x: [B, S, dim] with S divisible
    by mesh.shape[axis]. Returns out [B, S, dim] (sharded over `axis` on
    S; also over `batch_axis` on B when given). Differentiable — use it
    directly inside a loss."""
    B, S, _ = x.shape
    sp = mesh.shape[axis]
    if S % sp != 0:
        raise ValueError(f"S={S} not divisible by sp={sp}")
    S_local = S // sp
    if S_local % cfg.l_sel != 0:
        raise ValueError(
            f"S/sp={S_local} must be a multiple of l_sel={cfg.l_sel} "
            "(selection blocks must not straddle shard boundaries)"
        )

    meta = build_block_meta(S, cfg.l, cfg.d, cfg.l_sel, cfg.n_sel, cfg.w)
    S_cmp = int(num_cmp_blocks(S, cfg.l, cfg.d))
    M = jnp.asarray(meta.M_csl[:S_cmp])
    scale = 1.0 / float(np.sqrt(cfg.d_k))
    G, h = cfg.n_kv_groups, cfg.h_per_group
    impl, interpret = resolve_kernel(cfg.kernel, cfg.h_per_group)

    def shard_fn(params, x_local):
        return nsa_attention_cp_local(
            params, x_local, cfg, axis, S, S_cmp, meta.S_sel, M, impl, interpret
        )

    b_ax = batch_axis
    x_spec = P(b_ax, axis, None)
    return shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), x_spec),
        out_specs=x_spec,
        check_rep=False,
    )(params, x)


def nsa_attention_cp_local(
    params: dict, x_local: jnp.ndarray, cfg: NSAConfig, axis: str,
    S: int, S_cmp: int, S_sel: int, M: jnp.ndarray,
    impl: str, interpret: bool, collect_aux: bool = False,
    seq_start_full=None,
) -> jnp.ndarray:
    """Sequence-sharded NSA attention body — runs INSIDE shard_map.
    x_local: this shard's [B, S/sp, dim] slice; returns the local output
    slice (or (out, {gates, sel_idx}) with collect_aux — per-shard rows,
    for gate/selection observability). Composable into larger shard_map
    programs (model_forward_cp).

    seq_start_full [B, S] (REPLICATED over the sp axis): per-token
    document starts for varlen batching — the shard slices its own rows'
    ds for query-side masks/RoPE and uses the full array for ϕ-pooling
    positions (pooled windows span shard boundaries). Document starts
    are l_sel-aligned so selection blocks never straddle documents."""
    G, h = cfg.n_kv_groups, cfg.h_per_group
    scale = 1.0 / float(np.sqrt(cfg.d_k))
    B, S_local = x_local.shape[0], x_local.shape[1]
    t0 = jax.lax.axis_index(axis).astype(jnp.int32) * S_local
    t_pos = t0 + jnp.arange(S_local, dtype=jnp.int32)
    varlen = seq_start_full is not None
    if varlen:
        seq_start_full = seq_start_full.astype(jnp.int32)
        ds_local = jax.lax.dynamic_slice_in_dim(seq_start_full, t0, S_local, 1)
        t_loc = t_pos[None, :] - ds_local                  # [B, S_local]
        rope_q_pos = t_loc[:, :, None]
        rope_k_pos = t_loc[:, None, :]
        pool_pos = (jnp.arange(S, dtype=jnp.int32)[None, :]
                    - seq_start_full)[:, None, :]          # [B, 1, S]
    else:
        ds_local = None
        rope_q_pos = t_pos[:, None]
        rope_k_pos = t_pos
        pool_pos = jnp.arange(S, dtype=jnp.int32)

    Q, K_sel, V_sel, K_win, V_win, K_cmp_raw, V_cmp_raw = project_qkv(
        params, x_local, cfg
    )
    Q = apply_rope(Q, rope_q_pos, cfg.rope_base, cfg.rope_scale)
    Q = Q.reshape(B, S_local, G, h, cfg.d_k)
    K_sel = apply_rope(K_sel, rope_k_pos, cfg.rope_base, cfg.rope_scale)
    K_win = apply_rope(K_win, rope_k_pos, cfg.rope_base, cfg.rope_scale)

    # K/V all-gather over ICI (bwd: reduce_scatter)
    def gather(a):
        return jax.lax.all_gather(a, axis, axis=2, tiled=True)

    K_sel_f, V_sel_f = gather(K_sel), gather(V_sel)
    K_win_f, V_win_f = gather(K_win), gather(V_win)
    K_raw_f, V_raw_f = gather(K_cmp_raw), gather(V_cmp_raw)

    # ϕ-compression over the full gathered raw stream (the ϕ windows
    # straddle shard boundaries; recomputing the pooled stream per
    # shard is O(S·D) — negligible next to attention)
    K_cmp, V_cmp = pool_phi_rope_kv(
        K_raw_f, V_raw_f, cfg.l, cfg.d,
        pos=pool_pos,
        k_weight=params.get("phi_k"), v_weight=params.get("phi_v"),
        rope_base=cfg.rope_base, rope_scale=cfg.rope_scale,
        exact=cfg.varlen_exact,
    )
    num_cmp_t = jnp.minimum(num_cmp_traced(t_pos + 1, cfg.l, cfg.d), S_cmp)

    from nsa_vibe_tpu.ops.pallas.scorer import scorer_fits_vmem

    O_cmp = None
    if impl == "pallas" and scorer_fits_vmem(h, S_sel):
        # fused pass: selection block ids + the cmp branch output (varlen
        # doc visibility rides in via seq_start — ds_local entries are
        # GLOBAL packed doc starts, which is what the kernel's j*d >= ds
        # bound and first-block clamp expect)
        sel_idx, O_cmp = attn_ops.fused_select_cmp(
            Q, K_cmp, V_cmp, M, scale=scale, l=cfg.l, d=cfg.d,
            l_sel=cfg.l_sel, n_top=cfg.n_sel, force_init=cfg.force_init,
            force_local=cfg.force_local, t_start=t0, seq_start=ds_local,
            interpret=interpret,
        )
    elif varlen:
        from nsa_vibe_tpu.ops.varlen import (
            select_topn_blocks_varlen,
            selection_scores_varlen,
        )

        p_grp = selection_scores_varlen(
            Q, K_cmp, M, scale, t_pos, ds_local, cfg.l, cfg.d)
        sel_idx = select_topn_blocks_varlen(
            p_grp, cfg.n_sel, t_pos, ds_local, cfg.l_sel,
            cfg.force_init, cfg.force_local)
    else:
        p_grp = selection_scores(Q, K_cmp, M, scale, num_cmp_t)
        sel_idx = select_topn_blocks(
            p_grp, cfg.n_sel, t_pos, cfg.l_sel, cfg.force_init, cfg.force_local
        )
    sel_idx = jax.lax.stop_gradient(sel_idx)

    if O_cmp is None:
        O_cmp = attn_ops.compressed_attention(
            Q, K_cmp, V_cmp, num_cmp_t, cfg.l, cfg.d, scale, kernel=cfg.kernel,
            t_start=t0, seq_start=ds_local, t_pos=t_pos,
        )
    O_sel = attn_ops.selection_attention(
        Q, K_sel_f, V_sel_f, sel_idx, t_pos, cfg.l_sel, scale,
        kernel=cfg.kernel, pos_offset=t0, seq_start=ds_local,
    )
    O_win = attn_ops.sliding_window_attention(
        Q, K_win_f, V_win_f, t_pos, cfg.w, scale, kernel=cfg.kernel,
        t_start=t0, seq_start=ds_local,
    )
    out, gates = combine_branches(params, cfg, Q, O_cmp, O_sel, O_win)
    if collect_aux:
        return out, {"gates": gates, "sel_idx": sel_idx}
    return out


# --------------------- context-parallel model training ---------------------


def context_parallel_model_forward(
    params: dict,
    tokens: jnp.ndarray,
    mcfg,
    mesh: Mesh,
    axis: str = "sp",
    batch_axis: Optional[str] = None,
    collect_aux: bool = False,
    seq_start: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """TinyLM forward with every layer's attention sequence-sharded over
    `axis`. tokens: [B, S] int32 -> logits [B, S, vocab] (sharded over
    axis on S), or (logits, (gates [L,B,S,G,3], sel_idx [L,B,S,G,n]))
    with collect_aux — gate/selection observability stays live under CP
    (the watchdog's gate-collapse detection depends on it). Embedding /
    norms / MLP / LM head are per-token and run on local shards; only the
    attention gathers K/V over ICI.

    The reference has no model-level sequence parallelism at all — this
    is the pod-scale long-context training path the north star requires.
    """
    from nsa_vibe_tpu.models.llama_block import mlp, rmsnorm

    cfg = mcfg.nsa
    B, S = tokens.shape
    sp = mesh.shape[axis]
    if S % sp != 0 or (S // sp) % cfg.l_sel != 0:
        raise ValueError(f"S={S} must split into sp={sp} l_sel-aligned shards")
    meta = build_block_meta(S, cfg.l, cfg.d, cfg.l_sel, cfg.n_sel, cfg.w)
    S_cmp = int(num_cmp_blocks(S, cfg.l, cfg.d))
    M = jnp.asarray(meta.M_csl[:S_cmp])
    impl, interpret = resolve_kernel(cfg.kernel, cfg.h_per_group)
    dtype = jnp.dtype(mcfg.dtype)

    def local_fn(params, tok_local, ds_full):
        x = params["embed"][tok_local].astype(dtype)

        # remat contract mirrors tinylm/llama_block: True/"full" checkpoints
        # the whole block; "mlp" checkpoints only the MLP (keeps the Pallas
        # attention forwards out of the backward recompute — measured +26%
        # at S=8192)
        mlp_fn = jax.checkpoint(mlp) if mcfg.remat == "mlp" else mlp

        def run_block(bp, x):
            h = rmsnorm(x, bp["attn_norm"], mcfg.rmsnorm_eps)
            a = nsa_attention_cp_local(
                bp["attn"], h, cfg, axis, S, S_cmp, meta.S_sel, M, impl,
                interpret, collect_aux=collect_aux, seq_start_full=ds_full,
            )
            a, aux = a if collect_aux else (a, None)
            x = x + a
            x = x + mlp_fn(bp["mlp"], rmsnorm(x, bp["mlp_norm"], mcfg.rmsnorm_eps))
            return x, aux

        if mcfg.remat in (True, "full"):
            run_block = jax.checkpoint(run_block)
        auxes = []
        for bp in params["blocks"]:
            x, aux = run_block(bp, x)
            auxes.append(aux)
        x = rmsnorm(x, params["final_norm"], mcfg.rmsnorm_eps)
        logits = x @ params["lm_head"]
        if collect_aux:
            gates = jnp.stack([a["gates"] for a in auxes])     # [L,B,Sl,G,3]
            sel = jnp.stack([a["sel_idx"] for a in auxes])     # [L,B,Sl,G,n]
            return logits, gates, sel
        return logits

    spec = P(batch_axis, axis)
    # seq_start rides in REPLICATED over sp (each shard needs the full-S
    # document starts for pooling positions), sharded over dp on batch
    ds_spec = P(batch_axis, None)
    if seq_start is None:
        # a dummy replicated operand keeps ONE shard_map signature; the
        # local fn ignores it when varlen is off
        seq_start = jnp.zeros((0, 0), jnp.int32)
        ds_spec = P(None, None)
        inner = lambda p, t, _: local_fn(p, t, None)   # noqa: E731
    else:
        inner = local_fn
    logits_spec = P(batch_axis, axis, None)
    if collect_aux:
        aux_spec = P(None, batch_axis, axis, None, None)
        logits, gates, sel = shard_map(
            inner, mesh=mesh,
            in_specs=(P(), spec, ds_spec),
            out_specs=(logits_spec, aux_spec, aux_spec),
            check_rep=False,
        )(params, tokens, seq_start)
        return logits, (gates, sel)
    return shard_map(
        inner, mesh=mesh,
        in_specs=(P(), spec, ds_spec),
        out_specs=logits_spec,
        check_rep=False,
    )(params, tokens, seq_start)
