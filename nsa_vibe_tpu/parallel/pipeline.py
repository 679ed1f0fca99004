"""Pipeline parallelism over a mesh `pp` axis (GPipe-style microbatching).

The reference scales with DDP/FSDP only (SURVEY.md §2.4: no TP/PP/SP
anywhere in the tree). This module adds the remaining mesh dimension for
pod-scale training: transformer blocks are split into `pp` contiguous
stages, microbatches flow stage-to-stage over ICI via `ppermute`, and
XLA differentiates the whole schedule (the backward pipeline falls out
of autodiff of the forward scan — `ppermute` transposes to the reverse
permutation, `lax.scan` to a reverse-time scan).

Design (idiomatic SPMD pipelining, cf. the public scaling-book recipe):

  * per-layer block params are STACKED on a leading [L] axis and sharded
    over `pp` (each stage holds L/pp layers; `stack_blocks` /
    `unstack_blocks` convert to/from the list-of-dicts layout used
    everywhere else, so checkpoints and inits stay shared);
  * one program runs on every stage: at tick t, stage p computes
    microbatch t-p (bubble ticks compute on zeros and are masked out);
    stage 0 ingests embeddings, stage pp-1 accumulates outputs;
  * embedding / final norm / LM head are replicated (they are tiny next
    to the blocks) and the loss is computed on the last stage, then
    psum-broadcast — activations never round-trip to the host;
  * composes with data parallelism (mesh ("dp","pp","sp","tp"), batch
    rows over dp), with FSDP/ZeRO-3 (stage weights sharded over dp,
    all-gathered inside jit), with varlen/document-masked batches
    (seq_start rides with each microbatch through the stage scan), and
    with sequence/context parallelism (sp>1: every stage's attention runs
    sequence-sharded via nsa_attention_cp_local; activations, ppermute
    transfers and the loss head operate on S/sp slices — the pod
    long-context configuration), and with tensor parallelism (tp>1: each
    tp member holds G/tp kv groups — projection columns are group-major,
    so the shard_map weight slice IS the local groups — plus 1/tp of the
    MLP hidden; one psum over tp per sub-block completes the partial
    W_O / down-proj products, and the shard_map transpose psums the
    replicated leaves' grads across tp, verified exact). pp×sp×tp —
    all three in one mesh (the >350M long-context pod config) — composes
    the two: each tp member runs its local kv groups sequence-sharded
    over sp (K/V sp-gathers move only local groups), then one tp psum
    per sub-block; parity-tested on the 8-device mesh
    (tests/test_pipeline.py::test_pp_sp_tp_*).

Bubble fraction is (pp-1)/(M+pp-1) for M microbatches per step; M
defaults to the accumulated batch's natural split (tcfg.pp_microbatches
or pp). Decode/generation stays single-stage (pipelining a 1-token step
is all bubble); pp is a training-throughput feature.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nsa_vibe_tpu.core.config import ModelConfig
from nsa_vibe_tpu.models.llama_block import block_prefill, mlp, rmsnorm
from nsa_vibe_tpu.models.tinylm import cross_entropy_numden
from nsa_vibe_tpu.parallel.context import nsa_attention_cp_local, shard_map


def stack_blocks(params: dict) -> dict:
    """List-of-per-layer-dicts -> one pytree with leading [L] axes."""
    blocks: List[dict] = params["blocks"]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    return {**params, "blocks": stacked}


def unstack_blocks(params: dict, n_layers: int) -> dict:
    """Inverse of stack_blocks (checkpoint interchange with the
    list-layout consumers: model_forward, generate, eval)."""
    blocks = [
        jax.tree_util.tree_map(lambda x: x[i], params["blocks"])
        for i in range(n_layers)
    ]
    return {**params, "blocks": blocks}


def _fsdp_axis(shape_per_layer, fsdp_size: int, fsdp_min: int, skip: int = -1):
    """Largest per-layer axis that splits evenly over dp and is long
    enough (mesh._spec_for's min-wrap rule); -1 = stay replicated.
    `skip`: axis already taken by tp — fsdp must pick another."""
    for i in sorted(range(len(shape_per_layer)), key=lambda i: -shape_per_layer[i]):
        if i == skip:
            continue
        if shape_per_layer[i] >= fsdp_min and shape_per_layer[i] % fsdp_size == 0:
            return i
    return -1


# per-layer tp-shard axes for block leaves (pp×tp: heads/groups shard
# over tp on the projection column/row blocks — columns are group-major,
# so an even split over tp assigns whole kv groups to each member; MLP
# shards its hidden axis). Everything else (norms, gate MLP, conv ϕ)
# is replicated: those weights are shared across groups, each tp member
# applies them to its local groups, and the shard_map transpose psums
# their grads across tp (verified exact vs global autodiff).
_TP_AXES = {
    ("attn", "W_Q"): 1, ("attn", "W_K_sel"): 1, ("attn", "W_V_sel"): 1,
    ("attn", "W_K_win"): 1, ("attn", "W_V_win"): 1,
    ("attn", "W_K_cmp"): 1, ("attn", "W_V_cmp"): 1,
    ("attn", "W_O"): 0,
    ("mlp", "w_in"): 1, ("mlp", "w_out"): 0,
}


def _tp_axis_of(path) -> int:
    """Per-layer tp axis for a stacked-blocks leaf path (-1 = replicated).
    path: tree_util key path WITHIN the blocks subtree (no leading [L])."""
    names = [k.key for k in path if hasattr(k, "key")]
    for (top, leaf), ax in _TP_AXES.items():
        if top in names and names[-1] == leaf:
            return ax
    return -1


def fsdp_axes_tree(params_stacked: dict, fsdp_size: int, fsdp_min: int = 512,
                   tp_size: int = 1):
    """Per-LAYER dp-shard axis for every stacked block leaf (int, -1 =
    replicated) — consumed by the in-scan all_gather and by the specs.
    With tp_size > 1 the leaf's tp axis is excluded."""
    return jax.tree_util.tree_map_with_path(
        lambda p, a: _fsdp_axis(
            a.shape[1:], fsdp_size, fsdp_min,
            skip=_tp_axis_of(p) if tp_size > 1 else -1),
        params_stacked["blocks"],
    )


def pipeline_param_specs(params_stacked: dict, fsdp_size: int = 1,
                         fsdp_min: int = 512, tp_size: int = 1) -> dict:
    """PartitionSpec pytree: stacked blocks shard their leading layer
    axis over pp; with tp_size > 1 projection/MLP leaves additionally
    shard heads/hidden over tp (_TP_AXES); with fsdp_size > 1 each block
    leaf additionally shards its largest remaining per-layer axis over
    dp (ZeRO-3 for params + optimizer state — the per-layer
    all_gather/reduce_scatter happens inside the stage scan). Embed/head
    stay replicated (tiny at byte vocab)."""

    def blk_spec(path, a):
        spec = ["pp"] + [None] * (a.ndim - 1)
        tp_ax = _tp_axis_of(path) if tp_size > 1 else -1
        if tp_ax >= 0:
            spec[tp_ax + 1] = "tp"
        if fsdp_size > 1:
            ax = _fsdp_axis(a.shape[1:], fsdp_size, fsdp_min, skip=tp_ax)
            if ax >= 0:
                spec[ax + 1] = "dp"
        while len(spec) > 1 and spec[-1] is None:
            spec.pop()
        return P(*spec)

    return {
        k: (jax.tree_util.tree_map_with_path(blk_spec, v) if k == "blocks"
            else jax.tree_util.tree_map(lambda _: P(), v))
        for k, v in params_stacked.items()
    }


def pipeline_param_shardings(params_stacked: dict, mesh: Mesh,
                             fsdp: bool = False, fsdp_min: int = 512) -> dict:
    fsdp_size = mesh.shape["dp"] if fsdp else 1
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s),
        pipeline_param_specs(params_stacked, fsdp_size, fsdp_min,
                             tp_size=mesh.shape.get("tp", 1)),
        is_leaf=lambda x: isinstance(x, P),
    )


def _pipeline_local(params, toks, mcfg: ModelConfig, M: int, pp: int,
                    collect_aux: bool, fsdp_axes=None, seq_start=None,
                    loss_mask=None, cp=None, tp: int = 1):
    """Runs INSIDE shard_map on every (dp, pp[, sp]) mesh member.
    toks: this dp shard's [B_local, S+1] rows (replicated over pp and sp).
    seq_start/loss_mask [B_local, S]: varlen document starts + supervised
    mask (ops.varlen) — seq_start rides with each microbatch through the
    stage scan; loss masking happens on the last stage only.
    cp (pp×sp composition): dict(axis, sp, S_cmp, S_sel, M_csl, impl,
    interpret) — each stage's attention runs sequence-sharded via
    nsa_attention_cp_local (K/V all-gathered over sp inside each block);
    activations, ppermute transfers and the loss head all operate on this
    shard's S/sp token slice.
    Returns (loss, gates [L,B_local,S_loc,G,3] | None, sel | None);
    loss is psum'd over pp (and sp) and num/den-psum'd over dp."""
    cfg = mcfg.nsa
    if tp > 1:
        # pp×tp: each member holds G/tp kv groups (heads follow their
        # group — projection columns are group-major, so the shard_map
        # slice of the tp-sharded weights IS the local groups' slice)
        # and 1/tp of the MLP hidden. nsa_prefill with the local config
        # produces the PARTIAL W_O product; one psum over tp per
        # sub-block completes it. Norm/gate/ϕ weights are replicated and
        # applied to local groups; the shard_map transpose psums their
        # grads across tp (verified exact vs global autodiff).
        import dataclasses
        cfg = dataclasses.replace(cfg, n_heads=cfg.n_heads // tp,
                                  n_kv_groups=cfg.n_kv_groups // tp)
    B, S1 = toks.shape
    S = S1 - 1
    Bm = B // M
    dtype = jnp.dtype(mcfg.dtype)
    p = jax.lax.axis_index("pp")
    varlen = seq_start is not None

    inp_tok = toks[:, :-1].reshape(M, Bm, S)
    if cp is not None:
        # embed only this sp shard's token slice; seq_start stays FULL-S
        # (ϕ-pooling positions span shard boundaries — see
        # nsa_attention_cp_local)
        S_loc = S // cp["sp"]
        t0s = jax.lax.axis_index(cp["axis"]).astype(jnp.int32) * S_loc
        inp_loc = jax.lax.dynamic_slice_in_dim(inp_tok, t0s, S_loc, axis=2)
        x_mb = params["embed"][inp_loc].astype(dtype)      # [M,Bm,S_loc,D]
    else:
        S_loc = S
        t0s = None
        x_mb = params["embed"][inp_tok].astype(dtype)      # [M,Bm,S,D]
    ss_mb = seq_start.reshape(M, Bm, S) if varlen else None
    blocks = params["blocks"]                              # leaves [Lp, ...]
    Lp = blocks["attn_norm"].shape[0]

    def run_block(x, bp, ss):
        if fsdp_axes is not None:
            # ZeRO-3: gather ONE layer's dp-sharded weights just-in-time
            # (backward transposes to reduce_scatter); peak weight
            # residency is a single layer, optimizer state stays sharded
            bp = jax.tree_util.tree_map(
                lambda a, ax: a if ax < 0 else jax.lax.all_gather(
                    a, "dp", axis=ax, tiled=True),
                bp, fsdp_axes)
        if cp is not None:
            # sequence-sharded pre-norm residual block (mirrors
            # context.context_parallel_model_forward's run_block). With
            # tp > 1 on top (pp×sp×tp — the >350M long-context pod
            # config), cfg is already tp-local (G/tp kv groups), so the
            # cp-local attention's combine produces the PARTIAL W_O
            # product over local heads and its K/V sp-gathers move only
            # the local groups; one psum over tp completes each
            # sub-block, exactly as in the pure pp×tp path below.
            a = nsa_attention_cp_local(
                bp["attn"], rmsnorm(x, bp["attn_norm"], mcfg.rmsnorm_eps),
                cfg, cp["axis"], S, cp["S_cmp"], cp["S_sel"], cp["M_csl"],
                cp["impl"], cp["interpret"], collect_aux=collect_aux,
                seq_start_full=ss)
            a, aux = a if collect_aux else (a, None)
            if tp > 1:
                a = jax.lax.psum(a, "tp")
            y = x + a.astype(x.dtype)
            mlp_fn = jax.checkpoint(mlp) if mcfg.remat == "mlp" else mlp
            m = mlp_fn(bp["mlp"], rmsnorm(y, bp["mlp_norm"], mcfg.rmsnorm_eps))
            if tp > 1:
                m = jax.lax.psum(m, "tp")
            y = (y + m).astype(x.dtype)
        elif tp > 1:
            # tensor-sharded pre-norm residual block: local-group
            # attention partial + psum, local-hidden MLP partial + psum
            from nsa_vibe_tpu.core.nsa import nsa_prefill as _nsa_prefill
            a, aux = _nsa_prefill(
                bp["attn"], rmsnorm(x, bp["attn_norm"], mcfg.rmsnorm_eps),
                cfg, seq_start=ss)
            y = x + jax.lax.psum(a, "tp").astype(x.dtype)
            mlp_fn = jax.checkpoint(mlp) if mcfg.remat == "mlp" else mlp
            m = mlp_fn(bp["mlp"], rmsnorm(y, bp["mlp_norm"], mcfg.rmsnorm_eps))
            y = (y + jax.lax.psum(m, "tp")).astype(x.dtype)
        else:
            y, aux = block_prefill(bp, x, mcfg, seq_start=ss)
            y = y.astype(x.dtype)  # residual adds promote; carry is fixed
        if not collect_aux:
            return y, 0
        return y, {"gates": aux["gates"].astype(jnp.float32),
                   "sel_idx": aux["sel_idx"]}

    if mcfg.remat in (True, "full"):
        run_block = jax.checkpoint(run_block)

    def run_stage(x, ss):
        return jax.lax.scan(lambda c, bp: run_block(c, bp, ss), x, blocks)

    D = cfg.dim
    G, n = cfg.n_kv_groups, cfg.n_sel
    state0 = jnp.zeros((Bm, S_loc, D), dtype)

    def tick(state, t):
        inp = jnp.where(p == 0, x_mb[jnp.clip(t, 0, M - 1)], state)
        # stage p computes microbatch t-p at tick t — its seq_start must
        # follow the activation down the pipeline (bubble ticks read a
        # clipped garbage microbatch; their outputs are sliced away)
        ss = ss_mb[jnp.clip(t - p, 0, M - 1)] if varlen else None
        y, auxes = run_stage(inp, ss)
        # hand this tick's activation to the next stage (no wraparound:
        # stage 0 reads embeddings, so its ppermute receive — zeros — is
        # dead; XLA overlaps the transfer with the next tick's compute)
        state = jax.lax.ppermute(y, "pp", [(i, i + 1) for i in range(pp - 1)])
        return state, (y, auxes)

    # scan stacks every tick's stage output; the valid window is a SLICE
    # of the tick axis (stage p computes microbatch t-p at tick t), so no
    # per-tick buffer writes/selects are needed: on the last stage ticks
    # [pp-1, pp-1+M) are the final-layer outputs of microbatches 0..M-1.
    _, (y_ticks, aux_ticks) = jax.lax.scan(
        tick, state0, jnp.arange(M + pp - 1))
    out_buf = y_ticks[pp - 1:]                              # [M,Bm,S,D]

    # loss: head + CE run ONLY on the last stage (lax.cond — other
    # stages' tick outputs are bubble garbage; skipping avoids both the
    # wasted [M,Bm,S,V] logits work and inf-CE-on-garbage poisoning the
    # psum, since a multiplicative 0-mask would still be inf*0 = NaN).
    # num/den travel separately so the mask-weighted varlen ratio is the
    # GLOBAL ratio even when documents pack unevenly across dp shards.
    labels = toks[:, 1:].reshape(M, Bm, S)
    if cp is not None:
        labels = jax.lax.dynamic_slice_in_dim(labels, t0s, S_loc, axis=2)
        if loss_mask is not None:
            loss_mask = jax.lax.dynamic_slice_in_dim(
                loss_mask, t0s, S_loc, axis=1)

    def _head_numden(out_buf):
        x = rmsnorm(out_buf, params["final_norm"], mcfg.rmsnorm_eps)
        logits = x @ params["lm_head"]                      # [M,Bm,S_loc,V]
        num, den = cross_entropy_numden(
            logits.reshape(B, S_loc, -1), labels.reshape(B, S_loc),
            mask=loss_mask)
        return jnp.stack([num, den])

    nd = jax.lax.cond(
        p == pp - 1, _head_numden, lambda _: jnp.zeros((2,), jnp.float32),
        out_buf)
    nd = jax.lax.psum(nd, "pp")
    if cp is not None:
        nd = jax.lax.psum(nd, cp["axis"])
    nd = jax.lax.psum(nd, "dp")
    loss = nd[0] / jnp.maximum(nd[1], 1.0)

    if not collect_aux:
        z = jnp.zeros((), jnp.float32)
        return loss, z, z
    # stage p's valid ticks are [p, p+M): one dynamic slice on the
    # stacked tick axis recovers its microbatch-ordered aux
    g_buf = jax.lax.dynamic_slice_in_dim(aux_ticks["gates"], p, M, 0)
    s_buf = jax.lax.dynamic_slice_in_dim(aux_ticks["sel_idx"], p, M, 0)
    gates = g_buf.transpose(1, 0, 2, 3, 4, 5).reshape(Lp, B, S_loc, G, 3)
    sel = s_buf.transpose(1, 0, 2, 3, 4, 5).reshape(Lp, B, S_loc, G, n)
    # stage-major layer order == global layer order (stage s holds layers
    # [s*Lp, (s+1)*Lp)), so a tiled gather on the layer axis reassembles L
    gates = jax.lax.all_gather(gates, "pp", axis=0, tiled=True)
    sel = jax.lax.all_gather(sel, "pp", axis=0, tiled=True)
    if tp > 1:
        # reassemble the full group axis from the tp members' local groups
        gates = jax.lax.all_gather(gates, "tp", axis=3, tiled=True)
        sel = jax.lax.all_gather(sel, "tp", axis=3, tiled=True)
    return loss, gates, sel


def pipeline_model_loss(
    params_stacked: dict,
    tokens: jnp.ndarray,
    mcfg: ModelConfig,
    mesh: Mesh,
    microbatches: int = 0,
    collect_aux: bool = False,
    fsdp: bool = False,
    fsdp_min: int = 512,
    seq_start: Optional[jnp.ndarray] = None,
    loss_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional[Tuple[jnp.ndarray, jnp.ndarray]]]:
    """Pipeline-parallel loss. tokens: [B, S+1] int32 (B = global batch,
    sharded over dp). params_stacked: stack_blocks() layout with blocks
    sharded over pp. Differentiable; grads come back with the params'
    shardings (stage-local block grads, psum'd replicated grads for
    embed/head — the transpose of the replicated in_spec).

    seq_start/loss_mask [B, S] (both or neither): varlen/document-masked
    batches (ops.varlen.make_varlen_batches) — document-local attention
    rides with each microbatch; padding is loss-masked on the last stage.

    Returns (loss, (gates [L,B,S,G,3], sel_idx [L,B,S,G,n]) | None) —
    the same observability contract as model_forward(collect_aux=True),
    so the watchdog's gate-collapse detection stays live under pp."""
    pp = mesh.shape["pp"]
    if pp <= 1:
        raise ValueError("pipeline_model_loss needs a pp>1 mesh axis")
    tp = mesh.shape.get("tp", 1)
    sp = mesh.shape.get("sp", 1)
    if tp > 1:
        cfg_ = mcfg.nsa
        hidden = int(cfg_.dim * mcfg.mlp_ratio)
        if cfg_.n_kv_groups % tp != 0 or hidden % tp != 0:
            raise ValueError(
                f"tp={tp} must divide n_kv_groups={cfg_.n_kv_groups} "
                f"and mlp hidden={hidden}")
    cp = None
    if sp > 1:
        # pp×sp: every stage's attention runs sequence-sharded over sp
        # (the pod long-context configuration — pipeline stages over one
        # mesh axis, sequence shards over the other)
        from nsa_vibe_tpu.ops.attention import resolve_kernel
        from nsa_vibe_tpu.ops.block_index import build_block_meta, num_cmp_blocks

        cfg = mcfg.nsa
        S = tokens.shape[1] - 1
        if S % sp != 0 or (S // sp) % cfg.l_sel != 0:
            raise ValueError(
                f"S={S} must split into sp={sp} l_sel-aligned shards")
        meta = build_block_meta(S, cfg.l, cfg.d, cfg.l_sel, cfg.n_sel, cfg.w)
        S_cmp = int(num_cmp_blocks(S, cfg.l, cfg.d))
        impl, interpret = resolve_kernel(cfg.kernel, cfg.h_per_group)
        cp = {"axis": "sp", "sp": sp, "S_cmp": S_cmp, "S_sel": meta.S_sel,
              "M_csl": jnp.asarray(meta.M_csl[:S_cmp]), "impl": impl,
              "interpret": interpret}
    L = mcfg.n_layers
    if L % pp != 0:
        raise ValueError(f"n_layers={L} not divisible by pp={pp}")
    dp = mesh.shape["dp"]
    B = tokens.shape[0]
    M = microbatches or pp
    if (B // dp) % M != 0:
        raise ValueError(
            f"per-dp-shard batch {B // dp} not divisible by microbatches={M}")

    fsdp_size = dp if (fsdp and dp > 1) else 1
    axes = (fsdp_axes_tree(params_stacked, fsdp_size, fsdp_min, tp_size=tp)
            if fsdp_size > 1 else None)
    varlen = seq_start is not None
    if varlen != (loss_mask is not None):
        raise ValueError("seq_start and loss_mask must be passed together")

    sp_ax = "sp" if cp is not None else None
    aux_spec = P(None, "dp", sp_ax, None, None)
    out_specs = (P(), aux_spec, aux_spec) if collect_aux else (P(), P(), P())
    param_specs = pipeline_param_specs(params_stacked, fsdp_size, fsdp_min,
                                       tp_size=tp)
    if varlen:
        def local_fn(params, toks, ss, lm):
            return _pipeline_local(params, toks, mcfg, M, pp, collect_aux,
                                   fsdp_axes=axes, seq_start=ss, loss_mask=lm,
                                   cp=cp, tp=tp)

        loss, gates, sel = shard_map(
            local_fn, mesh=mesh,
            in_specs=(param_specs, P("dp", None), P("dp", None), P("dp", None)),
            out_specs=out_specs, check_rep=False,
        )(params_stacked, tokens, seq_start, loss_mask)
    else:
        def local_fn(params, toks):
            return _pipeline_local(params, toks, mcfg, M, pp, collect_aux,
                                   fsdp_axes=axes, cp=cp, tp=tp)

        loss, gates, sel = shard_map(
            local_fn, mesh=mesh,
            in_specs=(param_specs, P("dp", None)),
            out_specs=out_specs, check_rep=False,
        )(params_stacked, tokens)
    return loss, ((gates, sel) if collect_aux else None)
