"""Functional NSA attention module.

The TPU-native replacement for the reference's 1855-line NSAAttention
(nsa/core/nsa_attention.py): a pure function over a parameter pytree with
two entry points — batched prefill and single-token decode (decode lives
in nsa_vibe_tpu.core.decode). No env-flag routing ladder: one kernel path
(Pallas) with the jnp reference oracle selectable via config.

Layouts: x [B, S, dim] -> out [B, S, dim].
  Q: [B, S, G, h, Dk] (RoPE'd);  per-branch K/V: [B, G, S, D*].
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nsa_vibe_tpu.core.config import NSAConfig
from nsa_vibe_tpu.core.gate import gate_probs, init_gate_params
from nsa_vibe_tpu.ops import attention as attn_ops
from nsa_vibe_tpu.ops.attention import resolve_kernel as _resolve_kernel
from nsa_vibe_tpu.ops.block_index import BlockMeta, build_block_meta, num_cmp_blocks
from nsa_vibe_tpu.ops.tuning import tuned
from nsa_vibe_tpu.ops.compress import init_conv_phi_weight, pool_phi_rope_kv
from nsa_vibe_tpu.ops.rope import apply_rope
from nsa_vibe_tpu.ops.selection import select_topn_blocks, selection_scores


def _uniform_linear(key, fan_in: int, fan_out: int, dtype) -> jnp.ndarray:
    lim = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, (fan_in, fan_out), dtype, -lim, lim)


def init_nsa_params(key: jax.Array, cfg: NSAConfig, dtype=jnp.float32) -> dict:
    """Parameter pytree: 7 projections + out + gate (+ optional conv ϕ)."""
    H, G = cfg.n_heads, cfg.n_kv_groups
    keys = jax.random.split(key, 9)
    params = {
        "W_Q": _uniform_linear(keys[0], cfg.dim, H * cfg.d_k, dtype),
        "W_K_sel": _uniform_linear(keys[1], cfg.dim, G * cfg.d_k, dtype),
        "W_V_sel": _uniform_linear(keys[2], cfg.dim, G * cfg.d_v, dtype),
        "W_K_win": _uniform_linear(keys[3], cfg.dim, G * cfg.d_k, dtype),
        "W_V_win": _uniform_linear(keys[4], cfg.dim, G * cfg.d_v, dtype),
        "W_K_cmp": _uniform_linear(keys[5], cfg.dim, G * cfg.d_k, dtype),
        "W_V_cmp": _uniform_linear(keys[6], cfg.dim, G * cfg.d_v, dtype),
        "W_O": _uniform_linear(keys[7], H * cfg.d_v, cfg.dim, dtype),
        "gate": init_gate_params(keys[8], cfg.d_k, cfg.gate_hidden, dtype),
    }
    if cfg.phi == "conv":
        params["phi_k"] = init_conv_phi_weight(cfg.d_k, cfg.l, dtype)
        params["phi_v"] = init_conv_phi_weight(cfg.d_v, cfg.l, dtype)
    return params


def project_qkv(params: dict, x: jnp.ndarray, cfg: NSAConfig,
                fused: Optional[bool] = None):
    """All 7 projections. Returns Q [B,S,H,Dk] (no RoPE yet) and per-branch
    K/V in [B,G,S,D*] layout (no RoPE yet).

    With `proj.fused` (kernel_tuning) the seven weights are concatenated
    at trace time into ONE [dim, H*Dk + 3G*(Dk+Dv)] matmul: the
    per-branch K/V projections are [dim, G*D] slivers (128 columns at
    m7c), and running them separately re-reads the x activation (50 MB
    at m7c/B16/S2048) seven times in forward and accumulates dx in seven
    passes in backward. Output columns are independent, so slicing the
    fused product is numerically identical per branch. Params stay
    separate leaves (checkpoint layout, per-branch init)."""
    B, S, _ = x.shape
    G = cfg.n_kv_groups
    dk, dv = cfg.d_k, cfg.d_v
    if tuned("proj.fused", 0) if fused is None else fused:
        W = jnp.concatenate(
            [params["W_Q"],
             params["W_K_sel"], params["W_V_sel"],
             params["W_K_win"], params["W_V_win"],
             params["W_K_cmp"], params["W_V_cmp"]], axis=1)
        Y = x @ W                           # [B, S, H*Dk + 3G*(Dk+Dv)]
        nq = cfg.n_heads * dk

        def kvf(off, dd):
            return (Y[..., off:off + G * dd]
                    .reshape(B, S, G, dd).transpose(0, 2, 1, 3))

        Q = Y[..., :nq].reshape(B, S, cfg.n_heads, dk)
        outs = []
        o = nq
        for dd in (dk, dv, dk, dv, dk, dv):  # sel K/V, win K/V, cmp K/V
            outs.append(kvf(o, dd))
            o += G * dd
        return (Q, *outs)

    def kv(w, dd):
        return (x @ w).reshape(B, S, G, dd).transpose(0, 2, 1, 3)

    Q = (x @ params["W_Q"]).reshape(B, S, cfg.n_heads, cfg.d_k)
    return (
        Q,
        kv(params["W_K_sel"], cfg.d_k), kv(params["W_V_sel"], cfg.d_v),
        kv(params["W_K_win"], cfg.d_k), kv(params["W_V_win"], cfg.d_v),
        kv(params["W_K_cmp"], cfg.d_k), kv(params["W_V_cmp"], cfg.d_v),
    )


def combine_branches(
    params: dict, cfg: NSAConfig, Q: jnp.ndarray,
    O_cmp: jnp.ndarray, O_sel: jnp.ndarray, O_win: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gate over the group-mean-pooled query, weighted branch sum, output
    projection. Q: [B,S,G,h,Dk]; O_*: [B,S,G,h,Dv]. Returns (out, gates)."""
    B, S, G, h, _ = Q.shape
    q_pooled = Q.mean(axis=3)  # [B,S,G,Dk]
    gates = gate_probs(
        params["gate"], q_pooled, cfg.gate_temp,
        force_branch=cfg.force_branch, force_uniform=cfg.force_uniform_gate,
    )  # [B,S,G,3]
    if tuned("nsa.flat_combine", 0):
        # Flat [B,S,G,h*Dv] operands: the [.., h, 64] minor pair is
        # T(8,128)-tile padded (2.67x HBM bytes) and the combine fusions
        # run at bandwidth peak *for the padded size* (r4 profile,
        # broadcast_multiply/add_add ~0.8 ms each). h*Dv = 384 lanes is
        # unpadded. Same elementwise values — bit-exact.
        hv = h * cfg.d_v
        w_cmp = gates[..., 0][..., None]    # [B,S,G,1]
        w_sel = gates[..., 1][..., None]
        w_win = gates[..., 2][..., None]
        O = (w_cmp * O_cmp.reshape(B, S, G, hv)
             + w_sel * O_sel.reshape(B, S, G, hv)
             + w_win * O_win.reshape(B, S, G, hv))
    else:
        w_cmp = gates[..., 0][..., None, None]  # [B,S,G,1,1]
        w_sel = gates[..., 1][..., None, None]
        w_win = gates[..., 2][..., None, None]
        O = w_cmp * O_cmp + w_sel * O_sel + w_win * O_win
    out = O.reshape(B, S, cfg.n_heads * cfg.d_v) @ params["W_O"]
    return out, gates


def nsa_prefill(
    params: dict,
    x: jnp.ndarray,
    cfg: NSAConfig,
    meta: Optional[BlockMeta] = None,
    pos_offset: int = 0,
    seq_start: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, dict]:
    """Batched prefill forward (the training hot path; reference
    _forward_prefill_batched, nsa_attention.py:978-1448).

    x: [B, S, dim]. Returns (out [B, S, dim], aux) where aux carries the
    raw/compressed K/V (for cache seeding), selection indices and gates.

    seq_start [B, S] int32 (optional): per-token document starts for
    varlen/document-masked packed batching (ops.varlen; reference
    cu_seqlens surface, nsa/core/collate.py:6-44). Positions restart per
    document (RoPE at t - seq_start) and no attention crosses a document
    boundary. Document starts must be l_sel-aligned
    (varlen.pack_documents_aligned). Requires pos_offset == 0.
    """
    B, S, _ = x.shape
    if meta is None:
        meta = build_block_meta(S + pos_offset, cfg.l, cfg.d, cfg.l_sel, cfg.n_sel, cfg.w)
    G, h = cfg.n_kv_groups, cfg.h_per_group
    scale = 1.0 / float(np.sqrt(cfg.d_k))
    t_pos = jnp.arange(pos_offset, pos_offset + S, dtype=jnp.int32)
    varlen = seq_start is not None
    if varlen:
        if pos_offset != 0:
            raise ValueError("varlen prefill requires pos_offset == 0")
        seq_start = seq_start.astype(jnp.int32)
        t_local = t_pos[None, :] - seq_start                 # [B,S] doc-local
        rope_q_pos = t_local[:, :, None]                     # -> [B,S,H]
        rope_k_pos = t_local[:, None, :]                     # -> [B,G,S]
    else:
        rope_q_pos = t_pos[:, None]
        rope_k_pos = t_pos

    # profiling stage names mirror the reference's NVTX ranges
    # (nsa_attention.py:990-1121): proj+rope, phi, pcmp/map/topk, branches
    with jax.named_scope("nsa.proj_rope"):
        Q, K_sel, V_sel, K_win, V_win, K_cmp_raw, V_cmp_raw = project_qkv(params, x, cfg)
        # per-head RoPE (pos broadcast over the head axis). Note: the reference
        # ropes the *flattened* [S, H*Dk] query (nsa_attention.py:552), giving
        # each head a different frequency band than its K — we deliberately use
        # the correct per-head rotation instead.
        Q = apply_rope(Q, rope_q_pos, cfg.rope_base, cfg.rope_scale)
        Q = Q.reshape(B, S, G, h, cfg.d_k)
        K_sel = apply_rope(K_sel, rope_k_pos, cfg.rope_base, cfg.rope_scale)
        K_win = apply_rope(K_win, rope_k_pos, cfg.rope_base, cfg.rope_scale)

    # ϕ-compressed stream (RoPE inside, at doc-local absolute positions)
    with jax.named_scope("nsa.phi"):
        K_cmp, V_cmp = pool_phi_rope_kv(
            K_cmp_raw, V_cmp_raw, cfg.l, cfg.d, pos=rope_k_pos,
            k_weight=params.get("phi_k"), v_weight=params.get("phi_v"),
            rope_base=cfg.rope_base, rope_scale=cfg.rope_scale,
            exact=cfg.varlen_exact,
        )
    S_cmp = K_cmp.shape[2]
    # static per-position visible-compressed-token counts
    num_cmp_t = jnp.asarray(
        num_cmp_blocks(np.arange(pos_offset + 1, pos_offset + S + 1), cfg.l, cfg.d),
        dtype=jnp.int32,
    )
    num_cmp_t = jnp.minimum(num_cmp_t, S_cmp)

    # Eq. 8-12 selection. Pallas path: one fused scorer kernel (p_cmp never
    # hits HBM; iterative deterministic top-n in VMEM) producing the set
    # representation of selected blocks. XLA path: batched jnp pipeline,
    # optionally chunked over query chunks (reference
    # docs/NSA_CHUNKED_SELECTION_SPEC.md) so peak memory is
    # O(prefill_chunk * S_cmp).
    M = jnp.asarray(meta.M_csl[:S_cmp])
    impl, interpret = _resolve_kernel(cfg.kernel, cfg.h_per_group)
    from nsa_vibe_tpu.ops.pallas.scorer import scorer_fits_vmem

    # gate-epilogue fold: branch kernels emit g*O directly (combine
    # becomes a pure add) and the gate-logit gradient rides the delta
    # preprocess via the D-form softmax vjp (core.gate._softmax_dform) —
    # removes the per-branch dg reduce fusions and the padded gate
    # multiplies from the combine. Pallas-only; force overrides keep the
    # standard (constant-gate) combine.
    use_fold = (impl == "pallas" and bool(tuned("nsa.gate_fold", 0))
                and cfg.force_branch is None and not cfg.force_uniform_gate)
    # flat-IO (with the fold): branch kernels emit Y in the UNPADDED
    # [B, S, H*Dv] layout — the 5-D [.., h, Dv] (6,64) minor pair is
    # T(8,128) tile-padded to 2.67x physical HBM bytes at m7c shapes, on
    # every O write, dO read and combine fusion. The combine then feeds
    # W_O with no reshape at all. Requires even heads-per-group (odd h
    # pads a zero head whose flat slice-off would relayout).
    use_flat = (use_fold and bool(tuned("nsa.flat_io", 0))
                and (h % 2 == 0 or h == 1))
    gates_fold = None
    if use_fold:
        from nsa_vibe_tpu.core.gate import gate_probs_dform

        with jax.named_scope("nsa.gate"):
            gates_fold = gate_probs_dform(
                params["gate"], Q.mean(axis=3), cfg.gate_temp)  # [B,S,G,3] f32
    g_cmp = gates_fold[..., 0] if use_fold else None
    g_sel = gates_fold[..., 1] if use_fold else None
    g_win = gates_fold[..., 2] if use_fold else None

    # S_cmp == 0 (S < l): no compressed tokens — the fused kernel has no
    # K tiles to stream; fall through to the jnp path (whose scorer and
    # cmp branch both short-circuit to forced-blocks / zeros).
    use_fused = (impl == "pallas" and S_cmp > 0
                 and scorer_fits_vmem(h, meta.S_sel))
    O_cmp = None
    with jax.named_scope("nsa.score_select"):
        if use_fused:
            # one fused pass: selection scores AND the cmp branch output
            # share softmax(Q K_cmp^T) under the same prefix (+ doc, when
            # varlen) visibility
            sel_idx, O_cmp = attn_ops.fused_select_cmp(
                Q, K_cmp, V_cmp, M,
                scale=scale, l=cfg.l, d=cfg.d, l_sel=cfg.l_sel,
                n_top=cfg.n_sel, force_init=cfg.force_init,
                force_local=cfg.force_local, t_start=pos_offset,
                seq_start=seq_start, interpret=interpret, gate=g_cmp,
                flat=use_flat,
            )
        elif varlen:
            from nsa_vibe_tpu.ops.varlen import (
                select_topn_blocks_varlen,
                selection_scores_varlen,
            )

            p_grp = selection_scores_varlen(
                Q, K_cmp, M, scale, t_pos, seq_start, cfg.l, cfg.d)
            sel_idx = select_topn_blocks_varlen(
                p_grp, cfg.n_sel, t_pos, seq_start, cfg.l_sel,
                cfg.force_init, cfg.force_local)
        else:
            def score_and_select(q_c, t_c, nct_c):
                p_grp = selection_scores(q_c, K_cmp, M, scale, nct_c)  # [B,c,G,S_sel]
                return select_topn_blocks(
                    p_grp, cfg.n_sel, t_c, cfg.l_sel, cfg.force_init, cfg.force_local
                )

            chunk = cfg.prefill_chunk
            if chunk > 0 and S > chunk and S % chunk == 0:
                nchunk = S // chunk
                Qc = Q.reshape(B, nchunk, chunk, G, h, cfg.d_k).transpose(1, 0, 2, 3, 4, 5)
                tc = t_pos.reshape(nchunk, chunk)
                nctc = num_cmp_t.reshape(nchunk, chunk)
                sel_idx = jax.lax.map(lambda a: score_and_select(*a), (Qc, tc, nctc))
                sel_idx = sel_idx.transpose(1, 0, 2, 3, 4).reshape(B, S, G, cfg.n_sel)
            else:
                sel_idx = score_and_select(Q, t_pos, num_cmp_t)        # [B,S,G,n]
    sel_idx = jax.lax.stop_gradient(sel_idx)

    # three branches (Pallas on TPU, jnp reference oracle per cfg.kernel);
    # the cmp branch was already produced by the fused pass above
    if O_cmp is None:
        with jax.named_scope("nsa.branch_cmp"):
            O_cmp = attn_ops.compressed_attention(
                Q, K_cmp, V_cmp, num_cmp_t, cfg.l, cfg.d, scale, kernel=cfg.kernel,
                t_start=pos_offset, seq_start=seq_start, t_pos=t_pos,
                gate=(g_cmp if use_fold and S_cmp > 0 else None),
                flat=use_flat,
            )
            if use_fold and S_cmp == 0:
                # zero cmp branch: gated output is still zero, but the
                # gate logit must keep its (zero) D-form grad path — a
                # plain zeros O_cmp carries no g dependence, which is
                # exactly the true gradient here (D = rowsum(dO*0) = 0)
                pass
    with jax.named_scope("nsa.branch_sel"):
        O_sel = attn_ops.selection_attention(
            Q, K_sel, V_sel, sel_idx, t_pos, cfg.l_sel, scale, kernel=cfg.kernel,
            pos_offset=pos_offset, seq_start=seq_start, gate=g_sel,
            flat=use_flat,
        )
    with jax.named_scope("nsa.branch_win"):
        O_win = attn_ops.sliding_window_attention(
            Q, K_win, V_win, t_pos, cfg.w, scale, kernel=cfg.kernel,
            t_start=pos_offset, seq_start=seq_start, gate=g_win,
            flat=use_flat,
        )

    with jax.named_scope("nsa.gate_out"):
        if use_fold:
            # branches are pre-gated: combine is a pure add + projection
            O = O_cmp + O_sel + O_win
            if use_flat:
                out = O @ params["W_O"]       # already [B, S, H*Dv], no reshape
            else:
                out = O.reshape(B, S, cfg.n_heads * cfg.d_v) @ params["W_O"]
            # aux gates are DETACHED: their grad contract is the D-form
            # (only the gated-branch vjps may produce their cotangents)
            gates = jax.lax.stop_gradient(gates_fold)
        else:
            out, gates = combine_branches(params, cfg, Q, O_cmp, O_sel, O_win)
    aux = {
        "gates": gates,
        "sel_idx": sel_idx,
        "K_sel": K_sel, "V_sel": V_sel,
        "K_win": K_win, "V_win": V_win,
        "K_cmp_raw": K_cmp_raw, "V_cmp_raw": V_cmp_raw,
        "K_cmp": K_cmp, "V_cmp": V_cmp,
    }
    return out, aux
