"""Fused selection-scorer Pallas kernel: Eq. 8-12 in one pass.

The XLA pipeline materializes p_cmp [B,S,G,h,S_cmp] (50 MB at S=2048,
12.9 TB at 64k) and runs sort-based top-k — measured ~4 ms of a 4.4 ms
m7c layer. This kernel fuses, per (B, G, q-tile):

  logits = Q K_cmp^T  (chunked over S_cmp, online softmax)
  p_slc  = softmax(logits) @ M_csl          (Eq. 9, in VMEM)
  p_grp  = sum_h p_slc                      (Eq. 10)
  top-n  = forced blocks + k_rest iterative argmax over the composite
           score (f32 score - 1e-8 * index) — the deterministic
           tie-break recipe (reference selection_scorer.py:180-187)

and writes only sel_idx [B,S,G,n] int32. Output contract: forced slots
first (block 0, t//l_sel, t//l_sel-1 — may contain duplicates), then
scored picks in descending score order, -1 for exhausted rows. This is a
*set* representation: consumers (selection block-flash / token-mask
union) are order- and duplicate-insensitive. Use
ops.selection.canonicalize_sel for the sorted/unique/padded form.

Scoring is selection-only (top-k kills gradients in the reference too),
so the kernel is wrapped in stop_gradient by the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nsa_vibe_tpu.ops.pallas.flash import (
    LOG2E, _as_t0, _q_scale_fold, stats_rows, store_rows_flat,
)
from nsa_vibe_tpu.ops.pallas.sel_flash import _scale_on_q

NEG = float(np.finfo(np.float32).min)


def _scorer_kernel(
    t0_ref, *refs,
    scale: float, l: int, d: int, l_sel: int,
    n_top: int, n_forced: int, force_init: bool, force_local: int,
    block_q: int, h: int, cmp_chunk: int, n_chunks: int, s_cmp: int, s_sel: int,
    h_real=None, varlen: bool = False,
):
    """Grid-streamed over S_cmp chunks: the Eq. 9 map M is tiled through
    VMEM by BlockSpec one [cmp_chunk, S_sel] slab at a time, so S_cmp is
    unbounded (64k+ prefill) while the p_slc accumulator stays
    [rows, S_sel] in scratch.

    varlen (document-masked packing, ops.varlen contract): two extra
    lane-flat int operands carry per-FLAT-ROW and per-TOKEN document
    starts; a pooled window j is visible iff j*d >= ds (in addition to
    the prefix bound), and the top-n restricts candidates/forced blocks
    to the query's own document [ds // l_sel, t // l_sel]."""
    if varlen:
        (q_ref, kc_ref, m_ref, dsrow_ref, dstok_ref,
         o_ref, m_scr, l_scr, acc_scr) = refs
    else:
        q_ref, kc_ref, m_ref, o_ref, m_scr, l_scr, acc_scr = refs
        dsrow_ref = dstok_ref = None
    qt = pl.program_id(2)
    c = pl.program_id(3)
    q = q_ref[0, :, 0]                                    # [Tq, h, Dk]
    Dk = q.shape[2]
    qf = q.reshape(block_q * h, Dk)
    rows = block_q * h

    tpos = (t0_ref[0] + qt * block_q
            + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0))  # [Tq,1]
    # flat-row visibility bound (row r is token r//h): iota arithmetic
    # instead of a [Tq,1]->[rows,1] head-interleave relayout
    rowi = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    s_rawf = t0_ref[0] + qt * block_q + rowi // h + 1
    num_cmp_r = jnp.where(s_rawf >= l, (s_rawf - l) // d + 1, 0)      # [rows,1]

    @pl.when(c == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # --- online-softmax over this S_cmp chunk, accumulating p_slc = p @ M ---
    k = kc_ref[0, 0]                                                  # [C, Dk]
    qs, post = _q_scale_fold(qf, scale * LOG2E, _scale_on_q())
    logits = jax.lax.dot_general(
        qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                                                 # [rows, C] (base-2)
    if post != 1.0:
        logits = logits * post
    cidx = (c * cmp_chunk
            + jax.lax.broadcasted_iota(jnp.int32, (1, cmp_chunk), 1))
    visible = (cidx < num_cmp_r) & (cidx < s_cmp)                     # [rows, C]
    if varlen:
        # doc bound (varlen.cmp_mask_varlen): window j covers packed
        # [j*d, j*d+l) and is visible iff it starts inside the document
        # (the prefix bound above already enforces j*d + l <= t+1)
        lane = dsrow_ref[0, 0, :].reshape(1, block_q * h)
        ds_r = jax.lax.transpose(lane, (1, 0))                        # [rows,1]
        visible = visible & (cidx * d >= ds_r)
    logits = jnp.where(visible, logits, NEG)
    m_run = m_scr[:]
    m_new = jnp.maximum(m_run, jnp.max(logits, axis=-1, keepdims=True))
    p = jnp.where(visible, jnp.exp2(logits - m_new), 0.0)
    alpha = jnp.exp2(m_run - m_new)
    l_scr[:] = l_scr[:] * alpha + p.sum(axis=-1, keepdims=True)
    mc = m_ref[:]                                                     # [C, S_sel]
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p, mc, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_scr[:] = m_new

    @pl.when(c == n_chunks - 1)
    def _finalize():
        ds_t = None
        if varlen:
            ds_lane = dstok_ref[0, 0, :].reshape(1, block_q)
            ds_t = jax.lax.transpose(ds_lane, (1, 0))                 # [Tq,1]
        _scorer_topn(
            acc_scr[:], l_scr[:], tpos, o_ref,
            l_sel=l_sel, n_top=n_top, n_forced=n_forced,
            force_init=force_init, force_local=force_local,
            block_q=block_q, h=h, s_sel=s_sel, h_real=h_real, ds_t=ds_t,
        )


def _scorer_topn(acc, l_run, tpos, o_ref, *, l_sel, n_top, n_forced,
                 force_init, force_local, block_q, h, s_sel, h_real=None,
                 ds_t=None):
    p_slc = acc / jnp.where(l_run > 0, l_run, 1.0)
    p_slc = jnp.where(l_run > 0, p_slc, 0.0)                          # rows w/o cmp tokens
    if h_real is not None and h_real != h:
        # odd heads-per-group run with one zero-Q pad head (Mosaic can't
        # shape-cast [Tq,h,Dk]->[Tq*h,Dk] for odd h>1); its softmax is
        # uniform garbage — zero those rows so Eq. 10 sums real heads only
        ridx = jax.lax.broadcasted_iota(jnp.int32, (block_q * h, 1), 0)
        p_slc = jnp.where(ridx % h < h_real, p_slc, 0.0)
    p_grp = p_slc.reshape(block_q, h, s_sel).sum(axis=1)              # Eq. 10 [Tq, S_sel]

    # --- deterministic top-n with forced blocks (Eq. 11-12) ---
    blk = jax.lax.broadcasted_iota(jnp.int32, (1, s_sel), 1)          # [1, S_sel]
    valid = (blk * l_sel) <= tpos                                     # [Tq, S_sel]
    last_blk = tpos // l_sel                                          # [Tq,1]
    if ds_t is not None:
        # doc-local candidates (varlen.select_topn_blocks_varlen): the
        # forced "init" block is the FIRST BLOCK OF THE DOCUMENT, locals
        # clamp to it, and no pick may precede it
        first_blk = ds_t // l_sel                                     # [Tq,1]
        valid = valid & (blk >= first_blk)
    else:
        first_blk = jnp.zeros_like(last_blk)
    scores = jnp.where(valid, p_grp, NEG)
    forced_cols = []
    if force_init:
        forced_cols.append(first_blk)
    for i in range(force_local):
        forced_cols.append(jnp.maximum(last_blk - i, first_blk))
    fmask = jnp.zeros((block_q, s_sel), jnp.bool_)
    for fc in forced_cols:
        fmask = fmask | (blk == fc)
    scores = jnp.where(fmask, NEG, scores)
    composite = scores - blk.astype(jnp.float32) * 1e-8

    picks = [jnp.broadcast_to(fc, (block_q, 1)) for fc in forced_cols]
    k_rest = n_top - n_forced     # <= 0 -> forced slots only (n_out columns)
    lane = blk                                                        # [1, S_sel]
    for _ in range(k_rest):
        mx = jnp.argmax(composite, axis=-1).astype(jnp.int32)         # [Tq]
        val = jnp.max(composite, axis=-1)
        pick = jnp.where(val > NEG / 2, mx, -1)
        picks.append(pick[:, None])
        composite = jnp.where(lane == mx[:, None], NEG, composite)
    o_ref[0, 0] = jnp.concatenate(picks, axis=-1)                     # [Tq, n_top]


@functools.partial(
    jax.jit,
    static_argnames=("scale", "l", "d", "l_sel", "n_top", "force_init",
                     "force_local", "block_q", "cmp_chunk",
                     "interpret", "h_real"),
)
def nsa_select_pallas(
    Q: jnp.ndarray,        # [B, S, G, h, Dk]  (RoPE'd)
    K_cmp: jnp.ndarray,    # [B, G, S_cmp, Dk]
    M_csl: jnp.ndarray,    # [S_cmp, S_sel] float32
    *,
    scale: float,
    l: int, d: int, l_sel: int, n_top: int,
    force_init: bool = True, force_local: int = 2,
    pos_offset=0,          # int or traced int32 scalar (sequence sharding)
    block_q: int = 128,
    cmp_chunk: int = 512,
    interpret: bool = False,
    h_real: "int | None" = None,
    seq_start: "jnp.ndarray | None" = None,
) -> jnp.ndarray:
    """Returns sel_idx [B, S, G, max(n_top, n_forced)] int32 (set
    representation; see module docstring — width exceeds n_top when the
    forced init/local slots alone exceed it, matching
    ops.selection.select_topn_blocks). h_real: real head count when Q
    carries a zero pad head (odd heads-per-group; see
    attention._pad_odd_heads). seq_start [B,S]: per-token document
    starts (varlen packing, ops.varlen contract — requires
    pos_offset == 0)."""
    B, S, G, h, Dk = Q.shape
    S_cmp, S_sel = M_csl.shape
    varlen = seq_start is not None
    if S_cmp == 0:
        # no compressed tokens anywhere: forced blocks only
        from nsa_vibe_tpu.ops.selection import forced_block_ids

        t_pos = jnp.asarray(pos_offset, jnp.int32) + jnp.arange(S, dtype=jnp.int32)
        f = forced_block_ids(t_pos, l_sel, force_init, force_local)   # [S,F]
        F = f.shape[-1]
        f = jnp.broadcast_to(f[None, :, None, :], (B, S, G, F))
        if varlen:
            # doc-local forced slots: init -> first doc block, locals
            # clamp to it (varlen.select_topn_blocks_varlen semantics)
            first = (seq_start.astype(jnp.int32) // l_sel)[:, :, None, None]
            if force_init:
                f = f.at[..., :1].set(jnp.broadcast_to(first, (B, S, G, 1)))
            f = jnp.maximum(f, first)
        out = jnp.full((B, S, G, max(n_top, F)), -1, jnp.int32)
        return out.at[..., :F].set(f)

    block_q = min(block_q, max(S, 8))
    cmp_chunk = min(cmp_chunk, max(S_cmp, 8))
    nq = pl.cdiv(S, block_q)
    n_chunks = pl.cdiv(S_cmp, cmp_chunk)
    n_forced = (1 if force_init else 0) + force_local
    # the kernel emits the forced slots plus max(0, n_top - n_forced) top
    # picks — n_out columns; > n_top only for degenerate n_top < n_forced
    n_out = max(n_top, n_forced)
    rows = block_q * h

    # zero-pad the chunked axes: OOB block reads return garbage memory and
    # NaN garbage would survive the p @ M matmul even where p == 0
    pad = n_chunks * cmp_chunk - S_cmp
    M_f = M_csl.astype(jnp.float32)
    if pad:
        K_cmp = jnp.pad(K_cmp, ((0, 0), (0, 0), (0, pad), (0, 0)))
        M_f = jnp.pad(M_f, ((0, pad), (0, 0)))

    kernel = functools.partial(
        _scorer_kernel, scale=scale, l=l, d=d, l_sel=l_sel, n_top=n_top,
        n_forced=n_forced, force_init=force_init, force_local=force_local,
        block_q=block_q, h=h, cmp_chunk=cmp_chunk, n_chunks=n_chunks,
        s_cmp=S_cmp, s_sel=S_sel, h_real=h_real, varlen=varlen,
    )
    t0 = _as_t0(pos_offset)
    in_specs = [
        pl.BlockSpec((1, block_q, 1, h, Dk),
                     lambda b, g, qt, c, *_: (b, qt, g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, cmp_chunk, Dk),
                     lambda b, g, qt, c, *_: (b, g, c, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((cmp_chunk, S_sel), lambda b, g, qt, c, *_: (c, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [t0, Q, K_cmp, M_f]
    if varlen:
        ds_row, ds_tok = _scorer_varlen_operands(seq_start, S, block_q, nq, h)
        in_specs += [
            pl.BlockSpec((1, 1, rows), lambda b, g, qt, c, *_: (b, 0, qt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda b, g, qt, c, *_: (b, 0, qt),
                         memory_space=pltpu.VMEM),
        ]
        args += [ds_row, ds_tok]
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, G, nq, n_chunks),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1, block_q, n_out),
                                   lambda b, g, qt, c, *_: (b, g, qt, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((rows, 1), jnp.float32),
                pltpu.VMEM((rows, 1), jnp.float32),
                pltpu.VMEM((rows, S_sel), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, G, S, n_out), jnp.int32),
        interpret=interpret,
    )(*args)
    return out.transpose(0, 2, 1, 3)


def _scorer_varlen_operands(seq_start: jnp.ndarray, S: int, block_q: int,
                            nq: int, h: int):
    """seq_start [B,S] -> (ds_row [B,1,Sp*h] per-FLAT-ROW doc starts,
    ds_tok [B,1,Sp] per-token doc starts), edge-padded to the q-tile grid
    (same layout recipe as flash._varlen_operands)."""
    ds = seq_start.astype(jnp.int32)
    Sp = nq * block_q
    if Sp != S:
        ds = jnp.pad(ds, ((0, 0), (0, Sp - S)), mode="edge")
    ds_row = jnp.repeat(ds, h, axis=1)[:, None, :]
    return ds_row, ds[:, None, :]


def _select_cmp_kernel(
    t0_ref, *refs,
    scale: float, l: int, d: int, l_sel: int,
    n_top: int, n_forced: int, force_init: bool, force_local: int,
    block_q: int, h: int, cmp_chunk: int, n_chunks: int, s_cmp: int, s_sel: int,
    h_real=None, varlen: bool = False, gated: bool = False,
    flat_out: bool = False,
):
    """Fused Eq. 8-12 selection AND compressed-branch attention: both
    consume softmax(Q K_cmp^T) under the same prefix visibility, so one
    online-softmax pass feeds two accumulators — p @ M (-> top-n block
    ids) and p @ V_cmp (-> O_cmp + lse for the analytical backward).
    Halves the Q·K_cmp matmul/exp/mask work and drops one kernel launch
    per layer vs running scorer + cmp flash separately.

    varlen: see _scorer_kernel — the shared visibility gets the doc
    bound, so the O_cmp accumulator equals compressed_attention_varlen
    and the top-n restricts to the query's document."""
    refs = list(refs)
    if varlen:
        q_ref, kc_ref, vc_ref, m_ref, dsrow_ref, dstok_ref = refs[:6]
        refs = refs[6:]
    else:
        q_ref, kc_ref, vc_ref, m_ref = refs[:4]
        refs = refs[4:]
        dsrow_ref = dstok_ref = None
    if gated:
        g_ref, *refs = refs
    else:
        g_ref = None
    (o_sel_ref, o_cmp_ref, lse_ref, m_scr, l_scr, acc_slc, acc_o) = refs
    qt = pl.program_id(2)
    c = pl.program_id(3)
    q = q_ref[0, :, 0]                                    # [Tq, h, Dk]
    Dk = q.shape[2]
    qf = q.reshape(block_q * h, Dk)
    rows = block_q * h

    tpos = (t0_ref[0] + qt * block_q
            + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0))  # [Tq,1]
    # flat-row visibility bound (row r is token r//h): iota arithmetic
    # instead of a [Tq,1]->[rows,1] head-interleave relayout
    rowi = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    s_rawf = t0_ref[0] + qt * block_q + rowi // h + 1
    num_cmp_r = jnp.where(s_rawf >= l, (s_rawf - l) // d + 1, 0)      # [rows,1]

    @pl.when(c == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_slc[:] = jnp.zeros_like(acc_slc)
        acc_o[:] = jnp.zeros_like(acc_o)

    k = kc_ref[0, 0]                                                  # [C, Dk]
    qs, post = _q_scale_fold(qf, scale * LOG2E, _scale_on_q())
    logits = jax.lax.dot_general(
        qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                                                 # [rows, C] (base-2)
    if post != 1.0:
        logits = logits * post
    cidx = (c * cmp_chunk
            + jax.lax.broadcasted_iota(jnp.int32, (1, cmp_chunk), 1))
    visible = (cidx < num_cmp_r) & (cidx < s_cmp)                     # [rows, C]
    if varlen:
        lane = dsrow_ref[0, 0, :].reshape(1, block_q * h)
        ds_r = jax.lax.transpose(lane, (1, 0))                        # [rows,1]
        visible = visible & (cidx * d >= ds_r)
    logits = jnp.where(visible, logits, NEG)
    m_run = m_scr[:]
    m_new = jnp.maximum(m_run, jnp.max(logits, axis=-1, keepdims=True))
    p = jnp.where(visible, jnp.exp2(logits - m_new), 0.0)
    alpha = jnp.exp2(m_run - m_new)
    l_scr[:] = l_scr[:] * alpha + p.sum(axis=-1, keepdims=True)
    mc = m_ref[:]                                                     # [C, S_sel]
    acc_slc[:] = acc_slc[:] * alpha + jax.lax.dot_general(
        p, mc, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    v = vc_ref[0, 0]                                                  # [C, Dv]
    acc_o[:] = acc_o[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = m_new

    @pl.when(c == n_chunks - 1)
    def _finalize():
        denom = l_scr[:]
        out = acc_o[:] / jnp.where(denom > 0, denom, 1.0)
        out = jnp.where(denom > 0, out, 0.0)
        Dv = acc_o.shape[1]
        if gated:
            # gate-epilogue fold (see flash._flash_kernel): emit g*O_cmp.
            # Selection scores are unaffected (acc_slc path).
            g_lane = g_ref[0, 0, pl.dslice(qt * rows, rows)]
            gt = jax.lax.transpose(g_lane.reshape(1, rows), (1, 0))
            out = out * gt
        if flat_out:
            # unpadded flat [B,S,G*h*Dv] store (see flash._flash_kernel)
            store_rows_flat(o_cmp_ref, out, block_q, h, Dv)
        else:
            o_cmp_ref[0, :, 0] = out.reshape(block_q, h, Dv).astype(o_cmp_ref.dtype)
        # base-2 lse (consumed by the exp2 flash backward kernels)
        lse = jnp.where(denom > 0,
                        m_scr[:] + jnp.log2(jnp.maximum(denom, 1e-38)),
                        1e30)
        # flat per-(b,g) stats store (see flash.stats_rows — the g dim
        # lives in the BlockSpec; dynamic sublane stores are unaligned)
        lane = jax.lax.transpose(lse, (1, 0))                         # [1, rows]
        lse_ref[0, 0, pl.dslice(qt * rows, rows)] = lane[0]
        ds_t = None
        if varlen:
            ds_lane = dstok_ref[0, 0, :].reshape(1, block_q)
            ds_t = jax.lax.transpose(ds_lane, (1, 0))                 # [Tq,1]
        _scorer_topn(
            acc_slc[:], denom, tpos, o_sel_ref,
            l_sel=l_sel, n_top=n_top, n_forced=n_forced,
            force_init=force_init, force_local=force_local,
            block_q=block_q, h=h, s_sel=s_sel, h_real=h_real, ds_t=ds_t,
        )


@functools.partial(
    jax.jit,
    static_argnames=("scale", "l", "d", "l_sel", "n_top", "force_init",
                     "force_local", "block_q", "cmp_chunk", "interpret",
                     "h_real", "flat_out"),
)
def nsa_select_and_cmp_pallas(
    Q: jnp.ndarray,        # [B, S, G, h, Dk]  (RoPE'd)
    K_cmp: jnp.ndarray,    # [B, G, S_cmp, Dk]
    V_cmp: jnp.ndarray,    # [B, G, S_cmp, Dv]
    M_csl: jnp.ndarray,    # [S_cmp, S_sel] float32
    *,
    scale: float,
    l: int, d: int, l_sel: int, n_top: int,
    force_init: bool = True, force_local: int = 2,
    pos_offset=0,
    block_q: int = 128,
    cmp_chunk: int = 512,
    interpret: bool = False,
    h_real: "int | None" = None,
    seq_start: "jnp.ndarray | None" = None,
    gate_rows: "jnp.ndarray | None" = None,  # [B*G,1,stats_rows] f32
    flat_out: bool = False,  # emit O_cmp flat [B,S,G*h*Dv] (see flash.py)
):
    """Fused selection + compressed attention. Returns
    (sel_idx [B,S,G,max(n_top,n_forced)] i32 (see nsa_select_pallas),
    O_cmp [B,S,G,h,Dv],
    lse [B*G,1,stats_rows(S,h)] f32 — flat row stats, see flash.stats_rows).
    seq_start [B,S]: varlen document starts (see nsa_select_pallas)."""
    B, S, G, h, Dk = Q.shape
    Dv = V_cmp.shape[3]
    S_cmp, S_sel = M_csl.shape
    varlen = seq_start is not None
    block_q = min(block_q, max(S, 8))
    cmp_chunk = min(cmp_chunk, max(S_cmp, 8))
    nq = pl.cdiv(S, block_q)
    n_chunks = pl.cdiv(S_cmp, cmp_chunk)
    n_forced = (1 if force_init else 0) + force_local
    n_out = max(n_top, n_forced)
    rows = block_q * h

    pad = n_chunks * cmp_chunk - S_cmp
    M_f = M_csl.astype(jnp.float32)
    if pad:
        K_cmp = jnp.pad(K_cmp, ((0, 0), (0, 0), (0, pad), (0, 0)))
        V_cmp = jnp.pad(V_cmp, ((0, 0), (0, 0), (0, pad), (0, 0)))
        M_f = jnp.pad(M_f, ((0, pad), (0, 0)))

    kernel = functools.partial(
        _select_cmp_kernel, scale=scale, l=l, d=d, l_sel=l_sel, n_top=n_top,
        n_forced=n_forced, force_init=force_init, force_local=force_local,
        block_q=block_q, h=h, cmp_chunk=cmp_chunk, n_chunks=n_chunks,
        s_cmp=S_cmp, s_sel=S_sel, h_real=h_real, varlen=varlen,
        gated=gate_rows is not None, flat_out=flat_out,
    )
    t0 = _as_t0(pos_offset)
    in_specs = [
        pl.BlockSpec((1, block_q, 1, h, Dk),
                     lambda b, g, qt, c, *_: (b, qt, g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, cmp_chunk, Dk),
                     lambda b, g, qt, c, *_: (b, g, c, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, cmp_chunk, Dv),
                     lambda b, g, qt, c, *_: (b, g, c, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((cmp_chunk, S_sel), lambda b, g, qt, c, *_: (c, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [t0, Q, K_cmp, V_cmp, M_f]
    if varlen:
        ds_row, ds_tok = _scorer_varlen_operands(seq_start, S, block_q, nq, h)
        in_specs += [
            pl.BlockSpec((1, 1, rows), lambda b, g, qt, c, *_: (b, 0, qt),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda b, g, qt, c, *_: (b, 0, qt),
                         memory_space=pltpu.VMEM),
        ]
        args += [ds_row, ds_tok]
    if gate_rows is not None:
        in_specs.append(pl.BlockSpec(
            (1, 1, stats_rows(S, h)), lambda b, g, qt, c, *_: (b * G + g, 0, 0),
            memory_space=pltpu.VMEM))
        args.append(gate_rows)
    sel, O, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, G, nq, n_chunks),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, 1, block_q, n_out),
                             lambda b, g, qt, c, *_: (b, g, qt, 0),
                             memory_space=pltpu.VMEM),
                (pl.BlockSpec((1, block_q, h * Dv),
                              lambda b, g, qt, c, *_: (b, qt, g),
                              memory_space=pltpu.VMEM) if flat_out else
                 pl.BlockSpec((1, block_q, 1, h, Dv),
                              lambda b, g, qt, c, *_: (b, qt, g, 0, 0),
                              memory_space=pltpu.VMEM)),
                pl.BlockSpec((1, 1, stats_rows(S, h)),
                             lambda b, g, qt, c, *_: (b * G + g, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((rows, 1), jnp.float32),
                pltpu.VMEM((rows, 1), jnp.float32),
                pltpu.VMEM((rows, S_sel), jnp.float32),
                pltpu.VMEM((rows, Dv), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, G, S, n_out), jnp.int32),
            jax.ShapeDtypeStruct(
                (B, S, G * h * Dv) if flat_out else (B, S, G, h, Dv), Q.dtype),
            jax.ShapeDtypeStruct((B * G, 1, stats_rows(S, h)), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return sel.transpose(0, 2, 1, 3), O, lse



def scorer_fits_vmem(h: int, S_sel: int, block_q: int = 128,
                     cmp_chunk: int = 512, budget: int = 0) -> bool:
    """Whether the streamed scorer's VMEM working set (f32 p_slc
    accumulator + double-buffered M/K chunks + logits tile) fits. S_cmp
    no longer matters — M streams through the grid. The default budget
    is 3/4 of the scoped-vmem allocation (vmem.scoped_kib) — 12 MB at
    the 16 MB default, scaling with the merged 24 MB budget."""
    if not budget:
        from nsa_vibe_tpu.ops.tuning import scoped_vmem_bytes
        budget = (3 * scoped_vmem_bytes()) // 4
    rows = block_q * h
    need = 4 * (rows * S_sel          # acc scratch
                + 2 * cmp_chunk * S_sel  # M chunk (double-buffered)
                + rows * cmp_chunk)   # logits tile
    return need < budget
