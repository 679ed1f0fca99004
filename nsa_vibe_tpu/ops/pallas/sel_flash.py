"""Prefill selection attention: masked block-flash Pallas kernel.

Insight: per-query gathering (the reference's Triton schedule and our
decode kernel) re-reads each selected block for every query — O(S * n *
l_sel) HBM traffic. In prefill, queries are processed in tiles and
adjacent queries select heavily-overlapping blocks (forced init/local
blocks + score locality), so we invert the loop: for each *query tile*,
fetch each block in the union of the tile's selections ONCE and flash-
accumulate over it, with a per-query membership mask recomputed in-kernel
from sel_idx. HBM traffic becomes O(S/Tq * |union| * l_sel) — two orders
of magnitude less at paper scales.

Inactive blocks are skipped via a scalar-prefetched compaction: per
(b, g, q-tile) an `order` array lists the active block ids first
(ascending) and `count` bounds the live grid steps; padded steps clamp to
the previous block index (no fresh DMA) and skip compute.

This is the TPU splash-attention idiom applied to NSA's Eq. 11-12
selection structure (cf. SNIPPETS.md [1]).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nsa_vibe_tpu.ops.pallas.flash import (
    LOG2E, _as_t0, _q_scale_fold, load_flat_rows, stats_rows, store_rows_flat,
)


def _scale_on_q() -> bool:
    """Trace-time read of the scale-fold flag (see flash._q_scale_fold).
    tuned() is process-stable (lru-cached load), so reading it inside the
    kernel trace is deterministic; A/B runs flip configs/kernel_tuning.json."""
    from nsa_vibe_tpu.ops.tuning import tuned

    return bool(tuned("flash.scale_on_q"))


NEG_INF = float(np.finfo(np.float32).min)


def _compact_active(tile_active: jnp.ndarray):
    """[..., N] bool -> (order [..., N] int32 with active indices first
    (ascending), padded by repeating the last active; count [...] int32)."""
    N = tile_active.shape[-1]
    count = tile_active.sum(axis=-1).astype(jnp.int32)
    order = jnp.argsort(jnp.where(tile_active, 0, 1), axis=-1, stable=True).astype(jnp.int32)
    jj = jnp.arange(N, dtype=jnp.int32)
    last = jnp.maximum(count - 1, 0)[..., None]
    order = jnp.take_along_axis(order, jnp.minimum(jj, last), axis=-1)
    return order, count


def _sel_flash_kernel(
    order_ref, count_ref, t0_ref, q_ref, sel_ref, *rest,
    l_sel: int, scale: float, block_q: int, h: int, Jg: int, KB: int,
    s_kv: int, return_lse: bool = False, gated: bool = False,
    flat_out: bool = False,
):
    """One grid step processes KB selection blocks: KB parallel K/V DMAs
    feed a single [Tq*h, KB*l_sel] matmul. With one block per step the
    grid is DMA-latency-bound (~2 us/step on v5e); KB amortizes that
    fixed cost and raises MXU occupancy."""
    k_refs = rest[:KB]
    v_refs = rest[KB:2 * KB]
    rest = rest[2 * KB:]
    if gated:
        g_ref, *rest = rest
    else:
        g_ref = None
    o_ref, *rest = rest
    if return_lse:
        lse_ref, m_scr, l_scr, acc_scr = rest
    else:
        m_scr, l_scr, acc_scr = rest
    b = pl.program_id(0)
    g = pl.program_id(1)
    qt = pl.program_id(2)
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    cnt = count_ref[b, g, qt]

    @pl.when(j * KB < cnt)
    def _compute():
        q = q_ref[0, :, 0]                                 # [Tq, h, Dk]
        Dk = q.shape[2]
        rows = block_q * h
        qf = q.reshape(rows, Dk)                           # rows t-major
        kiota = jax.lax.broadcasted_iota(jnp.int32, (1, l_sel), 1)
        last = jnp.maximum(cnt - 1, 0)
        # every selected block is fully in range when l_sel divides S_kv —
        # the OOB K/V zeroing (padded-block memory can be inf/NaN, which
        # additive masking does not cancel) is then statically skipped
        kv_full = s_kv % l_sel == 0
        sel_q = sel_ref[0, 0]                              # [Tq, n]
        tpos = (t0_ref[0] + qt * block_q
                + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0))
        subs = []
        ks = []
        vs = []
        for i in range(KB):
            jdx = j * KB + i
            blk_i = order_ref[b, g, qt, jnp.minimum(jdx, last)]
            live = jdx < cnt                               # padded slot -> dead
            kpos = blk_i * l_sel + kiota
            member = jnp.any(sel_q == blk_i, axis=-1) & live
            # float 0/1 masks: Mosaic cannot concatenate i1 vectors
            subs.append(
                (member[:, None] & (kpos <= tpos)).astype(jnp.float32)
            )                                              # [Tq, l_sel]
            vrow = blk_i * l_sel + jax.lax.broadcasted_iota(jnp.int32, (l_sel, 1), 0)
            ks.append(k_refs[i][0, 0] if kv_full else
                      jnp.where(vrow < s_kv, k_refs[i][0, 0], 0))
            vs.append(v_refs[i][0, 0] if kv_full else
                      jnp.where(vrow < s_kv, v_refs[i][0, 0], 0))
        qs, post = _q_scale_fold(qf, scale * LOG2E, _scale_on_q())
        logits = jax.lax.dot_general(
            qs, jnp.concatenate(ks, axis=0),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )                                                  # [Tq*h, KB*l_sel] (base-2)
        if post != 1.0:
            logits = logits * post
        maskf = jnp.concatenate(subs, axis=-1)             # [Tq, KB*l_sel]
        maskf = jnp.broadcast_to(
            maskf[:, None, :], (block_q, h, KB * l_sel)
        ).reshape(rows, KB * l_sel)
        # additive masking: one FMA per element (vs compare+select chains);
        # exp(-1e30) underflows to exactly 0 so no post-zeroing needed
        # (reshaping the big f32 logits instead measures slower — the
        # broadcast of the compact f32 mask is the cheap direction here)
        logits = logits + (maskf - 1.0) * 1e30

        m_prev = m_scr[:]
        # floor the running max (same as flash.py): a row whose every key in
        # this step is masked would otherwise get m_new=-1e30 and accumulate
        # exp(0)=1 garbage into l/acc; with the floor, masked -> exactly 0
        m_new = jnp.maximum(
            jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True)), -1e20)
        p = jnp.exp2(logits - m_new)
        alpha = jnp.exp2(m_prev - m_new)
        l_scr[:] = l_scr[:] * alpha + p.sum(axis=-1, keepdims=True)
        v = jnp.concatenate(vs, axis=0)                    # [KB*l_sel, Dv]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[:] = acc_scr[:] * alpha + pv
        m_scr[:] = m_new

    @pl.when(j == Jg - 1)
    def _finalize():
        denom = l_scr[:]
        out = acc_scr[:] / jnp.where(denom > 0, denom, 1.0)
        out = jnp.where(denom > 0, out, 0.0)
        Dv = acc_scr.shape[1]
        if gated:
            # gate-epilogue fold (see flash._flash_kernel): emit g*O
            out = out * _load_stats(g_ref, qt * block_q * h, block_q * h)
        if flat_out:
            # unpadded flat [B,S,G*h*Dv] store (see flash._flash_kernel)
            store_rows_flat(o_ref, out, block_q, h, Dv)
        else:
            o_ref[0, :, 0] = out.reshape(block_q, h, Dv).astype(o_ref.dtype)
        if return_lse:
            # base-2 lse (consumed by the exp2 backward kernels)
            lse = jnp.where(denom > 0,
                            m_scr[:] + jnp.log2(jnp.maximum(denom, 1e-38)),
                            1e30)
            # flat per-(b,g) stats store (see flash.stats_rows)
            rows = block_q * h
            lane = jax.lax.transpose(lse, (1, 0))     # [1, rows]
            lse_ref[0, 0, pl.dslice(qt * rows, rows)] = lane[0]


def _load_stats(ref, row0, rows):
    """Per-(b,g) flat stats block [1, 1, rows_total] -> [rows, 1] sublane
    vector (see flash.stats_rows)."""
    lane = ref[0, 0, pl.dslice(row0, rows)]
    return jax.lax.transpose(lane.reshape(1, rows), (1, 0))


def _tile_active(sel_idx: jnp.ndarray, nq: int, block_q: int, J: int) -> jnp.ndarray:
    """sel_idx [B,S,G,n] -> per-q-tile activity [B,G,nq,J] bool."""
    B, S, G, n = sel_idx.shape
    blk_ids = jnp.arange(J, dtype=jnp.int32)
    active_q = jnp.any(
        sel_idx[..., None] == blk_ids[None, None, None, None, :], axis=3
    )                                  # [B, S, G, J]
    pad_rows = nq * block_q - S
    if pad_rows:
        active_q = jnp.pad(active_q, ((0, 0), (0, pad_rows), (0, 0), (0, 0)))
    ta = active_q.reshape(B, nq, block_q, G, J).any(axis=2)  # [B,nq,G,J]
    return ta.transpose(0, 2, 1, 3)                           # [B,G,nq,J]


def _smem_safe_block_q(B: int, G: int, S: int, J: int, block_q: int) -> int:
    """SMEM guard for the forward's scalar-prefetched order table
    ([B,G,nq,J] int32): Mosaic's smem footprint is ~4x its bytes
    (calibrated on the B=64/S=2048/bq=128 OOM — 1.06M used of the 1.00M
    limit, where 4 * 64*2*16*32*4B = 1.05M; the bq=256 estimate 0.52M
    ran). Large batches degrade to FEWER, wider q-tiles instead of
    compile-OOMing (mirrors the backward's VMEM degrade guard)."""
    while (16 * B * G * ((S + block_q - 1) // block_q) * J
           > int(0.9 * 2**20) and block_q < S):
        block_q *= 2
    return block_q


@functools.partial(
    jax.jit,
    static_argnames=("l_sel", "scale", "block_q", "kv_batch", "interpret",
                     "q_chunk", "return_lse", "flat_out"),
)
def selection_flash_pallas(
    Q: jnp.ndarray,        # [B, S, G, h, Dk]
    K: jnp.ndarray,        # [B, G, S_kv, Dk]
    V: jnp.ndarray,        # [B, G, S_kv, Dv]
    sel_idx: jnp.ndarray,  # [B, S, G, n] int32 (set representation)
    *,
    l_sel: int,
    scale: float,
    pos_offset=0,          # t of row s is pos_offset + s (int or traced scalar)
    block_q: int = 128,
    kv_batch: int = 8,     # selection blocks fetched per grid step
    interpret: bool = False,
    q_chunk: int = 4096,
    return_lse: bool = False,
    gate_rows=None,        # [B*G,1,stats_rows(S,h)] f32 (gate-epilogue fold)
    flat_out: bool = False,  # emit O flat [B,S,G*h*Dv] (see flash.py)
):
    """Returns O [B, S, G, h, Dv] (+ lse [B, G, S, h] f32 if return_lse)."""
    B, S, G, h, Dk = Q.shape
    S_kv, Dv = K.shape[2], V.shape[3]
    n = sel_idx.shape[-1]

    if S > q_chunk and S % q_chunk == 0:
        nchunk = S // q_chunk
        Qc = Q.reshape(B, nchunk, q_chunk, G, h, Dk).transpose(1, 0, 2, 3, 4, 5)
        selc = sel_idx.reshape(B, nchunk, q_chunk, G, n).transpose(1, 0, 2, 3, 4)
        outs, lses = [], []
        for i in range(nchunk):  # unrolled: pos_offset must be static per chunk
            # per-chunk gate rows: global flat row t*h is contiguous per
            # chunk; q_chunk is STATS_ALIGN-aligned so no re-padding
            gc = (None if gate_rows is None else
                  gate_rows[:, :, i * q_chunk * h:(i + 1) * q_chunk * h])
            r = selection_flash_pallas(
                Qc[i], K, V, selc[i], l_sel=l_sel, scale=scale,
                pos_offset=pos_offset + i * q_chunk, block_q=block_q,
                kv_batch=kv_batch, interpret=interpret, q_chunk=q_chunk,
                return_lse=return_lse, gate_rows=gc, flat_out=flat_out,
            )
            if return_lse:
                outs.append(r[0]); lses.append(r[1])
            else:
                outs.append(r)
        if flat_out:
            O = (jnp.stack(outs).transpose(1, 0, 2, 3)
                 .reshape(B, S, G * h * Dv))
        else:
            O = jnp.stack(outs).transpose(1, 0, 2, 3, 4, 5).reshape(B, S, G, h, Dv)
        if return_lse:
            lse = jnp.concatenate(
                [x[:, :, : q_chunk * h] for x in lses], axis=2)
            pad = stats_rows(S, h) - S * h
            if pad:
                lse = jnp.pad(lse, ((0, 0), (0, 0), (0, pad)))
            return O, lse
        return O

    block_q = min(block_q, max(S, 8))
    J = pl.cdiv(S_kv, l_sel)          # total kv blocks
    block_q = _smem_safe_block_q(B, G, S, J, block_q)
    nq = pl.cdiv(S, block_q)
    KB = max(1, min(kv_batch, J))     # selection blocks per grid step
    Jg = pl.cdiv(J, KB)               # grid steps over kv blocks
    order, count = _compact_active(_tile_active(sel_idx, nq, block_q, J))

    def kv_index(i):
        def index(b, g, qt, j, order_ref, count_ref, t0_ref):
            last = jnp.maximum(count_ref[b, g, qt] - 1, 0)
            blk = order_ref[b, g, qt, jnp.minimum(j * KB + i, last)]
            return (b, g, blk, 0)
        return index

    if flat_out:
        out_specs = pl.BlockSpec(
            (1, block_q, h * Dv), lambda b, g, qt, j, *_: (b, qt, g),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((B, S, G * h * Dv), Q.dtype)
    else:
        out_specs = pl.BlockSpec(
            (1, block_q, 1, h, Dv), lambda b, g, qt, j, *_: (b, qt, g, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((B, S, G, h, Dv), Q.dtype)
    if return_lse:
        out_specs = [out_specs, pl.BlockSpec(
            (1, 1, stats_rows(S, h)), lambda b, g, qt, j, *_: (b * G + g, 0, 0),
            memory_space=pltpu.VMEM,
        )]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((B * G, 1, stats_rows(S, h)), jnp.float32)]

    sel_arg = sel_idx.astype(jnp.int32).transpose(0, 2, 1, 3)
    sel_spec = pl.BlockSpec((1, 1, block_q, n),
                            lambda b, g, qt, j, *_: (b, g, qt, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, block_q, 1, h, Dk),
                     lambda b, g, qt, j, *_: (b, qt, g, 0, 0),
                     memory_space=pltpu.VMEM),
        sel_spec,
        *[pl.BlockSpec((1, 1, l_sel, Dk), kv_index(i), memory_space=pltpu.VMEM)
          for i in range(KB)],
        *[pl.BlockSpec((1, 1, l_sel, Dv), kv_index(i), memory_space=pltpu.VMEM)
          for i in range(KB)],
    ]
    if gate_rows is not None:
        in_specs.append(pl.BlockSpec(
            (1, 1, gate_rows.shape[2]),
            lambda b, g, qt, j, *_: (b * G + g, 0, 0),
            memory_space=pltpu.VMEM))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, G, nq, Jg),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((h * block_q, 1), jnp.float32),
            pltpu.VMEM((h * block_q, 1), jnp.float32),
            pltpu.VMEM((h * block_q, Dv), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _sel_flash_kernel, l_sel=l_sel, scale=scale, block_q=block_q,
        h=h, Jg=Jg, KB=KB, s_kv=S_kv, return_lse=return_lse,
        gated=gate_rows is not None, flat_out=flat_out,
    )
    t0 = _as_t0(pos_offset)
    args = [order, count, t0, Q, sel_arg, *([K] * KB), *([V] * KB)]
    if gate_rows is not None:
        args.append(gate_rows)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)


# --------------------------- backward kernels ---------------------------


def _sel_dq_kernel(
    order_ref, count_ref, t0_ref, q_ref, sel_ref, *rest,
    l_sel, scale, block_q, h, Jg, KB, s_kv,
):
    k_refs = rest[:KB]
    v_refs = rest[KB:2 * KB]
    do_ref, lse_ref, delta_ref, dq_ref, acc_scr = rest[2 * KB:]
    b = pl.program_id(0)
    g = pl.program_id(1)
    qt = pl.program_id(2)
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    cnt = count_ref[b, g, qt]

    @pl.when(j * KB < cnt)
    def _compute():
        q = q_ref[0, :, 0]
        Dk = q.shape[2]
        qf = q.reshape(block_q * h, Dk)
        sel_q = sel_ref[0, 0]
        tpos = (t0_ref[0] + qt * block_q
                + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0))
        kiota = jax.lax.broadcasted_iota(jnp.int32, (1, l_sel), 1)
        last = jnp.maximum(cnt - 1, 0)
        subs, ks, vs = [], [], []
        for i in range(KB):
            jdx = j * KB + i
            blk_i = order_ref[b, g, qt, jnp.minimum(jdx, last)]
            live = jdx < cnt
            member = jnp.any(sel_q == blk_i, axis=-1) & live
            kpos = blk_i * l_sel + kiota
            subs.append((member[:, None] & (kpos <= tpos)).astype(jnp.float32))
            krow = blk_i * l_sel + jax.lax.broadcasted_iota(jnp.int32, (l_sel, 1), 0)
            ks.append(jnp.where(krow < s_kv, k_refs[i][0, 0], 0))
            vs.append(jnp.where(krow < s_kv, v_refs[i][0, 0], 0))
        k = jnp.concatenate(ks, axis=0)                    # [KB*l_sel, Dk]
        v = jnp.concatenate(vs, axis=0)
        maskf = jnp.concatenate(subs, axis=-1)             # [Tq, KB*l_sel]
        maskf = jnp.broadcast_to(
            maskf[:, None, :], (block_q, h, KB * l_sel)
        ).reshape(block_q * h, KB * l_sel)

        qs, post = _q_scale_fold(qf, scale * LOG2E, _scale_on_q())
        logits = jax.lax.dot_general(
            qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if post != 1.0:
            logits = logits * post
        # lse is finite for live rows (every row selects block 0) and
        # +1e30 for empty rows, so masked entries underflow to exactly 0
        # without a post-multiply
        logits = logits + (maskf - 1.0) * 1e30
        lse = _load_stats(lse_ref, qt * block_q * h, block_q * h)
        p = jnp.exp2(logits - lse)

        do = do_ref[0, :, 0]
        Dv = do.shape[2]
        # matmul operands in the input dtype (bf16 in training) so the MXU
        # runs at native rate; f32 accumulate via preferred_element_type
        dof = do.reshape(block_q * h, Dv)
        dpv = jax.lax.dot_general(
            dof, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        delta = _load_stats(delta_ref, qt * block_q * h, block_q * h)
        ds = p * (dpv - delta)
        acc_scr[:] += scale * jax.lax.dot_general(
            ds.astype(q.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(j == Jg - 1)
    def _finalize():
        Dk = dq_ref.shape[4]
        dq_ref[0, :, 0] = acc_scr[:].reshape(block_q, h, Dk).astype(dq_ref.dtype)


def _sel_dkv_kernel(
    orderq_ref, countq_ref, t0_ref, q_ref, sel_ref, k_ref, v_ref, do_ref, lse_ref,
    delta_ref, dk_ref, dv_ref, dk_scr, dv_scr,
    *, l_sel, scale, block_q, h, NQ, KB, s_kv, s,
):
    """kv-major pass over KB-wide contiguous kv tiles ([KB*l_sel, D] — kv
    blocks are visited in order here, so no gather is needed): per tile,
    loop compacted active q-tiles and accumulate dK/dV."""
    b = pl.program_id(0)
    g = pl.program_id(1)
    jg = pl.program_id(2)  # kv tile (KB selection blocks)
    qi = pl.program_id(3)  # compacted q-tile step

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    cnt = countq_ref[b, g, jg]

    @pl.when(qi < cnt)
    def _compute():
        qt = orderq_ref[b, g, jg, jnp.minimum(qi, jnp.maximum(cnt - 1, 0))]
        q = q_ref[0, :, 0]
        Dk = q.shape[2]
        srow = qt * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
        rowv = srow < s                                    # valid q rows
        # zero OOB q/dO rows and sanitize their lse/delta: a garbage row
        # contaminates whole dK/dV *columns* through the matmuls
        q = jnp.where(rowv[:, :, None], q, 0)
        qf = q.reshape(block_q * h, Dk)
        krow = (jg * KB * l_sel
                + jax.lax.broadcasted_iota(jnp.int32, (KB * l_sel, 1), 0))
        # zero OOB K rows BEFORE the matmul (additive masking cannot
        # remove a NaN logit)
        k = jnp.where(krow < s_kv, k_ref[0, 0], 0)         # [KB*l_sel, Dk]
        qs, post = _q_scale_fold(qf, scale * LOG2E, _scale_on_q())
        logits = jax.lax.dot_general(
            qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if post != 1.0:
            logits = logits * post
        sel_q = sel_ref[0, 0]
        tpos = t0_ref[0] + srow
        kiota = jax.lax.broadcasted_iota(jnp.int32, (1, l_sel), 1)
        subs = []
        for i in range(KB):
            blk_i = jg * KB + i
            member = jnp.any(sel_q == blk_i, axis=-1)
            kpos = blk_i * l_sel + kiota
            subs.append((member[:, None] & (kpos <= tpos)).astype(jnp.float32))
        maskf = jnp.concatenate(subs, axis=-1)             # [Tq, KB*l_sel]
        maskf = jnp.broadcast_to(
            maskf[:, None, :], (block_q, h, KB * l_sel)
        ).reshape(block_q * h, KB * l_sel)
        logits = logits + (maskf - 1.0) * 1e30
        flat = jax.lax.broadcasted_iota(jnp.int32, (block_q * h, 1), 0)
        rowvf = (qt * block_q + flat // h) < s
        lse_raw = _load_stats(lse_ref, qt * block_q * h, block_q * h)
        lse = jnp.where(rowvf, lse_raw, 1e30)
        p = jnp.exp2(logits - lse)

        do = do_ref[0, :, 0]
        Dv = do.shape[2]
        # bf16 matmul operands, f32 accumulate (see _sel_dq note)
        dof = jnp.where(rowv[:, :, None], do, 0).reshape(block_q * h, Dv)
        dv_scr[:] += jax.lax.dot_general(
            p.astype(do.dtype), dof, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        vf = jnp.where(krow < s_kv, v_ref[0, 0], 0)
        dpv = jax.lax.dot_general(
            dof, vf, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        delta_raw = _load_stats(delta_ref, qt * block_q * h, block_q * h)
        delta = jnp.where(rowvf, delta_raw, jnp.float32(0.0))
        ds = p * (dpv - delta)
        dk_scr[:] += scale * jax.lax.dot_general(
            ds.astype(q.dtype), qf, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(qi == NQ - 1)
    def _finalize():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("l_sel", "scale", "block_q", "kv_batch", "interpret",
                     "q_chunk"),
)
def selection_flash_bwd(
    Q, K, V, sel_idx, dO, lse, delta,
    *, l_sel, scale, pos_offset=0, block_q=128, kv_batch=8, interpret=False,
    q_chunk=4096, gate_rows=None,
):
    """Backward of selection_flash_pallas. lse/delta: row-flat
    [B*G, 1, stats_rows(S, h)] f32 (row = t*h + head). Returns (dQ, dK, dV); dK/dV
    accumulate across q-chunks. gate_rows: gate fold — this two-pass
    variant pre-scales dO in XLA (the tuned path is the one-pass kernel
    with in-register gating)."""
    if dO.ndim == 3:               # flat-IO upstream: this kernel is 5-D
        dO = dO.reshape(*Q.shape[:4], -1)
    if gate_rows is not None:
        from nsa_vibe_tpu.ops.pallas.flash_bwd import _apply_gate_dense

        dO = _apply_gate_dense(dO, gate_rows, Q.shape[3])
    B, S, G, h, Dk = Q.shape
    S_kv, Dv = K.shape[2], V.shape[3]
    n = sel_idx.shape[-1]

    if S > q_chunk and S % q_chunk == 0:
        nchunk = S // q_chunk
        dqs = []
        dk_total = jnp.zeros_like(K)
        dv_total = jnp.zeros_like(V)
        for i in range(nchunk):
            sl = slice(i * q_chunk, (i + 1) * q_chunk)
            slh = slice(i * q_chunk * h, (i + 1) * q_chunk * h)
            dq_i, dk_i, dv_i = selection_flash_bwd(
                Q[:, sl], K, V, sel_idx[:, sl], dO[:, sl],
                lse[:, :, slh], delta[:, :, slh],
                l_sel=l_sel, scale=scale, pos_offset=pos_offset + i * q_chunk,
                block_q=block_q, kv_batch=kv_batch, interpret=interpret,
                q_chunk=q_chunk,
            )
            dqs.append(dq_i)
            dk_total = dk_total + dk_i
            dv_total = dv_total + dv_i
        return jnp.concatenate(dqs, axis=1), dk_total, dv_total

    block_q = min(block_q, max(S, 8))
    nq = pl.cdiv(S, block_q)
    J = pl.cdiv(S_kv, l_sel)
    KB = max(1, min(kv_batch, J))
    Jg = pl.cdiv(J, KB)
    ta = _tile_active(sel_idx, nq, block_q, J)          # [B,G,nq,J]
    order, count = _compact_active(ta)                  # q-major
    # kv-major activity at KB-tile granularity: active iff any member block is
    pad_j = Jg * KB - J
    ta_g = ta if pad_j == 0 else jnp.pad(ta, ((0, 0), (0, 0), (0, 0), (0, pad_j)))
    ta_g = ta_g.reshape(*ta.shape[:2], nq, Jg, KB).any(-1)        # [B,G,nq,Jg]
    order_q, count_q = _compact_active(ta_g.transpose(0, 1, 3, 2))  # [B,G,Jg,nq]

    sel_t = sel_idx.astype(jnp.int32).transpose(0, 2, 1, 3)       # [B,G,S,n]

    def kv_index(i):
        def index(b, g, qt, j, order_ref, count_ref, t0_ref):
            last = jnp.maximum(count_ref[b, g, qt] - 1, 0)
            blk = order_ref[b, g, qt, jnp.minimum(j * KB + i, last)]
            return (b, g, blk, 0)
        return index

    t0 = _as_t0(pos_offset)
    stat_spec = pl.BlockSpec((1, 1, stats_rows(S, h)),
                             lambda b, g, qt, j, *_: (b * G + g, 0, 0),
                             memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_sel_dq_kernel, l_sel=l_sel, scale=scale,
                          block_q=block_q, h=h, Jg=Jg, KB=KB, s_kv=S_kv),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B, G, nq, Jg),
            in_specs=[
                pl.BlockSpec((1, block_q, 1, h, Dk),
                             lambda b, g, qt, j, *_: (b, qt, g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_q, n),
                             lambda b, g, qt, j, *_: (b, g, qt, 0),
                             memory_space=pltpu.VMEM),
                *[pl.BlockSpec((1, 1, l_sel, Dk), kv_index(i), memory_space=pltpu.VMEM)
                  for i in range(KB)],
                *[pl.BlockSpec((1, 1, l_sel, Dv), kv_index(i), memory_space=pltpu.VMEM)
                  for i in range(KB)],
                pl.BlockSpec((1, block_q, 1, h, Dv),
                             lambda b, g, qt, j, *_: (b, qt, g, 0, 0),
                             memory_space=pltpu.VMEM),
                stat_spec, stat_spec,
            ],
            out_specs=pl.BlockSpec((1, block_q, 1, h, Dk),
                                   lambda b, g, qt, j, *_: (b, qt, g, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((h * block_q, Dk), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct(Q.shape, Q.dtype),
        interpret=interpret,
    )(order, count, t0, Q, sel_t, *([K] * KB), *([V] * KB), dO, lse, delta)

    def q_index(b, g, jg, qi, orderq_ref, countq_ref, t0_ref=None):
        qt = orderq_ref[b, g, jg, jnp.minimum(qi, jnp.maximum(countq_ref[b, g, jg] - 1, 0))]
        return qt

    # kv padded to the KB-tile grid so kv blocks stay contiguous per step
    KV_pad = Jg * KB * l_sel
    if KV_pad != S_kv:
        K_p = jnp.pad(K, ((0, 0), (0, 0), (0, KV_pad - S_kv), (0, 0)))
        V_p = jnp.pad(V, ((0, 0), (0, 0), (0, KV_pad - S_kv), (0, 0)))
    else:
        K_p, V_p = K, V

    dk, dv = pl.pallas_call(
        functools.partial(_sel_dkv_kernel, l_sel=l_sel, scale=scale,
                          block_q=block_q, h=h, NQ=nq, KB=KB, s_kv=S_kv, s=S),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B, G, Jg, nq),
            in_specs=[
                pl.BlockSpec((1, block_q, 1, h, Dk),
                             lambda b, g, jg, qi, oq, cq, t0: (b, q_index(b, g, jg, qi, oq, cq), g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_q, n),
                             lambda b, g, jg, qi, oq, cq, t0: (b, g, q_index(b, g, jg, qi, oq, cq), 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, KB * l_sel, Dk),
                             lambda b, g, jg, qi, *_: (b, g, jg, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, KB * l_sel, Dv),
                             lambda b, g, jg, qi, *_: (b, g, jg, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, 1, h, Dv),
                             lambda b, g, jg, qi, oq, cq, t0: (b, q_index(b, g, jg, qi, oq, cq), g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, stats_rows(S, h)),
                             lambda b, g, jg, qi, oq, cq, t0: (b * G + g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, stats_rows(S, h)),
                             lambda b, g, jg, qi, oq, cq, t0: (b * G + g, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, KB * l_sel, Dk), lambda b, g, jg, qi, *_: (b, g, jg, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, KB * l_sel, Dv), lambda b, g, jg, qi, *_: (b, g, jg, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((KB * l_sel, Dk), jnp.float32),
                pltpu.VMEM((KB * l_sel, Dv), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(K_p.shape, K.dtype),
            jax.ShapeDtypeStruct(V_p.shape, V.dtype),
        ],
        interpret=interpret,
    )(order_q, count_q, t0, Q, sel_t, K_p, V_p, dO, lse, delta)
    if KV_pad != S_kv:
        dk = dk[:, :, :S_kv]
        dv = dv[:, :, :S_kv]
    return dq, dk, dv


def _onepass_vmem_est(block_q, h, KB, l_sel, nq, Dk, Dv) -> int:
    """Rough VMEM bytes for the one-pass sel backward's dominant buffers:
    dq/dk/dv scratch + ~5 live [rows, KB*l_sel] f32 intermediates
    through the matmul chain (logits, maskf, p, dpv, ds). Calibrated
    against the measured Mosaic OOM at bq=256 (21.86M > 16M, v5e)."""
    rows = block_q * h
    scr = (nq * rows * Dk + KB * l_sel * (Dk + Dv)) * 4
    inter = 5 * rows * KB * l_sel * 4
    return scr + inter


# ----------------------- one-pass backward -----------------------


def _sel_onepass_bwd_kernel(
    orderq_ref, countq_ref, t0_ref, q_ref, sel_ref, k_ref, v_ref, do_ref,
    lse_ref, delta_ref, *rest,
    l_sel, scale, block_q, h, NQ, KB, s_kv, s, kv_full, gated=False,
    flat_do=False,
):
    """kv-major ONE-pass backward: P/dS computed once per
    (kv-tile-group, q-tile) pair feed dV/dK (resident scratch) AND dQ
    (per-q-tile slot scratch, written through each step). Halves the
    QK+mask+exp recompute of the separate dq+dkv kernels (cf.
    flash_bwd._onepass_bwd_kernel).

    (`ksplit` sub-grouping of the KB blocks was tried and REMOVED in r4:
    Mosaic allocates the unrolled sub-iterations' temporaries
    simultaneously, so it never reduced peak VMEM, and the flash control
    cost −7% e2e — docs/KERNELS.md dead ends.)"""
    rest = list(rest)
    g_ref = rest.pop(0) if gated else None
    if flat_do:
        (dq_ref, dk_ref, dv_ref, dq_scr, dk_scr, dv_scr, do_scr) = rest
    else:
        (dq_ref, dk_ref, dv_ref, dq_scr, dk_scr, dv_scr) = rest
        do_scr = None
    b = pl.program_id(0)
    g = pl.program_id(1)
    jg = pl.program_id(2)
    qi = pl.program_id(3)
    rows = block_q * h

    @pl.when((jg == 0) & (qi == 0))
    def _init_dq():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    cnt = countq_ref[b, g, jg]
    qt = orderq_ref[b, g, jg, jnp.minimum(qi, jnp.maximum(cnt - 1, 0))]

    @pl.when(qi < cnt)
    def _compute():
        q = q_ref[0, :, 0]
        Dk = q.shape[2]
        full_q = s % block_q == 0      # OOB q-row zeroing statically skipped
        srow = qt * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
        rowv = srow < s
        q_z = q if full_q else jnp.where(rowv[:, :, None], q, 0)
        qf = q_z.reshape(rows, Dk)
        qs, post = _q_scale_fold(qf, scale * LOG2E, _scale_on_q())
        flat = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        kiota = jax.lax.broadcasted_iota(jnp.int32, (1, l_sel), 1)
        sel_q = sel_ref[0, 0]
        tpos = t0_ref[0] + srow
        rowvf = (qt * block_q + flat // h) < s
        lse_raw = _load_stats(lse_ref, qt * rows, rows)
        lse = lse_raw if full_q else jnp.where(rowvf, lse_raw, 1e30)
        if flat_do:
            # unpadded flat [B,S,G*h*Dv] dO (see flash flat-IO note)
            do = do_ref[0]                                 # [Tq, h*Dv]
            Dv = do.shape[1] // h
            do_z = do if full_q else jnp.where(rowv, do, 0)
            dof = load_flat_rows(do_z, do_scr, block_q, h, Dv)
        else:
            do = do_ref[0, :, 0]
            Dv = do.shape[2]
            do_z = do if full_q else jnp.where(rowv[:, :, None], do, 0)
            dof = do_z.reshape(rows, Dv)
        if gated:
            # gate fold: branch upstream is g*dO, scaled in-register
            # (see flash_bwd._onepass_bwd_kernel; delta is the gated D)
            gt = _load_stats(g_ref, qt * rows, rows)
            dof = (dof * gt).astype(do.dtype)
        delta_raw = _load_stats(delta_ref, qt * rows, rows)
        delta = delta_raw if full_q else jnp.where(rowvf, delta_raw,
                                                   jnp.float32(0.0))
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        if not kv_full:
            krow = (jg * KB * l_sel
                    + jax.lax.broadcasted_iota(jnp.int32, (KB * l_sel, 1), 0))
            k = jnp.where(krow < s_kv, k, 0)
            v = jnp.where(krow < s_kv, v, 0)
        logits = jax.lax.dot_general(
            qs, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if post != 1.0:
            logits = logits * post
        subs = []
        for i in range(KB):
            blk_i = jg * KB + i
            member = jnp.any(sel_q == blk_i, axis=-1)
            kpos = blk_i * l_sel + kiota
            subs.append((member[:, None] & (kpos <= tpos)).astype(jnp.float32))
        maskf = jnp.concatenate(subs, axis=-1)
        maskf = jnp.broadcast_to(
            maskf[:, None, :], (block_q, h, KB * l_sel)).reshape(rows, KB * l_sel)
        logits = logits + (maskf - 1.0) * 1e30
        p = jnp.exp2(logits - lse)
        dv_scr[:] += jax.lax.dot_general(
            p.astype(do.dtype), dof, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dpv = jax.lax.dot_general(
            dof, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = (p * (dpv - delta)).astype(q.dtype)
        dk_scr[:] += scale * jax.lax.dot_general(
            ds, qf, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dq_scr[pl.dslice(qt * rows, rows), :] += scale * jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # write-through the current q-tile's dq slot (final store lands after
    # its last contribution; every q-tile is active in >= 1 kv group)
    Dk_o = dq_ref.shape[4]
    dq_ref[0, :, 0] = dq_scr[pl.dslice(qt * rows, rows), :].reshape(
        block_q, h, Dk_o).astype(dq_ref.dtype)

    @pl.when(qi == NQ - 1)
    def _finalize():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("l_sel", "scale", "block_q", "kv_batch", "interpret",
                     "q_chunk"),
)
def selection_flash_bwd_onepass(
    Q, K, V, sel_idx, dO, lse, delta,
    *, l_sel, scale, pos_offset=0, block_q=128, kv_batch=8, interpret=False,
    q_chunk=2048, gate_rows=None,
):
    """One-pass variant of selection_flash_bwd (same contract). The dq
    scratch holds ALL q-tiles of a chunk ([S*h, Dk] f32), so the default
    q_chunk is 2048 (3 MB at m7c shapes)."""
    from nsa_vibe_tpu.ops.tuning import tuned

    B, S, G, h, Dk = Q.shape
    S_kv, Dv = K.shape[2], V.shape[3]
    n = sel_idx.shape[-1]

    if S > q_chunk and S % q_chunk == 0:
        nchunk = S // q_chunk
        dqs = []
        dk_total = jnp.zeros(K.shape, jnp.float32)
        dv_total = jnp.zeros(V.shape, jnp.float32)
        for i in range(nchunk):
            sl = slice(i * q_chunk, (i + 1) * q_chunk)
            slh = slice(i * q_chunk * h, i * q_chunk * h + stats_rows(q_chunk, h))
            dq_i, dk_i, dv_i = selection_flash_bwd_onepass(
                Q[:, sl], K, V, sel_idx[:, sl], dO[:, sl],
                lse[:, :, slh], delta[:, :, slh],
                l_sel=l_sel, scale=scale, pos_offset=pos_offset + i * q_chunk,
                block_q=block_q, kv_batch=kv_batch, interpret=interpret,
                q_chunk=q_chunk,
                gate_rows=None if gate_rows is None else gate_rows[:, :, slh],
            )
            dqs.append(dq_i)
            dk_total = dk_total + dk_i.astype(jnp.float32)
            dv_total = dv_total + dv_i.astype(jnp.float32)
        return (jnp.concatenate(dqs, axis=1), dk_total.astype(K.dtype),
                dv_total.astype(V.dtype))

    block_q = min(block_q, max(S, 8))
    J = pl.cdiv(S_kv, l_sel)
    KB = max(1, min(kv_batch, J))
    # degrade oversized tiles instead of compile-OOMing (tile sweeps stay
    # runnable; mirrors flash_banded's fastpath VMEM guard). The budget
    # tracks vmem.scoped_kib: the estimator underestimates the measured
    # Mosaic footprint by ~3 MB at bq=256 (est 19.1M vs 21.86M OOM), so
    # plan against scoped - 3 MB (16 MB default -> the old 14M-ish rule;
    # 24 MB -> 256-row tiles pass, which compile and win e2e).
    from nsa_vibe_tpu.ops.tuning import scoped_vmem_bytes
    budget = scoped_vmem_bytes() - 3 * 2**20
    while block_q > 128 and _onepass_vmem_est(
            block_q, h, KB, l_sel, pl.cdiv(S, block_q), Dk,
            Dv) > budget:
        block_q //= 2
    nq = pl.cdiv(S, block_q)
    Jg = pl.cdiv(J, KB)
    ta = _tile_active(sel_idx, nq, block_q, J)
    pad_j = Jg * KB - J
    ta_g = ta if pad_j == 0 else jnp.pad(ta, ((0, 0), (0, 0), (0, 0), (0, pad_j)))
    ta_g = ta_g.reshape(*ta.shape[:2], nq, Jg, KB).any(-1)
    order_q, count_q = _compact_active(ta_g.transpose(0, 1, 3, 2))  # [B,G,Jg,nq]

    sel_arg = sel_idx.astype(jnp.int32).transpose(0, 2, 1, 3)
    sel_spec = pl.BlockSpec(
        (1, 1, block_q, n),
        lambda b, g, jg, qi, oq, cq, t0r: (b, g, q_index(b, g, jg, qi, oq, cq, t0r), 0),
        memory_space=pltpu.VMEM)

    KV_pad = Jg * KB * l_sel
    if KV_pad != S_kv:
        K_p = jnp.pad(K, ((0, 0), (0, 0), (0, KV_pad - S_kv), (0, 0)))
        V_p = jnp.pad(V, ((0, 0), (0, 0), (0, KV_pad - S_kv), (0, 0)))
    else:
        K_p, V_p = K, V
    t0 = _as_t0(pos_offset)
    rows = block_q * h

    def q_index(b, g, jg, qi, oq, cq, t0r):
        return oq[b, g, jg, jnp.minimum(qi, jnp.maximum(cq[b, g, jg] - 1, 0))]

    stat_spec = pl.BlockSpec((1, 1, stats_rows(S, h)),
                             lambda b, g, jg, qi, *_: (b * G + g, 0, 0),
                             memory_space=pltpu.VMEM)
    flat_do = dO.ndim == 3          # flat [B,S,G*h*Dv] upstream (flat-IO)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_sel_onepass_bwd_kernel, l_sel=l_sel, scale=scale,
                          block_q=block_q, h=h, NQ=nq, KB=KB, s_kv=S_kv, s=S,
                          kv_full=KV_pad == S_kv,
                          gated=gate_rows is not None, flat_do=flat_do),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B, G, Jg, nq),
            in_specs=[
                pl.BlockSpec((1, block_q, 1, h, Dk),
                             lambda b, g, jg, qi, oq, cq, t0r: (b, q_index(b, g, jg, qi, oq, cq, t0r), g, 0, 0),
                             memory_space=pltpu.VMEM),
                sel_spec,
                pl.BlockSpec((1, 1, KB * l_sel, Dk),
                             lambda b, g, jg, qi, *_: (b, g, jg, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, KB * l_sel, Dv),
                             lambda b, g, jg, qi, *_: (b, g, jg, 0),
                             memory_space=pltpu.VMEM),
                (pl.BlockSpec((1, block_q, h * Dv),
                              lambda b, g, jg, qi, oq, cq, t0r: (b, q_index(b, g, jg, qi, oq, cq, t0r), g),
                              memory_space=pltpu.VMEM) if flat_do else
                 pl.BlockSpec((1, block_q, 1, h, Dv),
                              lambda b, g, jg, qi, oq, cq, t0r: (b, q_index(b, g, jg, qi, oq, cq, t0r), g, 0, 0),
                              memory_space=pltpu.VMEM)),
                stat_spec, stat_spec,
            ] + ([stat_spec] if gate_rows is not None else []),
            out_specs=[
                pl.BlockSpec((1, block_q, 1, h, Dk),
                             lambda b, g, jg, qi, oq, cq, t0r: (b, q_index(b, g, jg, qi, oq, cq, t0r), g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, KB * l_sel, Dk),
                             lambda b, g, jg, qi, *_: (b, g, jg, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, KB * l_sel, Dv),
                             lambda b, g, jg, qi, *_: (b, g, jg, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((nq * rows, Dk), jnp.float32),
                pltpu.VMEM((KB * l_sel, Dk), jnp.float32),
                pltpu.VMEM((KB * l_sel, Dv), jnp.float32),
            ] + ([pltpu.VMEM((block_q, h, Dv), jnp.float32)] if flat_do else []),
        ),
        out_shape=[
            jax.ShapeDtypeStruct(Q.shape, Q.dtype),
            jax.ShapeDtypeStruct(K_p.shape, K.dtype),
            jax.ShapeDtypeStruct(V_p.shape, V.dtype),
        ],
        interpret=interpret,
    )(order_q, count_q, t0, Q, sel_arg, K_p, V_p, dO, lse, delta,
      *([gate_rows] if gate_rows is not None else []))
    if KV_pad != S_kv:
        dk = dk[:, :, :S_kv]
        dv = dv[:, :, :S_kv]
    return dq, dk, dv
