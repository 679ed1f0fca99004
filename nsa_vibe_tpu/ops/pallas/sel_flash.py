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

NEG_INF = float(np.finfo(np.float32).min)


def _sel_flash_kernel(
    order_ref, count_ref, q_ref, sel_ref, k_ref, v_ref, o_ref,
    m_scr, l_scr, acc_scr,
    *, l_sel: int, scale: float, block_q: int, h: int, J: int, s_kv: int,
    pos_offset: int,
):
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

    @pl.when(j < cnt)
    def _compute():
        blk = order_ref[b, g, qt, j]
        q = q_ref[0, :, 0]                                 # [Tq, h, Dk]
        Dk = q.shape[2]
        qf = q.reshape(block_q * h, Dk)                    # rows t-major
        k = k_ref[0, 0]                                    # [l_sel, Dk]
        logits = jax.lax.dot_general(
            qf, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale                                          # [Tq*h, l_sel]

        sel_q = sel_ref[0, 0]                              # [Tq, n]
        member = jnp.any(sel_q == blk, axis=-1)            # [Tq]
        kpos = blk * l_sel + jax.lax.broadcasted_iota(jnp.int32, (1, l_sel), 1)
        tpos = (pos_offset + qt * block_q
                + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0))
        mask = member[:, None] & (kpos <= tpos)            # [Tq, l_sel]
        mask = jnp.broadcast_to(mask[:, None, :], (block_q, h, l_sel)).reshape(
            block_q * h, l_sel
        )
        logits = jnp.where(mask, logits, NEG_INF)

        m_prev = m_scr[:]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
        p = jnp.where(mask, jnp.exp(logits - m_new), 0.0)
        alpha = jnp.exp(m_prev - m_new)
        l_scr[:] = l_scr[:] * alpha + p.sum(axis=-1, keepdims=True)
        v = v_ref[0, 0]                                    # [l_sel, Dv]
        vrow = blk * l_sel + jax.lax.broadcasted_iota(jnp.int32, (l_sel, 1), 0)
        v = jnp.where(vrow < s_kv, v, 0)                   # OOB padding guard
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[:] = acc_scr[:] * alpha + pv
        m_scr[:] = m_new

    @pl.when(j == J - 1)
    def _finalize():
        denom = l_scr[:]
        out = acc_scr[:] / jnp.where(denom > 0, denom, 1.0)
        out = jnp.where(denom > 0, out, 0.0)
        Dv = o_ref.shape[4]
        o_ref[0, :, 0] = out.reshape(block_q, h, Dv).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("l_sel", "scale", "pos_offset", "block_q", "interpret", "q_chunk"),
)
def selection_flash_pallas(
    Q: jnp.ndarray,        # [B, S, G, h, Dk]
    K: jnp.ndarray,        # [B, G, S_kv, Dk]
    V: jnp.ndarray,        # [B, G, S_kv, Dv]
    sel_idx: jnp.ndarray,  # [B, S, G, n] int32 sorted asc, -1 padded
    *,
    l_sel: int,
    scale: float,
    pos_offset: int = 0,   # t of row s is pos_offset + s
    block_q: int = 128,
    interpret: bool = False,
    q_chunk: int = 4096,
) -> jnp.ndarray:
    """Returns O [B, S, G, h, Dv]."""
    B, S, G, h, Dk = Q.shape
    S_kv, Dv = K.shape[2], V.shape[3]
    n = sel_idx.shape[-1]

    if S > q_chunk and S % q_chunk == 0:
        nchunk = S // q_chunk
        Qc = Q.reshape(B, nchunk, q_chunk, G, h, Dk).transpose(1, 0, 2, 3, 4, 5)
        selc = sel_idx.reshape(B, nchunk, q_chunk, G, n).transpose(1, 0, 2, 3, 4)

        outs = []
        for i in range(nchunk):  # unrolled: pos_offset must be static per chunk
            outs.append(selection_flash_pallas(
                Qc[i], K, V, selc[i], l_sel=l_sel, scale=scale,
                pos_offset=pos_offset + i * q_chunk, block_q=block_q,
                interpret=interpret, q_chunk=q_chunk,
            ))
        return jnp.stack(outs).transpose(1, 0, 2, 3, 4, 5).reshape(B, S, G, h, Dv)

    block_q = min(block_q, max(S, 8))
    nq = pl.cdiv(S, block_q)
    J = pl.cdiv(S_kv, l_sel)          # total kv blocks (grid bound)

    # --- per-(b, g, q-tile) active-block compaction (device-side) ---
    blk_ids = jnp.arange(J, dtype=jnp.int32)
    # active[b, s, g, j] without materializing one-hot beyond this chunk
    active_q = jnp.any(
        sel_idx[..., None] == blk_ids[None, None, None, None, :], axis=3
    )                                  # [B, S, G, J]
    pad_rows = nq * block_q - S
    if pad_rows:
        active_q = jnp.pad(active_q, ((0, 0), (0, pad_rows), (0, 0), (0, 0)))
    tile_active = active_q.reshape(B, nq, block_q, G, J).any(axis=2)  # [B,nq,G,J]
    tile_active = tile_active.transpose(0, 2, 1, 3)                   # [B,G,nq,J]
    count = tile_active.sum(axis=-1).astype(jnp.int32)                # [B,G,nq]
    # stable argsort: active block ids first, ascending
    order = jnp.argsort(jnp.where(tile_active, 0, 1), axis=-1, stable=True)
    order = order.astype(jnp.int32)
    # clamp padded slots to the last active id (no fresh DMA on skip)
    jj = jnp.arange(J, dtype=jnp.int32)
    last = jnp.maximum(count - 1, 0)[..., None]
    order = jnp.take_along_axis(order, jnp.minimum(jj, last), axis=-1)

    def kv_index(b, g, qt, j, order_ref, count_ref):
        blk = order_ref[b, g, qt, jnp.minimum(j, jnp.maximum(count_ref[b, g, qt] - 1, 0))]
        return (b, g, blk, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, G, nq, J),
        in_specs=[
            pl.BlockSpec((1, block_q, 1, h, Dk),
                         lambda b, g, qt, j, *_: (b, qt, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, n),
                         lambda b, g, qt, j, *_: (b, g, qt, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, l_sel, Dk), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, l_sel, Dv), kv_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, 1, h, Dv), lambda b, g, qt, j, *_: (b, qt, g, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((h * block_q, 1), jnp.float32),
            pltpu.VMEM((h * block_q, 1), jnp.float32),
            pltpu.VMEM((h * block_q, Dv), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _sel_flash_kernel, l_sel=l_sel, scale=scale, block_q=block_q,
        h=h, J=J, s_kv=S_kv, pos_offset=pos_offset,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, S, G, h, Dv), Q.dtype),
        interpret=interpret,
    )(order, count, Q, sel_idx.astype(jnp.int32).transpose(0, 2, 1, 3), K, V)
