"""Block-sparse selection attention Pallas kernel.

TPU-native replacement for the reference's Triton selection kernels +
CUDA ATen fallback (nsa/kernels/triton_sel_kernel/sel_fwd.py,
cuda_sel_kernel/sel_cuda.cpp). Design:

  * the selected set is a *static* [B, S, G, n] array of block indices
    (sorted, deduped, -1 padded) from ops.selection.select_topn_blocks —
    no length bucketing, no pack cache, no fallback ladder;
  * the indices are scalar-prefetched and drive the K/V BlockSpec
    index_map directly: grid (B, S, G, n) walks the selected blocks, and
    Pallas's automatic pipelining double-buffers each block's HBM->VMEM
    DMA behind the previous block's compute (the group-centric schedule
    of the paper's Figure 3: all h heads of a GQA group share each
    fetched block);
  * online softmax across the n grid steps in f32 scratch; the full
    softmax is over the gathered set with positions clamped to <= t
    (paper-correct, not the reference's q_len=1 causal quirk);
  * padding (-1) blocks are clamped to block 0 for the DMA and masked in
    the softmax.

HBM traffic per (b, t, g): exactly n * l_sel * (Dk + Dv) — the NSA
selection read bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(np.finfo(np.float32).min)


def _sel_kernel(
    sel_ref, tpos_ref, q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
    *, l_sel: int, scale: float, n: int, s_kv: int, ragged: bool,
):
    b = pl.program_id(0)
    s = pl.program_id(1)
    g = pl.program_id(2)
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    blk = sel_ref[b, s, g, j]
    # ragged: every batch row decodes at its own depth (serving /
    # continuous batching) — per-row positions come in as [B, S]
    t = tpos_ref[b, s] if ragged else tpos_ref[s]

    @pl.when(blk >= 0)
    def _compute():
        q = q_ref[0, 0, 0]                                # [h, Dk]
        k = k_ref[0, 0]                                   # [l_sel, Dk]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale                                         # [h, l_sel]
        pos = blk * l_sel + jax.lax.broadcasted_iota(jnp.int32, (1, l_sel), 1)
        mask = pos <= t                                   # [1, l_sel]
        logits = jnp.where(mask, logits, NEG_INF)

        m_prev = m_scr[:]                                 # [h, 1]
        m_cur = jnp.max(logits, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.where(mask, jnp.exp(logits - m_new), 0.0)
        alpha = jnp.exp(m_prev - m_new)
        l_scr[:] = l_scr[:] * alpha + p.sum(axis=-1, keepdims=True)
        v = v_ref[0, 0]                                   # [l_sel, Dv]
        # zero OOB-padded rows of a partial trailing block (padding memory
        # can be NaN/garbage; 0 * NaN would poison the P·V matmul)
        vrow = blk * l_sel + jax.lax.broadcasted_iota(jnp.int32, (l_sel, 1), 0)
        v = jnp.where(vrow < s_kv, v, 0)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[:] = acc_scr[:] * alpha + pv
        m_scr[:] = m_new

    @pl.when(j == n - 1)
    def _finalize():
        denom = l_scr[:]
        out = acc_scr[:] / jnp.where(denom > 0, denom, 1.0)
        out = jnp.where(denom > 0, out, 0.0)
        o_ref[0, 0, 0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("l_sel", "scale", "interpret", "q_chunk"))
def selection_attention_pallas(
    Q: jnp.ndarray,        # [B, S, G, h, Dk]
    K: jnp.ndarray,        # [B, G, S_kv, Dk]
    V: jnp.ndarray,        # [B, G, S_kv, Dv]
    sel_idx: jnp.ndarray,  # [B, S, G, n] int32, sorted asc, -1 padded
    t_pos: jnp.ndarray,    # [S] int32 absolute query positions, or [B, S]
                           # per-row positions (ragged decode/serving)
    *,
    l_sel: int,
    scale: float,
    interpret: bool = False,
    q_chunk: int = 256,
) -> jnp.ndarray:
    """Returns O [B, S, G, h, Dv].

    The scalar-prefetched sel_idx lives in SMEM (~1 MB); long sequences are
    processed in q_chunk slices via lax.map (sequential pallas_calls inside
    one jit) to bound the prefetch footprint.
    """
    B, S, G, h, Dk = Q.shape
    ragged = t_pos.ndim == 2
    if not ragged and S > q_chunk and S % q_chunk == 0:
        nchunk = S // q_chunk
        Qc = Q.reshape(B, nchunk, q_chunk, G, h, Dk).transpose(1, 0, 2, 3, 4, 5)
        selc = sel_idx.reshape(B, nchunk, q_chunk, G, -1).transpose(1, 0, 2, 3, 4)
        tc = t_pos.reshape(nchunk, q_chunk)

        def one(args):
            q, s, t = args
            return selection_attention_pallas(
                q, K, V, s, t, l_sel=l_sel, scale=scale,
                interpret=interpret, q_chunk=q_chunk,
            )

        out = jax.lax.map(one, (Qc, selc, tc))            # [nchunk, B, q_chunk, G, h, Dv]
        return out.transpose(1, 0, 2, 3, 4, 5).reshape(B, S, G, h, -1)
    S_kv, Dv = K.shape[2], V.shape[3]
    n = sel_idx.shape[-1]
    n_blocks_kv = pl.cdiv(S_kv, l_sel)

    def kv_index(b, s, g, j, sel_ref, tpos_ref):
        blk = jnp.clip(sel_ref[b, s, g, j], 0, n_blocks_kv - 1)
        return (b, g, blk, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, S, G, n),
        in_specs=[
            pl.BlockSpec((1, 1, 1, h, Dk),
                         lambda b, s, g, j, *_: (b, s, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, l_sel, Dk), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, l_sel, Dv), kv_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, h, Dv), lambda b, s, g, j, *_: (b, s, g, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, Dv), jnp.float32),
        ],
    )
    kernel = functools.partial(_sel_kernel, l_sel=l_sel, scale=scale, n=n,
                               s_kv=S_kv, ragged=ragged)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, S, G, h, Dv), Q.dtype),
        interpret=interpret,
    )(sel_idx.astype(jnp.int32), t_pos.astype(jnp.int32), Q, K, V)
