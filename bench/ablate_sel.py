"""Ablation bench for the selection block-flash kernel masking path.

Run on TPU: python bench/ablate_sel.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import importlib.util as _ilu

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_spec = _ilu.spec_from_file_location(
    "autotune", os.path.join(os.path.dirname(os.path.abspath(__file__)), "autotune.py"))
_at = _ilu.module_from_spec(_spec); _spec.loader.exec_module(_at)
chain_bench = _at.chain_bench

from nsa_vibe_tpu.ops.pallas import sel_flash
from nsa_vibe_tpu.ops.selection import select_topn_blocks

B, S, G, h, Dk = 16, 2048, 2, 6, 64
L_SEL, N_SEL = 64, 16
NEG_INF = sel_flash.NEG_INF


def make_kernel(mode: str):
    def k(order_ref, count_ref, t0_ref, q_ref, sel_ref, *rest,
          l_sel, scale, block_q, h, Jg, KB, s_kv, return_lse=False):
        k_refs = rest[:KB]
        v_refs = rest[KB:2 * KB]
        o_ref = rest[2 * KB]
        rest = rest[2 * KB + 1:]
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
            q = q_ref[0, :, 0]
            Dkk = q.shape[2]
            qf = q.reshape(block_q * h, Dkk)
            sel_q = sel_ref[0, 0]
            rows = block_q * h
            last = jnp.maximum(cnt - 1, 0)
            ks, vs = [], []
            blks = []
            for i in range(KB):
                jdx = j * KB + i
                blk_i = order_ref[b, g, qt, jnp.minimum(jdx, last)]
                blks.append((blk_i, jdx))
                vrow = blk_i * l_sel + jax.lax.broadcasted_iota(jnp.int32, (l_sel, 1), 0)
                ks.append(jnp.where(vrow < s_kv, k_refs[i][0, 0], 0))
                vs.append(jnp.where(vrow < s_kv, v_refs[i][0, 0], 0))
            logits = jax.lax.dot_general(
                qf, jnp.concatenate(ks, axis=0),
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale

            if mode == "full":
                tpos = (t0_ref[0] + qt * block_q
                        + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0))
                kiota = jax.lax.broadcasted_iota(jnp.int32, (1, l_sel), 1)
                subs = []
                for blk_i, jdx in blks:
                    live = jdx < cnt
                    member = jnp.any(sel_q == blk_i, axis=-1) & live
                    kpos = blk_i * l_sel + kiota
                    subs.append((member[:, None] & (kpos <= tpos)).astype(jnp.float32))
                maskf = jnp.concatenate(subs, axis=-1)
                maskf = jnp.broadcast_to(
                    maskf[:, None, :], (block_q, h, KB * l_sel)
                ).reshape(rows, KB * l_sel)
                logits = logits + (maskf - 1.0) * 1e30
            elif mode == "thresh":
                # per-row threshold per block: thr = t if member else -1;
                # mask == (kpos <= thr). Compact thr [Tq, KB] expanded to
                # flat rows via a one-hot MXU matmul, then compared against
                # the concatenated kpos lanes broadcast per block.
                tpos = (t0_ref[0] + qt * block_q
                        + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0))
                thr_cols = []
                for blk_i, jdx in blks:
                    live = jdx < cnt
                    member = jnp.any(sel_q == blk_i, axis=-1) & live
                    thr_cols.append(jnp.where(member[:, None], tpos, -1).astype(jnp.float32))
                thr_c = jnp.concatenate(thr_cols, axis=-1)        # [Tq, KB]
                rowi = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
                expand = (rowi // h == jax.lax.broadcasted_iota(
                    jnp.int32, (1, block_q), 1)).astype(jnp.float32)  # [rows, Tq]
                thr_f = jax.lax.dot_general(
                    expand, thr_c, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)             # [rows, KB]
                kcat = jnp.concatenate(
                    [blks[i][0] * l_sel
                     + jax.lax.broadcasted_iota(jnp.int32, (1, l_sel), 1)
                     for i in range(KB)], axis=-1).astype(jnp.float32)  # [1, KB*l_sel]
                thr_wide = jnp.concatenate(
                    [jnp.broadcast_to(thr_f[:, i:i + 1], (rows, l_sel))
                     for i in range(KB)], axis=-1)                   # [rows, KB*l_sel]
                maskf = (kcat <= thr_wide).astype(jnp.float32)
                logits = logits + (maskf - 1.0) * 1e30
            elif mode == "plrepeat":
                tpos = (t0_ref[0] + qt * block_q
                        + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0))
                kiota = jax.lax.broadcasted_iota(jnp.int32, (1, l_sel), 1)
                subs = []
                for blk_i, jdx in blks:
                    live = jdx < cnt
                    member = jnp.any(sel_q == blk_i, axis=-1) & live
                    kpos = blk_i * l_sel + kiota
                    subs.append((member[:, None] & (kpos <= tpos)).astype(jnp.float32))
                maskc = jnp.concatenate(subs, axis=-1)          # [Tq, KB*l_sel]
                maskf = pltpu.repeat(maskc, h, 0)               # [rows, KB*l_sel]
                logits = logits + (maskf - 1.0) * 1e30
            # mode == "nomask": skip entirely

            m_prev = m_scr[:]
            m_new = jnp.maximum(
                jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True)), -1e20)
            p = jnp.exp(logits - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_scr[:] = l_scr[:] * alpha + p.sum(axis=-1, keepdims=True)
            v = jnp.concatenate(vs, axis=0)
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_scr[:] = acc_scr[:] * alpha + pv
            m_scr[:] = m_new

        @pl.when(j == Jg - 1)
        def _finalize():
            denom = l_scr[:]
            out = acc_scr[:] / jnp.where(denom > 0, denom, 1.0)
            Dv = o_ref.shape[4]
            o_ref[0, :, 0] = out.reshape(block_q, h, Dv).astype(o_ref.dtype)
    return k


def main() -> None:
    key = jax.random.PRNGKey(0)
    Q = jax.random.normal(key, (B, S, G, h, Dk), jnp.bfloat16)
    K = jax.random.normal(key, (B, G, S, Dk), jnp.bfloat16)
    V = jax.random.normal(key, (B, G, S, Dk), jnp.bfloat16)
    sel = select_topn_blocks(
        jax.random.uniform(key, (B, S, G, S // L_SEL)), N_SEL,
        jnp.arange(S, dtype=jnp.int32), L_SEL)
    orig = sel_flash._sel_flash_kernel

    for bq, kb in ((256, 8), (128, 8), (256, 16)):
        print(f"--- sel block_q={bq} kv_batch={kb} ---")
        for mode in ("orig", "plrepeat", "nomask"):
            sel_flash._sel_flash_kernel = orig if mode == "orig" else make_kernel(mode)
            sel_flash.selection_flash_pallas.clear_cache()
            try:
                ms = chain_bench(lambda q: sel_flash.selection_flash_pallas(
                    q, K, V, sel, l_sel=L_SEL, scale=0.125, block_q=bq,
                    kv_batch=kb), Q)
                print(f"  {mode:10s} {ms:.3f} ms")
            except Exception as e:
                print(f"  {mode:10s} FAIL {str(e)[:80]}")
    sel_flash._sel_flash_kernel = orig


if __name__ == "__main__":
    main()
