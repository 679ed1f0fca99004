"""Ablation bench for the banded flash kernel: where does the time go?

Times the win-branch kernel at m7c shapes, then re-times with pieces
knocked out (masking, softmax, PV matmul) by monkeypatching the kernel
body. Pedestal-corrected chained timing (autotune.chain_bench).

Run on TPU: python bench/ablate_flash.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

import importlib.util as _ilu
_spec = _ilu.spec_from_file_location("autotune", os.path.join(os.path.dirname(os.path.abspath(__file__)), "autotune.py"))
_at = _ilu.module_from_spec(_spec); _spec.loader.exec_module(_at)
chain_bench = _at.chain_bench
from nsa_vibe_tpu.ops.pallas import flash

B, S, G, h, Dk = 16, 2048, 2, 6, 64
W = 512
SCALE = 0.125


def make_kernel(ablate: set):
    def k(t0_ref, q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
          *, mode, w, l, d, scale, block_q, block_k, h, nk_grid, s_kv,
          return_lse=False, varlen=False):
        qi = pl.program_id(2)
        ki = pl.program_id(3)
        bounds = flash._bounds_fn(mode, w, l, d)

        @pl.when(ki == 0)
        def _init():
            m_scr[:] = jnp.full_like(m_scr, flash.NEG_INF)
            l_scr[:] = jnp.zeros_like(l_scr)
            acc_scr[:] = jnp.zeros_like(acc_scr)

        t_first = t0_ref[0] + qi * block_q
        t_last = t_first + block_q - 1
        lo_first, _ = bounds(t_first)
        _, hi_last = bounds(t_last)
        kt_lo = lo_first // block_k
        n_live = pl.cdiv(jnp.maximum(hi_last - kt_lo * block_k, 0), block_k)

        @pl.when(ki < n_live)
        def _compute():
            q = q_ref[0, :, 0]
            Tq, Dkk = q.shape[0], q.shape[2]
            qf = q.reshape(Tq * h, Dkk)
            kt = kt_lo + ki
            krow = kt * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_k, 1), 0)
            kk = k_ref[0, 0] if "zerok" in ablate else jnp.where(krow < s_kv, k_ref[0, 0], 0)
            logits = jax.lax.dot_general(
                qf, kk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if "scale" not in ablate:
                logits = logits * scale
            maskflat = None
            if "flatmask" in ablate or "wheremask" in ablate:
                kpos = kt * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
                rowi = jax.lax.broadcasted_iota(jnp.int32, (block_q * h, 1), 0)
                tposf = t_first + rowi // h
                lo_r, hi_r = bounds(tposf)
                maskflat = (kpos >= lo_r) & (kpos < hi_r)   # [rows, Tk]
                if "flatmask" in ablate:
                    logits = logits + (maskflat.astype(jnp.float32) - 1.0) * 1e30
            elif "mask" not in ablate:
                kpos = kt * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
                tpos = t_first + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
                lo_r, hi_r = bounds(tpos)
                maskf = ((kpos >= lo_r) & (kpos < hi_r)).astype(jnp.float32)
                bias = (maskf - 1.0) * 1e30
                logits = (logits.reshape(block_q, h, block_k) + bias[:, None, :]
                          ).reshape(block_q * h, block_k)
            if "softmax" in ablate:
                p = logits     # no exp/max: p = raw logits
                l_scr[:] = l_scr[:] + p.sum(axis=-1, keepdims=True)
                alpha = 1.0
            else:
                m_prev = m_scr[:]
                m_cur = jnp.max(logits, axis=-1, keepdims=True)
                m_new = jnp.maximum(jnp.maximum(m_prev, m_cur), -1e20)
                p = jnp.exp(logits - m_new)
                if "wheremask" in ablate:
                    p = jnp.where(maskflat, p, 0.0)
                alpha = jnp.exp(m_prev - m_new)
                l_scr[:] = l_scr[:] * alpha + p.sum(axis=-1, keepdims=True)
                m_scr[:] = m_new
            if "pv" not in ablate:
                v = v_ref[0, 0] if "zerok" in ablate else jnp.where(
                    krow < s_kv, v_ref[0, 0], 0)
                pv = jax.lax.dot_general(
                    p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc_scr[:] = acc_scr[:] * alpha + pv
            else:
                acc_scr[:] = acc_scr[:] * alpha + p[:, :acc_scr.shape[1]]

        @pl.when(ki == nk_grid - 1)
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
    orig = flash._flash_kernel

    cases = [
        ("full", set()),
        ("flatmask", {"flatmask"}),
        ("wheremask", {"wheremask"}),
        ("flatmask+noscale", {"flatmask", "scale"}),
        ("nomask", {"mask"}),
        ("qk_only", {"mask", "softmax", "pv"}),
    ]
    for bq, bk in ((256, 512), (128, 512), (128, 256), (128, 128), (256, 256)):
        print(f"--- win block_q={bq} block_k={bk} ---")
        for name, abl in cases:
            flash._flash_kernel = make_kernel(abl) if abl else orig
            flash.flash_banded.clear_cache()
            ms = chain_bench(lambda q: flash.flash_banded(
                q, K, V, mode="win", w=W, scale=SCALE, block_q=bq, block_k=bk), Q)
            print(f"  {name:20s} {ms:.3f} ms")
    flash._flash_kernel = orig


if __name__ == "__main__":
    main()
