"""Branch-attention dispatch: Pallas kernels vs jnp reference oracle.

This layer replaces the reference's 5-rung routing ladder with counted
fallbacks (nsa/core/nsa_attention.py:709-830,1205-1298): there is ONE
accelerated implementation per branch (Pallas) and one oracle (jnp
reference), chosen by config — no runtime capability probing, because on
TPU kernel availability is a compile-time fact.

  kernel="auto"      -> Pallas on TPU backends, reference elsewhere
  kernel="pallas"    -> Pallas (interpret-mode when running on CPU)
  kernel="reference" -> jnp oracle

Training: Pallas forwards are wrapped in custom_vjp with a
recompute-based backward through the reference implementation (correct
analytic gradients; dedicated Pallas backward kernels are the next
optimization step and slot in here).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from nsa_vibe_tpu.ops import reference as ref
from nsa_vibe_tpu.ops.pallas.flash import (
    compressed_attention_pallas,
    flash_banded,
    sliding_window_attention_pallas,
)
from nsa_vibe_tpu.ops.pallas.flash_bwd import (
    flash_banded_bwd,
    flash_banded_bwd_onepass,
)
from nsa_vibe_tpu.ops.pallas.sel_flash import (
    selection_flash_bwd,
    selection_flash_bwd_onepass,
    selection_flash_pallas,
)
from nsa_vibe_tpu.ops.pallas.selection import selection_attention_pallas
from nsa_vibe_tpu.ops.tuning import tuned


def fused_select_cmp(
    Q, K_cmp, V_cmp, M, *, scale: float, l: int, d: int, l_sel: int,
    n_top: int, force_init: bool, force_local: int, t_start=None,
    seq_start=None, interpret: bool = False, gate=None, flat: bool = False,
):
    """Fused Eq. 8-12 selection + compressed-branch attention
    (ops.pallas.scorer.nsa_select_and_cmp_pallas) with the analytical
    cmp flash backward. Returns (sel_idx [stop-grad by dtype], O_cmp).
    seq_start [B,S]: varlen document starts — threads doc visibility
    through the fused kernel AND the cmp flash backward.
    gate [B,S,G] f32: gate-epilogue fold — O_cmp is emitted pre-gated
    (g*O) with the D-form gate gradient (see _flash_vjp_gated);
    selection indices are unaffected."""
    from nsa_vibe_tpu.ops.pallas.flash import _as_t0, gate_rows_flat
    from nsa_vibe_tpu.ops.pallas.scorer import nsa_select_and_cmp_pallas

    Q, h = _pad_odd_heads(Q)
    kwf = dict(scale=scale, l=l, d=d, l_sel=l_sel, n_top=n_top,
               force_init=force_init, force_local=force_local,
               interpret=interpret,
               h_real=h if Q.shape[3] != h else None)
    # backward gets its own tile budget. NOT the cmp.bwd_* keys: those are
    # tuned for the standalone cmp backward; inside the fused train graph
    # bwd_block_q=256 measured 19.3k vs 48.1k toks/s at 128 (r2 bisect) —
    # a dedicated key keeps the two paths independently tunable
    kwb = dict(mode="cmp", l=l, d=d, scale=scale, interpret=interpret,
               block_k=tuned("cmp.fused_bwd_block_k", tuned("cmp.block_k")),
               block_q=tuned("cmp.fused_bwd_block_q", 128))

    if gate is not None:
        hp = Q.shape[3]
        assert not flat or hp == h, "flat-IO requires no odd-head padding"
        kwf["flat_out"] = flat

        if seq_start is not None:
            @jax.custom_vjp
            def fgv(t0, ds, g, Q, K, V, M):
                sel, O, _ = nsa_select_and_cmp_pallas(
                    Q, K, V, M, pos_offset=t0, seq_start=ds,
                    gate_rows=gate_rows_flat(g, hp), **kwf)
                return sel, O

            def fwdgv(t0, ds, g, Q, K, V, M):
                sel, O, lse = nsa_select_and_cmp_pallas(
                    Q, K, V, M, pos_offset=t0, seq_start=ds,
                    gate_rows=gate_rows_flat(g, hp), **kwf)
                return (sel, O), (t0, ds, g, Q, K, V, O, lse)

            def bwdgv(res, upstream):
                t0, ds, g, Q, K, V, O, lse = res
                _, dO = upstream
                B, S, G = g.shape
                D = _delta(dO, O, G, hp)
                dq, dk, dv = _bwd_impl()(Q, K, V, dO, lse, D,
                                         t_start=t0, seq_start=ds,
                                         gate_rows=gate_rows_flat(g, hp),
                                         **kwb)
                dg = _gate_cotangent(D, B, S, G, hp, g.dtype)
                return (_int_cotangent(t0), _int_cotangent(ds), dg,
                        dq, dk, dv, jnp.zeros_like(M))

            fgv.defvjp(fwdgv, bwdgv)
            sel, O = fgv(_as_t0(t_start), seq_start.astype(jnp.int32),
                         gate, Q, K_cmp, V_cmp, M)
            return (sel, O[:, :, :, :h]) if Q.shape[3] != h else (sel, O)

        @jax.custom_vjp
        def fg(t0, g, Q, K, V, M):
            sel, O, _ = nsa_select_and_cmp_pallas(
                Q, K, V, M, pos_offset=t0,
                gate_rows=gate_rows_flat(g, hp), **kwf)
            return sel, O

        def fwdg(t0, g, Q, K, V, M):
            sel, O, lse = nsa_select_and_cmp_pallas(
                Q, K, V, M, pos_offset=t0,
                gate_rows=gate_rows_flat(g, hp), **kwf)
            return (sel, O), (t0, g, Q, K, V, O, lse)

        def bwdg(res, upstream):
            t0, g, Q, K, V, O, lse = res
            _, dO = upstream
            B, S, G = g.shape
            D = _delta(dO, O, G, hp)
            dq, dk, dv = _bwd_impl()(Q, K, V, dO, lse, D,
                                     t_start=t0,
                                     gate_rows=gate_rows_flat(g, hp), **kwb)
            dg = _gate_cotangent(D, B, S, G, hp, g.dtype)
            return (_int_cotangent(t0), dg, dq, dk, dv, jnp.zeros_like(M))

        fg.defvjp(fwdg, bwdg)
        sel, O = fg(_as_t0(t_start), gate, Q, K_cmp, V_cmp, M)
        return (sel, O[:, :, :, :h]) if Q.shape[3] != h else (sel, O)

    if seq_start is not None:
        # traced int operands (t0, ds) are explicit custom_vjp arguments
        # with float0 cotangents — see _flash_vjp for why
        @jax.custom_vjp
        def fv(t0, ds, Q, K, V, M):
            sel, O, _ = nsa_select_and_cmp_pallas(
                Q, K, V, M, pos_offset=t0, seq_start=ds, **kwf)
            return sel, O

        def fwdv(t0, ds, Q, K, V, M):
            sel, O, lse = nsa_select_and_cmp_pallas(
                Q, K, V, M, pos_offset=t0, seq_start=ds, **kwf)
            return (sel, O), (t0, ds, Q, K, V, O, lse)

        def bwdv(res, g):
            t0, ds, Q, K, V, O, lse = res
            _, gO = g
            dq, dk, dv = _bwd_impl()(Q, K, V, gO, lse, _delta(gO, O),
                                     t_start=t0, seq_start=ds, **kwb)
            return (_int_cotangent(t0), _int_cotangent(ds), dq, dk, dv,
                    jnp.zeros_like(M))

        fv.defvjp(fwdv, bwdv)
        sel, O = fv(_as_t0(t_start), seq_start.astype(jnp.int32),
                    Q, K_cmp, V_cmp, M)
        return (sel, O[:, :, :, :h]) if Q.shape[3] != h else (sel, O)

    @jax.custom_vjp
    def f(t0, Q, K, V, M):
        sel, O, _ = nsa_select_and_cmp_pallas(Q, K, V, M, pos_offset=t0, **kwf)
        return sel, O

    def fwd(t0, Q, K, V, M):
        sel, O, lse = nsa_select_and_cmp_pallas(Q, K, V, M, pos_offset=t0, **kwf)
        return (sel, O), (t0, Q, K, V, O, lse)

    def bwd(res, g):
        t0, Q, K, V, O, lse = res
        _, gO = g                      # selection output is int (float0 grad)
        dq, dk, dv = _bwd_impl()(Q, K, V, gO, lse, _delta(gO, O),
                                      t_start=t0, **kwb)
        return (_int_cotangent(t0), dq, dk, dv, jnp.zeros_like(M))

    f.defvjp(fwd, bwd)
    sel, O = f(_as_t0(t_start), Q, K_cmp, V_cmp, M)
    return (sel, O[:, :, :, :h]) if Q.shape[3] != h else (sel, O)


def _bwd_impl():
    return flash_banded_bwd_onepass if tuned("bwd.onepass", 1) else flash_banded_bwd


def _pack_stats(d: jnp.ndarray) -> jnp.ndarray:
    """[B,S,G,h] per-row values -> the flat [B*G, 1, stats_rows(S, h)]
    stats layout (see ops.pallas.flash.stats_rows — the [.., S*h, 1]
    form is 128x tile-padded on TPU)."""
    from nsa_vibe_tpu.ops.pallas.flash import stats_rows

    B, S, G, h = d.shape
    flat = d.transpose(0, 2, 1, 3).reshape(B * G, 1, S * h)
    pad = stats_rows(S, h) - S * h
    return jnp.pad(flat, ((0, 0), (0, 0), (0, pad))) if pad else flat


def _delta(dO: jnp.ndarray, O: jnp.ndarray, G: int = 0, h: int = 0) -> jnp.ndarray:
    """rowsum(dO * O) in the flat stats layout. 5-D [B,S,G,h,Dv] inputs,
    or (flat-IO) 3-D [B,S,G*h*Dv] inputs with G/h given — the product is
    computed on the UNPADDED flat operands, only the tiny [B,S,G,h]
    reduce output touches the padded layout class."""
    prod = dO.astype(jnp.float32) * O.astype(jnp.float32)
    if dO.ndim == 3:
        B, S, F = prod.shape
        d = prod.reshape(B, S, G, h, F // (G * h)).sum(-1)
    else:
        d = prod.sum(-1)                                   # [B,S,G,h]
    return _pack_stats(d)


def _int_cotangent(x):
    """float0 cotangent for an integer-dtype primal (custom_vjp contract)."""
    import numpy as _np

    return _np.zeros(x.shape, jax.dtypes.float0)


def _gate_cotangent(D: jnp.ndarray, B: int, S: int, G: int, h: int,
                    dtype) -> jnp.ndarray:
    """Flat gated delta D = rowsum(dO*Y) [B*G,1,stats_rows] -> the D-form
    gate cotangent [B,S,G] = sum_h D (gates broadcast over heads). This
    is g*dg, NOT dg — it pairs exactly with core.gate._softmax_dform
    (dz = D - g*sum(D)); never feed it to a plain softmax vjp."""
    d = D[:, 0, :S * h].reshape(B, G, S, h).sum(-1)      # [B,G,S]
    return d.transpose(0, 2, 1).astype(dtype)




def _flash_vjp(mode: str, w: int, l: int, d: int, scale: float, interpret: bool,
               varlen: bool = False):
    """custom_vjp with analytical Pallas forward AND backward (the
    reference-recompute backward materializes O(S^2) logits — 29 GB at
    the m7c training shape).

    The traced int operands (t0, and ds under varlen) are explicit
    custom_vjp ARGUMENTS with float0 cotangents — closing over traced
    values in a custom_vjp leaks tracers when the surrounding function is
    rematerialized (jax.checkpoint recomputes the forward during the
    backward trace)."""

    kw = dict(mode=mode, w=w, l=l, d=d, scale=scale, interpret=interpret)
    kw["block_k"] = tuned(f"{mode}.block_k")
    kw["block_q"] = tuned(f"{mode}.block_q")
    # the backward keeps extra live tiles (dO + lse/delta + two scratch
    # accumulators), so its VMEM budget needs its own (smaller) tiles;
    # lse/delta are flat [B*G,1,stats_rows] arrays — tiling can differ from fwd
    kwb = dict(kw, block_k=tuned(f"{mode}.bwd_block_k", kw["block_k"]),
               block_q=tuned(f"{mode}.bwd_block_q", 128))

    if varlen:
        @jax.custom_vjp
        def fv(t0, ds, Q, K, V):
            return flash_banded(Q, K, V, t_start=t0, seq_start=ds, **kw)

        def fwdv(t0, ds, Q, K, V):
            O, lse = flash_banded(Q, K, V, t_start=t0, seq_start=ds,
                                  return_lse=True, **kw)
            return O, (t0, ds, Q, K, V, O, lse)

        def bwdv(res, g):
            t0, ds, Q, K, V, O, lse = res
            dq, dk, dv = _bwd_impl()(Q, K, V, g, lse, _delta(g, O),
                                          t_start=t0, seq_start=ds, **kwb)
            return (_int_cotangent(t0), _int_cotangent(ds), dq, dk, dv)

        fv.defvjp(fwdv, bwdv)
        return fv

    @jax.custom_vjp
    def f(t0, Q, K, V):
        return flash_banded(Q, K, V, t_start=t0, **kw)

    def fwd(t0, Q, K, V):
        O, lse = flash_banded(Q, K, V, t_start=t0, return_lse=True, **kw)
        return O, (t0, Q, K, V, O, lse)

    def bwd(res, g):
        t0, Q, K, V, O, lse = res
        dq, dk, dv = _bwd_impl()(Q, K, V, g, lse, _delta(g, O),
                                      t_start=t0, **kwb)
        return (_int_cotangent(t0), dq, dk, dv)

    f.defvjp(fwd, bwd)
    return f


def _flash_vjp_gated(mode: str, w: int, l: int, d: int, scale: float,
                     interpret: bool, varlen: bool = False,
                     flat: bool = False):
    """Gate-epilogue fold variant of _flash_vjp: the kernel emits the
    GATED branch output Y = g*O (g [B,S,G] f32 is a differentiable
    argument), and the backward needs no extra reduce — the delta
    preprocess rowsum(dO*Y) IS the gated flash delta (g*rowsum(dO*O))
    AND, summed over heads, the D-form gate cotangent consumed by
    core.gate._softmax_dform. No division by g anywhere, exact at g=0
    (dz -> 0 smoothly, matching the true softmax-combine gradient)."""
    from nsa_vibe_tpu.ops.pallas.flash import gate_rows_flat

    kw = dict(mode=mode, w=w, l=l, d=d, scale=scale, interpret=interpret)
    kw["block_k"] = tuned(f"{mode}.block_k")
    kw["block_q"] = tuned(f"{mode}.block_q")
    kwb = dict(kw, block_k=tuned(f"{mode}.bwd_block_k", kw["block_k"]),
               block_q=tuned(f"{mode}.bwd_block_q", 128))

    def _bwd_common(t0, ds, g, Q, K, V, Y, lse, dO):
        B, S, G, h, _ = Q.shape
        D = _delta(dO, Y, G, h)                 # gated delta == D-form carrier
        extra = {"seq_start": ds} if ds is not None else {}
        # the one-pass kernel scales dO by g IN-REGISTER (gate_rows) —
        # no [B,S,G,h,Dv] gated-dO materialization per branch
        dq, dk, dv = _bwd_impl()(Q, K, V, dO, lse, D, t_start=t0,
                                 gate_rows=gate_rows_flat(g, h),
                                 **extra, **kwb)
        return _gate_cotangent(D, B, S, G, h, g.dtype), dq, dk, dv

    if varlen:
        @jax.custom_vjp
        def fv(t0, ds, g, Q, K, V):
            h = Q.shape[3]
            return flash_banded(Q, K, V, t_start=t0, seq_start=ds,
                                gate_rows=gate_rows_flat(g, h),
                                flat_out=flat, **kw)

        def fwdv(t0, ds, g, Q, K, V):
            h = Q.shape[3]
            Y, lse = flash_banded(Q, K, V, t_start=t0, seq_start=ds,
                                  gate_rows=gate_rows_flat(g, h),
                                  flat_out=flat,
                                  return_lse=True, **kw)
            return Y, (t0, ds, g, Q, K, V, Y, lse)

        def bwdv(res, dO):
            t0, ds, g, Q, K, V, Y, lse = res
            dg, dq, dk, dv = _bwd_common(t0, ds, g, Q, K, V, Y, lse, dO)
            return (_int_cotangent(t0), _int_cotangent(ds), dg, dq, dk, dv)

        fv.defvjp(fwdv, bwdv)
        return fv

    @jax.custom_vjp
    def f(t0, g, Q, K, V):
        h = Q.shape[3]
        return flash_banded(Q, K, V, t_start=t0,
                            gate_rows=gate_rows_flat(g, h),
                            flat_out=flat, **kw)

    def fwd(t0, g, Q, K, V):
        h = Q.shape[3]
        Y, lse = flash_banded(Q, K, V, t_start=t0,
                              gate_rows=gate_rows_flat(g, h),
                              flat_out=flat,
                              return_lse=True, **kw)
        return Y, (t0, g, Q, K, V, Y, lse)

    def bwd(res, dO):
        t0, g, Q, K, V, Y, lse = res
        dg, dq, dk, dv = _bwd_common(t0, None, g, Q, K, V, Y, lse, dO)
        return (_int_cotangent(t0), dg, dq, dk, dv)

    f.defvjp(fwd, bwd)
    return f


def _sel_kv_batches(S_kv: int) -> tuple:
    """(fwd kv_batch, bwd kv_batch) for the selection kernels, by KV
    length: past union saturation every q-tile's block union covers
    ~all J blocks, so the grid is steps-bound and wider kv batches
    win; below it the same widening loses 1-2% (r4 waves at S=2048),
    so the defaults stay narrow. The two directions cross over at
    DIFFERENT lengths (ab_queue s4k-*/s8k-* records, loss-identical):
    the backward pays from S=4096 (+4.7% at 4k, +7.6% at 8k — its
    per-step cost is dominated by the dual dKV/dQ DMA setup that
    widening amortizes), the forward only from S=8192 (-0.3% at 4k,
    +0.2% at 8k — its masking cost grows with batch width until the
    grid is fully steps-bound), hence sel.bwd_long_s < sel.long_s."""
    kb_f = (int(tuned("sel.kv_batch_long", 16))
            if S_kv >= int(tuned("sel.long_s", 8192))
            else tuned("sel.kv_batch"))
    kb_b = (int(tuned("sel.bwd_kv_batch_long", 16))
            if S_kv >= int(tuned("sel.bwd_long_s", 4096))
            else tuned("sel.bwd_kv_batch", tuned("sel.kv_batch")))
    return (kb_f, kb_b)


def _sel_flash_vjp(l_sel: int, scale: float, interpret: bool,
                   S_kv: int = 0):
    kb_f, kb_b = _sel_kv_batches(S_kv)
    kw = dict(l_sel=l_sel, scale=scale, interpret=interpret,
              kv_batch=kb_f, block_q=tuned("sel.block_q"))
    kwb = dict(kw, block_q=tuned("sel.bwd_block_q", 128), kv_batch=kb_b)
    kwb_chunk = tuned("sel.bwd_q_chunk", 0)

    @jax.custom_vjp
    def f(sel_idx, t0, Q, K, V):
        return selection_flash_pallas(Q, K, V, sel_idx, pos_offset=t0, **kw)

    def fwd(sel_idx, t0, Q, K, V):
        O, lse = selection_flash_pallas(Q, K, V, sel_idx, pos_offset=t0,
                                        return_lse=True, **kw)
        return O, (sel_idx, t0, Q, K, V, O, lse)

    def bwd(res, g):
        sel_idx, t0, Q, K, V, O, lse = res
        sel_bwd = (selection_flash_bwd_onepass
                   if tuned("sel.bwd_onepass", tuned("bwd.onepass", 1))
                   else selection_flash_bwd)
        extra = {"q_chunk": kwb_chunk} if kwb_chunk else {}
        dq, dk, dv = sel_bwd(Q, K, V, sel_idx, g, lse, _delta(g, O),
                             pos_offset=t0, **kwb, **extra)
        return (_int_cotangent(sel_idx), _int_cotangent(t0), dq, dk, dv)

    f.defvjp(fwd, bwd)
    return f


def _sel_flash_vjp_gated(l_sel: int, scale: float, interpret: bool,
                         flat: bool = False, S_kv: int = 0):
    """Gate-epilogue fold variant of _sel_flash_vjp (see
    _flash_vjp_gated for the gradient contract)."""
    from nsa_vibe_tpu.ops.pallas.flash import gate_rows_flat

    kb_f, kb_b = _sel_kv_batches(S_kv)
    kw = dict(l_sel=l_sel, scale=scale, interpret=interpret,
              kv_batch=kb_f, block_q=tuned("sel.block_q"))
    kwb = dict(kw, block_q=tuned("sel.bwd_block_q", 128), kv_batch=kb_b)
    kwb_chunk = tuned("sel.bwd_q_chunk", 0)

    @jax.custom_vjp
    def f(sel_idx, t0, g, Q, K, V):
        h = Q.shape[3]
        return selection_flash_pallas(Q, K, V, sel_idx, pos_offset=t0,
                                      gate_rows=gate_rows_flat(g, h),
                                      flat_out=flat, **kw)

    def fwd(sel_idx, t0, g, Q, K, V):
        h = Q.shape[3]
        Y, lse = selection_flash_pallas(Q, K, V, sel_idx, pos_offset=t0,
                                        gate_rows=gate_rows_flat(g, h),
                                        flat_out=flat,
                                        return_lse=True, **kw)
        return Y, (sel_idx, t0, g, Q, K, V, Y, lse)

    def bwd(res, dO):
        sel_idx, t0, g, Q, K, V, Y, lse = res
        B, S, G, h, _ = Q.shape
        sel_bwd = (selection_flash_bwd_onepass
                   if tuned("sel.bwd_onepass", tuned("bwd.onepass", 1))
                   else selection_flash_bwd)
        extra = {"q_chunk": kwb_chunk} if kwb_chunk else {}
        D = _delta(dO, Y, G, h)
        dq, dk, dv = sel_bwd(Q, K, V, sel_idx, dO, lse, D,
                             pos_offset=t0,
                             gate_rows=gate_rows_flat(g, h), **kwb, **extra)
        dg = _gate_cotangent(D, B, S, G, h, g.dtype)
        return (_int_cotangent(sel_idx), _int_cotangent(t0), dg, dq, dk, dv)

    f.defvjp(fwd, bwd)
    return f


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    return jax.default_backend() not in ("cpu",)


def resolve_kernel(kernel: str, h: "int | None" = None) -> tuple[str, bool]:
    """-> (impl, interpret). Any heads-per-group works on the Pallas path:
    odd h > 1 (which Mosaic cannot shape-cast [Tq,h,Dk]->[Tq*h,Dk];
    verified on v5e: h=3 fails, h=1/2/4/6 compile) is handled by padding Q
    with one zero head at dispatch (_pad_odd_heads) — matching the
    reference's any-H kernels (triton_sel_kernel/sel_fwd.py:453-456)."""
    del h  # all head counts supported (kept for call-site compatibility)
    if kernel == "reference":
        return "reference", False
    if kernel == "pallas":
        return "pallas", not _on_tpu()
    return ("pallas", False) if _on_tpu() else ("reference", False)


def _pad_odd_heads(Q: jnp.ndarray) -> tuple[jnp.ndarray, int]:
    """Pad the head axis of Q [B,S,G,h,Dk] to an even count with one zero
    head. Per-head attention outputs are independent, so slicing the pad
    head off afterwards is exact; a zero-Q pad head also contributes
    exactly zero to dK/dV in the backwards (dO rows are zero => ds = 0).
    Returns (Q_padded, h_real)."""
    h = Q.shape[3]
    if h > 1 and h % 2 == 1:
        Q = jnp.pad(Q, ((0, 0), (0, 0), (0, 0), (0, 1), (0, 0)))
    return Q, h


def _with_ref_vjp(pallas_fn: Callable, ref_fn: Callable):
    """custom_vjp: pallas forward, reference-recompute backward (Q, K, V
    are the differentiable args; everything else closed over)."""

    @jax.custom_vjp
    def f(Q, K, V):
        return pallas_fn(Q, K, V)

    def fwd(Q, K, V):
        return pallas_fn(Q, K, V), (Q, K, V)

    def bwd(res, g):
        Q, K, V = res
        _, vjp = jax.vjp(ref_fn, Q, K, V)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def sliding_window_attention(
    Q: jnp.ndarray, K: jnp.ndarray, V: jnp.ndarray,
    t_pos: jnp.ndarray, w: int, scale: float, kernel: str = "auto",
    t_start=None, seq_start=None, gate=None, flat: bool = False,
) -> jnp.ndarray:
    """t_start: global position of query row 0 (int or traced scalar) —
    required by the Pallas path when t_pos does not start at 0 (sequence
    sharding / chunked prefill). The reference path reads t_pos directly.
    seq_start [B,S]: per-row document starts (varlen batching, ops.varlen).
    gate [B,S,G] f32 (Pallas-only, gate-epilogue fold): returns g*O with
    the D-form gate gradient (see _flash_vjp_gated)."""
    impl, interpret = resolve_kernel(kernel, Q.shape[3])
    if impl == "reference":
        if gate is not None:
            raise ValueError("gate fold requires the Pallas kernel path")
        if seq_start is not None:
            from nsa_vibe_tpu.ops.varlen import sliding_window_attention_varlen

            return sliding_window_attention_varlen(Q, K, V, t_pos, seq_start,
                                                   w, scale)
        return ref.sliding_window_attention(Q, K, V, t_pos, w, scale)
    from nsa_vibe_tpu.ops.pallas.flash import _as_t0

    Qp, h = _pad_odd_heads(Q)
    if gate is not None:
        assert not flat or Qp.shape[3] == h, "flat-IO requires even h"
        if seq_start is not None:
            out = _flash_vjp_gated("win", w, 0, 1, scale, interpret,
                                   varlen=True, flat=flat)(
                _as_t0(t_start), seq_start.astype(jnp.int32), gate, Qp, K, V)
        else:
            out = _flash_vjp_gated("win", w, 0, 1, scale, interpret,
                                   flat=flat)(
                _as_t0(t_start), gate, Qp, K, V)
    elif seq_start is not None:
        out = _flash_vjp("win", w, 0, 1, scale, interpret, varlen=True)(
            _as_t0(t_start), seq_start.astype(jnp.int32), Qp, K, V)
    else:
        out = _flash_vjp("win", w, 0, 1, scale, interpret)(_as_t0(t_start), Qp, K, V)
    return out[:, :, :, :h] if Qp.shape[3] != h else out


def compressed_attention(
    Q: jnp.ndarray, K_cmp: jnp.ndarray, V_cmp: jnp.ndarray,
    num_cmp_t: jnp.ndarray, l: int, d: int, scale: float, kernel: str = "auto",
    t_start=None, seq_start=None, t_pos=None, gate=None, flat: bool = False,
) -> jnp.ndarray:
    """seq_start [B,S] + t_pos [S] enable varlen (document-masked) mode:
    pooled windows are visible iff fully inside the query's document.
    gate [B,S,G] f32: gate-epilogue fold (Pallas only; _flash_vjp_gated)."""
    impl, interpret = resolve_kernel(kernel, Q.shape[3])
    if K_cmp.shape[2] == 0:
        # no compressed tokens yet (S < l): the branch contributes zeros
        B, S, G, h, _ = Q.shape
        if flat:
            return jnp.zeros((B, S, G * h * V_cmp.shape[3]), Q.dtype)
        return jnp.zeros((B, S, G, h, V_cmp.shape[3]), Q.dtype)
    if impl == "reference":
        if gate is not None:
            raise ValueError("gate fold requires the Pallas kernel path")
        if seq_start is not None:
            from nsa_vibe_tpu.ops.varlen import compressed_attention_varlen

            return compressed_attention_varlen(Q, K_cmp, V_cmp, t_pos,
                                               seq_start, l, d, scale)
        return ref.compressed_attention(Q, K_cmp, V_cmp, num_cmp_t, scale)
    from nsa_vibe_tpu.ops.pallas.flash import _as_t0

    Qp, h = _pad_odd_heads(Q)
    if gate is not None:
        assert not flat or Qp.shape[3] == h, "flat-IO requires even h"
        if seq_start is not None:
            out = _flash_vjp_gated("cmp", 0, l, d, scale, interpret,
                                   varlen=True, flat=flat)(
                _as_t0(t_start), seq_start.astype(jnp.int32), gate,
                Qp, K_cmp, V_cmp)
        else:
            out = _flash_vjp_gated("cmp", 0, l, d, scale, interpret,
                                   flat=flat)(
                _as_t0(t_start), gate, Qp, K_cmp, V_cmp)
    elif seq_start is not None:
        out = _flash_vjp("cmp", 0, l, d, scale, interpret, varlen=True)(
            _as_t0(t_start), seq_start.astype(jnp.int32), Qp, K_cmp, V_cmp)
    else:
        out = _flash_vjp("cmp", 0, l, d, scale, interpret)(
            _as_t0(t_start), Qp, K_cmp, V_cmp)
    return out[:, :, :, :h] if Qp.shape[3] != h else out


def selection_attention(
    Q: jnp.ndarray, K: jnp.ndarray, V: jnp.ndarray,
    sel_idx: jnp.ndarray, t_pos: jnp.ndarray, l_sel: int, scale: float,
    kernel: str = "auto",
    pos_offset: int = 0,
    seq_start=None,
    gate=None,
    flat: bool = False,
) -> jnp.ndarray:
    """Prefill uses the masked block-flash kernel (each block in a q-tile's
    union fetched once); single-query decode uses the per-query gather
    kernel (reads exactly n*l_sel keys).

    gate [B,S,G] f32: gate-epilogue fold (Pallas prefill only; see
    _sel_flash_vjp_gated).

    Varlen (seq_start given): the Pallas kernels need NO doc bound — a
    varlen sel_idx (select_topn_blocks_varlen) only contains doc-local
    l_sel-aligned blocks, and in-block causality (kpos <= t) masks the
    padding tail of each document, so no cross-document key is reachable.
    The reference path applies the explicit doc-masked oracle."""
    impl, interpret = resolve_kernel(kernel, Q.shape[3])
    if impl == "reference":
        if gate is not None:
            raise ValueError("gate fold requires the Pallas kernel path")
        if seq_start is not None:
            from nsa_vibe_tpu.ops.varlen import selection_attention_varlen

            return selection_attention_varlen(Q, K, V, sel_idx, t_pos,
                                              seq_start, l_sel, scale)
        return ref.selection_attention(Q, K, V, sel_idx, t_pos, l_sel, scale)
    if Q.shape[1] == 1:
        # decode: per-query gather kernel (reads exactly n*l_sel keys);
        # never trained, so the ref-recompute bwd (cheap at S=1) suffices
        f = _with_ref_vjp(
            lambda q, k, v: selection_attention_pallas(
                q, k, v, sel_idx, t_pos, l_sel=l_sel, scale=scale, interpret=interpret
            ),
            lambda q, k, v: ref.selection_attention(q, k, v, sel_idx, t_pos, l_sel, scale),
        )
        return f(Q, K, V)
    from nsa_vibe_tpu.ops.pallas.flash import _as_t0

    Qp, h = _pad_odd_heads(Q)
    # the sel kernel q-chunks long sequences to bound its scalar-prefetch
    # SMEM footprint (order array ~ nq*J ints; 65k rows unchunked is a
    # 2+ MB SMEM operand > the 1 MB budget) — pad S to the chunk grid so
    # chunking always engages; padded rows carry sel=-1 (no members, zero
    # output, zero gradient) and are sliced off
    S = Qp.shape[1]
    q_chunk = 4096
    pad_s = (-S) % q_chunk if S > q_chunk else 0
    if pad_s:
        Qp = jnp.pad(Qp, ((0, 0), (0, pad_s), (0, 0), (0, 0), (0, 0)))
        sel_idx = jnp.pad(sel_idx, ((0, 0), (0, pad_s), (0, 0), (0, 0)),
                          constant_values=-1)
        if gate is not None:
            gate = jnp.pad(gate, ((0, 0), (0, pad_s), (0, 0)))
    if gate is not None:
        assert not flat or Qp.shape[3] == h, "flat-IO requires even h"
        out = _sel_flash_vjp_gated(l_sel, scale, interpret, flat=flat,
                                   S_kv=K.shape[2])(
            sel_idx, _as_t0(pos_offset), gate, Qp, K, V)
    else:
        out = _sel_flash_vjp(l_sel, scale, interpret, S_kv=K.shape[2])(
            sel_idx, _as_t0(pos_offset), Qp, K, V)
    if pad_s:
        out = out[:, :S]
    return out[:, :, :, :h] if Qp.shape[3] != h else out
