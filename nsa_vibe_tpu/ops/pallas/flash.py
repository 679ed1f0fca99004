"""Banded / prefix flash attention Pallas kernel (cmp + win branches).

One kernel replaces the reference's FA-2 wrappers + masked SDPA for the
sliding-window and compressed branches (nsa/core/attention_kernels.py:
106-178, 799-1402). Per-row key visibility is *closed-form*:

  mode "win":  row t sees raw keys  [t - w + 1, t]          (banded)
  mode "cmp":  row t sees cmp keys  [0, num_cmp(t+1))       (growing prefix)
               num_cmp(s) = (s - l)//d + 1 for s >= l else 0

so masks and tile bounds are computed inside the kernel from grid indices
— no mask tensors, no variable-length bucketing (the reference's varlen
packer becomes arithmetic). Online softmax with f32 scratch accumulators;
KV tiles outside a q-tile's band are skipped (index clamped so no fresh
DMA is issued for skipped steps).

Layouts: Q [B, G, h, S, Dk] is processed as (Tq*h)-row tiles sharing each
K tile (GQA: all heads in a group share K/V). K/V: [B, G, S_kv, D*].
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(np.finfo(np.float32).min)
LOG2E = 1.4426950408889634  # softmax runs base-2 (exp2): exp(x) lowers as
# exp2(x*log2e), so folding log2e into the existing scale multiply saves
# one full-tile VPU multiply per exp. lse residuals are stored base-2;
# each backward consumes them with exp2 (self-consistent pairs only).

# Row stats (lse/delta) are stored FLAT as [B*G, 1, stats_rows(S, h)] f32.
# A [B, G, S*h, 1] layout tiles the trailing 1 up to 128 lanes — a 128x
# padded HBM buffer (288 MB for 2.25 MB of data at B=24, m7c shapes) per
# saved residual. Rows are padded to a block_q-independent bound so
# forward and backward kernels with different tile sizes index the same
# array in-bounds; rows beyond S*h are garbage and consumers mask them.
STATS_ALIGN = 512  # >= the largest supported block_q


def stats_rows(S: int, h: int) -> int:
    return -(-S // STATS_ALIGN) * STATS_ALIGN * h


def store_rows_flat(o_ref, out, Tq: int, h: int, Dv: int):
    """Store [Tq*h, Dv] rows (t-major, head-minor) into a flat
    (1, Tq, h*Dv) output block via per-head 64-aligned lane stores —
    the ONE conversion Mosaic accepts on v5e (probed on device): the
    direct 2-D shape cast, the 3-D merge, per-head lane CONCAT (mixed
    vpad offsets) and strided slices all fail to compile."""
    if h == 1:
        o_ref[0, :] = out.reshape(Tq, Dv).astype(o_ref.dtype)
        return
    out3 = out.reshape(Tq, h, Dv)
    for j in range(h):
        o_ref[0, :, j * Dv:(j + 1) * Dv] = out3[:, j].astype(o_ref.dtype)


def load_flat_rows(do_flat, scr, Tq: int, h: int, Dv: int):
    """[Tq, h*Dv] flat tile -> [Tq*h, Dv] rows via a [Tq, h, Dv] f32 VMEM
    scratch: per-head static-sublane-index stores, then the supported
    [Tq,h,Dv] -> [Tq*h,Dv] reshape (see store_rows_flat for what Mosaic
    rejects; the scratch must be f32 — the bf16 middle-index store is
    another unsupported shape cast). Returns rows in do_flat's dtype."""
    if h == 1:
        return do_flat
    for j in range(h):
        scr[:, j] = do_flat[:, j * Dv:(j + 1) * Dv].astype(scr.dtype)
    return scr[:].reshape(Tq * h, Dv).astype(do_flat.dtype)


def gate_rows_flat(g: jnp.ndarray, h: int) -> jnp.ndarray:
    """Per-(b,t,grp) branch gate [B,S,G] -> lane-flat per-row stats
    [B*G, 1, stats_rows(S,h)] f32 (row = t*h + head; same layout as
    lse/delta, see stats_rows). Kernel epilogues multiply output rows by
    this to emit the GATED branch output (gate-epilogue fold)."""
    B, S, G = g.shape
    flat = jnp.repeat(g.astype(jnp.float32).transpose(0, 2, 1), h, axis=-1)
    flat = flat.reshape(B * G, 1, S * h)
    pad = stats_rows(S, h) - S * h
    return jnp.pad(flat, ((0, 0), (0, 0), (0, pad))) if pad else flat


def _bounds_fn(mode: str, w: int, l: int, d: int):
    """Returns row_bounds(t, ds=None) -> (lo, hi) as traced int32
    arithmetic. `ds` = document start of row t (varlen/document-masked
    batching, ops.varlen): the window is clipped to [ds, t] and the cmp
    prefix starts at the document's own pooled windows (window j covers
    raw [j*d, j*d+l) and is visible iff j*d >= ds and j*d+l <= t+1)."""
    if mode == "win":
        def bounds(t, ds=None):
            lo = jnp.maximum(t - w + 1, 0)
            if ds is not None:
                lo = jnp.maximum(lo, ds)
            return lo, t + 1
    elif mode == "cmp":
        def bounds(t, ds=None):
            if ds is None:
                s = t + 1
                hi = jnp.where(s >= l, (s - l) // d + 1, 0)
                return jnp.zeros_like(t), hi
            j0 = ds // d
            s_loc = t + 1 - ds
            hi = jnp.where(s_loc >= l, j0 + (s_loc - l) // d + 1, j0)
            return j0, hi
    else:
        raise ValueError(mode)
    return bounds


def _band_select(logits, lo_r, hi_r, kpos):
    """Band masking as ONE select: masked lanes -> -1e30 exactly. Cheaper
    than the additive `logits + (maskf-1)*1e30` chain (compare,compare,
    and,select vs compare,compare,and,astype,sub,mul,add — 3 fewer
    full-tile VPU ops) and bit-identical: in-band lanes keep logits
    untouched, out-of-band lanes become -1e30 (the additive form also
    rounds to exactly -1e30 since |logits| << ulp(1e30))."""
    return jnp.where((kpos >= lo_r) & (kpos < hi_r), logits, -1e30)


def _q_scale_fold(qf, c: float, scale_on_q: bool):
    """Fold the softmax scale (incl. LOG2E) into the [rows, Dk] Q operand
    — a Dk-lane VPU multiply — instead of the [rows, block_k] logits (a
    full-tile multiply, block_k/Dk x more elements). Returns
    (q_operand, logits_multiplier); the multiplier is 1.0 (statically
    elided at the call site) when folded. Not bit-identical: scaling
    before the matmul rounds Q once per element (~2^-53 f32 / 2^-8 bf16
    relative), within every kernel's existing bf16 tolerance."""
    if scale_on_q:
        return (qf * jnp.asarray(c, qf.dtype)).astype(qf.dtype), 1.0
    return qf, c


def _flash_kernel(
    t0_ref, *refs,
    mode: str, w: int, l: int, d: int, scale: float,
    block_q: int, block_k: int, h: int, nk_grid: int, s_kv: int,
    return_lse: bool = False, varlen: bool = False,
    scale_on_q: bool = True, fastpath: bool = True, gated: bool = False,
    flat_out: bool = False,
):
    if varlen:
        ds_tile_ref, q_ref, k_ref, v_ref, dsrow_ref, *refs = refs
    else:
        ds_tile_ref = dsrow_ref = None
        q_ref, k_ref, v_ref, *refs = refs
    if gated:
        g_ref, *refs = refs
    else:
        g_ref = None
    o_ref, *rest = refs
    if return_lse:
        lse_ref, m_scr, l_scr, acc_scr = rest
    else:
        m_scr, l_scr, acc_scr = rest
    b = pl.program_id(0)
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    bounds = _bounds_fn(mode, w, l, d)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # this q-tile's kv-tile band (same formulas as the index_map).
    # Row s is global position t0 + s (t0 > 0 under sequence sharding /
    # chunked prefill).
    t_first = t0_ref[0] + qi * block_q
    t_last = t_first + block_q - 1
    # varlen: lo at the tile's FIRST row / hi at its LAST row bound the
    # whole tile (seq_start is non-decreasing along the row axis)
    ds_first = ds_tile_ref[b, 0, qi] if varlen else None
    ds_last = ds_tile_ref[b, 1, qi] if varlen else None
    lo_first, _ = bounds(t_first, ds_first)
    _, hi_last = bounds(t_last, ds_last)
    kt_lo = lo_first // block_k
    n_live = pl.cdiv(jnp.maximum(hi_last - kt_lo * block_k, 0), block_k)

    @pl.when(ki < n_live)
    def _compute():
        q = q_ref[0, :, 0]                                # [Tq, h, Dk]
        Tq, Dk = q.shape[0], q.shape[2]
        qf = q.reshape(Tq * h, Dk)                        # rows t-major, head-minor
        qs, post = _q_scale_fold(qf, scale * LOG2E, scale_on_q)
        kt = kt_lo + ki

        def _accum(k, v, mask):
            logits = jax.lax.dot_general(
                qs, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                             # [Tq*h, Tk] (base-2)
            if post != 1.0:
                logits = logits * post
            if mask is not None:
                logits = mask(logits)
            m_prev = m_scr[:]                             # [h*Tq, 1]
            m_cur = jnp.max(logits, axis=-1, keepdims=True)
            # floor the running max so fully-masked rows give
            # exp(-1e30 - (-1e20)) == 0 exactly (not exp(0) == 1)
            m_new = jnp.maximum(jnp.maximum(m_prev, m_cur), -1e20)
            p = jnp.exp2(logits - m_new)                  # masked -> exactly 0
            alpha = jnp.exp2(m_prev - m_new)
            l_scr[:] = l_scr[:] * alpha + p.sum(axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_scr[:] = acc_scr[:] * alpha + pv
            m_scr[:] = m_new

        def _slow():
            # zero OOB-padded K/V rows BEFORE the matmul (padding memory
            # can be NaN/garbage) — statically skipped when every kv tile
            # is full
            krow = kt * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_k, 1), 0)
            k = k_ref[0, 0] if s_kv % block_k == 0 else (
                jnp.where(krow < s_kv, k_ref[0, 0], 0))   # [Tk, Dk]
            v = v_ref[0, 0] if s_kv % block_k == 0 else (
                jnp.where(krow < s_kv, v_ref[0, 0], 0))   # [Tk, Dv]
            # FLAT band masking: bounds computed per flat row (t = t_first
            # + row//h) directly on the [Tq*h, Tk] logits. The compact-
            # [Tq,Tk] mask + reshape/broadcast-add costs ~1.1 ms/call at
            # m7c shapes (r2 ablation: 4.79 -> 3.66 ms) — the head-
            # interleaving reshape is a Mosaic relayout; flat iota
            # compares are near-free.
            kpos = kt * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (1, block_k), 1)
            rowi = jax.lax.broadcasted_iota(jnp.int32, (block_q * h, 1), 0)
            tposf = t_first + rowi // h                   # [rows,1]
            ds_r = None
            if varlen:
                lane = dsrow_ref[0, 0, :].reshape(1, block_q * h)
                ds_r = jax.lax.transpose(lane, (1, 0))    # [rows,1] row-expanded
            lo_r, hi_r = bounds(tposf, ds_r)              # [rows,1]
            _accum(k, v, lambda lg: _band_select(lg, lo_r, hi_r, kpos))

        if fastpath:
            # fully-live fast path: when every row of this q-tile sees
            # every key of this kv tile (lo/hi are monotone in t, so the
            # extreme rows bound the tile), the band select and OOB
            # zeroing are no-ops — skip their full-tile VPU ops. Interior
            # tiles of the win band and the whole cmp prefix body hit
            # this branch; bit-identical to the slow path.
            lo_last, _ = bounds(t_last, ds_last)
            _, hi_first = bounds(t_first, ds_first)
            full = (kt * block_k >= lo_last) & ((kt + 1) * block_k <= hi_first)

            @pl.when(full)
            def _fast():
                _accum(k_ref[0, 0], v_ref[0, 0], None)

            @pl.when(jnp.logical_not(full))
            def _masked():
                _slow()
        else:
            _slow()

    @pl.when(ki == nk_grid - 1)
    def _finalize():
        denom = l_scr[:]
        out = acc_scr[:] / jnp.where(denom > 0, denom, 1.0)
        out = jnp.where(denom > 0, out, 0.0)
        Tq = block_q
        Dv = acc_scr.shape[1]
        if gated:
            # gate-epilogue fold: emit g*O directly (per flat row; g is
            # the per-(b,t,grp) branch gate row-expanded over heads).
            # The ungated O never reaches HBM; the backward recovers the
            # gated delta as rowsum(dO*Y) and the gate-logit grad via the
            # D-form softmax vjp (core.gate._softmax_dform) — no division
            # by collapsing gates anywhere (see ops.attention gated vjps).
            rows_g = block_q * h
            g_lane = g_ref[0, 0, pl.dslice(qi * rows_g, rows_g)]
            gt = jax.lax.transpose(g_lane.reshape(1, rows_g), (1, 0))
            out = out * gt
        if flat_out:
            # flat-IO: store into the UNPADDED [B, S, G*h*Dv] layout (this
            # group's lane slice). The 5-D [.., h, Dv] layout tile-pads
            # its (6, 64) minor pair to T(8,128) — 2.67x physical HBM
            # bytes on every O write, dO read and combine fusion at m7c
            # shapes (r4 profile layout strings; r5 flat-IO design).
            store_rows_flat(o_ref, out, Tq, h, Dv)
        else:
            o_ref[0, :, 0] = out.reshape(Tq, h, Dv).astype(o_ref.dtype)
        if return_lse:
            # empty rows get +1e30 so backward's exp(logits - lse) == 0
            # base-2 lse (consumed by the exp2 backward kernels)
            lse = jnp.where(denom > 0,
                            m_scr[:] + jnp.log2(jnp.maximum(denom, 1e-38)),
                            1e30)
            # store into this group's flat [1, rows_total] stats block:
            # transpose the [rows,1] sublane vector to lanes, dynamic lane
            # offset qi*rows (see stats_rows note above). The g dim is
            # handled by the BlockSpec — a dynamic in-kernel sublane index
            # is an unaligned store Mosaic rejects for small row counts.
            rows = block_q * h
            lane = jax.lax.transpose(lse, (1, 0))         # [1, rows]
            lse_ref[0, 0, pl.dslice(qi * rows, rows)] = lane[0]


def _as_t0(t_start, like=None) -> jnp.ndarray:
    """Normalize a query-position offset to a (1,) int32 array (scalar
    prefetch operand)."""
    if t_start is None:
        return jnp.zeros((1,), jnp.int32)
    t0 = jnp.asarray(t_start, jnp.int32)
    return t0.reshape(1) if t0.ndim <= 1 else t0


@functools.partial(
    jax.jit,
    static_argnames=("mode", "w", "l", "d", "scale", "block_q", "block_k",
                     "interpret", "return_lse", "scale_on_q", "fastpath",
                     "flat_out"),
)
def flash_banded(
    Q: jnp.ndarray,           # [B, S, G, h, Dk]  (native module layout)
    K: jnp.ndarray,           # [B, G, S_kv, Dk]
    V: jnp.ndarray,           # [B, G, S_kv, Dv]
    *,
    mode: str,                # "win" | "cmp"
    w: int = 0,
    l: int = 0,
    d: int = 1,
    scale: float = 1.0,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
    return_lse: bool = False,
    t_start=None,             # traced int32 scalar: global position of row 0
    seq_start=None,           # [B, S] int32: per-row document starts (varlen)
    scale_on_q: Optional[bool] = None,   # None -> tuned("flash.scale_on_q")
    fastpath: Optional[bool] = None,     # None -> tuned("flash.fastpath_fwd"), default OFF
    gate_rows=None,           # [B*G, 1, stats_rows(S,h)] f32: per-row branch
                              # gate (gate-epilogue fold — emits g*O)
    flat_out: bool = False,   # emit O in the unpadded flat [B,S,G*h*Dv]
                              # layout (see _flash_kernel flat-IO note)
):
    """Banded/prefix flash attention. Returns O [B, S, G, h, Dv], and the
    flat row stats [B*G, 1, stats_rows(S, h)] f32 when return_lse
    (backward residual; see stats_rows).

    Consumes Q in the module's native [B,S,G,h,Dk] layout via BlockSpec
    indexing — no transposes (a materialized relayout of Q/O costs more
    than the whole kernel at paper scales).

    `t_start` makes query positions t = t_start + row: the mechanism for
    sequence-sharded (shard_map) and chunked prefill. It reaches tile
    selection via scalar prefetch, so KV tiles outside the shifted band
    are still skipped.

    `seq_start` [B, S] int32 (optional) = per-row document start for
    varlen/document-masked batching (ops.varlen): rows attend only within
    their own document. Reaches the kernel two ways — a scalar-prefetched
    per-tile (first, last) pair for tile selection and a lane-flat
    [B, 1, S] row array for the in-kernel mask."""
    from nsa_vibe_tpu.ops.tuning import tuned as _tuned

    B, S, G, h, Dk = Q.shape
    S_kv, Dv = K.shape[2], V.shape[3]
    if (mode == "win" and w > 0 and S >= 128
            and bool(_tuned("win.fwd_diag", 0))):
        # diagonal band tiling: one grid step per q-tile fetching exactly
        # the band as KB 128-wide operands, single-pass softmax — ~86%
        # live lanes vs ~35% for axis-aligned tiles at the tuned sizes
        from nsa_vibe_tpu.ops.pallas.flash_diag import flash_banded_diag

        return flash_banded_diag(
            Q, K, V, w=w, scale=scale,
            block_q=int(_tuned("win.diag_block_q", 256)),
            interpret=interpret, return_lse=return_lse, t_start=t_start,
            seq_start=seq_start, scale_on_q=scale_on_q, gate_rows=gate_rows,
            flat_out=flat_out)
    block_q = min(block_q, max(S, 8))
    block_k = min(block_k, max(S_kv, 8))
    t0 = _as_t0(t_start)
    varlen = seq_start is not None

    nq = pl.cdiv(S, block_q)
    if mode == "win":
        nk = min(pl.cdiv(block_q - 1 + w, block_k) + 1, pl.cdiv(S_kv, block_k))
    else:
        nk = pl.cdiv(S_kv, block_k)

    bounds = _bounds_fn(mode, w, l, d)

    def k_index(b, g, qi, ki, t0_ref, *more):
        t_first = t0_ref[0] + qi * block_q
        t_last = t_first + block_q - 1
        ds_f = more[0][b, 0, qi] if varlen else None
        ds_l = more[0][b, 1, qi] if varlen else None
        lo_first, _ = bounds(t_first, ds_f)
        _, hi_last = bounds(t_last, ds_l)
        kt_lo = lo_first // block_k
        n_live = pl.cdiv(jnp.maximum(hi_last - kt_lo * block_k, 0), block_k)
        kt = kt_lo + jnp.minimum(ki, jnp.maximum(n_live - 1, 0))
        kt = jnp.clip(kt, 0, pl.cdiv(S_kv, block_k) - 1)
        return (b, g, kt, 0)

    from nsa_vibe_tpu.ops.tuning import tuned

    if scale_on_q is None:
        scale_on_q = bool(tuned("flash.scale_on_q"))
    if fastpath is None:
        # fwd-specific key: the duplicated unmasked-body logits buffer
        # OOMs VMEM at the default fwd tiles (see tuning.py) — fwd
        # fastpath is opt-in alongside win.block_k <= 256.
        fastpath = bool(tuned("flash.fastpath_fwd"))
    # VMEM guard: the fastpath branch doubles the [rows, block_k] f32
    # logits buffer (both branch bodies stay live). Measured OOM at
    # bq256/h6/bk1024 (16.21M > 16M on v5e); the doubled buffer must stay
    # small or the whole compile fails — silently drop the flag instead,
    # so a stale kernel_tuning.json (e.g. autotune restoring bk=1024 with
    # fastpath_fwd=1 set) degrades to the masked body, not a crash.
    if fastpath and 2 * block_q * h * block_k * 4 > 6 * 2**20:
        fastpath = False
    kernel = functools.partial(
        _flash_kernel,
        mode=mode, w=w, l=l, d=d, scale=scale,
        block_q=block_q, block_k=block_k, h=h, nk_grid=nk, s_kv=S_kv,
        return_lse=return_lse, varlen=varlen,
        scale_on_q=scale_on_q, fastpath=fastpath,
        gated=gate_rows is not None, flat_out=flat_out,
    )
    if flat_out:
        # unpadded [B, S, G*h*Dv]: per-group blocks are lane slices
        out_specs = pl.BlockSpec(
            (1, block_q, h * Dv), lambda b, g, qi, ki, *_: (b, qi, g),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((B, S, G * h * Dv), Q.dtype)
    else:
        out_specs = pl.BlockSpec(
            (1, block_q, 1, h, Dv), lambda b, g, qi, ki, *_: (b, qi, g, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((B, S, G, h, Dv), Q.dtype)
    if return_lse:
        # flat stats [B*G, 1, stats_rows], one per-(b,g) block: the block
        # stays VMEM-resident across (qi, ki) (index changes only with
        # b,g), so per-qt dynamic lane stores never clobber other rows.
        # Rank-3 with a unit middle dim keeps the block's last-two dims
        # equal to the array's (the Pallas lowering rule) for any G, and
        # in-kernel indices are [0, 0, lane] — no dynamic sublane.
        out_specs = [out_specs, pl.BlockSpec(
            (1, 1, stats_rows(S, h)), lambda b, g, qi, ki, *_: (b * G + g, 0, 0),
            memory_space=pltpu.VMEM,
        )]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((B * G, 1, stats_rows(S, h)), jnp.float32)]
    in_specs = [
        pl.BlockSpec((1, block_q, 1, h, Dk), lambda b, g, qi, ki, *_: (b, qi, g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_k, Dk), k_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_k, Dv), k_index, memory_space=pltpu.VMEM),
    ]
    operands = [t0]
    if varlen:
        ds_row, ds_tile = _varlen_operands(seq_start, S, block_q, nq, h)
        operands.append(ds_tile)
        in_specs.append(pl.BlockSpec(
            (1, 1, block_q * h), lambda b, g, qi, ki, *_: (b, 0, qi),
            memory_space=pltpu.VMEM))
    if gate_rows is not None:
        in_specs.append(pl.BlockSpec(
            (1, 1, stats_rows(S, h)), lambda b, g, qi, ki, *_: (b * G + g, 0, 0),
            memory_space=pltpu.VMEM))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 if varlen else 1,
        grid=(B, G, nq, nk),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((h * block_q, 1), jnp.float32),
            pltpu.VMEM((h * block_q, 1), jnp.float32),
            pltpu.VMEM((h * block_q, Dv), jnp.float32),
        ],
    )
    args = (operands + [Q, K, V] + ([ds_row] if varlen else [])
            + ([gate_rows] if gate_rows is not None else []))
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)


def _varlen_operands(seq_start: jnp.ndarray, S: int, block_q: int, nq: int,
                     h: int):
    """seq_start [B,S] -> (ds_row [B,1,nq*block_q*h] lane-flat VMEM operand,
    ROW-EXPANDED so flat row r carries ds of token r//h — matches the flat
    [Tq*h, Tk] masking; ds_tile [B,2,nq] scalar-prefetch operand with
    per-tile (first,last))."""
    ds = seq_start.astype(jnp.int32)
    Sp = nq * block_q
    if Sp != S:
        ds = jnp.pad(ds, ((0, 0), (0, Sp - S)), mode="edge")
    ds_tile = jnp.stack([ds[:, ::block_q], ds[:, block_q - 1::block_q]], axis=1)
    ds_flat = jnp.repeat(ds, h, axis=1)           # [B, Sp*h] (XLA-side, cheap)
    return ds_flat[:, None, :], ds_tile


def sliding_window_attention_pallas(
    Q: jnp.ndarray, K: jnp.ndarray, V: jnp.ndarray, w: int, scale: float,
    interpret: bool = False, t_start=None,
) -> jnp.ndarray:
    """Q [B,S,G,h,Dk] -> O [B,S,G,h,Dv] (wrapper matching ops.reference)."""
    return flash_banded(Q, K, V, mode="win", w=w, scale=scale, interpret=interpret,
                        t_start=t_start)


def compressed_attention_pallas(
    Q: jnp.ndarray, K_cmp: jnp.ndarray, V_cmp: jnp.ndarray,
    l: int, d: int, scale: float, interpret: bool = False, t_start=None,
) -> jnp.ndarray:
    """Q [B,S,G,h,Dk] -> O [B,S,G,h,Dv]; rows with no visible cmp tokens
    (t+1 < l) return zeros, matching ops.reference.compressed_attention."""
    return flash_banded(Q, K_cmp, V_cmp, mode="cmp", l=l, d=d, scale=scale,
                        interpret=interpret, t_start=t_start)
