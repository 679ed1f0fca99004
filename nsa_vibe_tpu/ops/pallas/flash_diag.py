"""Diagonal-tiled banded (win) flash forward.

The axis-aligned forward (flash.flash_banded) visits ceil((block_q-1+w)/
block_k)+1 kv tiles per q-tile; at the tuned win tiles (bq=256, bk=1024,
w=512) that is 2048 fetched lanes for a 767-lane band — ~35% live
(docs/PERFORMANCE.md roofline). This kernel tiles ALONG THE BAND
instead: ONE grid step per q-tile fetches exactly the band's kv range as
KB parallel 128-wide block operands (scalar-prefetch-indexed, same idiom
as the sel kernel's kv_batch), concatenates them to a [KB*128, Dk]
operand and runs a SINGLE-pass softmax — no online rescaling, no
m/l/acc scratch carried across steps, ~86% live lanes.

Band containment: kv tiles are consecutive from kt_lo = lo(t_first)//128;
KB = cdiv(block_q-1+w, 128)+1 covers the widest possible span including
misalignment (win bounds are monotone in t). Tiles clamped at the
sequence end fetch real (duplicate) memory whose lane positions exceed
every row's hi bound — the band select masks them; no NaN risk because
only genuinely OOB rows of the last real tile can hold garbage memory
(zeroed when 128 does not divide S_kv).

Replaces the reference's FA-2 sliding-window wrapper
(nsa/core/attention_kernels.py:106-178) on the forward hot path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nsa_vibe_tpu.ops.pallas.flash import (
    LOG2E, NEG_INF, _as_t0, _band_select, _q_scale_fold, _varlen_operands,
    stats_rows, store_rows_flat,
)
from nsa_vibe_tpu.ops.pallas.flash_bwd import EMPTY_LSE, _load_stats

DIAG_BK = 128  # band-tile width: the finest lane-aligned granularity


def _diag_kernel(
    t0_ref, *refs,
    w: int, scale: float, block_q: int, h: int, KB: int, s_kv: int,
    return_lse: bool = False, varlen: bool = False, scale_on_q: bool = True,
    gated: bool = False, flat_out: bool = False,
):
    if varlen:
        ds_tile_ref, q_ref = refs[0], refs[1]
        kv_refs = refs[2:2 + 2 * KB]
        dsrow_ref = refs[2 + 2 * KB]
        outs = refs[3 + 2 * KB:]
    else:
        ds_tile_ref = dsrow_ref = None
        q_ref = refs[0]
        kv_refs = refs[1:1 + 2 * KB]
        outs = refs[1 + 2 * KB:]
    if gated:
        g_ref, outs = outs[0], outs[1:]
    else:
        g_ref = None
    k_refs, v_refs = kv_refs[:KB], kv_refs[KB:]
    o_ref = outs[0]
    lse_ref = outs[1] if return_lse else None
    b = pl.program_id(0)
    qi = pl.program_id(2)

    t_first = t0_ref[0] + qi * block_q
    ds_first = ds_tile_ref[b, 0, qi] if varlen else None
    lo_first = jnp.maximum(t_first - w + 1, 0)
    if varlen:
        lo_first = jnp.maximum(lo_first, ds_first)
    kt_lo = lo_first // DIAG_BK

    q = q_ref[0, :, 0]                                    # [Tq, h, Dk]
    rows = block_q * h
    Dk = q.shape[2]
    qf = q.reshape(rows, Dk)
    qs, post = _q_scale_fold(qf, scale * LOG2E, scale_on_q)

    ks = [k_refs[i][0, 0] for i in range(KB)]
    vs = [v_refs[i][0, 0] for i in range(KB)]
    if s_kv % DIAG_BK != 0:
        # only the last REAL tile can contain OOB (garbage-memory) rows;
        # clamped duplicate tiles re-fetch real memory and are band-masked
        for i in range(KB):
            krow = ((kt_lo + i) * DIAG_BK
                    + jax.lax.broadcasted_iota(jnp.int32, (DIAG_BK, 1), 0))
            ks[i] = jnp.where(krow < s_kv, ks[i], 0)
            vs[i] = jnp.where(krow < s_kv, vs[i], 0)
    k = jnp.concatenate(ks, axis=0)                       # [KB*128, Dk]
    v = jnp.concatenate(vs, axis=0)                       # [KB*128, Dv]

    logits = jax.lax.dot_general(
        qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                                     # [rows, KB*128]
    if post != 1.0:
        logits = logits * post
    # flat band masking (see flash._flash_kernel): per flat row
    # t = t_first + r//h, lanes are CONSECUTIVE positions from kt_lo*128
    kpos = kt_lo * DIAG_BK + jax.lax.broadcasted_iota(
        jnp.int32, (1, KB * DIAG_BK), 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    tposf = t_first + rowi // h
    lo_r = jnp.maximum(tposf - w + 1, 0)
    if varlen:
        lane = dsrow_ref[0, 0, :].reshape(1, rows)
        lo_r = jnp.maximum(lo_r, jax.lax.transpose(lane, (1, 0)))
    hi_r = tposf + 1
    logits = _band_select(logits, lo_r, hi_r, kpos)

    # SINGLE-pass softmax: the whole band is resident, so no online
    # max/denominator carry — one max, one exp2, one sum
    m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), -1e20)
    p = jnp.exp2(logits - m)                              # masked -> exactly 0
    denom = p.sum(axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out = pv / jnp.where(denom > 0, denom, 1.0)
    out = jnp.where(denom > 0, out, 0.0)
    Dv = out.shape[1]
    if gated:
        # gate-epilogue fold (see flash._flash_kernel): emit g*O
        gt = _load_stats(g_ref, qi * rows, rows)          # [rows, 1]
        out = out * gt
    if flat_out:
        # unpadded flat [B,S,G*h*Dv] store (see flash._flash_kernel)
        store_rows_flat(o_ref, out, block_q, h, Dv)
    else:
        o_ref[0, :, 0] = out.reshape(block_q, h, Dv).astype(o_ref.dtype)
    if return_lse:
        lse = jnp.where(denom > 0,
                        m + jnp.log2(jnp.maximum(denom, 1e-38)), 1e30)
        lane = jax.lax.transpose(lse, (1, 0))             # [1, rows]
        lse_ref[0, 0, pl.dslice(qi * rows, rows)] = lane[0]


@functools.partial(
    jax.jit,
    static_argnames=("w", "scale", "block_q", "interpret", "return_lse",
                     "scale_on_q", "flat_out"),
)
def flash_banded_diag(
    Q: jnp.ndarray,           # [B, S, G, h, Dk]
    K: jnp.ndarray,           # [B, G, S_kv, Dk]
    V: jnp.ndarray,           # [B, G, S_kv, Dv]
    *,
    w: int,
    scale: float = 1.0,
    block_q: int = 256,
    interpret: bool = False,
    return_lse: bool = False,
    t_start=None,
    seq_start=None,
    scale_on_q=None,
    gate_rows=None,           # [B*G,1,stats_rows] f32 (gate-epilogue fold)
    flat_out: bool = False,   # emit O flat [B,S,G*h*Dv] (see flash.py)
):
    """Same contract as flash.flash_banded(mode="win") — O [B,S,G,h,Dv]
    (+ flat stats [B*G, 1, stats_rows(S, h)] when return_lse)."""
    from nsa_vibe_tpu.ops.tuning import tuned

    if scale_on_q is None:
        scale_on_q = bool(tuned("flash.scale_on_q"))
    B, S, G, h, Dk = Q.shape
    S_kv, Dv = K.shape[2], V.shape[3]
    block_q = min(block_q, max(S, 8))
    KB = pl.cdiv(block_q - 1 + w, DIAG_BK) + 1
    nkv = pl.cdiv(S_kv, DIAG_BK)
    KB = min(KB, nkv)
    nq = pl.cdiv(S, block_q)
    t0 = _as_t0(t_start)
    varlen = seq_start is not None

    def kv_index(i):
        def index(b, g, qi, t0_ref, *more):
            t_first = t0_ref[0] + qi * block_q
            lo_first = jnp.maximum(t_first - w + 1, 0)
            if varlen:
                lo_first = jnp.maximum(lo_first, more[0][b, 0, qi])
            kt = lo_first // DIAG_BK + i
            return (b, g, jnp.clip(kt, 0, nkv - 1), 0)
        return index

    rows = block_q * h
    if flat_out:
        out_specs = pl.BlockSpec(
            (1, block_q, h * Dv), lambda b, g, qi, *_: (b, qi, g),
            memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, S, G * h * Dv), Q.dtype)
    else:
        out_specs = pl.BlockSpec(
            (1, block_q, 1, h, Dv), lambda b, g, qi, *_: (b, qi, g, 0, 0),
            memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, S, G, h, Dv), Q.dtype)
    if return_lse:
        out_specs = [out_specs, pl.BlockSpec(
            (1, 1, stats_rows(S, h)), lambda b, g, qi, *_: (b * G + g, 0, 0),
            memory_space=pltpu.VMEM)]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((B * G, 1, stats_rows(S, h)),
                                          jnp.float32)]
    in_specs = [
        pl.BlockSpec((1, block_q, 1, h, Dk),
                     lambda b, g, qi, *_: (b, qi, g, 0, 0),
                     memory_space=pltpu.VMEM),
        *[pl.BlockSpec((1, 1, DIAG_BK, Dk), kv_index(i),
                       memory_space=pltpu.VMEM) for i in range(KB)],
        *[pl.BlockSpec((1, 1, DIAG_BK, Dv), kv_index(i),
                       memory_space=pltpu.VMEM) for i in range(KB)],
    ]
    operands = [t0]
    if varlen:
        ds_row, ds_tile = _varlen_operands(seq_start, S, block_q, nq, h)
        operands.append(ds_tile)
        in_specs.append(pl.BlockSpec(
            (1, 1, rows), lambda b, g, qi, *_: (b, 0, qi),
            memory_space=pltpu.VMEM))
    if gate_rows is not None:
        in_specs.append(pl.BlockSpec(
            (1, 1, stats_rows(S, h)), lambda b, g, qi, *_: (b * G + g, 0, 0),
            memory_space=pltpu.VMEM))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 if varlen else 1,
        grid=(B, G, nq),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[],
    )
    kernel = functools.partial(
        _diag_kernel, w=w, scale=scale, block_q=block_q, h=h, KB=KB,
        s_kv=S_kv, return_lse=return_lse, varlen=varlen,
        scale_on_q=scale_on_q, gated=gate_rows is not None,
        flat_out=flat_out)
    # replicate K/V per band-tile operand (same-array aliasing is free —
    # the cost model sees KB windows into one HBM buffer)
    call_args = operands + [Q] + [K] * KB + [V] * KB
    if varlen:
        call_args.append(ds_row)
    if gate_rows is not None:
        call_args.append(gate_rows)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret,
    )(*call_args)


# ------------------------- diagonal backward -------------------------


def _diag_bwd_kernel(
    t0_ref, *refs,
    w: int, scale: float, block_q: int, h: int, KB: int, s: int, s_kv: int,
    varlen: bool = False, scale_on_q: bool = True,
):
    """Diagonal-tiled one-pass win backward: ONE grid step per q-tile
    fetches exactly the band (KB 128-wide operands), computes P/dS once,
    and emits dQ (exact block) + per-q-tile dK/dV band STRIPS. Strips are
    scatter-added into dK/dV in XLA by the wrapper (strips of successive
    q-tiles overlap by w lanes — disjoint outputs keep every grid step
    write-once, so there is no ring scratch, no write-through, and no
    fastpath dual body; ~86% live lanes vs ~50-60% for the kv-major
    one-pass at the tuned tiles)."""
    if varlen:
        ds_tile_ref, q_ref = refs[0], refs[1]
        kv_refs = refs[2:2 + 2 * KB]
        (do_ref, lse_ref, delta_ref, dsrow_ref,
         dq_ref, dks_ref, dvs_ref) = refs[2 + 2 * KB:]
    else:
        ds_tile_ref = dsrow_ref = None
        q_ref = refs[0]
        kv_refs = refs[1:1 + 2 * KB]
        do_ref, lse_ref, delta_ref, dq_ref, dks_ref, dvs_ref = refs[1 + 2 * KB:]
    k_refs, v_refs = kv_refs[:KB], kv_refs[KB:]
    b = pl.program_id(0)
    qi = pl.program_id(2)

    t_first = t0_ref[0] + qi * block_q
    lo_first = jnp.maximum(t_first - w + 1, 0)
    if varlen:
        lo_first = jnp.maximum(lo_first, ds_tile_ref[b, 0, qi])
    kt_lo = lo_first // DIAG_BK

    rows = block_q * h
    q = q_ref[0, :, 0]                                    # [Tq, h, Dk]
    Dk = q.shape[2]
    do = do_ref[0, :, 0]
    Dv = do.shape[2]
    full_q = s % block_q == 0
    lse = _load_stats(lse_ref, qi * rows, rows)
    delta = _load_stats(delta_ref, qi * rows, rows)
    if not full_q:
        # zero OOB q/dO rows and sanitize their stats (garbage rows would
        # contaminate whole dK/dV strip rows through the matmuls)
        srow = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, 1), 0)
        rowv = srow < s
        q = jnp.where(rowv[:, :, None], q, 0)
        do = jnp.where(rowv[:, :, None], do, 0)
        flat = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        rowvf = (qi * block_q + flat // h) < s
        lse = jnp.where(rowvf, lse, EMPTY_LSE)
        delta = jnp.where(rowvf, delta, jnp.float32(0.0))
    qf = q.reshape(rows, Dk)
    qs, post = _q_scale_fold(qf, scale * LOG2E, scale_on_q)
    dof = do.reshape(rows, Dv)

    ks = [k_refs[i][0, 0] for i in range(KB)]
    vs = [v_refs[i][0, 0] for i in range(KB)]
    if s_kv % DIAG_BK != 0:
        for i in range(KB):
            krow = ((kt_lo + i) * DIAG_BK
                    + jax.lax.broadcasted_iota(jnp.int32, (DIAG_BK, 1), 0))
            ks[i] = jnp.where(krow < s_kv, ks[i], 0)
            vs[i] = jnp.where(krow < s_kv, vs[i], 0)
    k = jnp.concatenate(ks, axis=0)                       # [KBW, Dk]
    v = jnp.concatenate(vs, axis=0)                       # [KBW, Dv]

    logits = jax.lax.dot_general(
        qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                                     # [rows, KBW]
    if post != 1.0:
        logits = logits * post
    kpos = kt_lo * DIAG_BK + jax.lax.broadcasted_iota(
        jnp.int32, (1, KB * DIAG_BK), 1)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    tposf = t_first + rowi // h
    lo_r = jnp.maximum(tposf - w + 1, 0)
    if varlen:
        lane = dsrow_ref[0, 0, :].reshape(1, rows)
        lo_r = jnp.maximum(lo_r, jax.lax.transpose(lane, (1, 0)))
    logits = _band_select(logits, lo_r, tposf + 1, kpos)
    p = jnp.exp2(logits - lse)                            # masked -> exactly 0
    dvs_ref[0, 0, 0] = jax.lax.dot_general(
        p.astype(dof.dtype), dof, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dvs_ref.dtype)
    dpv = jax.lax.dot_general(
        dof, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = (p * (dpv - delta)).astype(qf.dtype)
    dks_ref[0, 0, 0] = (scale * jax.lax.dot_general(
        ds, qf, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)).astype(dks_ref.dtype)
    dq = scale * jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dq_ref[0, :, 0] = dq.reshape(block_q, h, Dk).astype(dq_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("w", "scale", "block_q", "interpret", "scale_on_q"),
)
def flash_banded_bwd_diag(
    Q, K, V, dO, lse, delta,
    *, w: int, scale: float = 1.0, block_q: int = 128,
    interpret: bool = False, t_start=None, seq_start=None, scale_on_q=None,
):
    """Diagonal-tiled win backward (see _diag_bwd_kernel). Same contract
    as flash_bwd.flash_banded_bwd_onepass(mode="win"): lse/delta in the
    flat [B*G, 1, stats_rows(S,h)] layout, returns (dQ, dK, dV).

    dK/dV come back via per-q-tile band strips [B, G, nq, KB*128, D]
    (written once each by the kernel, in K.dtype) scatter-added here in
    f32 — ≤ KB overlapping bf16-rounded contributions per key, within the
    kernels' existing bf16 gradient tolerance."""
    from nsa_vibe_tpu.ops.tuning import tuned

    if scale_on_q is None:
        scale_on_q = bool(tuned("flash.scale_on_q"))
    B, S, G, h, Dk = Q.shape
    S_kv, Dv = K.shape[2], V.shape[3]
    block_q = min(block_q, max(S, 8))
    KB = pl.cdiv(block_q - 1 + w, DIAG_BK) + 1
    nkv = pl.cdiv(S_kv, DIAG_BK)
    KB = min(KB, nkv)
    KBW = KB * DIAG_BK
    nq = pl.cdiv(S, block_q)
    rows = block_q * h
    t0 = _as_t0(t_start)
    varlen = seq_start is not None

    def kv_index(i):
        def index(b, g, qi, t0_ref, *more):
            t_first = t0_ref[0] + qi * block_q
            lo_first = jnp.maximum(t_first - w + 1, 0)
            if varlen:
                lo_first = jnp.maximum(lo_first, more[0][b, 0, qi])
            kt = lo_first // DIAG_BK + i
            return (b, g, jnp.clip(kt, 0, nkv - 1), 0)
        return index

    def q_spec(D):
        return pl.BlockSpec((1, block_q, 1, h, D),
                            lambda b, g, qi, *_: (b, qi, g, 0, 0),
                            memory_space=pltpu.VMEM)

    stat_spec = pl.BlockSpec((1, 1, stats_rows(S, h)),
                             lambda b, g, qi, *_: (b * G + g, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [
        q_spec(Dk),
        *[pl.BlockSpec((1, 1, DIAG_BK, Dk), kv_index(i),
                       memory_space=pltpu.VMEM) for i in range(KB)],
        *[pl.BlockSpec((1, 1, DIAG_BK, Dv), kv_index(i),
                       memory_space=pltpu.VMEM) for i in range(KB)],
        q_spec(Dv), stat_spec, stat_spec,
    ]
    operands = [t0]
    if varlen:
        ds_row, ds_tile = _varlen_operands(seq_start, S, block_q, nq, h)
        operands.append(ds_tile)
        in_specs.append(pl.BlockSpec(
            (1, 1, rows), lambda b, g, qi, *_: (b, 0, qi),
            memory_space=pltpu.VMEM))
    strip_spec = pl.BlockSpec((1, 1, 1, KBW, Dk),
                              lambda b, g, qi, *_: (b, g, qi, 0, 0),
                              memory_space=pltpu.VMEM)
    stripv_spec = pl.BlockSpec((1, 1, 1, KBW, Dv),
                               lambda b, g, qi, *_: (b, g, qi, 0, 0),
                               memory_space=pltpu.VMEM)
    call_args = operands + [Q] + [K] * KB + [V] * KB + [dO, lse, delta]
    if varlen:
        call_args.append(ds_row)
    dq, dks, dvs = pl.pallas_call(
        functools.partial(_diag_bwd_kernel, w=w, scale=scale, block_q=block_q,
                          h=h, KB=KB, s=S, s_kv=S_kv, varlen=varlen,
                          scale_on_q=scale_on_q),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2 if varlen else 1,
            grid=(B, G, nq),
            in_specs=in_specs,
            out_specs=[q_spec(Dk), strip_spec, stripv_spec],
            scratch_shapes=[],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(Q.shape, Q.dtype),
            jax.ShapeDtypeStruct((B, G, nq, KBW, Dk), K.dtype),
            jax.ShapeDtypeStruct((B, G, nq, KBW, Dv), V.dtype),
        ],
        interpret=interpret,
    )(*call_args)

    # ---- band strips -> dK/dV via a ONE-HOT MATMUL (f32 accumulate).
    # Strip slab i of q-tile qt is kv tile kt_lo(qt)+i; summing
    # overlapping slabs per kv tile is a [nkv, nq*KB] x [nq*KB, 128*D]
    # contraction — dense MXU work (~1.6 GFLOP at m7c) instead of a TPU
    # scatter (the original .at[].add formulation measured −30% e2e: XLA
    # lowers big-index scatters to serialized updates). Slabs whose tile
    # index exceeds nkv-1 (clamped duplicates, exactly-zero strips) get
    # an all-zero one-hot row and drop out.
    qt_ids = jnp.arange(nq, dtype=jnp.int32)
    t_first = t0[0] + qt_ids * block_q                    # [nq]
    lo_first = jnp.maximum(t_first - w + 1, 0)
    if varlen:
        lo_first = jnp.maximum(lo_first, ds_tile[:, 0, :])  # [B, nq]
    else:
        lo_first = jnp.broadcast_to(lo_first, (B, nq))
    kt_lo = lo_first // DIAG_BK                           # [B, nq]
    kt = kt_lo[..., None] + jnp.arange(KB, dtype=jnp.int32)   # [B, nq, KB]
    oh = (kt[..., None] == jnp.arange(nkv, dtype=jnp.int32)
          ).reshape(B, nq * KB, nkv)                      # [B, nq*KB, nkv]

    def gather_sum(strips, D):
        flat = strips.reshape(B, G, nq * KB, DIAG_BK * D)
        tiles = jnp.einsum(
            "bqn,bgqx->bgnx", oh.astype(flat.dtype), flat,
            preferred_element_type=jnp.float32)           # [B,G,nkv,128*D]
        return tiles.reshape(B, G, nkv * DIAG_BK, D)[:, :, :S_kv]

    dk = gather_sum(dks, Dk).astype(K.dtype)
    dv = gather_sum(dvs, Dv).astype(V.dtype)
    return dq, dk, dv
