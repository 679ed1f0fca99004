"""Analytical backward kernels for the banded/prefix flash attention.

Flash-attention backward split into two Pallas kernels (the reference has
no accelerated backward at all — its Triton branch falls back to an
eager analytical form, triton_sel_kernel/__init__.py:163-231):

  * dQ kernel — mirrors the forward grid (b, g, q-tile, kv-tile):
      P  = exp(scale * Q K^T - lse)            (masked)
      dS = P * (dO V^T - delta)
      dQ = scale * sum_k dS K
  * dK/dV kernel — kv-major grid (b, g, kv-tile, q-tile) with the
    *inverse* closed-form bounds (which q rows see this key):
      dV = P^T dO
      dK = scale * dS^T Q

Residuals are O and lse (= m + log l, set to +1e30 for rows with no
visible keys so P underflows to exactly 0); delta = rowsum(dO * O) is
precomputed in XLA. Everything is recomputed tile-wise — no O(S^2)
materialization (the reference-recompute backward needed 29 GB for the
m7c training step; these kernels need O(tile) scratch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nsa_vibe_tpu.ops.pallas.flash import (
    LOG2E, _band_select, _bounds_fn, _q_scale_fold, load_flat_rows, stats_rows,
)


def _load_stats(ref, row0, rows):
    """Per-(b,g) flat stats block [1, 1, rows_total] -> [rows, 1] sublane
    vector for rows [row0, row0+rows) (see flash.stats_rows)."""
    lane = ref[0, 0, pl.dslice(row0, rows)]               # (rows,) lanes
    return jax.lax.transpose(lane.reshape(1, rows), (1, 0))

NEG_INF = float(np.finfo(np.float32).min)
EMPTY_LSE = 1e30


def _row_block_layout(x):
    """[B,S,G,h,D] <-> row-major (t-major, head-minor) helpers live in the
    kernels via reshape; this module keeps the same convention."""
    return x


def _dq_kernel(
    t0_ref, *refs,
    mode, w, l, d, scale, block_q, block_k, h, nk_grid, s_kv,
    varlen=False, scale_on_q=True,
):
    if varlen:
        (ds_tile_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dsrow_ref, dq_ref, acc_scr) = refs
    else:
        ds_tile_ref = dsrow_ref = None
        q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, acc_scr = refs
    b = pl.program_id(0)
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    bounds = _bounds_fn(mode, w, l, d)

    @pl.when(ki == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    t_first = t0_ref[0] + qi * block_q
    t_last = t_first + block_q - 1
    ds_f = ds_tile_ref[b, 0, qi] if varlen else None
    ds_l = ds_tile_ref[b, 1, qi] if varlen else None
    lo_first, _ = bounds(t_first, ds_f)
    _, hi_last = bounds(t_last, ds_l)
    kt_lo = lo_first // block_k
    n_live = pl.cdiv(jnp.maximum(hi_last - kt_lo * block_k, 0), block_k)

    @pl.when(ki < n_live)
    def _compute():
        q = q_ref[0, :, 0]                                # [Tq, h, Dk]
        Dk = q.shape[2]
        qf = q.reshape(block_q * h, Dk)
        qs, post = _q_scale_fold(qf, scale * LOG2E, scale_on_q)
        kt = kt_lo + ki
        # zero OOB K rows (garbage padding memory) — statically skipped
        # when every kv tile is full
        krow = kt * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_k, 1), 0)
        k = k_ref[0, 0] if s_kv % block_k == 0 else (
            jnp.where(krow < s_kv, k_ref[0, 0], 0))       # [Tk, Dk]
        logits = jax.lax.dot_general(
            qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if post != 1.0:
            logits = logits * post
        # flat additive masking on [rows, Tk] (see flash._flash_kernel —
        # the compact-mask head-broadcast reshape is a costly relayout)
        kpos = kt * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
        rowi = jax.lax.broadcasted_iota(jnp.int32, (block_q * h, 1), 0)
        tposf = t_first + rowi // h
        ds_r = None
        if varlen:
            lane = dsrow_ref[0, 0, :].reshape(1, block_q * h)
            ds_r = jax.lax.transpose(lane, (1, 0))        # [rows,1]
        lo_r, hi_r = bounds(tposf, ds_r)
        logits = _band_select(logits, lo_r, hi_r, kpos)
        lse = _load_stats(lse_ref, qi * block_q * h,
                          block_q * h)                    # [rows,1]
        p = jnp.exp2(logits - lse)                         # masked -> exactly 0
                                                          # (empty rows: lse=+1e30)

        do = do_ref[0, :, 0]
        Dv = do.shape[2]
        # matmul operands stay in the input dtype (bf16 in training) so the
        # MXU runs at native rate; accumulation is f32 via
        # preferred_element_type (fp32 operands cost several MXU passes)
        dof = do.reshape(block_q * h, Dv)
        v = v_ref[0, 0] if s_kv % block_k == 0 else (
            jnp.where(krow < s_kv, v_ref[0, 0], 0))
        dpv = jax.lax.dot_general(
            dof, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )                                                  # [rows, Tk]
        delta = _load_stats(delta_ref, qi * block_q * h,
                            block_q * h)
        ds = p * (dpv - delta)
        acc_scr[:] += scale * jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ki == nk_grid - 1)
    def _finalize():
        Dk = dq_ref.shape[4]
        dq_ref[0, :, 0] = acc_scr[:].reshape(block_q, h, Dk).astype(dq_ref.dtype)


def _inverse_q_bounds(mode, w, l, d, k0, block_k, block_q, s, t0):
    """Local q-tile band that can see kv tile [k0, k0+block_k): returns
    (qt_lo, n_live) in LOCAL row coordinates (row = global t - t0)."""
    if mode == "win":
        s_min = jnp.maximum(k0 - t0, 0)                   # t >= k  ->  row >= k - t0
        s_max = k0 + block_k - 1 + w - 1 - t0
        qt_lo = s_min // block_q
        n_live = pl.cdiv(
            jnp.maximum(jnp.minimum(s_max + 1, s) - qt_lo * block_q, 0), block_q
        )
    else:  # cmp: key c needs t >= l - 1 + c*d
        s_min = jnp.maximum(l - 1 + k0 * d - t0, 0)
        qt_lo = s_min // block_q
        n_live = jnp.maximum(pl.cdiv(s, block_q) - qt_lo, 0)
    return qt_lo, n_live


def _dkv_kernel(
    t0_ref, *refs,
    mode, w, l, d, scale, block_q, block_k, h, nq_grid, s, s_kv,
    varlen=False, scale_on_q=True,
):
    if varlen:
        (ds_tile_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dsrow_ref, dk_ref, dv_ref, dk_scr, dv_scr) = refs
    else:
        ds_tile_ref = dsrow_ref = None
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
         dk_ref, dv_ref, dk_scr, dv_scr) = refs
    ki = pl.program_id(2)
    qi_rel = pl.program_id(3)
    bounds = _bounds_fn(mode, w, l, d)
    t0 = t0_ref[0]

    @pl.when(qi_rel == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    # inverse bounds: local q rows that can see keys in this kv tile
    k0 = ki * block_k
    qt_lo, n_live = _inverse_q_bounds(mode, w, l, d, k0, block_k, block_q, s, t0)

    @pl.when(qi_rel < n_live)
    def _compute():
        qt = qt_lo + qi_rel
        q = q_ref[0, :, 0]                                # [Tq, h, Dk]
        Dk = q.shape[2]
        srow = qt * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
        rowv = srow < s                                   # [Tq,1] valid q rows
        # zero OOB q/dO rows and sanitize their lse/delta (a garbage row
        # contaminates entire dK/dV *columns* through the matmuls) —
        # statically skipped when every q tile is full
        full_q = s % block_q == 0
        if not full_q:
            q = jnp.where(rowv[:, :, None], q, 0)
        qf = q.reshape(block_q * h, Dk)
        qs, post = _q_scale_fold(qf, scale * LOG2E, scale_on_q)
        k = k_ref[0, 0]
        logits = jax.lax.dot_general(
            qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if post != 1.0:
            logits = logits * post
        # flat additive masking on [rows, Tk] (see flash._flash_kernel)
        kpos = k0 + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
        flat = jax.lax.broadcasted_iota(jnp.int32, (block_q * h, 1), 0)
        tposf = t0 + qt * block_q + flat // h             # [rows,1]
        ds_r = None
        if varlen:
            lane = dsrow_ref[0, 0, :].reshape(1, block_q * h)
            ds_r = jax.lax.transpose(lane, (1, 0))        # [rows,1]
        lo_r, hi_r = bounds(tposf, ds_r)
        logits = _band_select(logits, lo_r, hi_r, kpos)
        rowvf = (qt * block_q + flat // h) < s            # [rows,1] bool
        lse_raw = _load_stats(lse_ref, qt * block_q * h,
                              block_q * h)
        lse = lse_raw if full_q else jnp.where(rowvf, lse_raw, EMPTY_LSE)
        p = jnp.exp2(logits - lse)                         # [rows, Tk]

        do = do_ref[0, :, 0]
        Dv = do.shape[2]
        # bf16 matmul operands, f32 accumulate (see _dq_kernel note)
        if not full_q:
            do = jnp.where(rowv[:, :, None], do, 0)
        dof = do.reshape(block_q * h, Dv)
        dv_scr[:] += jax.lax.dot_general(
            p.astype(do.dtype), dof, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # [Tk, Dv]
        v = v_ref[0, 0]
        krow = k0 + jax.lax.broadcasted_iota(jnp.int32, (block_k, 1), 0)
        vf = v if s_kv % block_k == 0 else jnp.where(krow < s_kv, v, 0)
        dpv = jax.lax.dot_general(
            dof, vf, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        delta_raw = _load_stats(delta_ref, qt * block_q * h,
                                block_q * h)
        delta = delta_raw if full_q else (
            jnp.where(rowvf, delta_raw, jnp.float32(0.0)))
        ds = p * (dpv - delta)
        dk_scr[:] += scale * jax.lax.dot_general(
            ds.astype(q.dtype), qf, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                  # [Tk, Dk]

    @pl.when(qi_rel == nq_grid - 1)
    def _finalize():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _onepass_bwd_kernel(
    t0_ref, *refs,
    mode, w, l, d, scale, block_q, block_k, h, nq_grid, nq_total, s, s_kv,
    varlen=False, scale_on_q=True, fastpath=True, gated=False,
    flat_do=False,
):
    """ONE-pass flash backward: kv-major grid (b, g, ki, qt). P/dS are
    computed ONCE per (kv-tile, q-tile) pair and feed all three products
    (the two-pass dq+dkv backward recomputes the QK matmul, masking and
    exp twice — measured ~2.3x the forward's cost end-to-end; this kernel
    does ~1.4x):
      dV[ki] += P^T dO        (VMEM scratch, resident per kv tile)
      dK[ki] += dS^T Q
      dQ[qt] += dS K          (per-q-tile slot in a [nq*rows, Dk] scratch,
                               written through to HBM every step — the
                               final store of each slot lands after its
                               last contribution; earlier partial stores
                               are benignly overwritten)

    (`ksplit` lane sub-tiling of the body was tried and REMOVED in r4 —
    Mosaic allocates the unrolled sub-iterations' temporaries
    simultaneously, so it never reduced peak VMEM, and the isolating
    control cost −7% e2e; see docs/KERNELS.md dead ends.)"""
    refs = list(refs)
    if varlen:
        ds_tile_ref = refs.pop(0)
    else:
        ds_tile_ref = None
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref = refs[:6]
    refs = refs[6:]
    g_ref = refs.pop(0) if gated else None
    dsrow_ref = refs.pop(0) if varlen else None
    if flat_do:
        (dq_ref, dk_ref, dv_ref, dq_scr, dk_scr, dv_scr, do_scr) = refs
    else:
        (dq_ref, dk_ref, dv_ref, dq_scr, dk_scr, dv_scr) = refs
        do_scr = None
    b = pl.program_id(0)
    ki = pl.program_id(2)
    qi_rel = pl.program_id(3)
    bounds = _bounds_fn(mode, w, l, d)
    t0 = t0_ref[0]
    rows = block_q * h
    nslots = dq_scr.shape[0] // rows

    @pl.when(qi_rel == 0)
    def _init_dkv():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    k0 = ki * block_k
    qt_lo, n_live = _inverse_q_bounds(mode, w, l, d, k0, block_k, block_q, s, t0)
    qt = qt_lo + jnp.minimum(qi_rel, jnp.maximum(n_live - 1, 0))
    qt = jnp.clip(qt, 0, nq_total - 1)
    # ring slot: only the in-flight q-tiles live in scratch. A tile's
    # FIRST visiting kv tile is closed-form, so its slot is initialized
    # (overwritten) there instead of pre-zeroing the whole scratch.
    slot0 = (qt % nslots) * rows
    if mode == "win":
        first_ki = jnp.maximum(t0 + qt * block_q - w + 1, 0) // block_k
    else:
        first_ki = jnp.zeros_like(qt)   # cmp: every visited tile starts at ki=0
                                        # (requires l - 1 <= block_q * <any>;
                                        # guarded in the entry point)
    first_visit = ki == first_ki

    @pl.when(qi_rel < n_live)
    def _compute():
        t_first = t0 + qt * block_q
        t_last = t_first + block_q - 1

        def _body(qf, qs, post, dof, lse, delta, *, sanitize_kv, bounds_rows):
            """P/dS once per tile pair -> dV/dK scratch accum + dQ slot."""
            k = k_ref[0, 0]
            v = v_ref[0, 0]
            if sanitize_kv:
                krow = k0 + jax.lax.broadcasted_iota(
                    jnp.int32, (block_k, 1), 0)
                k = jnp.where(krow < s_kv, k, 0)
                v = jnp.where(krow < s_kv, v, 0)
            logits = jax.lax.dot_general(
                qs, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if post != 1.0:
                logits = logits * post
            if bounds_rows is not None:
                lo_r, hi_r = bounds_rows
                kpos = k0 + jax.lax.broadcasted_iota(
                    jnp.int32, (1, block_k), 1)
                logits = _band_select(logits, lo_r, hi_r, kpos)
            p = jnp.exp2(logits - lse)                     # [rows, Tk]
            dv_scr[:] += jax.lax.dot_general(
                p.astype(dof.dtype), dof, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dpv = jax.lax.dot_general(
                dof, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = (p * (dpv - delta)).astype(qf.dtype)
            dk_scr[:] += scale * jax.lax.dot_general(
                ds, qf, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            contrib = scale * jax.lax.dot_general(
                ds, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            slot = pl.dslice(slot0, rows)
            prev = jnp.where(first_visit, 0.0, dq_scr[slot, :])
            dq_scr[slot, :] = prev + contrib

        def _slow():
            q = q_ref[0, :, 0]                            # [Tq, h, Dk]
            Dk = q.shape[2]
            srow = qt * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, 1), 0)
            rowv = srow < s
            full_q = s % block_q == 0
            q_z = q if full_q else jnp.where(rowv[:, :, None], q, 0)
            qf = q_z.reshape(rows, Dk)
            qs, post = _q_scale_fold(qf, scale * LOG2E, scale_on_q)
            flat = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
            tposf = t0 + qt * block_q + flat // h
            ds_r = None
            if varlen:
                lane = dsrow_ref[0, 0, :].reshape(1, rows)
                ds_r = jax.lax.transpose(lane, (1, 0))
            lo_r, hi_r = bounds(tposf, ds_r)
            rowvf = (qt * block_q + flat // h) < s
            lse_raw = _load_stats(lse_ref, qt * rows, rows)
            lse = lse_raw if full_q else jnp.where(rowvf, lse_raw, EMPTY_LSE)
            if flat_do:
                # unpadded flat [B,S,G*h*Dv] dO (see flash flat-IO note)
                do = do_ref[0]                            # [Tq, h*Dv]
                Dv = do.shape[1] // h
                if not full_q:
                    do = jnp.where(rowv, do, 0)
                dof = load_flat_rows(do, do_scr, block_q, h, Dv)
            else:
                do = do_ref[0, :, 0]
                Dv = do.shape[2]
                if not full_q:
                    do = jnp.where(rowv[:, :, None], do, 0)
                dof = do.reshape(rows, Dv)
            if gated:
                # gate fold: the branch upstream is g*dO — scale the dO
                # tile in-register (replaces the XLA-materialized
                # [B,S,G,h,Dv] dO_branch per branch; delta is the GATED
                # delta D = rowsum(dO*Y), passed in unchanged)
                gt = _load_stats(g_ref, qt * rows, rows)
                dof = (dof * gt).astype(do.dtype)
            delta_raw = _load_stats(delta_ref, qt * rows, rows)
            delta = delta_raw if full_q else (
                jnp.where(rowvf, delta_raw, jnp.float32(0.0)))
            _body(qf, qs, post, dof, lse, delta,
                  sanitize_kv=s_kv % block_k != 0,
                  bounds_rows=(lo_r, hi_r))

        def _fast():
            # fully-live pair (see flash._flash_kernel): no band select,
            # no OOB zeroing/sanitizing. Requires the q tile fully in
            # range (the fast predicate checks it) so the raw lse/delta
            # rows are all real.
            q = q_ref[0, :, 0]
            qf = q.reshape(rows, q.shape[2])
            qs, post = _q_scale_fold(qf, scale * LOG2E, scale_on_q)
            lse = _load_stats(lse_ref, qt * rows, rows)
            delta = _load_stats(delta_ref, qt * rows, rows)
            dof = (load_flat_rows(do_ref[0], do_scr, block_q, h,
                                  do_ref.shape[2] // h)
                   if flat_do
                   else do_ref[0, :, 0].reshape(rows, do_ref.shape[4]))
            if gated:
                gt = _load_stats(g_ref, qt * rows, rows)
                dof = (dof * gt).astype(do_ref.dtype)
            _body(qf, qs, post, dof, lse, delta,
                  sanitize_kv=False, bounds_rows=None)

        if fastpath:
            ds_f = ds_tile_ref[b, 0, qt] if varlen else None
            ds_l = ds_tile_ref[b, 1, qt] if varlen else None
            lo_last, _ = bounds(t_last, ds_l)
            _, hi_first = bounds(t_first, ds_f)
            full = ((k0 >= lo_last) & (k0 + block_k <= hi_first)
                    & (qt * block_q + block_q <= s))

            @pl.when(full)
            def _():
                _fast()

            @pl.when(jnp.logical_not(full))
            def _():
                _slow()
        else:
            _slow()

    # write-through the CURRENT q-tile's dq slot every step (clamped qt on
    # dead steps rewrites an existing slot's partial sum — harmless).
    # Dead steps whose slot would alias an UNINITIALIZED tile are masked
    # by first_visit semantics: a clamped qt equals a live tile of this
    # ki, whose slot is valid. (A last-visit-only store is NOT possible:
    # Pallas flushes the out block to HBM on every out-index change
    # whether or not the kernel wrote it, so a skipped write would flush
    # stale buffer contents into this step's block — and the HBM copy
    # traffic is driven by the BlockSpec revisits, not the VMEM store.)
    Dk_o = dq_ref.shape[4]
    dq_ref[0, :, 0] = dq_scr[pl.dslice(slot0, rows), :].reshape(
        block_q, h, Dk_o).astype(dq_ref.dtype)

    @pl.when(qi_rel == nq_grid - 1)
    def _finalize():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


def _apply_gate_dense(dO, gate_rows, h):
    """Fallback for paths without in-kernel gating: materialize the
    gated upstream g*dO from the flat gate rows (same values the gated
    kernel computes in-register)."""
    B, S, G = dO.shape[0], dO.shape[1], dO.shape[2]
    g = gate_rows[:, 0, :S * h].reshape(B, G, S, h).transpose(0, 2, 1, 3)
    return (dO * g[..., None]).astype(dO.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("mode", "w", "l", "d", "scale", "block_q", "block_k",
                     "interpret", "scale_on_q", "fastpath"),
)
def flash_banded_bwd_onepass(
    Q, K, V, dO, lse, delta,
    *, mode, w=0, l=0, d=1, scale=1.0, block_q=128, block_k=512,
    interpret=False, t_start=None, seq_start=None,
    scale_on_q=None, fastpath=None, gate_rows=None,
):
    """One-pass backward (see _onepass_bwd_kernel). Same contract as
    flash_banded_bwd. The dq scratch is [nslots*rows, Dk] f32 — sequences
    longer than q_chunk are processed per chunk (dK/dV summed across
    chunks) so it stays a few MB.

    Precondition: every query row's visible keys exist, i.e. S_kv covers
    positions up to t_start + S (win) / num_cmp(t_start + S) (cmp) — true
    for every framework call site (the KV stream always covers the query
    positions). A q-tile whose band lies wholly beyond S_kv would never
    be visited by the kv-major grid and its dq block would stay
    unwritten."""
    from nsa_vibe_tpu.ops.pallas.flash import _as_t0, _varlen_operands, stats_rows as _sr
    from nsa_vibe_tpu.ops.tuning import tuned

    flat_do = dO.ndim == 3          # flat [B,S,G*h*Dv] upstream (flat-IO)
    if (mode == "win" and w > 0 and Q.shape[1] >= 128
            and bool(tuned("win.bwd_diag", 0))):
        # diagonal band tiling (ops/pallas/flash_diag.py): one step per
        # q-tile, exact band fetch, dK/dV via scatter-added strips
        from nsa_vibe_tpu.ops.pallas.flash_diag import flash_banded_bwd_diag

        if flat_do:                 # diag bwd consumes the 5-D layout
            _b, _s, _g, _h, _dk = Q.shape
            dO = dO.reshape(_b, _s, _g, _h, -1)
        if gate_rows is not None:   # diag bwd has no in-kernel gating
            dO = _apply_gate_dense(dO, gate_rows, Q.shape[3])
        return flash_banded_bwd_diag(
            Q, K, V, dO, lse, delta, w=w, scale=scale,
            block_q=int(tuned("win.bwd_diag_block_q", 128)),
            interpret=interpret, t_start=t_start, seq_start=seq_start,
            scale_on_q=scale_on_q)
    if scale_on_q is None:
        scale_on_q = bool(tuned("flash.scale_on_q"))
    if fastpath is None:
        fastpath = bool(tuned("flash.fastpath"))
    B, S, G, h, Dk = Q.shape
    S_kv, Dv = K.shape[2], V.shape[3]
    # VMEM guard (mirrors flash_banded's): the fastpath branch keeps both
    # bodies' [rows, block_k] f32 intermediates live — at 256-row
    # q tiles with bk=512 that alone is ~12 MB and compile-OOMs under
    # the default 16 MB scoped budget. Drop the flag instead of failing
    # so tile sweeps stay runnable. The threshold scales with
    # vmem.scoped_kib (6 MB of 16 MB default): a raised budget re-admits
    # fastpath at the 256-row tiles it unlocked.
    from nsa_vibe_tpu.ops.tuning import scoped_vmem_bytes
    if fastpath and 2 * block_q * h * block_k * 4 > (6 * scoped_vmem_bytes()) // 16:
        fastpath = False

    q_chunk = 2048
    if S > q_chunk and S % q_chunk == 0:
        dqs = []
        dk_total = jnp.zeros(K.shape, jnp.float32)
        dv_total = jnp.zeros(V.shape, jnp.float32)
        t0_base = _as_t0(t_start)
        for i in range(S // q_chunk):
            sl = slice(i * q_chunk, (i + 1) * q_chunk)
            slh = slice(i * q_chunk * h, i * q_chunk * h + _sr(q_chunk, h))
            dq_i, dk_i, dv_i = flash_banded_bwd_onepass(
                Q[:, sl], K, V, dO[:, sl], lse[:, :, slh], delta[:, :, slh],
                mode=mode, w=w, l=l, d=d, scale=scale, block_q=block_q,
                block_k=block_k, interpret=interpret,
                t_start=t0_base + i * q_chunk,
                seq_start=None if seq_start is None else seq_start[:, sl],
                scale_on_q=scale_on_q, fastpath=fastpath,
                gate_rows=None if gate_rows is None else gate_rows[:, :, slh],
            )
            dqs.append(dq_i)
            dk_total = dk_total + dk_i.astype(jnp.float32)
            dv_total = dv_total + dv_i.astype(jnp.float32)
        return (jnp.concatenate(dqs, axis=1), dk_total.astype(K.dtype),
                dv_total.astype(V.dtype))
    block_q = min(block_q, max(S, 8))
    block_k = min(block_k, max(S_kv, 8))
    nq = pl.cdiv(S, block_q)
    nk_total = pl.cdiv(S_kv, block_k)
    t0 = _as_t0(t_start)
    varlen = seq_start is not None
    if varlen:
        ds_row, ds_tile = _varlen_operands(seq_start, S, block_q, nq, h)

    if mode == "win":
        nq_inner = min(pl.cdiv(block_k + w - 1, block_q) + 1, nq)
        nslots = min(nq_inner + 1, nq)   # in-flight q-tiles per kv tile
    else:
        nq_inner = nq
        nslots = nq                      # prefix mode: all tiles in flight
        if l - 1 >= block_q:             # would break first_ki == 0 (cmp)
            if flat_do:                  # two-pass bwd consumes 5-D
                dO = dO.reshape(B, S, G, h, Dv)
            if gate_rows is not None:    # two-pass bwd has no in-kernel gating
                dO = _apply_gate_dense(dO, gate_rows, h)
            return flash_banded_bwd(
                Q, K, V, dO, lse, delta, mode=mode, w=w, l=l, d=d, scale=scale,
                block_q=block_q, block_k=block_k, interpret=interpret,
                t_start=t_start, seq_start=seq_start, scale_on_q=scale_on_q)

    def q_index(b, g, ki, qi, t0_ref, *more):
        k0 = ki * block_k
        qt_lo, n_live = _inverse_q_bounds(
            mode, w, l, d, k0, block_k, block_q, S, t0_ref[0])
        qt = qt_lo + jnp.minimum(qi, jnp.maximum(n_live - 1, 0))
        return jnp.clip(qt, 0, nq - 1)

    rows = block_q * h
    q_spec = pl.BlockSpec((1, block_q, 1, h, Dk),
                          lambda b, g, ki, qi, *sr: (b, q_index(b, g, ki, qi, *sr), g, 0, 0),
                          memory_space=pltpu.VMEM)
    if flat_do:
        do_spec = pl.BlockSpec(
            (1, block_q, h * Dv),
            lambda b, g, ki, qi, *sr: (b, q_index(b, g, ki, qi, *sr), g),
            memory_space=pltpu.VMEM)
    else:
        do_spec = pl.BlockSpec(
            (1, block_q, 1, h, Dv),
            lambda b, g, ki, qi, *sr: (b, q_index(b, g, ki, qi, *sr), g, 0, 0),
            memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((1, 1, stats_rows(S, h)),
                             lambda b, g, ki, qi, *_: (b * G + g, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [
        q_spec,
        pl.BlockSpec((1, 1, block_k, Dk), lambda b, g, ki, qi, *_: (b, g, ki, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_k, Dv), lambda b, g, ki, qi, *_: (b, g, ki, 0),
                     memory_space=pltpu.VMEM),
        do_spec, stat_spec, stat_spec,
    ]
    if gate_rows is not None:
        in_specs.append(stat_spec)
    if varlen:
        in_specs.append(pl.BlockSpec(
            (1, 1, rows),
            lambda b, g, ki, qi, *sr: (b, 0, q_index(b, g, ki, qi, *sr)),
            memory_space=pltpu.VMEM))
    out_specs = [
        pl.BlockSpec((1, block_q, 1, h, Dk),
                     lambda b, g, ki, qi, *sr: (b, q_index(b, g, ki, qi, *sr), g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_k, Dk), lambda b, g, ki, qi, *_: (b, g, ki, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_k, Dv), lambda b, g, ki, qi, *_: (b, g, ki, 0),
                     memory_space=pltpu.VMEM),
    ]
    dq, dk, dv = pl.pallas_call(
        functools.partial(_onepass_bwd_kernel, mode=mode, w=w, l=l, d=d,
                          scale=scale, block_q=block_q, block_k=block_k, h=h,
                          nq_grid=nq_inner, nq_total=nq, s=S, s_kv=S_kv,
                          varlen=varlen, scale_on_q=scale_on_q,
                          fastpath=fastpath, gated=gate_rows is not None,
                          flat_do=flat_do),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2 if varlen else 1,
            grid=(B, G, nk_total, nq_inner),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((nslots * rows, Dk), jnp.float32),
                pltpu.VMEM((block_k, Dk), jnp.float32),
                pltpu.VMEM((block_k, Dv), jnp.float32),
            ] + ([pltpu.VMEM((block_q, h, Dv), jnp.float32)] if flat_do else []),
        ),
        out_shape=[
            jax.ShapeDtypeStruct(Q.shape, Q.dtype),
            jax.ShapeDtypeStruct(K.shape, K.dtype),
            jax.ShapeDtypeStruct(V.shape, V.dtype),
        ],
        interpret=interpret,
    )(*([t0, ds_tile] if varlen else [t0]), Q, K, V, dO, lse, delta,
      *([gate_rows] if gate_rows is not None else []),
      *([ds_row] if varlen else []))
    return dq, dk, dv


@functools.partial(
    jax.jit,
    static_argnames=("mode", "w", "l", "d", "scale", "block_q", "block_k",
                     "interpret", "scale_on_q"),
)
def flash_banded_bwd(
    Q, K, V, dO, lse, delta,
    *, mode, w=0, l=0, d=1, scale=1.0, block_q=128, block_k=128, interpret=False,
    t_start=None, seq_start=None, scale_on_q=None, gate_rows=None,
):
    """lse/delta: flat [B*G, 1, stats_rows(S, h)] float32 (row = t*h + head).
    Returns (dQ, dK, dV). `t_start`: traced global position of row 0
    (sequence-sharded / chunked prefill). `seq_start` [B,S]: per-row
    document starts (varlen batching; see flash_banded). `gate_rows`:
    gate fold — this two-pass kernel pre-scales dO in XLA (no in-kernel
    gating; the tuned path is the one-pass kernel)."""
    from nsa_vibe_tpu.ops.pallas.flash import _as_t0, _varlen_operands
    from nsa_vibe_tpu.ops.tuning import tuned

    if dO.ndim == 3:               # flat-IO upstream: this kernel is 5-D
        dO = dO.reshape(*Q.shape[:4], -1)
    if gate_rows is not None:
        dO = _apply_gate_dense(dO, gate_rows, Q.shape[3])
    if scale_on_q is None:
        scale_on_q = bool(tuned("flash.scale_on_q"))
    B, S, G, h, Dk = Q.shape
    S_kv, Dv = K.shape[2], V.shape[3]
    block_q = min(block_q, max(S, 8))
    block_k = min(block_k, max(S_kv, 8))
    nq = pl.cdiv(S, block_q)
    nk_total = pl.cdiv(S_kv, block_k)
    bounds = _bounds_fn(mode, w, l, d)
    t0 = _as_t0(t_start)
    varlen = seq_start is not None
    if varlen:
        ds_row, ds_tile = _varlen_operands(seq_start, S, block_q, nq, h)

    if mode == "win":
        nk = min(pl.cdiv(block_q - 1 + w, block_k) + 1, nk_total)
    else:
        nk = nk_total

    def k_index(b, g, qi, ki, t0_ref, *more):
        t_first = t0_ref[0] + qi * block_q
        ds_f = more[0][b, 0, qi] if varlen else None
        ds_l = more[0][b, 1, qi] if varlen else None
        lo_first, _ = bounds(t_first, ds_f)
        _, hi_last = bounds(t_first + block_q - 1, ds_l)
        kt_lo = lo_first // block_k
        n_live = pl.cdiv(jnp.maximum(hi_last - kt_lo * block_k, 0), block_k)
        kt = kt_lo + jnp.minimum(ki, jnp.maximum(n_live - 1, 0))
        return (b, g, jnp.clip(kt, 0, nk_total - 1), 0)

    q_spec = pl.BlockSpec((1, block_q, 1, h, Dk), lambda b, g, qi, ki, *_: (b, qi, g, 0, 0),
                          memory_space=pltpu.VMEM)
    do_spec = pl.BlockSpec((1, block_q, 1, h, Dv), lambda b, g, qi, ki, *_: (b, qi, g, 0, 0),
                           memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((1, 1, stats_rows(S, h)),
                             lambda b, g, qi, ki, *_: (b * G + g, 0, 0),
                             memory_space=pltpu.VMEM)
    dsrow_q_spec = pl.BlockSpec((1, 1, block_q * h),
                                lambda b, g, qi, ki, *_: (b, 0, qi),
                                memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, mode=mode, w=w, l=l, d=d, scale=scale,
                          block_q=block_q, block_k=block_k, h=h, nk_grid=nk,
                          s_kv=S_kv, varlen=varlen, scale_on_q=scale_on_q),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2 if varlen else 1,
            grid=(B, G, nq, nk),
            in_specs=[
                q_spec,
                pl.BlockSpec((1, 1, block_k, Dk), k_index, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_k, Dv), k_index, memory_space=pltpu.VMEM),
                do_spec, stat_spec, stat_spec,
            ] + ([dsrow_q_spec] if varlen else []),
            out_specs=pl.BlockSpec((1, block_q, 1, h, Dk),
                                   lambda b, g, qi, ki, *_: (b, qi, g, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((block_q * h, Dk), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct(Q.shape, Q.dtype),
        interpret=interpret,
    )(*([t0, ds_tile] if varlen else [t0]), Q, K, V, dO, lse, delta,
      *([ds_row] if varlen else []))

    # kv-major pass
    if mode == "win":
        nq_inner = min(pl.cdiv(block_k + w - 1, block_q) + 1, nq)
    else:
        nq_inner = nq

    def q_index(b, g, ki, qi, t0_ref):
        # inverse bounds stay closed-form (no ds): the doc constraint only
        # shrinks the visible q set within the band; excess tiles are
        # masked in-kernel
        k0 = ki * block_k
        qt_lo, n_live = _inverse_q_bounds(
            mode, w, l, d, k0, block_k, block_q, S, t0_ref[0]
        )
        qt = qt_lo + jnp.minimum(qi, jnp.maximum(n_live - 1, 0))
        return jnp.clip(qt, 0, nq - 1)

    def _qi(b, g, ki, qi, t0_ref, *more):
        return q_index(b, g, ki, qi, t0_ref)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, mode=mode, w=w, l=l, d=d, scale=scale,
                          block_q=block_q, block_k=block_k, h=h,
                          nq_grid=nq_inner, s=S, s_kv=S_kv, varlen=varlen,
                          scale_on_q=scale_on_q),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2 if varlen else 1,
            grid=(B, G, nk_total, nq_inner),
            in_specs=[
                pl.BlockSpec((1, block_q, 1, h, Dk),
                             lambda b, g, ki, qi, *sr: (b, _qi(b, g, ki, qi, *sr), g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_k, Dk), lambda b, g, ki, qi, *_: (b, g, ki, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_k, Dv), lambda b, g, ki, qi, *_: (b, g, ki, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_q, 1, h, Dv),
                             lambda b, g, ki, qi, *sr: (b, _qi(b, g, ki, qi, *sr), g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, stats_rows(S, h)),
                             lambda b, g, ki, qi, *_: (b * G + g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, stats_rows(S, h)),
                             lambda b, g, ki, qi, *_: (b * G + g, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + ([pl.BlockSpec((1, 1, block_q * h),
                               lambda b, g, ki, qi, *sr: (b, 0, _qi(b, g, ki, qi, *sr)),
                               memory_space=pltpu.VMEM)] if varlen else []),
            out_specs=[
                pl.BlockSpec((1, 1, block_k, Dk), lambda b, g, ki, qi, *_: (b, g, ki, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, block_k, Dv), lambda b, g, ki, qi, *_: (b, g, ki, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_k, Dk), jnp.float32),
                pltpu.VMEM((block_k, Dv), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(K.shape, K.dtype),
            jax.ShapeDtypeStruct(V.shape, V.dtype),
        ],
        interpret=interpret,
    )(*([t0, ds_tile] if varlen else [t0]), Q, K, V, dO, lse, delta,
      *([ds_row] if varlen else []))
    return dq, dk, dv
