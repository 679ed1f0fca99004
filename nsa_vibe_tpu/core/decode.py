"""Single-token decode step — fully jitted, static shapes, O(reads) work.

Reference behavior contract (nsa/core/nsa_attention.py:545-976):
  * append token to selection + window caches;
  * emit one compressed token every d steps after warmup l
    ((S_raw - l) % d == 0), ϕ over the last l raw tokens with K RoPE'd at
    absolute positions;
  * selection scored against the emitted compressed stream, group-reduced,
    deterministic top-n with forced blocks;
  * per-step read counters: num_cmp(S) + n*l' + min(w, S).

TPU-first: the caches are fixed-capacity (see core/cache.py), the emission
is an O(1) gather/scatter under a flag (no lax.cond buffer copies), and the
selection branch *gathers* exactly n*l' keys (XLA gather reads only the
gathered rows — per-step HBM traffic is O(num_cmp_capacity + w + n*l'),
matching the NSA complexity claim, not O(S)).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nsa_vibe_tpu.core.cache import NSACache, cmp_capacity
from nsa_vibe_tpu.core.config import NSAConfig
from nsa_vibe_tpu.core.nsa import combine_branches, project_qkv
from nsa_vibe_tpu.ops.rope import apply_rope
from nsa_vibe_tpu.ops.selection import select_topn_blocks, selection_scores

NEG_INF = float("-inf")


class DecodeInfo(NamedTuple):
    """Per-step observability (reference decode.reads / decode.select logs)."""

    reads_pred: jnp.ndarray   # num_cmp + n*l' + min(w, S_raw)
    reads_cmp: jnp.ndarray    # num_cmp(S_raw)
    reads_sel: jnp.ndarray    # n*l' (padded static gather width)
    reads_win: jnp.ndarray    # min(w, S_raw)
    sel_valid_tokens: jnp.ndarray  # actual un-masked gathered tokens (per B,G mean)
    # actual reads, counted from the masks the attention REALLY applied
    # (reference keeps independent actual counters, nsa/cache/
    # kv_cache.py:51-65, so formula-vs-reality divergence is detectable;
    # reads_actual_sel < reads_sel whenever selection under-fills its
    # padded n*l' gather width)
    reads_actual: jnp.ndarray      # cmp + sel + win actuals (per B,G mean)
    reads_actual_cmp: jnp.ndarray
    reads_actual_sel: jnp.ndarray
    reads_actual_win: jnp.ndarray
    sel_idx: jnp.ndarray      # [B,1,G,n] selected blocks
    gates: jnp.ndarray        # [B,1,G,3]
    overflow: jnp.ndarray     # bool: this step wrote past cache capacity
                              # (XLA clamps the write index — the output is
                              # garbage; callers must check or size capacity)


def _masked_single_query_attention(Q, K, V, valid, scale):
    """Q: [B,G,h,Dk]; K/V: [B,G,N,D*]; valid: [B,G,N], [B,N] (per-row
    ragged visibility) or [N] bool."""
    logits = jnp.einsum(
        "bghd,bgnd->bghn", Q.astype(jnp.float32), K.astype(jnp.float32)
    ) * scale
    if valid.ndim == 1:
        valid = valid[None, None, :]
    elif valid.ndim == 2:
        valid = valid[:, None, :]
    logits = jnp.where(valid[:, :, None, :], logits, NEG_INF)
    any_visible = jnp.any(valid, axis=-1)[:, :, None, None]
    p = jax.nn.softmax(logits, axis=-1)
    p = jnp.where(any_visible, p, 0.0)
    out = jnp.einsum("bghn,bgnv->bghv", p, V.astype(jnp.float32))
    return out.astype(Q.dtype)


def _gathered_selection_attention(Q, k_sel, v_sel, blocks, t, l_sel, scale,
                                  use_kernel: bool = False):
    """Selection branch for one decoded token. blocks: [B,G,n]; t is a
    scalar (uniform batch) or [B] (ragged — per-row depths, serving).

    Two implementations with identical semantics (full softmax over the
    gathered set, positions clamped to <= t):
      * XLA gather + masked SDPA (CPU / reference path);
      * the per-query Pallas gather kernel (ops.pallas.selection), which
        DMAs exactly the selected blocks — measured 15.0 us vs 27.3 us
        for the XLA gather at S=4096 decode shapes on v5e (r2 slope
        bench), so it is the TPU decode hot path for uniform AND ragged
        batches (reference decode routing: nsa/core/nsa_attention.py:
        709-830 -> CUDA gather, cuda_sel_kernel/sel_cuda.cpp:28-73).
    Returns (out [B,G,h,Dv], valid [B,G,n,l_sel])."""
    B, G, C, Dk = k_sel.shape
    n = blocks.shape[-1]
    t = jnp.asarray(t)
    ragged = t.ndim == 1
    t_b = t[:, None, None, None] if ragged else t
    tok = blocks[..., None] * l_sel + jnp.arange(l_sel, dtype=jnp.int32)  # [B,G,n,l_sel]
    valid = (blocks[..., None] >= 0) & (tok <= t_b) & (tok < C)
    if use_kernel:
        from nsa_vibe_tpu.ops.pallas.selection import selection_attention_pallas

        tp = t[:, None] if ragged else t[None]
        out = selection_attention_pallas(
            Q[:, None], k_sel, v_sel, blocks[:, None], tp.astype(jnp.int32),
            l_sel=l_sel, scale=scale,
        )[:, 0]
        return out, valid
    flat = tok.reshape(B, G, n * l_sel)
    safe = jnp.clip(flat, 0, C - 1)
    K = jnp.take_along_axis(k_sel, safe[..., None], axis=2)  # [B,G,n*l_sel,Dk]
    V = jnp.take_along_axis(v_sel, safe[..., None], axis=2)
    out = _masked_single_query_attention(Q, K, V, valid.reshape(B, G, -1), scale)
    return out, valid


def nsa_decode_step(
    params: dict, x: jnp.ndarray, cache: NSACache, cfg: NSAConfig
) -> Tuple[jnp.ndarray, NSACache, DecodeInfo]:
    """One decode step. x: [B, 1, dim] -> (out [B,1,dim], cache', info)."""
    B = x.shape[0]
    G, h = cfg.n_kv_groups, cfg.h_per_group
    C = cache.capacity
    C_cmp = cmp_capacity(C, cfg.l, cfg.d)
    scale = 1.0 / float(np.sqrt(cfg.d_k))
    t = cache.t                     # tokens already cached; this token's position
    s_raw = t + 1                   # raw length after appending

    Q, K_sel, V_sel, K_win, V_win, K_cmp_raw, V_cmp_raw = project_qkv(params, x, cfg)
    pos = t[None]
    Q = apply_rope(Q, pos[:, None], cfg.rope_base, cfg.rope_scale)  # per-head
    Q = Q.reshape(B, 1, G, h, cfg.d_k)
    K_sel = apply_rope(K_sel, pos, cfg.rope_base, cfg.rope_scale)
    K_win = apply_rope(K_win, pos, cfg.rope_base, cfg.rope_scale)
    K_cmp_rope = apply_rope(K_cmp_raw, pos, cfg.rope_base, cfg.rope_scale)

    # --- cache writes (index-addressed, O(1)) ---
    k_sel = jax.lax.dynamic_update_slice(cache.k_sel, K_sel, (0, 0, t, 0))
    v_sel = jax.lax.dynamic_update_slice(cache.v_sel, V_sel, (0, 0, t, 0))
    win_slot = t % cfg.w
    k_win = jax.lax.dynamic_update_slice(cache.k_win, K_win, (0, 0, win_slot, 0))
    v_win = jax.lax.dynamic_update_slice(cache.v_win, V_win, (0, 0, win_slot, 0))
    raw_slot = t % cfg.l
    k_cmp_raw = jax.lax.dynamic_update_slice(cache.k_cmp_raw, K_cmp_rope, (0, 0, raw_slot, 0))
    v_cmp_raw = jax.lax.dynamic_update_slice(cache.v_cmp_raw, V_cmp_raw, (0, 0, raw_slot, 0))

    # --- compressed emission: every d steps after warmup l ---
    emit = (s_raw >= cfg.l) & ((s_raw - cfg.l) % cfg.d == 0)
    num_cmp = jnp.where(s_raw >= cfg.l, (s_raw - cfg.l) // cfg.d + 1, 0).astype(jnp.int32)
    e_slot = jnp.clip(num_cmp - 1, 0, C_cmp - 1)
    if cfg.phi == "conv":
        # ordered window: positions s_raw-l .. s_raw-1 live at slots pos % l
        order = (jnp.arange(cfg.l, dtype=jnp.int32) + s_raw) % cfg.l
        k_window = jnp.take(k_cmp_raw, order, axis=2)       # [B,G,l,Dk]
        v_window = jnp.take(v_cmp_raw, order, axis=2)
        k_new = jnp.einsum("bgld,dl->bgd", k_window, params["phi_k"].astype(k_window.dtype))
        v_new = jnp.einsum("bgld,dl->bgd", v_window, params["phi_v"].astype(v_window.dtype))
    else:
        k_new = k_cmp_raw.mean(axis=2)                       # avg ϕ (ring order-free)
        v_new = v_cmp_raw.mean(axis=2)
    old_k = jax.lax.dynamic_slice(cache.k_cmp, (0, 0, e_slot, 0), (B, G, 1, cfg.d_k))
    old_v = jax.lax.dynamic_slice(cache.v_cmp, (0, 0, e_slot, 0), (B, G, 1, cfg.d_v))
    k_write = jnp.where(emit, k_new[:, :, None, :], old_k)
    v_write = jnp.where(emit, v_new[:, :, None, :], old_v)
    k_cmp = jax.lax.dynamic_update_slice(cache.k_cmp, k_write, (0, 0, e_slot, 0))
    v_cmp = jax.lax.dynamic_update_slice(cache.v_cmp, v_write, (0, 0, e_slot, 0))

    # --- selection scoring (Eq. 8-12) over the emitted compressed stream ---
    meta_S_sel = C // cfg.l_sel + (1 if C % cfg.l_sel else 0)
    from nsa_vibe_tpu.ops.block_index import build_block_meta

    meta = build_block_meta(C, cfg.l, cfg.d, cfg.l_sel, cfg.n_sel, cfg.w)
    M = jnp.asarray(meta.M_csl[:C_cmp, :meta_S_sel])
    p_grp = selection_scores(Q, k_cmp, M, scale, num_cmp[None])        # [B,1,G,S_sel]
    sel_idx = select_topn_blocks(
        p_grp, cfg.n_sel, t[None], cfg.l_sel, cfg.force_init, cfg.force_local
    )                                                                  # [B,1,G,n]

    # --- three branches (single query) ---
    from nsa_vibe_tpu.ops.attention import resolve_kernel

    impl, interpret = resolve_kernel(cfg.kernel)
    # force_branch skips the OTHER branches at TRACE time (their gate is
    # exactly 0, so zeros are algebraically identical): per-branch decode
    # benches measure REAL isolation, not three-branches-plus-a-mask (the
    # reference isolates branches the same way, bench/bench_decode.py:
    # 149-214). Unforced runs trace all three as before.
    fb = cfg.force_branch.strip().lower() if cfg.force_branch else None
    O_zero = jnp.zeros((B, G, cfg.h_per_group, cfg.d_v), Q.dtype)
    if fb in (None, "sel"):
        O_sel, sel_valid = _gathered_selection_attention(
            Q[:, 0], k_sel, v_sel, sel_idx[:, 0], t, cfg.l_sel, scale,
            use_kernel=(impl == "pallas" and not interpret),
        )
    else:
        O_sel = O_zero
        sel_valid = jnp.zeros((B, G, cfg.n_sel * cfg.l_sel), jnp.bool_)
    if fb in (None, "win"):
        win_valid = (jnp.arange(cfg.w, dtype=jnp.int32) <= t) | (t >= cfg.w)
        O_win = _masked_single_query_attention(Q[:, 0], k_win, v_win,
                                               win_valid, scale)
        win_actual = win_valid.sum().astype(jnp.int32)
    else:
        O_win = O_zero
        win_actual = jnp.zeros((), jnp.int32)
    if fb in (None, "cmp"):
        cmp_valid = jnp.arange(C_cmp, dtype=jnp.int32) < num_cmp
        O_cmp = _masked_single_query_attention(Q[:, 0], k_cmp, v_cmp,
                                               cmp_valid, scale)
        cmp_actual = cmp_valid.sum().astype(jnp.int32)
    else:
        O_cmp = O_zero
        cmp_actual = jnp.zeros((), jnp.int32)

    out, gates = combine_branches(
        params, cfg, Q, O_cmp[:, None], O_sel[:, None], O_win[:, None]
    )

    new_cache = NSACache(
        k_sel=k_sel, v_sel=v_sel, k_win=k_win, v_win=v_win,
        k_cmp_raw=k_cmp_raw, v_cmp_raw=v_cmp_raw, k_cmp=k_cmp, v_cmp=v_cmp,
        t=t + 1,
    )
    reads_win = jnp.minimum(cfg.w, s_raw)
    sel_actual = sel_valid.sum(axis=(-1, -2)).mean()
    # the TRUE selection gather width: sel_idx is max(n_sel, n_forced)
    # wide (forced init/local slots can exceed n_sel on degenerate
    # configs — caught by the reads_actual counters, r3)
    n_eff = sel_idx.shape[-1]
    info = DecodeInfo(
        reads_pred=num_cmp + n_eff * cfg.l_sel + reads_win,
        reads_cmp=num_cmp,
        reads_sel=jnp.asarray(n_eff * cfg.l_sel, jnp.int32),
        reads_win=reads_win,
        sel_valid_tokens=sel_actual,
        reads_actual=(cmp_actual + win_actual).astype(jnp.float32) + sel_actual,
        reads_actual_cmp=cmp_actual,
        reads_actual_sel=sel_actual,
        reads_actual_win=win_actual,
        sel_idx=sel_idx,
        gates=gates,
        overflow=t >= C,
    )
    return out, new_cache, info


def nsa_decode_step_ragged(
    params: dict, x: jnp.ndarray, cache: NSACache, cfg: NSAConfig
) -> Tuple[jnp.ndarray, NSACache, DecodeInfo]:
    """One decode step with PER-ROW positions: cache.t is [B] — each
    batch row sits at its own depth (the continuous-batching/serving
    shape; the reference's NSA_KV is strictly single-stream, so ragged
    batches there require one cache+step per row). Natively BATCHED (r3,
    replacing the r2 vmap-of-single-row-reference-steps): cache writes
    are per-row scatters, emission fires per row on its own
    (s_raw - l) % d schedule, selection scores every row's own compressed
    stream via the [B,S]-generalized scoring/top-n ops, and the selection
    branch runs the SAME Pallas per-query gather kernel as the uniform
    step (per-row t via scalar prefetch) — the serving hot path stays on
    kernel. Per-row semantics are identical to nsa_decode_step (tested,
    tests/test_decode.py::test_ragged_*).

    x: [B, 1, dim]; cache.t: [B] int32. Returns (out, cache', info) with
    info leaves carrying a leading per-row axis (reads_* are per-row).
    """
    B = x.shape[0]
    G, h = cfg.n_kv_groups, cfg.h_per_group
    C = cache.capacity
    C_cmp = cmp_capacity(C, cfg.l, cfg.d)
    scale = 1.0 / float(np.sqrt(cfg.d_k))
    t = cache.t.astype(jnp.int32)              # [B] per-row positions
    s_raw = t + 1                              # [B]
    rows = jnp.arange(B)

    Q, K_sel, V_sel, K_win, V_win, K_cmp_raw, V_cmp_raw = project_qkv(params, x, cfg)
    pos = t[:, None, None]                     # broadcasts to [B,{S=1|G},1]
    Q = apply_rope(Q, pos, cfg.rope_base, cfg.rope_scale)
    Q = Q.reshape(B, 1, G, h, cfg.d_k)
    K_sel = apply_rope(K_sel, pos, cfg.rope_base, cfg.rope_scale)
    K_win = apply_rope(K_win, pos, cfg.rope_base, cfg.rope_scale)
    K_cmp_rope = apply_rope(K_cmp_raw, pos, cfg.rope_base, cfg.rope_scale)

    # --- cache writes: per-row scatters (each row at its own slot;
    # overflow clamps to the last slot, same garbage-on-overflow contract
    # as the uniform step's dynamic_update_slice) ---
    tw = jnp.minimum(t, C - 1)
    k_sel = cache.k_sel.at[rows, :, tw].set(K_sel[:, :, 0])
    v_sel = cache.v_sel.at[rows, :, tw].set(V_sel[:, :, 0])
    win_slot = t % cfg.w
    k_win = cache.k_win.at[rows, :, win_slot].set(K_win[:, :, 0])
    v_win = cache.v_win.at[rows, :, win_slot].set(V_win[:, :, 0])
    raw_slot = t % cfg.l
    k_cmp_raw = cache.k_cmp_raw.at[rows, :, raw_slot].set(K_cmp_rope[:, :, 0])
    v_cmp_raw = cache.v_cmp_raw.at[rows, :, raw_slot].set(V_cmp_raw[:, :, 0])

    # --- compressed emission: per-row schedule ---
    emit = (s_raw >= cfg.l) & ((s_raw - cfg.l) % cfg.d == 0)           # [B]
    num_cmp = jnp.where(s_raw >= cfg.l,
                        (s_raw - cfg.l) // cfg.d + 1, 0).astype(jnp.int32)
    e_slot = jnp.clip(num_cmp - 1, 0, C_cmp - 1)                       # [B]
    if cfg.phi == "conv":
        order = (jnp.arange(cfg.l, dtype=jnp.int32)[None, :] + s_raw[:, None]) % cfg.l
        idx = order[:, None, :, None]                                  # [B,1,l,1]
        k_window = jnp.take_along_axis(k_cmp_raw, idx, axis=2)         # [B,G,l,Dk]
        v_window = jnp.take_along_axis(v_cmp_raw, idx, axis=2)
        k_new = jnp.einsum("bgld,dl->bgd", k_window, params["phi_k"].astype(k_window.dtype))
        v_new = jnp.einsum("bgld,dl->bgd", v_window, params["phi_v"].astype(v_window.dtype))
    else:
        k_new = k_cmp_raw.mean(axis=2)
        v_new = v_cmp_raw.mean(axis=2)
    old_k = cache.k_cmp[rows, :, e_slot]                               # [B,G,Dk]
    old_v = cache.v_cmp[rows, :, e_slot]
    em = emit[:, None, None]
    k_cmp = cache.k_cmp.at[rows, :, e_slot].set(jnp.where(em, k_new, old_k))
    v_cmp = cache.v_cmp.at[rows, :, e_slot].set(jnp.where(em, v_new, old_v))

    # --- selection scoring over each row's own compressed stream ---
    meta_S_sel = C // cfg.l_sel + (1 if C % cfg.l_sel else 0)
    from nsa_vibe_tpu.ops.block_index import build_block_meta

    meta = build_block_meta(C, cfg.l, cfg.d, cfg.l_sel, cfg.n_sel, cfg.w)
    M = jnp.asarray(meta.M_csl[:C_cmp, :meta_S_sel])
    p_grp = selection_scores(Q, k_cmp, M, scale, num_cmp[:, None])     # [B,1,G,S_sel]
    sel_idx = select_topn_blocks(
        p_grp, cfg.n_sel, t[:, None], cfg.l_sel, cfg.force_init, cfg.force_local
    )                                                                  # [B,1,G,n]

    # --- three branches (single query, per-row visibility) ---
    from nsa_vibe_tpu.ops.attention import resolve_kernel

    impl, interpret = resolve_kernel(cfg.kernel)
    fb = cfg.force_branch.strip().lower() if cfg.force_branch else None
    O_zero = jnp.zeros((B, G, cfg.h_per_group, cfg.d_v), Q.dtype)
    if fb in (None, "sel"):
        O_sel, sel_valid = _gathered_selection_attention(
            Q[:, 0], k_sel, v_sel, sel_idx[:, 0], t, cfg.l_sel, scale,
            use_kernel=(impl == "pallas" and not interpret),
        )
    else:
        O_sel = O_zero
        sel_valid = jnp.zeros((B, G, sel_idx.shape[-1], cfg.l_sel), jnp.bool_)
    if fb in (None, "win"):
        win_valid = ((jnp.arange(cfg.w, dtype=jnp.int32)[None, :] <= t[:, None])
                     | (t[:, None] >= cfg.w))                          # [B,w]
        O_win = _masked_single_query_attention(Q[:, 0], k_win, v_win,
                                               win_valid, scale)
        win_actual = win_valid.sum(axis=-1).astype(jnp.int32)          # [B]
    else:
        O_win = O_zero
        win_actual = jnp.zeros((B,), jnp.int32)
    if fb in (None, "cmp"):
        cmp_valid = jnp.arange(C_cmp, dtype=jnp.int32)[None, :] < num_cmp[:, None]
        O_cmp = _masked_single_query_attention(Q[:, 0], k_cmp, v_cmp,
                                               cmp_valid, scale)
        cmp_actual = cmp_valid.sum(axis=-1).astype(jnp.int32)          # [B]
    else:
        O_cmp = O_zero
        cmp_actual = jnp.zeros((B,), jnp.int32)

    out, gates = combine_branches(
        params, cfg, Q, O_cmp[:, None], O_sel[:, None], O_win[:, None]
    )

    new_cache = NSACache(
        k_sel=k_sel, v_sel=v_sel, k_win=k_win, v_win=v_win,
        k_cmp_raw=k_cmp_raw, v_cmp_raw=v_cmp_raw, k_cmp=k_cmp, v_cmp=v_cmp,
        t=t + 1,
    )
    reads_win = jnp.minimum(cfg.w, s_raw)                              # [B]
    sel_actual = sel_valid.sum(axis=(-1, -2)).mean(axis=-1)            # [B]
    n_eff = sel_idx.shape[-1]
    info = DecodeInfo(
        reads_pred=num_cmp + n_eff * cfg.l_sel + reads_win,
        reads_cmp=num_cmp,
        reads_sel=jnp.full((B,), n_eff * cfg.l_sel, jnp.int32),
        reads_win=reads_win,
        sel_valid_tokens=sel_actual,
        reads_actual=(cmp_actual + win_actual).astype(jnp.float32) + sel_actual,
        reads_actual_cmp=cmp_actual,
        reads_actual_sel=sel_actual,
        reads_actual_win=win_actual,
        sel_idx=sel_idx,                       # [B,1,G,n] (uniform contract)
        gates=gates,                           # [B,1,G,3]
        overflow=t >= C,
    )
    return out, new_cache, info


def nsa_prefill_via_decode(
    params: dict, x: jnp.ndarray, cache: NSACache, cfg: NSAConfig
) -> Tuple[jnp.ndarray, NSACache]:
    """Prefill by scanning the decode step over tokens — the per-token
    oracle (reference `_forward_prefill_sequential` /
    `NSA_PREFILL_TILE`, nsa_attention.py:1507-1723). One jitted
    lax.scan: exact decode semantics (ring caches, emission schedule)
    applied to a whole sequence. Used as a parity oracle and for
    memory-constrained incremental prefill.

    x: [B, S, dim]; cache must have capacity >= cache.t + S.
    Returns (out [B, S, dim], cache')."""

    def step(cache, x_t):
        out_t, cache, _ = nsa_decode_step(params, x_t[:, None, :], cache, cfg)
        return cache, out_t[:, 0]

    cache, outs = jax.lax.scan(step, cache, x.transpose(1, 0, 2))
    return outs.transpose(1, 0, 2), cache
