"""Selection scoring pipeline: Eq. 8-12 of the NSA paper, shape-static.

Pipeline (reference: nsa/core/selection_scorer.py):
  p_cmp   = softmax(Q · K_cmp^T)                      (Eq. 8)
  p_slc   = p_cmp @ M_csl                             (Eq. 9, dense matmul)
  p_grp   = sum_h p_slc                               (Eq. 10, GQA-consistent)
  blocks  = deterministic top-n with forced init/local blocks (Eq. 11-12)

TPU-first design decisions:
  * Eq. 9 is a dense [S_cmp, S_sel] matmul (MXU), not CSR scatter-add.
  * The output of selection is a static [B, S, G, n_top] array of block
    indices, sorted ascending, deduplicated, padded with -1 — never a
    dynamic list of ranges. Attention kernels consume block indices
    directly (pad-to-n*l' + mask).
  * Deterministic tie-break: ranking in float32 with a -1e-8 * index bias
    (prefers lower block index on ties), the reference's exact recipe
    (selection_scorer.py:180-187).
  * Causality: a block is a candidate iff its *start* <= t; tokens inside
    a selected block beyond t are masked in the attention kernel. This is
    the reference's decode/sequential-path semantics (the path its own
    small-S equivalence oracle certifies) — partial trailing blocks are
    selectable and clamped, which also makes full-coverage selection
    exactly equal to causal full attention.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


def compute_pcmp(Q: jnp.ndarray, K_cmp: jnp.ndarray, scale: float) -> jnp.ndarray:
    """Eq. 8 compressed-branch attention probabilities.

    Q: [B,S,G,h,Dk], K_cmp: [B,G,S_cmp,Dk] -> p_cmp [B,S,G,h,S_cmp] (fp32).

    Note: rows with zero visible compressed tokens are handled by the
    caller via num_cmp masking; here we softmax over the full S_cmp axis
    in float32.
    """
    logits = jnp.einsum(
        "bsghd,bgcd->bsghc", Q.astype(jnp.float32), K_cmp.astype(jnp.float32)
    ) * scale
    return jax.nn.softmax(logits, axis=-1)


def compute_pcmp_masked(
    Q: jnp.ndarray, K_cmp: jnp.ndarray, scale: float, num_cmp_t: jnp.ndarray
) -> jnp.ndarray:
    """Eq. 8 with per-row visibility: token t sees only the first num_cmp(t)
    compressed tokens. Rows with num_cmp(t)==0 yield all-zero probabilities.

    num_cmp_t: [S] int32, or [B,S] for ragged batches where every batch
    row sits at its own depth (serving). Returns [B,S,G,h,S_cmp] float32.
    """
    S_cmp = K_cmp.shape[2]
    logits = jnp.einsum(
        "bsghd,bgcd->bsghc", Q.astype(jnp.float32), K_cmp.astype(jnp.float32)
    ) * scale
    c_idx = jnp.arange(S_cmp)
    if num_cmp_t.ndim == 1:
        visible = c_idx[None, :] < num_cmp_t[:, None]           # [S, S_cmp]
        vis = visible[None, :, None, None, :]
        any_visible = (num_cmp_t > 0)[None, :, None, None, None]
    else:
        visible = c_idx[None, None, :] < num_cmp_t[..., None]   # [B, S, S_cmp]
        vis = visible[:, :, None, None, :]
        any_visible = (num_cmp_t > 0)[:, :, None, None, None]
    logits = jnp.where(vis, logits, NEG_INF)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.where(any_visible, p, 0.0)


def map_pcmp_to_pslc(p_cmp: jnp.ndarray, M_csl: jnp.ndarray) -> jnp.ndarray:
    """Eq. 9: p_slc = p_cmp @ M. p_cmp [...,S_cmp], M [S_cmp,S_sel]."""
    return jnp.einsum("...c,cj->...j", p_cmp, M_csl.astype(p_cmp.dtype))


def group_reduce(p_slc: jnp.ndarray) -> jnp.ndarray:
    """Eq. 10: sum over heads within each GQA group. [B,S,G,h,S_sel] -> [B,S,G,S_sel]."""
    return p_slc.sum(axis=3)


def forced_block_ids(
    t_pos: jnp.ndarray, l_sel: int, force_init: bool, force_local: int
) -> jnp.ndarray:
    """Forced selection slots per query position: block 0 and the last
    `force_local` blocks containing/preceding t. [S] -> [S, n_forced]."""
    cols = []
    if force_init:
        cols.append(jnp.zeros_like(t_pos))
    last = t_pos // l_sel
    for i in range(force_local):
        cols.append(jnp.maximum(last - i, 0))
    if not cols:
        return jnp.zeros((t_pos.shape[0], 0), dtype=jnp.int32)
    return jnp.stack(cols, axis=-1).astype(jnp.int32)


def effective_sel_blocks(n_top: int, force_init: bool = True,
                         force_local: int = 2) -> int:
    """Width of the sel_idx block set select_topn_blocks emits:
    max(n_top, n_forced) — forced init/local slots can exceed n_top on
    degenerate configs, and read accounting must use the real width."""
    return max(n_top, (1 if force_init else 0) + force_local)


def select_topn_blocks(
    p_grp: jnp.ndarray,
    n_top: int,
    t_pos: jnp.ndarray,
    l_sel: int,
    force_init: bool = True,
    force_local: int = 2,
) -> jnp.ndarray:
    """Deterministic top-n selection-block choice (Eq. 11-12).

    p_grp: [B,S,G,S_sel] group scores; t_pos: [S] absolute query
    positions, or [B,S] for ragged batches (per-row depths, serving).
    Returns sel_idx [B,S,G,max(n_top,n_forced)] int32: unique block
    indices sorted ascending, -1 padding at the tail (width exceeds n_top
    only for degenerate configs whose forced init/local slots alone
    exceed it; the Pallas scorer emits the same width).
    """
    B, S, G, S_sel = p_grp.shape
    t_pos = t_pos.astype(jnp.int32)
    blk = jnp.arange(S_sel, dtype=jnp.int32)
    # [S, S_sel] masks broadcast over B in the uniform case; [B, S, S_sel]
    # when t_pos carries per-row depths
    bx = (lambda m: m[None, :, None, :]) if t_pos.ndim == 1 \
        else (lambda m: m[:, :, None, :])

    # candidates: block start <= t (partial trailing block allowed)
    valid = (blk * l_sel) <= t_pos[..., None]
    scores = jnp.where(bx(valid), p_grp.astype(jnp.float32), NEG_INF)

    forced = forced_block_ids(
        t_pos.reshape(-1), l_sel, force_init, force_local
    ).reshape(*t_pos.shape, -1)                               # [..., F]
    F = forced.shape[-1]
    if F > 0:
        forced_mask = jnp.any(
            blk[:, None] == forced[..., None, :], axis=-1
        )                                                     # [..., S_sel]
        scores = jnp.where(bx(forced_mask), NEG_INF, scores)

    k_rest = max(0, n_top - F)
    fexp = forced[None, :, None, :] if t_pos.ndim == 1 else forced[:, :, None, :]
    picks = [jnp.broadcast_to(fexp, (B, S, G, F))] if F else []
    if k_rest > 0:
        # float32 composite with index tie-break (prefer lower index)
        composite = scores - blk.astype(jnp.float32)[None, None, None, :] * 1e-8
        k_actual = min(k_rest, S_sel)
        top_val, top_idx = jax.lax.top_k(composite, k_actual)
        top_idx = jnp.where(jnp.isfinite(top_val), top_idx.astype(jnp.int32), -1)
        picks.append(top_idx)
        if k_rest > k_actual:
            picks.append(jnp.full((B, S, G, k_rest - k_actual), -1, jnp.int32))
    sel = jnp.concatenate(picks, axis=-1) if picks else jnp.full((B, S, G, n_top), -1, jnp.int32)

    # clamp forced picks into the valid causal set (forced ids are always
    # <= t//l_sel so start <= t holds by construction; keep a guard anyway)
    t_exp = (t_pos[None, :, None, None] if t_pos.ndim == 1
             else t_pos[:, :, None, None])
    sel = jnp.where(sel * l_sel <= t_exp, sel, -1)

    # unique ascending with -1 tail: sort with -1 -> +BIG, drop duplicate
    # neighbors, map BIG back to -1.
    BIG = jnp.int32(S_sel + 1)
    x = jnp.where(sel < 0, BIG, sel)
    x = jnp.sort(x, axis=-1)
    dup = jnp.concatenate(
        [jnp.zeros_like(x[..., :1], dtype=bool), x[..., 1:] == x[..., :-1]], axis=-1
    )
    x = jnp.where(dup, BIG, x)
    x = jnp.sort(x, axis=-1)
    return jnp.where(x >= BIG, -1, x).astype(jnp.int32)


def selection_token_mask(
    sel_idx: jnp.ndarray, t_pos: jnp.ndarray, l_sel: int, S_kv: int
) -> jnp.ndarray:
    """Expand selected block indices into a per-token attention mask.

    sel_idx: [B,S,G,n]; t_pos: [S]. Returns bool [B,S,G,S_kv] where True
    marks tokens attended by the selection branch (union of selected
    blocks, clamped to <= t)."""
    kv_blk = jnp.arange(S_kv, dtype=jnp.int32) // l_sel               # [S_kv]
    block_selected = jnp.any(
        sel_idx[..., :, None] == kv_blk[None, None, None, None, :], axis=-2
    )                                                                 # [B,S,G,S_kv]
    causal = jnp.arange(S_kv, dtype=jnp.int32)[None, :] <= t_pos[:, None]  # [S, S_kv]
    return block_selected & causal[None, :, None, :]


def blocks_to_ranges(
    sel_idx: jnp.ndarray, t_pos: jnp.ndarray, l_sel: int, n_top: int
) -> jnp.ndarray:
    """Merge sorted unique block indices into contiguous token ranges.

    Vectorized run-detection, the TPU equivalent of the reference's
    convert_indices_to_ranges_batched_v2 (selection_scorer.py:434-605).
    sel_idx: [B,S,G,K] sorted asc, -1 tail. Returns [B,S,G,n_top,2] int32
    [start, end) token ranges, end clamped to t+1, padded with [0,0].
    Used for observability/tests; the compute path consumes block indices.
    """
    B, S, G, K = sel_idx.shape
    validm = sel_idx >= 0
    prev = jnp.concatenate([jnp.full_like(sel_idx[..., :1], -2), sel_idx[..., :-1]], axis=-1)
    adjacent = (sel_idx - prev == 1) & (prev >= 0)
    run_start = validm & ~adjacent
    run_id = jnp.cumsum(run_start.astype(jnp.int32), axis=-1) - 1      # [B,S,G,K]
    # run end marker: valid element whose successor is not a continuation
    nxt = jnp.concatenate([sel_idx[..., 1:], jnp.full_like(sel_idx[..., :1], -2)], axis=-1)
    run_end = validm & ~((nxt - sel_idx == 1) & (nxt >= 0))

    start_tok = sel_idx * l_sel
    end_tok = (sel_idx + 1) * l_sel
    # scatter into n_top slots via one-hot matmul (K and n_top are tiny)
    slot = jnp.arange(n_top, dtype=jnp.int32)
    onehot_s = (run_id[..., None] == slot) & run_start[..., None]      # [B,S,G,K,n_top]
    onehot_e = (run_id[..., None] == slot) & run_end[..., None]
    starts = jnp.sum(jnp.where(onehot_s, start_tok[..., None], 0), axis=-2)
    ends = jnp.sum(jnp.where(onehot_e, end_tok[..., None], 0), axis=-2)
    ends = jnp.minimum(ends, (t_pos + 1)[None, :, None, None])
    has_run = jnp.any(onehot_s, axis=-2)
    starts = jnp.where(has_run, starts, 0)
    ends = jnp.where(has_run, ends, 0)
    return jnp.stack([starts, ends], axis=-1).astype(jnp.int32)


def selection_scores(
    Q: jnp.ndarray,
    K_cmp: jnp.ndarray,
    M_csl: jnp.ndarray,
    scale: float,
    num_cmp_t: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Fused Eq. 8-10: Q,K_cmp -> group scores [B,S,G,S_sel] (float32)."""
    if num_cmp_t is not None:
        p_cmp = compute_pcmp_masked(Q, K_cmp, scale, num_cmp_t)
    else:
        p_cmp = compute_pcmp(Q, K_cmp, scale)
    p_slc = map_pcmp_to_pslc(p_cmp, M_csl)
    return group_reduce(p_slc)
