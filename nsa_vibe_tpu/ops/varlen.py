"""Varlen / document-masked batching: packed multi-document rows.

Reference counterpart: the cu_seqlens varlen surface
(/root/reference/nsa/core/collate.py:6-44,
/root/reference/nsa/core/attention_kernels.py:391-702) — ragged documents
packed into rows, no attention across document boundaries, positions
restarting per document.

TPU-first design: instead of ragged cu_seqlens (which force dynamic
shapes), documents are packed CONTIGUOUSLY with each document start
ALIGNED to a multiple of l_sel (pad tokens are loss-masked). One static
[B, S] int32 array `seq_start` — the packed index of each token's
document start — then carries the whole varlen contract:

  * positions are document-local:  t_local = t - seq_start[t]
    (RoPE for Q/K and the ϕ-pooling positions use t_local);
  * win branch:  row t attends keys in [max(t - w + 1, ds), t];
  * cmp branch:  pooled window j (covering packed [j*d, j*d + l)) is
    visible iff j*d >= ds and j*d + l <= t + 1 — windows that straddle
    a document boundary are *never* visible to any query (their pooled
    values are garbage but dead);
  * selection:   blocks are l_sel-sized and doc-aligned, so a block
    belongs to exactly one document; candidates/forced blocks are
    restricted to [ds // l_sel, t // l_sel].

Because alignment makes every per-document window/block grid coincide
with the packed grid, each packed document behaves EXACTLY as if it were
alone in its own row (tests assert this equality).

One measured caveat: the MASKS are exact (perturbing document A moves
document B's win/sel outputs by exactly 0.0), but the cmp branch's
pooled K/V come from ops.compress's O(S) cumsum trick, where a window
inside document B is `cumsum[hi] - cumsum[lo]` and both terms carry
document A's mass. The cancellation is exact in real arithmetic but
~1 ulp in f32, so cross-document influence through the cmp branch is
bounded by pooling round-off (~1e-6 on f32 logits at toy scale) —
rounding noise, not attention leakage. A segmented scan would make it
exact at extra cost; not worth it.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nsa_vibe_tpu.ops.reference import attend_masked
from nsa_vibe_tpu.ops.selection import NEG_INF


# --------------------------- mask builders ---------------------------


def win_mask_varlen(t_pos: jnp.ndarray, seq_start: jnp.ndarray, S_kv: int,
                    w: int) -> jnp.ndarray:
    """[S] t_pos, [B,S] seq_start -> [B,S,S_kv] bool."""
    k = jnp.arange(S_kv, dtype=jnp.int32)[None, None, :]
    t = t_pos.astype(jnp.int32)[None, :, None]
    ds = seq_start.astype(jnp.int32)[:, :, None]
    return (k <= t) & (k > t - w) & (k >= ds)


def cmp_mask_varlen(t_pos: jnp.ndarray, seq_start: jnp.ndarray, S_cmp: int,
                    l: int, d: int) -> jnp.ndarray:
    """Visibility of pooled windows: [B,S,S_cmp] bool."""
    j = jnp.arange(S_cmp, dtype=jnp.int32)[None, None, :]
    t = t_pos.astype(jnp.int32)[None, :, None]
    ds = seq_start.astype(jnp.int32)[:, :, None]
    return (j * d >= ds) & (j * d + l <= t + 1)


def sel_token_mask_varlen(sel_idx: jnp.ndarray, t_pos: jnp.ndarray,
                          seq_start: jnp.ndarray, l_sel: int,
                          S_kv: int) -> jnp.ndarray:
    """[B,S,G,n] sel_idx -> [B,S,G,S_kv] bool (union of selected blocks,
    clamped to [ds, t])."""
    kv = jnp.arange(S_kv, dtype=jnp.int32)
    block_selected = jnp.any(
        sel_idx[..., :, None] == (kv // l_sel)[None, None, None, None, :], axis=-2
    )
    t = t_pos.astype(jnp.int32)[None, :, None]
    ds = seq_start.astype(jnp.int32)[:, :, None]
    causal = (kv[None, None, :] <= t) & (kv[None, None, :] >= ds)  # [B,S,S_kv]
    return block_selected & causal[:, :, None, :]


# --------------------------- reference branches ---------------------------


def sliding_window_attention_varlen(Q, K, V, t_pos, seq_start, w, scale):
    m = win_mask_varlen(t_pos, seq_start, K.shape[2], w)
    return attend_masked(Q, K, V, m[:, :, None, None, :], scale)


def compressed_attention_varlen(Q, K_cmp, V_cmp, t_pos, seq_start, l, d, scale):
    m = cmp_mask_varlen(t_pos, seq_start, K_cmp.shape[2], l, d)
    return attend_masked(Q, K_cmp, V_cmp, m[:, :, None, None, :], scale)


def selection_attention_varlen(Q, K, V, sel_idx, t_pos, seq_start, l_sel, scale):
    m = sel_token_mask_varlen(sel_idx, t_pos, seq_start, l_sel, K.shape[2])
    return attend_masked(Q, K, V, m[:, :, :, None, :], scale)


# --------------------------- selection pipeline ---------------------------


def selection_scores_varlen(
    Q: jnp.ndarray, K_cmp: jnp.ndarray, M_csl: jnp.ndarray, scale: float,
    t_pos: jnp.ndarray, seq_start: jnp.ndarray, l: int, d: int,
) -> jnp.ndarray:
    """Eq. 8-10 with per-document window visibility.
    Q [B,S,G,h,Dk] -> p_grp [B,S,G,S_sel] f32."""
    S_cmp = K_cmp.shape[2]
    logits = jnp.einsum(
        "bsghd,bgcd->bsghc", Q.astype(jnp.float32), K_cmp.astype(jnp.float32)
    ) * scale
    vis = cmp_mask_varlen(t_pos, seq_start, S_cmp, l, d)          # [B,S,S_cmp]
    logits = jnp.where(vis[:, :, None, None, :], logits, NEG_INF)
    p = jax.nn.softmax(logits, axis=-1)
    p = jnp.where(jnp.any(vis, axis=-1)[:, :, None, None, None], p, 0.0)
    p_slc = jnp.einsum("...c,cj->...j", p, M_csl.astype(p.dtype))  # Eq. 9
    return p_slc.sum(axis=3)                                       # Eq. 10


def select_topn_blocks_varlen(
    p_grp: jnp.ndarray, n_top: int, t_pos: jnp.ndarray, seq_start: jnp.ndarray,
    l_sel: int, force_init: bool = True, force_local: int = 2,
) -> jnp.ndarray:
    """Deterministic doc-local top-n (Eq. 11-12). The forced "init" block
    is the FIRST BLOCK OF THE DOCUMENT (ds // l_sel), not packed block 0.
    Returns sel_idx [B,S,G,n_top] int32, sorted asc, -1 padded."""
    B, S, G, S_sel = p_grp.shape
    t = t_pos.astype(jnp.int32)[None, :, None]                    # [1,S,1]
    ds = seq_start.astype(jnp.int32)[:, :, None]                  # [B,S,1]
    blk = jnp.arange(S_sel, dtype=jnp.int32)[None, None, :]       # [1,1,S_sel]

    first_blk = ds // l_sel                                       # [B,S,1]
    last_blk = t // l_sel                                         # [1,S,1]
    valid = (blk * l_sel <= t) & (blk >= first_blk)               # [B,S,S_sel]
    scores = jnp.where(valid[:, :, None, :], p_grp.astype(jnp.float32), NEG_INF)

    forced_cols = []
    if force_init:
        forced_cols.append(jnp.broadcast_to(first_blk, (B, S, 1)))
    for i in range(force_local):
        forced_cols.append(jnp.broadcast_to(
            jnp.maximum(last_blk - i, first_blk), (B, S, 1)))
    F = len(forced_cols)
    forced = (jnp.concatenate(forced_cols, axis=-1) if F
              else jnp.zeros((B, S, 0), jnp.int32))               # [B,S,F]
    if F:
        fmask = jnp.any(blk[..., None, :] == forced[..., :, None], axis=-2)
        scores = jnp.where(fmask[:, :, None, :], NEG_INF, scores)

    k_rest = max(0, n_top - F)
    picks = [jnp.broadcast_to(forced[:, :, None, :], (B, S, G, F))] if F else []
    if k_rest > 0:
        composite = scores - blk[..., None, :].astype(jnp.float32) * 1e-8
        k_actual = min(k_rest, S_sel)
        top_val, top_idx = jax.lax.top_k(composite, k_actual)
        top_idx = jnp.where(jnp.isfinite(top_val), top_idx.astype(jnp.int32), -1)
        picks.append(top_idx)
        if k_rest > k_actual:
            picks.append(jnp.full((B, S, G, k_rest - k_actual), -1, jnp.int32))
    sel = jnp.concatenate(picks, axis=-1)

    # doc-local guard (forced picks satisfy it by construction)
    ok = (sel * l_sel <= t[..., None]) & (sel >= first_blk[..., None]) & (sel >= 0)
    sel = jnp.where(ok, sel, -1)

    # unique ascending with -1 tail
    BIG = jnp.int32(S_sel + 1)
    x = jnp.where(sel < 0, BIG, sel)
    x = jnp.sort(x, axis=-1)
    dup = jnp.concatenate(
        [jnp.zeros_like(x[..., :1], dtype=bool), x[..., 1:] == x[..., :-1]], axis=-1
    )
    x = jnp.sort(jnp.where(dup, BIG, x), axis=-1)
    return jnp.where(x >= BIG, -1, x).astype(jnp.int32)


# --------------------------- packing ---------------------------


def pack_documents_aligned(
    docs: List[np.ndarray], seq_len: int, align: int, batch_size: int,
    pad_id: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Greedy first-fit packing of token docs into [N, seq_len+1] rows with
    every document start aligned to `align` (= l_sel). Returns
    (tokens [N, seq_len+1], seq_start [N, seq_len], loss_mask [N, seq_len])
    with N a multiple of batch_size. Documents longer than seq_len are
    split into seq_len-sized pieces (each piece its own "document").

    tokens carries seq_len+1 ids per row (input/target shift happens in the
    train step); the label at position t is token t+1, loss-masked at the
    last token of each document and on padding.
    """
    pieces: List[np.ndarray] = []
    for d0 in docs:
        a = np.asarray(d0, dtype=np.int32).reshape(-1)
        for i in range(0, len(a), seq_len):
            piece = a[i:i + seq_len]
            if len(piece) >= 2:          # need at least one (input, target)
                pieces.append(piece)

    rows_tok, rows_ds, rows_lm = [], [], []
    cur = np.full((seq_len + 1,), pad_id, np.int32)
    cur_ds = np.zeros((seq_len,), np.int32)
    cur_lm = np.zeros((seq_len,), np.float32)
    off = 0

    def flush():
        nonlocal cur, cur_ds, cur_lm, off
        if off > 0:
            rows_tok.append(cur)
            rows_ds.append(cur_ds)
            rows_lm.append(cur_lm)
        cur = np.full((seq_len + 1,), pad_id, np.int32)
        cur_ds = np.zeros((seq_len,), np.int32)
        cur_lm = np.zeros((seq_len,), np.float32)
        off = 0

    for piece in pieces:
        n = len(piece)
        if off + n > seq_len:
            flush()
        cur[off:off + n] = piece
        # predict tokens 2..n of the piece: positions off .. off+n-2
        cur_ds[off:off + n] = off
        cur_lm[off:off + n - 1] = 1.0
        # pad region between docs keeps ds of the *following* doc start
        off = off + n
        off = -(-off // align) * align   # round up to alignment
        if off >= seq_len:
            flush()
        else:
            cur_ds[off:] = off           # provisional for the next doc / padding
    flush()

    if not rows_tok:
        raise ValueError("no documents with >= 2 tokens to pack")
    while len(rows_tok) % batch_size != 0:
        rows_tok.append(np.full((seq_len + 1,), pad_id, np.int32))
        rows_ds.append(np.zeros((seq_len,), np.int32))
        rows_lm.append(np.zeros((seq_len,), np.float32))
    return (np.stack(rows_tok), np.stack(rows_ds), np.stack(rows_lm))


def make_varlen_batches(
    source: str, seq_len: int, batch_size: int, align: int,
    shard=None, seed: int = 0, tokenizer: str = "byte", pad_id: int = 0,
    epochs: int = 1,
):
    """Yield (tokens [B,S+1], seq_start [B,S], loss_mask [B,S]) batches of
    align-packed documents from a data source (same sources as
    train.data.make_batches). epochs (local files only): 0 cycles forever."""
    from nsa_vibe_tpu.train.data import (
        Shard, fineweb_docs, local_docs, make_tokenizer, synthetic_docs,
    )

    shard = shard or Shard()
    tokenize = make_tokenizer(tokenizer)
    if source == "synthetic":
        docs = synthetic_docs(seed=seed, doc_len=max(seq_len // 3, 8))
    elif source.startswith("fineweb"):
        name = source.split(":", 1)[1] if ":" in source else None
        kw = {"name": name} if name else {}
        docs = fineweb_docs(shard=shard, tokenize=tokenize, **kw)
    else:
        docs = local_docs(source, shard, tokenize=tokenize, epochs=epochs)

    buf: List[np.ndarray] = []
    target_rows = batch_size * 4        # pack a few batches at a time
    for doc in docs:
        buf.append(np.asarray(doc))
        if len(buf) >= target_rows:
            toks, ds, lm = pack_documents_aligned(buf, seq_len, align,
                                                  batch_size, pad_id)
            for i in range(0, len(toks), batch_size):
                yield (toks[i:i + batch_size], ds[i:i + batch_size],
                       lm[i:i + batch_size])
            buf = []
    if buf:
        toks, ds, lm = pack_documents_aligned(buf, seq_len, align,
                                              batch_size, pad_id)
        for i in range(0, len(toks), batch_size):
            yield (toks[i:i + batch_size], ds[i:i + batch_size],
                   lm[i:i + batch_size])
