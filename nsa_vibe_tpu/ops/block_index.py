"""Static block metadata and the Eq. 9 cmp->sel score mapping.

TPU-first design: all block geometry is a *trace-time constant*. We compute
it in numpy once per (seq_len, l, d, l_sel) and close over it inside jit.
The Eq. 9 fractional-overlap mapping is stored as a small dense
[S_cmp, S_sel] matrix so that p_slc = p_cmp @ M is a single MXU matmul —
replacing the reference's CSR/COO scatter-add loops
(reference: nsa/core/block_index.py:25-99, nsa/core/selection_scorer.py:89-116).

Semantics (verified against the reference):
  * compression blocks are overlapped: starts = 0, d, 2d, ...,
    count = 0 if S < l else (S - l)//d + 1;
  * selection blocks are non-overlapped: starts = 0, l_sel, ...,
    count = ceil(S / l_sel);
  * M[i, j] = overlap(cmp_i, sel_j) / sum_j overlap(cmp_i, sel_j)
    (row-normalized fractional overlap).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class BlockMeta:
    """Shape-static NSA block geometry for a maximum sequence length."""

    seq_len: int
    l: int
    d: int
    l_sel: int
    n_sel: int
    w: int
    cmp_starts: np.ndarray   # [S_cmp] int32, token start of each compression block
    sel_starts: np.ndarray   # [S_sel] int32, token start of each selection block
    M_csl: np.ndarray        # [S_cmp, S_sel] float32 dense Eq.9 mapping

    @property
    def S_cmp(self) -> int:
        return int(self.cmp_starts.shape[0])

    @property
    def S_sel(self) -> int:
        return int(self.sel_starts.shape[0])


def build_block_starts(seq_len: int, l: int, d: int, l_sel: int) -> tuple[np.ndarray, np.ndarray]:
    if l <= 0 or d <= 0 or l_sel <= 0:
        raise ValueError("block parameters must be positive")
    n_cmp = 0 if seq_len < l else (seq_len - l) // d + 1
    cmp_starts = (np.arange(n_cmp, dtype=np.int32) * d).astype(np.int32)
    n_sel = 0 if seq_len <= 0 else -(-seq_len // l_sel)
    sel_starts = (np.arange(n_sel, dtype=np.int32) * l_sel).astype(np.int32)
    return cmp_starts, sel_starts


def build_M_csl(seq_len: int, l: int, d: int, l_sel: int) -> np.ndarray:
    """Dense Eq. 9 fractional-overlap matrix, rows normalized to sum 1."""
    cmp_starts, sel_starts = build_block_starts(seq_len, l, d, l_sel)
    if cmp_starts.size == 0 or sel_starts.size == 0:
        return np.zeros((cmp_starts.size, sel_starts.size), dtype=np.float32)
    a0 = cmp_starts[:, None].astype(np.int64)          # [S_cmp, 1]
    a1 = a0 + l
    b0 = sel_starts[None, :].astype(np.int64)          # [1, S_sel]
    b1 = b0 + l_sel
    ov = np.clip(np.minimum(a1, b1) - np.maximum(a0, b0), 0, None).astype(np.float32)
    row = ov.sum(axis=1, keepdims=True)
    M = np.where(row > 0, ov / np.maximum(row, 1.0), 0.0).astype(np.float32)
    return M


@functools.lru_cache(maxsize=64)
def _build_block_meta_cached(
    seq_len: int, l: int, d: int, l_sel: int, n_sel: int, w: int
) -> BlockMeta:
    if l % d != 0 or l_sel % d != 0:
        raise ValueError("require d|l and d|l_sel")
    cmp_starts, sel_starts = build_block_starts(seq_len, l, d, l_sel)
    M = build_M_csl(seq_len, l, d, l_sel)
    return BlockMeta(
        seq_len=seq_len, l=l, d=d, l_sel=l_sel, n_sel=n_sel, w=w,
        cmp_starts=cmp_starts, sel_starts=sel_starts, M_csl=M,
    )


def build_block_meta(seq_len: int, l: int, d: int, l_sel: int, n_sel: int, w: int) -> BlockMeta:
    """Build (cached) static metadata for sequences up to ``seq_len``."""
    return _build_block_meta_cached(seq_len, l, d, l_sel, n_sel, w)


def num_cmp_blocks(s_raw: int | np.ndarray, l: int, d: int):
    """Number of *emitted* compression blocks after s_raw raw tokens.

    num_cmp(S) = 0 if S < l else (S - l)//d + 1 — the decode-emission
    schedule invariant tested by the reference
    (nsa/core/nsa_attention.py:634-638, bench/bench_decode.py:36-38).
    Works for python ints and numpy/jnp arrays.
    """
    full = (s_raw - l) // d + 1
    if isinstance(s_raw, (int, np.integer)):
        return int(full) if s_raw >= l else 0
    return np.where(s_raw >= l, full, 0)


def expected_decode_reads(s_raw: int, l: int, d: int, l_sel: int, n_sel: int, w: int) -> int:
    """Per-step decode memory-reads formula: num_cmp(S) + n*l' + min(w, S)."""
    return num_cmp_blocks(s_raw, l, d) + n_sel * l_sel + min(w, s_raw)
