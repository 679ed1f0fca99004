"""Block geometry + Eq. 9 mapping properties.

Mirrors the reference's test_block_math.py coverage: block-start formulas,
overlap weights row-normalization, and the decode-reads formula.
"""

import numpy as np
import pytest

from nsa_vibe_tpu.ops.block_index import (
    build_block_meta,
    build_block_starts,
    build_M_csl,
    expected_decode_reads,
    num_cmp_blocks,
)


def test_block_starts_formulas():
    cmp_s, sel_s = build_block_starts(256, 32, 16, 64)
    assert cmp_s.tolist() == list(range(0, 225, 16))       # (256-32)//16+1 = 15 blocks
    assert len(cmp_s) == (256 - 32) // 16 + 1
    assert sel_s.tolist() == [0, 64, 128, 192]

    cmp_s, sel_s = build_block_starts(31, 32, 16, 64)      # shorter than l
    assert len(cmp_s) == 0
    assert sel_s.tolist() == [0]


def test_block_starts_non_divisible_tail():
    cmp_s, sel_s = build_block_starts(100, 32, 16, 64)
    assert len(cmp_s) == (100 - 32) // 16 + 1 == 5
    assert len(sel_s) == 2                                  # ceil(100/64)


def test_m_csl_rows_normalized():
    M = build_M_csl(512, 32, 16, 64)
    assert M.shape == ((512 - 32) // 16 + 1, 8)
    np.testing.assert_allclose(M.sum(axis=1), 1.0, atol=1e-6)
    assert (M >= 0).all()


def test_m_csl_overlap_structure():
    # cmp block at start s covers [s, s+32); overlaps sel block j iff
    # [j*64, j*64+64) intersects it. A cmp block fully inside one sel block
    # has a single weight-1 entry; a straddling one splits 50/50.
    M = build_M_csl(256, 32, 16, 64)
    # cmp block 0: [0,32) fully inside sel 0
    assert M[0, 0] == 1.0
    # cmp block starting at 48: [48,80) straddles sel0/sel1 16/16
    i = 48 // 16
    np.testing.assert_allclose(M[i, :2], [0.5, 0.5])


def test_meta_divisibility_enforced():
    with pytest.raises(ValueError):
        build_block_meta(128, 30, 16, 64, 16, 512)


def test_num_cmp_blocks():
    l, d = 32, 16
    assert num_cmp_blocks(0, l, d) == 0
    assert num_cmp_blocks(31, l, d) == 0
    assert num_cmp_blocks(32, l, d) == 1
    assert num_cmp_blocks(47, l, d) == 1
    assert num_cmp_blocks(48, l, d) == 2
    arr = num_cmp_blocks(np.array([0, 32, 48, 1024]), l, d)
    assert arr.tolist() == [0, 1, 2, 63]


def test_expected_decode_reads_formula():
    # reference invariant: reads(S) = num_cmp(S) + n*l' + min(w, S)
    assert expected_decode_reads(1024, 32, 16, 64, 16, 512) == 63 + 1024 + 512
    assert expected_decode_reads(16, 32, 16, 64, 16, 512) == 0 + 1024 + 16


def test_meta_cached():
    a = build_block_meta(128, 32, 16, 64, 16, 512)
    b = build_block_meta(128, 32, 16, 64, 16, 512)
    assert a is b
