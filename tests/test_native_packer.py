"""Native C++ packer: exact parity with the pure-Python token packer."""

import numpy as np
import pytest

from nsa_vibe_tpu.train.data import (
    make_batches,
    pack_token_stream,
    pack_token_stream_native,
    synthetic_docs,
    tokenize_bytes,
)

native = pytest.importorskip("nsa_vibe_tpu.native")
if not native.native_available():  # pragma: no cover - env without g++
    pytest.skip("native packer unavailable", allow_module_level=True)


def _take(it, n):
    return [next(it) for _ in range(n)]


def test_native_matches_python_packing():
    def docs():
        yield from (d for d, _ in zip(synthetic_docs(0), range(32)))

    py = _take(pack_token_stream(docs(), seq_len=64, batch_size=4), 8)
    nat = _take(pack_token_stream_native(docs(), seq_len=64, batch_size=4), 8)
    for a, b in zip(py, nat):
        np.testing.assert_array_equal(a, b)
        assert b.dtype == np.int32 and b.shape == (4, 65)


def test_native_text_feed_roundtrip():
    p = native.ByteStreamPacker(seq_len=7, batch_size=1)
    p.feed("hello world, hello world!")  # 25 bytes -> 3 full rows of 8
    assert p.ready == 3
    row = p.next_batch()
    np.testing.assert_array_equal(row[0], tokenize_bytes("hello wo"))
    p.close()


def test_native_empty_and_partial():
    p = native.ByteStreamPacker(seq_len=16, batch_size=2)
    assert p.next_batch() is None
    p.feed(b"x" * 10)
    assert p.ready == 0 and p.buffered_tokens == 10
    p.close()


def test_make_batches_native_flag_parity():
    a = _take(make_batches("synthetic", 32, 4, seed=3, native=False), 5)
    b = _take(make_batches("synthetic", 32, 4, seed=3, native=True), 5)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
