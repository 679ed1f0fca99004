"""Data pipeline: byte-LM token streams with fixed-length packing.

Reference: nsa/data_pipeline.py — FineWeb-Edu streaming with doc-level
modulo sharding (Shard(mod, rem), :19-23), rolling token buffer packed
into fixed-length rows (:74-81), local jsonl/txt loader (:166-198);
nsa/core/collate.py for padded varlen collation.

The hot path (byte tokenization + packing) optionally runs through the
C++ native library (nsa_vibe_tpu/native) with a pure-python fallback.
HF `datasets` is an optional dependency — gated import, synthetic
fallback for air-gapped runs (the reference trainer's
--synthetic-on-fail behavior, train_showcase.py:914-940).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterable, Iterator, Optional

import numpy as np


@dataclass(frozen=True)
class Shard:
    """Doc-level modulo sharding: rank `rem` of `mod` consumes docs where
    doc_index % mod == rem."""

    mod: int = 1
    rem: int = 0

    def owns(self, index: int) -> bool:
        return index % self.mod == self.rem


def tokenize_bytes(text: str) -> np.ndarray:
    """Byte-level tokenizer (vocab 256)."""
    return np.frombuffer(text.encode("utf-8", errors="ignore"), dtype=np.uint8).astype(
        np.int32
    )


def make_tokenizer(spec: str = "byte"):
    """Tokenizer factory (reference data_pipeline.py batched-tokenization
    variant, :84-163): "byte" (vocab 256, default) or "hf:<name_or_path>"
    for a HuggingFace tokenizer (gated import; needs a local path or
    cache in air-gapped environments)."""
    if spec == "byte":
        return tokenize_bytes
    if spec.startswith("hf:"):
        try:
            from transformers import AutoTokenizer  # type: ignore
        except ImportError as e:  # pragma: no cover - env-dependent
            raise RuntimeError("transformers not available for hf: tokenizer") from e
        tok = AutoTokenizer.from_pretrained(spec[3:])

        def encode(text: str) -> np.ndarray:
            return np.asarray(tok.encode(text), np.int32)

        return encode
    raise ValueError(f"unknown tokenizer spec: {spec}")


def pack_token_stream(
    docs: Iterable[np.ndarray], seq_len: int, batch_size: int
) -> Iterator[np.ndarray]:
    """Concatenate document token streams into dense [batch, seq_len+1]
    rows (the +1 column provides next-token targets). Rolling buffer —
    no padding, no document boundary loss masking (byte-LM showcase
    semantics, reference data_pipeline.py:74-81)."""
    need = batch_size * (seq_len + 1)
    buf = np.zeros(0, dtype=np.int32)
    for doc in docs:
        if doc.size == 0:
            continue
        buf = np.concatenate([buf, doc])
        while buf.size >= need:
            chunk, buf = buf[:need], buf[need:]
            yield chunk.reshape(batch_size, seq_len + 1)


def synthetic_docs(seed: int = 0, doc_len: int = 2048) -> Iterator[np.ndarray]:
    """Deterministic synthetic byte docs with learnable structure (repeated
    patterns + noise) so smoke-training loss visibly decreases."""
    rng = np.random.default_rng(seed)
    while True:
        period = int(rng.integers(3, 17))
        pattern = rng.integers(0, 256, size=period)
        reps = doc_len // period + 1
        doc = np.tile(pattern, reps)[:doc_len]
        noise = rng.random(doc_len) < 0.02
        doc = np.where(noise, rng.integers(0, 256, size=doc_len), doc)
        yield doc.astype(np.int32)


def local_docs(path: str, shard: Shard = Shard(),
               tokenize=tokenize_bytes, epochs: int = 1) -> Iterator[np.ndarray]:
    """Local .jsonl ({'text': ...} per line) or plain .txt file.
    epochs=0 cycles the file forever (multi-epoch training on small
    corpora — the trainer uses this so a tiny local corpus doesn't
    exhaust the stream mid-run)."""
    e = 0
    while True:
        idx = 0
        if path.endswith(".jsonl"):
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    if shard.owns(idx):
                        try:
                            text = json.loads(line).get("text", "")
                        except json.JSONDecodeError:
                            text = ""
                        if text:
                            yield tokenize(text)
                    idx += 1
        else:
            with open(path) as f:
                text = f.read()
            if shard.owns(0):
                yield tokenize(text)
        e += 1
        if epochs and e >= epochs:
            return


def fineweb_docs(
    name: str = "HuggingFaceFW/fineweb-edu",
    split: str = "train",
    shard: Shard = Shard(),
    tokenize=tokenize_bytes,
) -> Iterator[np.ndarray]:
    """FineWeb-Edu streaming via HF datasets (optional dep; raises a clear
    error when unavailable — callers fall back to synthetic)."""
    try:
        from datasets import load_dataset  # type: ignore
    except ImportError as e:  # pragma: no cover - env-dependent
        raise RuntimeError(
            "huggingface `datasets` not available; use --data synthetic or a local file"
        ) from e
    ds = load_dataset(name, split=split, streaming=True)
    for idx, row in enumerate(ds):
        if shard.owns(idx):
            text = row.get("text", "")
            if text:
                yield tokenize(text)


def pack_token_stream_native(
    docs: Iterable[np.ndarray], seq_len: int, batch_size: int
) -> Iterator[np.ndarray]:
    """pack_token_stream through the C++ ring-buffer packer
    (nsa_vibe_tpu.native) — identical output, no per-doc Python
    concatenation. Raises RuntimeError when the native lib is missing."""
    from nsa_vibe_tpu.native import ByteStreamPacker

    packer = ByteStreamPacker(seq_len, batch_size)
    try:
        for doc in docs:
            if doc.size == 0:
                continue
            packer.feed(doc)
            while (b := packer.next_batch()) is not None:
                yield b
    finally:
        packer.close()


def make_batches(
    source: str,
    seq_len: int,
    batch_size: int,
    shard: Shard = Shard(),
    seed: int = 0,
    native: Optional[bool] = None,
    tokenizer: str = "byte",
    epochs: int = 1,
) -> Iterator[np.ndarray]:
    """source: 'synthetic' | path to .jsonl/.txt | 'fineweb[:name]'.
    native: True = require the C++ packer, False = pure python,
    None = auto (native when buildable; byte tokenizer only — the C++
    ring buffer stores byte tokens). epochs (local files only): 0 cycles
    forever."""
    tokenize = make_tokenizer(tokenizer)
    if source == "synthetic":
        docs: Iterator[np.ndarray] = synthetic_docs(seed + shard.rem)
    elif source.startswith("fineweb"):
        parts = source.split(":", 1)
        docs = fineweb_docs(parts[1] if len(parts) > 1 else "HuggingFaceFW/fineweb-edu",
                            shard=shard, tokenize=tokenize)
    elif os.path.exists(source):
        docs = local_docs(source, shard, tokenize=tokenize, epochs=epochs)
    else:
        raise ValueError(f"unknown data source: {source}")
    if tokenizer != "byte":
        native = False
    if native is None:
        from nsa_vibe_tpu.native import native_available

        native = native_available()
    if native:
        yield from pack_token_stream_native(docs, seq_len, batch_size)
    else:
        yield from pack_token_stream(docs, seq_len, batch_size)


def collate_varlen(
    docs: list[np.ndarray], seq_len: int, pad_id: int = 0
) -> dict[str, np.ndarray]:
    """Pad variable-length docs to [B, seq_len] with attention/loss masks,
    shifted labels and cu_seqlens (reference nsa/core/collate.py:6-44)."""
    B = len(docs)
    tokens = np.full((B, seq_len), pad_id, np.int32)
    attn_mask = np.zeros((B, seq_len), np.int32)
    labels = np.full((B, seq_len), -1, np.int32)
    lengths = np.zeros(B + 1, np.int32)
    for i, doc in enumerate(docs):
        n = min(len(doc), seq_len)
        tokens[i, :n] = doc[:n]
        attn_mask[i, :n] = 1
        labels[i, : n - 1] = doc[1:n]
        lengths[i + 1] = lengths[i] + n
    loss_mask = (labels >= 0).astype(np.int32)
    return {
        "tokens": tokens,
        "attn_mask": attn_mask,
        "labels": np.where(labels >= 0, labels, 0),
        "loss_mask": loss_mask,
        "cu_seqlens": lengths,
    }
