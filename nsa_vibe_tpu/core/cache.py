"""Decode-time KV caches: preallocated, fixed-capacity, index-addressed.

TPU-native replacement for the reference's cat-grow NSA_KV dataclass
(nsa/cache/kv_cache.py:8-65). All buffers have static shapes so the whole
decode step compiles to one XLA program:

  * k_sel/v_sel  — prefix buffers [B,G,C,D*], written at index t;
  * k_win/v_win  — ring buffers [B,G,w,D*] at slot t % w (RoPE'd K, so
    slot order is irrelevant to attention — positions are absolute);
  * k_cmp_raw/v_cmp_raw — ring of the last l raw tokens [B,G,l,D*]
    (K RoPE'd at its absolute position) feeding ϕ emission;
  * k_cmp/v_cmp  — emitted compressed stream [B,G,C_cmp,D*], one slot
    written every d steps after warmup l (the reference's
    `win_ptr`/`cmp_emit_next` fields that were never real become real
    index arithmetic here);
  * t — scalar int32 token count (S_raw).

Capacity C is the max sequence length; C_cmp = num_cmp(C).

Caution: decoding past capacity does not raise inside jit — XLA
dynamic_update_slice clamps the write index, silently overwriting the
last row. `nsa_decode_step` reports this in-graph as `info.overflow`
(True on any step with t >= capacity); the generation loops in models/
additionally check capacity host-side before stepping. Raw decode-step
callers must check one or the other.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from nsa_vibe_tpu.core.config import NSAConfig
from nsa_vibe_tpu.ops.block_index import num_cmp_blocks


class NSACache(NamedTuple):
    k_sel: jnp.ndarray      # [B,G,C,Dk] (RoPE'd)
    v_sel: jnp.ndarray      # [B,G,C,Dv]
    k_win: jnp.ndarray      # [B,G,w,Dk] ring (RoPE'd)
    v_win: jnp.ndarray      # [B,G,w,Dv] ring
    k_cmp_raw: jnp.ndarray  # [B,G,l,Dk] ring (RoPE'd)
    v_cmp_raw: jnp.ndarray  # [B,G,l,Dv] ring
    k_cmp: jnp.ndarray      # [B,G,C_cmp,Dk]
    v_cmp: jnp.ndarray      # [B,G,C_cmp,Dv]
    t: jnp.ndarray          # scalar int32: number of tokens cached

    @property
    def capacity(self) -> int:
        return self.k_sel.shape[2]


def cmp_capacity(capacity: int, l: int, d: int) -> int:
    return max(int(num_cmp_blocks(capacity, l, d)), 1)


def init_cache(cfg: NSAConfig, batch: int, capacity: int, dtype=jnp.float32) -> NSACache:
    """Empty cache with room for `capacity` tokens."""
    B, G = batch, cfg.n_kv_groups
    C_cmp = cmp_capacity(capacity, cfg.l, cfg.d)
    z = lambda *s: jnp.zeros(s, dtype)  # noqa: E731
    return NSACache(
        k_sel=z(B, G, capacity, cfg.d_k), v_sel=z(B, G, capacity, cfg.d_v),
        k_win=z(B, G, cfg.w, cfg.d_k), v_win=z(B, G, cfg.w, cfg.d_v),
        k_cmp_raw=z(B, G, cfg.l, cfg.d_k), v_cmp_raw=z(B, G, cfg.l, cfg.d_v),
        k_cmp=z(B, G, C_cmp, cfg.d_k), v_cmp=z(B, G, C_cmp, cfg.d_v),
        t=jnp.zeros((), jnp.int32),
    )


def ragged_cache(cache: NSACache) -> NSACache:
    """Uniform cache -> ragged cache (t broadcast to [B]) for
    core.decode.nsa_decode_step_ragged."""
    B = cache.k_sel.shape[0]
    return cache._replace(t=jnp.broadcast_to(cache.t, (B,)).astype(jnp.int32))


def admit_row(cache: NSACache, row: NSACache, i: int) -> NSACache:
    """Mid-stream admission (continuous batching): install single-row
    cache `row` (B=1, e.g. from cache_from_prefill on a new request)
    as row i of a running ragged batch. The other rows keep decoding at
    their own depths — per-row t makes the join free."""
    new = {
        f: getattr(cache, f).at[i].set(getattr(row, f)[0])
        for f in NSACache._fields[:-1]
    }
    t = cache.t.at[i].set(jnp.reshape(row.t, ()).astype(jnp.int32))  # scalar or [1]
    return NSACache(**new, t=t)


def cache_from_prefill(cfg: NSAConfig, aux: dict, capacity: int) -> NSACache:
    """Seed a decode cache from prefill branch tensors (aux of nsa_prefill).

    The prefill K_sel/K_win are already RoPE'd; K_cmp_raw is raw — we
    re-apply RoPE per absolute position when filling the cmp ring, exactly
    as the decode path would have.
    """
    from nsa_vibe_tpu.ops.rope import apply_rope  # local import to avoid cycle

    K_sel, V_sel = aux["K_sel"], aux["V_sel"]
    B, G, S, Dk = K_sel.shape
    if S > capacity:
        raise ValueError(f"prefill length {S} exceeds cache capacity {capacity}")
    cache = init_cache(cfg, B, capacity, K_sel.dtype)

    k_sel = cache.k_sel.at[:, :, :S].set(K_sel)
    v_sel = cache.v_sel.at[:, :, :S].set(V_sel)

    # window ring: last min(w, S) tokens at slots pos % w
    w = cfg.w
    n_win = min(w, S)
    pos_win = jnp.arange(S - n_win, S)
    k_win = cache.k_win.at[:, :, pos_win % w].set(aux["K_win"][:, :, S - n_win :])
    v_win = cache.v_win.at[:, :, pos_win % w].set(aux["V_win"][:, :, S - n_win :])

    # cmp raw ring: last min(l, S) raw tokens, K RoPE'd at absolute positions
    n_raw = min(cfg.l, S)
    pos_raw = jnp.arange(S - n_raw, S)
    K_raw_rope = apply_rope(
        aux["K_cmp_raw"][:, :, S - n_raw :], pos_raw, cfg.rope_base, cfg.rope_scale
    )
    k_cmp_raw = cache.k_cmp_raw.at[:, :, pos_raw % cfg.l].set(K_raw_rope)
    v_cmp_raw = cache.v_cmp_raw.at[:, :, pos_raw % cfg.l].set(
        aux["V_cmp_raw"][:, :, S - n_raw :]
    )

    n_cmp = aux["K_cmp"].shape[2]
    k_cmp = cache.k_cmp.at[:, :, :n_cmp].set(aux["K_cmp"])
    v_cmp = cache.v_cmp.at[:, :, :n_cmp].set(aux["V_cmp"])

    return NSACache(
        k_sel=k_sel, v_sel=v_sel, k_win=k_win, v_win=v_win,
        k_cmp_raw=k_cmp_raw, v_cmp_raw=v_cmp_raw, k_cmp=k_cmp, v_cmp=v_cmp,
        t=jnp.asarray(S, jnp.int32),
    )
