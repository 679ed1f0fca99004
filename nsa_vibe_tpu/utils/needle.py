"""End-to-end needle retrieval probe: through the ATTENTION OUTPUT.

Goes beyond the reference's needle test (test_long_context_needle.py:85-104,
which only checks that selected ranges cover the needle): this probe runs
the full NSA module — prefill at length S-1, then ONE cached decode step —
and asserts the needle's VALUE vector dominates the output of the final
query, i.e. retrieval works end to end (projections, ϕ-compression,
scoring, selection, gathered attention, gating, output projection).

Construction (key/value signatures are DECOUPLED so the query cannot
retrieve its own value):
  * x chunk 0 (dims [0, d_k))      carries the KEY signature;
  * x chunk 1 (dims [d_k, 2 d_k))  carries the VALUE signature;
  * W_Q / W_K_* broadcast chunk 0 into every head/group slice; W_V_*
    broadcast chunk 1; W_O averages head outputs back into chunk 0 —
    all with small noise so nothing is exactly degenerate;
  * the needle spans one full ϕ-window (l tokens): key sig k0, value
    sig v0; the probe query carries k0 and a ZERO value chunk.
Retrieval metric: cosine(out[:d_v], v0) of the final query's attention
output. With the needle planted it must be high; in the ablated control
(same query, needle rows replaced by noise) it must be low. rope_scale
is set huge so rotary phases are ~0 (the probe measures routing, not
RoPE geometry).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from nsa_vibe_tpu.core.cache import cache_from_prefill
from nsa_vibe_tpu.core.config import NSAConfig
from nsa_vibe_tpu.core.decode import nsa_decode_step
from nsa_vibe_tpu.core.nsa import init_nsa_params, nsa_prefill


def _broadcast_chunk(key, dim: int, out: int, d: int, src_chunk: int,
                     dtype, eps: float = 0.005):
    """[dim, out] matrix mapping x[src_chunk*d:(src_chunk+1)*d] identically
    into every d-sized slice of the output (+ noise)."""
    w = np.zeros((dim, out), np.float32)
    for j in range(out // d):
        w[src_chunk * d:(src_chunk + 1) * d, j * d:(j + 1) * d] = np.eye(d)
    noise = jax.random.normal(key, (dim, out), jnp.float32) * eps
    return (jnp.asarray(w) + noise).astype(dtype)


def _probe_params(cfg: NSAConfig, dtype, seed: int) -> dict:
    params = init_nsa_params(jax.random.PRNGKey(seed), cfg, dtype)
    keys = jax.random.split(jax.random.PRNGKey(seed + 100), 9)
    d = cfg.d_k
    dim, H, G = cfg.dim, cfg.n_heads, cfg.n_kv_groups
    params["W_Q"] = _broadcast_chunk(keys[0], dim, H * d, d, 0, dtype)
    for i, n in enumerate(("W_K_sel", "W_K_win", "W_K_cmp")):
        params[n] = _broadcast_chunk(keys[1 + i], dim, G * d, d, 0, dtype)
    for i, n in enumerate(("W_V_sel", "W_V_win", "W_V_cmp")):
        params[n] = _broadcast_chunk(keys[4 + i], dim, G * cfg.d_v, cfg.d_v,
                                     1, dtype)
    # W_O: average head outputs into chunk 0
    wo = np.zeros((H * cfg.d_v, dim), np.float32)
    for hh in range(H):
        wo[hh * cfg.d_v:(hh + 1) * cfg.d_v, :cfg.d_v] = np.eye(cfg.d_v) / H
    noise = jax.random.normal(keys[7], wo.shape, jnp.float32) * 0.005
    params["W_O"] = (jnp.asarray(wo) + noise).astype(dtype)
    return params


def needle_probe(
    cfg: NSAConfig, S: int, depth: float, dtype=jnp.float32,
    seed: int = 0, decode: bool = True,
) -> dict:
    """Returns {found_sel, cos_needle, cos_ablated, pass_}: selection must
    cover the needle block in every group, the decoded output must align
    with the needle value (cos > 0.5), and the ablated control must not
    (cos < 0.25)."""
    cfg = cfg.replace(rope_scale=1e9)
    dim, d = cfg.dim, cfg.d_k
    params = _probe_params(cfg, dtype, seed)

    rng = np.random.default_rng(seed)
    k0 = rng.normal(0, 1, (d,));  k0 /= np.linalg.norm(k0)
    v0 = rng.normal(0, 1, (cfg.d_v,));  v0 /= np.linalg.norm(v0)
    needle_pos = (int((S - 2 - cfg.l) * depth) // cfg.d) * cfg.d

    base = rng.normal(0, 0.05, (1, S, dim)).astype(np.float32)
    query = np.zeros((dim,), np.float32)
    query[:d] = k0 * 4.0                                # key match, NO value
    needle_row = np.zeros((dim,), np.float32)
    needle_row[:d] = k0 * 4.0
    needle_row[d:d + cfg.d_v] = v0 * 4.0

    def run(plant: bool):
        # prefill the full S-token context (keeps S chunk-friendly at 64k),
        # then decode the probe query as token S+1
        x = base.copy()
        if plant:
            x[0, needle_pos:needle_pos + cfg.l] = needle_row
        x[0, S - 1] = query
        xj = jnp.asarray(x, dtype)
        if decode:
            _, aux = jax.jit(lambda p, x: nsa_prefill(p, x, cfg))(
                params, xj[:, :S - 1])
            cache = cache_from_prefill(cfg, aux, capacity=S + 8)
            out, _, info = jax.jit(
                lambda p, xt, c: nsa_decode_step(p, xt, c, cfg)
            )(params, xj[:, S - 1:], cache)
            sel_final = np.asarray(info.sel_idx)[0, 0]
            o = np.asarray(out[0, 0], np.float32)
        else:
            out, aux2 = jax.jit(lambda p, x: nsa_prefill(p, x, cfg))(params, xj)
            sel_final = np.asarray(aux2["sel_idx"])[0, S - 1]
            o = np.asarray(out[0, S - 1], np.float32)
        v = o[: cfg.d_v]
        return sel_final, float(v @ v0 / (np.linalg.norm(v) + 1e-8))

    sel_final, cos_needle = run(plant=True)
    _, cos_ablated = run(plant=False)
    needle_block = needle_pos // cfg.l_sel
    found_sel = all(needle_block in sel_final[g] for g in range(cfg.n_kv_groups))
    return {
        "S": S, "depth": depth, "needle_pos": needle_pos,
        "found_sel": bool(found_sel),
        "cos_needle": cos_needle, "cos_ablated": cos_ablated,
        "pass_": bool(found_sel and cos_needle > 0.5 and cos_ablated < 0.25),
    }
