"""Learned branch gate (GateMLP).

Reference: nsa/core/nsa_attention.py:32-82 — two-layer MLP over the
group-mean-pooled query, last layer xavier(gain=0.1) + zero bias so the
gate starts near-uniform, τ-temperature softmax over (cmp, sel, win).
Force-branch / force-uniform debug overrides are config switches here
instead of env vars.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

BRANCH_INDEX = {"cmp": 0, "sel": 1, "win": 2}


def init_gate_params(key: jax.Array, d_k: int, hidden: Optional[int] = None, dtype=jnp.float32):
    hidden = hidden or max(1, d_k // 2)
    k1, k2 = jax.random.split(key)
    # fc1: xavier-uniform; fc2: xavier-uniform with gain 0.1, zero bias
    lim1 = (6.0 / (d_k + hidden)) ** 0.5
    lim2 = 0.1 * (6.0 / (hidden + 3)) ** 0.5
    return {
        "w1": jax.random.uniform(k1, (d_k, hidden), dtype, -lim1, lim1),
        "b1": jnp.zeros((hidden,), dtype),
        "w2": jax.random.uniform(k2, (hidden, 3), dtype, -lim2, lim2),
        "b2": jnp.zeros((3,), dtype),
    }


def gate_probs(
    params,
    q_pooled: jnp.ndarray,
    tau: float = 1.0,
    force_branch: Optional[str] = None,
    force_uniform: bool = False,
) -> jnp.ndarray:
    """q_pooled: [..., Dk] -> gate probabilities [..., 3] (cmp, sel, win)."""
    if force_uniform:
        return jnp.full((*q_pooled.shape[:-1], 3), 1.0 / 3.0, q_pooled.dtype)
    if force_branch is not None:
        idx = BRANCH_INDEX[force_branch.strip().lower()]
        out = jnp.zeros((*q_pooled.shape[:-1], 3), q_pooled.dtype)
        return out.at[..., idx].set(1.0)
    x = jax.nn.silu(q_pooled @ params["w1"] + params["b1"])
    g = (x @ params["w2"] + params["b2"]) / max(tau, 1e-6)
    return jax.nn.softmax(g.astype(jnp.float32), axis=-1).astype(q_pooled.dtype)


@jax.custom_vjp
def _softmax_dform(z: jnp.ndarray) -> jnp.ndarray:
    """Softmax whose backward expects the D-FORM cotangent D_k = g_k*dg_k
    instead of dg_k (the true upstream). The gated branch kernels
    (gate-epilogue fold, ops.attention) return exactly D_k =
    rowsum(dO * Y_k) = g_k * rowsum(dO * O_k) as the gate cotangent —
    so the pair composes to the EXACT softmax-combine gradient:

        dz_k = g_k*(dg_k - sum_j g_j*dg_j) = D_k - g_k * sum_j D_j

    with no division by a (possibly collapsing, g->0) gate anywhere.
    MUST only receive cotangents produced by the gated-branch vjps; any
    other consumer of its output (e.g. a gate-entropy regularizer) would
    silently get wrong gradients — aux-visible gates are stop_gradient'd
    (core.nsa) for exactly this reason."""
    return jax.nn.softmax(z, axis=-1)


def _softmax_dform_fwd(z):
    g = jax.nn.softmax(z, axis=-1)
    return g, g


def _softmax_dform_bwd(g, D):
    return (D - g * jnp.sum(D, axis=-1, keepdims=True),)


_softmax_dform.defvjp(_softmax_dform_fwd, _softmax_dform_bwd)


def gate_probs_dform(params, q_pooled: jnp.ndarray, tau: float = 1.0) -> jnp.ndarray:
    """Gate probabilities [..., 3] (f32) for the gate-epilogue fold path:
    identical VALUES to gate_probs (no force overrides), but the softmax
    carries the D-form gradient contract (_softmax_dform). Only valid
    when every consumer of a gate column is a gated-branch custom_vjp."""
    x = jax.nn.silu(q_pooled @ params["w1"] + params["b1"])
    z = (x @ params["w2"] + params["b2"]) / max(tau, 1e-6)
    return _softmax_dform(z.astype(jnp.float32))


def gate_stats(gates: jnp.ndarray) -> dict:
    """Gate-health statistics (reference nsa_attention.py:127-165):
    entropy, max-gate, branch shares, collapse fraction."""
    g = gates.reshape(-1, 3).astype(jnp.float32)
    entropy = -jnp.sum(g * jnp.log(g + 1e-8), axis=-1)
    max_gate = jnp.max(g, axis=-1)
    collapsed = (entropy < 0.1) & (max_gate > 0.95)
    return {
        "entropy_mean": entropy.mean(),
        "entropy_min": entropy.min(),
        "max_gate_mean": max_gate.mean(),
        "max_gate_max": max_gate.max(),
        "branch_shares": g.mean(axis=0),
        "collapse_fraction": collapsed.astype(jnp.float32).mean(),
    }
