"""Branch-attention dispatch: Pallas kernels vs jnp reference oracle.

This layer replaces the reference's 5-rung routing ladder with counted
fallbacks (nsa/core/nsa_attention.py:709-830,1205-1298): there is ONE
accelerated implementation per branch (Pallas) and one oracle (jnp
reference), chosen by config — no runtime capability probing, because on
TPU kernel availability is a compile-time fact.

  kernel="auto"      -> Pallas on TPU backends, reference elsewhere
  kernel="pallas"    -> Pallas (interpret-mode when running on CPU)
  kernel="reference" -> jnp oracle

Training: Pallas forwards are wrapped in custom_vjp with a
recompute-based backward through the reference implementation (correct
analytic gradients; dedicated Pallas backward kernels are the next
optimization step and slot in here).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from nsa_vibe_tpu.ops import reference as ref
from nsa_vibe_tpu.ops.pallas.flash import (
    compressed_attention_pallas,
    sliding_window_attention_pallas,
)
from nsa_vibe_tpu.ops.pallas.sel_flash import selection_flash_pallas
from nsa_vibe_tpu.ops.pallas.selection import selection_attention_pallas


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    return jax.default_backend() not in ("cpu",)


def resolve_kernel(kernel: str) -> tuple[str, bool]:
    """-> (impl, interpret)."""
    if kernel == "reference":
        return "reference", False
    if kernel == "pallas":
        return "pallas", not _on_tpu()
    # auto
    return ("pallas", False) if _on_tpu() else ("reference", False)


def _with_ref_vjp(pallas_fn: Callable, ref_fn: Callable):
    """custom_vjp: pallas forward, reference-recompute backward (Q, K, V
    are the differentiable args; everything else closed over)."""

    @jax.custom_vjp
    def f(Q, K, V):
        return pallas_fn(Q, K, V)

    def fwd(Q, K, V):
        return pallas_fn(Q, K, V), (Q, K, V)

    def bwd(res, g):
        Q, K, V = res
        _, vjp = jax.vjp(ref_fn, Q, K, V)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def sliding_window_attention(
    Q: jnp.ndarray, K: jnp.ndarray, V: jnp.ndarray,
    t_pos: jnp.ndarray, w: int, scale: float, kernel: str = "auto",
) -> jnp.ndarray:
    impl, interpret = resolve_kernel(kernel)
    if impl == "reference":
        return ref.sliding_window_attention(Q, K, V, t_pos, w, scale)
    f = _with_ref_vjp(
        lambda q, k, v: sliding_window_attention_pallas(q, k, v, w, scale, interpret=interpret),
        lambda q, k, v: ref.sliding_window_attention(q, k, v, t_pos, w, scale),
    )
    return f(Q, K, V)


def compressed_attention(
    Q: jnp.ndarray, K_cmp: jnp.ndarray, V_cmp: jnp.ndarray,
    num_cmp_t: jnp.ndarray, l: int, d: int, scale: float, kernel: str = "auto",
) -> jnp.ndarray:
    impl, interpret = resolve_kernel(kernel)
    if impl == "reference":
        return ref.compressed_attention(Q, K_cmp, V_cmp, num_cmp_t, scale)
    f = _with_ref_vjp(
        lambda q, k, v: compressed_attention_pallas(q, k, v, l, d, scale, interpret=interpret),
        lambda q, k, v: ref.compressed_attention(q, k, v, num_cmp_t, scale),
    )
    return f(Q, K_cmp, V_cmp)


def selection_attention(
    Q: jnp.ndarray, K: jnp.ndarray, V: jnp.ndarray,
    sel_idx: jnp.ndarray, t_pos: jnp.ndarray, l_sel: int, scale: float,
    kernel: str = "auto",
    pos_offset: int = 0,
) -> jnp.ndarray:
    """Prefill uses the masked block-flash kernel (each block in a q-tile's
    union fetched once); single-query decode uses the per-query gather
    kernel (reads exactly n*l_sel keys)."""
    impl, interpret = resolve_kernel(kernel)
    if impl == "reference":
        return ref.selection_attention(Q, K, V, sel_idx, t_pos, l_sel, scale)
    if Q.shape[1] == 1:
        pallas_fn = lambda q, k, v: selection_attention_pallas(  # noqa: E731
            q, k, v, sel_idx, t_pos, l_sel=l_sel, scale=scale, interpret=interpret
        )
    else:
        pallas_fn = lambda q, k, v: selection_flash_pallas(  # noqa: E731
            q, k, v, sel_idx, l_sel=l_sel, scale=scale,
            pos_offset=pos_offset, interpret=interpret,
        )
    f = _with_ref_vjp(
        pallas_fn,
        lambda q, k, v: ref.selection_attention(q, k, v, sel_idx, t_pos, l_sel, scale),
    )
    return f(Q, K, V)
