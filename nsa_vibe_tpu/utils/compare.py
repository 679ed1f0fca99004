"""Debug parity comparison: pallas vs reference, per branch.

TPU analog of the reference's NSA_DEBUG_COMPARE mode
(nsa/core/nsa_attention.py:1406-1447: recompute per-token references in
prefill and print branch MAEs) and the selection validators
(nsa/core/selection_scorer.py:714-758). Used by tests, bench sanity
passes, and `scripts/print_selection_ranges.py --compare`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def debug_compare_prefill(params, x, cfg, branches=("cmp", "sel", "win")) -> dict:
    """Run nsa_prefill once per branch under kernel="pallas" (interpret on
    CPU) and kernel="reference" with the gate forced to that branch;
    return {branch: mae, "all": mae, "sel_idx_mismatch": frac}."""
    from nsa_vibe_tpu.core.nsa import nsa_prefill

    out: dict = {}

    def run(kernel, force):
        c = cfg.replace(kernel=kernel, force_branch=force)
        return jax.jit(lambda p, xx: nsa_prefill(p, xx, c))(params, x)

    for br in branches:
        op, _ = run("pallas" if jax.default_backend() != "cpu" else "auto", br)
        orf, _ = run("reference", br)
        out[br] = float(jnp.mean(jnp.abs(op.astype(jnp.float32) - orf.astype(jnp.float32))))
    op, auxp = run("auto", None)
    orf, auxr = run("reference", None)
    out["all"] = float(jnp.mean(jnp.abs(op.astype(jnp.float32) - orf.astype(jnp.float32))))
    # selection agreement as a SET per (b, t, g) (orderings differ by design)
    sp = np.asarray(auxp["sel_idx"])
    sr = np.asarray(auxr["sel_idx"])
    mismatch = 0
    total = sp.shape[0] * sp.shape[1] * sp.shape[2]
    for b in range(sp.shape[0]):
        for t in range(sp.shape[1]):
            for g in range(sp.shape[2]):
                if set(sp[b, t, g][sp[b, t, g] >= 0].tolist()) != set(
                        sr[b, t, g][sr[b, t, g] >= 0].tolist()):
                    mismatch += 1
    out["sel_idx_mismatch"] = mismatch / max(total, 1)
    return out


def validate_selection(sel_idx, t_pos, l_sel: int, n_forced: int = 3,
                       force_init: bool = True) -> Optional[str]:
    """Host-side selection invariants (reference selection validators):
    causality (block start <= t), block-0 forced membership, no duplicate
    real blocks. Returns None if OK, else a message."""
    s = np.asarray(sel_idx)
    t = np.asarray(t_pos)
    B, S, G, K = s.shape
    for b in range(B):
        for ti in range(S):
            for g in range(G):
                row = s[b, ti, g]
                real = row[row >= 0]
                if (real * l_sel > t[ti]).any():
                    return f"causality violated at (b={b}, t={t[ti]}, g={g}): {real.tolist()}"
                if force_init and 0 not in real:
                    return f"block 0 not selected at (b={b}, t={t[ti]}, g={g})"
                if len(set(real.tolist())) != len(real):
                    return f"duplicate blocks at (b={b}, t={t[ti]}, g={g}): {real.tolist()}"
    return None
