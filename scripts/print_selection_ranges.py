"""Debug CLI: print the selection decisions and kernel routing for a config.

Reference: scripts/print_selection_ranges.py + scripts/print_routing.py —
dump the per-position selected ranges for a toy input and summarize which
execution paths are active. TPU version prints the resolved kernel path,
chip-tuned Pallas tile parameters, and the selected block ids / merged
token ranges for a handful of query positions.

Run: JAX_PLATFORMS=cpu PYTHONPATH= python scripts/print_selection_ranges.py [--S 256]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--S", type=int, default=256)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--kernel", default="reference")
    ap.add_argument("--positions", default=None,
                    help="comma-separated query positions (default: spread)")
    ap.add_argument("--compare", action="store_true",
                    help="print per-branch pallas-vs-reference MAEs "
                         "(reference NSA_DEBUG_COMPARE)")
    args = ap.parse_args()

    from nsa_vibe_tpu.core.config import NSAConfig
    from nsa_vibe_tpu.core.nsa import init_nsa_params, nsa_prefill
    from nsa_vibe_tpu.ops.selection import blocks_to_ranges
    from nsa_vibe_tpu.ops.tuning import tuned

    cfg = NSAConfig(dim=args.dim, n_heads=4, n_kv_groups=2, d_k=32, d_v=32,
                    l=16, d=8, l_sel=32, n_sel=8, w=64, kernel=args.kernel)

    # routing summary (reference execution_routing_summary, flags.py:63)
    print("== routing ==")
    print(json.dumps({
        "platform": jax.devices()[0].platform,
        "kernel": cfg.kernel,
        "tuned": {k: tuned(k) for k in
                  ("win.block_q", "win.block_k", "cmp.block_q", "cmp.block_k",
                   "sel.block_q", "sel.kv_batch", "scorer.block_q",
                   "scorer.cmp_chunk")},
    }))

    params = init_nsa_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, args.S, cfg.dim))
    _, aux = jax.jit(lambda p, x: nsa_prefill(p, x, cfg))(params, x)
    sel = np.asarray(aux["sel_idx"])  # [B,S,G,n] set form (unsorted, -1 padded)
    # blocks_to_ranges wants sorted-ascending with the -1s as a tail
    big = np.iinfo(np.int32).max
    sel_sorted = np.sort(np.where(sel < 0, big, sel), axis=-1)
    sel_sorted = np.where(sel_sorted == big, -1, sel_sorted).astype(np.int32)
    t_pos = jnp.arange(args.S, dtype=jnp.int32)
    ranges = np.asarray(blocks_to_ranges(
        jnp.asarray(sel_sorted), t_pos, cfg.l_sel, cfg.n_sel))

    if args.positions:
        positions = [int(p) for p in args.positions.split(",")]
    else:
        positions = sorted({0, 1, args.S // 4, args.S // 2, args.S - 1})
    print("== selection (g=0) ==")
    for t in positions:
        blocks = sorted(int(b) for b in sel[0, t, 0] if b >= 0)
        rr = [(int(s), int(e)) for s, e in ranges[0, t, 0] if e > s]
        print(f"t={t:6d} blocks={blocks} ranges={rr}")
        assert all(b * cfg.l_sel <= t for b in blocks), "causality violated"
    print("ok: all selected blocks causal")

    if args.compare:
        from nsa_vibe_tpu.utils.compare import debug_compare_prefill

        print("== branch MAEs (pallas vs reference) ==")
        print(json.dumps(debug_compare_prefill(params, x, cfg)))


if __name__ == "__main__":
    main()
