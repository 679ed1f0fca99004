"""North-star decode benchmark: per-step latency + exact read accounting.

Reference contract (bench/bench_decode.py:60-266): for each context length
S in a sweep, prefill S tokens, then time single-token decode steps
(warmup discarded); re-run with each branch's gate forced to measure
per-branch latency; write a CSV with ms_total/ms_cmp/ms_sel/ms_win and
actual-vs-expected memory reads, where
    expected(S) = num_cmp(S) + n*l' + min(w, S)          (bench_decode.py:36-38)

TPU notes: the whole decode step is one jitted XLA program, so "per-branch
time" is measured the reference's way — force the gate to one branch and
time the full step (gating does not change the computation graph under
jit; it isolates numerics, and the delta vs total reflects XLA's ability
to skip nothing — reported for contract parity).

Run: python bench/bench_decode.py [--S 512,1024,2048,4096] [--iters 64]
     [--csv artifacts/decode.csv] [--branches]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import csv
import json
import os
import time

import jax
import jax.numpy as jnp

from nsa_vibe_tpu.core.cache import cache_from_prefill
from nsa_vibe_tpu.core.config import NSAConfig
from nsa_vibe_tpu.core.decode import nsa_decode_step
from nsa_vibe_tpu.core.nsa import init_nsa_params, nsa_prefill
from nsa_vibe_tpu.ops.block_index import num_cmp_blocks


def expected_reads(S: int, cfg: NSAConfig) -> int:
    """num_cmp(S) + n*l' + min(w, S) (reference bench_decode.py:36-38)."""
    return int(num_cmp_blocks(S, cfg.l, cfg.d)) + cfg.n_sel * cfg.l_sel + min(cfg.w, S)


def time_decode(params, cfg: NSAConfig, x_ctx, iters: int, warmup: int):
    """Prefill x_ctx then time `iters` decode steps. Returns (ms/step, info)."""
    B, S = x_ctx.shape[0], x_ctx.shape[1]
    _, aux = jax.jit(lambda p, x: nsa_prefill(p, x, cfg))(params, x_ctx)
    cache = cache_from_prefill(cfg, aux, capacity=S + iters + warmup + 8)

    step = jax.jit(lambda p, xt, c: nsa_decode_step(p, xt, c, cfg), donate_argnums=(2,))
    x_tok = jax.random.normal(jax.random.PRNGKey(2), (B, 1, cfg.dim), x_ctx.dtype)

    info = None
    for _ in range(warmup):
        out, cache, info = step(params, x_tok, cache)
    _ = float(out[0, 0, 0])  # force completion (axon: block_until_ready unreliable)
    t0 = time.perf_counter()
    for _ in range(iters):
        out, cache, info = step(params, x_tok, cache)
    _ = float(out[0, 0, 0])
    dt = time.perf_counter() - t0
    return dt / iters * 1e3, info


def serve_bench(args) -> None:
    """Single-stream serving throughput: TinyLM prefill + lax.scan'd
    decode in one jitted program (models/tinylm.py::generate_scan)."""
    from nsa_vibe_tpu.core.config import ModelConfig
    from nsa_vibe_tpu.models.tinylm import generate_scan, init_model_params
    import numpy as np

    S0, n_new = 1024, 128
    cfg = NSAConfig(dim=args.dim, n_heads=args.heads, n_kv_groups=args.groups,
                    d_k=64, d_v=64, l=32, d=16, l_sel=64, n_sel=16, w=512,
                    kernel=args.kernel)
    mcfg = ModelConfig(vocab_size=256, n_layers=4, nsa=cfg, dtype=args.dtype)
    params = init_model_params(jax.random.PRNGKey(0), mcfg, jnp.dtype(args.dtype))
    prompt = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (args.batch, S0)), jnp.int32)

    out = generate_scan(params, prompt, n_new, mcfg)      # compile + warm
    _ = int(out[0, -1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = generate_scan(params, prompt, n_new, mcfg)
        _ = int(out[0, -1])                               # force completion
        best = min(best, time.perf_counter() - t0)
    per_tok_ms = best / n_new * 1e3 / 1
    print(json.dumps({
        "mode": "serve", "batch": args.batch, "prompt": S0, "new": n_new,
        "layers": mcfg.n_layers, "s_total": round(best, 4),
        "ms_per_token": round(per_tok_ms, 4),
        "toks_per_s": round(args.batch * n_new / best, 1),
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--S", default="512,1024,2048,4096")
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--warmup", type=int, default=8)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--groups", type=int, default=2)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--kernel", default="auto")
    ap.add_argument("--csv", default=None)
    ap.add_argument("--branches", action="store_true",
                    help="also time cmp/sel/win-forced variants")
    ap.add_argument("--serve", action="store_true",
                    help="model-level single-stream serving: prefill + "
                         "generate_scan (whole generation in ONE program; "
                         "amortizes per-token dispatch)")
    args = ap.parse_args()

    if args.serve:
        serve_bench(args)
        return

    sweep = [int(s) for s in args.S.split(",")]
    cfg = NSAConfig(dim=args.dim, n_heads=args.heads, n_kv_groups=args.groups,
                    d_k=64, d_v=64, l=32, d=16, l_sel=64, n_sel=16, w=512,
                    kernel=args.kernel)
    dtype = jnp.dtype(args.dtype)
    params = init_nsa_params(jax.random.PRNGKey(0), cfg, dtype)

    rows = []
    for S in sweep:
        x_ctx = jax.random.normal(jax.random.PRNGKey(1), (args.batch, S, cfg.dim), dtype)
        ms_total, info = time_decode(params, cfg, x_ctx, args.iters, args.warmup)
        branch_ms = {}
        if args.branches:
            for br in ("cmp", "sel", "win"):
                ms_br, _ = time_decode(params, cfg.replace(force_branch=br),
                                       x_ctx, args.iters, args.warmup)
                branch_ms[br] = ms_br
        S_end = S + args.iters + args.warmup
        row = {
            "S": S,
            "batch": args.batch,
            "toks_per_s": round(args.batch / (ms_total / 1e3), 1),
            "ms_total": round(ms_total, 4),
            "ms_cmp": round(branch_ms["cmp"], 4) if "cmp" in branch_ms else None,
            "ms_sel": round(branch_ms["sel"], 4) if "sel" in branch_ms else None,
            "ms_win": round(branch_ms["win"], 4) if "win" in branch_ms else None,
            # decode-only reads at the last timed step
            "reads_actual": int(info.reads_pred) if info is not None else -1,
            "reads_expected": expected_reads(S_end, cfg),
            "reads_cmp": int(info.reads_cmp) if info is not None else -1,
            "reads_sel": int(info.reads_sel) if info is not None else -1,
            "reads_win": int(info.reads_win) if info is not None else -1,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.csv:
        os.makedirs(os.path.dirname(args.csv) or ".", exist_ok=True)
        with open(args.csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
        print(f"wrote {args.csv}")


if __name__ == "__main__":
    main()
