"""Prefill scaling benchmark: batched-prefill latency & throughput vs S.

Reference contract (bench/bench_prefill.py:1-108): sweep sequence lengths,
time the batched prefill forward, report ms and tokens/s. TPU extension:
optional --grad also times forward+backward (the training hot path), and
--chunk exercises the chunked selection-scoring pipeline used for
long-context prefill (reference docs/NSA_CHUNKED_SELECTION_SPEC.md).

Run: python bench/bench_prefill.py [--S 512,1024,2048,4096] [--grad]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import jax
import jax.numpy as jnp

from nsa_vibe_tpu.core.config import NSAConfig
from nsa_vibe_tpu.core.nsa import init_nsa_params, nsa_prefill


def main() -> None:
    from nsa_vibe_tpu.ops.tuning import apply_tpu_env
    apply_tpu_env()   # scoped-vmem budget flag; before backend init
    ap = argparse.ArgumentParser()
    ap.add_argument("--S", default="512,1024,2048,4096")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--groups", type=int, default=2)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--kernel", default="auto")
    ap.add_argument("--chunk", type=int, default=0)
    ap.add_argument("--grad", action="store_true")
    args = ap.parse_args()

    cfg = NSAConfig(dim=args.dim, n_heads=args.heads, n_kv_groups=args.groups,
                    d_k=64, d_v=64, l=32, d=16, l_sel=64, n_sel=16, w=512,
                    kernel=args.kernel, prefill_chunk=args.chunk)
    dtype = jnp.dtype(args.dtype)
    params = init_nsa_params(jax.random.PRNGKey(0), cfg, dtype)

    if args.grad:
        def loss(p, x):
            out, _ = nsa_prefill(p, x, cfg)
            return jnp.mean(out.astype(jnp.float32) ** 2)

        fn = jax.jit(jax.grad(loss))
        fetch = lambda r: float(jax.tree_util.tree_leaves(r)[0].reshape(-1)[0])  # noqa: E731
    else:
        fn = jax.jit(lambda p, x: nsa_prefill(p, x, cfg)[0])
        fetch = lambda r: float(r[0, 0, 0])  # noqa: E731

    for S in [int(s) for s in args.S.split(",")]:
        x = jax.random.normal(jax.random.PRNGKey(1), (args.batch, S, cfg.dim), dtype)
        r = fn(params, x)
        _ = fetch(r)  # compile + completion barrier
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = fn(params, x)
        _ = fetch(r)
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(json.dumps({
            "S": S, "batch": args.batch, "grad": args.grad,
            "ms": round(ms, 3),
            "toks_per_s": round(args.batch * S / (ms / 1e3), 1),
            "kernel": args.kernel, "chunk": args.chunk,
        }), flush=True)


if __name__ == "__main__":
    main()
