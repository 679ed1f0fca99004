"""Long-context demo: 64k-token prefill + decode on one chip.

Reference: scripts/demo_64k.py:38-52 (chunked prefill + NSA_ROPE_SCALE).
TPU version: one jitted prefill with *chunked selection scoring*
(cfg.prefill_chunk, the reference's NSA_CHUNKED_SELECTION_SPEC) so score
memory stays O(chunk * S_cmp) instead of O(S * S_cmp); RoPE position
scaling via --rope-scale; then seeds the fixed-capacity decode cache and
times single-token decode steps, printing per-branch read counters.

Run: python scripts/demo_64k.py [--S 65536] [--chunk 2048] [--rope-scale 1.0]
(defaults are TPU-sized; use --S 8192 for a CPU smoke)
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
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--S", type=int, default=65536)
    ap.add_argument("--chunk", type=int, default=2048)
    ap.add_argument("--decode-steps", type=int, default=16)
    ap.add_argument("--rope-scale", type=float, default=1.0)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--kernel", default="auto")
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from nsa_vibe_tpu.core.cache import cache_from_prefill
    from nsa_vibe_tpu.core.config import NSAConfig
    from nsa_vibe_tpu.core.decode import nsa_decode_step
    from nsa_vibe_tpu.core.nsa import init_nsa_params, nsa_prefill

    cfg = NSAConfig(
        dim=args.dim, n_heads=4, n_kv_groups=2, d_k=64, d_v=64,
        l=32, d=16, l_sel=64, n_sel=16, w=512,
        kernel=args.kernel, rope_scale=args.rope_scale,
        prefill_chunk=args.chunk,
    )
    dtype = jnp.dtype(args.dtype)
    params = init_nsa_params(jax.random.PRNGKey(0), cfg, dtype)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, args.S, cfg.dim), dtype)

    prefill = jax.jit(lambda p, x: nsa_prefill(p, x, cfg))
    out, aux = prefill(params, x)           # compile + warm
    _ = float(out[0, -1, 0])
    t0 = time.perf_counter()
    out, aux = prefill(params, x)
    _ = float(out[0, -1, 0])
    prefill_s = time.perf_counter() - t0
    assert np.isfinite(np.asarray(out[:, -64:], np.float32)).all()

    # decode continuation
    cache = cache_from_prefill(cfg, aux, capacity=args.S + args.decode_steps + 8)
    step = jax.jit(lambda p, xt, c: nsa_decode_step(p, xt, c, cfg), donate_argnums=(2,))
    x_tok = jax.random.normal(jax.random.PRNGKey(2), (1, 1, cfg.dim), dtype)
    out_t, cache, info = step(params, x_tok, cache)  # compile
    _ = float(out_t[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(args.decode_steps):
        out_t, cache, info = step(params, x_tok, cache)
    _ = float(out_t[0, 0, 0])
    decode_ms = (time.perf_counter() - t0) / args.decode_steps * 1e3

    total_kv = int(info.reads_pred)
    print(json.dumps({
        "S": args.S,
        "prefill_s": round(prefill_s, 2),
        "prefill_toks_per_s": round(args.S / prefill_s, 1),
        # DISPATCHED per-call latency (includes the ~0.5-2 ms axon
        # tunnel pedestal per step, which dominates at these scales);
        # the true DEVICE latency curve to 64k is bench.py's chained
        # sweep (decode_device_ms_per_step_S*, ~tens of us)
        "decode_ms_per_step_dispatched": round(decode_ms, 3),
        "decode_reads": total_kv,
        "decode_reads_vs_full": round(total_kv / (args.S + args.decode_steps), 4),
        "reads_cmp": int(info.reads_cmp),
        "reads_sel": int(info.reads_sel),
        "reads_win": int(info.reads_win),
        "rope_scale": args.rope_scale,
        "chunk": args.chunk,
    }))


if __name__ == "__main__":
    main()
