"""Minutes-long continuous-batching soak with MID-STREAM admissions.

The r4 serving table measured steady-state continuous batching
(bench_decode --serve-cb) but never exercised the admission path under
sustained load at the flagship depth. This soak runs the 12-layer m7c
serve model (--layers/--dim/--heads override) for --minutes wall
minutes: chained jitted segments of ragged decode steps, and after
EVERY segment the deepest row is retired and a freshly-prefilled
request is admitted in its place (core.cache.admit_row per layer) —
the lifecycle a production scheduler drives. Reference analog: the
decode bench contract (/root/reference/bench/bench_decode.py:60-266),
which has no batched or admission serving at all.

Publishes one JSON line: sustained toks/s, segments, admissions, depth
range, overflow/finiteness checks.

Run (TPU): python bench/serve_soak.py --minutes 3
CPU smoke:  JAX_PLATFORMS=cpu PYTHONPATH= python bench/serve_soak.py \
              --minutes 0.2 --dim 128 --layers 2 --heads 4 --batch 4 \
              --segment 8 --s0 128 --capacity 512
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
    ap.add_argument("--minutes", type=float, default=3.0)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--segment", type=int, default=64,
                    help="ragged decode steps per jitted segment")
    ap.add_argument("--s0", type=int, default=1024, help="admission depth")
    ap.add_argument("--capacity", type=int, default=4096)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--groups", type=int, default=2)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from nsa_vibe_tpu.core.cache import admit_row, ragged_cache
    from nsa_vibe_tpu.core.config import ModelConfig, NSAConfig
    from nsa_vibe_tpu.models.tinylm import (
        init_model_params,
        model_decode_step_ragged,
        model_prefill_with_caches,
    )
    from nsa_vibe_tpu.ops.tuning import apply_tpu_env

    apply_tpu_env()
    nsa = NSAConfig(dim=args.dim, n_heads=args.heads, n_kv_groups=args.groups,
                    d_k=64, d_v=64, l=32, d=16, l_sel=64, n_sel=16, w=512)
    mcfg = ModelConfig(vocab_size=256, n_layers=args.layers, nsa=nsa,
                       dtype=args.dtype)
    params = init_model_params(jax.random.PRNGKey(0), mcfg,
                               jnp.dtype(args.dtype))
    rng = np.random.default_rng(0)
    B, S0 = args.batch, args.s0

    prefill = jax.jit(lambda p, t: model_prefill_with_caches(
        p, t, mcfg, args.capacity))

    prompt = jnp.asarray(rng.integers(0, 256, (B, S0)), jnp.int32)
    _, caches = prefill(params, prompt)
    caches = [ragged_cache(c) for c in caches]

    @jax.jit
    def segment(params, tok0, caches):
        def body(carry, _):
            tok, caches = carry
            logits, caches = model_decode_step_ragged(params, tok, caches, mcfg)
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(tok.dtype)[:, None]
            return (nxt, caches), logits[0, -1, 0]
        (tok, caches), probe = jax.lax.scan(
            body, (tok0, caches), None, length=args.segment)
        return tok, caches, probe[-1]

    tok0 = prompt[:, :1]
    tok0, caches, probe = segment(params, tok0, caches)   # compile + warm
    _ = float(probe)

    # fresh single-row prefill used for every admission (real prefill
    # work each time; the admitted KV content is what matters, not its
    # token identity, so one compiled program serves all admissions)
    solo_prompt = jnp.asarray(rng.integers(0, 256, (1, S0)), jnp.int32)
    _, solo = prefill(params, solo_prompt)
    solo = [ragged_cache(c) for c in solo]

    t_start = time.perf_counter()
    deadline = t_start + args.minutes * 60
    toks = 0
    segs = 0
    admissions = 0
    probe_v = 0.0
    while time.perf_counter() < deadline:
        tok0, caches, probe = segment(params, tok0, caches)
        probe_v = float(probe)            # forces the chain each segment
        toks += B * args.segment
        segs += 1
        # retire the deepest row, admit a fresh request mid-stream
        depths = np.asarray(caches[0].t)
        victim = int(depths.argmax())
        _, solo = prefill(params, solo_prompt)
        solo = [ragged_cache(c) for c in solo]
        caches = [admit_row(c, s, victim) for c, s in zip(caches, solo)]
        admissions += 1
    wall = time.perf_counter() - t_start

    depths = np.asarray(caches[0].t)
    overflow = any(bool(np.asarray(c.overflowed).any()) for c in caches
                   if hasattr(c, "overflowed"))
    print(json.dumps({
        "mode": "serve-cb-soak", "minutes": round(wall / 60, 2),
        "batch": B, "layers": mcfg.n_layers, "dim": args.dim,
        "segments": segs, "admissions": admissions,
        "tokens_generated": toks,
        "toks_per_s": round(toks / wall, 1),
        "depth_min": int(depths.min()), "depth_max": int(depths.max()),
        "capacity": args.capacity, "overflow": overflow,
        "probe_finite": bool(np.isfinite(probe_v)),
    }))


if __name__ == "__main__":
    main()
