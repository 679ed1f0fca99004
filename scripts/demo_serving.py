"""Ragged-serving demo: a batch of different-length prompts generated in
ONE program, then a mid-stream admission into a running ragged batch.

What it shows (all beyond the reference, whose NSA_KV is single-stream):
  1. `generate_ragged` — each row starts sampling the tick its own
     prompt ends; padding never enters any row's attention;
  2. `nsa_decode_step_ragged` + `cache.admit_row` — rows decode at
     their own depths and a freshly-prefilled request joins a running
     batch without touching the other rows.

Run: JAX_PLATFORMS=cpu PYTHONPATH= python scripts/demo_serving.py
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
    ap.add_argument("--new", type=int, default=16)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--layers", type=int, default=2)
    args = ap.parse_args()

    from nsa_vibe_tpu.core.cache import admit_row, init_cache, ragged_cache
    from nsa_vibe_tpu.core.config import ModelConfig, NSAConfig
    from nsa_vibe_tpu.core.decode import (
        nsa_decode_step_ragged,
        nsa_prefill_via_decode,
    )
    from nsa_vibe_tpu.core.nsa import init_nsa_params
    from nsa_vibe_tpu.models.tinylm import generate_ragged, init_model_params

    nsa = NSAConfig(dim=args.dim, n_heads=4, n_kv_groups=2, d_k=32, d_v=32,
                    l=16, d=8, l_sel=16, n_sel=4, w=64)
    mcfg = ModelConfig(vocab_size=256, n_layers=args.layers, nsa=nsa)
    params = init_model_params(jax.random.PRNGKey(0), mcfg)

    # --- 1. ragged batch generation -------------------------------------
    rng = np.random.default_rng(0)
    lens = [24, 57, 96]
    L = max(lens)
    prompts = np.zeros((len(lens), L), np.int32)
    for i, ln in enumerate(lens):
        prompts[i, :ln] = rng.integers(1, 256, ln)
    t0 = time.perf_counter()
    out = generate_ragged(params, jnp.asarray(prompts),
                          jnp.asarray(lens, jnp.int32), args.new, mcfg)
    out.block_until_ready()
    print(json.dumps({
        "phase": "generate_ragged", "prompt_lens": lens, "new": args.new,
        "ticks": L + args.new - 1, "wall_s": round(time.perf_counter() - t0, 2),
        "first_tokens": np.asarray(out[:, :4]).tolist(),
    }))

    # --- 2. mid-stream admission ----------------------------------------
    C = 192
    layer = init_nsa_params(jax.random.PRNGKey(1), nsa)
    depths = [40, 112]
    xs = jax.random.normal(jax.random.PRNGKey(2), (2, 112, nsa.dim))
    rows = []
    for i, t in enumerate(depths):
        c = init_cache(nsa, 1, C)
        _, c = nsa_prefill_via_decode(layer, xs[i : i + 1, :t], c, nsa)
        rows.append(c)
    batch = type(rows[0])(*[
        jnp.concatenate([getattr(r, f) for r in rows] + [getattr(rows[0], f)],
                        axis=0)
        for f in rows[0]._fields[:-1]
    ], t=jnp.asarray(depths + [0], jnp.int32))

    x_req = jax.random.normal(jax.random.PRNGKey(3), (1, 64, nsa.dim))
    solo = init_cache(nsa, 1, C)
    _, solo = nsa_prefill_via_decode(layer, x_req, solo, nsa)
    batch = admit_row(batch, ragged_cache(solo), 2)

    step = jax.jit(lambda p, xt, c: nsa_decode_step_ragged(p, xt, c, nsa))
    x_new = jax.random.normal(jax.random.PRNGKey(4), (3, 1, nsa.dim))
    out, batch, info = step(layer, x_new, batch)
    print(json.dumps({
        "phase": "admit_row", "depths_after_step": batch.t.tolist(),
        "per_row_reads_pred": info.reads_pred.tolist(),
        "overflow": info.overflow.tolist(),
    }))
    assert batch.t.tolist() == [41, 113, 65]
    print("serving demo OK")


if __name__ == "__main__":
    main()
