"""Profiler smoke: trace a few forward/backward steps and verify a trace
was produced.

Reference: scripts/profiler_smoke.py + the NVTX stage ranges
(nsa/core/nsa_attention.py:990-1121). Here the stages are
jax.named_scope ranges ("nsa.proj_rope", "nsa.phi", "nsa.score_select",
"nsa.branch_*") captured by jax.profiler into a TensorBoard-loadable
trace directory.

Run: JAX_PLATFORMS=cpu PYTHONPATH= python scripts/profiler_smoke.py [--out /tmp/prof]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import glob
import json

import jax
import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="artifacts/profile_smoke")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--S", type=int, default=256)
    ap.add_argument("--kernel", default="auto")
    args = ap.parse_args()

    from nsa_vibe_tpu.core.config import NSAConfig
    from nsa_vibe_tpu.core.nsa import init_nsa_params, nsa_prefill

    cfg = NSAConfig(dim=128, n_heads=4, n_kv_groups=2, d_k=32, d_v=32,
                    l=16, d=8, l_sel=32, n_sel=8, w=64, kernel=args.kernel)
    params = init_nsa_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, args.S, cfg.dim))

    def loss(p, x):
        out, _ = nsa_prefill(p, x, cfg)
        return jnp.mean(out * out)

    step = jax.jit(jax.value_and_grad(loss))
    step(params, x)  # compile outside the trace

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        for _ in range(args.steps):
            val, _ = step(params, x)
        _ = float(val)

    traces = glob.glob(os.path.join(args.out, "**", "*.pb*"), recursive=True) + \
        glob.glob(os.path.join(args.out, "**", "*.json.gz"), recursive=True)
    ok = len(traces) > 0
    print(json.dumps({"trace_dir": args.out, "trace_files": len(traces), "ok": ok}))
    if not ok:
        raise SystemExit("no trace files produced")


if __name__ == "__main__":
    main()
