"""Training throughput benchmark: m7c 125M-class model, tokens/sec/chip.

Reference baselines (BASELINE.md, A100 80GB):
  9,200 toks/s  (S=2048, bs=1, grad-ckpt on)
  16,000 toks/s (bs=1, grad-ckpt off)
  23,100 toks/s (bs=16, optimal)

Run: python bench/bench_train.py [--batch 8] [--seq 2048] [--steps 8] [--remat]
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
    from nsa_vibe_tpu.ops.tuning import apply_tpu_env
    apply_tpu_env()   # scoped-vmem budget flag; before backend init
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--groups", type=int, default=2)
    ap.add_argument("--remat", nargs="?", const=True, default=False,
                help="full block remat; --remat mlp = MLP-only")
    ap.add_argument("--kernel", default="auto")
    ap.add_argument("--no-stats", dest="no_stats", action="store_true",
                    help="disable per-step gate/selection stats collection")
    ap.add_argument("--dp", type=int, default=0, help="data-parallel size (multi-chip)")
    ap.add_argument("--pp", type=int, default=1,
                    help="pipeline-parallel stages (multi-chip)")
    ap.add_argument("--chained", action="store_true",
                    help="scan --steps train steps inside ONE jit and time "
                         "whole-chain dispatches (min over --reps): the "
                         "per-step number is device time, immune to tunnel "
                         "weather (the dispatched-mode number inflated 2.5x "
                         "on a congested tunnel at identical device speed)")
    ap.add_argument("--reps", type=int, default=3,
                    help="timed repetitions in --chained mode (min wins)")
    ap.add_argument("--varlen", action="store_true",
                    help="packed-document (varlen) training batch: "
                         "synthetic docs packed l_sel-aligned, doc-masked "
                         "attention, loss-masked padding (ops.varlen)")
    args = ap.parse_args()

    from nsa_vibe_tpu.core.config import ModelConfig, NSAConfig, TrainConfig
    from nsa_vibe_tpu.models.tinylm import init_model_params
    from nsa_vibe_tpu.parallel.train_step import build_state_and_step

    nsa = NSAConfig(dim=args.dim, n_heads=args.heads, n_kv_groups=args.groups,
                    d_k=64, d_v=64,
                    l=32, d=16, l_sel=64, n_sel=16, w=512, kernel=args.kernel)
    mcfg = ModelConfig(vocab_size=256, n_layers=args.layers, nsa=nsa,
                       dtype="bfloat16", remat=args.remat)
    tcfg = TrainConfig(steps=args.steps, batch_size=args.batch, seq_len=args.seq,
                       gate_stats=not args.no_stats, dp=args.dp, pp=args.pp,
                       varlen=args.varlen)

    mesh = None
    if args.pp > 1 or args.dp >= 1:
        # an EXPLICIT --dp 1 builds a real 1-member mesh and runs the
        # shard_map train step with the tuned Pallas kernels — the
        # "sharded graph x real kernels" check the 8-virtual-CPU tests
        # structurally can't cover (VERDICT r4 item 8)
        from nsa_vibe_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(dp=args.dp or None, pp=args.pp)

    params = init_model_params(jax.random.PRNGKey(0), mcfg, jnp.bfloat16)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    step_fn, state, batch_shard = build_state_and_step(params, mcfg, tcfg, mesh=mesh)

    rng = np.random.default_rng(0)
    if args.varlen:
        from nsa_vibe_tpu.ops.varlen import make_varlen_batches

        toks, ds, lm = next(make_varlen_batches(
            "synthetic", args.seq, args.batch, align=nsa.l_sel, seed=0))
        batch = (jnp.asarray(toks, jnp.int32)[None],
                 jnp.asarray(ds, jnp.int32)[None],
                 jnp.asarray(lm, jnp.float32)[None])
    else:
        batch = jnp.asarray(
            rng.integers(0, 256, (1, args.batch, args.seq + 1)), jnp.int32)
    if batch_shard is not None:
        batch = jax.device_put(batch, batch_shard)

    # NOTE: on the remote (axon) platform block_until_ready can return
    # before execution completes — force a scalar host fetch to time
    # honestly.
    if args.chained:
        # One jitted lax.scan over --steps steps: the fixed per-dispatch
        # tunnel cost (~30 ms) is paid once per CHAIN, not once per step
        # (<1% bias at m7c step times), so variants stay comparable when
        # the tunnel is congested. No donation: every rep restarts from
        # the same initial state so reps are identical work.
        import functools

        from jax import lax

        from nsa_vibe_tpu.parallel.train_step import make_train_step

        raw_step = make_train_step(mcfg, tcfg, mesh)

        @functools.partial(jax.jit, static_argnames=("n",))
        def run_chain(s0, n):
            def body(s, _):
                s, m = raw_step(s, batch)
                return s, m["loss"]
            s, losses = lax.scan(body, s0, None, length=n)
            return losses

        t0 = time.perf_counter()
        losses = run_chain(state, args.steps)
        _ = float(losses[-1])  # forces the chain (see sync note above)
        compile_s = time.perf_counter() - t0
        metrics = {"loss": losses[-1]}
        best = float("inf")
        for _rep in range(args.reps):
            t0 = time.perf_counter()
            losses = run_chain(state, args.steps)
            _ = float(losses[-1])
            best = min(best, time.perf_counter() - t0)
        dt = best / args.steps
    else:
        t0 = time.perf_counter()
        state, metrics = step_fn(state, batch)
        _ = float(metrics["loss"])
        compile_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, metrics = step_fn(state, batch)
        # full-chain sync (ravel: stacked pp leaves are >2-D)
        _ = float(jnp.ravel(jax.tree_util.tree_leaves(state.params)[0])[0])
        dt = (time.perf_counter() - t0) / args.steps
    n_chips = mesh.size if mesh is not None else 1
    # report PER-CHIP throughput so multi-chip runs stay comparable to
    # the single-chip baseline (and to ab_queue records)
    toks = args.batch * args.seq / dt / n_chips

    from nsa_vibe_tpu.utils.flops import mfu, train_step_flops

    fl = train_step_flops(mcfg, args.batch, args.seq)
    if args.remat:   # full-block remat recomputes the fwd in the bwd
        fl["total"] += fl["fwd"] if args.remat is True else 0
    eff = mfu(fl["total"] / n_chips, dt)

    print(json.dumps({
        "metric": "train_toks_per_s",
        "value": round(toks, 1),
        "unit": "tokens/s/chip",
        "chips": n_chips,
        "params_m": round(n_params / 1e6, 1),
        "batch": args.batch, "seq": args.seq, "remat": args.remat,
        "varlen": args.varlen,
        "kernel": args.kernel,
        "mode": "chained" if args.chained else "dispatched",
        "step_ms": round(dt * 1e3, 2),
        # BASELINE.md north star: selected-nnz/s — selection-branch
        # key-value pairs attended per second (n_sel*l_sel per token row
        # per layer, the NSA sparse-read bound)
        "selected_nnz_per_s": round(toks * nsa.n_sel * nsa.l_sel * args.layers, 0),
        # MFU (utils/flops.py conventions: 3x-fwd matmuls, exact per-
        # position key reads per branch, v5e bf16 peak 197 TF/s)
        "model_tflops_per_step": round(fl["total"] / 1e12, 2),
        "achieved_tflops": eff["achieved_tflops"],
        "mfu_pct": eff["mfu_pct"],
        "compile_s": round(compile_s, 1),
        "loss": round(float(metrics["loss"]), 4),
        "vs_baseline": round(toks / 23100.0, 3),
    }))


if __name__ == "__main__":
    main()
