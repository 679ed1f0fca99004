"""North-star decode benchmark: per-step latency + exact read accounting.

Reference contract (bench/bench_decode.py:60-266): for each context length
S in a sweep, prefill S tokens, then time single-token decode steps
(warmup discarded); re-run with each branch's gate forced to measure
per-branch latency; write a CSV with ms_total/ms_cmp/ms_sel/ms_win and
actual-vs-expected memory reads, where
    expected(S) = num_cmp(S) + n*l' + min(w, S)          (bench_decode.py:36-38)

TPU notes: the whole decode step is one jitted XLA program, so forcing
the gate does not remove work and the full-step time barely moves.
--branches therefore times each branch's attention computation in TRUE
ISOLATION (its own chained jitted program over the prefilled cache, like
the reference's per-branch isolation, bench_decode.py:149-214), with
the per-dispatch pedestal subtracted via an identity chain.

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
    """num_cmp(S) + n_eff*l' + min(w, S) (reference bench_decode.py:36-38;
    n_eff = true sel_idx width incl. forced slots)."""
    from nsa_vibe_tpu.ops.selection import effective_sel_blocks

    n_eff = effective_sel_blocks(cfg.n_sel, cfg.force_init, cfg.force_local)
    return int(num_cmp_blocks(S, cfg.l, cfg.d)) + n_eff * cfg.l_sel + min(cfg.w, S)


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
    mcfg = ModelConfig(vocab_size=256, n_layers=args.layers, nsa=cfg, dtype=args.dtype)
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


def serve_ragged_bench(args) -> None:
    """Ragged-batch serving: different-length prompts in one program
    (models/tinylm.py::generate_ragged — decode-rate ingestion, each row
    samples from the tick its own prompt ends). Reported toks/s counts
    only sampled tokens; ingestion ticks are the continuous-batching
    cost this mode exists to measure."""
    import numpy as np

    from nsa_vibe_tpu.core.config import ModelConfig
    from nsa_vibe_tpu.models.tinylm import generate_ragged, init_model_params

    n_new = 128
    cfg = NSAConfig(dim=args.dim, n_heads=args.heads, n_kv_groups=args.groups,
                    d_k=64, d_v=64, l=32, d=16, l_sel=64, n_sel=16, w=512,
                    kernel=args.kernel)
    mcfg = ModelConfig(vocab_size=256, n_layers=args.layers, nsa=cfg, dtype=args.dtype)
    params = init_model_params(jax.random.PRNGKey(0), mcfg, jnp.dtype(args.dtype))
    rng = np.random.default_rng(0)
    lens = rng.integers(256, 1025, args.batch)            # mixed prompt lengths
    L = int(lens.max())
    prompts = np.zeros((args.batch, L), np.int32)
    for i, ln in enumerate(lens):
        prompts[i, :ln] = rng.integers(0, 256, ln)
    prompts = jnp.asarray(prompts)
    lens_j = jnp.asarray(lens, jnp.int32)

    out = generate_ragged(params, prompts, lens_j, n_new, mcfg)  # compile+warm
    _ = int(out[0, -1])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = generate_ragged(params, prompts, lens_j, n_new, mcfg)
        _ = int(out[0, -1])
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({
        "mode": "serve-ragged", "batch": args.batch,
        "prompt_min": int(lens.min()), "prompt_max": L, "new": n_new,
        "layers": mcfg.n_layers, "s_total": round(best, 4),
        "sampled_toks_per_s": round(args.batch * n_new / best, 1),
        "ticks": L + n_new - 1,
    }))


def serve_cb_bench(args) -> None:
    """Steady-state CONTINUOUS-BATCHING throughput: every batch row sits
    at its own depth (per-row t), chained jitted ragged decode steps
    through the 4-layer model (models/tinylm.py::model_decode_step_ragged
    — the step `cache.admit_row` joins new requests into). This is the
    serving configuration the r3 batched ragged step (Pallas per-row-t
    gather kernel) exists for; the r2 vmapped reference-path step left
    the decode kernels idle exactly here."""
    import numpy as np

    from nsa_vibe_tpu.core.cache import ragged_cache
    from nsa_vibe_tpu.core.config import ModelConfig
    from nsa_vibe_tpu.models.tinylm import (
        init_model_params,
        model_decode_step_ragged,
        model_prefill_with_caches,
    )

    iters = 128
    cfg = NSAConfig(dim=args.dim, n_heads=args.heads, n_kv_groups=args.groups,
                    d_k=64, d_v=64, l=32, d=16, l_sel=64, n_sel=16, w=512,
                    kernel=args.kernel)
    mcfg = ModelConfig(vocab_size=256, n_layers=args.layers, nsa=cfg, dtype=args.dtype)
    params = init_model_params(jax.random.PRNGKey(0), mcfg, jnp.dtype(args.dtype))
    rng = np.random.default_rng(0)
    B = args.batch
    S0 = 1024
    prompt = jnp.asarray(rng.integers(0, 256, (B, S0)), jnp.int32)
    _, caches = jax.jit(lambda p, t: model_prefill_with_caches(
        p, t, mcfg, S0 + iters * 4 + 8))(params, prompt)
    # stagger rows to genuinely ragged depths (prefix of each row's cache
    # is valid for any t <= S0)
    depths = jnp.asarray(rng.integers(S0 // 2, S0, B), jnp.int32)
    caches = [ragged_cache(c)._replace(t=depths) for c in caches]

    @jax.jit
    def run(params, tok0, caches):
        def body(carry, _):
            tok, caches = carry
            logits, caches = model_decode_step_ragged(params, tok, caches, mcfg)
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(tok.dtype)[:, None]
            return (nxt, caches), logits[0, -1, 0]
        (_, caches), probe = jax.lax.scan(
            body, (prompt[:, :1], caches), None, length=iters)
        return caches, probe[-1]

    caches2, probe = run(params, prompt[:, :1], caches)   # compile + warm
    _ = float(probe)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _, probe = run(params, prompt[:, :1], caches)
        _ = float(probe)
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({
        "mode": "serve-cb", "batch": B, "depth_min": int(depths.min()),
        "depth_max": int(depths.max()), "layers": mcfg.n_layers,
        "iters": iters, "ms_per_step": round(best / iters * 1e3, 4),
        "toks_per_s": round(B * iters / best, 1),
    }))


def time_branches_isolated(params, cfg: NSAConfig, x_ctx, iters: int = 256):
    """Per-branch decode attention latency, each branch as its own chained
    jitted program over the prefilled cache (true isolation)."""
    import numpy as np

    from nsa_vibe_tpu.core.decode import (
        _gathered_selection_attention,
        _masked_single_query_attention,
    )
    from nsa_vibe_tpu.core.cache import cmp_capacity
    from nsa_vibe_tpu.ops.attention import resolve_kernel
    from nsa_vibe_tpu.ops.selection import select_topn_blocks, selection_scores
    from nsa_vibe_tpu.ops.block_index import build_block_meta

    B, S = x_ctx.shape[0], x_ctx.shape[1]
    _, aux = jax.jit(lambda p, x: nsa_prefill(p, x, cfg))(params, x_ctx)
    cache = cache_from_prefill(cfg, aux, capacity=S + 8)
    scale = 1.0 / float(np.sqrt(cfg.d_k))
    G, h = cfg.n_kv_groups, cfg.h_per_group
    t = cache.t - 1
    C = cache.capacity
    C_cmp = cmp_capacity(C, cfg.l, cfg.d)
    Q0 = jax.random.normal(jax.random.PRNGKey(3), (B, G, h, cfg.d_k), x_ctx.dtype)
    num_cmp = jnp.where(t + 1 >= cfg.l, (t + 1 - cfg.l) // cfg.d + 1, 0).astype(jnp.int32)
    meta = build_block_meta(C, cfg.l, cfg.d, cfg.l_sel, cfg.n_sel, cfg.w)
    M = jnp.asarray(meta.M_csl[:C_cmp, : C // cfg.l_sel + (1 if C % cfg.l_sel else 0)])
    p_grp = selection_scores(Q0[:, None], cache.k_cmp, M, scale, num_cmp[None])
    sel_idx = select_topn_blocks(p_grp, cfg.n_sel, t[None], cfg.l_sel,
                                 cfg.force_init, cfg.force_local)
    impl, interpret = resolve_kernel(cfg.kernel)
    use_kernel = impl == "pallas" and not interpret

    win_valid = (jnp.arange(cfg.w, dtype=jnp.int32) <= t) | (t >= cfg.w)
    cmp_valid = jnp.arange(C_cmp, dtype=jnp.int32) < num_cmp

    def f_cmp(q):
        return _masked_single_query_attention(q, cache.k_cmp, cache.v_cmp,
                                              cmp_valid, scale)

    def f_win(q):
        return _masked_single_query_attention(q, cache.k_win, cache.v_win,
                                              win_valid, scale)

    def f_sel(q):
        out, _ = _gathered_selection_attention(
            q, cache.k_sel, cache.v_sel, sel_idx[:, 0], t, cfg.l_sel, scale,
            use_kernel=use_kernel)
        return out

    def f_score(q):
        pg = selection_scores(q[:, None], cache.k_cmp, M, scale, num_cmp[None])
        return select_topn_blocks(pg, cfg.n_sel, t[None], cfg.l_sel,
                                  cfg.force_init, cfg.force_local).astype(x_ctx.dtype)

    def chain(fn):
        @jax.jit
        def run(q):
            def body(q, _):
                out = fn(q)
                return (q + jnp.sum(out.astype(jnp.float32)) * 1e-30
                        ).astype(q.dtype), None
            return jax.lax.scan(body, q, None, length=iters)[0]

        r = run(Q0); _ = float(r.reshape(-1)[0].astype(jnp.float32))
        best = float("inf")
        for _trial in range(3):
            t0 = time.perf_counter()
            r = run(Q0); _ = float(r.reshape(-1)[0].astype(jnp.float32))
            best = min(best, time.perf_counter() - t0)
        return best / iters * 1e3

    ped = chain(lambda q: q)
    return {name: round(max(chain(fn) - ped, 0.0), 4)
            for name, fn in (("cmp", f_cmp), ("sel", f_sel), ("win", f_win),
                             ("score", f_score))}


def main() -> None:
    from nsa_vibe_tpu.ops.tuning import apply_tpu_env
    apply_tpu_env()   # scoped-vmem budget flag; before backend init
    ap = argparse.ArgumentParser()
    ap.add_argument("--S", default="512,1024,2048,4096")
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--warmup", type=int, default=8)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--groups", type=int, default=2)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--layers", type=int, default=4,
                    help="serve-model depth (--serve*): 4 matches the r3/r4 "
                         "history; 12 + --dim 768 --heads 12 is the m7c "
                         "flagship (VERDICT r4 item 5)")
    ap.add_argument("--kernel", default="auto")
    ap.add_argument("--csv", default=None)
    ap.add_argument("--branches", action="store_true",
                    help="also time cmp/sel/win-forced variants")
    ap.add_argument("--serve", action="store_true",
                    help="model-level single-stream serving: prefill + "
                         "generate_scan (whole generation in ONE program; "
                         "amortizes per-token dispatch)")
    ap.add_argument("--serve-ragged", dest="serve_ragged", action="store_true",
                    help="ragged-batch serving: different-length prompts in "
                         "one program (generate_ragged)")
    ap.add_argument("--serve-cb", dest="serve_cb", action="store_true",
                    help="steady-state continuous batching: chained ragged "
                         "decode steps with per-row depths "
                         "(model_decode_step_ragged)")
    args = ap.parse_args()

    if args.serve:
        serve_bench(args)
        return
    if args.serve_ragged:
        serve_ragged_bench(args)
        return
    if args.serve_cb:
        serve_cb_bench(args)
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
            branch_ms = time_branches_isolated(params, cfg, x_ctx)
        S_end = S + args.iters + args.warmup
        row = {
            "S": S,
            "batch": args.batch,
            "toks_per_s": round(args.batch / (ms_total / 1e3), 1),
            "ms_total": round(ms_total, 4),
            "ms_cmp": round(branch_ms["cmp"], 4) if "cmp" in branch_ms else None,
            "ms_sel": round(branch_ms["sel"], 4) if "sel" in branch_ms else None,
            "ms_win": round(branch_ms["win"], 4) if "win" in branch_ms else None,
            # decode-only reads at the last timed step: predicted = the
            # budget formula; actual = counted from the masks the step
            # really applied (independent columns so an over-read
            # regression the formula can't see shows up as divergence —
            # reference kv_cache.py:51-65 kept the same split)
            "reads_pred": int(info.reads_pred) if info is not None else -1,
            "reads_actual": (round(float(info.reads_actual), 1)
                             if info is not None else -1),
            "reads_expected": expected_reads(S_end, cfg),
            "reads_cmp": int(info.reads_cmp) if info is not None else -1,
            "reads_sel": int(info.reads_sel) if info is not None else -1,
            "reads_win": int(info.reads_win) if info is not None else -1,
            "reads_actual_cmp": (int(info.reads_actual_cmp)
                                 if info is not None else -1),
            "reads_actual_sel": (round(float(info.reads_actual_sel), 1)
                                 if info is not None else -1),
            "reads_actual_win": (int(info.reads_actual_win)
                                 if info is not None else -1),
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
