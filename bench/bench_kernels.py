"""Per-kernel micro-benchmark suite.

Covers the reference's component micro-benches in one CLI:
bench_pcmp.py (selection scoring), bench_gate.py (GateMLP combine),
bench_masked.py / bench_fa2.py (cmp+win branch kernels vs the jnp
reference path), bench_sel_triton.py / bench_sel_cuda.py (selection
attention kernel) — reference bench/*.py.

Each component is timed the TPU-honest way: N iterations chained inside
ONE jit via lax.scan with a true data dependency, then a scalar host
fetch (per-dispatch tunnel overhead is ~0.5-2 ms and block_until_ready
can return early on the axon platform; see CLAUDE.md).

Run (TPU):  python bench/bench_kernels.py [--S 2048] [--csv out.csv]
Run (CPU):  JAX_PLATFORMS=cpu PYTHONPATH= python bench/bench_kernels.py \
                --kernel reference --S 256 --iters 2
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import csv
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


_PEDESTAL: dict = {}


def _chain_raw(fn, q0, iters: int, trials: int) -> float:
    @jax.jit
    def run(q):
        def body(q, _):
            out = fn(q)
            return (q + jnp.sum(out.astype(jnp.float32)) * 1e-30).astype(q0.dtype), None

        return jax.lax.scan(body, q, None, length=iters)[0]

    r = run(q0)
    _ = float(r.reshape(-1)[0].astype(jnp.float32))   # warm + force
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        r = run(q0)
        _ = float(r.reshape(-1)[0].astype(jnp.float32))
        best = min(best, time.perf_counter() - t0)
    return best


def chain_bench(fn, q0, iters: int, trials: int = 3) -> float:
    """ms per iteration, pedestal-corrected.

    The scalar host fetch that forces completion costs a fixed ~25-30 ms
    through the axon tunnel regardless of iters; without subtracting it,
    every measurement carries a +pedestal/iters bias (~3.5 ms at iters=8)
    that drowns real kernel deltas. We measure an identity-body chain at
    the same iters once and subtract."""
    key = (q0.shape, q0.dtype.name, iters)
    if key not in _PEDESTAL:
        _PEDESTAL[key] = _chain_raw(lambda q: q, q0, iters, trials)
    raw = _chain_raw(fn, q0, iters, trials)
    return max(raw - _PEDESTAL[key], 0.0) / iters * 1e3


def main() -> None:
    from nsa_vibe_tpu.ops.tuning import apply_tpu_env
    apply_tpu_env()   # scoped-vmem budget flag; before backend init
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=16)
    ap.add_argument("--S", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--kernel", default="auto", help="auto|pallas|reference")
    ap.add_argument("--compare-reference", action="store_true",
                    help="also time the jnp reference path per branch")
    ap.add_argument("--grad", action="store_true",
                    help="also time fwd+bwd (value_and_grad) per branch")
    ap.add_argument("--csv", default=None)
    args = ap.parse_args()

    from nsa_vibe_tpu.core.config import NSAConfig
    from nsa_vibe_tpu.core.gate import gate_probs, init_gate_params
    from nsa_vibe_tpu.ops import attention as attn
    from nsa_vibe_tpu.ops.block_index import build_block_meta, num_cmp_blocks
    from nsa_vibe_tpu.ops.selection import select_topn_blocks, selection_scores

    cfg = NSAConfig(dim=768, n_heads=12, n_kv_groups=2, d_k=64, d_v=64)
    B, S = args.B, args.S
    G, h, Dk, Dv = cfg.n_kv_groups, cfg.h_per_group, cfg.d_k, cfg.d_v
    dt = jnp.dtype(args.dtype)
    scale = 1.0 / float(np.sqrt(Dk))
    key = jax.random.PRNGKey(0)

    meta = build_block_meta(S, cfg.l, cfg.d, cfg.l_sel, cfg.n_sel, cfg.w)
    S_cmp = int(num_cmp_blocks(S, cfg.l, cfg.d))
    t_pos = jnp.arange(S, dtype=jnp.int32)
    num_cmp_t = jnp.minimum(
        jnp.asarray(num_cmp_blocks(np.arange(1, S + 1), cfg.l, cfg.d), jnp.int32), S_cmp)

    Q = jax.random.normal(key, (B, S, G, h, Dk), dt)
    K = jax.random.normal(key, (B, G, S, Dk), dt)
    V = jax.random.normal(key, (B, G, S, Dv), dt)
    Kc = jax.random.normal(key, (B, G, S_cmp, Dk), dt)
    Vc = jax.random.normal(key, (B, G, S_cmp, Dv), dt)
    M = jnp.asarray(meta.M_csl[:S_cmp])
    sel_idx = select_topn_blocks(
        jax.random.uniform(key, (B, S, G, meta.S_sel), jnp.float32),
        cfg.n_sel, t_pos, cfg.l_sel)
    gp = init_gate_params(key, Dk, dtype=dt)

    rows = []

    def record(name: str, ms: float, flops: float = 0.0):
        gflops = flops / (ms * 1e-3) / 1e9 if ms > 0 and flops else 0.0
        rows.append({"component": name, "ms": round(ms, 4),
                     "gflops": round(gflops, 1)})
        print(f"{name:28s} {ms:9.4f} ms" + (f"  {gflops:8.1f} GFLOP/s" if flops else ""),
              flush=True)

    kern = args.kernel
    # --- branch kernels (prefill shapes) ---
    win_flops = 4.0 * B * G * h * S * min(cfg.w, S) * Dk     # ~2 matmuls
    record("win.attention", chain_bench(
        lambda q: attn.sliding_window_attention(q, K, V, t_pos, cfg.w, scale, kernel=kern),
        Q, args.iters), win_flops)
    cmp_flops = 4.0 * B * G * h * S * (S_cmp / 2) * Dk
    record("cmp.attention", chain_bench(
        lambda q: attn.compressed_attention(q, Kc, Vc, num_cmp_t, cfg.l, cfg.d, scale,
                                            kernel=kern),
        Q, args.iters), cmp_flops)
    sel_flops = 4.0 * B * G * h * S * cfg.n_sel * cfg.l_sel * Dk
    record("sel.attention", chain_bench(
        lambda q: attn.selection_attention(q, K, V, sel_idx, t_pos, cfg.l_sel, scale,
                                           kernel=kern),
        Q, args.iters), sel_flops)

    # --- selection scoring (Eq. 8-12) ---
    score_flops = 2.0 * B * G * h * S * S_cmp * Dk
    record("scorer.jnp(eq8-12)", chain_bench(
        lambda q: select_topn_blocks(
            selection_scores(q, Kc, M, scale, num_cmp_t), cfg.n_sel, t_pos, cfg.l_sel
        ).astype(jnp.float32),
        Q, args.iters), score_flops)
    impl, interpret = attn.resolve_kernel(kern)
    if impl == "pallas":
        from nsa_vibe_tpu.ops.pallas.scorer import nsa_select_and_cmp_pallas

        def fused(q):
            sel, O, _ = nsa_select_and_cmp_pallas(
                q, Kc, Vc, M, scale=scale, l=cfg.l, d=cfg.d, l_sel=cfg.l_sel,
                n_top=cfg.n_sel, interpret=interpret)
            return O
        record("scorer.fused+cmp(pallas)", chain_bench(fused, Q, args.iters),
               score_flops + cmp_flops)

    # --- gate MLP + combine ---
    O3 = jax.random.normal(key, (3, B, S, G, h, Dv), dt)

    def gate_combine(q):
        g = gate_probs(gp, q.mean(axis=3))                 # [B,S,G,3]
        out = jnp.einsum("kbsghv,bsgk->bsghv", O3, g.astype(O3.dtype))
        return out
    record("gate.mlp+combine", chain_bench(gate_combine, Q, args.iters))

    if args.grad:
        def g(fn):
            def wrapped(q):
                def loss(qq, kk, vv):
                    return jnp.sum(fn(qq, kk, vv).astype(jnp.float32) ** 2)
                dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, K, V)
                return dq + (jnp.sum(dk.astype(jnp.float32)) + jnp.sum(dv.astype(jnp.float32))).astype(dq.dtype) * 1e-30
            return wrapped

        record("win.fwd+bwd", chain_bench(g(
            lambda q, k, v: attn.sliding_window_attention(q, k, v, t_pos, cfg.w,
                                                          scale, kernel=kern)),
            Q, args.iters), 3 * win_flops)
        record("sel.fwd+bwd", chain_bench(g(
            lambda q, k, v: attn.selection_attention(q, k, v, sel_idx, t_pos,
                                                     cfg.l_sel, scale, kernel=kern)),
            Q, args.iters), 3 * sel_flops)

        def gc(q):
            def loss(qq, kk, vv):
                return jnp.sum(attn.compressed_attention(
                    qq, kk, vv, num_cmp_t, cfg.l, cfg.d, scale,
                    kernel=kern).astype(jnp.float32) ** 2)
            dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, Kc, Vc)
            return dq + (jnp.sum(dk.astype(jnp.float32)) + jnp.sum(dv.astype(jnp.float32))).astype(dq.dtype) * 1e-30
        record("cmp.fwd+bwd", chain_bench(gc, Q, args.iters), 3 * cmp_flops)

    if args.compare_reference and kern != "reference":
        record("win.attention(ref)", chain_bench(
            lambda q: attn.sliding_window_attention(q, K, V, t_pos, cfg.w, scale,
                                                    kernel="reference"),
            Q, args.iters), win_flops)
        record("sel.attention(ref)", chain_bench(
            lambda q: attn.selection_attention(q, K, V, sel_idx, t_pos, cfg.l_sel,
                                               scale, kernel="reference"),
            Q, args.iters), sel_flops)

    if args.csv:
        os.makedirs(os.path.dirname(args.csv) or ".", exist_ok=True)
        with open(args.csv, "w", newline="") as f:
            wtr = csv.DictWriter(f, fieldnames=["component", "ms", "gflops"])
            wtr.writeheader()
            wtr.writerows(rows)
    print(json.dumps({"B": B, "S": S, "dtype": args.dtype, "kernel": kern,
                      "platform": jax.devices()[0].platform, "rows": rows}))


if __name__ == "__main__":
    main()
