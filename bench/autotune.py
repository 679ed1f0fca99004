"""Kernel block-size autotuner: sweep -> configs/kernel_tuning.json.

Reference analogue: bench/threshold_optimizer.py + apply_fa2_thresholds.py
(bench-derived thresholds written back into configs). Here the tunables
are Pallas grid/tile parameters; timing uses chained in-jit iteration
(per-dispatch tunnel overhead otherwise dominates — see bench.py).

Run on the target chip:  python bench/autotune.py [--write]
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


_PEDESTAL: dict = {}


def _chain_raw(fn, q0, iters, trials=3):
    @jax.jit
    def run(q):
        def body(q, _):
            out = fn(q)
            return (q + jnp.sum(out.astype(jnp.float32)) * 1e-30).astype(q0.dtype), None
        return jax.lax.scan(body, q, None, length=iters)[0]

    r = run(q0)
    _ = float(r.reshape(-1)[0].astype(jnp.float32))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        r = run(q0)
        _ = float(r.reshape(-1)[0].astype(jnp.float32))
        best = min(best, time.perf_counter() - t0)
    return best


def chain_bench(fn, q0, iters=64):
    """ms/iter, pedestal-corrected: the forcing scalar fetch costs a fixed
    ~25-30 ms through the axon tunnel regardless of iters — subtract an
    identity-chain measurement so kernel deltas aren't drowned."""
    key = (q0.shape, q0.dtype.name, iters)
    if key not in _PEDESTAL:
        _PEDESTAL[key] = _chain_raw(lambda q: q, q0, iters)
    return max(_chain_raw(fn, q0, iters) - _PEDESTAL[key], 0.0) / iters * 1e3


def main() -> None:
    from nsa_vibe_tpu.ops.tuning import apply_tpu_env
    apply_tpu_env()   # scoped-vmem budget flag; before backend init
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=16)
    ap.add_argument("--S", type=int, default=2048)
    ap.add_argument("--write", action="store_true",
                    help="write winners to configs/kernel_tuning.json")
    ap.add_argument("--bwd", action="store_true",
                    help="also sweep the backward kernels' tile keys")
    args = ap.parse_args()

    from nsa_vibe_tpu.ops.block_index import num_cmp_blocks
    from nsa_vibe_tpu.ops.pallas.flash import flash_banded
    from nsa_vibe_tpu.ops.pallas.sel_flash import selection_flash_pallas
    from nsa_vibe_tpu.ops.selection import select_topn_blocks

    B, S, G, h, Dk = args.B, args.S, 2, 6, 64
    l, d, l_sel, n_sel, w = 32, 16, 64, 16, 512
    key = jax.random.PRNGKey(0)
    Q = jax.random.normal(key, (B, S, G, h, Dk), jnp.bfloat16)
    K = jax.random.normal(key, (B, G, S, Dk), jnp.bfloat16)
    V = jax.random.normal(key, (B, G, S, Dk), jnp.bfloat16)
    S_cmp = int(num_cmp_blocks(S, l, d))
    Kc = jax.random.normal(key, (B, G, S_cmp, Dk), jnp.bfloat16)
    Vc = jax.random.normal(key, (B, G, S_cmp, Dk), jnp.bfloat16)
    sel = select_topn_blocks(
        jax.random.uniform(key, (B, S, G, S // l_sel)), n_sel,
        jnp.arange(S, dtype=jnp.int32), l_sel)

    winners: dict = {}

    def sweep(name, grid, make):
        best = None
        for cfgv in grid:
            try:
                ms = chain_bench(make(cfgv), Q)
            except Exception as e:  # OOM / compile failure at this size
                print(f"  {name} {cfgv}: FAIL ({str(e)[:60]})")
                continue
            print(f"  {name} {cfgv}: {ms:.2f} ms")
            if best is None or ms < best[1]:
                best = (cfgv, ms)
        return best

    print("win (block_q, block_k):")
    b = sweep("win", [(bq, bk) for bq in (128, 256, 512) for bk in (256, 512, 1024)],
              lambda c: lambda q: flash_banded(q, K, V, mode="win", w=w,
                                               scale=0.125, block_q=c[0], block_k=c[1]))
    winners["win.block_q"], winners["win.block_k"] = b[0]
    # diagonal band-tiled win forward (the r4 e2e winner on v5e): sweep
    # its q-tile and emit win.fwd_diag=1 if it beats the axis-aligned
    # winner standalone. As always, confirm flips via the e2e queue —
    # standalone timings have inverted e2e outcomes before.
    from nsa_vibe_tpu.ops.pallas.flash_diag import flash_banded_diag
    print("win diag (block_q):")
    bd = sweep("win-diag", [(bq,) for bq in (64, 128, 256)],
               lambda c: lambda q: flash_banded_diag(q, K, V, w=w,
                                                     scale=0.125, block_q=c[0]))
    if bd is not None and bd[1] < b[1]:
        winners["win.fwd_diag"] = 1
        winners["win.diag_block_q"] = bd[0][0]
    print("cmp (block_q, block_k):")
    b = sweep("cmp", [(bq, bk) for bq in (128, 256, 512) for bk in (128, 256, 512)],
              lambda c: lambda q: flash_banded(q, Kc, Vc, mode="cmp", l=l, d=d,
                                               scale=0.125, block_q=c[0], block_k=c[1]))
    winners["cmp.block_q"], winners["cmp.block_k"] = b[0]
    print("sel (block_q, kv_batch):")
    b = sweep("sel", [(bq, kb) for bq in (128, 256) for kb in (4, 8, 16)],
              lambda c: lambda q: selection_flash_pallas(
                  q, K, V, sel, l_sel=l_sel, scale=0.125, block_q=c[0], kv_batch=c[1]))
    winners["sel.block_q"], winners["sel.kv_batch"] = b[0]

    if args.bwd:
        from nsa_vibe_tpu.ops.attention import _bwd_impl
        from nsa_vibe_tpu.ops.pallas.flash import flash_banded
        from nsa_vibe_tpu.ops.pallas.sel_flash import (
            selection_flash_bwd,
            selection_flash_bwd_onepass,
        )
        from nsa_vibe_tpu.ops.tuning import tuned

        flash_banded_bwd = _bwd_impl()          # sweep the ACTIVE impl
        sel_bwd = (selection_flash_bwd_onepass
                   if tuned("sel.bwd_onepass", tuned("bwd.onepass", 1))
                   else selection_flash_bwd)

        def bwd_fn(mode, kw, bq, bk):
            def run(q):
                O, lse = flash_banded(q, K if mode == "win" else Kc,
                                      V if mode == "win" else Vc,
                                      mode=mode, scale=0.125, return_lse=True, **kw)
                delta = jnp.zeros_like(lse)
                dq, dk, dv = flash_banded_bwd(
                    q, K if mode == "win" else Kc, V if mode == "win" else Vc,
                    O, lse, delta, mode=mode, scale=0.125,
                    block_q=bq, block_k=bk, **kw)
                return dq + (jnp.sum(dk.astype(jnp.float32))
                             + jnp.sum(dv.astype(jnp.float32))).astype(dq.dtype) * 1e-30
            return run

        print("win.bwd (block_q, block_k):")
        b = sweep("win.bwd", [(bq, bk) for bq in (128, 256) for bk in (256, 512)],
                  lambda c: bwd_fn("win", dict(w=w), c[0], c[1]))
        winners["win.bwd_block_q"], winners["win.bwd_block_k"] = b[0]
        print("cmp.bwd (block_q, block_k):")
        b = sweep("cmp.bwd", [(bq, bk) for bq in (128, 256) for bk in (128, 512)],
                  lambda c: bwd_fn("cmp", dict(l=l, d=d), c[0], c[1]))
        winners["cmp.bwd_block_q"], winners["cmp.bwd_block_k"] = b[0]

        from nsa_vibe_tpu.ops.pallas.flash import stats_rows

        def sel_bwd_fn(bq, kb):
            def run(q):
                O = selection_flash_pallas(q, K, V, sel, l_sel=l_sel, scale=0.125)
                z = jnp.zeros((B * 2, 1, stats_rows(args.S, 6)), jnp.float32)
                dq, dk, dv = sel_bwd(
                    q, K, V, sel, O, z + 1.0, z, l_sel=l_sel, scale=0.125,
                    block_q=bq, kv_batch=kb)
                return dq + (jnp.sum(dk.astype(jnp.float32))
                             + jnp.sum(dv.astype(jnp.float32))).astype(dq.dtype) * 1e-30
            return run

        print("sel.bwd (block_q, kv_batch):")
        b = sweep("sel.bwd", [(bq, kb) for bq in (128, 256) for kb in (4, 8)],
                  lambda c: sel_bwd_fn(c[0], c[1]))
        winners["sel.bwd_block_q"], winners["sel.bwd_kv_batch"] = b[0]

    print(json.dumps(winners, indent=2))
    if args.write:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "configs", "kernel_tuning.json")
        # read-modify-write: this sweep covers forward tiles only — keep the
        # checked-in bwd_* entries (dropping them reverts backward tiles to
        # the 128 defaults, ~-3.6% end-to-end)
        existing = {}
        try:
            with open(path) as f:
                existing = json.load(f)
        except (OSError, ValueError):
            pass
        existing.update(winners)
        with open(path, "w") as f:
            json.dump(existing, f, indent=2)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
