"""Sequential e2e A/B queue over kernel-tuning variants (real TPU).

A/B PERF DECISIONS ONLY VIA THE E2E TRAIN BENCH (see CLAUDE.md): each
variant writes a merged kernel_tuning.json to a temp file, points
NSA_KERNEL_TUNING at it, and runs bench/bench_train.py in a fresh
process (tuning is read once per process). Results append to
artifacts/ab_queue.jsonl and print as a table.

Run: python bench/run_ab_queue.py [--steps 8] [--only name1,name2]
     [--batch 16] [--seq 2048]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (name, overrides merged over configs/kernel_tuning.json)
VARIANTS = [
    # bit-identical baseline = r2-late state (validates the base-2 /
    # one-select-mask changes against the 57.4k @ loss 5.5535 record)
    ("flags-off", {"flash.scale_on_q": 0, "flash.fastpath": 0}),
    # defaults: scale_on_q=1 + bwd fastpath=1 (fwd fastpath is a
    # separate opt-in key — it VMEM-OOMs at the default fwd tiles)
    ("flags-on", {}),
    # fwd win tiles: 256-wide kv tiles make the middle band tile fully
    # live (enabling fwd fastpath) and cut dead lanes ~2x vs 1024
    ("fwd-wink256", {"win.block_k": 256}),
    # NB: fastpath_fwd is process-wide, so this also flips the cmp-mode
    # forward (cmp.block_k stays 512) — the delta vs fwd-wink256 mixes
    # win-fwd + cmp-fwd fastpath effects; add a cmp-tiles-pinned control
    # if per-branch attribution is ever needed.
    ("fwd-fastk256", {"win.block_k": 256, "flash.fastpath_fwd": 1}),
    # bwd win kv tiles: smaller tiles raise the fully-live pair fraction
    # (at w=512, bq=128: bk=512 -> 3/8 pairs fully live; bk=256 -> 3/6)
    ("bwd-wink256", {"win.bwd_block_k": 256}),
    # one fused [dim, H*Dk+3G*(Dk+Dv)] QKV projection matmul instead of
    # seven (saves 6 re-reads of the 50 MB x activation per layer fwd,
    # and 6 dx accumulation passes bwd); per-column-identical numerics
    ("proj-fused", {"proj.fused": 1}),
    # sel fwd kv_batch: more parallel scalar-prefetched DMAs + a wider
    # [rows, KB*l_sel] matmul per grid step (KB=16 at f32 logits OOMs;
    # 12 -> 768-lane logits should fit at bq=256)
    ("sel-kb12", {"sel.kv_batch": 12}),
    # cmp fwd kv tiles: prefix-mode tiles are mostly fully-live, so wider
    # tiles amortize per-step overhead without masking cost
    ("cmp-k1024", {"cmp.block_k": 1024}),
    # fused scorer tiles: wider q-tiles amortize the per-step top-n
    # selection loop (VMEM-gated by scorer_fits_vmem)
    ("scorer-q256", {"scorer.block_q": 256}),
]

# r3 backward-tile sweep (run with --only, AFTER ab_select --write merged
# the phase-1 winner into kernel_tuning.json so these stack on it): the
# backward is 2/3 of the step and its q-tiles were pinned to 128 by VMEM;
# the onepass fastpath now VMEM-guards itself (auto-off when the dual-body
# logits exceed 6 MB), so 256-row tiles are safely sweepable.
VARIANTS += [
    ("bwd-oneq256", {"win.bwd_block_q": 256}),          # fastpath auto-off
    ("bwd-oneq256k256", {"win.bwd_block_q": 256,
                         "win.bwd_block_k": 256}),      # fastpath stays on
    ("sel-bwdq256", {"sel.bwd_block_q": 256}),
    ("sel-bwdq256-win256", {"sel.bwd_block_q": 256,
                            "win.bwd_block_q": 256,
                            "win.bwd_block_k": 256}),
]

# r3 phase-2 outcomes (artifacts/published/ab_queue_r3.jsonl, on device):
# every bwd-256 tile variant regressed or VMEM-OOM'd (58.4k vs 59.5k),
# closing the VMEM-tile axis; a per-row block-membership BITMASK rebuild
# of the sel masks (built natively at [rows, KB*l_sel], no head-broadcast
# relayout) measured 58.3k vs 60.1k flags-on — the extra full-row-width
# VPU work costs more than the relayout it removes, so the code was
# REMOVED (see KERNELS.md dead ends). sel-bwdq64 measured 60.15k vs
# 60.08k — noise-level, default stays 128. The static OOB-zeroing skips
# landed unconditionally (+0.9% e2e, bit-identical).
# r4 VMEM-engineering sweep (VERDICT #2) OUTCOME: ksplit sub-tiling of
# the one-pass backward bodies was measured and REMOVED — bq256+ks2
# still OOM'd (20.2M win / 22.8M sel: Mosaic keeps unrolled
# sub-iterations' temporaries live) and the ks2-ctl isolating control
# cost −7% (55.8k vs 59.9k). artifacts/published/ab_queue_r4.jsonl;
# KERNELS.md dead ends. The variants were deleted with the code.
VARIANTS += [
    # isolating pair for VERDICT #10: bwd fastpath on (default) vs off at
    # current tiles — settles whether the -0.4%/noise r2 measurement
    # justifies the ON default
    ("bwdfast-off", {"flash.fastpath": 0}),
    # diagonal band tiling for the win forward (flash_diag.py): exact
    # band fetch via 128-wide operands + single-pass softmax (~86% live
    # lanes vs ~35% axis-aligned) — VERDICT #8's "design, not a flag"
    ("fwd-diag", {"win.fwd_diag": 1}),
    ("fwd-diagq128", {"win.fwd_diag": 1, "win.diag_block_q": 128}),
    ("fwd-diagq64", {"win.fwd_diag": 1, "win.diag_block_q": 64}),
    # diagonal win BACKWARD (flash_banded_bwd_diag): q-major exact band
    # fetch, dQ written once, dK/dV via scatter-added strips — replaces
    # the kv-major one-pass's ring write-through + dual fastpath body.
    # Runs on top of the merged fwd-diag tuning.
    ("bwd-diag", {"win.bwd_diag": 1}),
    ("bwd-diagq256", {"win.bwd_diag": 1, "win.bwd_diag_block_q": 256}),
]

VARIANTS += [
    ("sel-bwdq64", {"sel.bwd_block_q": 64}),
    # sel fwd q-tiles: the per-tile selection UNION is what the kernel
    # computes; at bq=256 late tiles union ~all J blocks (max dead
    # lanes). Smaller tiles tighten the union (the compaction skips
    # more) at the cost of more grid steps.
    ("sel-fwdq128", {"sel.block_q": 128}),
    ("sel-fwdq64", {"sel.block_q": 64}),
    # fwd win kv tile midpoint (queue only ever e2e'd 256 and 1024)
    ("fwd-wink512", {"win.block_k": 512}),
    # sel bwd kv_batch midpoint: KB=10 fits the one-pass VMEM estimate at
    # bq128 (12.7 MB < 14); KB=12 would degrade block_q to 64 (two
    # confounded changes), so it is not queued
    ("sel-bwdkb10", {"sel.bwd_kv_batch": 10}),
    # sel fwd kv_batch at the merged bq=128 (r4): rows=768, so KB=12/16
    # f32 logits are 2.25/3 MB — both fit, and wider steps amortize the
    # per-step DMA setup that bq=128 doubled
    ("sel-kb12-q128", {"sel.kv_batch": 12}),
    ("sel-kb16-q128", {"sel.kv_batch": 16}),
    # flat [B,S,G,h*Dv] gate combine: removes the (6,64)->(8,128) HBM
    # tile padding the combine fusions pay (r4 profile: ~19 ms/step of
    # broadcast_multiply/add_add at padded-bandwidth peak). Fwd
    # bit-exact; grads last-ulp (gate-grad reduction order).
    ("flat-combine", {"nsa.flat_combine": 1}),
    # r4 LATE: the 16 MB scoped-vmem ceiling every 256-row backward OOM
    # hit is an XLA BUDGET, not physical VMEM — vmem.scoped_kib raises
    # it via LIBTPU_INIT_ARGS (tuning.apply_tpu_env). First manual probe:
    # win/cmp bwdq256 @ 24 MB = 63.6k vs 62.3k, loss byte-identical.
    ("vm24-ctl", {"vmem.scoped_kib": 24576}),
    ("vm24-bwdq256", {"vmem.scoped_kib": 24576,
                      "win.bwd_block_q": 256, "cmp.bwd_block_q": 256}),
    ("vm24-allq256", {"vmem.scoped_kib": 24576,
                      "win.bwd_block_q": 256, "cmp.bwd_block_q": 256,
                      "sel.bwd_block_q": 256}),
    ("vm32-allq256", {"vmem.scoped_kib": 32768,
                      "win.bwd_block_q": 256, "cmp.bwd_block_q": 256,
                      "sel.bwd_block_q": 256}),
    ("vm32-allq256k1024", {"vmem.scoped_kib": 32768,
                           "win.bwd_block_q": 256, "cmp.bwd_block_q": 256,
                           "sel.bwd_block_q": 256,
                           "win.bwd_block_k": 1024}),
    ("vm32-selkb16", {"vmem.scoped_kib": 32768, "sel.kv_batch": 16,
                      "win.bwd_block_q": 256, "cmp.bwd_block_q": 256,
                      "sel.bwd_block_q": 256}),
    # wave 2 of the scoped-vmem thread (allq256@24M won at 64.3k):
    ("vm48-allq512", {"vmem.scoped_kib": 49152,
                      "win.bwd_block_q": 512, "cmp.bwd_block_q": 512,
                      "sel.bwd_block_q": 512}),
    ("vm48-selbwdkb16", {"vmem.scoped_kib": 49152,
                         "win.bwd_block_q": 256, "cmp.bwd_block_q": 256,
                         "sel.bwd_block_q": 256, "sel.bwd_kv_batch": 16}),
    # r2's cmp fused-bwd 256 disaster (-60%) was a 16 MB VMEM spill;
    # retry under the raised budget with the winning bwd tiles
    ("vm24-fusedbwd256", {"vmem.scoped_kib": 24576,
                          "win.bwd_block_q": 256, "cmp.bwd_block_q": 256,
                          "sel.bwd_block_q": 256,
                          "cmp.fused_bwd_block_q": 256}),
    # wave 3: vm24-fusedbwd256 won at 64.5k. The bwd fastpath guard
    # auto-disables at 256-row tiles under <=24 MB (dual-body 12.6 MB);
    # at 48 MB it re-admits — measures whether the cmp fastpath pays at
    # the bigger tiles. Plus scorer tiles under the raised budget.
    ("vm48-fb256-fast", {"vmem.scoped_kib": 49152,
                         "win.bwd_block_q": 256, "cmp.bwd_block_q": 256,
                         "sel.bwd_block_q": 256,
                         "cmp.fused_bwd_block_q": 256}),
    ("vm24-fb256-scorer256", {"vmem.scoped_kib": 24576,
                              "win.bwd_block_q": 256, "cmp.bwd_block_q": 256,
                              "sel.bwd_block_q": 256,
                              "cmp.fused_bwd_block_q": 256,
                              "scorer.block_q": 256}),
    # wave 4 (geometry at the merged q256 tiles): win bwd bk=256 — at
    # q256 the band intersection (w - bq + 1 = 257) >= 256, so aligned
    # kv tiles CAN be fully live and the fastpath dual-body is only
    # 3.1 MB (fires under the scaled guard). bk256@q128 lost (-2.0%)
    # with zero fully-live pairs; this is a different geometry.
    ("vm24-fb256-wink256", {"vmem.scoped_kib": 24576,
                            "win.bwd_block_q": 256, "cmp.bwd_block_q": 256,
                            "sel.bwd_block_q": 256,
                            "cmp.fused_bwd_block_q": 256,
                            "win.bwd_block_k": 256}),
    ("vm32-selbwdkb12", {"vmem.scoped_kib": 32768,
                         "win.bwd_block_q": 256, "cmp.bwd_block_q": 256,
                         "sel.bwd_block_q": 256,
                         "cmp.fused_bwd_block_q": 256,
                         "sel.bwd_kv_batch": 12}),
    # r5: gate-epilogue fold — branch kernels emit g*O directly (combine
    # becomes a pure add) and the gate-logit grad rides the delta
    # preprocess via the D-form softmax vjp (no extra reduce): removes
    # the 3 per-branch dg multiply_reduce fusions per layer from the
    # backward. NOT bit-identical to the unfused path (gates stay f32
    # into the kernel epilogue) — its loss is its own gate, validated by
    # tests/test_gate_fold.py gradient parity.
    ("gate-fold", {"nsa.gate_fold": 1}),
    # r5: fold + flat-IO — branch kernels emit Y in the unpadded
    # [B,S,H*Dv] layout (per-head 64-aligned lane stores; the 5-D
    # (6,64)-minor layout is T(8,128) tile-padded to 2.67x physical HBM
    # bytes) and the backwards consume flat dO via an f32 scratch
    # conversion; the combine feeds W_O with no reshape.
    ("gate-fold-flat", {"nsa.gate_fold": 1, "nsa.flat_io": 1}),
    # r5: sel backward two-pass (dQ q-major reusing the forward's
    # scalar-prefetched compaction + dKV kv-major) re-tuned at the
    # merged 24 MB scoped budget — it lost to one-pass at 16 MB (r2:
    # one-pass +11% e2e), but each pass has ~half the live buffers, so
    # the raised budget may admit geometries one-pass can't.
    ("sel-twopass", {"sel.bwd_onepass": 0}),
    ("sel-twopass-kb16", {"sel.bwd_onepass": 0, "sel.bwd_kv_batch": 16}),
    ("sel-twopass-q512", {"sel.bwd_onepass": 0, "sel.bwd_block_q": 512}),
    # r5 long-context wave (run with --seq 8192 --batch 2 --only s8k-*):
    # at S=8192 the per-tile block unions SATURATE (J=128, every block
    # active per tile — see PERFORMANCE.md r5 analysis), so the
    # compaction skips nothing and the sel grid is Jg-steps-bound; wider
    # kv batches amortize per-step overhead exactly when nothing can be
    # skipped. Distinct s8k- names: these records carry the S=8192 loss
    # gate, NOT 5.5659 — never merged by ab_select into the dense config.
    ("s8k-control", {}),
    ("s8k-selkb16", {"sel.kv_batch": 16}),
    ("s8k-selbwdkb16", {"sel.bwd_kv_batch": 16}),
    ("s8k-selkb16-both", {"sel.kv_batch": 16, "sel.bwd_kv_batch": 16}),
    ("s8k-selbq256", {"sel.block_q": 256}),
    # r5 follow-up (run with --seq 4096 --batch 4 --only s4k-*): decide
    # whether the sel.long_s length-adaptive gate should fire at 4096.
    # At S=4096 the unions are saturated too (J=64 blocks all active per
    # 128-row tile once t >= l_sel*J), but the grid has 4x fewer steps
    # than S=8192, so the per-step-overhead amortization that won +7.6%
    # there may not clear the wider-batch masking cost here. The r4
    # "KB widening loses 1-2%" result was measured at S=2048 only —
    # S=4096 was never measured (the one attempt hung the tunnel).
    # Loss gate for these records: 5.5542 (S=4096 B=4 chained, r4 rung).
    ("s4k-control", {}),
    ("s4k-selkb16-both", {"sel.kv_batch": 16, "sel.bwd_kv_batch": 16}),
    ("s4k-selkb16", {"sel.kv_batch": 16}),
    ("s4k-selbwdkb16", {"sel.bwd_kv_batch": 16}),
    # r5 late (run with --seq 16384 --batch 1 --only s16k-*): at 16k the
    # sel grid is the most steps-bound point on the ladder (J=256 blocks,
    # unions fully saturated) — probe whether widening past the measured
    # KB16 (the *_long defaults) keeps paying or hits the VMEM/masking
    # wall. Overrides target the _long keys since S=16384 >= both gates.
    # Loss gate for these records: 5.5583 (S=16384 B=1 chained, r5 rung).
    ("s16k-control", {}),
    ("s16k-bkb24", {"sel.bwd_kv_batch_long": 24}),
    ("s16k-bkb32", {"sel.bwd_kv_batch_long": 32}),
    ("s16k-fkb24", {"sel.kv_batch_long": 24}),
    # threshold placement for the KB24 tier (runs at --seq 8192 --batch 2
    # against the post-gate defaults, i.e. control is bwd KB16):
    ("s8k-bkb24", {"sel.bwd_kv_batch_long": 24}),
]


def run_variant(name: str, overrides: dict, args) -> dict:
    if args.varlen:
        # distinct record names: ab_select keys "last run of a name
        # wins", and dense vs varlen runs have different loss gates
        name = name + "-varlen"
    with open(os.path.join(REPO, "configs", "kernel_tuning.json")) as f:
        base = json.load(f)
    merged = {**base, **overrides}
    fd, path = tempfile.mkstemp(suffix=f"_{name}.json")
    with os.fdopen(fd, "w") as f:
        json.dump(merged, f)
    env = {**os.environ, "NSA_KERNEL_TUNING": path}
    cmd = [sys.executable, os.path.join(REPO, "bench", "bench_train.py"),
           "--batch", str(args.batch), "--seq", str(args.seq),
           "--steps", str(args.steps)]
    if args.chained:
        cmd += ["--chained"]
    if args.varlen:
        cmd += ["--varlen"]
    if args.remat:
        cmd += ["--remat"] + ([args.remat] if args.remat is not True else [])
    t0 = time.time()
    try:
        out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                             timeout=args.timeout)
    except subprocess.TimeoutExpired:
        return {"variant": name, "error": f"timeout after {args.timeout}s",
                "wall_s": round(time.time() - t0, 1)}
    wall = time.time() - t0
    line = next((ln for ln in reversed(out.stdout.splitlines())
                 if ln.startswith("{")), None)
    if out.returncode != 0 or line is None:
        return {"variant": name, "error": (out.stderr or out.stdout)[-2000:],
                "wall_s": round(wall, 1)}
    rec = {"variant": name, "overrides": overrides,
           **json.loads(line), "wall_s": round(wall, 1)}
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--timeout", type=int, default=1500)
    ap.add_argument("--remat", nargs="?", const=True, default=False,
                    help="pass --remat [mlp] through to bench_train "
                         "(long-S rungs need it; records carry the flag)")
    ap.add_argument("--only", default=None,
                    help="comma-separated variant names")
    ap.add_argument("--varlen", action="store_true",
                    help="run the queue on packed-document (varlen) "
                         "batches — its own fixed-seed loss gate "
                         "(4.4573 at b16/S=2048/8 steps chained); do "
                         "not mix dense and varlen records in one "
                         "winner selection")
    ap.add_argument("--chained", action="store_true",
                    help="use bench_train --chained (device-time per step; "
                         "REQUIRED on a congested tunnel — mixing modes in "
                         "one queue run breaks the loss gate, so use it for "
                         "the whole run)")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None
    log = os.path.join(REPO, "artifacts", "ab_queue.jsonl")
    os.makedirs(os.path.dirname(log), exist_ok=True)
    results = []
    for name, overrides in VARIANTS:
        if only and name not in only:
            continue
        rec = run_variant(name, overrides, args)
        results.append(rec)
        with open(log, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if "error" in rec:
            print(f"{name:16s} ERROR (see {log})")
            print(rec["error"][-500:])
        else:
            print(f"{name:16s} {rec['value']:>9.1f} toks/s  "
                  f"loss={rec['loss']}  step={rec['step_ms']}ms  "
                  f"({rec['wall_s']:.0f}s)", flush=True)
    best = max((r for r in results if "value" in r),
               key=lambda r: r["value"], default=None)
    if best:
        print(f"\nbest: {best['variant']} @ {best['value']:.1f} toks/s")

    # Second phase: merge the best fwd-tile, bwd-tile and flag winners and
    # run the combo (flags live in the default config, so a tile winner
    # already includes flags-on; this catches tile-x-tile interactions).
    ok = {r["variant"]: r for r in results if "value" in r}
    if not (args.only or len(ok) < len(VARIANTS)):
        def _best_of(names):
            group = [ok[n] for n in names if n in ok]
            return max(group, key=lambda r: r["value"]) if group else None
        fwd = _best_of(["flags-on", "fwd-wink256", "fwd-fastk256"])
        bwd = _best_of(["flags-on", "bwd-wink256"])
        proj = _best_of(["flags-on", "proj-fused"])
        sel = _best_of(["flags-on", "sel-kb12"])
        cmp_ = _best_of(["flags-on", "cmp-k1024"])
        scorer = _best_of(["flags-on", "scorer-q256"])
        combo = {**fwd["overrides"], **bwd["overrides"], **proj["overrides"],
                 **sel["overrides"], **cmp_["overrides"], **scorer["overrides"]}
        if combo and all(combo != r.get("overrides") for r in results):
            rec = run_variant("combo", combo, args)
            with open(log, "a") as f:
                f.write(json.dumps(rec) + "\n")
            if "value" in rec:
                print(f"combo {combo} -> {rec['value']:.1f} toks/s  "
                      f"loss={rec['loss']}")
            else:
                print(f"combo ERROR (see {log})")


if __name__ == "__main__":
    main()
