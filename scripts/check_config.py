"""Config validator CLI.

Reference: scripts/check_config.py — validate a YAML config before
launching a run. Checks here: the file parses into the typed config tree
(which enforces divisibility d|l, d|l_sel, heads%groups, even d_k), plus
launch-level invariants the dataclasses cannot see: selection coverage vs
seq_len, window vs seq_len sanity, parallel axes vs seq/batch
divisibility, and (optionally) an analytic HBM fit via estimate_memory.

Run: python scripts/check_config.py configs/*.yaml [--hbm-gb 16]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json


def check_one(path: str, hbm_gb: float) -> tuple[list[str], list[str]]:
    from nsa_vibe_tpu.train.trainer import load_config
    from scripts.estimate_memory import estimate

    errors: list[str] = []
    warnings: list[str] = []
    try:
        mcfg, tcfg, _ = load_config(path)
    except Exception as e:  # dataclass validation errors surface here
        return [f"parse/validate failed: {e}"], []

    nsa = mcfg.nsa
    if tcfg.seq_len % nsa.d != 0:
        errors.append(f"seq_len {tcfg.seq_len} not divisible by stride d={nsa.d}")
    if nsa.w > tcfg.seq_len * 4:
        errors.append(f"window w={nsa.w} is >4x seq_len {tcfg.seq_len} (wasteful)")
    if nsa.n_sel * nsa.l_sel > tcfg.seq_len and tcfg.seq_len >= nsa.l_sel:
        warnings.append(
            f"selection covers {nsa.n_sel * nsa.l_sel} >= seq_len {tcfg.seq_len}: "
            "NSA degenerates to full attention (fine for tests, wrong for prod)")
    n_chips = max(tcfg.dp, 1) * tcfg.tp * tcfg.sp  # dp=0 = inferred at runtime
    if tcfg.sp > 1 and tcfg.seq_len % tcfg.sp != 0:
        errors.append(f"seq_len {tcfg.seq_len} % sp {tcfg.sp} != 0")
    if tcfg.batch_size % max(tcfg.dp, 1) != 0:
        errors.append(f"batch_size {tcfg.batch_size} % dp {tcfg.dp} != 0")
    if nsa.prefill_chunk and tcfg.seq_len % nsa.prefill_chunk != 0:
        errors.append(f"seq_len % prefill_chunk {nsa.prefill_chunk} != 0")
    est = estimate(mcfg, tcfg)
    per_chip = est["train_total_bytes"] / max(tcfg.dp if tcfg.fsdp else 1, 1)
    if per_chip > hbm_gb * 1024**3 * 0.9:
        errors.append(
            f"estimated {per_chip / 1024**3:.1f} GB/chip exceeds 90% of "
            f"{hbm_gb} GB HBM (chips={n_chips}, fsdp={tcfg.fsdp})")
    return errors, warnings


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("configs", nargs="+")
    ap.add_argument("--hbm-gb", type=float, default=16.0)
    args = ap.parse_args()

    failed = False
    report = {}
    for path in args.configs:
        errs, warns = check_one(path, args.hbm_gb)
        entry = {}
        if errs:
            entry["errors"] = errs
        if warns:
            entry["warnings"] = warns
        report[path] = entry or "ok"
        failed |= bool(errs)
    print(json.dumps(report, indent=2))
    raise SystemExit(1 if failed else 0)


if __name__ == "__main__":
    main()
