"""Summarize artifacts/ab_queue.jsonl and propose the merged tuning.

Reads every record the A/B queue appended (bench/run_ab_queue.py),
prints a ranked table, checks the two invariants (flags-off must
reproduce the recorded baseline loss byte-identically; every variant's
loss must match flags-off — a loss delta means a kernel bug, not a perf
result), and emits the merged winner overrides.

Run: python bench/ab_select.py [--write]   (--write merges the winning
overrides into configs/kernel_tuning.json)
"""

from __future__ import annotations

import argparse
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "artifacts", "ab_queue.jsonl")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true")
    ap.add_argument("--log", default=LOG)
    ap.add_argument("--varlen", action="store_true",
                    help="select among varlen-mode records (their own "
                         "loss gate) instead of dense ones")
    args = ap.parse_args()

    recs: dict = {}
    with open(args.log) as f:
        for ln in f:
            r = json.loads(ln)
            recs[r["variant"]] = r          # last run of a name wins

    # dense and varlen runs have DIFFERENT fixed-seed loss gates — never
    # rank them against each other. Varlen records are tagged by the
    # queue with a -varlen suffix / varlen:true; select within one mode.
    varlen_mode = bool(args.varlen)
    recs = {k: r for k, r in recs.items()
            if bool(r.get("varlen")) == varlen_mode}
    if not recs:
        raise SystemExit("no records for this mode (use --varlen?)")

    ok = {k: v for k, v in recs.items() if "value" in v}
    errs = {k: v for k, v in recs.items() if "error" in v}
    if not ok:
        raise SystemExit("no successful runs in the log")
    for name, r in sorted(ok.items(), key=lambda kv: -kv[1]["value"]):
        print(f"{name:18s} {r['value']:>9.1f} toks/s  loss={r['loss']}  "
              f"step={r['step_ms']}ms  {r.get('overrides', {})}")
    for name, r in errs.items():
        print(f"{name:18s} ERROR: {r['error'][-160:]}")

    base = ok.get("flags-off-varlen" if varlen_mode else "flags-off")
    if base:
        print(f"\nflags-off baseline: {base['value']:.1f} toks/s @ loss "
              f"{base['loss']} (r2 record: 57.4k @ 5.5535)")
        # HARD invariant (CLAUDE.md A/B rule): a loss delta means a kernel
        # bug, not a perf result — such variants are excluded from winner
        # selection and --write refuses them. (bench_train records loss at
        # 4 decimals; that is the finest loss equality available here —
        # the queue runs the full-precision check at bench time.)
        bad = {k: r["loss"] for k, r in ok.items()
               if float(r["loss"]) != float(base["loss"])}
        if bad:
            print(f"EXCLUDED (loss != flags-off {base['loss']}): {bad}")
            ok = {k: r for k, r in ok.items() if k not in bad}

    best = max(ok.values(), key=lambda r: r["value"])
    print(f"\nbest: {best['variant']} @ {best['value']:.1f} toks/s")
    overrides = best.get("overrides", {})
    print("proposed overrides:", json.dumps(overrides))

    if args.write and overrides is not None:
        path = os.path.join(REPO, "configs", "kernel_tuning.json")
        with open(path) as f:
            merged = {**json.load(f), **overrides}
        with open(path, "w") as f:
            json.dump(merged, f, indent=2)
            f.write("\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
