"""M7 showcase acceptance: train the tiny char-LM to val PPL < 3.0.

Reference acceptance (PRD.md:216-223): a 1-3M-param char-level model
reaches val PPL < 3.0 on a tiny corpus within the run budget, with a
>=30% PPL improvement over its early value. This script reproduces that
gate end-to-end through the real trainer (data pipeline -> trainer ->
val.csv), using the repository's own source text as the offline corpus
(no network), then asserts both criteria and prints one summary JSON.

Run (CPU ok, ~15 min; TPU ~1 min):
  python scripts/showcase_acceptance.py [--steps 6000] [--out-dir DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import csv
import glob
import json
import math
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_corpus(path: str) -> int:
    """Concatenate the repo's .py/.md text into one char-level corpus."""
    files = sorted(
        glob.glob(os.path.join(REPO, "**", "*.py"), recursive=True)
        + glob.glob(os.path.join(REPO, "**", "*.md"), recursive=True)
    )
    n = 0
    with open(path, "w") as out:
        for f in files:
            if "__pycache__" in f or "/.git/" in f:
                continue
            with open(f, errors="ignore") as src:
                text = src.read()
            out.write(text + "\n\n")
            n += len(text)
    return n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--n-layers", type=int, default=4)
    ap.add_argument("--eval-every", type=int, default=500)
    ap.add_argument("--out-dir", default=os.path.join(REPO, "artifacts", "showcase_acceptance"))
    ap.add_argument("--ppl-gate", type=float, default=3.0)
    args = ap.parse_args()

    # start from a clean slate: the trainer APPENDS to val.csv/training.csv,
    # so stale rows from an interrupted earlier run would corrupt the
    # first/best PPL computation below
    os.makedirs(args.out_dir, exist_ok=True)
    for stale in ("val.csv", "training.csv", "heartbeat.jsonl", "summary.json"):
        p = os.path.join(args.out_dir, stale)
        if os.path.exists(p):
            os.remove(p)
    corpus = os.path.join(args.out_dir, "corpus.txt")
    nbytes = build_corpus(corpus)
    print(f"corpus: {nbytes} chars at {corpus}")

    cmd = [
        sys.executable, "-m", "nsa_vibe_tpu.train.trainer",
        "--config", os.path.join(REPO, "configs", "train_showcase.yaml"),
        "--data", corpus,
        "--steps", str(args.steps),
        "--n-layers", str(args.n_layers),
        "--eval-every", str(args.eval_every),
        "--log-every", "100",
        "--save-every", "0",
        "--out-dir", args.out_dir,
    ]
    # PREPEND the repo to PYTHONPATH rather than replacing it: the TPU
    # env carries the axon plugin on PYTHONPATH and JAX_PLATFORMS=axon —
    # dropping the plugin path while the platform stays pinned kills
    # backend init in the child
    pp = os.environ.get("PYTHONPATH", "")
    env = {**os.environ, "PYTHONPATH": REPO + (os.pathsep + pp if pp else "")}
    subprocess.run(cmd, env=env, check=True, cwd=REPO)

    # val.csv rows: step, val_loss, ppl (no header); val batches come from
    # the stream, held out from the step they are evaluated against
    with open(os.path.join(args.out_dir, "val.csv")) as f:
        rows = [r for r in csv.reader(f) if r]
    ppls = [(int(r[0]), math.exp(float(r[1]))) for r in rows]
    first, best = ppls[0][1], min(p for _, p in ppls)
    improvement = (first - best) / first
    summary = {
        "metric": "val_ppl_char",
        "value": round(best, 4),
        "first_eval_ppl": round(first, 4),
        "improvement_pct": round(100 * improvement, 1),
        "gate": args.ppl_gate,
        "passed": bool(best < args.ppl_gate and improvement >= 0.30),
        "steps": args.steps,
        "corpus_chars": nbytes,
    }
    with open(os.path.join(args.out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))
    if not summary["passed"]:
        raise SystemExit(f"acceptance FAILED: best PPL {best:.3f} "
                         f"(gate {args.ppl_gate}), improvement {100*improvement:.0f}%")


if __name__ == "__main__":
    main()
