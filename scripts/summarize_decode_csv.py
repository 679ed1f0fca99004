"""Summarize a bench_decode CSV (reference bench/summarize_decode_csv.py)."""

from __future__ import annotations

import argparse
import csv


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("csv_path")
    args = ap.parse_args()
    with open(args.csv_path) as f:
        rows = list(csv.DictReader(f))
    print(f"{'S':>8} {'ms':>9} {'reads':>7} {'expect':>7} {'match':>6}")
    for r in rows:
        match = "yes" if r["reads_actual"] == r["reads_expected"] else "NO"
        print(f"{r['S']:>8} {r['ms_total']:>9} {r['reads_actual']:>7} "
              f"{r['reads_expected']:>7} {match:>6}")


if __name__ == "__main__":
    main()
