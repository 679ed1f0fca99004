"""64k END-TO-END needle retrieval on device: full module, asserted.

Runs the whole NSA module at S=65536 — prefill of 65535 tokens with the
production Pallas kernels, then ONE cached decode step — and asserts the
decoded attention OUTPUT retrieves the needle's value (utils.needle).
This is the on-device promotion of tests/test_needle.py's
test_needle_end_to_end_through_attention_output, exceeding the
reference's selection-coverage-only 64k check
(nsa/tests/test_long_context_needle.py:85-104).

Run: python bench/needle_e2e.py [--S 65536] [--depths 0.1,0.5,0.9]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--S", type=int, default=65536)
    ap.add_argument("--depths", default="0.1,0.5,0.9")
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from nsa_vibe_tpu.core.config import NSAConfig
    from nsa_vibe_tpu.utils.needle import needle_probe

    cfg = NSAConfig(dim=256, n_heads=4, n_kv_groups=2, d_k=64, d_v=64,
                    l=32, d=16, l_sel=64, n_sel=16, w=512,
                    prefill_chunk=4096)
    results = []
    ok = True
    for depth in [float(x) for x in args.depths.split(",")]:
        t0 = time.perf_counter()
        r = needle_probe(cfg, args.S, depth, dtype=jnp.dtype(args.dtype))
        r["s"] = round(time.perf_counter() - t0, 1)
        ok &= r["pass_"]
        results.append(r)
        print(json.dumps(r), flush=True)
    print(json.dumps({"S": args.S, "pass": bool(ok)}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
