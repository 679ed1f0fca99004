"""Chip sanity check: device visible, MXU matmul correct, Pallas loads.

Reference: scripts/gpu_sanity.py — the 10-second "is this box usable"
probe run before anything expensive. TPU version: enumerate devices,
run one bf16 matmul and check it against fp32 numpy, compile-and-run the
smallest real Pallas kernel (flash_banded win), and report timings.

Run: python scripts/tpu_sanity.py        (real chip)
     JAX_PLATFORMS=cpu PYTHONPATH= python scripts/tpu_sanity.py --allow-cpu
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--allow-cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    t0 = time.perf_counter()
    devs = jax.devices()
    report: dict = {
        "platform": devs[0].platform,
        "device_count": len(devs),
        "device_kind": devs[0].device_kind,
        "init_s": round(time.perf_counter() - t0, 2),
    }
    if devs[0].platform == "cpu" and not args.allow_cpu:
        print(json.dumps({**report, "ok": False, "error": "CPU backend (use --allow-cpu)"}))
        raise SystemExit(1)

    # MXU matmul correctness (bf16 vs fp64 numpy)
    rng = np.random.default_rng(0)
    a = rng.standard_normal((256, 512)).astype(np.float32)
    b = rng.standard_normal((512, 128)).astype(np.float32)
    t0 = time.perf_counter()
    got = np.asarray(jax.jit(
        lambda x, y: (x.astype(jnp.bfloat16) @ y.astype(jnp.bfloat16)).astype(jnp.float32)
    )(a, b))
    report["matmul_s"] = round(time.perf_counter() - t0, 2)
    rel = np.abs(got - a @ b).mean() / np.abs(a @ b).mean()
    report["matmul_rel_err"] = float(rel)
    ok = rel < 2e-2

    # smallest real Pallas kernel
    from nsa_vibe_tpu.ops.pallas.flash import flash_banded

    Q = jnp.ones((1, 128, 1, 2, 64), jnp.bfloat16)
    K = jnp.ones((1, 1, 128, 64), jnp.bfloat16)
    interp = devs[0].platform != "tpu"
    t0 = time.perf_counter()
    out = flash_banded(Q, K, K, mode="win", w=32, scale=0.125, interpret=interp)
    pallas_ok = bool(jnp.isfinite(out.astype(jnp.float32)).all())
    report["pallas_s"] = round(time.perf_counter() - t0, 2)
    report["pallas_finite"] = pallas_ok
    report["ok"] = bool(ok and pallas_ok)
    print(json.dumps(report))
    raise SystemExit(0 if report["ok"] else 1)


if __name__ == "__main__":
    main()
