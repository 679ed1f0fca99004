"""Environment guard: validate the accelerator environment before a run.

Reference: scripts/_env_guard.py:22-108 (TF32 config, bf16 capability
check, env snapshot). TPU equivalents checked here:
  * backend is TPU (or explicitly allowed CPU for tests);
  * device count and kind, memory stats where exposed;
  * default matmul precision (bf16 inputs on MXU are native — flag fp64
    which TPUs do not support);
  * x64 mode OFF (doubles memory, silently disables bf16 fast paths);
  * virtual-device flags that would corrupt a production run.

Prints a JSON report; --strict exits 1 on any failure.
Run: python scripts/env_guard.py [--strict] [--allow-cpu]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import os
import sys


def check_env(allow_cpu: bool = False) -> dict:
    import jax

    report: dict = {"jax": jax.__version__, "checks": {}, "ok": True}

    def check(name: str, ok: bool, detail: str = "") -> None:
        report["checks"][name] = {"ok": bool(ok), "detail": detail}
        report["ok"] = report["ok"] and bool(ok)

    backend = jax.default_backend()
    devices = jax.devices()
    report["backend"] = backend
    report["devices"] = [str(d) for d in devices]
    report["process_count"] = jax.process_count()

    check("backend_is_accelerator",
          backend not in ("cpu",) or allow_cpu,
          f"default backend = {backend}")

    check("x64_disabled", not jax.config.read("jax_enable_x64"),
          "jax_enable_x64 must be off (TPU has no fp64 ALUs)")

    flags = os.environ.get("XLA_FLAGS", "")
    check("no_virtual_devices",
          "xla_force_host_platform_device_count" not in flags or allow_cpu,
          f"XLA_FLAGS={flags!r}")

    mem = {}
    for d in devices[:1]:
        try:
            stats = d.memory_stats()
            if stats:
                mem = {k: stats.get(k) for k in
                       ("bytes_in_use", "bytes_limit") if k in stats}
        except Exception:
            pass
    report["memory"] = mem
    if mem.get("bytes_limit"):
        frac = mem.get("bytes_in_use", 0) / mem["bytes_limit"]
        check("hbm_mostly_free", frac < 0.5, f"{frac:.1%} HBM already in use")

    return report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--strict", action="store_true")
    ap.add_argument("--allow-cpu", action="store_true")
    args = ap.parse_args()
    report = check_env(allow_cpu=args.allow_cpu)
    print(json.dumps(report, indent=2))
    if args.strict and not report["ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
