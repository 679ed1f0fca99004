"""On-device odd-heads-per-group probe: pallas vs reference MAE.

Mosaic cannot shape-cast [Tq, h, Dk] -> [Tq*h, Dk] for odd h > 1, so the
dispatch layer pads odd head counts with a zero head
(ops/attention._pad_odd_heads) and slices it off after. CPU interpret
mode does NOT exercise the Mosaic lowering, so this probe must run on
the real chip after any kernel change (see .claude/skills/verify).

Covers n_heads/n_kv_groups in {3/1, 6/2, 12/4} (h = 3, 3, 3 after
grouping for 3/1 and 12/4; 6/2 is the even m7c shape as control)
through the full nsa_prefill forward, pallas vs reference, bf16.

Prints one JSON line; exit 1 if any MAE exceeds tolerance.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json

import jax
import jax.numpy as jnp

TOL = 3e-3  # bf16 end-to-end forward; r2 on-device measured ~5e-5


def main() -> None:
    from nsa_vibe_tpu.core.config import NSAConfig
    from nsa_vibe_tpu.core.nsa import init_nsa_params, nsa_prefill

    results = {}
    worst = 0.0
    for n_heads, groups in ((3, 1), (6, 2), (12, 4)):
        cfg = NSAConfig(dim=192, n_heads=n_heads, n_kv_groups=groups,
                        d_k=64, d_v=64, l=32, d=16, l_sel=64, n_sel=8, w=128)
        params = init_nsa_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 512, 192), jnp.bfloat16)

        def fwd(kernel):
            c = cfg.replace(kernel=kernel)
            return jax.jit(lambda p, x: nsa_prefill(p, x, c)[0])(params, x)

        mae = float(jnp.abs(fwd("pallas").astype(jnp.float32)
                            - fwd("reference").astype(jnp.float32)).mean())
        results[f"{n_heads}/{groups}"] = round(mae, 7)
        worst = max(worst, mae)

    ok = worst < TOL
    print(json.dumps({"probe": "oddh_pallas_parity", "mae": results,
                      "tol": TOL, "ok": ok}))
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
