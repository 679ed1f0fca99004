"""64k needle-retrieval smoke on device.

Reference: bench/needle_64k_smoke.py + nsa/tests/test_long_context_needle.py
(:91-104, CUDA@64k) — plant a compressed-score needle at a given depth
and assert the Eq. 8-12 pipeline (the production Pallas scorer at this
scale) selects a block covering it. Exercises scorer + mapping + top-n
only, like the reference.

Run: python bench/needle_smoke.py [--S 65536] [--depths 0.1,0.5,0.9]
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
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--S", type=int, default=65536)
    ap.add_argument("--depths", default="0.1,0.25,0.5,0.75,0.9")
    ap.add_argument("--kernel", default="auto")
    args = ap.parse_args()

    from nsa_vibe_tpu.core.config import NSAConfig
    from nsa_vibe_tpu.ops.attention import resolve_kernel
    from nsa_vibe_tpu.ops.block_index import build_block_meta, num_cmp_blocks
    from nsa_vibe_tpu.ops.selection import select_topn_blocks, selection_scores

    cfg = NSAConfig(dim=256, n_heads=4, n_kv_groups=2, d_k=64, d_v=64,
                    l=32, d=16, l_sel=64, n_sel=16, w=512, kernel=args.kernel)
    S = args.S
    meta = build_block_meta(S, cfg.l, cfg.d, cfg.l_sel, cfg.n_sel, cfg.w)
    S_cmp = int(num_cmp_blocks(S, cfg.l, cfg.d))
    M = jnp.asarray(meta.M_csl[:S_cmp])
    G, h = cfg.n_kv_groups, cfg.h_per_group
    scale = 1.0 / np.sqrt(cfg.d_k)
    impl, interpret = resolve_kernel(cfg.kernel)

    rng = np.random.default_rng(0)
    results = []
    ok_all = True
    for depth in [float(x) for x in args.depths.split(",")]:
        needle_pos = int(S * depth)
        K_cmp = jnp.asarray(rng.normal(0, 0.02, (1, G, S_cmp, cfg.d_k)), jnp.float32)
        covering = [i for i in range(S_cmp)
                    if i * cfg.d <= needle_pos < i * cfg.d + cfg.l]
        direction = jnp.asarray(rng.normal(0, 1, (cfg.d_k,)), jnp.float32)
        direction = direction / jnp.linalg.norm(direction)
        K_cmp = K_cmp.at[:, :, jnp.asarray(covering)].add(direction * 10.0)
        Q = jnp.broadcast_to(direction, (1, 1, G, h, cfg.d_k)) * 10.0
        t_pos = jnp.asarray([S - 1], jnp.int32)

        t0 = time.perf_counter()
        if impl == "pallas":
            from nsa_vibe_tpu.ops.pallas.scorer import nsa_select_pallas

            sel = nsa_select_pallas(
                Q.astype(jnp.bfloat16), K_cmp.astype(jnp.bfloat16), M,
                scale=float(scale), l=cfg.l, d=cfg.d, l_sel=cfg.l_sel,
                n_top=cfg.n_sel, pos_offset=int(S - 1), interpret=interpret,
            )
        else:
            p_grp = selection_scores(Q, K_cmp, M, scale, jnp.asarray([S_cmp]))
            sel = select_topn_blocks(p_grp, cfg.n_sel, t_pos, cfg.l_sel)
        sel = np.asarray(sel)
        dt = time.perf_counter() - t0

        needle_block = needle_pos // cfg.l_sel
        found = all(needle_block in sel[0, 0, g] for g in range(G))
        ok_all &= found
        results.append({"depth": depth, "pos": needle_pos,
                        "found": bool(found), "s": round(dt, 2)})

    print(json.dumps({"S": S, "pass": bool(ok_all), "results": results}))
    sys.exit(0 if ok_all else 1)


if __name__ == "__main__":
    main()
