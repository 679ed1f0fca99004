"""Analytic HBM estimator for a training/decode configuration.

Reference: scripts/estimate_nsa_memory.py — closed-form accounting of
parameter, optimizer, activation, and cache bytes so a config ladder can
be sized to a chip's HBM before launching. TPU version accounts for:
params (+ AdamW m/v in fp32), activations per layer with and without
remat, the O(S * S_cmp) selection-score tensor (or its chunked form), and
the fixed-capacity decode caches.

Run: python scripts/estimate_memory.py --config configs/m7c_125m.yaml
     python scripts/estimate_memory.py --dim 768 --layers 12 --seq 2048 --batch 8
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json


def human(n: float) -> str:
    for unit in ("B", "KB", "MB", "GB"):
        if abs(n) < 1024:
            return f"{n:.2f} {unit}"
        n /= 1024
    return f"{n:.2f} TB"


def estimate(mcfg, tcfg) -> dict:
    """Byte accounting for one training process (per data-parallel shard)."""
    from nsa_vibe_tpu.ops.block_index import num_cmp_blocks

    nsa = mcfg.nsa
    D, L, V = nsa.dim, mcfg.n_layers, mcfg.vocab_size
    B, S = tcfg.batch_size, tcfg.seq_len
    act_bytes = 2 if mcfg.dtype == "bfloat16" else 4
    G, H, Dk, Dv = nsa.n_kv_groups, nsa.n_heads, nsa.d_k, nsa.d_v

    # parameters: 7 projections + gate + norms + mlp + embed/head
    attn = D * H * Dk + 3 * (D * G * Dk + D * G * Dv) + H * Dv * D
    gate = G * ((nsa.gate_hidden or Dk // 2) * Dk + (nsa.gate_hidden or Dk // 2) * 3)
    mlp = 3 * D * int(D * mcfg.mlp_ratio)
    per_layer = attn + gate + mlp + 2 * D
    n_params = L * per_layer + 2 * V * D + D
    p_bytes = n_params * 4                       # master weights fp32
    opt_bytes = n_params * 8                     # AdamW m+v fp32

    # activations (per layer, batched prefill): Q/K/V branches + branch
    # outputs + mlp hidden; remat keeps ~1 layer live + per-layer residuals
    S_cmp = int(num_cmp_blocks(S, nsa.l, nsa.d))
    S_sel = -(-S // nsa.l_sel)
    proj = B * S * (H * Dk + 3 * G * (Dk + Dv)) * act_bytes
    branches = 3 * B * S * H * Dv * act_bytes
    mlp_act = 2 * B * S * int(D * mcfg.mlp_ratio) * act_bytes
    # selection scoring: p_cmp [B,S,G,h,S_cmp] fp32 + p_grp [B,S,G,S_sel]
    chunk = nsa.prefill_chunk or S
    scores = B * min(chunk, S) * G * (nsa.h_per_group * S_cmp + S_sel) * 4
    layer_act = proj + branches + mlp_act + scores
    resid = L * B * S * D * act_bytes
    act_total = (layer_act + resid) if mcfg.remat else (L * layer_act + resid)

    # decode caches (capacity = S): raw sel K/V + win ring + cmp stream
    cache = L * B * G * (2 * S * (Dk + Dv) // 2 + nsa.w * (Dk + Dv)
                         + S_cmp * (Dk + Dv)) * act_bytes

    total_train = p_bytes + opt_bytes + act_total
    return {
        "n_params": n_params,
        "params_bytes": p_bytes,
        "optimizer_bytes": opt_bytes,
        "activation_bytes": act_total,
        "selection_score_bytes": L * scores if not mcfg.remat else scores,
        "train_total_bytes": total_train,
        "decode_cache_bytes": cache,
        "human": {
            "params": human(p_bytes), "optimizer": human(opt_bytes),
            "activations": human(act_total), "train_total": human(total_train),
            "decode_caches": human(cache),
        },
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--dim", type=int, default=None)
    ap.add_argument("--layers", type=int, default=None)
    ap.add_argument("--seq", type=int, default=None)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--hbm-gb", type=float, default=16.0, help="chip HBM (v5e: 16)")
    args = ap.parse_args()

    from nsa_vibe_tpu.train.trainer import load_config

    mcfg, tcfg, _ = load_config(args.config)
    if args.dim:
        mcfg = mcfg.__class__(**{**mcfg.__dict__, "nsa": mcfg.nsa.replace(dim=args.dim)})
    if args.layers:
        mcfg = mcfg.__class__(**{**mcfg.__dict__, "n_layers": args.layers})
    kw = {}
    if args.seq:
        kw["seq_len"] = args.seq
    if args.batch:
        kw["batch_size"] = args.batch
    if kw:
        tcfg = tcfg.__class__(**{**tcfg.__dict__, **kw})

    est = estimate(mcfg, tcfg)
    est["fits_hbm"] = est["train_total_bytes"] < args.hbm_gb * 1024**3 * 0.9
    print(json.dumps(est, indent=2))


if __name__ == "__main__":
    main()
