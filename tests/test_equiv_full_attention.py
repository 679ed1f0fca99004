"""Small-S equivalence oracles: NSA branches vs causal full attention.

Reference: nsa/tests/test_equiv_small.py:51-101 and
test_equiv_full_coverage.py — with the gate forced to one branch and that
branch's coverage made total (w >= S for win; n_sel*l_sel >= S for sel),
the NSA output must equal full causal attention computed from NSA's own
projection weights, MAE < 1e-5.

Unlike the reference oracles (which inherit the q_len=1 SDPA quirk,
SURVEY.md §2.6#1), ours is an explicitly-masked softmax — the intended
math.
"""

import jax
import jax.numpy as jnp
import numpy as np

from nsa_vibe_tpu.core.config import NSAConfig
from nsa_vibe_tpu.core.nsa import init_nsa_params, nsa_prefill, project_qkv
from nsa_vibe_tpu.ops.rope import apply_rope


def _full_causal_oracle(params, x, cfg, branch: str):
    """Causal full attention over the branch's own K/V projections,
    combined through the same output projection."""
    B, S, _ = x.shape
    G, h = cfg.n_kv_groups, cfg.h_per_group
    Q, K_sel, V_sel, K_win, V_win, _, _ = project_qkv(params, x, cfg)
    t_pos = jnp.arange(S, dtype=jnp.int32)
    Q = apply_rope(Q, t_pos[:, None], cfg.rope_base, cfg.rope_scale)
    Q = Q.reshape(B, S, G, h, cfg.d_k)
    K, V = (K_sel, V_sel) if branch == "sel" else (K_win, V_win)
    K = apply_rope(K, t_pos, cfg.rope_base, cfg.rope_scale)

    logits = jnp.einsum(
        "bsghd,bgtd->bsght", Q.astype(jnp.float32), K.astype(jnp.float32)
    ) / np.sqrt(cfg.d_k)
    causal = t_pos[:, None] >= t_pos[None, :]  # [S_q, S_kv] keys <= query pos
    logits = jnp.where(causal[None, :, None, None, :], logits, -jnp.inf)
    p = jax.nn.softmax(logits, axis=-1)
    O = jnp.einsum("bsght,bgtv->bsghv", p, V.astype(jnp.float32))
    out = O.reshape(B, S, cfg.n_heads * cfg.d_v).astype(x.dtype) @ params["W_O"]
    return out


def _cfg(branch: str, S: int) -> NSAConfig:
    kw = dict(dim=64, n_heads=4, n_kv_groups=2, d_k=16, d_v=16,
              l=8, d=4, l_sel=16, w=8, kernel="reference", force_branch=branch)
    if branch == "win":
        kw["w"] = S  # window covers everything
        kw["n_sel"] = 4
    else:
        kw["n_sel"] = S // kw["l_sel"] + 2  # full coverage of all blocks
    return NSAConfig(**kw)


def test_win_branch_equals_full_attention():
    S = 48
    cfg = _cfg("win", S)
    params = init_nsa_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, S, cfg.dim))
    out, _ = nsa_prefill(params, x, cfg)
    ref = _full_causal_oracle(params, x, cfg, "win")
    mae = float(jnp.abs(out - ref).mean())
    assert mae < 1e-5, f"win-forced MAE {mae}"


def test_sel_branch_full_coverage_equals_full_attention():
    S = 64
    cfg = _cfg("sel", S)
    params = init_nsa_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, S, cfg.dim))
    out, _ = nsa_prefill(params, x, cfg)
    ref = _full_causal_oracle(params, x, cfg, "sel")
    mae = float(jnp.abs(out - ref).mean())
    assert mae < 1e-5, f"sel-forced full-coverage MAE {mae}"


def test_pallas_interpret_matches_reference_win_oracle():
    """The Pallas kernel path (interpret mode on CPU) passes the same
    full-attention oracle — kernels implement the intended math too."""
    S = 64
    cfg = _cfg("win", S).replace(kernel="pallas")
    params = init_nsa_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, S, cfg.dim))
    out, _ = nsa_prefill(params, x, cfg)
    ref = _full_causal_oracle(params, x, cfg, "win")
    mae = float(jnp.abs(out - ref).mean())
    assert mae < 2e-5, f"pallas win-forced MAE {mae}"
