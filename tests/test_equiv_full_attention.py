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


def test_branch_ablation_equivalence():
    """Force the gate one-hot to each branch (reference
    test_equiv_ablation.py — which only checked SHAPES; here the forced
    output must EQUAL the branch oracle computed directly from the same
    projections + W_O)."""
    import numpy as np

    from nsa_vibe_tpu.core.nsa import nsa_prefill, project_qkv
    from nsa_vibe_tpu.ops import reference as ref
    from nsa_vibe_tpu.ops.compress import pool_phi_rope_kv
    from nsa_vibe_tpu.ops.rope import apply_rope

    cfg = NSAConfig(dim=64, n_heads=4, n_kv_groups=2, d_k=16, d_v=16,
                    l=8, d=4, l_sel=8, n_sel=3, w=16, kernel="reference")
    params = init_nsa_params(jax.random.PRNGKey(0), cfg)
    B, S = 2, 48
    x = jax.random.normal(jax.random.PRNGKey(1), (B, S, cfg.dim))
    t_pos = jnp.arange(S, dtype=jnp.int32)
    scale = 1.0 / np.sqrt(cfg.d_k)
    G, h = cfg.n_kv_groups, cfg.h_per_group

    Q, K_sel, V_sel, K_win, V_win, K_cr, V_cr = project_qkv(params, x, cfg)
    Qr = apply_rope(Q, t_pos[:, None], cfg.rope_base).reshape(B, S, G, h, cfg.d_k)
    K_win_r = apply_rope(K_win, t_pos, cfg.rope_base)
    K_sel_r = apply_rope(K_sel, t_pos, cfg.rope_base)
    K_cmp, V_cmp = pool_phi_rope_kv(K_cr, V_cr, cfg.l, cfg.d, pos=t_pos)
    from nsa_vibe_tpu.ops.block_index import num_cmp_blocks
    nct = jnp.minimum(jnp.asarray(
        num_cmp_blocks(np.arange(1, S + 1), cfg.l, cfg.d), jnp.int32),
        K_cmp.shape[2])

    oracles = {
        "win": lambda: ref.sliding_window_attention(
            Qr, K_win_r, V_win, t_pos, cfg.w, scale),
        "cmp": lambda: ref.compressed_attention(Qr, K_cmp, V_cmp, nct, scale),
    }
    for branch, oracle in oracles.items():
        forced = cfg.replace(force_branch=branch)
        got, _ = nsa_prefill(params, x, forced)
        O = oracle()
        want = O.reshape(B, S, cfg.n_heads * cfg.d_v) @ params["W_O"]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-4, err_msg=branch)
    # sel: use the selection actually made by the module
    forced = cfg.replace(force_branch="sel")
    got, aux = nsa_prefill(params, x, forced)
    O = ref.selection_attention(Qr, K_sel_r, V_sel, aux["sel_idx"], t_pos,
                                cfg.l_sel, scale)
    want = O.reshape(B, S, cfg.n_heads * cfg.d_v) @ params["W_O"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4, err_msg="sel")
