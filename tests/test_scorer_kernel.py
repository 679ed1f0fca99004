"""Fused selection-scorer Pallas kernel: selected *set* must equal the
XLA pipeline's (compute_pcmp_masked -> Eq.9 -> Eq.10 -> select_topn_blocks),
and the end-to-end pallas prefill must still match the reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsa_vibe_tpu.ops.block_index import build_block_meta, num_cmp_blocks
from nsa_vibe_tpu.ops.pallas.scorer import nsa_select_pallas
from nsa_vibe_tpu.ops.selection import select_topn_blocks, selection_scores


def _sets(sel):
    """[..., n] int array -> list of python sets (drop -1)."""
    flat = sel.reshape(-1, sel.shape[-1])
    return [set(int(v) for v in row if v >= 0) for row in np.asarray(flat)]


@pytest.mark.parametrize("S,l,d,l_sel,n_top", [
    (64, 8, 4, 8, 4), (128, 16, 8, 16, 5), (256, 32, 16, 64, 6), (100, 8, 4, 8, 6),
])
def test_scorer_kernel_set_parity(S, l, d, l_sel, n_top):
    B, G, h, Dk = 2, 2, 4, 32
    np.random.seed(0)
    Q = jnp.asarray(np.random.randn(B, S, G, h, Dk), jnp.float32)
    S_cmp = max((S - l) // d + 1, 0)
    K_cmp = jnp.asarray(np.random.randn(B, G, S_cmp, Dk), jnp.float32)
    meta = build_block_meta(S, l, d, l_sel, n_top, 512)
    M = jnp.asarray(meta.M_csl)
    t_pos = jnp.arange(S, dtype=jnp.int32)
    nct = jnp.asarray(np.minimum(num_cmp_blocks(np.arange(1, S + 1), l, d), S_cmp),
                      jnp.int32)

    p_grp = selection_scores(Q, K_cmp, M, 0.2, nct)
    want = select_topn_blocks(p_grp, n_top, t_pos, l_sel)
    got = nsa_select_pallas(Q, K_cmp, M, scale=0.2, l=l, d=d, l_sel=l_sel,
                            n_top=n_top, interpret=True)
    assert got.shape == want.shape
    for i, (a, b) in enumerate(zip(_sets(got), _sets(want))):
        assert a == b, f"row {i}: kernel {a} != xla {b}"


def test_scorer_kernel_no_cmp_tokens():
    # S < l: forced blocks only
    B, S, G, h, Dk = 1, 6, 1, 2, 16
    Q = jnp.asarray(np.random.randn(B, S, G, h, Dk), jnp.float32)
    K_cmp = jnp.zeros((B, G, 0, Dk), jnp.float32)
    M = jnp.zeros((0, 1), jnp.float32)
    got = np.asarray(nsa_select_pallas(Q, K_cmp, M, scale=0.25, l=8, d=4, l_sel=8,
                                       n_top=3, interpret=True))
    for s in range(S):
        vals = set(got[0, s, 0][got[0, s, 0] >= 0].tolist())
        assert vals == {0}


def test_prefill_with_scorer_kernel_matches_reference():
    from nsa_vibe_tpu.core.config import NSAConfig
    from nsa_vibe_tpu.core.nsa import init_nsa_params, nsa_prefill

    cfg_ref = NSAConfig(dim=64, n_heads=4, n_kv_groups=2, d_k=16, d_v=16,
                        l=8, d=4, l_sel=8, n_sel=3, w=16, kernel="reference")
    cfg_pl = cfg_ref.replace(kernel="pallas")
    params = init_nsa_params(jax.random.PRNGKey(0), cfg_ref)
    x = jnp.asarray(np.random.randn(1, 64, 64), jnp.float32)
    out_ref, _ = nsa_prefill(params, x, cfg_ref)
    out_pl, aux = nsa_prefill(params, x, cfg_pl)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_ref), atol=2e-4)
    # aux sel_idx (set representation) selects the same blocks
    p = np.asarray(aux["sel_idx"])
    assert p.shape == (1, 64, 2, 3)


def test_fused_select_cmp_matches_separate():
    """Fused pass == separate scorer + cmp attention, fwd and grads."""
    import numpy as np

    from nsa_vibe_tpu.ops import reference as ref
    from nsa_vibe_tpu.ops.attention import fused_select_cmp
    from nsa_vibe_tpu.ops.block_index import build_block_meta, num_cmp_blocks
    from nsa_vibe_tpu.ops.selection import select_topn_blocks, selection_scores

    B, S, G, h, Dk = 2, 64, 2, 2, 32
    l, d, l_sel, n_top = 8, 4, 16, 4
    S_cmp = int(num_cmp_blocks(S, l, d))
    meta = build_block_meta(S, l, d, l_sel, n_top, 16)
    M = jnp.asarray(meta.M_csl[:S_cmp])
    key = jax.random.PRNGKey(0)
    Q = jax.random.normal(key, (B, S, G, h, Dk))
    Kc = jax.random.normal(jax.random.PRNGKey(1), (B, G, S_cmp, Dk))
    Vc = jax.random.normal(jax.random.PRNGKey(2), (B, G, S_cmp, Dk))
    t_pos = jnp.arange(S, dtype=jnp.int32)
    num_cmp_t = jnp.minimum(
        jnp.where(t_pos + 1 >= l, (t_pos + 1 - l) // d + 1, 0), S_cmp
    ).astype(jnp.int32)

    sel_f, O_f = fused_select_cmp(
        Q, Kc, Vc, M, scale=0.2, l=l, d=d, l_sel=l_sel, n_top=n_top,
        force_init=True, force_local=2, interpret=True)

    p_grp = selection_scores(Q, Kc, M, 0.2, num_cmp_t)
    sel_want = select_topn_blocks(p_grp, n_top, t_pos, l_sel)
    O_want = ref.compressed_attention(Q, Kc, Vc, num_cmp_t, 0.2)

    # set equality of selected blocks per row (the kernel's output is a
    # set representation: forced slots may duplicate, order unspecified)
    a = np.asarray(sel_f)
    b = np.asarray(sel_want)
    for idx in np.ndindex(B, S, G):
        sa = {int(v) for v in a[idx] if v >= 0}
        sb = {int(v) for v in b[idx] if v >= 0}
        assert sa == sb, (idx, sorted(sa), sorted(sb))
    assert float(jnp.abs(O_f - O_want).max()) < 1e-5

    # gradients flow through O only, matching the reference cmp vjp
    def loss_fused(q, k, v):
        _, O = fused_select_cmp(q, k, v, M, scale=0.2, l=l, d=d, l_sel=l_sel,
                                n_top=n_top, force_init=True, force_local=2,
                                interpret=True)
        return jnp.sum(O.astype(jnp.float32) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(ref.compressed_attention(q, k, v, num_cmp_t, 0.2) ** 2)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2))(Q, Kc, Vc)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(Q, Kc, Vc)
    for a, b in zip(g_f, g_r):
        assert float(jnp.abs(a - b).max()) < 1e-4
