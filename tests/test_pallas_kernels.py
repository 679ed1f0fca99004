"""Pallas kernel parity vs the jnp reference oracles (interpret mode on
CPU — the same kernels compile under Mosaic on TPU; see bench logs).

Coverage model: the reference's Triton/FA-2 parity suites
(test_triton_sel_parity, test_fa2_parity) with fp32 tolerance <= 1e-4.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsa_vibe_tpu.ops import reference as ref
from nsa_vibe_tpu.ops.block_index import num_cmp_blocks
from nsa_vibe_tpu.ops.pallas.flash import (
    compressed_attention_pallas,
    sliding_window_attention_pallas,
)
from nsa_vibe_tpu.ops.pallas.selection import selection_attention_pallas
from nsa_vibe_tpu.ops.selection import select_topn_blocks

TOL = 2e-5


def _rand(*shape, dt=jnp.float32):
    return jnp.asarray(np.random.randn(*shape), dt)


@pytest.mark.parametrize("S,w", [(64, 16), (64, 64), (100, 32), (32, 256)])
def test_win_parity(S, w):
    B, G, h, Dk, Dv = 2, 2, 4, 32, 32
    Q, K, V = _rand(B, S, G, h, Dk), _rand(B, G, S, Dk), _rand(B, G, S, Dv)
    t = jnp.arange(S, dtype=jnp.int32)
    want = ref.sliding_window_attention(Q, K, V, t, w, 0.2)
    got = sliding_window_attention_pallas(Q, K, V, w, 0.2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=TOL)


@pytest.mark.parametrize("S,l,d", [(64, 8, 4), (100, 16, 8), (48, 32, 16)])
def test_cmp_parity(S, l, d):
    B, G, h, Dk, Dv = 1, 2, 2, 32, 32
    S_cmp = max(0, (S - l) // d + 1)
    if S_cmp == 0:
        pytest.skip("no cmp tokens")
    Q = _rand(B, S, G, h, Dk)
    Kc, Vc = _rand(B, G, S_cmp, Dk), _rand(B, G, S_cmp, Dv)
    nct = jnp.asarray(
        np.minimum(num_cmp_blocks(np.arange(1, S + 1), l, d), S_cmp), jnp.int32
    )
    want = ref.compressed_attention(Q, Kc, Vc, nct, 0.2)
    got = compressed_attention_pallas(Q, Kc, Vc, l, d, 0.2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=TOL)
    # early rows (t+1 < l) must be exactly zero in both
    if l > 1:
        assert float(jnp.abs(got[:, : l - 1]).max()) == 0.0


@pytest.mark.parametrize("S,l_sel,n_top", [(64, 8, 4), (128, 16, 5), (64, 8, 12)])
def test_sel_parity(S, l_sel, n_top):
    B, G, h, Dk, Dv = 2, 2, 4, 32, 32
    Q, K, V = _rand(B, S, G, h, Dk), _rand(B, G, S, Dk), _rand(B, G, S, Dv)
    t = jnp.arange(S, dtype=jnp.int32)
    S_sel = (S + l_sel - 1) // l_sel
    p_grp = jnp.asarray(np.random.rand(B, S, G, S_sel), jnp.float32)
    sel = select_topn_blocks(p_grp, n_top, t, l_sel)
    want = ref.selection_attention(Q, K, V, sel, t, l_sel, 0.2)
    got = selection_attention_pallas(Q, K, V, sel, t, l_sel=l_sel, scale=0.2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=TOL)


def test_sel_q_chunking_matches_single_call():
    B, S, G, h, D = 1, 64, 1, 2, 16
    Q, K, V = _rand(B, S, G, h, D), _rand(B, G, S, D), _rand(B, G, S, D)
    t = jnp.arange(S, dtype=jnp.int32)
    sel = select_topn_blocks(jnp.asarray(np.random.rand(B, S, G, 8), jnp.float32), 4, t, 8)
    a = selection_attention_pallas(Q, K, V, sel, t, l_sel=8, scale=0.25, interpret=True,
                                   q_chunk=16)
    b = selection_attention_pallas(Q, K, V, sel, t, l_sel=8, scale=0.25, interpret=True,
                                   q_chunk=1024)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=TOL)


@pytest.mark.parametrize("S,l_sel,n_top,Tq", [(64, 8, 4, 16), (100, 8, 6, 32), (128, 16, 5, 128)])
def test_sel_flash_parity(S, l_sel, n_top, Tq):
    from nsa_vibe_tpu.ops.pallas.sel_flash import selection_flash_pallas

    B, G, h, Dk, Dv = 2, 2, 4, 32, 32
    Q, K, V = _rand(B, S, G, h, Dk), _rand(B, G, S, Dk), _rand(B, G, S, Dv)
    t = jnp.arange(S, dtype=jnp.int32)
    S_sel = (S + l_sel - 1) // l_sel
    sel = select_topn_blocks(jnp.asarray(np.random.rand(B, S, G, S_sel), jnp.float32),
                             n_top, t, l_sel)
    want = ref.selection_attention(Q, K, V, sel, t, l_sel, 0.2)
    got = selection_flash_pallas(Q, K, V, sel, l_sel=l_sel, scale=0.2,
                                 block_q=Tq, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=TOL)


def test_sel_flash_pos_offset():
    # decode-continuation style: query rows at absolute positions offset+s
    from nsa_vibe_tpu.ops.pallas.sel_flash import selection_flash_pallas

    B, G, h, D, S_kv, S = 1, 1, 2, 16, 128, 32
    off = 64
    Q, K, V = _rand(B, S, G, h, D), _rand(B, G, S_kv, D), _rand(B, G, S_kv, D)
    t = jnp.arange(off, off + S, dtype=jnp.int32)
    sel = select_topn_blocks(jnp.asarray(np.random.rand(B, S, G, 16), jnp.float32), 5, t, 8)
    want = ref.selection_attention(Q, K, V, sel, t, 8, 0.25)
    got = selection_flash_pallas(Q, K, V, sel, l_sel=8, scale=0.25,
                                 pos_offset=off, block_q=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=TOL)


def test_sel_single_query_decode_shape():
    # decode form: S=1 with traced t
    B, G, h, D = 1, 2, 4, 32
    S_kv = 128
    Q = _rand(B, 1, G, h, D)
    K, V = _rand(B, G, S_kv, D), _rand(B, G, S_kv, D)
    sel = jnp.array([[[[0, 3, -1, -1]]] * G], jnp.int32).reshape(B, 1, G, 4)
    t = jnp.array([100], jnp.int32)
    want = ref.selection_attention(Q, K, V, sel, t, 16, 0.2)
    got = selection_attention_pallas(Q, K, V, sel, t, l_sel=16, scale=0.2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=TOL)


def test_sel_gather_kernel_ragged_per_row_t():
    """Per-row positions (t_pos [B, S]): each batch row decoding at its
    own depth must equal the same row run alone with a scalar t — the
    serving/continuous-batching kernel path (r3)."""
    B, G, h, D, S_kv = 3, 2, 4, 32, 128
    l_sel, n = 16, 4
    Q, K, V = _rand(B, 1, G, h, D), _rand(B, G, S_kv, D), _rand(B, G, S_kv, D)
    depths = jnp.array([5, 37, 100], jnp.int32)
    sel = jnp.stack([
        jnp.array([[0, -1, -1, -1]] * G, jnp.int32),        # t=5: block 0 only
        jnp.array([[0, 1, 2, -1]] * G, jnp.int32),          # t=37
        jnp.array([[0, 2, 5, 6]] * G, jnp.int32),           # t=100
    ])[:, None]                                             # [B,1,G,n]
    got = selection_attention_pallas(Q, K, V, sel, depths[:, None],
                                     l_sel=l_sel, scale=0.2, interpret=True)
    for i in range(B):
        want = selection_attention_pallas(
            Q[i:i + 1], K[i:i + 1], V[i:i + 1], sel[i:i + 1],
            depths[i:i + 1], l_sel=l_sel, scale=0.2, interpret=True)
        np.testing.assert_allclose(np.asarray(got[i:i + 1]), np.asarray(want),
                                   atol=TOL, err_msg=f"row {i}")
    # and against the jnp oracle per row
    for i in range(B):
        want = ref.selection_attention(Q[i:i + 1], K[i:i + 1], V[i:i + 1],
                                       sel[i:i + 1], depths[i:i + 1], l_sel, 0.2)
        np.testing.assert_allclose(np.asarray(got[i:i + 1]), np.asarray(want),
                                   atol=TOL, err_msg=f"oracle row {i}")


def test_dispatch_layer_pallas_matches_reference_grads():
    # custom_vjp: pallas fwd + reference-recompute bwd == reference grads
    from nsa_vibe_tpu.ops import attention as attn

    B, S, G, h, D = 1, 32, 1, 2, 16
    Q, K, V = _rand(B, S, G, h, D), _rand(B, G, S, D), _rand(B, G, S, D)
    t = jnp.arange(S, dtype=jnp.int32)

    def loss_pl(q, k, v):
        return jnp.sum(attn.sliding_window_attention(q, k, v, t, 8, 0.25, kernel="pallas") ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(ref.sliding_window_attention(q, k, v, t, 8, 0.25) ** 2)

    g1 = jax.grad(loss_pl, argnums=(0, 1, 2))(Q, K, V)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(Q, K, V)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_prefill_kernel_config_parity():
    # whole NSA prefill: kernel="pallas" (interpret) == kernel="reference"
    from nsa_vibe_tpu.core.config import NSAConfig
    from nsa_vibe_tpu.core.nsa import init_nsa_params, nsa_prefill

    cfg_ref = NSAConfig(dim=64, n_heads=4, n_kv_groups=2, d_k=16, d_v=16,
                        l=8, d=4, l_sel=8, n_sel=3, w=16, kernel="reference")
    cfg_pl = cfg_ref.replace(kernel="pallas")
    params = init_nsa_params(jax.random.PRNGKey(0), cfg_ref)
    x = _rand(1, 48, 64)
    out_ref, _ = nsa_prefill(params, x, cfg_ref)
    out_pl, _ = nsa_prefill(params, x, cfg_pl)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_ref), atol=1e-4)


@pytest.mark.parametrize("n_heads,groups", [(3, 1), (6, 2), (12, 4)])
def test_odd_heads_prefill_parity(n_heads, groups):
    """kernel='pallas' must work for ANY heads-per-group, odd h=3
    included (VERDICT r1 #2; reference sel_fwd.py:453-456 takes any
    H<=16). Dispatch pads Q with a zero head and slices the output."""
    from nsa_vibe_tpu.core.config import NSAConfig
    from nsa_vibe_tpu.core.nsa import init_nsa_params, nsa_prefill

    cfg = NSAConfig(dim=64, n_heads=n_heads, n_kv_groups=groups,
                    d_k=32, d_v=32, l=8, d=4, l_sel=16, n_sel=4, w=16,
                    kernel="pallas")
    params = init_nsa_params(jax.random.PRNGKey(0), cfg)
    x = _rand(2, 64, cfg.dim)
    got, aux_p = jax.jit(lambda p, x: nsa_prefill(p, x, cfg))(params, x)
    want, aux_r = jax.jit(
        lambda p, x: nsa_prefill(p, x, cfg.replace(kernel="reference"))
    )(params, x)
    # selection must agree as a set per row (scorer emits forced-first
    # order with possible duplicates; -1 = padding)
    def _sets(sel):
        flat = np.asarray(sel).reshape(-1, sel.shape[-1])
        return [set(int(v) for v in row if v >= 0) for row in flat]

    mismatch = sum(a != b for a, b in zip(_sets(aux_p["sel_idx"]),
                                          _sets(aux_r["sel_idx"])))
    assert mismatch == 0, f"{mismatch} selection-set mismatches"
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=1e-4)


def test_odd_heads_gradients_match():
    """The zero pad head must contribute exactly zero to dK/dV."""
    from nsa_vibe_tpu.core.config import NSAConfig
    from nsa_vibe_tpu.core.nsa import init_nsa_params, nsa_prefill

    cfg = NSAConfig(dim=64, n_heads=3, n_kv_groups=1, d_k=32, d_v=32,
                    l=8, d=4, l_sel=16, n_sel=4, w=16, kernel="pallas")
    params = init_nsa_params(jax.random.PRNGKey(0), cfg)
    x = _rand(1, 64, cfg.dim)

    def loss(p, x, kernel):
        out, _ = nsa_prefill(p, x, cfg.replace(kernel=kernel))
        return jnp.mean(out.astype(jnp.float32) ** 2)

    g_p = jax.jit(jax.grad(loss), static_argnums=2)(params, x, "pallas")
    g_r = jax.jit(jax.grad(loss), static_argnums=2)(params, x, "reference")
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(g_p),
                            jax.tree_util.tree_leaves(g_r)):
        mae = float(jnp.abs(a - b).mean())
        scale = float(jnp.abs(b).mean()) + 1e-8
        assert mae / scale < 2e-4, f"{path}: rel grad MAE {mae / scale}"
