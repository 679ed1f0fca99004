"""Varlen / document-masked batching (ops.varlen).

The defining property: with l_sel-aligned packing, every packed document
behaves EXACTLY as if it were alone in its own row — same RoPE positions,
same compression windows, same selection, no attention across document
boundaries (reference varlen surface: nsa/core/collate.py:6-44,
attention_kernels.py:391-702 — reproduced here with static shapes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsa_vibe_tpu.core.config import NSAConfig
from nsa_vibe_tpu.core.nsa import init_nsa_params, nsa_prefill
from nsa_vibe_tpu.ops.varlen import make_varlen_batches, pack_documents_aligned

CFG = NSAConfig(dim=64, n_heads=4, n_kv_groups=2, d_k=32, d_v=32,
                l=8, d=4, l_sel=16, n_sel=4, w=24, kernel="reference")

# packed layout: doc A = rows [0, 40) (padded to 48), doc B = rows
# [48, 98) (padded to 112), pad tail [112, 128)
LEN_A, LEN_B, S = 40, 50, 128
DS_ROW = np.concatenate([np.zeros(48), np.full(64, 48), np.full(16, 112)])


def _setup(key=0):
    params = init_nsa_params(jax.random.PRNGKey(key), CFG)
    x = jax.random.normal(jax.random.PRNGKey(key + 1), (1, S, CFG.dim))
    ds = jnp.asarray(DS_ROW, jnp.int32)[None, :]
    return params, x, ds


@pytest.mark.parametrize("kernel", ["reference", "pallas"])
def test_varlen_prefill_matches_solo_docs(kernel):
    """Packed-row outputs at each document's positions == the document
    run alone in its own row. Catches cross-document leakage, wrong
    RoPE restart, and wrong window/selection visibility in one shot."""
    cfg = CFG.replace(kernel=kernel)
    params, x, ds = _setup()
    out_packed, aux = jax.jit(
        lambda p, x, ds: nsa_prefill(p, x, cfg, seq_start=ds)
    )(params, x, ds)
    for start, ln in ((0, LEN_A), (48, LEN_B)):
        solo, _ = jax.jit(lambda p, xs: nsa_prefill(p, xs, cfg))(
            params, x[:, start:start + ln])
        got = np.asarray(out_packed[:, start:start + ln])
        want = np.asarray(solo)
        np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4,
                                   err_msg=f"doc@{start} kernel={kernel}")


def test_varlen_exact_zero_cross_document_influence():
    """cfg.varlen_exact: perturbing document A's tokens moves document
    B's outputs by EXACTLY 0.0 — including through the cmp branch, whose
    default O(S) cumsum pooling carries ~1 ulp of doc-A round-off (the
    masks are exact either way; this closes the last numeric channel —
    the isolation contract /root/reference/nsa/core/attention_kernels.py:
    391-702 aims at)."""
    params, x, ds = _setup()
    x_pert = x.at[:, :LEN_A].add(
        jax.random.normal(jax.random.PRNGKey(9), (1, LEN_A, CFG.dim)))

    def doc_b(cfg, xi):
        out, _ = jax.jit(lambda p, xs, d: nsa_prefill(p, xs, cfg, seq_start=d),
                         static_argnums=())(params, xi, ds)
        return np.asarray(out[:, 48:48 + LEN_B])

    # exact mode: bitwise-identical doc B under any doc A perturbation
    cfg_x = CFG.replace(varlen_exact=True, force_branch="cmp")
    np.testing.assert_array_equal(doc_b(cfg_x, x), doc_b(cfg_x, x_pert))
    # and not just because cmp ignores everything: doc A itself changed
    out_a1, _ = nsa_prefill(params, x, cfg_x, seq_start=ds)
    out_a2, _ = nsa_prefill(params, x_pert, cfg_x, seq_start=ds)
    assert float(jnp.abs(out_a1[:, :LEN_A] - out_a2[:, :LEN_A]).max()) > 0
    # full model (all branches) under exact pooling: also bitwise
    cfg_full = CFG.replace(varlen_exact=True)
    np.testing.assert_array_equal(doc_b(cfg_full, x), doc_b(cfg_full, x_pert))
    # exact pooling equals the default pooling to f32 round-off
    base, _ = nsa_prefill(params, x, CFG, seq_start=ds)
    ex, _ = nsa_prefill(params, x, cfg_full, seq_start=ds)
    assert float(jnp.abs(base - ex).max()) < 1e-5


def test_varlen_selection_is_doc_local():
    params, x, ds = _setup()
    _, aux = jax.jit(lambda p, x, ds: nsa_prefill(p, x, params_cfg(), seq_start=ds)
                     )(params, x, ds)
    sel = np.asarray(aux["sel_idx"])                       # [1,S,G,n]
    ds_np = np.asarray(ds[0])
    for t in range(S):
        first = ds_np[t] // CFG.l_sel
        row = sel[0, t]
        live = row[row >= 0]
        assert (live >= first).all() and (live * CFG.l_sel <= t).all(), (t, row)


def params_cfg():
    return CFG


def test_varlen_fused_scorer_matches_jnp_pipeline():
    """The fused Pallas scorer kernel under varlen selects the SAME block
    set as the jnp varlen pipeline (selection_scores_varlen ->
    select_topn_blocks_varlen), and its fused O_cmp equals
    compressed_attention_varlen — the doc-visibility contract threaded
    into ops/pallas/scorer.py."""
    from nsa_vibe_tpu.ops.attention import fused_select_cmp
    from nsa_vibe_tpu.ops.block_index import build_block_meta
    from nsa_vibe_tpu.ops.varlen import (
        compressed_attention_varlen,
        select_topn_blocks_varlen,
        selection_scores_varlen,
    )

    B, G, h, Dk = 2, 2, 4, 32
    l, d, l_sel, n_top, S = 8, 4, 16, 4, 128
    rng = np.random.RandomState(3)
    Q = jnp.asarray(rng.randn(B, S, G, h, Dk), jnp.float32)
    ds_np = np.zeros((B, S), np.int32)
    ds_np[0, 48:] = 48                       # doc boundary at 48 (l_sel-aligned)
    ds_np[1, 80:] = 80
    ds = jnp.asarray(ds_np)
    meta = build_block_meta(S, l, d, l_sel, n_top, 512)
    S_cmp = meta.S_cmp
    M = jnp.asarray(meta.M_csl[:S_cmp])
    K_cmp = jnp.asarray(rng.randn(B, G, S_cmp, Dk), jnp.float32)
    V_cmp = jnp.asarray(rng.randn(B, G, S_cmp, Dk), jnp.float32)
    t_pos = jnp.arange(S, dtype=jnp.int32)

    sel_f, O_f = fused_select_cmp(
        Q, K_cmp, V_cmp, M, scale=0.2, l=l, d=d, l_sel=l_sel, n_top=n_top,
        force_init=True, force_local=2, seq_start=ds, interpret=True)

    p_grp = selection_scores_varlen(Q, K_cmp, M, 0.2, t_pos, ds, l, d)
    sel_want = select_topn_blocks_varlen(p_grp, n_top, t_pos, ds, l_sel)
    O_want = compressed_attention_varlen(Q, K_cmp, V_cmp, t_pos, ds, l, d, 0.2)

    a, b = np.asarray(sel_f), np.asarray(sel_want)
    for idx in np.ndindex(B, S, G):
        sa = {int(v) for v in a[idx] if v >= 0}
        sb = {int(v) for v in b[idx] if v >= 0}
        assert sa == sb, (idx, sorted(sa), sorted(sb), int(ds_np[idx[0], idx[1]]))
    assert float(jnp.abs(O_f - O_want).max()) < 1e-5

    # grads through the fused varlen O_cmp match the jnp varlen oracle
    def loss_f(q, k, v):
        _, O = fused_select_cmp(q, k, v, M, scale=0.2, l=l, d=d, l_sel=l_sel,
                                n_top=n_top, force_init=True, force_local=2,
                                seq_start=ds, interpret=True)
        return jnp.sum(O.astype(jnp.float32) ** 2)

    def loss_r(q, k, v):
        return jnp.sum(compressed_attention_varlen(q, k, v, t_pos, ds, l, d, 0.2) ** 2)

    g_f = jax.grad(loss_f, argnums=(0, 1, 2))(Q, K_cmp, V_cmp)
    g_r = jax.grad(loss_r, argnums=(0, 1, 2))(Q, K_cmp, V_cmp)
    for x_, y_ in zip(g_f, g_r):
        assert float(jnp.abs(x_ - y_).max()) < 1e-4


def test_varlen_selection_is_doc_local_pallas():
    """Doc-locality of sel_idx through the FUSED pallas scorer path."""
    params, x, ds = _setup()
    cfg = CFG.replace(kernel="pallas")
    _, aux = jax.jit(lambda p, x, ds: nsa_prefill(p, x, cfg, seq_start=ds)
                     )(params, x, ds)
    sel = np.asarray(aux["sel_idx"])
    ds_np = np.asarray(ds[0])
    for t in range(S):
        first = ds_np[t] // CFG.l_sel
        row = sel[0, t]
        live = row[row >= 0]
        assert (live >= first).all() and (live * CFG.l_sel <= t).all(), (t, row)


def test_varlen_gradients_pallas_match_reference():
    params, x, ds = _setup()

    def loss(p, kernel):
        out, _ = nsa_prefill(p, x, CFG.replace(kernel=kernel), seq_start=ds)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    g_r = jax.jit(jax.grad(loss), static_argnums=1)(params, "reference")
    g_p = jax.jit(jax.grad(loss), static_argnums=1)(params, "pallas")
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(g_r),
                            jax.tree_util.tree_leaves(g_p)):
        mae = float(jnp.abs(a - b).mean())
        scale = float(jnp.abs(a).mean()) + 1e-8
        assert mae / scale < 2e-4, f"{path}: rel grad MAE {mae / scale}"


def test_pack_documents_aligned():
    docs = [np.arange(1, 41), np.arange(100, 150), np.arange(7, 20)]
    toks, ds, lm = pack_documents_aligned(docs, seq_len=128, align=16,
                                          batch_size=1)
    assert toks.shape[1] == 129 and ds.shape[1] == 128
    # every document start is aligned and its tokens carry its start
    assert (np.unique(ds) % 16 == 0).all()
    # first doc at offset 0: 40 tokens, 39 supervised positions
    assert toks[0, :40].tolist() == list(range(1, 41))
    assert lm[0, :39].all() and not lm[0, 39]
    assert (ds[0, :40] == 0).all()
    # second doc starts at 48 (40 rounded up to 16-multiple)
    assert toks[0, 48] == 100 and (ds[0, 48:98] == 48).all()
    # loss never crosses a document: supervised positions' NEXT token is
    # inside the same document
    for b in range(toks.shape[0]):
        for t in np.nonzero(lm[b])[0]:
            assert ds[b, t] == ds[b, min(t + 1, 127)] or lm[b, t] == 0


def test_make_varlen_batches_synthetic():
    gen = make_varlen_batches("synthetic", seq_len=64, batch_size=2, align=16)
    toks, ds, lm = next(gen)
    assert toks.shape == (2, 65) and ds.shape == (2, 64) and lm.shape == (2, 64)
    assert (ds % 16 == 0).all()
    assert lm.sum() > 0


def test_varlen_context_parallel_forward_matches_single_device():
    """varlen + sequence parallelism: the CP model forward with document
    masking must equal the single-device varlen forward (doc-local RoPE
    and masks survive sequence sharding; runs on the 8-virtual-device
    CPU mesh)."""
    import numpy as np

    from nsa_vibe_tpu.core.config import ModelConfig
    from nsa_vibe_tpu.models.tinylm import init_model_params, model_forward
    from nsa_vibe_tpu.parallel.context import context_parallel_model_forward
    from nsa_vibe_tpu.parallel.mesh import make_mesh

    mcfg = ModelConfig(vocab_size=256, n_layers=2, nsa=CFG, dtype="float32")
    params = init_model_params(jax.random.PRNGKey(0), mcfg)
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (2, S)), jnp.int32)
    ds = jnp.broadcast_to(jnp.asarray(DS_ROW, jnp.int32)[None, :], (2, S))
    mesh = make_mesh(sp=4, devices=jax.devices()[:4])
    want, _ = jax.jit(
        lambda p, t, d: model_forward(p, t, mcfg, seq_start=d)
    )(params, tokens, ds)
    got = jax.jit(
        lambda p, t, d: context_parallel_model_forward(
            p, t, mcfg, mesh, seq_start=d)
    )(params, tokens, ds)
    mae = float(jnp.abs(got - want).mean())
    assert mae < 2e-5, f"varlen cp model fwd MAE {mae}"


def test_varlen_cp_train_step_loss_matches():
    """A varlen dp-only step and a varlen dp x sp step compute the same
    masked loss and gate stats."""
    import numpy as np

    from nsa_vibe_tpu.core.config import ModelConfig, TrainConfig
    from nsa_vibe_tpu.models.tinylm import init_model_params
    from nsa_vibe_tpu.parallel.mesh import make_mesh
    from nsa_vibe_tpu.parallel.train_step import build_state_and_step

    mcfg = ModelConfig(vocab_size=256, n_layers=1, nsa=CFG, dtype="float32")
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, 256, (1, 2, S + 1)), jnp.int32)
    ds = jnp.broadcast_to(jnp.asarray(DS_ROW, jnp.int32)[None, None, :],
                          (1, 2, S)).astype(jnp.int32)
    lm = jnp.asarray((rng.random((1, 2, S)) > 0.2).astype(np.float32))
    losses = []
    for sp in (1, 4):
        params = init_model_params(jax.random.PRNGKey(0), mcfg)
        tcfg = TrainConfig(steps=2, batch_size=2, seq_len=S, sp=sp, varlen=True)
        mesh = make_mesh(dp=2, sp=sp, devices=jax.devices()[:2 * sp])
        step_fn, state, batch_shard = build_state_and_step(params, mcfg, tcfg, mesh)
        batch = jax.device_put((toks, ds, lm), batch_shard)
        state, m1 = step_fn(state, batch)
        state, m2 = step_fn(state, batch)
        losses.append((float(m1["loss"]), float(m2["loss"]),
                       float(m1["gate_entropy"]), float(m1["sel_k_mean"])))
    assert np.allclose(losses[0], losses[1], rtol=2e-4), losses
