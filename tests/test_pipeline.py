"""Pipeline-parallel (GPipe microbatch) parity.

Runs on the 8-virtual-device CPU mesh (conftest). Oracle: single-device
model_forward + cross_entropy_loss. Covers loss parity, gradient parity
(stage-sharded block grads AND psum'd replicated embed/head grads),
gate/selection observability, and the integrated train step.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsa_vibe_tpu.core.config import ModelConfig, NSAConfig, TrainConfig
from nsa_vibe_tpu.models.tinylm import (
    cross_entropy_loss,
    init_model_params,
    model_forward,
)
from nsa_vibe_tpu.parallel.mesh import make_mesh
from nsa_vibe_tpu.parallel.pipeline import (
    pipeline_model_loss,
    stack_blocks,
    unstack_blocks,
)
from nsa_vibe_tpu.parallel.train_step import build_state_and_step

NSA = NSAConfig(dim=64, n_heads=4, n_kv_groups=2, d_k=32, d_v=32,
                l=8, d=4, l_sel=16, n_sel=4, w=16, kernel="reference")
MCFG = ModelConfig(vocab_size=61, n_layers=4, nsa=NSA, dtype="float32")


def _setup(B=4, S=64, mcfg=MCFG, seed=0):
    params = init_model_params(jax.random.PRNGKey(seed), mcfg)
    toks = jax.random.randint(jax.random.PRNGKey(seed + 1), (B, S + 1),
                              0, mcfg.vocab_size, jnp.int32)
    return params, toks


def _ref_loss(params, toks, mcfg=MCFG):
    logits, _ = model_forward(params, toks[:, :-1], mcfg)
    return cross_entropy_loss(logits, toks[:, 1:])


@pytest.mark.parametrize("pp,dp,M", [(2, 1, 2), (4, 2, 2), (4, 1, 4), (2, 4, 1)])
def test_pp_loss_matches_single_device(pp, dp, M):
    params, toks = _setup()
    mesh = make_mesh(dp=dp, pp=pp, devices=jax.devices()[: dp * pp])
    ref = float(jax.jit(_ref_loss)(params, toks))
    got = float(jax.jit(
        lambda p, t: pipeline_model_loss(p, t, MCFG, mesh, microbatches=M)[0]
    )(stack_blocks(params), toks))
    assert abs(got - ref) < 1e-5, (pp, dp, M, got, ref)


def test_pp_gradients_match():
    params, toks = _setup()
    mesh = make_mesh(dp=2, pp=4, devices=jax.devices()[:8])
    g_ref = jax.jit(jax.grad(_ref_loss))(params, toks)
    g_pp = jax.jit(jax.grad(
        lambda p, t: pipeline_model_loss(p, t, MCFG, mesh, microbatches=2)[0]
    ))(stack_blocks(params), toks)
    g_pp = unstack_blocks(g_pp, MCFG.n_layers)
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves(g_pp),
    ):
        mae = float(jnp.abs(jnp.asarray(a) - jnp.asarray(b)).max())
        scale = float(jnp.abs(jnp.asarray(a)).max()) + 1e-8
        assert mae / scale < 1e-4, (jax.tree_util.keystr(path), mae, scale)


def test_pp_collect_aux_matches():
    params, toks = _setup()
    mesh = make_mesh(dp=1, pp=4, devices=jax.devices()[:4])
    logits, auxes = jax.jit(
        lambda p, t: model_forward(p, t, MCFG, collect_aux=True)
    )(params, toks[:, :-1])
    gates_ref = jnp.stack([a["gates"] for a in auxes]).astype(jnp.float32)
    sel_ref = jnp.stack([a["sel_idx"] for a in auxes])
    _, (gates, sel) = jax.jit(
        lambda p, t: pipeline_model_loss(p, t, MCFG, mesh, collect_aux=True)
    )(stack_blocks(params), toks)
    assert gates.shape == gates_ref.shape
    # selection block ids are exact ints; gate probabilities to fp tol
    np.testing.assert_array_equal(np.asarray(sel), np.asarray(sel_ref))
    assert float(jnp.abs(gates - gates_ref).max()) < 1e-5


def test_pp_train_step_matches_dp():
    """Two steps of the integrated pp train step == the plain dp train
    step (same tokens, same init): loss metric and updated params."""
    params, _ = _setup()
    tcfg = TrainConfig(steps=4, batch_size=4, seq_len=64, accum_steps=2,
                       lr=1e-3, warmup_steps=1, gate_stats=True)
    toks = jax.random.randint(jax.random.PRNGKey(7), (2, 2, 4, 65),
                              0, MCFG.vocab_size, jnp.int32)

    mesh_dp = make_mesh(dp=4, devices=jax.devices()[:4])
    step_dp, state_dp, shard_dp = build_state_and_step(
        params, MCFG, tcfg, mesh_dp)

    tcfg_pp = dataclasses.replace(tcfg, pp=2, dp=2)
    mesh_pp = make_mesh(dp=2, pp=2, devices=jax.devices()[:4])
    # fresh init (same seed): donation of one state must not delete the
    # other's replicated buffers
    params2 = init_model_params(jax.random.PRNGKey(0), MCFG)
    step_pp, state_pp, shard_pp = build_state_and_step(
        params2, MCFG, tcfg_pp, mesh_pp)

    m_dp = m_pp = None
    for i in range(2):
        state_dp, m_dp = step_dp(state_dp, jax.device_put(toks[i], shard_dp))
        state_pp, m_pp = step_pp(state_pp, jax.device_put(toks[i], shard_pp))
        assert abs(float(m_dp["loss"]) - float(m_pp["loss"])) < 1e-5, i
        assert bool(m_pp["good"])
    # gate observability stays live under pp
    assert float(m_pp["gate_entropy"]) > 0
    assert abs(float(m_dp["gate_entropy"]) - float(m_pp["gate_entropy"])) < 1e-5
    p_dp = jax.tree_util.tree_leaves(state_dp.params)
    p_pp = jax.tree_util.tree_leaves(
        unstack_blocks(state_pp.params, MCFG.n_layers))
    for a, b in zip(p_dp, p_pp):
        assert float(jnp.abs(a - b).max()) < 1e-5


def test_pp_rejects_bad_composition():
    params, _ = _setup()
    # tcfg/mesh axis mismatch is loud (sp=2 requested, mesh has no sp axis)
    tcfg = TrainConfig(steps=1, batch_size=4, seq_len=64, pp=2, sp=2)
    mesh = make_mesh(dp=2, pp=2, devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="mesh"):
        build_state_and_step(params, MCFG, tcfg, mesh)
    # pp x sp x tp in one mesh is SUPPORTED since r5 (test_pp_sp_tp_*);
    # only genuinely invalid shapes stay loud:
    with pytest.raises(ValueError, match="divisible"):
        pipeline_model_loss(stack_blocks(params),
                            jnp.zeros((4, 65), jnp.int32),
                            dataclasses.replace(MCFG, n_layers=3),
                            mesh)
    with pytest.raises(ValueError, match="together"):
        pipeline_model_loss(stack_blocks(params),
                            jnp.zeros((4, 65), jnp.int32), MCFG, mesh,
                            seq_start=jnp.zeros((4, 64), jnp.int32))


def test_pp_varlen_train_step_matches_dp():
    """pp x varlen (the packed-data configuration pod training actually
    runs): two integrated steps of --pp 2 --varlen equal the plain
    dp+varlen step — masked loss, gate stats, and updated params."""
    S = 64
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, MCFG.vocab_size, (2, 1, 4, S + 1)),
                       jnp.int32)
    # two l_sel-aligned documents per row: [0, 32) and [32, 64)
    ds_row = np.concatenate([np.zeros(32), np.full(32, 32)])
    ds = jnp.broadcast_to(jnp.asarray(ds_row, jnp.int32), (2, 1, 4, S))
    lm = jnp.asarray((rng.random((2, 1, 4, S)) > 0.2).astype(np.float32))

    tcfg = TrainConfig(steps=4, batch_size=4, seq_len=S, lr=1e-3,
                       warmup_steps=1, varlen=True, gate_stats=True)
    mesh_dp = make_mesh(dp=4, devices=jax.devices()[:4])
    step_dp, state_dp, shard_dp = build_state_and_step(
        _setup()[0], MCFG, tcfg, mesh_dp)

    tcfg_pp = dataclasses.replace(tcfg, pp=2, dp=2, pp_microbatches=2)
    mesh_pp = make_mesh(dp=2, pp=2, devices=jax.devices()[:4])
    step_pp, state_pp, shard_pp = build_state_and_step(
        init_model_params(jax.random.PRNGKey(0), MCFG), MCFG, tcfg_pp, mesh_pp)

    m_dp = m_pp = None
    for i in range(2):
        batch = (toks[i], ds[i], lm[i])
        state_dp, m_dp = step_dp(state_dp, jax.device_put(batch, shard_dp))
        state_pp, m_pp = step_pp(state_pp, jax.device_put(batch, shard_pp))
        assert abs(float(m_dp["loss"]) - float(m_pp["loss"])) < 1e-5, i
        assert bool(m_pp["good"])
    assert int(m_pp["tokens"]) == int(lm[1].sum())
    assert abs(float(m_dp["gate_entropy"]) - float(m_pp["gate_entropy"])) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(state_dp.params),
                    jax.tree_util.tree_leaves(
                        unstack_blocks(state_pp.params, MCFG.n_layers))):
        assert float(jnp.abs(a - b).max()) < 1e-5


def test_pp_remat_and_bf16():
    """Pipeline under remat + bf16 compute stays finite and close to the
    non-pp bf16 loss (the m7c production settings)."""
    mcfg = dataclasses.replace(MCFG, dtype="bfloat16", remat=True)
    params, toks = _setup(mcfg=mcfg)
    mesh = make_mesh(dp=1, pp=4, devices=jax.devices()[:4])
    ref = float(jax.jit(lambda p, t: _ref_loss(p, t, mcfg))(params, toks))
    got = float(jax.jit(
        lambda p, t: pipeline_model_loss(p, t, mcfg, mesh)[0]
    )(stack_blocks(params), toks))
    assert np.isfinite(got)
    assert abs(got - ref) < 2e-2, (got, ref)


def test_pp_checkpoint_roundtrip(tmp_path):
    """Stacked-stage params + optimizer state survive an Orbax save/
    restore with the pp shardings (sharded-restore contract)."""
    from nsa_vibe_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    params, toks = _setup()
    tcfg = TrainConfig(steps=2, batch_size=4, seq_len=64, pp=2, dp=2,
                       lr=1e-3, warmup_steps=1)
    mesh = make_mesh(dp=2, pp=2, devices=jax.devices()[:4])
    step_fn, state, shard = build_state_and_step(params, MCFG, tcfg, mesh)
    batch = jax.random.randint(jax.random.PRNGKey(3), (1, 4, 65),
                               0, MCFG.vocab_size, jnp.int32)
    state, _ = step_fn(state, jax.device_put(batch, shard))
    save_checkpoint(str(tmp_path), 1, state)

    params2 = init_model_params(jax.random.PRNGKey(0), MCFG)
    _, state2, _ = build_state_and_step(params2, MCFG, tcfg, mesh)
    restored = restore_checkpoint(str(tmp_path), state2)
    assert int(restored.step) == 1
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pp_fsdp_parity_and_sharding():
    """pp + fsdp (ZeRO-3 over dp inside stages): loss/grads match plain
    pp, and the stacked block leaves are actually dp-sharded."""
    from jax.sharding import PartitionSpec as P

    from nsa_vibe_tpu.parallel.pipeline import pipeline_param_shardings

    params, toks = _setup()
    mesh = make_mesh(dp=2, pp=4, devices=jax.devices()[:8])
    stacked = stack_blocks(params)

    loss_fn = lambda fsdp: (lambda p, t: pipeline_model_loss(
        p, t, MCFG, mesh, microbatches=2, fsdp=fsdp, fsdp_min=32)[0])
    ref = float(jax.jit(loss_fn(False))(stacked, toks))
    placed = jax.device_put(
        stacked, pipeline_param_shardings(stacked, mesh, fsdp=True, fsdp_min=32))
    got = float(jax.jit(loss_fn(True))(placed, toks))
    assert abs(got - ref) < 1e-5, (got, ref)

    spec = placed["blocks"]["mlp"]["w_in"].sharding.spec
    assert "dp" in tuple(spec), spec     # weights genuinely ZeRO-sharded

    g_ref = jax.jit(jax.grad(loss_fn(False)))(stacked, toks)
    g_fsdp = jax.jit(jax.grad(loss_fn(True)))(placed, toks)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_fsdp)):
        mae = float(jnp.abs(a - b).max())
        scale = float(jnp.abs(a).max()) + 1e-8
        assert mae / scale < 1e-4, (mae, scale)


def test_pp_fsdp_train_step():
    """Integrated pp+fsdp train step: loss matches plain-pp step and the
    optimizer state inherits the dp sharding."""
    params, _ = _setup()
    toks = jax.random.randint(jax.random.PRNGKey(7), (1, 4, 65),
                              0, MCFG.vocab_size, jnp.int32)
    tcfg = TrainConfig(steps=2, batch_size=4, seq_len=64, lr=1e-3,
                       warmup_steps=1, pp=2, dp=2, pp_microbatches=2)
    mesh = make_mesh(dp=2, pp=2, devices=jax.devices()[:4])
    step_a, state_a, shard_a = build_state_and_step(params, MCFG, tcfg, mesh)

    params2 = init_model_params(jax.random.PRNGKey(0), MCFG)
    tcfg_f = dataclasses.replace(tcfg, fsdp=True, fsdp_min_size=32)
    step_f, state_f, shard_f = build_state_and_step(params2, MCFG, tcfg_f, mesh)

    _, m_a = step_a(state_a, jax.device_put(toks, shard_a))
    state_f2, m_f = step_f(state_f, jax.device_put(toks, shard_f))
    assert abs(float(m_a["loss"]) - float(m_f["loss"])) < 1e-5
    spec = state_f2.params["blocks"]["mlp"]["w_in"].sharding.spec
    assert "dp" in tuple(spec), spec


@pytest.mark.parametrize("pp,sp,dp,M", [(2, 2, 1, 2), (2, 2, 2, 2), (2, 4, 1, 2)])
def test_pp_sp_loss_matches_single_device(pp, sp, dp, M):
    """pp x sp (pipeline stages x sequence shards — the pod long-context
    configuration): loss equals the single-device oracle."""
    params, toks = _setup()
    mesh = make_mesh(dp=dp, pp=pp, sp=sp, devices=jax.devices()[: dp * pp * sp])
    ref = float(jax.jit(_ref_loss)(params, toks))
    got = float(jax.jit(
        lambda p, t: pipeline_model_loss(p, t, MCFG, mesh, microbatches=M)[0]
    )(stack_blocks(params), toks))
    assert abs(got - ref) < 1e-5, (pp, sp, dp, M, got, ref)


def test_pp_sp_gradients_match():
    params, toks = _setup()
    mesh = make_mesh(dp=2, pp=2, sp=2, devices=jax.devices()[:8])
    g_ref = jax.jit(jax.grad(_ref_loss))(params, toks)
    g_pp = jax.jit(jax.grad(
        lambda p, t: pipeline_model_loss(p, t, MCFG, mesh, microbatches=2)[0]
    ))(stack_blocks(params), toks)
    g_pp = unstack_blocks(g_pp, MCFG.n_layers)
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves(g_pp),
    ):
        mae = float(jnp.abs(jnp.asarray(a) - jnp.asarray(b)).max())
        scale = float(jnp.abs(jnp.asarray(a)).max()) + 1e-8
        assert mae / scale < 1e-4, (jax.tree_util.keystr(path), mae, scale)


def test_pp_sp_train_step_matches_dp():
    """Integrated pp=2 x sp=2 x dp=2 train step == plain dp=4 train step
    (loss, gate stats, updated params) — the full composition."""
    params, _ = _setup()
    tcfg = TrainConfig(steps=4, batch_size=4, seq_len=64, accum_steps=2,
                       lr=1e-3, warmup_steps=1, gate_stats=True)
    toks = jax.random.randint(jax.random.PRNGKey(7), (2, 2, 4, 65),
                              0, MCFG.vocab_size, jnp.int32)

    mesh_dp = make_mesh(dp=4, devices=jax.devices()[:4])
    step_dp, state_dp, shard_dp = build_state_and_step(
        params, MCFG, tcfg, mesh_dp)

    tcfg_ps = dataclasses.replace(tcfg, pp=2, sp=2, dp=2)
    mesh_ps = make_mesh(dp=2, pp=2, sp=2, devices=jax.devices()[:8])
    params2 = init_model_params(jax.random.PRNGKey(0), MCFG)
    step_ps, state_ps, shard_ps = build_state_and_step(
        params2, MCFG, tcfg_ps, mesh_ps)

    m_dp = m_ps = None
    for i in range(2):
        state_dp, m_dp = step_dp(state_dp, jax.device_put(toks[i], shard_dp))
        state_ps, m_ps = step_ps(state_ps, jax.device_put(toks[i], shard_ps))
        assert abs(float(m_dp["loss"]) - float(m_ps["loss"])) < 1e-5, i
        assert bool(m_ps["good"])
    assert float(m_ps["gate_entropy"]) > 0
    assert abs(float(m_dp["gate_entropy"]) - float(m_ps["gate_entropy"])) < 1e-5
    p_dp = jax.tree_util.tree_leaves(state_dp.params)
    p_ps = jax.tree_util.tree_leaves(
        unstack_blocks(state_ps.params, MCFG.n_layers))
    for a, b in zip(p_dp, p_ps):
        # the two states live on different device sets (4 vs 8) — compare
        # on host
        assert float(np.abs(np.asarray(a) - np.asarray(b)).max()) < 1e-5


def test_pp_sp_varlen_loss_matches():
    """pp x sp x varlen: packed-document loss equals the single-device
    varlen oracle."""
    S = 64
    params, toks = _setup(B=4, S=S)
    ds_np = np.zeros((4, S), np.int32)
    ds_np[:, 32:] = 32                      # l_sel-aligned doc boundary
    ds = jnp.asarray(ds_np)
    lm = jnp.ones((4, S), jnp.float32)

    def ref_loss(p, t):
        logits, _ = model_forward(p, t[:, :-1], MCFG, seq_start=ds)
        return cross_entropy_loss(logits, t[:, 1:], mask=lm)

    mesh = make_mesh(dp=2, pp=2, sp=2, devices=jax.devices()[:8])
    ref = float(jax.jit(ref_loss)(params, toks))
    got = float(jax.jit(
        lambda p, t: pipeline_model_loss(p, t, MCFG, mesh, microbatches=2,
                                         seq_start=ds, loss_mask=lm)[0]
    )(stack_blocks(params), toks))
    assert abs(got - ref) < 1e-5, (got, ref)


@pytest.mark.parametrize("pp,tp,dp,M", [(2, 2, 1, 2), (2, 2, 2, 2), (2, 4, 1, 2)])
def test_pp_tp_loss_matches_single_device(pp, tp, dp, M):
    """pp x tp (pipeline stages x tensor shards): each tp member holds
    G/tp kv groups + 1/tp of the MLP hidden; loss equals the
    single-device oracle. (tp=4 shards heads WITHIN the kv groups too —
    rejected: tp must divide n_kv_groups=2, so tp=4 raises.)"""
    params, toks = _setup()
    mesh = make_mesh(dp=dp, pp=pp, tp=tp, devices=jax.devices()[: dp * pp * tp])
    fn = jax.jit(
        lambda p, t: pipeline_model_loss(p, t, MCFG, mesh, microbatches=M)[0])
    if tp > MCFG.nsa.n_kv_groups:
        with pytest.raises(ValueError, match="divide"):
            pipeline_model_loss(stack_blocks(params), toks, MCFG, mesh,
                                microbatches=M)
        return
    ref = float(jax.jit(_ref_loss)(params, toks))
    got = float(fn(stack_blocks(params), toks))
    assert abs(got - ref) < 1e-5, (pp, tp, dp, M, got, ref)


def test_pp_tp_gradients_match():
    """pp=2 x tp=2 x dp=2 grads == single-device grads for EVERY leaf —
    incl. the tp-replicated ones (norms, gate, embed/head), whose
    cotangents the shard_map transpose psums across tp."""
    params, toks = _setup()
    mesh = make_mesh(dp=2, pp=2, tp=2, devices=jax.devices()[:8])
    g_ref = jax.jit(jax.grad(_ref_loss))(params, toks)
    g_pp = jax.jit(jax.grad(
        lambda p, t: pipeline_model_loss(p, t, MCFG, mesh, microbatches=2)[0]
    ))(stack_blocks(params), toks)
    g_pp = unstack_blocks(g_pp, MCFG.n_layers)
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves(g_pp),
    ):
        mae = float(jnp.abs(jnp.asarray(a) - jnp.asarray(b)).max())
        scale = float(jnp.abs(jnp.asarray(a)).max()) + 1e-8
        assert mae / scale < 1e-4, (jax.tree_util.keystr(path), mae, scale)


def test_pp_tp_collect_aux_matches():
    """Gate/selection observability under pp x tp: the tp members' local
    group slices reassemble to the full [L,B,S,G,*] contract."""
    params, toks = _setup()
    mesh = make_mesh(dp=1, pp=2, tp=2, devices=jax.devices()[:4])
    logits, auxes = jax.jit(
        lambda p, t: model_forward(p, t, MCFG, collect_aux=True)
    )(params, toks[:, :-1])
    gates_ref = jnp.stack([a["gates"] for a in auxes]).astype(jnp.float32)
    sel_ref = jnp.stack([a["sel_idx"] for a in auxes])
    _, (gates, sel) = jax.jit(
        lambda p, t: pipeline_model_loss(p, t, MCFG, mesh, collect_aux=True)
    )(stack_blocks(params), toks)
    assert gates.shape == gates_ref.shape
    np.testing.assert_array_equal(np.asarray(sel), np.asarray(sel_ref))
    assert float(jnp.abs(gates - gates_ref).max()) < 1e-5


def test_pp_tp_train_step_matches_dp():
    """Integrated pp=2 x tp=2 x dp=2 train step == plain dp=4 train step
    (loss, gate stats, updated params)."""
    params, _ = _setup()
    tcfg = TrainConfig(steps=4, batch_size=4, seq_len=64, accum_steps=2,
                       lr=1e-3, warmup_steps=1, gate_stats=True)
    toks = jax.random.randint(jax.random.PRNGKey(7), (2, 2, 4, 65),
                              0, MCFG.vocab_size, jnp.int32)

    mesh_dp = make_mesh(dp=4, devices=jax.devices()[:4])
    step_dp, state_dp, shard_dp = build_state_and_step(
        params, MCFG, tcfg, mesh_dp)

    tcfg_pt = dataclasses.replace(tcfg, pp=2, tp=2, dp=2)
    mesh_pt = make_mesh(dp=2, pp=2, tp=2, devices=jax.devices()[:8])
    params2 = init_model_params(jax.random.PRNGKey(0), MCFG)
    step_pt, state_pt, shard_pt = build_state_and_step(
        params2, MCFG, tcfg_pt, mesh_pt)

    m_dp = m_pt = None
    for i in range(2):
        state_dp, m_dp = step_dp(state_dp, jax.device_put(toks[i], shard_dp))
        state_pt, m_pt = step_pt(state_pt, jax.device_put(toks[i], shard_pt))
        assert abs(float(m_dp["loss"]) - float(m_pt["loss"])) < 1e-5, i
        assert bool(m_pt["good"])
    assert float(m_pt["gate_entropy"]) > 0
    assert abs(float(m_dp["gate_entropy"]) - float(m_pt["gate_entropy"])) < 1e-5
    # the projection weights really are tp-sharded
    spec = state_pt.params["blocks"]["attn"]["W_Q"].sharding.spec
    assert "tp" in tuple(spec), spec
    p_dp = jax.tree_util.tree_leaves(state_dp.params)
    p_pt = jax.tree_util.tree_leaves(
        unstack_blocks(state_pt.params, MCFG.n_layers))
    for a, b in zip(p_dp, p_pt):
        assert float(np.abs(np.asarray(a) - np.asarray(b)).max()) < 1e-5


def test_pp_tp_fsdp_varlen():
    """pp x tp x fsdp x varlen all at once: loss matches the varlen
    oracle and fsdp picks a dp axis disjoint from the tp axis."""
    from nsa_vibe_tpu.parallel.pipeline import pipeline_param_specs

    S = 64
    params, toks = _setup(B=4, S=S)
    ds_np = np.zeros((4, S), np.int32)
    ds_np[:, 32:] = 32
    ds = jnp.asarray(ds_np)
    lm = jnp.ones((4, S), jnp.float32)

    def ref_loss(p, t):
        logits, _ = model_forward(p, t[:, :-1], MCFG, seq_start=ds)
        return cross_entropy_loss(logits, t[:, 1:], mask=lm)

    mesh = make_mesh(dp=2, pp=2, tp=2, devices=jax.devices()[:8])
    stacked = stack_blocks(params)
    specs = pipeline_param_specs(stacked, fsdp_size=2, fsdp_min=32, tp_size=2)
    for path, sp_ in jax.tree_util.tree_leaves_with_path(
            specs["blocks"], is_leaf=lambda x: isinstance(
                x, jax.sharding.PartitionSpec)):
        names = tuple(x for x in tuple(sp_) if x)
        assert len(names) == len(set(names)), (path, sp_)  # no axis reuse
    ref = float(jax.jit(ref_loss)(params, toks))
    got = float(jax.jit(
        lambda p, t: pipeline_model_loss(p, t, MCFG, mesh, microbatches=2,
                                         fsdp=True, fsdp_min=32,
                                         seq_start=ds, loss_mask=lm)[0]
    )(stacked, toks))
    assert abs(got - ref) < 1e-5, (got, ref)


def test_pp_sp_tp_loss_matches_single_device():
    """pp x sp x tp — all three in one mesh (the >350M long-context pod
    configuration): each tp member runs its G/tp local kv groups
    sequence-sharded over sp; loss equals the single-device oracle."""
    params, toks = _setup()
    mesh = make_mesh(dp=1, pp=2, sp=2, tp=2, devices=jax.devices()[:8])
    ref = float(jax.jit(_ref_loss)(params, toks))
    got = float(jax.jit(
        lambda p, t: pipeline_model_loss(p, t, MCFG, mesh, microbatches=2)[0]
    )(stack_blocks(params), toks))
    assert abs(got - ref) < 1e-5, (got, ref)


def test_pp_sp_tp_gradients_match():
    """pp=2 x sp=2 x tp=2 grads == single-device grads for EVERY leaf
    (tp-sharded projections, sp-gathered K/V transposes, and the
    tp/sp-replicated leaves' psum'd cotangents)."""
    params, toks = _setup()
    mesh = make_mesh(dp=1, pp=2, sp=2, tp=2, devices=jax.devices()[:8])
    g_ref = jax.jit(jax.grad(_ref_loss))(params, toks)
    g_pp = jax.jit(jax.grad(
        lambda p, t: pipeline_model_loss(p, t, MCFG, mesh, microbatches=2)[0]
    ))(stack_blocks(params), toks)
    g_pp = unstack_blocks(g_pp, MCFG.n_layers)
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves(g_pp),
    ):
        mae = float(jnp.abs(jnp.asarray(a) - jnp.asarray(b)).max())
        scale = float(jnp.abs(jnp.asarray(a)).max()) + 1e-8
        assert mae / scale < 1e-4, (jax.tree_util.keystr(path), mae, scale)


def test_pp_sp_tp_collect_aux_and_varlen():
    """pp x sp x tp with varlen packing + aux collection: loss matches
    the varlen oracle and the gate/sel observability reassembles to the
    full [L,B,S,G,*] contract across BOTH the sp (rows) and tp (groups)
    axes."""
    S = 64
    params, toks = _setup(B=4, S=S)
    ds_np = np.zeros((4, S), np.int32)
    ds_np[:, 32:] = 32                      # l_sel-aligned doc boundary
    ds = jnp.asarray(ds_np)
    lm = jnp.ones((4, S), jnp.float32)

    def ref_loss_aux(p, t):
        logits, auxes = model_forward(p, t[:, :-1], MCFG, seq_start=ds,
                                      collect_aux=True)
        return (cross_entropy_loss(logits, t[:, 1:], mask=lm),
                jnp.stack([a["gates"] for a in auxes]).astype(jnp.float32),
                jnp.stack([a["sel_idx"] for a in auxes]))

    ref, gates_ref, sel_ref = jax.jit(ref_loss_aux)(params, toks)
    mesh = make_mesh(dp=1, pp=2, sp=2, tp=2, devices=jax.devices()[:8])
    loss, (gates, sel) = jax.jit(
        lambda p, t: pipeline_model_loss(p, t, MCFG, mesh, microbatches=2,
                                         collect_aux=True,
                                         seq_start=ds, loss_mask=lm)
    )(stack_blocks(params), toks)
    assert abs(float(loss) - float(ref)) < 1e-5
    assert gates.shape == gates_ref.shape
    np.testing.assert_array_equal(np.asarray(sel), np.asarray(sel_ref))
    assert float(jnp.abs(gates - gates_ref).max()) < 1e-5
