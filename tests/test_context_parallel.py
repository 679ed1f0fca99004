"""Context-parallel (sequence-sharded) prefill parity.

Runs on the 8-virtual-device CPU mesh (conftest). Oracle: single-device
nsa_prefill. Covers the shifted-query kernel machinery (traced t_start
scalar prefetch) both via shard_map and directly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsa_vibe_tpu.core.config import NSAConfig
from nsa_vibe_tpu.core.nsa import init_nsa_params, nsa_prefill
from nsa_vibe_tpu.parallel.context import context_parallel_prefill
from nsa_vibe_tpu.parallel.mesh import make_mesh

CFG = NSAConfig(dim=64, n_heads=4, n_kv_groups=2, d_k=32, d_v=32,
                l=8, d=4, l_sel=16, n_sel=4, w=16, kernel="reference")


def _setup(S=128, B=2, cfg=CFG):
    params = init_nsa_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, S, cfg.dim))
    return params, x


@pytest.mark.parametrize("sp", [2, 4, 8])
def test_cp_prefill_matches_single_device(sp):
    params, x = _setup()
    mesh = make_mesh(sp=sp, devices=jax.devices()[:sp])
    out_ref, _ = jax.jit(lambda p, x: nsa_prefill(p, x, CFG))(params, x)
    out_cp = jax.jit(
        lambda p, x: context_parallel_prefill(p, x, CFG, mesh)
    )(params, x)
    mae = float(jnp.abs(out_cp - out_ref).mean())
    assert mae < 1e-5, f"sp={sp} MAE {mae}"


def test_cp_prefill_pallas_interpret():
    cfg = CFG.replace(kernel="pallas")
    params, x = _setup(cfg=cfg)
    mesh = make_mesh(sp=4, devices=jax.devices()[:4])
    out_ref, _ = jax.jit(lambda p, x: nsa_prefill(p, x, CFG))(params, x)
    out_cp = jax.jit(
        lambda p, x: context_parallel_prefill(p, x, cfg, mesh)
    )(params, x)
    mae = float(jnp.abs(out_cp - out_ref).mean())
    assert mae < 2e-5, f"pallas cp MAE {mae}"


def test_cp_prefill_gradients_match():
    params, x = _setup(S=64)
    mesh = make_mesh(sp=4, devices=jax.devices()[:4])

    def loss_single(p, x):
        out, _ = nsa_prefill(p, x, CFG)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    def loss_cp(p, x):
        out = context_parallel_prefill(p, x, CFG, mesh)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    g_ref = jax.jit(jax.grad(loss_single))(params, x)
    g_cp = jax.jit(jax.grad(loss_cp))(params, x)
    for path, a, b in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves(g_ref),
        jax.tree_util.tree_leaves(g_cp),
    ):
        mae = float(jnp.abs(a - b).mean())
        scale = float(jnp.abs(a).mean()) + 1e-8
        assert mae / scale < 1e-4, f"{path[0]}: rel grad MAE {mae / scale}"


def test_cp_with_data_parallel_axes():
    """dp x sp composed mesh: batch rows over dp, sequence over sp."""
    params, x = _setup(S=64, B=2)
    mesh = make_mesh(dp=2, sp=4, devices=jax.devices()[:8])
    out_ref, _ = jax.jit(lambda p, x: nsa_prefill(p, x, CFG))(params, x)
    out_cp = jax.jit(
        lambda p, x: context_parallel_prefill(p, x, CFG, mesh, batch_axis="dp")
    )(params, x)
    mae = float(jnp.abs(out_cp - out_ref).mean())
    assert mae < 1e-5, f"dp x sp MAE {mae}"


def test_flash_banded_t_start_matches_slice():
    """Direct kernel check: computing rows [off, off+Sq) with t_start=off
    equals the same rows of the full-length kernel call."""
    from nsa_vibe_tpu.ops.pallas.flash import flash_banded

    B, S, G, h, Dk = 1, 96, 2, 2, 32
    off, Sq = 32, 32
    Q = jax.random.normal(jax.random.PRNGKey(0), (B, S, G, h, Dk))
    K = jax.random.normal(jax.random.PRNGKey(1), (B, G, S, Dk))
    V = jax.random.normal(jax.random.PRNGKey(2), (B, G, S, Dk))
    for mode, kw in (("win", dict(w=16)), ("cmp", dict(l=8, d=4))):
        full = flash_banded(Q, K, V, mode=mode, scale=0.125, interpret=True, **kw)
        part = flash_banded(
            Q[:, off:off + Sq], K, V, mode=mode, scale=0.125, interpret=True,
            t_start=jnp.asarray([off], jnp.int32), **kw,
        )
        mae = float(jnp.abs(part - full[:, off:off + Sq]).mean())
        assert mae < 1e-6, f"{mode}: t_start slice MAE {mae}"


def test_sel_flash_traced_offset_matches_slice():
    from nsa_vibe_tpu.ops.pallas.sel_flash import selection_flash_pallas
    from nsa_vibe_tpu.ops.selection import select_topn_blocks

    B, S, G, h, Dk, l_sel, n = 1, 64, 2, 2, 32, 16, 3
    off, Sq = 32, 32
    Q = jax.random.normal(jax.random.PRNGKey(0), (B, S, G, h, Dk))
    K = jax.random.normal(jax.random.PRNGKey(1), (B, G, S, Dk))
    V = jax.random.normal(jax.random.PRNGKey(2), (B, G, S, Dk))
    p = jax.random.uniform(jax.random.PRNGKey(3), (B, S, G, S // l_sel))
    t_pos = jnp.arange(S, dtype=jnp.int32)
    sel = select_topn_blocks(p, n, t_pos, l_sel)
    full = selection_flash_pallas(Q, K, V, sel, l_sel=l_sel, scale=0.125,
                                  interpret=True)
    part = selection_flash_pallas(
        Q[:, off:], K, V, sel[:, off:], l_sel=l_sel, scale=0.125,
        pos_offset=jnp.asarray([off], jnp.int32), interpret=True,
    )
    mae = float(jnp.abs(part - full[:, off:]).mean())
    assert mae < 1e-6, f"sel traced offset MAE {mae}"


def test_fsdp_param_sharding_train_step():
    """FSDP-equivalent: params + optimizer state sharded over dp; one
    train step runs and loss is finite (reference train_showcase_fsdp
    FULL_SHARD contract, via sharding specs instead of FSDP wrappers)."""
    from nsa_vibe_tpu.core.config import ModelConfig, TrainConfig
    from nsa_vibe_tpu.models.tinylm import init_model_params
    from nsa_vibe_tpu.parallel.train_step import build_state_and_step

    mcfg = ModelConfig(vocab_size=256, n_layers=2, nsa=CFG.replace(dim=64),
                       dtype="float32")
    tcfg = TrainConfig(steps=2, batch_size=4, seq_len=32, fsdp=True,
                       fsdp_min_size=64)
    mesh = make_mesh(dp=4, devices=jax.devices()[:4])
    params = init_model_params(jax.random.PRNGKey(0), mcfg)
    step_fn, state, batch_shard = build_state_and_step(params, mcfg, tcfg, mesh)

    # embedding [256, 64] must actually be sharded over dp
    emb_shard = state.params["embed"].sharding.spec
    assert "dp" in tuple(emb_shard), emb_shard
    # optimizer moments inherit the sharding (adam mu for embed)
    mu_emb = state.opt_state[1][0].mu["embed"]
    assert "dp" in tuple(mu_emb.sharding.spec), mu_emb.sharding

    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (1, 4, 33)), jnp.int32)
    tokens = jax.device_put(tokens, batch_shard)
    state, metrics = step_fn(state, tokens)
    assert np.isfinite(float(metrics["loss"]))


def test_fsdp_matches_replicated_step():
    """One fsdp step == one replicated step (same math, different layout)."""
    from nsa_vibe_tpu.core.config import ModelConfig, TrainConfig
    from nsa_vibe_tpu.models.tinylm import init_model_params
    from nsa_vibe_tpu.parallel.train_step import build_state_and_step

    mcfg = ModelConfig(vocab_size=256, n_layers=1, nsa=CFG.replace(dim=64),
                       dtype="float32")
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (1, 4, 33)), jnp.int32)
    mesh = make_mesh(dp=4, devices=jax.devices()[:4])
    losses = []
    for fsdp in (False, True):
        # re-init per run: the jitted step donates its state buffers
        params = init_model_params(jax.random.PRNGKey(0), mcfg)
        tcfg = TrainConfig(steps=2, batch_size=4, seq_len=32, fsdp=fsdp,
                           fsdp_min_size=64)
        step_fn, state, batch_shard = build_state_and_step(params, mcfg, tcfg, mesh)
        tok = jax.device_put(tokens, batch_shard)
        state, m1 = step_fn(state, tok)
        state, m2 = step_fn(state, tok)
        losses.append((float(m1["loss"]), float(m2["loss"])))
    assert np.allclose(losses[0], losses[1], rtol=1e-5), losses


def test_cp_model_forward_matches_single_device():
    from nsa_vibe_tpu.core.config import ModelConfig
    from nsa_vibe_tpu.models.tinylm import init_model_params, model_forward
    from nsa_vibe_tpu.parallel.context import context_parallel_model_forward

    mcfg = ModelConfig(vocab_size=256, n_layers=2, nsa=CFG, dtype="float32")
    params = init_model_params(jax.random.PRNGKey(0), mcfg)
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (2, 64)), jnp.int32)
    mesh = make_mesh(sp=4, devices=jax.devices()[:4])
    want, _ = jax.jit(lambda p, t: model_forward(p, t, mcfg))(params, tokens)
    got = jax.jit(
        lambda p, t: context_parallel_model_forward(p, t, mcfg, mesh)
    )(params, tokens)
    mae = float(jnp.abs(got - want).mean())
    assert mae < 2e-5, f"cp model fwd MAE {mae}"


def test_cp_train_step_loss_matches():
    """A dp-only step and a dp x sp step compute the same loss/update."""
    from nsa_vibe_tpu.core.config import ModelConfig, TrainConfig
    from nsa_vibe_tpu.models.tinylm import init_model_params
    from nsa_vibe_tpu.parallel.train_step import build_state_and_step

    mcfg = ModelConfig(vocab_size=256, n_layers=1, nsa=CFG, dtype="float32")
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (1, 2, 65)), jnp.int32)
    losses = []
    for sp in (1, 4):
        params = init_model_params(jax.random.PRNGKey(0), mcfg)
        tcfg = TrainConfig(steps=2, batch_size=2, seq_len=64, sp=sp)
        mesh = make_mesh(dp=2, sp=sp, devices=jax.devices()[:2 * sp])
        step_fn, state, batch_shard = build_state_and_step(params, mcfg, tcfg, mesh)
        tok = jax.device_put(tokens, batch_shard)
        state, m1 = step_fn(state, tok)
        state, m2 = step_fn(state, tok)
        losses.append((float(m1["loss"]), float(m2["loss"])))
    assert np.allclose(losses[0], losses[1], rtol=2e-5), losses


def test_cp_train_step_gate_stats_live():
    """Gate/selection observability must stay live under context
    parallelism (VERDICT r1 #6): an sp>1 step reports the same gate
    stats a single-device step does — the watchdog's gate-collapse
    detection depends on them on exactly the long-context runs."""
    from nsa_vibe_tpu.core.config import ModelConfig, TrainConfig
    from nsa_vibe_tpu.models.tinylm import init_model_params
    from nsa_vibe_tpu.parallel.train_step import build_state_and_step

    mcfg = ModelConfig(vocab_size=256, n_layers=1, nsa=CFG, dtype="float32")
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (1, 2, 65)), jnp.int32)
    stats = {}
    for sp in (1, 4):
        params = init_model_params(jax.random.PRNGKey(0), mcfg)
        tcfg = TrainConfig(steps=1, batch_size=2, seq_len=64, sp=sp)
        mesh = make_mesh(dp=2, sp=sp, devices=jax.devices()[:2 * sp])
        step_fn, state, batch_shard = build_state_and_step(params, mcfg, tcfg, mesh)
        tok = jax.device_put(tokens, batch_shard)
        _, m = step_fn(state, tok)
        stats[sp] = {k: np.asarray(m[k]) for k in
                     ("gate_entropy", "gate_max", "gate_collapse_frac",
                      "branch_shares", "sel_k_mean", "sel_k_max")}
    assert float(stats[4]["gate_entropy"]) > 0.0
    assert float(stats[4]["sel_k_mean"]) > 0.0
    for k in stats[1]:
        np.testing.assert_allclose(stats[1][k], stats[4][k], rtol=2e-4,
                                   atol=1e-5, err_msg=k)


def test_make_mesh_rejects_bad_dp():
    with pytest.raises(ValueError):
        make_mesh(dp=3, devices=jax.devices()[:8])
