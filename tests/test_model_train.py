"""Model family + trainer steel thread: forward shapes, remat parity,
decode==prefill at the model level, loss decreases, checkpoints restore,
mesh-sharded step runs on 8 virtual devices."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsa_vibe_tpu.core.config import ModelConfig, NSAConfig, TrainConfig
from nsa_vibe_tpu.models.tinylm import (
    cross_entropy_loss,
    generate,
    init_model_params,
    model_decode_step,
    model_forward,
    model_prefill_with_caches,
)
from nsa_vibe_tpu.parallel.mesh import make_mesh, param_specs
from nsa_vibe_tpu.parallel.train_step import build_state_and_step, init_train_state, make_train_step

NSA = NSAConfig(dim=64, n_heads=4, n_kv_groups=2, d_k=16, d_v=16,
                l=8, d=4, l_sel=8, n_sel=3, w=16)
MCFG = ModelConfig(vocab_size=256, n_layers=2, nsa=NSA)


@pytest.fixture(scope="module")
def model():
    params = init_model_params(jax.random.PRNGKey(0), MCFG)
    tokens = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 32)), jnp.int32)
    return params, tokens


def test_forward_shapes_and_loss(model):
    params, tokens = model
    logits, _ = model_forward(params, tokens, MCFG)
    assert logits.shape == (2, 32, 256)
    loss = cross_entropy_loss(logits[:, :-1], tokens[:, 1:])
    assert np.isfinite(float(loss))
    assert 4.0 < float(loss) < 8.0  # ~ln(256)=5.54 at init


def test_remat_matches_no_remat(model):
    params, tokens = model
    logits, _ = model_forward(params, tokens, MCFG)
    logits_r, _ = model_forward(params, tokens, ModelConfig(
        vocab_size=256, n_layers=2, nsa=NSA, remat=True))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits_r), atol=1e-5)

    def loss_fn(p, remat):
        cfg = ModelConfig(vocab_size=256, n_layers=2, nsa=NSA, remat=remat)
        lg, _ = model_forward(p, tokens, cfg)
        return cross_entropy_loss(lg[:, :-1], tokens[:, 1:])

    g1 = jax.grad(lambda p: loss_fn(p, False))(params)
    for mode in (True, "mlp"):
        g2 = jax.grad(lambda p: loss_fn(p, mode))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_model_decode_matches_prefill(model):
    params, tokens = model
    logits_pre, _ = model_forward(params, tokens, MCFG)
    logits0, caches = model_prefill_with_caches(params, tokens[:, :16], MCFG, capacity=48)
    np.testing.assert_allclose(
        np.asarray(logits0), np.asarray(logits_pre[:, :16]), atol=2e-4, rtol=1e-3
    )
    step = jax.jit(lambda p, t, c: model_decode_step(p, t, c, MCFG))
    for tt in range(16, 32):
        lg, caches = step(params, tokens[:, tt : tt + 1], caches)
        np.testing.assert_allclose(
            np.asarray(lg[:, 0]), np.asarray(logits_pre[:, tt]), atol=2e-4, rtol=1e-3,
            err_msg=f"t={tt}",
        )


def test_generate_scan_matches_loop():
    """generate_scan (one jitted program) == generate (per-token dispatch)
    for greedy decoding."""
    from nsa_vibe_tpu.models.tinylm import generate_scan

    params = init_model_params(jax.random.PRNGKey(0), MCFG)
    prompt = jnp.asarray(
        np.random.default_rng(3).integers(0, MCFG.vocab_size, (2, 24)), jnp.int32)
    a = generate(params, prompt, 10, MCFG)
    b = generate_scan(params, prompt, 10, MCFG)
    assert a.shape == b.shape
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_generate_greedy_deterministic(model):
    params, tokens = model
    out1 = generate(params, tokens[:, :8], 6, MCFG)
    out2 = generate(params, tokens[:, :8], 6, MCFG)
    assert out1.shape == (2, 14)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    np.testing.assert_array_equal(np.asarray(out1[:, :8]), np.asarray(tokens[:, :8]))


def test_train_step_loss_decreases():
    tcfg = TrainConfig(steps=30, batch_size=4, seq_len=32, warmup_steps=5, lr=3e-3)
    params = init_model_params(jax.random.PRNGKey(1), MCFG)
    step_fn = jax.jit(make_train_step(MCFG, tcfg))
    state = init_train_state(params, tcfg)
    rng = np.random.default_rng(0)
    # one fixed batch: loss must drop monotonically-ish (memorization)
    batch = jnp.asarray(rng.integers(0, 256, (1, 4, 33)), jnp.int32)
    losses = []
    for _ in range(30):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
        assert bool(metrics["good"])
    assert losses[-1] < losses[0] * 0.7, losses[::10]


def test_train_step_nan_abort_skips_update():
    tcfg = TrainConfig(steps=5, batch_size=2, seq_len=16)
    params = init_model_params(jax.random.PRNGKey(2), MCFG)
    # poison one parameter -> forward produces NaN -> good=False, params kept
    params["lm_head"] = params["lm_head"].at[0, 0].set(jnp.nan)
    step_fn = jax.jit(make_train_step(MCFG, tcfg))
    state = init_train_state(params, tcfg)
    batch = jnp.asarray(np.zeros((1, 2, 17)), jnp.int32)
    new_state, metrics = step_fn(state, batch)
    assert not bool(metrics["good"])
    # parameters unchanged (coherent skip)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(new_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_train_step_8dev():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(tp=2, devices=jax.devices()[:8])
    tcfg = TrainConfig(steps=3, batch_size=4, seq_len=32, accum_steps=2)
    params = init_model_params(jax.random.PRNGKey(3), MCFG)
    step_fn, state, batch_shard = build_state_and_step(params, MCFG, tcfg, mesh)
    tokens = jnp.asarray(
        np.random.default_rng(1).integers(0, 256, (2, 4, 33)), jnp.int32)
    tokens = jax.device_put(tokens, batch_shard)
    state, metrics = step_fn(state, tokens)
    assert np.isfinite(float(metrics["loss"]))
    # parity with single-device step on the same data
    params2 = init_model_params(jax.random.PRNGKey(3), MCFG)
    step1 = jax.jit(make_train_step(MCFG, tcfg))
    state1 = init_train_state(params2, tcfg)
    tokens_local = jnp.asarray(np.random.default_rng(1).integers(0, 256, (2, 4, 33)), jnp.int32)
    state1, metrics1 = step1(state1, tokens_local)
    np.testing.assert_allclose(float(metrics["loss"]), float(metrics1["loss"]), atol=1e-5)


def test_param_specs_cover_projections():
    params = init_model_params(jax.random.PRNGKey(0), MCFG)
    specs = param_specs(params)
    assert specs["blocks"][0]["attn"]["W_Q"] == jax.sharding.PartitionSpec(None, "tp")
    assert specs["blocks"][0]["attn"]["W_O"] == jax.sharding.PartitionSpec("tp")
    assert specs["embed"] == jax.sharding.PartitionSpec()


def test_checkpoint_roundtrip(tmp_path):
    from nsa_vibe_tpu.utils.checkpoint import latest_step, restore_checkpoint, save_checkpoint

    tcfg = TrainConfig(steps=5, batch_size=2, seq_len=16)
    params = init_model_params(jax.random.PRNGKey(4), MCFG)
    state = init_train_state(params, tcfg)
    step_fn = jax.jit(make_train_step(MCFG, tcfg))
    batch = jnp.asarray(np.random.default_rng(2).integers(0, 256, (1, 2, 17)), jnp.int32)
    state, _ = step_fn(state, batch)
    save_checkpoint(str(tmp_path / "ckpt"), int(state.step), state)
    assert latest_step(str(tmp_path / "ckpt")) == 1
    restored = restore_checkpoint(str(tmp_path / "ckpt"), state)
    assert int(restored.step) == 1
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state restored too (improvement over reference)
    for a, b in zip(jax.tree_util.tree_leaves(state.opt_state),
                    jax.tree_util.tree_leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
