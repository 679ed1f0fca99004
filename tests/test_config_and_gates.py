"""Config validation + force-branch gate semantics.

Reference: nsa/tests/test_config_validation.py (divisibility enforcement)
and test_force_branch_gates.py (forced gates are exactly one-hot /
uniform).
"""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsa_vibe_tpu.core.config import ModelConfig, NSAConfig, TrainConfig
from nsa_vibe_tpu.core.gate import gate_probs, gate_stats, init_gate_params

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_divisibility_validation():
    with pytest.raises(ValueError):
        NSAConfig(l=32, d=5)            # d must divide l
    with pytest.raises(ValueError):
        NSAConfig(l_sel=30, d=16)       # d must divide l_sel
    with pytest.raises(ValueError):
        NSAConfig(n_heads=6, n_kv_groups=4)
    with pytest.raises(ValueError):
        NSAConfig(d_k=63)               # RoPE needs even d_k


def test_yaml_configs_load():
    yaml = pytest.importorskip("yaml")
    from nsa_vibe_tpu.train.trainer import load_config

    for path in sorted((REPO / "configs").glob("*.yaml")):
        mcfg, tcfg, data = load_config(str(path))
        assert isinstance(mcfg, ModelConfig)
        assert isinstance(tcfg, TrainConfig)
        assert mcfg.nsa.l % mcfg.nsa.d == 0
        raw = yaml.safe_load(path.read_text())
        assert raw, path


def test_force_branch_one_hot():
    params = init_gate_params(jax.random.PRNGKey(0), 16)
    q = jax.random.normal(jax.random.PRNGKey(1), (3, 5, 2, 16))
    for i, br in enumerate(("cmp", "sel", "win")):
        g = np.asarray(gate_probs(params, q, force_branch=br)).reshape(-1, 3)
        expect = np.zeros(3)
        expect[i] = 1.0
        np.testing.assert_allclose(g, np.broadcast_to(expect, g.shape), atol=0)


def test_force_uniform_gate():
    params = init_gate_params(jax.random.PRNGKey(0), 16)
    q = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 2, 16))
    g = gate_probs(params, q, force_uniform=True)
    np.testing.assert_allclose(np.asarray(g), 1.0 / 3.0, atol=1e-7)


def test_gate_near_uniform_at_init():
    """Last layer xavier(0.1)+zero bias -> near-uniform start
    (reference nsa_attention.py:32-82 contract)."""
    params = init_gate_params(jax.random.PRNGKey(0), 64)
    q = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 2, 64))
    g = np.asarray(gate_probs(params, q))
    assert np.abs(g - 1.0 / 3.0).max() < 0.15
    stats = gate_stats(jnp.asarray(g))
    assert float(stats["collapse_fraction"]) == 0.0
    assert float(stats["entropy_mean"]) > 1.0  # ln(3) ~= 1.0986


def test_gate_stats_detect_collapse():
    g = jnp.asarray(np.tile([0.99, 0.005, 0.005], (100, 1)))
    stats = gate_stats(g)
    assert float(stats["collapse_fraction"]) == 1.0
    assert float(stats["max_gate_mean"]) > 0.9


def test_resolve_kernel_any_heads_per_group(monkeypatch):
    """Since r2, ANY heads-per-group runs on the Pallas path: odd h > 1
    (which Mosaic cannot shape-cast) is handled by zero-padding the head
    axis at dispatch (ops.attention._pad_odd_heads) — matching the
    reference's any-H kernels (triton_sel_kernel/sel_fwd.py:453-456)."""
    from nsa_vibe_tpu.ops import attention

    monkeypatch.setattr(attention, "_on_tpu", lambda: True)
    for h in (1, 2, 3, 5, 6):
        assert attention.resolve_kernel("auto", h)[0] == "pallas"
        assert attention.resolve_kernel("pallas", h) == ("pallas", False)
    assert attention.resolve_kernel("reference", 3)[0] == "reference"
    # off-TPU: pallas means interpret mode
    monkeypatch.setattr(attention, "_on_tpu", lambda: False)
    assert attention.resolve_kernel("pallas", 3) == ("pallas", True)
    assert attention.resolve_kernel("auto", 2)[0] == "reference"


def test_pad_odd_heads_shapes():
    from nsa_vibe_tpu.ops.attention import _pad_odd_heads

    q3 = jnp.zeros((1, 8, 2, 3, 16))
    qp, h = _pad_odd_heads(q3)
    assert h == 3 and qp.shape[3] == 4
    q6 = jnp.zeros((1, 8, 2, 6, 16))
    qp, h = _pad_odd_heads(q6)
    assert h == 6 and qp.shape[3] == 6


def test_flat_combine_parity(monkeypatch):
    """nsa.flat_combine=1 (flat [B,S,G,h*Dv] gate combine) is forward
    bit-exact vs the 5-D path; grads agree to last-ulp (the gate-grad
    reduction order differs — same class as flash.scale_on_q)."""
    from nsa_vibe_tpu.core.nsa import init_nsa_params, nsa_prefill
    from nsa_vibe_tpu.ops import tuning

    cfg = NSAConfig(dim=128, n_heads=4, n_kv_groups=2, d_k=32, d_v=32,
                    l=8, d=4, l_sel=16, n_sel=4, w=32)
    params = init_nsa_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 48, 128))

    def run():
        out, _ = jax.jit(lambda p: nsa_prefill(p, x, cfg))(params)
        g = jax.grad(lambda p: jnp.sum(nsa_prefill(p, x, cfg)[0] ** 2))(params)
        return np.asarray(out), jax.tree_util.tree_map(np.asarray, g)

    base = dict(tuning.DEFAULTS)
    monkeypatch.setattr(tuning, "DEFAULTS", {**base, "nsa.flat_combine": 0})
    tuning._load.cache_clear()
    try:
        o0, g0 = run()
        monkeypatch.setattr(tuning, "DEFAULTS", {**base, "nsa.flat_combine": 1})
        tuning._load.cache_clear()
        o1, g1 = run()
    finally:
        tuning._load.cache_clear()
    np.testing.assert_array_equal(o0, o1)
    for (k, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g0)[0],
            jax.tree_util.tree_flatten_with_path(g1)[0]):
        np.testing.assert_allclose(
            a, b, rtol=1e-5, atol=1e-6,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(k)}")
