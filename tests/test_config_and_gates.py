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


def test_resolve_kernel_odd_heads_per_group(monkeypatch):
    """Mosaic cannot merge [Tq, h, Dk] q-tiles for odd h > 1 (v5e:
    h=3 fails the shape cast; h=1/2/4/6 compile). `auto` must fall back
    to the XLA reference path and explicit `pallas` must refuse."""
    from nsa_vibe_tpu.ops import attention

    monkeypatch.setattr(attention, "_on_tpu", lambda: True)
    assert attention.resolve_kernel("auto", 3)[0] == "reference"
    assert attention.resolve_kernel("auto", 2)[0] == "pallas"
    assert attention.resolve_kernel("auto", 1)[0] == "pallas"
    assert attention.resolve_kernel("auto", 6)[0] == "pallas"
    with pytest.raises(ValueError, match="odd heads-per-group"):
        attention.resolve_kernel("pallas", 5)
    # off-TPU: interpret-mode pallas is fine for any h (jnp semantics)
    monkeypatch.setattr(attention, "_on_tpu", lambda: False)
    assert attention.resolve_kernel("pallas", 3) == ("pallas", True)
