"""Decode path: counters, emission schedule parity, prefill-vs-decode
output equivalence, cache seeding (reference test_decode_step.py coverage,
with explicit-mask oracles instead of the SDPA quirk)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsa_vibe_tpu.core.cache import cache_from_prefill, init_cache
from nsa_vibe_tpu.core.config import NSAConfig
from nsa_vibe_tpu.core.decode import nsa_decode_step
from nsa_vibe_tpu.core.nsa import init_nsa_params, nsa_prefill
from nsa_vibe_tpu.ops.block_index import expected_decode_reads

CFG = NSAConfig(
    dim=64, n_heads=4, n_kv_groups=2, d_k=16, d_v=16,
    l=8, d=4, l_sel=8, n_sel=3, w=16,
)


@pytest.fixture(scope="module")
def setup():
    params = init_nsa_params(jax.random.PRNGKey(0), CFG)
    S = 48
    x = jax.random.normal(jax.random.PRNGKey(1), (2, S, CFG.dim), jnp.float32)
    return params, x


def _decode_all(params, x, cfg, capacity):
    """Decode every token of x from an empty cache; return stacked outputs,
    final cache, per-step infos."""
    B, S, _ = x.shape
    cache = init_cache(cfg, B, capacity)
    step = jax.jit(lambda p, xt, c: nsa_decode_step(p, xt, c, cfg))
    outs, infos = [], []
    for tt in range(S):
        out, cache, info = step(params, x[:, tt : tt + 1], cache)
        outs.append(out)
        infos.append(info)
    return jnp.concatenate(outs, axis=1), cache, infos


def test_decode_read_counters_match_formula(setup):
    params, x = setup
    _, _, infos = _decode_all(params, x[:, :24], CFG, 64)
    for tt, info in enumerate(infos):
        s_raw = tt + 1
        want = expected_decode_reads(s_raw, CFG.l, CFG.d, CFG.l_sel, CFG.n_sel, CFG.w)
        assert int(info.reads_pred) == want, (tt, int(info.reads_pred), want)
        assert int(info.reads_sel) == CFG.n_sel * CFG.l_sel
        assert int(info.reads_win) == min(CFG.w, s_raw)


def test_decode_emission_schedule_matches_prefill(setup):
    # after decoding S tokens the compressed stream must equal the prefill
    # pooling of the same tokens (reference emission-parity test,
    # test_decode_step.py:227-278)
    params, x = setup
    S = 40
    _, cache, _ = _decode_all(params, x[:, :S], CFG, 64)
    _, aux = nsa_prefill(params, x[:, :S], CFG)
    n_cmp = aux["K_cmp"].shape[2]
    assert n_cmp == (S - CFG.l) // CFG.d + 1
    np.testing.assert_allclose(
        np.asarray(cache.k_cmp[:, :, :n_cmp]), np.asarray(aux["K_cmp"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(cache.v_cmp[:, :, :n_cmp]), np.asarray(aux["V_cmp"]), atol=1e-5
    )
    # nothing written past the emitted count
    assert float(jnp.abs(cache.k_cmp[:, :, n_cmp:]).max()) == 0.0


def test_decode_matches_prefill_outputs(setup):
    # token-by-token decode must reproduce batched prefill outputs exactly
    # (same math, explicit masks — no loosened tolerance needed)
    params, x = setup
    S = 48
    dec_out, _, _ = _decode_all(params, x[:, :S], CFG, 64)
    pre_out, _ = nsa_prefill(params, x[:, :S], CFG)
    np.testing.assert_allclose(
        np.asarray(dec_out), np.asarray(pre_out), atol=2e-5, rtol=1e-4
    )


def test_decode_selection_matches_prefill_selection(setup):
    params, x = setup
    S = 32
    _, _, infos = _decode_all(params, x[:, :S], CFG, 64)
    _, aux = nsa_prefill(params, x[:, :S], CFG)
    sel_pre = np.asarray(aux["sel_idx"])  # [B,S,G,n]
    for tt, info in enumerate(infos):
        sel_dec = np.asarray(info.sel_idx)[:, 0]  # [B,G,n]
        np.testing.assert_array_equal(sel_dec, sel_pre[:, tt], err_msg=f"t={tt}")


def test_cache_from_prefill_seeds_decode(setup):
    # prefill S0 tokens, seed cache, decode the rest; compare against
    # decoding everything from scratch
    params, x = setup
    S0, S = 24, 40
    _, aux = nsa_prefill(params, x[:, :S0], CFG)
    cache = cache_from_prefill(CFG, aux, 64)
    assert int(cache.t) == S0
    step = jax.jit(lambda p, xt, c: nsa_decode_step(p, xt, c, CFG))
    outs = []
    for tt in range(S0, S):
        out, cache, _ = step(params, x[:, tt : tt + 1], cache)
        outs.append(out)
    seeded = jnp.concatenate(outs, axis=1)
    scratch, _, _ = _decode_all(params, x[:, :S], CFG, 64)
    np.testing.assert_allclose(
        np.asarray(seeded), np.asarray(scratch[:, S0:]), atol=2e-5, rtol=1e-4
    )


def test_decode_gates_sum_to_one(setup):
    params, x = setup
    _, _, infos = _decode_all(params, x[:, :8], CFG, 64)
    for info in infos:
        np.testing.assert_allclose(np.asarray(info.gates.sum(-1)), 1.0, atol=1e-5)


def test_decode_window_ring_wraps():
    # capacity tight to the window: decode past w and ensure outputs stay
    # finite and the win branch only sees the last w tokens
    cfg = CFG.replace(force_branch="win")
    params = init_nsa_params(jax.random.PRNGKey(2), cfg)
    S = 36  # > w = 16
    x = jax.random.normal(jax.random.PRNGKey(3), (1, S, cfg.dim), jnp.float32)
    dec_out, _, _ = _decode_all(params, x, cfg, 64)
    assert np.isfinite(np.asarray(dec_out)).all()
    # oracle: win-forced prefill
    pre_out, _ = nsa_prefill(params, x, cfg)
    np.testing.assert_allclose(
        np.asarray(dec_out), np.asarray(pre_out), atol=2e-5, rtol=1e-4
    )


@pytest.mark.parametrize("branch", ["cmp", "sel", "win"])
def test_decode_forced_branch_parity(setup, branch):
    """force_branch skips the other two branches at trace time
    (core/decode.py); the output must still equal the forced prefill
    oracle, which computes all three and multiplies by the one-hot gate."""
    params, x = setup
    cfg = CFG.replace(force_branch=branch)
    S = 32
    dec_out, _, _ = _decode_all(params, x[:, :S], cfg, 64)
    pre_out, _ = nsa_prefill(params, x[:, :S], cfg)
    np.testing.assert_allclose(
        np.asarray(dec_out), np.asarray(pre_out), atol=2e-5, rtol=1e-4
    )


def test_decode_overflow_flag(setup):
    """Stepping past cache capacity must be detectable in-graph
    (info.overflow); within capacity the flag stays False."""
    params, x = setup
    capacity = 16
    cache = init_cache(CFG, 2, capacity)
    step = jax.jit(lambda p, xt, c: nsa_decode_step(p, xt, c, CFG))
    for tt in range(capacity + 2):
        xt = x[:, tt % x.shape[1]][:, None]
        _, cache, info = step(params, xt, cache)
        assert bool(info.overflow) == (tt >= capacity), tt


def test_decode_reads_trend_long_horizon(setup):
    """Reads trend over a long decode horizon (reference
    test_decode_reads_trend.py, strengthened): reads_pred follows the
    exact formula at every step, the window term saturates at w, and the
    cmp term grows by 1 exactly every d steps after warmup."""
    params, x = setup
    S = 120
    _, _, infos = _decode_all(params, x[:, : min(S, x.shape[1])].repeat(3, axis=1)[:, :S], CFG, 128)
    reads = [int(i.reads_pred) for i in infos]
    wins = [int(i.reads_win) for i in infos]
    cmps = [int(i.reads_cmp) for i in infos]
    for tt in range(S):
        s_raw = tt + 1
        assert reads[tt] == expected_decode_reads(
            s_raw, CFG.l, CFG.d, CFG.l_sel, CFG.n_sel, CFG.w)
    assert wins[CFG.w - 1:] == [CFG.w] * (S - CFG.w + 1)      # saturation
    for tt in range(1, S):
        d_cmp = cmps[tt] - cmps[tt - 1]
        want = 1 if (tt + 1 >= CFG.l and (tt + 1 - CFG.l) % CFG.d == 0) else 0
        assert d_cmp == want, (tt, d_cmp, want)


def test_ragged_decode_matches_per_row_uniform(setup):
    """Ragged step (per-row t) == running each row alone at its own
    depth: outputs, cache contents, read counters, emission schedule."""
    from nsa_vibe_tpu.core.decode import nsa_decode_step_ragged

    params, x = setup
    C = 64
    depths = [1, 17, 40]   # straddle warmup l=8 and several emissions
    B = len(depths)
    xs = jax.random.normal(jax.random.PRNGKey(5), (B, 41, CFG.dim), jnp.float32)

    # per-row single-stream caches at each depth
    from nsa_vibe_tpu.core.decode import nsa_prefill_via_decode

    rows = []
    for i, t in enumerate(depths):
        c = init_cache(CFG, 1, C)
        _, c = nsa_prefill_via_decode(params, xs[i : i + 1, :t], c, CFG)
        rows.append(c)
    ragged = type(rows[0])(*[
        jnp.concatenate([getattr(r, f) for r in rows], axis=0)
        for f in rows[0]._fields[:-1]
    ], t=jnp.asarray(depths, jnp.int32))

    # three ragged steps vs three per-row uniform steps
    x_new = jax.random.normal(jax.random.PRNGKey(6), (B, 3, CFG.dim), jnp.float32)
    step_r = jax.jit(lambda p, xt, c: nsa_decode_step_ragged(p, xt, c, CFG))
    step_u = jax.jit(lambda p, xt, c: nsa_decode_step(p, xt, c, CFG))
    for k in range(3):
        out_r, ragged, info_r = step_r(params, x_new[:, k : k + 1], ragged)
        assert info_r.reads_pred.shape == (B,)
        for i in range(B):
            out_u, rows[i], info_u = step_u(
                params, x_new[i : i + 1, k : k + 1], rows[i])
            mae = float(jnp.abs(out_r[i : i + 1] - out_u).max())
            assert mae < 1e-5, (k, i, mae)
            assert int(info_r.reads_pred[i]) == int(info_u.reads_pred)
            assert int(info_r.reads_cmp[i]) == int(info_u.reads_cmp)
            np.testing.assert_array_equal(
                np.asarray(info_r.sel_idx[i]), np.asarray(info_u.sel_idx[0]))
    for f in ragged._fields[:-1]:
        got = np.asarray(getattr(ragged, f))
        want = np.concatenate([np.asarray(getattr(r, f)) for r in rows], axis=0)
        np.testing.assert_allclose(got, want, atol=1e-6, err_msg=f)
    np.testing.assert_array_equal(
        np.asarray(ragged.t), np.asarray([d + 3 for d in depths]))


def test_ragged_decode_overflow_per_row(setup):
    """overflow flags fire per row exactly when that row passes capacity."""
    from nsa_vibe_tpu.core.decode import nsa_decode_step_ragged

    params, _ = setup
    C = 16
    cache = init_cache(CFG, 2, C)
    cache = cache._replace(t=jnp.asarray([C - 1, C], jnp.int32))
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 1, CFG.dim), jnp.float32)
    _, _, info = jax.jit(
        lambda p, xt, c: nsa_decode_step_ragged(p, xt, c, CFG))(params, x, cache)
    assert not bool(info.overflow[0]) and bool(info.overflow[1])


def test_ragged_admit_row_mid_stream(setup):
    """Continuous batching: a freshly-prefilled request admitted into a
    running ragged batch decodes exactly like it would alone."""
    from nsa_vibe_tpu.core.cache import admit_row, ragged_cache
    from nsa_vibe_tpu.core.decode import (
        nsa_decode_step_ragged,
        nsa_prefill_via_decode,
    )

    params, _ = setup
    C = 64
    # a running batch of 2 rows at depths 20 and 33
    batch = []
    xs = jax.random.normal(jax.random.PRNGKey(8), (3, 33, CFG.dim), jnp.float32)
    for i, t in enumerate([20, 33]):
        c = init_cache(CFG, 1, C)
        _, c = nsa_prefill_via_decode(params, xs[i : i + 1, :t], c, CFG)
        batch.append(c)
    ragged = type(batch[0])(*[
        jnp.concatenate([getattr(r, f) for r in batch] + [getattr(batch[0], f)],
                        axis=0)
        for f in batch[0]._fields[:-1]
    ], t=jnp.asarray([20, 33, 0], jnp.int32))

    # new request: prefill alone (depth 11), admit as row 2
    x_new_req = jax.random.normal(jax.random.PRNGKey(9), (1, 11, CFG.dim))
    solo = init_cache(CFG, 1, C)
    _, solo = nsa_prefill_via_decode(params, x_new_req, solo, CFG)
    solo = ragged_cache(solo)
    ragged = admit_row(ragged, solo, 2)
    assert ragged.t.tolist() == [20, 33, 11]

    # two ragged steps: row 2 must match the solo continuation
    x_steps = jax.random.normal(jax.random.PRNGKey(10), (3, 2, CFG.dim))
    step_r = jax.jit(lambda p, xt, c: nsa_decode_step_ragged(p, xt, c, CFG))
    step_u = jax.jit(lambda p, xt, c: nsa_decode_step(p, xt, c, CFG))
    solo_u = batch[0]._replace(
        **{f: getattr(solo, f) for f in solo._fields[:-1]},
        t=jnp.asarray(11, jnp.int32))
    for k in range(2):
        out_r, ragged, _ = step_r(params, x_steps[:, k : k + 1], ragged)
        out_s, solo_u, _ = step_u(params, x_steps[2:3, k : k + 1], solo_u)
        assert float(jnp.abs(out_r[2:3] - out_s).max()) < 1e-5, k


def test_ragged_decode_conv_phi(setup):
    """Ragged parity holds under the learnable conv-ϕ emission (the
    order-dependent ring-window path inside the vmapped step)."""
    from nsa_vibe_tpu.core.decode import (
        nsa_decode_step_ragged,
        nsa_prefill_via_decode,
    )

    cfg = CFG.replace(phi="conv")
    params = init_nsa_params(jax.random.PRNGKey(2), cfg)
    C = 64
    depths = [9, 26]
    xs = jax.random.normal(jax.random.PRNGKey(11), (2, 26, cfg.dim))
    rows = []
    for i, t in enumerate(depths):
        c = init_cache(cfg, 1, C)
        _, c = nsa_prefill_via_decode(params, xs[i : i + 1, :t], c, cfg)
        rows.append(c)
    ragged = type(rows[0])(*[
        jnp.concatenate([getattr(r, f) for r in rows], axis=0)
        for f in rows[0]._fields[:-1]
    ], t=jnp.asarray(depths, jnp.int32))
    x_new = jax.random.normal(jax.random.PRNGKey(12), (2, 4, cfg.dim))
    step_r = jax.jit(lambda p, xt, c: nsa_decode_step_ragged(p, xt, c, cfg))
    step_u = jax.jit(lambda p, xt, c: nsa_decode_step(p, xt, c, cfg))
    for k in range(4):
        out_r, ragged, _ = step_r(params, x_new[:, k : k + 1], ragged)
        for i in range(2):
            out_u, rows[i], _ = step_u(params, x_new[i : i + 1, k : k + 1], rows[i])
            assert float(jnp.abs(out_r[i : i + 1] - out_u).max()) < 1e-5, (k, i)
