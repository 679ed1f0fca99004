"""CLI integration tests for the ops/bench tooling.

Reference analogue: nsa/tests/test_decode_cli_integration.py (bench CLI
produces a parseable CSV) and test_m8_integration.py (ops scripts run).
Each tool is exercised as a subprocess on tiny shapes with the jnp
reference kernel so the whole file stays CPU-fast.
"""

from __future__ import annotations

import csv
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, timeout=600):
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": ""}
    return subprocess.run([sys.executable, *args], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=timeout)


def last_json(stdout: str) -> dict:
    line = [ln for ln in stdout.strip().splitlines()
            if ln.startswith("{") and ln.endswith("}")][-1]
    return json.loads(line)


def test_bench_decode_cli_csv(tmp_path):
    csv_path = tmp_path / "decode.csv"
    r = run_cli(["bench/bench_decode.py", "--S", "128", "--iters", "2",
                 "--warmup", "1", "--kernel", "reference", "--csv", str(csv_path)])
    assert r.returncode == 0, r.stdout + r.stderr
    rows = list(csv.DictReader(open(csv_path)))
    assert rows and int(rows[0]["reads_pred"]) == int(rows[0]["reads_expected"])
    # actual is counted from the applied masks: never above the formula
    assert float(rows[0]["reads_actual"]) <= int(rows[0]["reads_pred"])


def test_train_toy_loss_drops():
    r = run_cli(["scripts/train_toy.py", "--steps", "30", "--log-every", "10"])
    assert r.returncode == 0, r.stdout + r.stderr
    out = last_json(r.stdout)
    assert out["loss_dropped"] and out["final_loss"] < out["first_loss"]


def test_demo_decode_reads():
    r = run_cli(["scripts/demo_decode.py", "--prompt-len", "64", "--new", "6"])
    assert r.returncode == 0, r.stdout + r.stderr
    out = last_json(r.stdout)
    assert out["expected_reads_at_end"] > 0 and out["ms_per_step_min"] > 0


def test_print_selection_ranges_causal():
    r = run_cli(["scripts/print_selection_ranges.py", "--S", "128"])
    assert r.returncode == 0, r.stdout + r.stderr
    assert "ok: all selected blocks causal" in r.stdout


def test_estimate_memory_math():
    r = run_cli(["scripts/estimate_memory.py", "--config", "configs/m7c_125m.yaml"])
    assert r.returncode == 0, r.stdout + r.stderr
    est = json.loads(r.stdout)
    # ~125M param class; optimizer = 2x fp32 params; everything positive
    assert 5e7 < est["n_params"] < 3e8
    assert est["optimizer_bytes"] == 2 * est["params_bytes"]
    assert est["train_total_bytes"] > est["params_bytes"] + est["optimizer_bytes"]


def test_profiler_smoke_produces_trace(tmp_path):
    r = run_cli(["scripts/profiler_smoke.py", "--out", str(tmp_path / "prof"),
                 "--steps", "1", "--S", "64", "--kernel", "reference"])
    assert r.returncode == 0, r.stdout + r.stderr
    assert last_json(r.stdout)["ok"]


def test_decode_guard_pass_and_fail(tmp_path):
    """check_decode_guard: within-tolerance passes, regression fails,
    --snapshot writes a new baseline (reference ci_decode_perf_guard.yml)."""
    bench = tmp_path / "bench.json"
    base = tmp_path / "base.json"
    bench.write_text(json.dumps(
        {"metric": "decode_ms_per_step_S1024", "value": 1.0, "unit": "ms"}) + "\n")
    base.write_text(json.dumps({"decode_ms_per_step_S1024": 1.01}))
    r = run_cli(["scripts/check_decode_guard.py", str(bench), str(base)])
    assert r.returncode == 0, r.stdout + r.stderr
    base.write_text(json.dumps({"decode_ms_per_step_S1024": 0.80}))
    r = run_cli(["scripts/check_decode_guard.py", str(bench), str(base)])
    assert r.returncode != 0
    r = run_cli(["scripts/check_decode_guard.py", str(bench), str(base), "--snapshot"])
    assert r.returncode == 0
    assert json.loads(base.read_text())["decode_ms_per_step_S1024"] == 1.0


def test_tpu_sanity_cpu():
    r = run_cli(["scripts/tpu_sanity.py", "--allow-cpu"])
    assert r.returncode == 0, r.stdout + r.stderr
    assert last_json(r.stdout)["ok"]


def test_check_config_validates_ladder():
    import glob

    r = run_cli(["scripts/check_config.py", *sorted(glob.glob("configs/*.yaml"))])
    assert r.returncode == 0, r.stdout + r.stderr


@pytest.mark.slow
def test_automated_bench_fast_mode(tmp_path):
    r = run_cli(["bench/run_automated_bench.py", "--fast", "--out", str(tmp_path)],
                timeout=1200)
    assert r.returncode == 0, r.stdout + r.stderr
    out = last_json(r.stdout)
    assert out["fail"] == 0 and out["pass"] >= 2
