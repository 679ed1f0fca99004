"""Static perf-regression guards over the hot modules.

Reference: nsa/tests/test_performance_guards.py:16-109 — an AST visitor
banning `.item()`/`.cpu()`/Python loops in hot modules outside an
allowlist. The TPU equivalents of a host sync are `jax.device_get`,
`np.asarray(<traced>)`, `float()/int()` on arrays, and
`.block_until_ready()`; the TPU equivalent of a per-element Python loop
is any `for`/`while` in trace-path code (loops at trace time unroll the
program; loops at run time force host round-trips).
"""

import ast
import pathlib

import pytest

PKG = pathlib.Path(__file__).resolve().parent.parent / "nsa_vibe_tpu"

# Modules on the jit trace path (no loops, no host syncs allowed at all —
# everything listed here must compile to one XLA program).
HOT_MODULES = [
    "core/decode.py",
    "ops/selection.py",
    "ops/attention.py",
    "ops/compress.py",
    "ops/rope.py",
]

# (module, function) pairs allowed to loop: trace-time structural loops
# over a *static* bound (layers, forced slots, kernel grid construction).
LOOP_ALLOW = {
    ("ops/selection.py", "forced_block_ids"),      # force_local static slots
    ("ops/attention.py", "resolve_kernel"),
    ("ops/rope.py", "apply_rope"),                 # static ndim normalization
}

HOST_SYNC_CALLS = {"device_get", "block_until_ready", "item"}


def _functions(tree):
    for node in ast.walk(tree):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            yield node


def _loops_in(fn):
    for node in ast.walk(fn):
        if isinstance(node, (ast.For, ast.While)):
            yield node


@pytest.mark.parametrize("rel", HOT_MODULES)
def test_no_python_loops_in_hot_modules(rel):
    tree = ast.parse((PKG / rel).read_text())
    offenders = []
    for fn in _functions(tree):
        if (rel, fn.name) in LOOP_ALLOW:
            continue
        for loop in _loops_in(fn):
            offenders.append(f"{rel}:{loop.lineno} in {fn.name}")
    assert not offenders, f"Python loops in hot path: {offenders}"


@pytest.mark.parametrize("rel", HOT_MODULES + ["core/nsa.py", "core/cache.py"])
def test_no_host_syncs_in_hot_modules(rel):
    tree = ast.parse((PKG / rel).read_text())
    offenders = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Call):
            f = node.func
            name = f.attr if isinstance(f, ast.Attribute) else getattr(f, "id", "")
            if name in HOST_SYNC_CALLS:
                offenders.append(f"{rel}:{node.lineno} {name}()")
    assert not offenders, f"host syncs in hot path: {offenders}"


def test_hot_modules_exist():
    for rel in HOT_MODULES:
        assert (PKG / rel).exists(), rel
