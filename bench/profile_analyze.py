"""Profile one training step and print the top ops by device time.

Answers "where do the 571 ms go?" directly from an xplane trace —
the reference leans on NVTX + nsys for this (SURVEY.md §5); on TPU the
equivalent is jax.profiler + programmatic xplane aggregation
(jax.profiler.ProfileData — no tensorboard needed).

Run (real TPU):  python bench/profile_analyze.py --batch 16 --seq 2048
CPU sanity:      JAX_PLATFORMS=cpu PYTHONPATH= python bench/profile_analyze.py \
                     --batch 2 --seq 256 --layers 2 --top 15

Aggregates per-op total duration over device planes (falls back to the
XLA host-runtime line when no device plane exists, e.g. CPU). Event
names are XLA fusion/op names; `named_scope` stage names appear as
separate lines when present.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import collections
import glob
import tempfile

import jax
import jax.numpy as jnp
import numpy as np


def build_step(args):
    from nsa_vibe_tpu.core.config import ModelConfig, NSAConfig, TrainConfig
    from nsa_vibe_tpu.models.tinylm import init_model_params
    from nsa_vibe_tpu.parallel.mesh import make_mesh
    from nsa_vibe_tpu.parallel.train_step import build_state_and_step

    nsa = NSAConfig(dim=args.dim, n_heads=args.heads, n_kv_groups=args.groups,
                    d_k=64, d_v=64, l=32, d=16, l_sel=64, n_sel=16, w=512)
    mcfg = ModelConfig(vocab_size=256, n_layers=args.layers, nsa=nsa,
                       dtype="bfloat16")
    tcfg = TrainConfig(steps=4, batch_size=args.batch, seq_len=args.seq)
    params = init_model_params(jax.random.PRNGKey(0), mcfg, jnp.bfloat16)
    mesh = make_mesh()
    step_fn, state, batch_shard = build_state_and_step(params, mcfg, tcfg, mesh)
    tokens = jax.device_put(
        jnp.asarray(np.random.default_rng(0).integers(
            0, 256, (1, args.batch, args.seq + 1)), jnp.int32), batch_shard)
    return step_fn, state, tokens


def detail(trace_dir: str, pattern: str, top: int) -> None:
    """Print the LONGEST individual events whose canonical name matches
    `pattern` (regex), WITHOUT aggregation and with the full HLO text —
    the way to attribute anonymous 'fusion'/'multiply_reduce_fusion'
    buckets from the aggregate view to actual model ops (shapes and
    operand names live in the event string)."""
    import re

    from jax.profiler import ProfileData

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    data = ProfileData.from_file(paths[-1])
    rx = re.compile(pattern)
    events = []
    for plane in data.planes:
        if not ("TPU" in plane.name or "/device:" in plane.name.lower()):
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for e in line.events:
                if e.duration_ns is None:
                    continue
                canon = re.sub(r"\.\d+$", "",
                               e.name.split(" = ")[0].lstrip("%"))
                if rx.search(canon):
                    events.append((e.duration_ns / 1e6, e.name))
    events.sort(reverse=True)
    for ms, name in events[:top]:
        print(f"{ms:9.3f} ms  {name[:400]}")


def aggregate(trace_dir: str, top: int) -> None:
    from jax.profiler import ProfileData

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    data = ProfileData.from_file(paths[-1])
    planes = list(data.planes)
    device = [p for p in planes
              if "TPU" in p.name or "/device:" in p.name.lower()]
    if not device:   # CPU runtime line lives on the host plane
        device = [p for p in planes if "CPU" in p.name]
    totals: dict = collections.defaultdict(float)
    count: dict = collections.defaultdict(int)
    wall = 0.0
    import re

    for plane in device:
        # ONLY the synchronous "XLA Ops" line: it is the serialized device
        # timeline. The "Async XLA Ops" line carries DMA slice-start/done
        # events whose durations span their in-flight window and OVERLAP
        # compute — summing them triple-counts the step (r3's empty/wrong
        # artifact came from aggregating every line).
        lines = [ln for ln in plane.lines if ln.name == "XLA Ops"]
        if not lines:
            lines = [ln for ln in plane.lines if ln.name != "python"]
        for line in lines:
            for e in line.events:
                name = e.name
                if name.startswith(("end:", "ThunkExecutor")) \
                        or e.duration_ns is None:
                    continue
                # canonical op name: "%flash_banded.3 = bf16[...] ..." ->
                # "flash_banded" so the 12 per-layer clones aggregate
                name = re.sub(r"\.\d+$", "", name.split(" = ")[0].lstrip("%"))
                totals[name] += e.duration_ns / 1e6
                count[name] += 1
                wall += e.duration_ns / 1e6
    print(f"planes: {[p.name for p in planes]}")
    print(f"aggregated {len(totals)} distinct ops, {wall:.1f} ms total\n")
    print(f"{'ms':>10}  {'%':>5}  {'calls':>5}  op")
    for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{ms:10.3f}  {100 * ms / max(wall, 1e-9):5.1f}  "
              f"{count[name]:5d}  {name[:110]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--groups", type=int, default=2)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--out", default=None,
                    help="trace dir (default: temp dir, deleted after)")
    ap.add_argument("--aggregate-only", default=None, metavar="TRACE_DIR",
                    help="re-aggregate an existing trace dir (no TPU run)")
    ap.add_argument("--detail", default=None, metavar="REGEX",
                    help="print the longest INDIVIDUAL events matching this "
                         "canonical-name regex with full HLO text (attributes "
                         "anonymous fusion buckets to model ops)")
    args = ap.parse_args()

    if args.aggregate_only:
        if args.detail:
            detail(args.aggregate_only, args.detail, args.top)
        else:
            aggregate(args.aggregate_only, args.top)
        return

    import time

    step_fn, state, tokens = build_step(args)
    t0 = time.time()
    state, metrics = step_fn(state, tokens)          # compile + warm
    _ = float(metrics["loss"])
    print(f"compiled+step1 in {time.time() - t0:.1f}s", flush=True)
    state, metrics = step_fn(state, tokens)
    _ = float(metrics["loss"])

    trace_dir = args.out or tempfile.mkdtemp(prefix="nsa_prof_")
    with jax.profiler.trace(trace_dir):
        state, metrics = step_fn(state, tokens)
        _ = float(metrics["loss"])
    if args.detail:
        detail(trace_dir, args.detail, args.top)
    else:
        aggregate(trace_dir, args.top)


if __name__ == "__main__":
    main()
