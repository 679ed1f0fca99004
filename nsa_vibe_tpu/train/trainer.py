"""Showcase trainer CLI: byte-LM training with the full ops contract.

Reference: scripts/train_showcase.py (1539 LoC DDP trainer) and
train_showcase_fsdp.py — reproduced the SPMD way:
  * YAML config + CLI overrides (replaces OmegaConf + 70 env flags);
  * mesh-sharded train step (replaces DDP/FSDP wrapping + comm hooks);
  * heartbeat jsonl + training.csv/val.csv + gate-health stats;
  * `.HALT` polling each step (watchdog-driven halt-and-resume);
  * coherent NaN abort: `good` flag computed on replicated values, N
    consecutive bad steps -> anomaly halt;
  * periodic + final Orbax checkpoints incl. optimizer state; --resume.

Run:  python -m nsa_vibe_tpu.train.trainer --config configs/train_showcase.yaml
      python -m nsa_vibe_tpu.train.trainer --steps 50 --data synthetic
"""

from __future__ import annotations

import argparse
import csv
import dataclasses
import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nsa_vibe_tpu.core.config import ModelConfig, NSAConfig, TrainConfig
from nsa_vibe_tpu.models.tinylm import init_model_params
from nsa_vibe_tpu.parallel.mesh import make_mesh
from nsa_vibe_tpu.parallel.train_step import (
    build_state_and_step,
    make_eval_step,
    make_optimizer,  # noqa: F401  (re-exported for tools)
)
from nsa_vibe_tpu.train.data import Shard, make_batches
from nsa_vibe_tpu.utils.checkpoint import latest_step, restore_checkpoint, save_checkpoint
from nsa_vibe_tpu.utils.heartbeat import Heartbeat


class _Prefetcher:
    """Background data-prefetch thread + bounded queue (reference
    pinned-memory prefetch, train_showcase.py:951-1041): batch generation
    overlaps device compute; the first get() applies a timeout so a stuck
    streaming source fails fast (first-batch smoke, :914-950)."""

    def __init__(self, batches, depth: int = 4):
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._err = None

        def worker():
            try:
                for b in batches:
                    self._q.put(b)
            except Exception as e:  # surface the loader error on get()
                self._err = e
            self._q.put(None)

        self._t = threading.Thread(target=worker, daemon=True)
        self._t.start()

    def get(self, timeout: Optional[float] = None):
        item = self._q.get(timeout=timeout)
        if item is None:
            if self._err is not None:
                raise RuntimeError(f"data loader failed: {self._err}") from self._err
            raise StopIteration("data source exhausted")
        return item


def load_config(path: Optional[str]) -> tuple[ModelConfig, TrainConfig, str]:
    """YAML with optional model/nsa/train groups; returns (mcfg, tcfg, data)."""
    raw: dict = {}
    if path:
        import yaml

        with open(path) as f:
            raw = yaml.safe_load(f) or {}
    nsa = NSAConfig(**raw.get("nsa", {}))
    model_kw = dict(raw.get("model", {}))
    data = model_kw.pop("data", raw.get("data", "synthetic"))
    mcfg = ModelConfig(nsa=nsa, **model_kw)
    tcfg = TrainConfig(**raw.get("train", {}))
    return mcfg, tcfg, data


def apply_overrides(mcfg: ModelConfig, tcfg: TrainConfig, args) -> tuple[ModelConfig, TrainConfig]:
    t_over = {
        k: getattr(args, k)
        for k in ("steps", "batch_size", "seq_len", "accum_steps", "lr", "seed",
                  "save_every", "eval_every", "log_every", "out_dir", "dp", "tp",
                  "sp", "pp", "pp_microbatches", "fsdp", "varlen")
        if getattr(args, k, None) is not None
    }
    if t_over:
        tcfg = dataclasses.replace(tcfg, **t_over)
    m_over = {}
    if args.n_layers is not None:
        m_over["n_layers"] = args.n_layers
    if args.remat:
        # True = remat whole blocks; "mlp" = recompute only the MLP
        m_over["remat"] = True if args.remat is True else args.remat
    if args.dtype is not None:
        m_over["dtype"] = args.dtype
    if m_over:
        mcfg = dataclasses.replace(mcfg, **m_over)
    return mcfg, tcfg


def train(mcfg: ModelConfig, tcfg: TrainConfig, data_source: str = "synthetic",
          resume: bool = False, watchdog_in_process: bool = False,
          profile_steps: int = 0, tokenizer: str = "byte",
          synthetic_on_fail: bool = False,
          first_batch_timeout_s: float = 120.0,
          detect_anomaly: bool = False,
          mem_dump_every: int = 0) -> dict:
    """Run training; returns summary dict (final loss, toks/s, steps done)."""
    run_dir = tcfg.out_dir
    os.makedirs(run_dir, exist_ok=True)
    rank = jax.process_index()
    n_proc = jax.process_count()

    # SIGUSR1/SIGTERM all-thread stack dumps (reference signal handlers,
    # train_showcase.py:208-226) — `kill -USR1 <pid>` on a stuck trainer
    import faulthandler
    import signal

    try:
        faulthandler.register(signal.SIGUSR1, all_threads=True, chain=True)
    except (AttributeError, ValueError):  # non-main thread / platform
        pass

    if detect_anomaly:
        # reference NSA_DETECT_ANOMALY -> torch.autograd.set_detect_anomaly;
        # the XLA analog traps the first NaN-producing op
        jax.config.update("jax_debug_nans", True)

    # environment snapshot (reference env.json, train_showcase.py:131-164)
    if rank == 0:
        with open(os.path.join(run_dir, "env.json"), "w") as f:
            json.dump({
                "jax": jax.__version__,
                "devices": [str(d) for d in jax.devices()],
                "process_count": n_proc,
                "model": dataclasses.asdict(mcfg),
                "train": dataclasses.asdict(tcfg),
                "data": data_source,
            }, f, indent=2, default=str)

    n_dev = len(jax.devices())
    # dp=0 means "infer from devices"; an explicit dp that mismatches the
    # device count raises in make_mesh rather than silently "working"
    mesh = (make_mesh(dp=tcfg.dp or None, tp=tcfg.tp, sp=tcfg.sp, pp=tcfg.pp)
            if n_dev > 1 else None)
    if n_dev == 1 and (tcfg.dp > 1 or tcfg.pp > 1):
        raise ValueError(
            f"dp={tcfg.dp}/pp={tcfg.pp} requested but only 1 device visible")

    key = jax.random.PRNGKey(tcfg.seed)
    dtype = jnp.dtype(mcfg.dtype)
    params = init_model_params(key, mcfg, dtype)
    step_fn, state, batch_shard = build_state_and_step(params, mcfg, tcfg, mesh)
    if tcfg.pp > 1:
        from nsa_vibe_tpu.parallel.pipeline import pipeline_model_loss

        eval_fn = jax.jit(lambda p, t: pipeline_model_loss(
            p, t, mcfg, mesh, microbatches=tcfg.pp_microbatches,
            fsdp=tcfg.fsdp, fsdp_min=tcfg.fsdp_min_size)[0])
    else:
        eval_fn = jax.jit(make_eval_step(mcfg, varlen=tcfg.varlen))

    ckpt_dir = os.path.join(run_dir, "ckpt")
    start_step = 0
    if resume and latest_step(ckpt_dir) is not None:
        state = restore_checkpoint(ckpt_dir, state)
        start_step = int(state.step)
        print(f"[trainer] resumed from step {start_step}", flush=True)

    def _make(src):
        if tcfg.varlen:
            from nsa_vibe_tpu.ops.varlen import make_varlen_batches

            return make_varlen_batches(
                src, tcfg.seq_len, tcfg.batch_size * tcfg.accum_steps,
                align=mcfg.nsa.l_sel, shard=Shard(n_proc, rank),
                seed=tcfg.seed, tokenizer=tokenizer, epochs=0,
            )
        return make_batches(
            src, tcfg.seq_len, tcfg.batch_size * tcfg.accum_steps,
            shard=Shard(n_proc, rank), seed=tcfg.seed, tokenizer=tokenizer,
            epochs=0,
        )

    batches = _Prefetcher(_make(data_source))
    # first-batch smoke with timeout; optional synthetic fallback
    # (reference --synthetic-on-fail, train_showcase.py:914-940)
    try:
        first_batch = batches.get(timeout=first_batch_timeout_s)
    except Exception as e:
        if not synthetic_on_fail or data_source == "synthetic":
            raise
        print(f"[trainer] data source {data_source!r} failed ({e}); "
              "falling back to synthetic", flush=True)
        batches = _Prefetcher(_make("synthetic"))
        first_batch = batches.get(timeout=60.0)

    hb = Heartbeat(os.path.join(run_dir, "heartbeat.jsonl"), rank)
    # optional TensorBoard scalars (reference train_showcase.py TB output);
    # torch's writer has no heavyweight deps and is gated on availability
    tb = None
    if rank == 0:
        try:
            from torch.utils.tensorboard import SummaryWriter

            tb = SummaryWriter(os.path.join(run_dir, "tb"))
        except Exception:
            tb = None
    csv_path = os.path.join(run_dir, "training.csv")
    val_path = os.path.join(run_dir, "val.csv")
    new_csv = not (resume and os.path.exists(csv_path))
    csv_f = open(csv_path, "w" if new_csv else "a", newline="")
    csv_w = csv.writer(csv_f)
    if new_csv:
        csv_w.writerow(["step", "loss", "toks_per_s", "grad_norm", "gate_entropy",
                        "gate_max", "gate_collapse_frac", "share_cmp", "share_sel",
                        "share_win", "sel_k_mean", "sel_k_max", "bad_steps"])

    if watchdog_in_process:
        import threading

        from nsa_vibe_tpu.utils.watchdog import watch

        threading.Thread(target=watch, args=(run_dir,), daemon=True).start()

    halt_path = os.path.join(run_dir, ".HALT")
    bad_streak = 0
    total_bad = 0
    tokens_per_step = tcfg.accum_steps * tcfg.batch_size * tcfg.seq_len * n_proc
    last_loss = float("nan")
    t_start = time.perf_counter()
    t_window = t_start
    pending_good: list = []
    step = start_step
    summary_toks = 0.0

    # device trace over a few post-compile steps (reference NVTX/profiler
    # tooling, SURVEY.md §5; view with tensorboard/xprof or Perfetto)
    prof_start = start_step + 2
    prof_active = False

    for step in range(start_step, tcfg.steps):
        if profile_steps and rank == 0:
            if step == prof_start:
                jax.profiler.start_trace(os.path.join(run_dir, "profile"))
                prof_active = True
            elif prof_active and step == prof_start + profile_steps:
                jax.profiler.stop_trace()
                prof_active = False
        if os.path.exists(halt_path):
            print(f"[trainer] .HALT detected at step {step}; exiting gracefully", flush=True)
            break
        if first_batch is not None:
            batch_np, first_batch = first_batch, None
        else:
            batch_np = batches.get(timeout=300.0)
        A, Bsz = tcfg.accum_steps, tcfg.batch_size
        if tcfg.varlen:
            toks, ds, lm = batch_np
            batch = (jnp.asarray(toks.reshape(A, Bsz, -1)),
                     jnp.asarray(ds.reshape(A, Bsz, -1)),
                     jnp.asarray(lm.reshape(A, Bsz, -1)))
        else:
            batch = jnp.asarray(batch_np.reshape(A, Bsz, tcfg.seq_len + 1))
        if batch_shard is not None:
            batch = jax.device_put(batch, batch_shard)
        state, metrics = step_fn(state, batch)
        # async logging: dispatching the next step before fetching this
        # step's scalars keeps the device busy (a per-step float() sync
        # serializes host and device — the reference ships an async
        # logging path for the same reason). Device scalars queue in
        # pending_good and are materialized together at log boundaries,
        # so NaN-abort latency is bounded by log_every, not lost.
        pending_good.append(metrics["good"])
        sync_now = (step + 1) % tcfg.log_every == 0 or step == start_step \
            or step == tcfg.steps - 1 \
            or (tcfg.eval_every and (step + 1) % tcfg.eval_every == 0) \
            or (tcfg.save_every and (step + 1) % tcfg.save_every == 0)
        if sync_now:
            loss = float(metrics["loss"])   # completes all queued steps
            now = time.perf_counter()
            n_window = len(pending_good)
            toks_per_s = tokens_per_step * n_window / max(now - t_window, 1e-9)
            t_window = now
            summary_toks = toks_per_s
            last_loss = loss

            abort = False
            for g in pending_good:
                if not bool(g):
                    bad_streak += 1
                    total_bad += 1
                    if bad_streak >= 3:
                        abort = True
                else:
                    bad_streak = 0
            pending_good = []
            if abort:
                with open(os.path.join(run_dir, ".anomaly_type"), "w") as f:
                    f.write("nan_loss\n")
                with open(halt_path, "w") as f:
                    f.write("coherent NaN abort\n")
                print(f"[trainer] NaN abort at step {step}", flush=True)
                break

        if sync_now:
            shares = np.asarray(metrics["branch_shares"])
            row = [step + 1, f"{loss:.6f}", f"{toks_per_s:.1f}",
                   f"{float(metrics['grad_norm']):.4f}",
                   f"{float(metrics['gate_entropy']):.4f}",
                   f"{float(metrics['gate_max']):.4f}",
                   f"{float(metrics['gate_collapse_frac']):.4f}",
                   f"{shares[0]:.4f}", f"{shares[1]:.4f}", f"{shares[2]:.4f}",
                   f"{float(metrics['sel_k_mean']):.2f}",
                   f"{float(metrics['sel_k_max']):.0f}",
                   total_bad]
            csv_w.writerow(row)
            csv_f.flush()
            hb.beat(step + 1, loss=loss, toks_per_s=toks_per_s,
                    grad_norm=float(metrics["grad_norm"]),
                    gate_entropy=float(metrics["gate_entropy"]),
                    gate_max=float(metrics["gate_max"]),
                    gate_collapse_frac=float(metrics["gate_collapse_frac"]))
            if tb is not None:
                tb.add_scalar("train/loss", loss, step + 1)
                tb.add_scalar("train/toks_per_s", toks_per_s, step + 1)
                tb.add_scalar("train/grad_norm", float(metrics["grad_norm"]), step + 1)
                tb.add_scalar("gate/entropy", float(metrics["gate_entropy"]), step + 1)
                tb.add_scalar("gate/collapse_frac",
                              float(metrics["gate_collapse_frac"]), step + 1)
                tb.add_scalar("sel/k_mean", float(metrics["sel_k_mean"]), step + 1)
            print(f"[trainer] step {step+1} loss {loss:.4f} {toks_per_s:.0f} toks/s",
                  flush=True)

        if tcfg.eval_every and (step + 1) % tcfg.eval_every == 0:
            vb = batches.get(timeout=300.0)
            if tcfg.varlen:
                vb = tuple(jnp.asarray(a[: tcfg.batch_size]) for a in vb)
                vl = float(eval_fn(state.params, vb))
            else:
                vl = float(eval_fn(state.params, jnp.asarray(vb[: tcfg.batch_size])))
            with open(val_path, "a", newline="") as vf:
                csv.writer(vf).writerow([step + 1, f"{vl:.6f}", f"{np.exp(vl):.4f}"])

        if tcfg.save_every and (step + 1) % tcfg.save_every == 0 and rank == 0:
            save_checkpoint(ckpt_dir, step + 1, state)

        if mem_dump_every and (step + 1) % mem_dump_every == 0 and rank == 0:
            # reference _dump_mem / NSA_MEM_DUMP_EVERY (train_showcase.py:245)
            stats = getattr(jax.local_devices()[0], "memory_stats", lambda: None)()
            if stats:
                with open(os.path.join(run_dir, f"mem_step{step + 1}.json"), "w") as f:
                    json.dump({k: int(v) for k, v in stats.items()}, f, indent=2)

    if prof_active:
        jax.profiler.stop_trace()
    if tb is not None:
        tb.close()
    if rank == 0:
        save_checkpoint(ckpt_dir, int(state.step), state)
    csv_f.close()
    wall = time.perf_counter() - t_start
    return {
        "final_loss": last_loss,
        "steps": int(state.step),
        "toks_per_s": summary_toks,
        "wall_s": wall,
        "bad_steps": total_bad,
    }


def main() -> None:
    from nsa_vibe_tpu.ops.tuning import apply_tpu_env
    apply_tpu_env()   # scoped-vmem budget flag; before backend init
    ap = argparse.ArgumentParser(description="NSA TPU showcase trainer")
    ap.add_argument("--config", default=None)
    ap.add_argument("--data", default=None, help="synthetic | path.jsonl | fineweb[:name]")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--batch-size", dest="batch_size", type=int, default=None)
    ap.add_argument("--seq-len", dest="seq_len", type=int, default=None)
    ap.add_argument("--accum-steps", dest="accum_steps", type=int, default=None)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--n-layers", dest="n_layers", type=int, default=None)
    ap.add_argument("--remat", nargs="?", const=True, default=False,
                    help="full block remat; --remat mlp = MLP-only")
    ap.add_argument("--dtype", default=None)
    ap.add_argument("--save-every", dest="save_every", type=int, default=None)
    ap.add_argument("--eval-every", dest="eval_every", type=int, default=None)
    ap.add_argument("--log-every", dest="log_every", type=int, default=None)
    ap.add_argument("--out-dir", dest="out_dir", default=None)
    ap.add_argument("--dp", type=int, default=None)
    ap.add_argument("--tp", type=int, default=None)
    ap.add_argument("--pp", type=int, default=None,
                    help="pipeline-parallel stages (GPipe microbatching)")
    ap.add_argument("--pp-microbatches", dest="pp_microbatches", type=int,
                    default=None, help="microbatches per step under --pp (0=pp)")
    ap.add_argument("--sp", type=int, default=None,
                    help="sequence-parallel axis (context-parallel attention)")
    ap.add_argument("--fsdp", action="store_true", default=None,
                    help="fully shard params/optimizer over dp (ZeRO-3)")
    ap.add_argument("--varlen", action="store_true", default=None,
                    help="document-masked packed batching (no cross-doc "
                         "attention; loss-masked padding; ops.varlen)")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--watchdog", action="store_true", help="in-process watchdog thread")
    ap.add_argument("--profile", type=int, default=0, metavar="N",
                    help="trace N steps with jax.profiler into out_dir/profile")
    ap.add_argument("--tokenizer", default="byte",
                    help='"byte" or "hf:<name_or_path>"')
    ap.add_argument("--synthetic-on-fail", dest="synthetic_on_fail",
                    action="store_true",
                    help="fall back to synthetic data if the source fails")
    ap.add_argument("--detect-anomaly", dest="detect_anomaly", action="store_true",
                    help="trap the first NaN-producing op (jax_debug_nans)")
    ap.add_argument("--mem-dump-every", dest="mem_dump_every", type=int, default=0,
                    help="write device memory_stats JSON every N steps")
    args = ap.parse_args()

    mcfg, tcfg, data = load_config(args.config)
    mcfg, tcfg = apply_overrides(mcfg, tcfg, args)
    if args.data is not None:
        data = args.data
    summary = train(mcfg, tcfg, data, resume=args.resume,
                    watchdog_in_process=args.watchdog,
                    profile_steps=args.profile, tokenizer=args.tokenizer,
                    synthetic_on_fail=args.synthetic_on_fail,
                    detect_anomaly=args.detect_anomaly,
                    mem_dump_every=args.mem_dump_every)
    print(json.dumps({"summary": summary}), flush=True)


if __name__ == "__main__":
    main()
