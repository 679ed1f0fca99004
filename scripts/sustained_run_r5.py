"""r5 sustained on-device training run + ops drills (VERDICT items 1, 10).

Exercises trainer + watchdog + checkpointing + varlen data pipeline as
ONE system, the reference's TRAINING_STATUS.md evidence class
(/root/reference/TRAINING_STATUS.md:4-10 — its 50k-step run with an ops
trail):

  phase 1  m7c-12L --varlen on real packed data (the repo's own text as
           a jsonl corpus, 138 docs), in-process watchdog, Orbax
           checkpoints every 1000 steps — launched as a subprocess and
           SIGKILLed (un-graceful, preemption-style) mid-run once it
           passes --kill-after steps;
  phase 2  relaunch with --resume: must pick up from the latest
           checkpoint and continue the loss trajectory to --steps;
  phase 3  watchdog fire drill: a short run with nsa.force_branch=win
           (gates collapse by construction) — the LIVE watchdog thread
           must write .anomaly_type=gate_collapse + .HALT and the
           trainer must exit gracefully on it;
  summary  artifacts/published/sustained_r5_summary.json + the run's
           training.csv/heartbeat.jsonl are the published artifacts.

Kill discipline: only the exact child PID is ever signalled (no pattern
kills). Run from the repo root with the default (TPU) environment.
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUN_DIR = os.path.join(REPO, "artifacts", "train", "sustained_r5")
DRILL_DIR = os.path.join(REPO, "artifacts", "train", "watchdog_drill_r5")
CORPUS = os.path.join(REPO, "artifacts", "train", "corpus_r5.jsonl")


def trainer_cmd(steps: int, out_dir: str, resume: bool = False,
                extra: list | None = None) -> list:
    cmd = [sys.executable, "-m", "nsa_vibe_tpu.train.trainer",
           "--config", os.path.join(REPO, "configs", "m7c_125m.yaml"),
           "--data", CORPUS, "--varlen",
           "--steps", str(steps), "--batch-size", "16",
           "--save-every", "1000", "--eval-every", "1000",
           "--log-every", "20", "--watchdog",
           "--out-dir", out_dir]
    if resume:
        cmd.append("--resume")
    return cmd + (extra or [])


def last_csv_step(path: str) -> int:
    try:
        with open(path) as f:
            rows = list(csv.reader(f))
        return int(rows[-1][0]) if len(rows) > 1 else 0
    except (OSError, ValueError, IndexError):
        return 0


def run_phase1(steps: int, kill_after: int) -> dict:
    os.makedirs(RUN_DIR, exist_ok=True)
    log = open(os.path.join(RUN_DIR, "phase1.log"), "w")
    t0 = time.time()
    proc = subprocess.Popen(trainer_cmd(steps, RUN_DIR), cwd=REPO,
                            stdout=log, stderr=subprocess.STDOUT)
    csv_path = os.path.join(RUN_DIR, "training.csv")
    killed_at = None
    while proc.poll() is None:
        time.sleep(20)
        s = last_csv_step(csv_path)
        if s >= kill_after:
            killed_at = s
            os.kill(proc.pid, signal.SIGKILL)   # exact PID, preemption-style
            break
    proc.wait()
    log.close()
    return {"killed_at_step": killed_at, "rc": proc.returncode,
            "wall_s": round(time.time() - t0, 1)}


def run_phase2(steps: int) -> dict:
    # resume protocol: .HALT is a hard startup gate (tested trainer
    # contract) — the operator clears it to restart; keep a copy for
    # the ops trail
    for name in (".HALT", ".anomaly_type"):
        p = os.path.join(RUN_DIR, name)
        if os.path.exists(p):
            os.replace(p, p + ".phase1")
    log = open(os.path.join(RUN_DIR, "phase2.log"), "w")
    t0 = time.time()
    proc = subprocess.Popen(trainer_cmd(steps, RUN_DIR, resume=True),
                            cwd=REPO, stdout=log, stderr=subprocess.STDOUT)
    rc = proc.wait()
    log.close()
    return {"rc": rc, "wall_s": round(time.time() - t0, 1),
            "final_step": last_csv_step(os.path.join(RUN_DIR, "training.csv"))}


def run_drill(steps: int = 400) -> dict:
    """Watchdog fire drill: collapse the gates by construction and verify
    the live watchdog halts the trainer."""
    import tempfile

    import yaml

    # fresh drill dir: a leftover .HALT from a previous drill would gate
    # the trainer at startup and fake a "fired" result
    import shutil
    if os.path.isdir(DRILL_DIR):
        shutil.rmtree(DRILL_DIR)
    os.makedirs(DRILL_DIR, exist_ok=True)
    with open(os.path.join(REPO, "configs", "m7c_125m.yaml")) as f:
        cfg = yaml.safe_load(f)
    cfg["nsa"]["force_branch"] = "win"
    cfg["model"]["n_layers"] = 4                  # fast steps; drill only
    fd, path = tempfile.mkstemp(suffix="_drill.yaml")
    with os.fdopen(fd, "w") as f:
        yaml.safe_dump(cfg, f)
    cmd = [sys.executable, "-m", "nsa_vibe_tpu.train.trainer",
           "--config", path, "--data", CORPUS, "--varlen",
           "--steps", str(steps), "--batch-size", "8",
           "--log-every", "10", "--watchdog", "--save-every", str(steps),
           "--out-dir", DRILL_DIR]
    log = open(os.path.join(DRILL_DIR, "drill.log"), "w")
    t0 = time.time()
    rc = subprocess.run(cmd, cwd=REPO, stdout=log,
                        stderr=subprocess.STDOUT, timeout=1800).returncode
    log.close()
    anom = os.path.join(DRILL_DIR, ".anomaly_type")
    halted = os.path.exists(os.path.join(DRILL_DIR, ".HALT"))
    atype = open(anom).read().strip() if os.path.exists(anom) else None
    return {"rc": rc, "halted": halted, "anomaly_type": atype,
            "wall_s": round(time.time() - t0, 1),
            "final_step": last_csv_step(os.path.join(DRILL_DIR, "training.csv"))}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5200)
    ap.add_argument("--kill-after", type=int, default=2600)
    ap.add_argument("--skip-drill", action="store_true")
    ap.add_argument("--phase2-only", action="store_true",
                    help="re-run the resume leg against an existing "
                         "phase-1 run dir (e.g. after an ops fix)")
    ap.add_argument("--drill-only", action="store_true",
                    help="re-run just the watchdog fire drill + summary "
                         "against the existing sustained run dir")
    args = ap.parse_args()

    if args.drill_only:
        drill = run_drill()
        print("drill:", json.dumps(drill), flush=True)
        _summarize(args, {"note": "see phase1/phase2 of the earlier "
                                  "invocations"}, {"final_step":
                          last_csv_step(os.path.join(RUN_DIR,
                                                     "training.csv"))},
                   drill)
        return

    if args.phase2_only:
        p1 = {"killed_at_step": args.kill_after, "rc": -9,
              "note": "phase1 preserved from the earlier invocation"}
    else:
        p1 = run_phase1(args.steps, args.kill_after)
    print("phase1:", json.dumps(p1), flush=True)
    p2 = run_phase2(args.steps)
    print("phase2:", json.dumps(p2), flush=True)
    drill = None if args.skip_drill else run_drill()
    print("drill:", json.dumps(drill), flush=True)
    _summarize(args, p1, p2, drill)


def _summarize(args, p1, p2, drill) -> None:
    # summarize the loss trajectory across the kill/resume boundary
    csv_path = os.path.join(RUN_DIR, "training.csv")
    with open(csv_path) as f:
        rows = [r for r in csv.reader(f)][1:]
    steps = [int(r[0]) for r in rows]
    losses = [float(r[1]) for r in rows]
    k = args.kill_after
    around = {s: l for s, l in zip(steps, losses) if abs(s - k) <= 700}
    summary = {
        "phase1": p1, "phase2": p2, "watchdog_drill": drill,
        "steps_logged": len(steps), "final_step": steps[-1],
        "loss_first": losses[0], "loss_at_kill_window": around,
        "loss_final": losses[-1],
        "loss_monotone_trend": losses[-1] < losses[len(losses) // 4],
    }
    out = os.path.join(REPO, "artifacts", "published",
                       "sustained_r5_summary.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print("summary ->", out, flush=True)


if __name__ == "__main__":
    main()
