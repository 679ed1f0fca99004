"""True multi-process distributed training (2 processes x 4 CPU devices).

The reference's multi-host story is torchrun + NCCL process groups
(scripts/train_showcase.py:410-448). Ours is jax.distributed + GSPMD: the
SAME sharded train step runs single-chip, 8-chip, or multi-host. The
8-device dryrun exercises the mesh single-process; this test launches TWO
real processes with a coordinator, builds the global (dp=8) mesh spanning
both, feeds per-process local batch shards, and checks both processes
agree on the (replicated) loss — i.e. cross-process gradient psum really
ran. CPU-only, no TPU needed.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import sys
import jax
import jax.numpy as jnp
import numpy as np

port, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

from nsa_vibe_tpu.core.config import ModelConfig, NSAConfig, TrainConfig
from nsa_vibe_tpu.models.tinylm import init_model_params
from nsa_vibe_tpu.parallel.mesh import make_mesh
from nsa_vibe_tpu.parallel.train_step import build_state_and_step

nsa = NSAConfig(dim=64, n_heads=4, n_kv_groups=2, d_k=16, d_v=16,
                l=8, d=4, l_sel=16, n_sel=4, w=32)
mcfg = ModelConfig(vocab_size=64, n_layers=1, nsa=nsa, dtype="float32")
tcfg = TrainConfig(steps=2, batch_size=8, seq_len=32, accum_steps=1)

mesh = make_mesh()          # dp=8 over the global device set
params = init_model_params(jax.random.PRNGKey(0), mcfg)   # same on both procs
step_fn, state, batch_shard = build_state_and_step(params, mcfg, tcfg, mesh)

# per-process local half of the global [1, 8, 33] batch (rows 0-3 / 4-7)
rng = np.random.default_rng(0)
full = rng.integers(0, 64, (1, 8, tcfg.seq_len + 1)).astype(np.int32)
local = full[:, pid * 4:(pid + 1) * 4]
tokens = jax.make_array_from_process_local_data(batch_shard, local)
assert tokens.shape == (1, 8, tcfg.seq_len + 1)

state, metrics = step_fn(state, tokens)
state, metrics = step_fn(state, tokens)
loss = float(metrics["loss"])
assert np.isfinite(loss), loss
print(f"MP_RESULT {pid} {loss:.6f}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_train_step():
    port = _free_port()
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "PYTHONPATH": REPO,
    }
    procs = [
        subprocess.Popen([sys.executable, "-c", WORKER, str(port), str(i)],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True, cwd=REPO)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
    losses = []
    for out in outs:
        line = next(ln for ln in out.splitlines() if ln.startswith("MP_RESULT"))
        losses.append(float(line.split()[2]))
    # replicated loss must be identical across processes (same global psum)
    assert losses[0] == losses[1], losses
