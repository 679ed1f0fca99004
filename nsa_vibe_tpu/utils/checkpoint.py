"""Checkpoint save/restore via Orbax.

Improvement over the reference (torch.save of model state only,
train_showcase.py:1489-1524; resume drops optimizer/step :1073-1086):
we checkpoint the *full* TrainState — params, optimizer moments, step —
with async Orbax writes, and restore all of it. Works with sharded
arrays on a mesh (Orbax handles per-shard IO).
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

_STEP_RE = re.compile(r"^step_(\d+)$")


def _ckptr() -> ocp.StandardCheckpointer:
    return ocp.StandardCheckpointer()


def save_checkpoint(ckpt_dir: str, step: int, state: Any) -> str:
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    c = _ckptr()
    c.save(path, state, force=True)
    c.wait_until_finished()
    return path


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for name in os.listdir(ckpt_dir):
        m = _STEP_RE.match(name)
        if m:
            steps.append(int(m.group(1)))
    return max(steps) if steps else None


def restore_checkpoint(ckpt_dir: str, state_like: Any, step: Optional[int] = None) -> Any:
    """Restore into the structure AND shardings of `state_like` (a concrete
    or abstract TrainState): restored arrays land on the same mesh
    placement as the live state — required for sharded (dp/tp/fsdp)
    resume, where a default-device restore would mix placements."""
    if step is None:
        step = latest_step(ckpt_dir)
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")

    def abstract(x):
        sharding = getattr(x, "sharding", None)
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)

    return _ckptr().restore(
        path, jax.tree_util.tree_map(abstract, state_like)
    )
