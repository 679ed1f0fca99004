"""Minimal toy-LM trainer — the M5 trainability proof.

Reference: scripts/train_toy.py (160 LoC) — a tiny byte-LM trained on a
repeating synthetic corpus with a bare optimization loop, no trainer
machinery, proving the NSA block learns end-to-end. This version runs the
same proof through the framework's functional model + optax, printing a
loss curve and asserting the final loss dropped.

Run: JAX_PLATFORMS=cpu PYTHONPATH= python scripts/train_toy.py [--steps 100]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--seq-len", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--layers", type=int, default=1)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--log-every", type=int, default=10)
    args = ap.parse_args()

    import optax

    from nsa_vibe_tpu.core.config import ModelConfig, NSAConfig
    from nsa_vibe_tpu.models.tinylm import cross_entropy_loss, init_model_params, model_forward

    mcfg = ModelConfig(
        vocab_size=256,
        n_layers=args.layers,
        nsa=NSAConfig(dim=args.dim, n_heads=4, n_kv_groups=2, d_k=16, d_v=16,
                      l=8, d=4, l_sel=16, n_sel=4, w=32, kernel="reference"),
    )
    params = init_model_params(jax.random.PRNGKey(0), mcfg)
    opt = optax.adamw(args.lr)
    opt_state = opt.init(params)

    # repeating synthetic corpus: a fixed random byte phrase tiled to length
    rng = np.random.default_rng(1337)
    phrase = rng.integers(0, 256, size=37, dtype=np.int64)
    stream = np.tile(phrase, (args.batch * (args.seq_len + 1)) // len(phrase) + 2)

    def batch_at(step: int) -> jnp.ndarray:
        o = step % len(phrase)
        flat = stream[o:o + args.batch * (args.seq_len + 1)]
        return jnp.asarray(flat.reshape(args.batch, args.seq_len + 1))

    @jax.jit
    def step_fn(params, opt_state, tokens):
        def loss_fn(p):
            logits, _ = model_forward(p, tokens[:, :-1], mcfg)
            return cross_entropy_loss(logits, tokens[:, 1:])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.perf_counter()
    first = last = None
    for step in range(args.steps):
        params, opt_state, loss = step_fn(params, opt_state, batch_at(step))
        if step == 0:
            first = float(loss)
        if step == args.steps - 1:
            last = float(loss)
        if step % args.log_every == 0 or step == args.steps - 1:
            print(f"[toy] step {step} loss {float(loss):.4f}", flush=True)
    wall = time.perf_counter() - t0
    ok = last < first * 0.7
    print(json.dumps({"first_loss": first, "final_loss": last,
                      "wall_s": round(wall, 2), "loss_dropped": ok}))
    if not ok:
        raise SystemExit("toy training did not reduce loss")


if __name__ == "__main__":
    main()
