"""Sharded training step: loss, grads, optimizer, safety rails.

The reference's training-loop contracts reproduced the SPMD way
(scripts/train_showcase.py:1183-1320):
  * fp32 cross-entropy loss;
  * gradient accumulation (no_sync micro-steps -> lax.scan over
    micro-batches inside one jitted step);
  * global-norm clipping + AdamW + warmup-cosine schedule;
  * coherent NaN/Inf abort: a single global `good` flag (computed on
    GSPMD-replicated values, so every host/chip agrees by construction —
    replacing the all-reduced finite check, :1264-1286); a bad step is
    skipped (params/opt state unchanged) and reported.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from nsa_vibe_tpu.core.config import ModelConfig, TrainConfig
from nsa_vibe_tpu.models.tinylm import cross_entropy_loss, model_forward


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32


def make_optimizer(tcfg: TrainConfig) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=tcfg.lr,
        warmup_steps=tcfg.warmup_steps,
        decay_steps=max(tcfg.steps, tcfg.warmup_steps + 1),
        end_value=tcfg.lr * 0.1,
    )
    return optax.chain(
        optax.clip_by_global_norm(tcfg.max_grad_norm),
        optax.adamw(schedule, weight_decay=tcfg.weight_decay),
    )


def init_train_state(params, tcfg: TrainConfig) -> TrainState:
    opt = make_optimizer(tcfg)
    return TrainState(params=params, opt_state=opt.init(params), step=jnp.zeros((), jnp.int32))


def make_train_step(mcfg: ModelConfig, tcfg: TrainConfig, mesh=None):
    """Returns train_step(state, tokens) -> (state', metrics).

    tokens: [accum, B, S+1] int32 (accum axis present even when 1).
    With tcfg.sp > 1 (and a mesh), every layer's attention runs
    sequence-sharded over the sp axis (context-parallel long-context
    training); gate/selection stats are collected on both paths (the
    watchdog's gate-collapse detection must stay live on exactly the
    long-context runs where collapse is most likely).
    """
    optimizer = make_optimizer(tcfg)
    use_pp = mesh is not None and tcfg.pp > 1
    use_cp = mesh is not None and tcfg.sp > 1 and not use_pp
    if mesh is not None:
        for name, want in (("sp", tcfg.sp), ("pp", tcfg.pp), ("tp", tcfg.tp)):
            have = mesh.shape.get(name, 1)
            if want > 1 and have != want:
                raise ValueError(
                    f"tcfg.{name}={want} but the mesh's {name} axis is {have}")

    collect = tcfg.gate_stats

    def loss_fn(params, tok_row):
        if use_pp:
            from nsa_vibe_tpu.parallel.pipeline import pipeline_model_loss

            if tcfg.varlen:
                toks, seq_start, loss_mask = tok_row
            else:
                toks, seq_start, loss_mask = tok_row, None, None
            loss, aux = pipeline_model_loss(
                params, toks, mcfg, mesh,
                microbatches=tcfg.pp_microbatches, collect_aux=collect,
                fsdp=tcfg.fsdp, fsdp_min=tcfg.fsdp_min_size,
                seq_start=seq_start, loss_mask=loss_mask,
            )
            return loss, aux
        if tcfg.varlen:
            # tok_row = (tokens [B,S+1], seq_start [B,S], loss_mask [B,S])
            toks, seq_start, loss_mask = tok_row
            if use_cp:
                from nsa_vibe_tpu.parallel.context import (
                    context_parallel_model_forward,
                )

                r = context_parallel_model_forward(
                    params, toks[:, :-1], mcfg, mesh,
                    batch_axis="dp" if mesh.shape["dp"] > 1 else None,
                    collect_aux=collect, seq_start=seq_start,
                )
                logits, aux = (r if collect else (r, None))
                loss = cross_entropy_loss(logits, toks[:, 1:], mask=loss_mask)
                return loss, aux
            logits, auxes = model_forward(params, toks[:, :-1], mcfg,
                                          collect_aux=collect, seq_start=seq_start)
            loss = cross_entropy_loss(logits, toks[:, 1:], mask=loss_mask)
            if not collect:
                return loss, None
            gates = jnp.stack([a["gates"] for a in auxes])
            sel = jnp.stack([a["sel_idx"] for a in auxes])
            return loss, (gates.astype(jnp.float32), sel)
        if use_cp:
            from nsa_vibe_tpu.parallel.context import context_parallel_model_forward

            r = context_parallel_model_forward(
                params, tok_row[:, :-1], mcfg, mesh,
                batch_axis="dp" if mesh.shape["dp"] > 1 else None,
                collect_aux=collect,
            )
            logits, (gates, sel) = r if collect else (r, (None, None))
        else:
            logits, auxes = model_forward(params, tok_row[:, :-1], mcfg,
                                          collect_aux=collect)
            if collect:
                gates = jnp.stack([a["gates"] for a in auxes])   # [L,B,S,G,3]
                sel = jnp.stack([a["sel_idx"] for a in auxes])   # [L,B,S,G,n]
        loss = cross_entropy_loss(logits, tok_row[:, 1:])
        if not collect:
            return loss, None
        return loss, (gates.astype(jnp.float32), sel)

    def micro(carry, tok_row):
        params, grad_acc, loss_acc, gate_acc, kmax_acc = carry
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, tok_row
        )
        grad_acc = jax.tree_util.tree_map(jnp.add, grad_acc, grads)
        if aux is None:
            stats = jnp.zeros((7,), jnp.float32)
            kmax = jnp.zeros((), jnp.float32)
        else:
            gates, sel = aux
            g = gates.reshape(-1, 3)
            entropy = -jnp.sum(g * jnp.log(g + 1e-8), axis=-1)
            max_gate = jnp.max(g, axis=-1)
            # selection k-stats (reference k_stats.csv,
            # nsa_attention.py:455-507): distinct selected blocks per row
            k_per_row = (sel >= 0).sum(axis=-1).astype(jnp.float32)
            stats = jnp.array([
                entropy.mean(), max_gate.mean(),
                ((entropy < 0.1) & (max_gate > 0.95)).astype(jnp.float32).mean(),
                *g.mean(axis=0),
                k_per_row.mean(),
            ])
            kmax = k_per_row.max()
        # mean stats sum (scaled by 1/accum after the scan); the max stat
        # accumulates with maximum — summing per-micro maxes is not a max
        return (params, grad_acc, loss_acc + loss, gate_acc + stats,
                jnp.maximum(kmax_acc, kmax)), None

    def train_step(state: TrainState, tokens):
        # varlen: tokens = (tokens [A,B,S+1], seq_start [A,B,S], loss_mask)
        accum = (tokens[0] if isinstance(tokens, (tuple, list)) else tokens).shape[0]
        zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        (_, grads, loss_sum, gate_sum, kmax), _ = jax.lax.scan(
            micro,
            (state.params, zeros, jnp.zeros((), jnp.float32),
             jnp.zeros((7,), jnp.float32), jnp.zeros((), jnp.float32)),
            tokens,
        )
        inv = 1.0 / float(accum)
        grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
        loss = loss_sum * inv
        gate_stats = gate_sum * inv

        grad_norm = optax.global_norm(grads)
        good = jnp.isfinite(loss) & jnp.isfinite(grad_norm)

        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # coherent skip: replicated `good` flag gates the whole update
        params = jax.tree_util.tree_map(
            lambda new, old: jnp.where(good, new, old), new_params, state.params
        )
        opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(good, new, old) if hasattr(new, "dtype") else new,
            new_opt, state.opt_state,
        )
        metrics = {
            "loss": loss,
            "grad_norm": grad_norm,
            "good": good,
            "gate_entropy": gate_stats[0],
            "gate_max": gate_stats[1],
            "gate_collapse_frac": gate_stats[2],
            "branch_shares": gate_stats[3:6],
            "sel_k_mean": gate_stats[6],
            "sel_k_max": kmax,
            # varlen: supervised (non-pad) tokens; else full batch tokens
            "tokens": (tokens[2].sum().astype(jnp.int32)
                       if isinstance(tokens, (tuple, list))
                       else jnp.asarray(
                           tokens.shape[0] * tokens.shape[1] * (tokens.shape[2] - 1),
                           jnp.int32)),
        }
        return TrainState(params=params, opt_state=opt_state, step=state.step + 1), metrics

    return train_step


def make_eval_step(mcfg: ModelConfig, varlen: bool = False):
    if varlen:
        def eval_step_v(params, batch) -> jnp.ndarray:
            toks, seq_start, loss_mask = batch
            logits, _ = model_forward(params, toks[:, :-1], mcfg,
                                      seq_start=seq_start)
            return cross_entropy_loss(logits, toks[:, 1:], mask=loss_mask)

        return eval_step_v

    def eval_step(params, tokens: jnp.ndarray) -> jnp.ndarray:
        logits, _ = model_forward(params, tokens[:, :-1], mcfg)
        return cross_entropy_loss(logits, tokens[:, 1:])

    return eval_step


def build_state_and_step(params, mcfg: ModelConfig, tcfg: TrainConfig, mesh=None):
    """Shard params over the mesh (optimizer moments inherit the sharding
    via `optimizer.init` on already-placed params — computation follows
    data), jit the step with donation. Returns (step_fn, state,
    batch_sharding)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nsa_vibe_tpu.parallel.mesh import param_shardings

    batch_shard = None
    if mesh is not None:
        if tcfg.pp > 1:
            from nsa_vibe_tpu.parallel.pipeline import (
                pipeline_param_shardings,
                stack_blocks,
            )

            params = stack_blocks(params)
            params = jax.device_put(
                params,
                pipeline_param_shardings(params, mesh, fsdp=tcfg.fsdp,
                                         fsdp_min=tcfg.fsdp_min_size))
        else:
            params = jax.device_put(
                params,
                param_shardings(params, mesh, fsdp=tcfg.fsdp,
                                fsdp_min=tcfg.fsdp_min_size),
            )
        batch_shard = NamedSharding(mesh, P(None, "dp", None))  # [accum, B, S+1]
    state = init_train_state(params, tcfg)
    if mesh is not None:
        # canonicalize placement: optimizer scalars (adam count, step) are
        # created uncommitted by optax — pin them replicated on the mesh so
        # checkpoint restore (which commits placements) round-trips cleanly
        rep = NamedSharding(mesh, P())

        def place(x):
            if hasattr(x, "devices") and len(x.devices()) == mesh.size:
                return x
            return jax.device_put(x, rep)

        state = jax.tree_util.tree_map(place, state)
    step_fn = jax.jit(make_train_step(mcfg, tcfg, mesh), donate_argnums=(0,))
    return step_fn, state, batch_shard
