"""TinyLM: byte-level language model over NSA blocks.

Reference: the TinyLM defined inline in both trainers
(scripts/train_showcase.py:30-117) — embedding, n × LlamaBlockNSA,
final RMSNorm, untied LM head; per-layer gradient checkpointing.

Additions over the reference: a real cached generation path
(init_model_caches / model_decode_step / generate) — the reference only
decodes at the NSAAttention level.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nsa_vibe_tpu.core.cache import NSACache, cache_from_prefill, init_cache
from nsa_vibe_tpu.core.config import ModelConfig
from nsa_vibe_tpu.models.llama_block import (
    block_decode_step,
    block_prefill,
    init_block_params,
    rmsnorm,
)


def init_model_params(key: jax.Array, mcfg: ModelConfig, dtype=jnp.float32) -> dict:
    dim = mcfg.nsa.dim
    keys = jax.random.split(key, mcfg.n_layers + 2)
    lim = 1.0 / np.sqrt(dim)
    return {
        "embed": jax.random.normal(keys[0], (mcfg.vocab_size, dim), dtype) * 0.02,
        "blocks": [
            init_block_params(keys[i + 1], mcfg, dtype) for i in range(mcfg.n_layers)
        ],
        "final_norm": jnp.ones((dim,), dtype),
        "lm_head": jax.random.uniform(keys[-1], (dim, mcfg.vocab_size), dtype, -lim, lim),
    }


def model_forward(
    params: dict, tokens: jnp.ndarray, mcfg: ModelConfig, collect_aux: bool = False,
    seq_start: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, list]:
    """tokens: [B, S] int32 -> logits [B, S, vocab]. Optionally returns
    per-layer attention aux (gates/selection for observability).
    seq_start [B,S]: per-row document starts (varlen/doc-masked packing —
    no attention crosses a document boundary; see ops.varlen)."""
    x = params["embed"][tokens].astype(jnp.dtype(mcfg.dtype))
    auxes = []

    def run_block(bp, x):
        return block_prefill(bp, x, mcfg, seq_start=seq_start)

    if mcfg.remat in (True, "full"):        # "mlp" remats inside the block
        run_block = jax.checkpoint(run_block)
    for bp in params["blocks"]:
        x, aux = run_block(bp, x)
        if collect_aux:
            auxes.append({"gates": aux["gates"], "sel_idx": aux["sel_idx"]})
    x = rmsnorm(x, params["final_norm"], mcfg.rmsnorm_eps)
    logits = x @ params["lm_head"]
    return logits, auxes


def cross_entropy_loss(
    logits: jnp.ndarray, targets: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """fp32 next-token cross entropy (reference computes loss in fp32,
    train_showcase.py:1249)."""
    num, den = cross_entropy_numden(logits, targets, mask)
    return num / den


def cross_entropy_numden(
    logits: jnp.ndarray, targets: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sum of masked nll, token count) — the separable form lets
    sharded losses (pipeline/shard_map) psum both pieces and divide once,
    so mask-weighted varlen losses match the single-device ratio exactly
    even when documents pack unevenly across dp shards."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if mask is not None:
        return (nll * mask).sum(), jnp.maximum(mask.sum(), 1.0)
    return nll.sum(), jnp.asarray(nll.size, jnp.float32)


def init_model_caches(mcfg: ModelConfig, batch: int, capacity: int, dtype=jnp.float32) -> List[NSACache]:
    return [init_cache(mcfg.nsa, batch, capacity, dtype) for _ in range(mcfg.n_layers)]


def model_prefill_with_caches(
    params: dict, tokens: jnp.ndarray, mcfg: ModelConfig, capacity: int
) -> Tuple[jnp.ndarray, List[NSACache]]:
    """Prefill and seed per-layer decode caches."""
    x = params["embed"][tokens].astype(jnp.dtype(mcfg.dtype))
    caches = []
    for bp in params["blocks"]:
        x, aux = block_prefill(bp, x, mcfg)
        caches.append(cache_from_prefill(mcfg.nsa, aux, capacity))
    x = rmsnorm(x, params["final_norm"], mcfg.rmsnorm_eps)
    return x @ params["lm_head"], caches


def model_decode_step(
    params: dict, token: jnp.ndarray, caches: List[NSACache], mcfg: ModelConfig
) -> Tuple[jnp.ndarray, List[NSACache]]:
    """token: [B, 1] int32 -> (logits [B, 1, vocab], caches')."""
    x = params["embed"][token].astype(jnp.dtype(mcfg.dtype))
    new_caches = []
    for bp, cache in zip(params["blocks"], caches):
        x, cache = block_decode_step(bp, x, cache, mcfg)
        new_caches.append(cache)
    x = rmsnorm(x, params["final_norm"], mcfg.rmsnorm_eps)
    return x @ params["lm_head"], new_caches


def model_decode_step_ragged(
    params: dict, token: jnp.ndarray, caches: List[NSACache], mcfg: ModelConfig
) -> Tuple[jnp.ndarray, List[NSACache]]:
    """Model-level ragged decode: every layer cache carries per-row
    positions (t: [B]) — the continuous-batching step that pairs with
    `cache.admit_row` (install a freshly-prefilled request as row i of
    all layer caches, other rows keep decoding at their own depths).
    token: [B, 1] int32 -> (logits [B, 1, vocab], caches')."""
    from nsa_vibe_tpu.core.decode import nsa_decode_step_ragged
    from nsa_vibe_tpu.models.llama_block import mlp

    x = params["embed"][token].astype(jnp.dtype(mcfg.dtype))
    new_caches = []
    for bp, cache in zip(params["blocks"], caches):
        a, cache, _ = nsa_decode_step_ragged(
            bp["attn"], rmsnorm(x, bp["attn_norm"], mcfg.rmsnorm_eps),
            cache, mcfg.nsa)
        x = x + a
        x = x + mlp(bp["mlp"], rmsnorm(x, bp["mlp_norm"], mcfg.rmsnorm_eps))
        new_caches.append(cache)
    x = rmsnorm(x, params["final_norm"], mcfg.rmsnorm_eps)
    return x @ params["lm_head"], new_caches


def generate_scan(
    params: dict,
    prompt: jnp.ndarray,
    n_new: int,
    mcfg: ModelConfig,
    temperature: float = 0.0,
    key: Optional[jax.Array] = None,
    capacity: Optional[int] = None,
    top_k: int = 0,
    top_p: float = 1.0,
) -> jnp.ndarray:
    """Whole-generation-in-one-program decoding: prefill + a lax.scan of
    n_new decode steps inside a single jit.

    The per-token `generate` path pays one host->device dispatch per
    token (~0.8 ms through a remote tunnel vs ~40 us of device compute
    at S=1024); scanning the decode step amortizes dispatch to one
    program, which is the TPU serving idiom. n_new is static (one
    compile per length bucket — round capacity up in callers)."""
    B, S0 = prompt.shape
    capacity = capacity or S0 + n_new
    if S0 + n_new > capacity:
        raise ValueError(f"capacity {capacity} < prompt+new {S0 + n_new}")
    if key is None:
        key = jax.random.PRNGKey(0)
    # the compiled program must be cached across calls — a fresh jit
    # wrapper per call re-traces the whole prefill + n_new-step scan
    return _generate_scan_fn(mcfg, n_new, float(temperature), capacity,
                             int(top_k), float(top_p))(params, prompt, key)


@functools.lru_cache(maxsize=32)
def _generate_scan_fn(mcfg: ModelConfig, n_new: int, temperature: float,
                      capacity: int, top_k: int = 0, top_p: float = 1.0):
    from nsa_vibe_tpu.utils.sampling import sample_logits

    @jax.jit
    def run(params, prompt, key):
        key, k0 = jax.random.split(key)
        logits, caches = model_prefill_with_caches(params, prompt, mcfg, capacity)
        tok0 = sample_logits(k0, logits[:, -1], temperature, top_k,
                             top_p)[:, None].astype(prompt.dtype)

        def body(carry, k):
            tok, caches = carry
            logits, caches = model_decode_step(params, tok, caches, mcfg)
            nxt = sample_logits(k, logits[:, -1], temperature, top_k,
                                top_p)[:, None].astype(tok.dtype)
            return (nxt, caches), nxt

        keys = jax.random.split(key, max(n_new - 1, 1))
        (_, _), toks = jax.lax.scan(body, (tok0, caches), keys[: n_new - 1])
        # toks: [n_new-1, B, 1] -> [B, n_new-1]
        toks = jnp.swapaxes(toks[..., 0], 0, 1)
        return jnp.concatenate([prompt, tok0, toks], axis=1)

    return run


def generate_ragged(
    params: dict,
    prompts: jnp.ndarray,
    prompt_lens: jnp.ndarray,
    n_new: int,
    mcfg: ModelConfig,
    temperature: float = 0.0,
    key: Optional[jax.Array] = None,
    capacity: Optional[int] = None,
    top_k: int = 0,
    top_p: float = 1.0,
) -> jnp.ndarray:
    """Serve a batch of DIFFERENT-length prompts in one program.

    prompts: [B, L_max] int32 (rows right-padded past their length);
    prompt_lens: [B] int32. Returns sampled tokens [B, n_new]: row i's
    first output continues position prompt_lens[i]-1 — no padding tokens
    ever enter any row's attention (each row consumes its own prompt
    stream token-by-token, then its own samples). One lax.scan of
    L_max+n_new-1 uniform decode steps: positions stay row-aligned
    because every row starts at 0, so this needs no per-row cache t (see
    core.decode.nsa_decode_step_ragged for mid-stream admission, where
    rows genuinely sit at different depths).

    The reference has no ragged batch path at all (its NSA_KV is a
    single stream; bench/bench_decode.py decodes one uniform batch).
    Ingestion runs at decode throughput rather than batched-prefill
    throughput — the continuous-batching trade; for a uniform batch use
    generate_scan.
    """
    B, L_max = prompts.shape
    capacity = capacity or L_max + n_new
    if L_max + n_new > capacity:
        raise ValueError(f"capacity {capacity} < prompt+new {L_max + n_new}")
    prompt_lens = jnp.asarray(prompt_lens, jnp.int32)
    # out-of-range lengths would silently yield zero/garbage output rows
    # (a row's write window is ticks [len-1, len-1+n_new)); fail loudly
    # when lens is concrete, clamp in-graph regardless
    if not isinstance(prompt_lens, jax.core.Tracer):
        lo, hi = int(prompt_lens.min()), int(prompt_lens.max())
        if lo < 1 or hi > L_max:
            raise ValueError(f"prompt_lens must be in [1, {L_max}]; got [{lo}, {hi}]")
    prompt_lens = jnp.clip(prompt_lens, 1, L_max)
    if key is None:
        key = jax.random.PRNGKey(0)
    return _generate_ragged_fn(mcfg, n_new, float(temperature), capacity,
                               int(top_k), float(top_p))(
        params, prompts, prompt_lens, key)


@functools.lru_cache(maxsize=32)
def _generate_ragged_fn(mcfg: ModelConfig, n_new: int, temperature: float,
                        capacity: int, top_k: int = 0, top_p: float = 1.0):
    from nsa_vibe_tpu.utils.sampling import sample_logits

    @jax.jit
    def run(params, prompts, lens, key):
        B, L_max = prompts.shape
        caches = init_model_caches(mcfg, B, capacity,
                                   jnp.dtype(mcfg.dtype))
        T = L_max + n_new - 1
        rows = jnp.arange(B)

        def body(carry, inp):
            last, caches, out_buf = carry
            k_tick, key_t = inp
            tok_in = jnp.where(k_tick < lens,
                               jnp.take(prompts, jnp.clip(k_tick, 0, L_max - 1),
                                        axis=1),
                               last)
            logits, caches = model_decode_step(params, tok_in[:, None],
                                               caches, mcfg)
            nxt = sample_logits(key_t, logits[:, -1], temperature, top_k,
                                top_p).astype(prompts.dtype)
            # row i's j-th output is sampled at tick lens[i]-1+j
            j = k_tick - (lens - 1)
            write = (j >= 0) & (j < n_new)
            jc = jnp.clip(j, 0, n_new - 1)
            out_buf = out_buf.at[rows, jc].set(
                jnp.where(write, nxt, out_buf[rows, jc]))
            last = jnp.where(write, nxt, last)
            return (last, caches, out_buf), None

        keys = jax.random.split(key, T)
        out0 = jnp.zeros((B, n_new), prompts.dtype)
        (_, _, out_buf), _ = jax.lax.scan(
            body, (prompts[:, 0], caches, out0),
            (jnp.arange(T, dtype=jnp.int32), keys))
        return out_buf

    return run


def generate(
    params: dict,
    prompt: jnp.ndarray,
    n_new: int,
    mcfg: ModelConfig,
    temperature: float = 0.0,
    key: Optional[jax.Array] = None,
    capacity: Optional[int] = None,
    top_k: int = 0,
    top_p: float = 1.0,
) -> jnp.ndarray:
    """Greedy / temperature / top-k / nucleus sampling (utils.sampling).
    prompt: [B, S0] -> [B, S0 + n_new]."""
    from nsa_vibe_tpu.utils.sampling import sample_logits

    B, S0 = prompt.shape
    capacity = capacity or S0 + n_new
    if S0 + n_new > capacity:
        raise ValueError(f"capacity {capacity} < prompt+new {S0 + n_new}")
    logits, caches = jax.jit(
        lambda p, t: model_prefill_with_caches(p, t, mcfg, capacity)
    )(params, prompt)
    step = jax.jit(lambda p, t, c: model_decode_step(p, t, c, mcfg))
    sample = jax.jit(functools.partial(
        sample_logits, temperature=temperature if key is not None else 0.0,
        top_k=top_k, top_p=top_p))
    if key is None:
        key = jax.random.PRNGKey(0)
    key, sub = jax.random.split(key)
    tok = sample(sub, logits[:, -1])[:, None].astype(prompt.dtype)
    out = [prompt, tok]
    for i in range(n_new - 1):
        logits, caches = step(params, tok, caches)
        key, sub = jax.random.split(key)
        tok = sample(sub, logits[:, -1])[:, None].astype(prompt.dtype)
        out.append(tok)
    return jnp.concatenate(out, axis=1)
