"""Kernel tuning registry.

TPU equivalent of the reference's bench-derived threshold plumbing
(bench/threshold_optimizer.py + scripts/apply_fa2_thresholds.py, which
wrote fa2_min_len_* back into configs): benchmark-derived block sizes
live in configs/kernel_tuning.json, written by bench/autotune.py and read
once at import. Defaults below are hand-tuned on TPU v5e.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Any

DEFAULTS = {
    "win.block_k": 512,     # banded kv tile (v5e, w=512)
    "win.block_q": 128,
    "cmp.block_k": 512,
    "cmp.block_q": 128,
    "sel.kv_batch": 8,      # selection blocks per grid step
    "sel.block_q": 128,
    "scorer.cmp_chunk": 512,
    "scorer.block_q": 128,
    # backward kernels keep more live tiles (dO, lse/delta, two scratch
    # accumulators) so they get their own, smaller tile budget
    "win.bwd_block_q": 128,
    "win.bwd_block_k": 512,
    "cmp.bwd_block_q": 128,
    "cmp.bwd_block_k": 512,
    "sel.bwd_block_q": 128,
    "sel.bwd_kv_batch": 8,
    # fused select+cmp backward (attention.fused_select_cmp): its own keys —
    # inside the fused train graph bwd_block_q=256 measured 19.3k vs 48.1k
    # toks/s at 128 (r2 bisect), opposite of the standalone cmp backward
    "cmp.fused_bwd_block_q": 128,
    "cmp.fused_bwd_block_k": 512,
    # one-pass fused backward (flash_bwd.flash_banded_bwd_onepass): P/dS
    # computed once per tile pair feeding dQ/dK/dV (vs the two-pass
    # dq+dkv kernels recomputing QK+mask+exp twice)
    "bwd.onepass": 1,
    "sel.bwd_onepass": 1,
    "sel.bwd_q_chunk": 0,   # 0 = kernel default   # selection backward can opt out independently
    # flash-kernel micro-op flags (flash.py/flash_bwd.py):
    #   scale_on_q — fold scale*LOG2E into the [rows,Dk] Q operand (one
    #     narrow multiply) instead of the [rows,block_k] logits (last-ulp
    #     numeric change);
    #   fastpath — scalar-branch to an unmasked body when a (q,kv) tile
    #     pair is fully inside the visibility band (bit-identical).
    #     Split fwd/bwd: the fwd branch duplicates the [rows,block_k] f32
    #     logits buffer, which VMEM-OOMs at the default fwd tiles
    #     (bq256/bk1024: 16.21M > 16M, measured on v5e) AND never fires
    #     there (fwd needs bk<=256 for a fully-live band tile) — so the
    #     fwd key defaults OFF and is only worth enabling with win.block_k
    #     <= 256.
    "flash.scale_on_q": 1,
    # backward (one-pass) fastpath: isolating A/B r4 (ab_queue.jsonl
    # 2026-08-20): flags-on 59919 vs bwdfast-off 59889 toks/s — within
    # noise, bit-identical loss; kept ON (hits ~3/8 cmp bwd pairs)
    "flash.fastpath": 1,        # backward (one-pass) kernels
    "flash.fastpath_fwd": 0,    # forward flash_banded
    # (flash.bwd_ksplit / sel.bwd_ksplit were tried and REMOVED in r4 —
    # Mosaic keeps unrolled sub-iterations' temporaries live so peak VMEM
    # never dropped, and the control cost −7% e2e; KERNELS.md dead ends.)
    # diagonal band tiling for the win FORWARD (ops/pallas/flash_diag.py):
    # one grid step per q-tile fetching exactly the band as 128-wide
    # operands, single-pass softmax. Attacks the measured ~35%-live-lane
    # problem of axis-aligned tiles (docs/PERFORMANCE.md roofline). OFF
    # until e2e-A/B'd on device.
    "win.fwd_diag": 0,
    "win.diag_block_q": 256,
    # diagonal band tiling for the win BACKWARD: one step per q-tile,
    # P/dS once, dQ exact block + dK/dV per-q-tile band strips scatter-
    # added in XLA (no dQ ring write-through, no fastpath dual body).
    # OFF until e2e-A/B'd on device.
    "win.bwd_diag": 0,
    "win.bwd_diag_block_q": 128,
    # fuse the 7 QKV projection matmuls into one (core/nsa.project_qkv):
    # per-column-identical numerics; OFF until e2e-A/B'd on device so the
    # r2-late validation baseline (57.4k @ loss 5.5535) stays bitwise
    # reproducible with flags off
    "proj.fused": 0,
    # XLA scoped-vmem BUDGET in KiB (--xla_tpu_scoped_vmem_limit_kib via
    # LIBTPU_INIT_ARGS; applied by apply_tpu_env() before backend init).
    # The 16 MB default is a compiler budget, NOT the physical VMEM
    # size: raising it to 24 MB lets the 256-row one-pass backward tiles
    # compile — the tile class every earlier round's "scoped allocation
    # 20.23M > 16.00M" OOMs retired. Measured r4: win/cmp bwd_block_q
    # 256 at 24 MB = 63.6k vs 62.3k toks/s, loss byte-identical.
    "vmem.scoped_kib": 16384,
    # gate-combine in flat [B,S,G,h*Dv] form (core/nsa.combine_branches):
    # [.., h=6, 64] minor dims are T(8,128)-tile padded to (8,128) in HBM
    # (2.67x bytes), and the r4 profile shows the combine's
    # broadcast_multiply/add_add fusions at ~0.8 ms each — right at
    # bandwidth peak for the PADDED size. MEASURED r4: 61,774 vs 62,311
    # e2e (−0.9%, ab_queue r4 wave 2) — the reshape forces layout
    # copies from the kernels' 5-D outputs that cost more than the
    # unpadded fusion saves. Stays OFF; kept as the documented probe of
    # the tile-padding hypothesis.
    "nsa.flat_combine": 0,
    # gate-epilogue fold (r5): branch kernels emit g*O directly; combine
    # is a pure add and the gate-logit grad rides the delta preprocess
    # (D-form softmax vjp, core.gate._softmax_dform) — removes the
    # per-branch dg multiply_reduce fusions (~rowsum(dO*O) over padded
    # [B,S,G,h,Dv] x3 per layer) from the backward. Numerics: gates stay
    # f32 into the kernel epilogue (vs a bf16 cast + padded multiply
    # outside) — same-ulp-class change as flash.scale_on_q.
    "nsa.gate_fold": 0,
    # flat-IO (with the fold): branch kernels emit Y in the unpadded
    # [B,S,H*Dv] layout and the backwards consume flat dO — the 5-D
    # (h=6, Dv=64) minor pair is T(8,128) tile-padded to 2.67x physical
    # HBM bytes on every O write / dO read / combine fusion (r4 profile
    # layout strings), and the flat combine feeds W_O with no reshape.
    "nsa.flat_io": 0,
    # long-context selection kv batching (r5): past union saturation
    # (every q-tile's block union covers ~all J blocks, the compaction
    # skips nothing) the sel grid is steps-bound and WIDER kv batches
    # win: S=8192/b2 measured control 32,076 -> bwd KB16 34,508 ->
    # fwd+bwd KB16 34,569 toks/s (+7.8%, loss-identical; ab_queue
    # s8k-* records). At S=2048 the same widening LOSES 1-2% (r4
    # waves), so the wide values engage only at length: dispatch picks
    # by S_kv (ops.attention::_sel_kv_batches). The two directions
    # cross over at different lengths — the s4k A/B (S=4096/b4,
    # ab_queue s4k-*) measured bwd KB16 +4.7% (45,628 -> 47,761) but
    # fwd KB16 -0.3% standalone, so the backward threshold is 4096 and
    # the forward stays at its measured 8192 win point.
    "sel.long_s": 8192,
    "sel.bwd_long_s": 4096,
    "sel.kv_batch_long": 16,
    "sel.bwd_kv_batch_long": 16,
}

_TUNING_PATH = os.environ.get(
    "NSA_KERNEL_TUNING",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "configs", "kernel_tuning.json"),
)


@functools.lru_cache(maxsize=1)
def _load() -> dict:
    try:
        with open(_TUNING_PATH) as f:
            data = json.load(f)
        return {**DEFAULTS, **{k: v for k, v in data.items() if k in DEFAULTS}}
    except (OSError, ValueError):
        return dict(DEFAULTS)


def tuned(key: str, default: Any = None) -> Any:
    """Look up a tuned kernel parameter (e.g. "win.block_k")."""
    return _load().get(key, default if default is not None else DEFAULTS[key])


def apply_tpu_env() -> None:
    """Propagate env-level TPU compiler flags derived from tuning keys.
    Call BEFORE the first jax backend use (LIBTPU_INIT_ARGS is read at
    backend init; safe no-op on CPU and when the key is at its default).
    Entry points (bench_*, trainer, bench.py, autotune) all call this."""
    kib = int(tuned("vmem.scoped_kib", 16384))
    if kib and kib != 16384:
        cur = os.environ.get("LIBTPU_INIT_ARGS", "")
        if "scoped_vmem_limit" not in cur:
            flag = f"--xla_tpu_scoped_vmem_limit_kib={kib}"
            os.environ["LIBTPU_INIT_ARGS"] = (cur + " " + flag).strip()


def scoped_vmem_bytes() -> int:
    """The scoped-vmem budget kernels may plan against (bytes)."""
    return int(tuned("vmem.scoped_kib", 16384)) * 1024
