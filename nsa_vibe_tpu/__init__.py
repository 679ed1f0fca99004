"""nsa_vibe_tpu — TPU-native Native Sparse Attention framework.

A from-scratch JAX/XLA/Pallas implementation of the Native Sparse Attention
architecture (DeepSeek, arXiv 2502.11089): three-branch attention
(compressed / selected / sliding-window) with a learned gate, grouped-query
consistent deterministic block selection, fixed-capacity decode caches, and
mesh-parallel training.

Design stance (TPU-first, not a port):
  * static shapes everywhere — block metadata is precomputed in numpy and
    closed over at trace time; the Eq. 9 cmp->sel mapping is a small dense
    matmul instead of CSR scatter loops;
  * selection is a static top-n set of block indices (padded with -1),
    pad-to-n*l' + mask — no dynamic range bucketing;
  * decode caches are preallocated ring/prefix buffers with index scalars,
    so the whole decode step jits to a single XLA program;
  * kernels are Pallas (interpret-mode on CPU as the debug oracle) with a
    pure-jnp reference path for parity tests.

Reference behavior contract: seconds-0/nsa-vibe (see SURVEY.md). Semantics
follow the paper; the reference's `q_len=1 is_causal` degeneracies
(SURVEY.md §2.6) are deliberately NOT reproduced.
"""

__version__ = "0.1.0"

from nsa_vibe_tpu.core.config import NSAConfig  # noqa: F401

# Env-level TPU compiler flags derived from kernel tuning
# (vmem.scoped_kib -> LIBTPU_INIT_ARGS). Applied at package import so
# EVERY entry point gets them before the first jax backend init — the
# merged 24 MB scoped-vmem budget is required for the 256-row backward
# tiles in configs/kernel_tuning.json to compile. Idempotent; no-op at
# the 16 MB default and on CPU.
from nsa_vibe_tpu.ops.tuning import apply_tpu_env as _apply_tpu_env

_apply_tpu_env()
