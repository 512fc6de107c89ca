"""Kernel dispatch: choose Pallas TPU kernels vs the jnp/XLA path.

Per-kernel policy (round 2, re-measured honestly: forwards chained in a
fori_loop with every input consuming the previous output, host-fetch
timing, per-forward time from the slope between two chain lengths — the
round-1 async-dispatch loop measured pipelining, not compute):

  v5e, MFT AVL, B=32, T=160, bf16 serving — seq/s end to end:
    XLA-only baseline               7.59-7.62k  (2 runs)
    + MFN full-recurrence kernel    8.2k   (+7.7%)  -> default ON
    + fused window-embed kernel     8.1k   (+6.7%)  -> default ON
    + both                          8.6-8.8k (+14-15%, 4 runs)
    + flash attention kernel        3.8k   (-2.0x)  -> default OFF
  Micro (MFN recurrence alone, fp32, stable long-chain slopes): kernel and
  scan are at PARITY (~0.27 ms) — the end-to-end win comes from fusion
  boundaries, not the recurrence itself (mfn_kernel.py docstring).  The
  flash kernel genuinely loses: T=160, d_k=32 blocks underfill the MXU
  pipeline vs one fused XLA batch matmul at SEND scale.

Overrides: per-kernel MMTX_PALLAS_ATTN / MMTX_PALLAS_WEMBED /
MMTX_PALLAS_MFN (=0/1) beat the global MMTX_PALLAS (=0/1), which beats the
defaults above.  Pallas never dispatches off-TPU.  Training (rng!=None)
uses kernels only where a custom VJP exists — callers gate that.
"""

from __future__ import annotations

import os

import jax

_TPU_BACKENDS = ("tpu", "axon")

# measured per-kernel defaults (see module docstring)
_DEFAULTS = {"wembed": True, "mfn": True, "attn": False}


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in _TPU_BACKENDS
    except Exception:
        return False


def pallas_enabled(kind: str | None = None) -> bool:
    """Whether the Pallas kernel of the given kind should dispatch."""
    if not _on_tpu():
        return False
    if kind is not None:
        force = os.environ.get(f"MMTX_PALLAS_{kind.upper()}")
        if force in ("0", "1"):
            return force == "1"
    force = os.environ.get("MMTX_PALLAS")
    if force in ("0", "1"):
        return force == "1"
    return _DEFAULTS.get(kind, False)
