"""Kernel dispatch: choose Pallas TPU kernels vs the jnp reference path.

Policy:
  * Pallas kernels run on TPU backends, on the inference path (rng=None).
    The training path stays on the jnp implementations — XLA fuses them well
    at SEND scale, and the fused kernels ship without custom VJPs in this
    round (documented capability boundary).
  * MMTX_PALLAS=1/0 force-overrides (0 is useful for A/B benchmarking).
"""

from __future__ import annotations

import os

import jax

_TPU_BACKENDS = ("tpu", "axon")


def pallas_enabled() -> bool:
    force = os.environ.get("MMTX_PALLAS")
    if force == "0":
        return False
    if force == "1":
        return True
    try:
        return jax.default_backend() in _TPU_BACKENDS
    except Exception:
        return False
