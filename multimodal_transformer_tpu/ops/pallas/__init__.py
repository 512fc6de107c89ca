"""Pallas TPU kernels for the hot ops.

Kernels are drop-in replacements for the jnp reference implementations in
ops/ (which remain the source of truth for numerics tests and CPU runs).
Selection is explicit via ops.dispatch.pallas_enabled(kind) — per-kernel
defaults on TPU backends (see the measured table in ops/dispatch.py),
disabled elsewhere (the jnp path is used under interpret-mode in tests).
"""

from .window_embed import fused_window_embed_highway
from .attention import flash_attention_masked

__all__ = ["fused_window_embed_highway", "flash_attention_masked"]
