"""The reference's custom LayerNorm (reference MFT/multiTransformer.py:81-91).

Two deliberate deviations from textbook layer norm, both replicated here
because parity gates on them (SURVEY.md §2.3):
  * std is the *unbiased* (Bessel-corrected, /(D-1)) standard deviation —
    torch Tensor.std default;
  * eps (1e-6) is added to the *std*, not the variance.
"""

from __future__ import annotations

import jax.numpy as jnp


def torch_layer_norm(params, x, eps: float = 1e-6):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    d = x - mean
    n = x.shape[-1]
    # unbiased std: sum of squared deviations / (n - 1)
    var = jnp.sum(d * d, axis=-1, keepdims=True) / (n - 1)
    std = jnp.sqrt(var)
    return params["a_2"] * d / (std + eps) + params["b_2"]
