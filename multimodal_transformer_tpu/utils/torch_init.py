"""Parameter initializers matching PyTorch layer defaults.

The reference models (e.g. /root/reference/transformer/MFT/models.py,
multiTransformer.py) rely entirely on PyTorch default initialization. To make
training curves comparable (and converted checkpoints drop-in), we reproduce the
same distributions here:

  nn.Linear:    weight, bias ~ U(-k, k),  k = 1/sqrt(fan_in)
  nn.Conv1d:    weight, bias ~ U(-k, k),  k = 1/sqrt(in_channels * kernel_size)
  nn.LSTM(Cell):all params   ~ U(-k, k),  k = 1/sqrt(hidden_size)
  LayerNorm-ish custom norm:  scale=1, bias=0

Parameters are stored in *torch layout* (Linear weight is [out, in]; LSTM
weight_ih is [4H, in]) so that .pth -> JAX checkpoint conversion is a pure key
mapping.  XLA contracts over arbitrary dimensions, so this costs nothing on the
MXU.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def linear_init(key, in_dim: int, out_dim: int, dtype=jnp.float32):
    """Match nn.Linear default init (torch layout: weight [out, in])."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    return {
        "weight": _uniform(kw, (out_dim, in_dim), bound, dtype),
        "bias": _uniform(kb, (out_dim,), bound, dtype),
    }


def conv1d_init(key, in_ch: int, out_ch: int, kernel: int, dtype=jnp.float32):
    """Match nn.Conv1d default init (weight [out, in, k])."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_ch * kernel)
    return {
        "weight": _uniform(kw, (out_ch, in_ch, kernel), bound, dtype),
        "bias": _uniform(kb, (out_ch,), bound, dtype),
    }


def lstm_init(key, in_dim: int, hidden: int, dtype=jnp.float32):
    """Match nn.LSTMCell / single-layer nn.LSTM default init.

    Gate order along the leading 4H axis is torch's (i, f, g, o).
    Keys named after the torch parameters (weight_ih/weight_hh/bias_ih/bias_hh)
    so nn.LSTM's *_l0 suffixed params map 1:1.
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bound = 1.0 / math.sqrt(hidden)
    return {
        "weight_ih": _uniform(k1, (4 * hidden, in_dim), bound, dtype),
        "weight_hh": _uniform(k2, (4 * hidden, hidden), bound, dtype),
        "bias_ih": _uniform(k3, (4 * hidden,), bound, dtype),
        "bias_hh": _uniform(k4, (4 * hidden,), bound, dtype),
    }


def norm_init(features: int, dtype=jnp.float32):
    """Match the reference's custom LayerNorm parameter init
    (a_2=ones, b_2=zeros; reference multiTransformer.py:81-86)."""
    return {"a_2": jnp.ones((features,), dtype), "b_2": jnp.zeros((features,), dtype)}
