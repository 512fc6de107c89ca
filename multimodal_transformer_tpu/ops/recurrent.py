"""Recurrent primitives: torch-parity LSTM as lax.scan, local-attention convolve.

The reference runs nn.LSTM / nn.LSTMCell sequentially in Python
(reference MFT/multiTransformer.py:200-235, B1-LSTM/models.py:197,
MFT/multiTransformer.py:363-373).  Here every recurrence is a single
`jax.lax.scan` whose body is one fused gate matmul — the x-projection for all
timesteps is hoisted OUT of the scan as one large [B*T, D] @ [D, 4H] MXU
matmul, leaving only the small [B, H] @ [H, 4H] hidden-to-hidden matmul
sequential.  This is the standard TPU treatment of LSTMs: the sequential part
touches 4H*H weights per step from VMEM while the bulk of the FLOPs run fully
batched.

Gate math matches torch exactly (gate order i, f, g, o along the 4H axis;
two bias vectors):
    i = sigmoid(Wi x + bi_ih + Ui h + bi_hh)   ...
    c' = f * c + i * tanh(g),  h' = o * tanh(c')
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gates(z, hidden: int):
    i = jax.nn.sigmoid(z[..., 0 * hidden:1 * hidden])
    f = jax.nn.sigmoid(z[..., 1 * hidden:2 * hidden])
    g = jnp.tanh(z[..., 2 * hidden:3 * hidden])
    o = jax.nn.sigmoid(z[..., 3 * hidden:4 * hidden])
    return i, f, g, o


def lstm_cell_step(params, x, h, c):
    """One torch-exact LSTMCell step.  x: [B, D]; h, c: [B, H]."""
    hidden = h.shape[-1]
    z = (x @ params["weight_ih"].T + params["bias_ih"]
         + h @ params["weight_hh"].T + params["bias_hh"])
    i, f, g, o = _gates(z, hidden)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def lstm_scan(params, xs, h0=None, c0=None):
    """Full-sequence LSTM: xs [B, T, D] -> hs [B, T, H] (+ final h, c).

    Equivalent to single-layer batch_first nn.LSTM.  The input projection for
    all T steps is computed as one batched matmul before the scan.
    """
    B, T, _ = xs.shape
    hidden = params["weight_hh"].shape[1]
    if h0 is None:
        h0 = jnp.zeros((B, hidden), xs.dtype)
    if c0 is None:
        c0 = jnp.zeros((B, hidden), xs.dtype)

    x_proj = jnp.einsum("btd,gd->btg", xs, params["weight_ih"]) \
        + params["bias_ih"] + params["bias_hh"]  # [B, T, 4H]

    def body(carry, xp):
        h, c = carry
        z = xp + h @ params["weight_hh"].T
        i, f, g, o = _gates(z, hidden)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    (h_T, c_T), hs = jax.lax.scan(body, (h0, c0), x_proj.transpose(1, 0, 2))
    return hs.transpose(1, 0, 2), (h_T, c_T)


def pad_shift(x, shift: int, padv: float = 0.0):
    """Shift a [B, T, D] tensor forward in time, zero-padding
    (reference MFT/models.py:10-19).

    |shift| >= T yields an all-padding tensor (every element shifted out) —
    the reference crashes on that degenerate case (negative slice bound);
    handled gracefully here for very short sequences."""
    T = x.shape[1]
    if abs(shift) >= T:
        return jnp.full_like(x, padv)
    if shift > 0:
        pad = jnp.full((x.shape[0], shift, x.shape[2]), padv, x.dtype)
        return jnp.concatenate([pad, x[:, :-shift, :]], axis=1)
    elif shift < 0:
        pad = jnp.full((x.shape[0], -shift, x.shape[2]), padv, x.dtype)
        return jnp.concatenate([x[:, -shift:, :], pad], axis=1)
    return x


def convolve_local_attn(x, attn):
    """Causal local-attention convolution (reference MFT/models.py:21-25):
        out[t] = sum_i attn[t, i] * x[t - i]
    x: [B, T, D]; attn: [B, T, K].  Stacks K shifted copies and contracts —
    a pure VPU elementwise+reduce, fused by XLA."""
    K = attn.shape[2]
    stacked = jnp.stack([pad_shift(x, i) for i in range(K)], axis=-1)  # [B,T,D,K]
    return jnp.sum(attn[:, :, None, :] * stacked, axis=-1)
