"""Basic fused building blocks: linear, MLP, dropout, windowed-CNN embed, highway.

All functions are pure; parameters are nested dicts in torch layout (see
utils/torch_init.py).  Dropout takes an explicit PRNG key; `rng=None` means
deterministic (eval) mode, matching model.eval() in the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linear(params, x):
    """y = x @ W.T + b with torch-layout W [out, in].

    XLA folds the transpose into the dot_general; on TPU this is a single MXU
    matmul regardless of layout.
    """
    return jnp.einsum("...i,oi->...o", x, params["weight"]) + params["bias"]


def mlp_relu(p1, p2, x, rng=None, dropout_p=0.0):
    """Linear -> ReLU -> [Dropout] -> Linear — the reference's ubiquitous
    two-layer head (e.g. PositionwiseFeedForward, MFN gate MLPs, out heads)."""
    h = jax.nn.relu(linear(p1, x))
    h = dropout(h, rng, dropout_p)
    return linear(p2, h)


def dropout(x, rng, p: float):
    """Inverted dropout, identical to torch nn.Dropout train-mode scaling.

    rng=None (or p==0) => identity (eval mode)."""
    if rng is None or p == 0.0:
        return x
    keep = 1.0 - p
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def conv1d_window_embed(params, x):
    """Fused window CNN: Conv1d(D -> E, k=2) over frames + max-pool over the
    conv axis, batched over (batch, window).

    Replaces the reference's per-video Python loop (reference MFT/models.py:111-131
    + CNN at models.py:57-79): there, each video's [W, F, D] windows are permuted
    to [W, D, F], run through Conv1d(k=2), then MaxPool1d over the whole conv
    length.  Mathematically:

        conv[.., e, j] = x[.., j, :] @ K0[e] + x[.., j+1, :] @ K1[e] + b[e]
        out = max_j conv[.., e, j]

    We compute it as ONE large MXU matmul by concatenating adjacent frames:
    [B, W, F-1, 2D] @ [2D, E], then a max-reduce over the frame axis — no
    Python loops, fully batched over B*W windows, ideal MXU tiling.

    Measured alternatives (v5e, linguistic B=32 T=160 F=32 D=300 bf16,
    weight-perturb 50/400 chains): this pair-concat matmul 0.301 ms beats
    a two-tap sum (x@K0 + shift(x@K1), 0.384 ms) and a native
    lax.conv_general_dilated (0.324 ms) — XLA fuses the concat into the
    matmul, so the apparent [.., F-1, 2D] intermediate never hits HBM.

    x: [..., F, D] (F >= 2 frames per window), params from conv1d_init
    (weight [E, D, 2]).  Returns [..., E].
    """
    w = params["weight"]  # [E, D, 2]
    pairs = jnp.concatenate([x[..., :-1, :], x[..., 1:, :]], axis=-1)  # [..., F-1, 2D]
    kernel = jnp.concatenate([w[:, :, 0], w[:, :, 1]], axis=-1)  # [E, 2D]
    conv = jnp.einsum("...fd,ed->...fe", pairs, kernel) + params["bias"]
    return jnp.max(conv, axis=-2)


def highway(params, x, relu_proj: bool = False):
    """Highway gate: g*proj(x) + (1-g)*x, g = sigmoid(gate(x)).

    relu_proj=True applies ReLU to the projection — the B1-LSTM variant
    (reference B1-LSTM/models.py:52); the other four families do not
    (reference MFT/models.py:52-54).
    """
    proj = linear(params["linear_projection"], x)
    if relu_proj:
        proj = jax.nn.relu(proj)
    gate = jax.nn.sigmoid(linear(params["linear_gate"], x))
    return gate * proj + (1.0 - gate) * x
