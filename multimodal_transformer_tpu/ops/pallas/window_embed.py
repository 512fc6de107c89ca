"""Fused window-embed kernel: Conv1d(k=2) + max-pool + Highway in one pass.

The front-end hot op (SURVEY.md §3 hot loop 2; reference MFT/models.py:57-79 +
111-131) maps each [F, D] window of frames to one E-vector:

    conv[f] = x[f] @ W0 + x[f+1] @ W1 + b          f = 0..F-2
    pooled  = max_f conv[f]
    out     = sigmoid(gate(pooled)) * proj(pooled)
              + (1 - sigmoid(gate(pooled))) * pooled

Kernel design (TPU):
  * ONE input matmul instead of a concat-of-pairs: with K = [W0 | W1] stacked
    on the OUTPUT axis, a = x @ W0 and b = x @ W1 come from a single
    [TN*F, D] @ [D, 2E] MXU pass; conv[f] = a[f] + b[f+1].  Half the FLOPs of
    the pairs formulation and no data duplication.
  * the conv intermediate, the running max, and both highway matmuls live in
    VMEM — the [N, F, E] conv tensor never touches HBM (the jnp/XLA version
    materializes it);
  * grid over tiles of N = B*W windows; all weights stay resident per tile.

The caller (models/frontend.py) falls back to the jnp path (ops.basic) for
shapes too large for VMEM — gate on `wembed_fits_vmem(F, D, E)`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def wembed_fits_vmem(F: int, D: int, E: int) -> bool:
    """True when even the minimum window tile (tile_n=8) fits the kernel's
    ~6 MB VMEM budget; callers must take the jnp path otherwise (the kernel
    would fail Mosaic compilation with an opaque VMEM error)."""
    per_n = 4 * (F * D + F * 2 * E + 3 * E)
    return 8 * per_n <= 6 * 1024 * 1024


def _kernel(x_ref, kcat_ref, bias_ref, wp_ref, bp_ref, wg_ref, bg_ref,
            out_ref, *, F: int, E: int):
    # x: [TN, F, D]; kcat: [D, 2E]; out: [TN, E]
    TN = x_ref.shape[0]
    D = x_ref.shape[2]
    x = x_ref[:].reshape(TN * F, D)
    ab = jnp.dot(x, kcat_ref[:], preferred_element_type=jnp.float32)
    ab = ab.reshape(TN, F, 2 * E)
    a = ab[:, :, :E]
    b = ab[:, :, E:]
    conv = a[:, :-1, :] + b[:, 1:, :] + bias_ref[:][None, None, :]
    pooled = jnp.max(conv, axis=1)  # [TN, E]
    proj = (jnp.dot(pooled, wp_ref[:], preferred_element_type=jnp.float32)
            + bp_ref[:][None, :])
    gate = jax.nn.sigmoid(
        jnp.dot(pooled, wg_ref[:], preferred_element_type=jnp.float32)
        + bg_ref[:][None, :])
    out_ref[:] = (gate * proj + (1.0 - gate) * pooled).astype(out_ref.dtype)


def fused_window_embed_highway(conv_params, highway_params, x, *,
                               relu_proj: bool = False,
                               tile_n: int = None, interpret: bool | None = None):
    """x: [B, W, F, D] -> [B, W, E].  Weights in torch layout
    (conv weight [E, D, 2]; highway linears [E, E])."""
    if interpret is None:
        from ..dispatch import interpret_default
        interpret = interpret_default()
    if relu_proj:
        raise NotImplementedError(
            "B1 relu-proj highway uses the jnp path")  # rare; jnp fallback
    B, W, F, D = x.shape
    w = conv_params["weight"]  # [E, D, 2]
    E = w.shape[0]
    if F < 2:
        raise ValueError("window needs >= 2 frames for k=2 conv")
    if tile_n is None:
        # size the window tile so x-tile + conv intermediate fit in ~6 MB of
        # VMEM (16 MB/core total, leave room for weights + double buffering)
        budget = 6 * 1024 * 1024
        per_n = 4 * (F * D + F * 2 * E + 3 * E)
        tile_n = max(8, min(256, (budget // per_n) // 8 * 8))
    kcat = jnp.concatenate([w[:, :, 0].T, w[:, :, 1].T], axis=1)  # [D, 2E]
    wp = highway_params["linear_projection"]["weight"].T  # [E, E]
    wg = highway_params["linear_gate"]["weight"].T
    bp = highway_params["linear_projection"]["bias"]
    bg = highway_params["linear_gate"]["bias"]

    N = B * W
    tile_n = min(tile_n, N)
    pad_n = (-N) % tile_n
    xf = x.reshape(N, F, D)
    if pad_n:
        xf = jnp.pad(xf, ((0, pad_n), (0, 0), (0, 0)))
    n_tiles = xf.shape[0] // tile_n

    out = pl.pallas_call(
        functools.partial(_kernel, F=F, E=E),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_n, F, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 2 * E), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, E), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((E, E), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, E), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((xf.shape[0], E), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * N * F * D * 2 * E + 2 * N * E * E * 2,
            bytes_accessed=4 * (N * F * D + D * 2 * E + 2 * E * E + N * E),
            transcendentals=N * E,
        ),
    )(xf, kcat, conv_params["bias"], wp, bp, wg, bg)
    return out[:N].reshape(B, W, E)


# ------------------------------------------------------------- training path
# custom_vjp wrapper: the Pallas kernel serves the forward pass; the backward
# pass rematerializes through the jnp reference implementation (ops.basic),
# whose autodiff is exact for this op.  This lets the training step keep the
# fused forward without hand-writing conv/maxpool/highway backward kernels.

@jax.custom_vjp
def window_embed_highway_trainable(conv_params, highway_params, x):
    return fused_window_embed_highway(conv_params, highway_params, x)


def _jnp_reference(conv_params, highway_params, x):
    from ..basic import conv1d_window_embed, highway
    return highway(highway_params, conv1d_window_embed(conv_params, x))


def _fwd(conv_params, highway_params, x):
    out = fused_window_embed_highway(conv_params, highway_params, x)
    return out, (conv_params, highway_params, x)


def _bwd(res, g):
    conv_params, highway_params, x = res
    _, vjp = jax.vjp(_jnp_reference, conv_params, highway_params, x)
    return vjp(g)


window_embed_highway_trainable.defvjp(_fwd, _bwd)
