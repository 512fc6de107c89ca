"""Shared CNN+Highway front-end (all five families).

The reference embeds each [W, F, D] video of windows with a Conv1d(k=2) +
MaxPool + Highway + Dropout(0.3), *per video in a Python loop*
(reference MFT/models.py:111-132).  The loop is purely an artifact of the
torch code; the weights are shared, so here the whole [B, W, F, D] batch runs
through one fused batched matmul (ops.conv1d_window_embed).  Dropout RNG
placement consequently differs from torch's sequential draws — eval parity is
unaffected (dropout off), as documented in SURVEY.md §7.
"""

from __future__ import annotations

import jax

from ..ops.basic import conv1d_window_embed, dropout, highway
from ..utils.torch_init import conv1d_init, linear_init


def frontend_init(key, mods, dims, window_embed_size, k: int = 2):
    """One CNN + Highway per modality (reference MFT/models.py:92-96)."""
    params = {}
    keys = jax.random.split(key, 3 * len(mods))
    for i, mod in enumerate(mods):
        e = window_embed_size[mod]
        params[f"cnn_{mod}"] = {"conv1d": conv1d_init(keys[3 * i], dims[mod], e, k)}
        kp, kg = keys[3 * i + 1], keys[3 * i + 2]
        params[f"highway_{mod}"] = {
            "linear_projection": linear_init(kp, e, e),
            "linear_gate": linear_init(kg, e, e),
        }
    return params


def frontend_apply(params, inputs, mods, *, rng=None, dropout_p: float = 0.3,
                   relu_proj: bool = False):
    """inputs: dict mod -> [B, W, F, D].  Returns dict mod -> [B, W, E_mod].

    relu_proj=True selects the B1 Highway variant (ReLU on the projection)."""
    from ..ops.dispatch import pallas_enabled

    outputs = {}
    rngs = (jax.random.split(rng, len(mods)) if rng is not None
            else [None] * len(mods))
    # Fused Pallas forward on TPU; grad-capable via custom_vjp (backward
    # rematerializes through the jnp path), so it serves train + eval.
    use_fused = not relu_proj and pallas_enabled("wembed")
    for mod, mod_rng in zip(mods, rngs):
        fused_ok = False
        if use_fused and inputs[mod].shape[2] >= 2:
            from ..ops.pallas.window_embed import wembed_fits_vmem
            _, _, F, D = inputs[mod].shape
            E = params[f"cnn_{mod}"]["conv1d"]["weight"].shape[0]
            fused_ok = wembed_fits_vmem(F, D, E)
        if fused_ok:
            from ..ops.pallas.window_embed import (
                window_embed_highway_trainable)
            x = window_embed_highway_trainable(params[f"cnn_{mod}"]["conv1d"],
                                               params[f"highway_{mod}"],
                                               inputs[mod])
        else:
            x = conv1d_window_embed(params[f"cnn_{mod}"]["conv1d"],
                                    inputs[mod])
            x = highway(params[f"highway_{mod}"], x, relu_proj=relu_proj)
        outputs[mod] = dropout(x, mod_rng, dropout_p)
    return outputs
