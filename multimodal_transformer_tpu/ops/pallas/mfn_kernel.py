"""MFN recurrence as ONE Pallas kernel.

The MFN is the framework's dominant sequential op (SURVEY.md §3 hot loop 1:
T dependent steps of per-modality LSTMCells + four gate MLPs,
reference MFT/multiTransformer.py:200-235).  The lax.scan version
(ops/mfn_core.py) already hoists the input projections; this kernel goes
further and runs the WHOLE recurrence inside a single kernel invocation:

  * grid = (T,): TPU grid steps execute sequentially inside one kernel, so
    VMEM scratch (h, c per modality + mem) carries state across timesteps
    with zero HBM round-trips;
  * the hoisted input projections xp[t] stream in per grid step as
    [1, B, 4H_m] blocks — Pallas double-buffers the next step's block during
    the current step's compute;
  * every weight matrix (LSTM h-to-h + the four gate MLPs) is pinned in VMEM
    for the whole T-loop (~0.5 MB fp32 for the A+V+L config);
  * per-step outputs ([B, total_h] hidden concat + [B, mem] memory) stream
    out as [1, ...] blocks; the output head runs batched afterwards.

Eval path only (the training path keeps the differentiable lax.scan).
Weight layout notes: W_hh passed pre-transposed [H, 4H]; gate MLP weights
pre-transposed [in, out] so every in-kernel matmul is plain row-major.
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..mfn_core import HIDDEN_DIM, MEM_DIM


def _mfn_kernel(mods: Sequence[str], hidden: Dict[str, int], mem_dim: int,
                *refs):
    """refs order:
    [xp_m for m in mods], [whh_m for m in mods],
    att1_w1, att1_b1, att1_w2, att1_b2,
    att2_w1, att2_b1, att2_w2, att2_b2,
    g1_w1, g1_b1, g1_w2, g1_b2,
    g2_w1, g2_b1, g2_w2, g2_b2,
    hs_out, mem_out,
    [h_scratch_m], [c_scratch_m], mem_scratch
    """
    n = len(mods)
    i = 0
    xp = refs[i:i + n]; i += n
    whh = refs[i:i + n]; i += n
    (a1w1, a1b1, a1w2, a1b2, a2w1, a2b1, a2w2, a2b2,
     g1w1, g1b1, g1w2, g1b2, g2w1, g2b1, g2w2, g2b2) = refs[i:i + 16]
    i += 16
    hs_out, mem_out = refs[i:i + 2]; i += 2
    h_s = refs[i:i + n]; i += n
    c_s = refs[i:i + n]; i += n
    mem_s = refs[i]

    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        for m in range(n):
            h_s[m][:] = jnp.zeros_like(h_s[m])
            c_s[m][:] = jnp.zeros_like(c_s[m])
        mem_s[:] = jnp.zeros_like(mem_s)

    def mlp(x, w1, b1, w2, b2):
        hmid = jnp.maximum(
            jnp.dot(x, w1[:], preferred_element_type=jnp.float32)
            + b1[:][None, :], 0.0)
        return jnp.dot(hmid, w2[:], preferred_element_type=jnp.float32) \
            + b2[:][None, :]

    prev_cs = jnp.concatenate([c_s[m][:] for m in range(n)], axis=1)

    new_cs_parts = []
    hs_parts = []
    for m, mod in enumerate(mods):
        H = hidden[mod]
        z = xp[m][0] + jnp.dot(h_s[m][:], whh[m][:],
                               preferred_element_type=jnp.float32)
        ig = jax.nn.sigmoid(z[:, 0 * H:1 * H])
        fg = jax.nn.sigmoid(z[:, 1 * H:2 * H])
        gg = jnp.tanh(z[:, 2 * H:3 * H])
        og = jax.nn.sigmoid(z[:, 3 * H:4 * H])
        c_new = fg * c_s[m][:] + ig * gg
        h_new = og * jnp.tanh(c_new)
        c_s[m][:] = c_new
        h_s[m][:] = h_new
        new_cs_parts.append(c_new)
        hs_parts.append(h_new)

    new_cs = jnp.concatenate(new_cs_parts, axis=1)
    c_star = jnp.concatenate([prev_cs, new_cs], axis=1)       # [B, 2TH]
    att_logits = mlp(c_star, a1w1, a1b1, a1w2, a1b2)
    att = jax.nn.softmax(att_logits, axis=1)                  # feature axis
    attended = att * c_star
    c_hat = jnp.tanh(mlp(attended, a2w1, a2b1, a2w2, a2b2))
    both = jnp.concatenate([attended, mem_s[:]], axis=1)
    g1 = jax.nn.sigmoid(mlp(both, g1w1, g1b1, g1w2, g1b2))
    g2 = jax.nn.sigmoid(mlp(both, g2w1, g2b1, g2w2, g2b2))
    mem_new = g1 * mem_s[:] + g2 * c_hat
    mem_s[:] = mem_new

    hs_out[0] = jnp.concatenate(hs_parts, axis=1)
    mem_out[0] = mem_new


def mfn_scan_pallas(params, inputs, mods, *, interpret: bool = False):
    """Drop-in for ops.mfn_core.mfn_scan's recurrence (eval mode).

    inputs: dict mod -> [B, T, D_mod].  Returns (all_hs [B, T, total_h],
    all_mems [B, T, MEM_DIM]) — the output head is applied by the caller.
    """
    first = inputs[mods[0]]
    B, T = first.shape[0], first.shape[1]
    dtype = first.dtype
    total_h = sum(HIDDEN_DIM[m] for m in mods)

    # hoisted input projections, time-major [T, B, 4H]
    xps = []
    for m in mods:
        p = params[f"lstm_{m}"]
        xps.append((jnp.einsum("btd,gd->btg", inputs[m], p["weight_ih"])
                    + p["bias_ih"] + p["bias_hh"]).transpose(1, 0, 2))
    whhs = [params[f"lstm_{m}"]["weight_hh"].T for m in mods]  # [H, 4H]

    def wt(name):
        return params[name]["weight"].T  # [in, out]

    def bs(name):
        return params[name]["bias"]

    gate_args = [wt("att1_fc1"), bs("att1_fc1"), wt("att1_fc2"), bs("att1_fc2"),
                 wt("att2_fc1"), bs("att2_fc1"), wt("att2_fc2"), bs("att2_fc2"),
                 wt("gamma1_fc1"), bs("gamma1_fc1"), wt("gamma1_fc2"),
                 bs("gamma1_fc2"),
                 wt("gamma2_fc1"), bs("gamma2_fc1"), wt("gamma2_fc2"),
                 bs("gamma2_fc2")]

    xp_specs = [pl.BlockSpec((1, B, 4 * HIDDEN_DIM[m]),
                             lambda t: (t, 0, 0), memory_space=pltpu.VMEM)
                for m in mods]
    whh_specs = [pl.BlockSpec(w.shape, lambda t: (0, 0),
                              memory_space=pltpu.VMEM) for w in whhs]
    gate_specs = []
    for g in gate_args:
        if g.ndim == 2:
            gate_specs.append(pl.BlockSpec(g.shape, lambda t: (0, 0),
                                           memory_space=pltpu.VMEM))
        else:
            gate_specs.append(pl.BlockSpec(g.shape, lambda t: (0,),
                                           memory_space=pltpu.VMEM))

    hidden = {m: HIDDEN_DIM[m] for m in mods}
    kernel = functools.partial(_mfn_kernel, tuple(mods), hidden, MEM_DIM)

    hs, mems = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=xp_specs + whh_specs + gate_specs,
        out_specs=(
            pl.BlockSpec((1, B, total_h), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, MEM_DIM), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, total_h), dtype),
            jax.ShapeDtypeStruct((T, B, MEM_DIM), dtype),
        ),
        scratch_shapes=(
            [pltpu.VMEM((B, HIDDEN_DIM[m]), jnp.float32) for m in mods]
            + [pltpu.VMEM((B, HIDDEN_DIM[m]), jnp.float32) for m in mods]
            + [pltpu.VMEM((B, MEM_DIM), jnp.float32)]
        ),
        interpret=interpret,
    )(*xps, *whhs, *gate_args)
    return hs.transpose(1, 0, 2), mems.transpose(1, 0, 2)
