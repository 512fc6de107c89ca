"""MFN recurrence TRAINING kernels: fused forward (in-kernel hash dropout)
and a full reverse-recurrence Pallas backward.

Why: the recurrence's jnp backward is the train step's least efficient
stage.  Measured v5e MFT budget (examples/bench_train_components.py, B=32,
T=160, fp32, dropout on): MFN+head fwd+bwd = 4.23 ms of a 14.99 ms step —
~25 us per reverse-scan step of tiny dict/slice/concat ops — while the
forward kernel runs the same recurrence at ~1.7 us/step.  This module
closes that gap the same way ops/pallas/encoder.py does for the encoder
stack:

  * forward = the proven full-recurrence kernel (ops/pallas/mfn_kernel.py
    layout: grid=(T,), VMEM-resident carries/weights, xp streamed) plus
    (a) in-kernel fmix32 dropout on the gamma MLP hiddens with mask bits
    BIT-IDENTICAL to the jnp hash path (ops/mfn_core._drop_seeded), and
    (b) an extra all_cs output — the backward needs c_{t-1} per step;
  * backward = ONE kernel over grid=(T,) with reversed index maps:
    each step streams in (xp_t, states_{t-1}, output cotangents_t, seeds_t),
    REMATERIALIZES the step forward from the saved previous states (exact
    in fp32 — same arithmetic as the fwd kernel), runs the step's VJP in
    VMEM, carries (dh, dc, dmem) in scratch, accumulates ALL parameter
    grads into VMEM-resident output blocks, and streams out d_xp_t.

Reference semantics: MFT/multiTransformer.py:200-235 (gate algebra,
feature-axis softmax) — see ops/mfn_core.py for the jnp source of truth
this must match (grad parity tests in tests/test_pallas_kernels.py).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..mfn_core import HIDDEN_DIM, MEM_DIM


def _keep(seed_u32, idx_u32, p: float):
    """fmix32 Bernoulli(1-p) keep mask — mirrors basic.hash_keep_mask."""
    h = idx_u32 * jnp.uint32(0x9E3779B1) + seed_u32
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    threshold = jnp.uint32(min(int(round(p * 2.0 ** 32)), 2 ** 32 - 1))
    return h >= threshold


def _gamma_keep(seed, B: int, width: int, p: float):
    """Keep mask for a [B, width] gamma-MLP hidden — the jnp path's
    _drop_seeded uses idx = arange(B*width).reshape(B, width)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (B, width), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (B, width), 1)
    idx = (r * width + c).astype(jnp.uint32)
    return _keep(seed, idx, p)


# --------------------------------------------------------------- forward

def _fwd_kernel(mods: Sequence[str], hidden, mem_dim: int, B: int,
                p1: float, p2: float, *refs):
    """Forward with optional in-kernel gamma dropout; also emits all_cs.

    refs: [xp_m]*n, seeds [1, 2] (uint32), [whhT_m]*n, 16 gate args,
    hs_out, cs_out, mem_out, [h_s]*n, [c_s]*n, mem_s."""
    n = len(mods)
    i = 0
    xp = refs[i:i + n]; i += n
    seeds = refs[i]; i += 1
    whh = refs[i:i + n]; i += n
    (a1w1, a1b1, a1w2, a1b2, a2w1, a2b1, a2w2, a2b2,
     g1w1, g1b1, g1w2, g1b2, g2w1, g2b1, g2w2, g2b2) = refs[i:i + 16]
    i += 16
    hs_out, cs_out, mem_out = refs[i:i + 3]; i += 3
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

    prev_cs = jnp.concatenate([c_s[m][:] for m in range(n)], axis=1)
    new_cs_parts, hs_parts = [], []
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
    c_star = jnp.concatenate([prev_cs, new_cs], axis=1)

    def mlp(x, w1, b1, w2, b2):
        hmid = jnp.maximum(
            jnp.dot(x, w1[:], preferred_element_type=jnp.float32)
            + b1[:][None, :], 0.0)
        return jnp.dot(hmid, w2[:], preferred_element_type=jnp.float32) \
            + b2[:][None, :]

    att = jax.nn.softmax(mlp(c_star, a1w1, a1b1, a1w2, a1b2), axis=1)
    attended = att * c_star
    c_hat = jnp.tanh(mlp(attended, a2w1, a2b1, a2w2, a2b2))
    both = jnp.concatenate([attended, mem_s[:]], axis=1)

    def gated(w1, b1, w2, b2, seed, p):
        hmid = jnp.maximum(
            jnp.dot(both, w1[:], preferred_element_type=jnp.float32)
            + b1[:][None, :], 0.0)
        if p > 0.0:
            keep = _gamma_keep(seed, B, hmid.shape[1], p)
            hmid = jnp.where(keep, hmid / (1.0 - p), 0.0)
        return jax.nn.sigmoid(
            jnp.dot(hmid, w2[:], preferred_element_type=jnp.float32)
            + b2[:][None, :])

    g1 = gated(g1w1, g1b1, g1w2, g1b2, seeds[t, 0].astype(jnp.uint32), p1)
    g2 = gated(g2w1, g2b1, g2w2, g2b2, seeds[t, 1].astype(jnp.uint32), p2)
    mem_new = g1 * mem_s[:] + g2 * c_hat
    mem_s[:] = mem_new

    hs_out[0] = jnp.concatenate(hs_parts, axis=1).astype(hs_out.dtype)
    cs_out[0] = new_cs.astype(cs_out.dtype)
    mem_out[0] = mem_new.astype(mem_out.dtype)


def _fwd_call(gp, xps, seeds, mods, p1, p2, interpret=False):
    """gp: gate params in ORIGINAL torch layout; xps: dict mod ->
    [T, B, 4H] time-major.  Returns (all_hs, all_cs, all_mems) time-major."""
    first = xps[mods[0]]
    T, B = first.shape[0], first.shape[1]
    dtype = first.dtype
    total_h = sum(HIDDEN_DIM[m] for m in mods)

    whhs = [gp[f"whh_{m}"].T for m in mods]              # [H, 4H]

    def wt(name):
        return gp[name]["weight"].T                      # [in, out]

    def bs(name):
        return gp[name]["bias"]

    gate_args = [wt("att1_fc1"), bs("att1_fc1"), wt("att1_fc2"),
                 bs("att1_fc2"), wt("att2_fc1"), bs("att2_fc1"),
                 wt("att2_fc2"), bs("att2_fc2"),
                 wt("gamma1_fc1"), bs("gamma1_fc1"), wt("gamma1_fc2"),
                 bs("gamma1_fc2"), wt("gamma2_fc1"), bs("gamma2_fc1"),
                 wt("gamma2_fc2"), bs("gamma2_fc2")]

    xp_specs = [pl.BlockSpec((1, B, 4 * HIDDEN_DIM[m]),
                             lambda t: (t, 0, 0), memory_space=pltpu.VMEM)
                for m in mods]
    # SMEM blocks must equal the full array dims: pass the whole [T, 2]
    # table; the kernel indexes it by program_id (encoder.py pattern)
    seed_spec = pl.BlockSpec((T, 2), lambda t: (0, 0),
                             memory_space=pltpu.SMEM)
    whh_specs = [pl.BlockSpec(w.shape, lambda t: (0, 0),
                              memory_space=pltpu.VMEM) for w in whhs]
    gate_specs = [pl.BlockSpec(g.shape,
                               (lambda t: (0, 0)) if g.ndim == 2
                               else (lambda t: (0,)),
                               memory_space=pltpu.VMEM) for g in gate_args]

    hidden = {m: HIDDEN_DIM[m] for m in mods}
    kernel = functools.partial(_fwd_kernel, tuple(mods), hidden, MEM_DIM,
                               B, p1, p2)
    hs, cs, mems = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=xp_specs + [seed_spec] + whh_specs + gate_specs,
        out_specs=(
            pl.BlockSpec((1, B, total_h), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, total_h), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, MEM_DIM), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, total_h), dtype),
            jax.ShapeDtypeStruct((T, B, total_h), dtype),
            jax.ShapeDtypeStruct((T, B, MEM_DIM), dtype),
        ),
        scratch_shapes=(
            [pltpu.VMEM((B, HIDDEN_DIM[m]), jnp.float32) for m in mods]
            + [pltpu.VMEM((B, HIDDEN_DIM[m]), jnp.float32) for m in mods]
            + [pltpu.VMEM((B, MEM_DIM), jnp.float32)]
        ),
        # per-step matmul FLOPs from the actual weight shapes (feeds XLA
        # cost analysis for bench.py's train_mfu)
        cost_estimate=pl.CostEstimate(
            flops=T * 2 * B * (sum(w.size for w in whhs)
                               + sum(g.size for g in gate_args
                                     if g.ndim == 2)),
            bytes_accessed=T * B * (4 * total_h * 3 + MEM_DIM) * 4,
            transcendentals=T * B * (9 * total_h + 2 * MEM_DIM),
        ),
        interpret=interpret,
    )(*[xps[m] for m in mods], seeds, *whhs, *gate_args)
    return hs, cs, mems


# --------------------------------------------------------------- backward

def _bwd_kernel(mods: Sequence[str], hidden, mem_dim: int, B: int, T: int,
                p1: float, p2: float, *refs):
    """Reverse recurrence: grid step i handles timestep t = T-1-i (all
    time-indexed refs use reversed index maps, so ref block 0 here IS
    timestep t).

    refs (inputs): [xp_m]*n, hs_prev, cs_prev, mem_prev, g_hs, g_mems,
      seeds [1,2], [whhT_m]*n, 16 gate args;
    (outputs): [dxp_m]*n, [dwhh_m]*n, 16 gate grad accumulators
      (weights [in,out], biases [1,out]);
    (scratch): [dh_m]*n, [dc_m]*n, dmem."""
    n = len(mods)
    i = 0
    xp = refs[i:i + n]; i += n
    hs_prev, cs_prev, mem_prev_r, g_hs, g_mems, seeds = refs[i:i + 6]
    i += 6
    whh = refs[i:i + n]; i += n
    (a1w1, a1b1, a1w2, a1b2, a2w1, a2b1, a2w2, a2b2,
     g1w1, g1b1, g1w2, g1b2, g2w1, g2b1, g2w2, g2b2) = refs[i:i + 16]
    i += 16
    dxp = refs[i:i + n]; i += n
    dwhh = refs[i:i + n]; i += n
    (da1w1, da1b1, da1w2, da1b2, da2w1, da2b1, da2w2, da2b2,
     dg1w1, dg1b1, dg1w2, dg1b2, dg2w1, dg2b1, dg2w2, dg2b2) = \
        refs[i:i + 16]
    i += 16
    dh_s = refs[i:i + n]; i += n
    dc_s = refs[i:i + n]; i += n
    dmem_s = refs[i]

    step = pl.program_id(0)
    grad_refs = [da1w1, da1b1, da1w2, da1b2, da2w1, da2b1, da2w2, da2b2,
                 dg1w1, dg1b1, dg1w2, dg1b2, dg2w1, dg2b1, dg2w2, dg2b2] \
        + list(dwhh)

    @pl.when(step == 0)
    def _init():
        for m in range(n):
            dh_s[m][:] = jnp.zeros_like(dh_s[m])
            dc_s[m][:] = jnp.zeros_like(dc_s[m])
        dmem_s[:] = jnp.zeros_like(dmem_s)
        for r in grad_refs:
            r[:] = jnp.zeros_like(r)

    th = sum(hidden[m] for m in mods)
    off = np.cumsum([0] + [hidden[m] for m in mods])

    # ---- rematerialize the step forward from the saved t-1 states ----
    mem_prev = mem_prev_r[0].astype(jnp.float32)
    zs, igs, fgs, ggs, ogs, tcs, c_prevs, h_prevs = \
        [], [], [], [], [], [], [], []
    new_cs_parts = []
    for m, mod in enumerate(mods):
        H = hidden[mod]
        h_prev = hs_prev[0][:, off[m]:off[m + 1]].astype(jnp.float32)
        c_prev = cs_prev[0][:, off[m]:off[m + 1]].astype(jnp.float32)
        z = xp[m][0] + jnp.dot(h_prev, whh[m][:],
                               preferred_element_type=jnp.float32)
        ig = jax.nn.sigmoid(z[:, 0 * H:1 * H])
        fg = jax.nn.sigmoid(z[:, 1 * H:2 * H])
        gg = jnp.tanh(z[:, 2 * H:3 * H])
        og = jax.nn.sigmoid(z[:, 3 * H:4 * H])
        c_new = fg * c_prev + ig * gg
        tc = jnp.tanh(c_new)
        zs.append(z); igs.append(ig); fgs.append(fg); ggs.append(gg)
        ogs.append(og); tcs.append(tc)
        c_prevs.append(c_prev); h_prevs.append(h_prev)
        new_cs_parts.append(c_new)

    prev_cs = jnp.concatenate(c_prevs, axis=1)
    new_cs = jnp.concatenate(new_cs_parts, axis=1)
    c_star = jnp.concatenate([prev_cs, new_cs], axis=1)       # [B, 2th]

    a_pre1 = jnp.dot(c_star, a1w1[:],
                     preferred_element_type=jnp.float32) + a1b1[:][None, :]
    a_h = jnp.maximum(a_pre1, 0.0)
    logits = jnp.dot(a_h, a1w2[:],
                     preferred_element_type=jnp.float32) + a1b2[:][None, :]
    att = jax.nn.softmax(logits, axis=1)
    attended = att * c_star
    b_pre1 = jnp.dot(attended, a2w1[:],
                     preferred_element_type=jnp.float32) + a2b1[:][None, :]
    b_h = jnp.maximum(b_pre1, 0.0)
    c_hat = jnp.tanh(jnp.dot(b_h, a2w2[:],
                             preferred_element_type=jnp.float32)
                     + a2b2[:][None, :])
    both = jnp.concatenate([attended, mem_prev], axis=1)

    def gate_fwd(w1, b1, w2, b2, seed, p):
        pre1 = jnp.dot(both, w1[:],
                       preferred_element_type=jnp.float32) + b1[:][None, :]
        hid = jnp.maximum(pre1, 0.0)
        keep = None
        if p > 0.0:
            keep = _gamma_keep(seed, B, hid.shape[1], p)
            hid = jnp.where(keep, hid / (1.0 - p), 0.0)
        gamma = jax.nn.sigmoid(
            jnp.dot(hid, w2[:], preferred_element_type=jnp.float32)
            + b2[:][None, :])
        return pre1, hid, keep, gamma

    t_rev = T - 1 - step
    g1_pre1, g1_hd, keep1, gamma1 = gate_fwd(
        g1w1, g1b1, g1w2, g1b2, seeds[t_rev, 0].astype(jnp.uint32), p1)
    g2_pre1, g2_hd, keep2, gamma2 = gate_fwd(
        g2w1, g2b1, g2w2, g2b2, seeds[t_rev, 1].astype(jnp.uint32), p2)

    # ---- backward ----
    dmem_t = g_mems[0].astype(jnp.float32) + dmem_s[:]
    dgamma1 = dmem_t * mem_prev
    dgamma2 = dmem_t * c_hat
    dc_hat = dmem_t * gamma2
    dmem_prev = dmem_t * gamma1

    def gate_bwd(dgamma, gamma, hid_d, pre1, keep, p,
                 w1, w2, dw1, db1, dw2, db2):
        ds2 = dgamma * gamma * (1.0 - gamma)                  # [B, mem]
        dw2[:] += jax.lax.dot_general(
            hid_d, ds2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        db2[:] += jnp.sum(ds2, axis=0, keepdims=True)
        dhid = jax.lax.dot_general(
            ds2, w2[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)               # [B, hg]
        if p > 0.0:
            dhid = jnp.where(keep, dhid / (1.0 - p), 0.0)
        dpre1 = jnp.where(pre1 > 0.0, dhid, 0.0)
        dw1[:] += jax.lax.dot_general(
            both, dpre1, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        db1[:] += jnp.sum(dpre1, axis=0, keepdims=True)
        return jax.lax.dot_general(
            dpre1, w1[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)               # [B, both]

    dboth = gate_bwd(dgamma1, gamma1, g1_hd, g1_pre1, keep1, p1,
                     g1w1, g1w2, dg1w1, dg1b1, dg1w2, dg1b2)
    dboth += gate_bwd(dgamma2, gamma2, g2_hd, g2_pre1, keep2, p2,
                      g2w1, g2w2, dg2w1, dg2b1, dg2w2, dg2b2)

    # c_hat = tanh(b_h @ a2w2 + b)
    dchat_pre = dc_hat * (1.0 - c_hat * c_hat)
    da2w2[:] += jax.lax.dot_general(
        b_h, dchat_pre, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    da2b2[:] += jnp.sum(dchat_pre, axis=0, keepdims=True)
    db_h = jax.lax.dot_general(
        dchat_pre, a2w2[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_pre1 = jnp.where(b_pre1 > 0.0, db_h, 0.0)
    da2w1[:] += jax.lax.dot_general(
        attended, db_pre1, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    da2b1[:] += jnp.sum(db_pre1, axis=0, keepdims=True)
    dattended = jax.lax.dot_general(
        db_pre1, a2w1[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    dattended += dboth[:, :2 * th]
    dmem_prev += dboth[:, 2 * th:]

    datt = dattended * c_star
    dc_star = dattended * att
    # feature-axis softmax backward
    dlogits = att * (datt - jnp.sum(datt * att, axis=1, keepdims=True))
    da1w2[:] += jax.lax.dot_general(
        a_h, dlogits, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    da1b2[:] += jnp.sum(dlogits, axis=0, keepdims=True)
    da_h = jax.lax.dot_general(
        dlogits, a1w2[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    da_pre1 = jnp.where(a_pre1 > 0.0, da_h, 0.0)
    da1w1[:] += jax.lax.dot_general(
        c_star, da_pre1, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    da1b1[:] += jnp.sum(da_pre1, axis=0, keepdims=True)
    dc_star += jax.lax.dot_general(
        da_pre1, a1w1[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    dprev_cs = dc_star[:, :th]
    dnew_cs = dc_star[:, th:]

    for m, mod in enumerate(mods):
        H = hidden[mod]
        dh_t = g_hs[0][:, off[m]:off[m + 1]].astype(jnp.float32) \
            + dh_s[m][:]
        dc_full = dc_s[m][:] + dnew_cs[:, off[m]:off[m + 1]]
        do = dh_t * tcs[m]
        dc_full += dh_t * ogs[m] * (1.0 - tcs[m] * tcs[m])
        di = dc_full * ggs[m]
        df = dc_full * c_prevs[m]
        dg = dc_full * igs[m]
        dc_s[m][:] = dc_full * fgs[m] + dprev_cs[:, off[m]:off[m + 1]]
        dz = jnp.concatenate(
            [di * igs[m] * (1.0 - igs[m]),
             df * fgs[m] * (1.0 - fgs[m]),
             dg * (1.0 - ggs[m] * ggs[m]),
             do * ogs[m] * (1.0 - ogs[m])], axis=1)           # [B, 4H]
        dxp[m][0] = dz.astype(dxp[m].dtype)
        dwhh[m][:] += jax.lax.dot_general(
            h_prevs[m], dz, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)               # [H, 4H]
        dh_s[m][:] = jax.lax.dot_general(
            dz, whh[m][:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)               # [B, H]
    dmem_s[:] = dmem_prev


def _bwd_call(gp, xps, seeds, saved, g_hs, g_mems, mods, p1, p2,
              interpret=False):
    """Returns (d_gp in ORIGINAL layout, d_xps dict time-major)."""
    all_hs, all_cs, all_mems = saved
    first = xps[mods[0]]
    T, B = first.shape[0], first.shape[1]
    total_h = sum(HIDDEN_DIM[m] for m in mods)

    # previous-step state streams (zeros at t=0)
    z1 = jnp.zeros((1, B, total_h), all_hs.dtype)
    hs_prev = jnp.concatenate([z1, all_hs[:-1]], axis=0)
    cs_prev = jnp.concatenate([z1, all_cs[:-1]], axis=0)
    mem_prev = jnp.concatenate(
        [jnp.zeros((1, B, MEM_DIM), all_mems.dtype), all_mems[:-1]], axis=0)

    whhs = [gp[f"whh_{m}"].T for m in mods]

    def wt(name):
        return gp[name]["weight"].T

    def bs(name):
        return gp[name]["bias"]

    gate_args = [wt("att1_fc1"), bs("att1_fc1"), wt("att1_fc2"),
                 bs("att1_fc2"), wt("att2_fc1"), bs("att2_fc1"),
                 wt("att2_fc2"), bs("att2_fc2"),
                 wt("gamma1_fc1"), bs("gamma1_fc1"), wt("gamma1_fc2"),
                 bs("gamma1_fc2"), wt("gamma2_fc1"), bs("gamma2_fc1"),
                 wt("gamma2_fc2"), bs("gamma2_fc2")]

    rev3 = lambda t: (T - 1 - t, 0, 0)
    fix2 = lambda t: (0, 0)

    xp_specs = [pl.BlockSpec((1, B, 4 * HIDDEN_DIM[m]), rev3,
                             memory_space=pltpu.VMEM) for m in mods]
    state_specs = [
        pl.BlockSpec((1, B, total_h), rev3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B, total_h), rev3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B, MEM_DIM), rev3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B, total_h), rev3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, B, MEM_DIM), rev3, memory_space=pltpu.VMEM),
        pl.BlockSpec((T, 2), lambda t: (0, 0), memory_space=pltpu.SMEM),
    ]
    whh_specs = [pl.BlockSpec(w.shape, fix2, memory_space=pltpu.VMEM)
                 for w in whhs]
    gate_specs = [pl.BlockSpec(g.shape,
                               fix2 if g.ndim == 2 else (lambda t: (0,)),
                               memory_space=pltpu.VMEM) for g in gate_args]

    dxp_specs = [pl.BlockSpec((1, B, 4 * HIDDEN_DIM[m]), rev3,
                              memory_space=pltpu.VMEM) for m in mods]
    dwhh_specs = [pl.BlockSpec(w.shape, fix2, memory_space=pltpu.VMEM)
                  for w in whhs]
    # grad accumulators: weights [in, out], biases [1, out]
    gshapes = [(g.shape if g.ndim == 2 else (1,) + g.shape)
               for g in gate_args]
    gacc_specs = [pl.BlockSpec(s, fix2, memory_space=pltpu.VMEM)
                  for s in gshapes]

    dxp_shapes = [jax.ShapeDtypeStruct((T, B, 4 * HIDDEN_DIM[m]),
                                       xps[m].dtype) for m in mods]
    dwhh_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32)
                   for w in whhs]
    gacc_shapes = [jax.ShapeDtypeStruct(s, jnp.float32) for s in gshapes]

    hidden = {m: HIDDEN_DIM[m] for m in mods}
    kernel = functools.partial(_bwd_kernel, tuple(mods), hidden, MEM_DIM,
                               B, T, p1, p2)
    out = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=xp_specs + state_specs + whh_specs + gate_specs,
        out_specs=tuple(dxp_specs + dwhh_specs + gacc_specs),
        out_shape=tuple(dxp_shapes + dwhh_shapes + gacc_shapes),
        scratch_shapes=(
            [pltpu.VMEM((B, HIDDEN_DIM[m]), jnp.float32) for m in mods]
            + [pltpu.VMEM((B, HIDDEN_DIM[m]), jnp.float32) for m in mods]
            + [pltpu.VMEM((B, MEM_DIM), jnp.float32)]
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        # model-FLOPs convention: reverse recurrence ~ 2x the forward's
        # matmul work (recompute is remat, not model work)
        cost_estimate=pl.CostEstimate(
            flops=2 * T * 2 * B * (sum(w.size for w in whhs)
                                   + sum(g.size for g in gate_args
                                         if g.ndim == 2)),
            bytes_accessed=T * B * (4 * total_h * 5 + 2 * MEM_DIM) * 4,
            transcendentals=T * B * (9 * total_h + 2 * MEM_DIM),
        ),
        interpret=interpret,
    )(*[xps[m] for m in mods], hs_prev, cs_prev, mem_prev, g_hs, g_mems,
      seeds, *whhs, *gate_args)

    n = len(mods)
    dxps = {m: out[i] for i, m in enumerate(mods)}
    dwhh = out[n:2 * n]
    gaccs = out[2 * n:]

    names = ["att1_fc1", "att1_fc2", "att2_fc1", "att2_fc2",
             "gamma1_fc1", "gamma1_fc2", "gamma2_fc1", "gamma2_fc2"]
    d_gp = {}
    for m, dw in zip(mods, dwhh):
        d_gp[f"whh_{m}"] = dw.T.astype(gp[f"whh_{m}"].dtype)  # -> [4H, H]
    for j, name in enumerate(names):
        dw = gaccs[2 * j]                                     # [in, out]
        db = gaccs[2 * j + 1][0]                              # [out]
        d_gp[name] = {
            "weight": dw.T.astype(gp[name]["weight"].dtype),
            "bias": db.astype(gp[name]["bias"].dtype),
        }
    return d_gp, dxps


# ------------------------------------------------------------ custom_vjp

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def mfn_states_fused_train(gp, xps, seeds, mods, dropout_ps):
    """Differentiable fused MFN recurrence (training path).

    gp: {"whh_{m}": [4H, H] torch layout, "<gate>_fc{1,2}": {weight, bias}}
    xps: dict mod -> [T, B, 4H] time-major hoisted input projections
         (including both LSTM biases — their grads flow through d_xps).
    seeds: [T, 2] uint32 per-step fmix32 site seeds (gamma1, gamma2) —
         bit-identical masks to mfn_core's hoisted-hash scan path.
    mods: tuple of modality names (static).
    dropout_ps: (p_gamma1, p_gamma2) floats (static).

    Returns (all_hs [T, B, total_h], all_mems [T, B, MEM_DIM]).
    """
    hs, _, mems = _fwd_call(gp, xps, seeds, mods, *dropout_ps,
                            interpret=_interpret())
    return hs, mems


def _train_fwd_rule(gp, xps, seeds, mods, dropout_ps):
    hs, cs, mems = _fwd_call(gp, xps, seeds, mods, *dropout_ps,
                             interpret=_interpret())
    return (hs, mems), (gp, xps, seeds, (hs, cs, mems))


def _train_bwd_rule(mods, dropout_ps, res, g):
    gp, xps, seeds, saved = res
    g_hs, g_mems = g
    d_gp, d_xps = _bwd_call(gp, xps, seeds, saved, g_hs, g_mems, mods,
                            *dropout_ps, interpret=_interpret())
    return d_gp, d_xps, np.zeros(seeds.shape, dtype=jax.dtypes.float0)


mfn_states_fused_train.defvjp(_train_fwd_rule, _train_bwd_rule)


def _interpret() -> bool:
    # Single source of truth for the backend check (dispatch._TPU_BACKENDS
    # covers both the native 'tpu' and the tunneled 'axon' name — treating
    # axon as non-TPU silently ran these kernels in interpret mode on the
    # production device).
    from ..dispatch import interpret_default
    return interpret_default()
