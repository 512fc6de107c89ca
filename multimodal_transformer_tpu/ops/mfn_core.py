"""Memory Fusion Network recurrence as one lax.scan.

TPU-native reimplementation of the reference MFN
(reference MFT/multiTransformer.py:118-248).  The reference runs a Python loop
over T timesteps, each doing per-modality LSTMCell steps plus four small gate
MLPs (delta-memory attention att1/att2, retain/update gates gamma1/gamma2) and
finally a second Python loop applying the output MLP per step.

Here:
  * per-modality LSTM *input* projections for every timestep are hoisted out of
    the recurrence as large batched MXU matmuls;
  * the sequential part is ONE `lax.scan` whose body fuses all per-step matmuls
    (h-to-h LSTM projections + the four gate MLPs) — XLA keeps the small
    weights resident in VMEM across steps;
  * the output head (concat[h_mods, mem] -> Linear -> ReLU -> Dropout -> Linear)
    runs batched over all timesteps after the scan.

Gate algebra (exact, multiTransformer.py:200-224):
    cStar   = [c_{t-1}; c_t]                       (concat over modalities)
    a       = softmax(att1(cStar))                 (softmax over features!)
    attended= a * cStar
    cHat    = tanh(att2(attended))
    both    = [attended; mem]
    mem'    = sigmoid(g1(both)) * mem + sigmoid(g2(both)) * cHat

Note the softmax is over the *feature* dimension (dim=1 of [B, 2*total_h]) —
an unusual choice the reference makes; replicated exactly.

Hyperparameters (multiTransformer.py:128-147): hidden dims per modality
{linguistic: 88, emotient: 16, acoustic: 48, image: 88}, mem_dim=128,
h_att1=128, h_att2=256, h_gamma1=h_gamma2=64, h_out=64, dropouts
(att1, att2, g1, g2, out) = (0, 0, 0.2, 0.2, 0.5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..utils.torch_init import linear_init, lstm_init
from .basic import _dropout_impl, dropout, hash_keep_mask, hash_seed, linear

HIDDEN_DIM = {"linguistic": 88, "emotient": 16, "acoustic": 48, "image": 88}
MEM_DIM = 128
H_ATT1, H_ATT2, H_GAMMA1, H_GAMMA2, H_OUT = 128, 256, 64, 64, 64
DROPOUTS = {"att1": 0.0, "att2": 0.0, "gamma1": 0.2, "gamma2": 0.2, "out": 0.5}


def mfn_init(key, mods, dims, output_dim: int):
    """dims: per-modality input dim (the per-mod embed dims upstream)."""
    total_h = sum(HIDDEN_DIM[m] for m in mods)
    att_in = total_h * 2
    gamma_in = att_in + MEM_DIM
    final_in = total_h + MEM_DIM
    keys = jax.random.split(key, len(mods) + 10)
    params = {}
    for i, m in enumerate(mods):
        params[f"lstm_{m}"] = lstm_init(keys[i], dims[m], HIDDEN_DIM[m])
    k = len(mods)
    params["att1_fc1"] = linear_init(keys[k + 0], att_in, H_ATT1)
    params["att1_fc2"] = linear_init(keys[k + 1], H_ATT1, att_in)
    params["att2_fc1"] = linear_init(keys[k + 2], att_in, H_ATT2)
    params["att2_fc2"] = linear_init(keys[k + 3], H_ATT2, MEM_DIM)
    params["gamma1_fc1"] = linear_init(keys[k + 4], gamma_in, H_GAMMA1)
    params["gamma1_fc2"] = linear_init(keys[k + 5], H_GAMMA1, MEM_DIM)
    params["gamma2_fc1"] = linear_init(keys[k + 6], gamma_in, H_GAMMA2)
    params["gamma2_fc2"] = linear_init(keys[k + 7], H_GAMMA2, MEM_DIM)
    params["out_fc1"] = linear_init(keys[k + 8], final_in, H_OUT)
    params["out_fc2"] = linear_init(keys[k + 9], H_OUT, output_dim)
    return params


def _sig_mlp(p1, p2, x, rng, p_drop):
    h = jax.nn.relu(linear(p1, x))
    h = dropout(h, rng, p_drop)
    return jax.nn.sigmoid(linear(p2, h))


def _drop_seeded(x, seed, p_drop: float):
    """Inverted hash dropout from a precomputed fmix32 seed (the hoisted
    form of basic.dropout's hash path — same mask bits for the same key)."""
    from .basic import _ablate_dropout
    if p_drop == 0.0 or _ablate_dropout():
        return x
    idx = jnp.arange(x.size, dtype=jnp.uint32).reshape(x.shape)
    keep = hash_keep_mask(seed, idx, p_drop)
    return jnp.where(keep, x / (1.0 - p_drop), 0.0)


def _sig_mlp_seeded(p1, p2, x, seed, p_drop: float):
    h = jax.nn.relu(linear(p1, x))
    h = _drop_seeded(h, seed, p_drop)
    return jax.nn.sigmoid(linear(p2, h))


def mfn_scan(params, inputs, mods, *, rng=None):
    """MFN forward.  inputs: dict mod -> [B, T, D_mod] (batch-major; the
    reference permutes to time-major before its loop — the scan here is
    time-major internally).  Returns [B, T, output_dim]."""
    # Pallas full-recurrence kernel (ops/pallas/mfn_kernel.py): the whole
    # T-step loop inside one kernel with VMEM-resident carries/weights.
    # Default ON for TPU eval: in isolation it measures at parity with this
    # scan (~0.27 ms, stable slope timing — see mfn_kernel.py docstring),
    # but end-to-end the kernel set is +14-15% on the MFT bench (fewer
    # fusion boundaries around the recurrence).  MMTX_PALLAS_MFN=0 opts out.
    # Differentiable via a custom_vjp whose backward runs the fused
    # reverse-recurrence kernel (ops/pallas/mfn_train.py, p=0) — so
    # dropout-free training (rng=None under value_and_grad) dispatches
    # here too; MMTX_PALLAS_MFN_TRAIN=0 falls back to the jnp-scan remat.
    from .dispatch import pallas_enabled
    if rng is None and pallas_enabled("mfn"):
        all_hs_b, all_mems_b = _mfn_states_pallas_trainable(
            params, inputs, tuple(mods))
        feats = jnp.concatenate([all_hs_b, all_mems_b], axis=2)  # [B,T,.]
        h = jax.nn.relu(linear(params["out_fc1"], feats))
        return linear(params["out_fc2"], h)

    # Dropout-ON fused path (ops/pallas/mfn_train.py): Pallas forward with
    # in-kernel fmix32 gamma dropout (bit-identical mask bits to this
    # module's hoisted-hash scan below) + a full reverse-recurrence Pallas
    # backward with VMEM-resident grad accumulators.  Hash impl only —
    # threefry mask bits are not kernel-regenerable.
    # hash4 changes only basic.dropout's generic sites (multi-bit); the
    # MFN gamma sites pair with _drop_seeded's per-element stream under
    # BOTH hash impls, so the fused path serves hash4 unchanged.
    if (rng is not None and _dropout_impl() in ("hash", "hash4")
            and pallas_enabled("mfn_train")):
        all_hs, all_mems = _mfn_states_fused_path(params, inputs,
                                                  tuple(mods), rng)
    else:
        all_hs, all_mems = _mfn_states_scan(params, inputs, mods, rng=rng)

    # Output head, batched over all timesteps: [T, B, total_h + mem].
    feats = jnp.concatenate([all_hs, all_mems], axis=2)
    out_rng = None
    if rng is not None:
        out_rng = jax.random.fold_in(rng, 7)
    h = jax.nn.relu(linear(params["out_fc1"], feats))
    h = dropout(h, out_rng, DROPOUTS["out"])
    out = linear(params["out_fc2"], h)  # [T, B, output_dim]
    return out.transpose(1, 0, 2)


def _mfn_states_scan(params, inputs, mods, *, rng=None):
    """The MFN recurrence as a lax.scan; returns TIME-major
    (all_hs [T, B, total_h], all_mems [T, B, mem])."""
    first = inputs[mods[0]]
    B, T = first.shape[0], first.shape[1]
    dtype = first.dtype

    # Hoist all LSTM input projections out of the recurrence: [T, B, 4H_m].
    x_projs = {}
    for m in mods:
        p = params[f"lstm_{m}"]
        x_projs[m] = (jnp.einsum("btd,gd->btg", inputs[m], p["weight_ih"])
                      + p["bias_ih"] + p["bias_hh"]).transpose(1, 0, 2)

    h0 = {m: jnp.zeros((B, HIDDEN_DIM[m]), dtype) for m in mods}
    c0 = {m: jnp.zeros((B, HIDDEN_DIM[m]), dtype) for m in mods}
    mem0 = jnp.zeros((B, MEM_DIM), dtype)

    # Per-step dropout randomness, HOISTED off the recurrence's critical
    # path: the reference stream is split(rng, T) -> per step
    # split(step_rng) -> (r1, r2).  Doing the inner split inside the scan
    # body puts 160 sequential threefry evaluations on the serial chain;
    # vmapping the identical split outside produces bit-identical keys as
    # one batched op.  For the hash dropout impl the keys are further
    # collapsed to their fmix32 seeds (what basic.dropout's hash path
    # computes from each key), so the body carries two uint32 scalars per
    # step and zero threefry work.
    # hash4 takes the same hoisted-seed gamma path as hash (per-element
    # bits — the multi-bit layout lives only in basic.dropout's sites)
    hoist_hash = rng is not None and _dropout_impl() in ("hash", "hash4")
    if rng is not None:
        step_rngs = jax.random.split(rng, T)
        sub = jax.vmap(lambda k: jax.random.split(k, 2))(step_rngs)
        if hoist_hash:
            step_xs = jax.vmap(
                lambda ks: jnp.stack([hash_seed(ks[0]), hash_seed(ks[1])])
            )(sub)                                     # [T, 2] uint32
        else:
            step_xs = sub                              # [T, 2, key]
    else:
        step_xs = jnp.zeros((T, 2), dtype=jnp.uint32)  # unused placeholder

    def body(carry, xs):
        h, c, mem = carry
        xp, step_x = xs
        r1 = r2 = None
        if rng is not None and not hoist_hash:
            r1, r2 = step_x[0], step_x[1]
        prev_cs = jnp.concatenate([c[m] for m in mods], axis=1)
        new_h, new_c = {}, {}
        for m in mods:
            p = params[f"lstm_{m}"]
            z = xp[m] + h[m] @ p["weight_hh"].T
            hd = HIDDEN_DIM[m]
            i = jax.nn.sigmoid(z[:, 0 * hd:1 * hd])
            f = jax.nn.sigmoid(z[:, 1 * hd:2 * hd])
            g = jnp.tanh(z[:, 2 * hd:3 * hd])
            o = jax.nn.sigmoid(z[:, 3 * hd:4 * hd])
            new_c[m] = f * c[m] + i * g
            new_h[m] = o * jnp.tanh(new_c[m])
        new_cs = jnp.concatenate([new_c[m] for m in mods], axis=1)
        c_star = jnp.concatenate([prev_cs, new_cs], axis=1)  # [B, 2*total_h]
        # delta-memory attention: softmax over the FEATURE dim (reference dim=1)
        att_h = jax.nn.relu(linear(params["att1_fc1"], c_star))
        att_logits = linear(params["att1_fc2"], att_h)
        attention = jax.nn.softmax(att_logits, axis=1)
        attended = attention * c_star
        c_hat = jnp.tanh(linear(params["att2_fc2"],
                                jax.nn.relu(linear(params["att2_fc1"], attended))))
        both = jnp.concatenate([attended, mem], axis=1)
        if hoist_hash:
            gamma1 = _sig_mlp_seeded(params["gamma1_fc1"],
                                     params["gamma1_fc2"], both,
                                     step_x[0], DROPOUTS["gamma1"])
            gamma2 = _sig_mlp_seeded(params["gamma2_fc1"],
                                     params["gamma2_fc2"], both,
                                     step_x[1], DROPOUTS["gamma2"])
        else:
            gamma1 = _sig_mlp(params["gamma1_fc1"], params["gamma1_fc2"],
                              both, r1,
                              DROPOUTS["gamma1"] if rng is not None else 0.0)
            gamma2 = _sig_mlp(params["gamma2_fc1"], params["gamma2_fc2"],
                              both, r2,
                              DROPOUTS["gamma2"] if rng is not None else 0.0)
        mem = gamma1 * mem + gamma2 * c_hat
        hs_out = jnp.concatenate([new_h[m] for m in mods], axis=1)
        return (new_h, new_c, mem), (hs_out, mem)

    (_, _, _), (all_hs, all_mems) = jax.lax.scan(
        body, (h0, c0, mem0),
        ({m: x_projs[m] for m in mods}, step_xs),
        unroll=_scan_unroll())
    return all_hs, all_mems


def _scan_unroll() -> int:
    """lax.scan unroll factor for the MFN recurrence (MMTX_MFN_UNROLL).

    Measured verdict (v5e, bench_train.py, same-session A/B): unroll=2
    LOSES on the training step (16.9 vs 15.9 ms/step) and unroll=4 blows
    the XLA compile past 10 minutes — cross-step fusion does not pay for
    the bigger transpose graph.  Default stays 1; the knob remains for
    re-testing on other shapes/hardware."""
    import os
    try:
        return max(1, int(os.environ.get("MMTX_MFN_UNROLL", "1")))
    except ValueError:
        return 1


def _hoist_gp_xps(params, inputs, mods):
    """The recurrence's kernel-boundary inputs: gate/h-to-h params (gp,
    original torch layouts) + hoisted per-mod input projections (xps,
    time-major [T, B, 4H], biases folded in).  Pure jnp, so jax.vjp of
    this function routes kernel cotangents back onto the params/inputs
    pytrees (weight_ih/bias grads come from d_xps)."""
    xps = {}
    for m in mods:
        p = params[f"lstm_{m}"]
        xps[m] = (jnp.einsum("btd,gd->btg", inputs[m], p["weight_ih"])
                  + p["bias_ih"] + p["bias_hh"]).transpose(1, 0, 2)
    gp = {f"whh_{m}": params[f"lstm_{m}"]["weight_hh"] for m in mods}
    for name in ("att1_fc1", "att1_fc2", "att2_fc1", "att2_fc2",
                 "gamma1_fc1", "gamma1_fc2", "gamma2_fc1", "gamma2_fc2"):
        gp[name] = params[name]
    return gp, xps


def _mfn_states_fused_path(params, inputs, mods, rng):
    """Dropout-ON fused recurrence: hoists the input projections and the
    per-step dropout seed table exactly like _mfn_states_scan's hash path
    (same expressions -> same mask bits), then runs the Pallas train
    kernels via their custom_vjp.  Returns TIME-major (all_hs, all_mems)
    like _mfn_states_scan."""
    from .pallas.mfn_train import mfn_states_fused_train

    first = inputs[mods[0]]
    T = first.shape[1]
    gp, xps = _hoist_gp_xps(params, inputs, mods)

    # identical key chain to _mfn_states_scan's hoisted-hash table
    step_rngs = jax.random.split(rng, T)
    sub = jax.vmap(lambda k: jax.random.split(k, 2))(step_rngs)
    seeds = jax.vmap(
        lambda ks: jnp.stack([hash_seed(ks[0]), hash_seed(ks[1])])
    )(sub)                                                 # [T, 2] uint32
    seeds = jax.lax.bitcast_convert_type(seeds, jnp.int32)  # SMEM wants i32

    from .basic import _ablate_dropout
    p1, p2 = ((0.0, 0.0) if _ablate_dropout()
              else (DROPOUTS["gamma1"], DROPOUTS["gamma2"]))
    return mfn_states_fused_train(gp, xps, seeds, mods, (p1, p2))


# Differentiable wrapper over the Pallas full-recurrence kernel.  The
# primal (eval: never differentiated) keeps the lean proven eval kernel;
# under differentiation the fwd rule runs the train-forward kernel (which
# also saves the cell states) so the backward can run the fused
# reverse-recurrence kernel (ops/pallas/mfn_train.py) — measured 15.25 ->
# 10.28 ms/step fp32 on the dropout path, and the dropout-free backward
# is the same kernel with p=0.  MMTX_PALLAS_MFN_TRAIN=0 falls back to the
# round-2 behavior (backward rematerialized through the jnp scan).

@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _mfn_states_pallas_trainable(params, inputs, mods):
    from .pallas.mfn_kernel import mfn_scan_pallas
    return mfn_scan_pallas(params, inputs, list(mods))


def _zero_seeds(inputs, mods):
    return jnp.zeros((inputs[mods[0]].shape[1], 2), jnp.int32)


def _mfn_states_fwd(params, inputs, mods):
    from .dispatch import pallas_enabled
    if not pallas_enabled("mfn_train"):
        return (_mfn_states_pallas_trainable(params, inputs, mods),
                (False, params, inputs, None))
    from .pallas.mfn_train import _fwd_call, _interpret
    gp, xps = _hoist_gp_xps(params, inputs, list(mods))
    hs, cs, mems = _fwd_call(gp, xps, _zero_seeds(inputs, mods), mods,
                             0.0, 0.0, interpret=_interpret())
    out = (hs.transpose(1, 0, 2), mems.transpose(1, 0, 2))  # batch-major
    return out, (True, params, inputs, (xps, (hs, cs, mems)))


def _mfn_states_bwd(mods, res, g):
    fused, params, inputs, saved = res
    if not fused:
        def batch_major_states(p, i):
            hs, mems = _mfn_states_scan(p, i, list(mods), rng=None)
            return hs.transpose(1, 0, 2), mems.transpose(1, 0, 2)

        _, vjp = jax.vjp(batch_major_states, params, inputs)
        return vjp(g)

    from .pallas.mfn_train import _bwd_call, _interpret
    xps, states = saved
    gp, _ = _hoist_gp_xps(params, inputs, list(mods))
    g_hs = g[0].transpose(1, 0, 2)
    g_mems = g[1].transpose(1, 0, 2)
    d_gp, d_xps = _bwd_call(gp, xps, _zero_seeds(inputs, mods), states,
                            g_hs, g_mems, mods, 0.0, 0.0,
                            interpret=_interpret())
    _, hvjp = jax.vjp(lambda p, i: _hoist_gp_xps(p, i, list(mods)),
                      params, inputs)
    return hvjp((d_gp, d_xps))


_mfn_states_pallas_trainable.defvjp(_mfn_states_fwd, _mfn_states_bwd)
