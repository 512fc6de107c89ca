"""Multi-head attention + pre-norm encoder stack.

Faithful TPU-native reimplementation of the reference encoder
(reference MFT/multiTransformer.py:22-116):

  * scaled dot-product attention with mask semantics selectable via
    `mask_mode`:
      - "query"      (reference-exact): the [B,T,1] mask is broadcast as
        [B,1,Tq,1] against scores [B,h,Tq,Tk], i.e. *padded query rows* get
        -1e9 everywhere (uniform softmax) while padded *keys* are still
        attended by valid queries (reference multiTransformer.py:48-50 with the
        mask built at train.py:103-107).  Output depends on the amount of
        padding — bit-parity with the reference requires feeding the same
        padded shapes it used (bs=1 eval => no padding).
      - "key_query"  (clean): additionally mask padded keys, making valid
        outputs invariant to padding length — required for bucketed/batched
        TPU eval where sequences are padded to a shared static shape.
  * h=8 heads sharing d_model, 4 linear projections (q,k,v,out);
  * pre-norm sublayers: x + dropout(sublayer(torch_layer_norm(x))), with a
    final torch_layer_norm (Encoder at multiTransformer.py:67-76);
  * N layers initialized *identically* (the reference `clones()` deep-copies
    one initialized layer, multiTransformer.py:78-79).

Everything here is plain jnp by default: at SEND scale (B<=32, T<=~350,
D=256) XLA fuses the whole block efficiently and honestly out-measures the
Pallas flash kernel (ops/dispatch.py table).  The blockwise flash kernel in
ops/pallas/attention.py is opt-in (MMTX_PALLAS_ATTN=1) for long-sequence
configs, on both eval and (dropout-free) training via its remat custom_vjp.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from ..utils.torch_init import linear_init, norm_init
from .basic import linear, dropout
from .norm import torch_layer_norm

NEG_INF = -1e9


def mha_init(key, d_model: int):
    keys = jax.random.split(key, 4)
    return {"linears": [linear_init(k, d_model, d_model) for k in keys]}


def multi_head_attention(params, query, key, value, mask=None, *, h: int,
                         rng=None, dropout_p: float = 0.1,
                         mask_mode: str = "query"):
    """MHA forward.  query/key/value: [B, T, D]; mask: [B, T, 1] or None.

    Returns [B, T, D]."""
    B, Tq, D = query.shape
    d_k = D // h

    def proj(p, x):
        return linear(p, x).reshape(B, -1, h, d_k).transpose(0, 2, 1, 3)

    q = proj(params["linears"][0], query)   # [B, h, Tq, d_k]
    k = proj(params["linears"][1], key)     # [B, h, Tk, d_k]
    v = proj(params["linears"][2], value)   # [B, h, Tk, d_k]

    # Pallas flash path (opt-in, MMTX_PALLAS_ATTN=1): clean key-masked mode
    # on TPU.  Serves eval (rng=None) and dropout-free training — its remat
    # custom_vjp makes it differentiable, but it has no attention-prob
    # dropout, so training with dropout_p > 0 keeps the jnp path.  Padded
    # query rows differ from the jnp path (normal-vs-uniform attention) but
    # are masked out downstream by every model head.
    from .dispatch import pallas_enabled
    if (mask is not None and mask_mode == "key_query"
            and (rng is None or dropout_p == 0.0)
            and pallas_enabled("attn", t=key.shape[1])):
        from .pallas.attention import flash_attention_trainable
        Tk = key.shape[1]
        qf = q.reshape(B * h, Tq, d_k)
        kf = k.reshape(B * h, Tk, d_k)
        vf = v.reshape(B * h, Tk, d_k)
        kmask = jnp.repeat(mask[:, :, 0], h, axis=0)  # [B*h, Tk]
        xf = flash_attention_trainable(qf, kf, vf, kmask)
        x = xf.reshape(B, h, Tq, d_k).transpose(0, 2, 1, 3).reshape(B, Tq, D)
        return linear(params["linears"][3], x)

    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
        jnp.asarray(d_k, dtype=query.dtype))
    if mask is not None:
        qmask = mask[:, None, :, 0:1]       # [B, 1, Tq, 1] — reference quirk
        scores = jnp.where(qmask == 0, NEG_INF, scores)
        if mask_mode == "key_query":
            kmask = mask[..., 0][:, None, None, :]  # [B, 1, 1, Tk]
            scores = jnp.where(kmask == 0, NEG_INF, scores)
    p_attn = jax.nn.softmax(scores, axis=-1)
    p_attn = dropout(p_attn, rng, dropout_p)
    x = jnp.einsum("bhqk,bhkd->bhqd", p_attn, v)
    x = x.transpose(0, 2, 1, 3).reshape(B, Tq, D)
    return linear(params["linears"][3], x)


def encoder_layer_init(key, d_model: int, d_ff: int):
    k_attn, k_ff1, k_ff2 = jax.random.split(key, 3)
    return {
        "self_attn": mha_init(k_attn, d_model),
        "feed_forward": {
            "w_1": linear_init(k_ff1, d_model, d_ff),
            "w_2": linear_init(k_ff2, d_ff, d_model),
        },
        "sublayer": [{"norm": norm_init(d_model)}, {"norm": norm_init(d_model)}],
    }


def encoder_init(key, d_model: int, d_ff: int, n_layers: int):
    """N identical layers (reference clones() semantics) + final norm."""
    layer = encoder_layer_init(key, d_model, d_ff)
    # deep-copy buffers per layer (identical values, distinct arrays — shared
    # buffers would break jit argument donation)
    return {
        "layers": [jax.tree_util.tree_map(lambda x: x.copy(), layer)
                   for _ in range(n_layers)],
        "norm": norm_init(d_model),
    }


def _encoder_layer(params, x, mask, *, h, rng, dropout_p, mask_mode):
    rngs = jax.random.split(rng, 4) if rng is not None else [None] * 4
    # sublayer 0: self-attention
    normed = torch_layer_norm(params["sublayer"][0]["norm"], x)
    attn_out = multi_head_attention(
        params["self_attn"], normed, normed, normed, mask,
        h=h, rng=rngs[0], dropout_p=dropout_p, mask_mode=mask_mode)
    x = x + dropout(attn_out, rngs[1], dropout_p)
    # sublayer 1: feed-forward (Linear -> ReLU -> Dropout -> Linear)
    normed = torch_layer_norm(params["sublayer"][1]["norm"], x)
    ff = params["feed_forward"]
    hmid = jax.nn.relu(linear(ff["w_1"], normed))
    hmid = dropout(hmid, rngs[2], dropout_p)
    ff_out = linear(ff["w_2"], hmid)
    return x + dropout(ff_out, rngs[3], dropout_p)


def encoder_stack(params, x, mask=None, *, h: int = 8, rng=None,
                  dropout_p: float = 0.1, mask_mode: str = "query"):
    """Full N-layer pre-norm encoder with final norm.  x: [B, T, D]."""
    # Fused whole-stack Pallas kernel (ops/pallas/encoder.py): activations
    # VMEM-resident across all N layers, 1.5x over XLA at SEND scale
    # (dispatch.py table).  Same gating as the flash kernel: clean
    # key_query masking, eval or dropout-free training (its custom_vjp
    # rematerializes this jnp path for the backward).  Tiny-D encoders
    # (MFT's emotient D=16) stay on jnp — d_k<8 underfills lanes.
    from .dispatch import pallas_enabled
    if (mask is not None and mask_mode == "key_query"
            and x.shape[-1] % h == 0 and x.shape[-1] >= 128
            and pallas_enabled("encoder")
            and _fused_fits(params, x, h, rng, dropout_p)):
        if rng is None or dropout_p == 0.0:
            # The opt-in MMTX_ENC_SOFTMAX variants alter the KERNEL
            # forward's softmax, but this trainable path's custom_vjp
            # backward remats the jnp encoder (jax.nn.softmax) — under a
            # non-ref knob a dropout-free TRAINING call would
            # differentiate a different function than it evaluated
            # (all-masked rows: 0 vs uniform).  Eval (rng=None) never
            # takes the backward, so the knob stays usable there; the
            # dropout train kernel below runs _masked_softmax in BOTH
            # directions, so it is unaffected.  (ADVICE r2.)
            if (rng is None
                    or os.environ.get("MMTX_ENC_SOFTMAX", "ref") == "ref"):
                from .pallas.encoder import encoder_stack_fused_trainable
                return encoder_stack_fused_trainable(params, x, mask, h)
            return _encoder_stack_jnp(params, x, mask, h=h, rng=rng,
                                      dropout_p=dropout_p,
                                      mask_mode=mask_mode)
        from .basic import _dropout_impl
        _bf16_force = os.environ.get("MMTX_ENC_TRAIN_BF16")  # A/B override
        _dtype_ok = True if _bf16_force is None else (
            _bf16_force == "1" or x.dtype == jnp.float32)
        if _dropout_impl() in ("hash", "hash4") and _dtype_ok:
            # REAL dropout-training path: Pallas forward with in-kernel
            # fmix32 masks + per-layer fused Pallas backward (no remat) —
            # same mask bits as this module's jnp path, so it is a drop-in
            # for the hash dropout stream.  threefry dropout streams keep
            # the jnp path (their bits are not kernel-regenerable).
            # Dispatches at BOTH dtypes: once the backward stashes the
            # attention probs/keep bits from the recompute (one softmax +
            # mask generation instead of two — that backward is
            # VPU/issue-bound), the kernel wins the measured v5e MFT
            # train-step A/B at fp32 AND bf16/mixed: mixed kernel 9.51 ms
            # vs jnp 9.88; fp32 kernel 9.81 (examples/bench_train.py, MFN
            # train kernels ON, same session; MMTX_ENC_TRAIN_BF16=0
            # restores the old fp32-only gate for A/B).
            from .basic import _ablate_dropout
            from .pallas.encoder import (dropout_seed_table,
                                         encoder_stack_fused_train)
            seeds = dropout_seed_table(rng, len(params["layers"]))
            # MMTX_ABLATE_DROPOUT: same kernels, p=0 (measurement only)
            p_eff = 0.0 if _ablate_dropout() else dropout_p
            y = encoder_stack_fused_train(params["layers"], x, mask, h,
                                          p_eff, seeds)
            return torch_layer_norm(params["norm"], y.astype(x.dtype))
    return _encoder_stack_jnp(params, x, mask, h=h, rng=rng,
                              dropout_p=dropout_p, mask_mode=mask_mode)


def _fused_fits(params, x, h, rng, dropout_p) -> bool:
    """Shape gate for the fused encoder kernels: the [h*T, T] attention
    working set they keep whole in VMEM is quadratic in T, so beyond the
    fit boundary (measured on v5e at MFT dims: eval T<=512, dropout-train
    T<=256 — the backward's prob/keep stashes go first; calibration map in
    ops/pallas/encoder.py) dispatch DECLINES onto the jnp path — which
    handles any T (reference analog: torch's dynamic shapes at reference
    MFT/multiTransformer.py:27-31) — instead of Mosaic-failing on VMEM
    overflow."""
    from .pallas.encoder import fused_encoder_fits
    B, T0, D = x.shape
    F = params["layers"][0]["feed_forward"]["w_1"]["weight"].shape[0]
    training = rng is not None and dropout_p > 0.0
    return fused_encoder_fits(B, T0, D, F, jnp.dtype(x.dtype).itemsize, h,
                              training=training)


def _encoder_stack_jnp(params, x, mask, *, h, rng, dropout_p, mask_mode):
    n = len(params["layers"])
    rngs = jax.random.split(rng, n) if rng is not None else [None] * n
    for layer_params, layer_rng in zip(params["layers"], rngs):
        x = _encoder_layer(layer_params, x, mask, h=h, rng=layer_rng,
                           dropout_p=dropout_p, mask_mode=mask_mode)
    return torch_layer_norm(params["norm"], x)


# -------------------------------------------------- batched multi-encoder
# M structurally-identical encoders (same D/d_ff/layers, independent
# weights) evaluated as ONE stack of M-x-larger matmuls.  Hypothesis: MFT's
# three per-modality 6-layer encoders underfill the MXU, so stacking the
# modality axis into every einsum should win.  MEASURED VERDICT (v5e, B=32,
# T=160, bf16, stable slope timing): NEUTRAL — 1.845 ms batched vs 1.847 ms
# sequential, and slower at B=128.  XLA already interleaves the independent
# branches, and the stage sits at ~73% of the HBM roofline (score
# materialization + norms dominate traffic), so bigger matmul issues buy
# nothing.  Kept as a tested, documented alternative for hardware where
# dispatch cost dominates; NOT dispatched by the families.  Same math, same
# quirky norm; inference-only (no dropout).


def _bnorm(params, x, eps: float = 1e-6):
    """torch_layer_norm with [M, D] params against [M, B, T, D] x."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    d = x - mean
    n = x.shape[-1]
    var = jnp.sum(d * d, axis=-1, keepdims=True) / (n - 1)
    std = jnp.sqrt(var)
    return (params["a_2"][:, None, None, :] * d / (std + eps)
            + params["b_2"][:, None, None, :])


def _blinear(p, x):
    """x: [M, B, T, in]; weight: [M, out, in] (torch layout); bias [M, out]."""
    return (jnp.einsum("mbti,moi->mbto", x, p["weight"])
            + p["bias"][:, None, None, :])


def _bmha(p, x, mask, *, h: int, mask_mode: str):
    M, B, T, D = x.shape
    d_k = D // h

    def proj(lp, v):
        return _blinear(lp, v).reshape(M, B, T, h, d_k).transpose(
            0, 1, 3, 2, 4)

    q = proj(p["linears"][0], x)        # [M, B, h, T, d_k]
    k = proj(p["linears"][1], x)
    v = proj(p["linears"][2], x)
    scores = jnp.einsum("mbhqd,mbhkd->mbhqk", q, k) / jnp.sqrt(
        jnp.asarray(d_k, dtype=x.dtype))
    if mask is not None:
        qmask = mask[None, :, None, :, 0:1]        # [1, B, 1, Tq, 1]
        scores = jnp.where(qmask == 0, NEG_INF, scores)
        if mask_mode == "key_query":
            kmask = mask[..., 0][None, :, None, None, :]
            scores = jnp.where(kmask == 0, NEG_INF, scores)
    p_attn = jax.nn.softmax(scores, axis=-1)
    xo = jnp.einsum("mbhqk,mbhkd->mbhqd", p_attn, v).transpose(
        0, 1, 3, 2, 4).reshape(M, B, T, D)
    return _blinear(p["linears"][3], xo)


def encoder_stack_batched(params_list, x, mask=None, *, h: int = 8,
                          mask_mode: str = "query"):
    """Evaluate M same-shaped encoder stacks in one batched pass.

    params_list: M encoder param trees (as built by encoder_init);
    x: [M, B, T, D].  Returns [M, B, T, D].  Inference only (no dropout)."""
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                     *list(params_list))
    for lp in stacked["layers"]:
        normed = _bnorm(lp["sublayer"][0]["norm"], x)
        x = x + _bmha(lp["self_attn"], normed, mask, h=h,
                      mask_mode=mask_mode)
        normed = _bnorm(lp["sublayer"][1]["norm"], x)
        ff = lp["feed_forward"]
        x = x + _blinear(ff["w_2"],
                         jax.nn.relu(_blinear(ff["w_1"], normed)))
    return _bnorm(stacked["norm"], x)
