"""Flash-style masked attention kernel (key+query masking).

Blockwise softmax attention with running max/denominator so the [Tq, Tk]
score matrix never materializes in HBM (reference computes it densely,
multiTransformer.py:22-34).  Used on the production (mask_mode="key_query")
path; the bit-parity "query" quirk path keeps the dense jnp implementation
(it is only exercised at bs=1 eval where no padding exists).

Layout: q, k, v are [BH, T, dk] (batch*heads flattened into the grid's first
axis); kmask is [BH, T] {0,1}.  Padded queries produce garbage rows that the
caller masks out (matching the model's output masking); padded keys are
excluded exactly via -1e9 logits.

Grid: (BH, Tq/blk_q); the inner Tk loop runs in-kernel over VMEM-resident
K/V blocks with fp32 accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _kernel(q_ref, k_ref, v_ref, kmask_ref, out_ref, *, blk_k: int,
            scale: float):
    # blocks carry a leading singleton (batch*head) dim:
    # q: [1, blk_q, dk]; k, v: [1, Tk, dk]; kmask: [1, Tk]
    blk_q = q_ref.shape[1]
    Tk, dk = k_ref.shape[1], k_ref.shape[2]
    q = q_ref[0] * scale

    m = jnp.full((blk_q, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((blk_q, 1), jnp.float32)
    acc = jnp.zeros((blk_q, dk), jnp.float32)

    n_blocks = Tk // blk_k
    for b in range(n_blocks):
        kb = k_ref[0, b * blk_k:(b + 1) * blk_k, :]
        vb = v_ref[0, b * blk_k:(b + 1) * blk_k, :]
        mb = kmask_ref[0, 0, b * blk_k:(b + 1) * blk_k]
        s = jnp.dot(q, kb.T, preferred_element_type=jnp.float32)
        s = jnp.where(mb[None, :] == 0, NEG_INF, s)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, vb, preferred_element_type=jnp.float32)
        m = m_new
    out_ref[0] = (acc / l).astype(out_ref.dtype)


def flash_attention_masked(q, k, v, kmask, *, blk_q: int = 128,
                           blk_k: int = 128, interpret: bool | None = None):
    """q,k,v: [BH, T, dk]; kmask: [BH, T].  Returns [BH, Tq, dk]."""
    if interpret is None:
        from ..dispatch import interpret_default
        interpret = interpret_default()
    BH, Tq, dk = q.shape
    Tk = k.shape[1]
    kmask = kmask.astype(jnp.float32)  # robust compare dtype in-kernel
    scale = 1.0 / (dk ** 0.5)
    blk_q = min(blk_q, Tq)
    blk_k = min(blk_k, Tk)
    pad_q = (-Tq) % blk_q
    pad_k = (-Tk) % blk_k
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0)))
        kmask = jnp.pad(kmask, ((0, 0), (0, pad_k)))  # pads masked out
    Tq_p, Tk_p = q.shape[1], k.shape[1]
    # TPU block shapes want the 2nd-to-last dim aligned; carry the mask as
    # [BH, 1, Tk] so its block (1, 1, Tk) matches the array dims exactly.
    kmask3 = kmask[:, None, :]

    out = pl.pallas_call(
        functools.partial(_kernel, blk_k=blk_k, scale=scale),
        grid=(BH, Tq_p // blk_q),
        in_specs=[
            pl.BlockSpec((1, blk_q, dk), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tk_p, dk), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tk_p, dk), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Tk_p), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk_q, dk), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, Tq_p, dk), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * Tq_p * Tk_p * dk,
            bytes_accessed=4 * BH * (Tq_p * dk * 2 + Tk_p * dk * 2),
            transcendentals=BH * Tq_p * Tk_p,
        ),
    )(q, k, v, kmask3)
    return out[:, :Tq, :]


# ------------------------------------------------------------- training path
# custom_vjp wrapper (same pattern as window_embed.py): the Pallas kernel
# serves the forward; the backward rematerializes through the dense jnp
# key-masked attention, whose autodiff is exact for every VALID query row.
# Padded query rows differ between the two forwards (kernel: normal
# attention over valid keys; dense reference: also normal — both apply only
# the key mask here), and their cotangents are zeroed by the model's output
# masking anyway.  kmask gets a zero cotangent (it only feeds a comparison).


def _dense_key_masked(q, k, v, kmask):
    dk = q.shape[-1]
    s = jnp.einsum("bqd,bkd->bqk", q, k) / jnp.sqrt(
        jnp.asarray(dk, q.dtype))
    s = jnp.where(kmask[:, None, :] == 0, NEG_INF, s)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v)


@jax.custom_vjp
def flash_attention_trainable(q, k, v, kmask):
    """Differentiable flash attention: Pallas forward, remat jnp backward.

    Same signature/semantics as flash_attention_masked (no attention-prob
    dropout — callers gate dispatch on dropout_p == 0 or rng is None)."""
    return flash_attention_masked(q, k, v, kmask)


def _fa_fwd(q, k, v, kmask):
    return flash_attention_masked(q, k, v, kmask), (q, k, v, kmask)


def _fa_bwd(res, g):
    q, k, v, kmask = res
    _, vjp = jax.vjp(_dense_key_masked, q, k, v, kmask)
    return vjp(g)


flash_attention_trainable.defvjp(_fa_fwd, _fa_bwd)
