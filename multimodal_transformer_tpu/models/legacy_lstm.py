"""Legacy LSTM model variants from the reference inventory (SURVEY.md §2.4
"unused legacy" row): instantiable in every reference copy, reached only by
B1's MultiLSTM and the models.py __main__ smoke test, but part of the public
surface — so implemented and tested here.

  * MultiLSTM (non-B1 flavor)  — covered by models/heads.py multi_lstm with
    cfg.variant="legacy" (embed 128 / h 256 / Dropout(0.1)).
  * MultiEDLSTM (reference MFT/models.py:222-308) — encoder-decoder LSTM:
    embed -> time-softmax local attention -> encoder LSTM(128->512) ->
    attention-convolve -> stepwise decoder LSTM over [p_prev; context_t] ->
    MLP -> valence; learned enc/dec initial states.
  * MultiARLSTM (reference MFT/models.py:310-400) — autoregressive head:
    LSTM features give a per-step in_part and AR weights; training uses
    teacher forcing over the shifted target, eval runs the AR recurrence on
    its own (detached) predictions.

All stepwise loops are lax.scan with the non-recurrent input-projection half
hoisted; the time-axis softmax quirk (nn.Softmax(dim=1) on [B,T,K]) is
preserved.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.basic import dropout, linear
from ..ops.recurrent import convolve_local_attn, lstm_scan, pad_shift
from ..utils.torch_init import linear_init, lstm_init
from .heads import time_softmax_attn_weights as _attn_weights


# ------------------------------------------------------------- MultiEDLSTM

def multi_ed_lstm_init(key, window_embed_size: int, embed_dim: int = 128,
                       h_dim: int = 512, attn_len: int = 3):
    k_e, k_a1, k_a2, k_enc, k_dec, k_o1, k_o2 = jax.random.split(key, 7)
    return {
        "embed": linear_init(k_e, window_embed_size, embed_dim),
        "attn_fc1": linear_init(k_a1, embed_dim, embed_dim),
        "attn_fc2": linear_init(k_a2, embed_dim, attn_len),
        "encoder": lstm_init(k_enc, embed_dim, h_dim),
        "enc_h0": jnp.zeros((1, h_dim)),
        "enc_c0": jnp.zeros((1, h_dim)),
        "decoder": lstm_init(k_dec, 1 + h_dim, h_dim),
        "dec_h0": jnp.zeros((1, h_dim)),
        "dec_c0": jnp.zeros((1, h_dim)),
        "out_fc1": linear_init(k_o1, h_dim, embed_dim),
        "out_fc2": linear_init(k_o2, embed_dim, 1),
    }


def multi_ed_lstm_apply(params, x, mask, *, rng=None, tgt_init: float = 0.0,
                        embed_dropout: float = 0.1):
    """x: [B, T, window_embed]; returns [B, T, 1]
    (reference MFT/models.py:268-308)."""
    B, T, _ = x.shape
    h_dim = params["encoder"]["weight_hh"].shape[1]
    r = jax.random.split(rng, 1)[0] if rng is not None else None
    e = dropout(x, r, embed_dropout)
    e = jax.nn.relu(linear(params["embed"], e))
    attn = _attn_weights(params, e)
    h0 = jnp.broadcast_to(params["enc_h0"], (B, h_dim)).astype(x.dtype)
    c0 = jnp.broadcast_to(params["enc_c0"], (B, h_dim)).astype(x.dtype)
    enc_out, _ = lstm_scan(params["encoder"], e, h0, c0)
    context = convolve_local_attn(enc_out, attn)  # [B, T, h]

    p_dec = params["decoder"]
    w_ih = p_dec["weight_ih"]                    # [4H, 1+H]
    w_p, w_ctx = w_ih[:, :1], w_ih[:, 1:]
    ctx_proj = (jnp.einsum("bth,gh->btg", context, w_ctx)
                + p_dec["bias_ih"] + p_dec["bias_hh"]).transpose(1, 0, 2)

    dh0 = jnp.broadcast_to(params["dec_h0"], (B, h_dim)).astype(x.dtype)
    dc0 = jnp.broadcast_to(params["dec_c0"], (B, h_dim)).astype(x.dtype)
    p0 = jnp.full((B, 1), tgt_init, x.dtype)
    H = h_dim

    def body(carry, cp):
        p, h, c = carry
        z = cp + p @ w_p.T + h @ p_dec["weight_hh"].T
        i = jax.nn.sigmoid(z[:, :H])
        f = jax.nn.sigmoid(z[:, H:2 * H])
        g = jnp.tanh(z[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(z[:, 3 * H:])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        p = linear(params["out_fc2"],
                   jax.nn.relu(linear(params["out_fc1"], h)))
        return (p, h, c), p

    _, preds = jax.lax.scan(body, (p0, dh0, dc0), ctx_proj)
    return preds.transpose(1, 0, 2) * mask


# ------------------------------------------------------------- MultiARLSTM

def multi_ar_lstm_init(key, window_embed_size: int, embed_dim: int = 128,
                       h_dim: int = 512, attn_len: int = 7,
                       ar_order: int = 1):
    k_e, k_a1, k_a2, k_l, k_d1, k_d2, k_ar = jax.random.split(key, 7)
    return {
        "embed": linear_init(k_e, window_embed_size, embed_dim),
        "attn_fc1": linear_init(k_a1, embed_dim, embed_dim),
        "attn_fc2": linear_init(k_a2, embed_dim, attn_len),
        "lstm": lstm_init(k_l, embed_dim, h_dim),
        "decoder_fc1": linear_init(k_d1, h_dim, embed_dim),
        "decoder_fc2": linear_init(k_d2, embed_dim, 1),
        "autoreg": linear_init(k_ar, h_dim, ar_order),
    }


def multi_ar_lstm_apply(params, x, mask, *, rng=None, target=None,
                        tgt_init: float = 0.0, ar_order: int = 1,
                        embed_dropout: float = 0.1):
    """x: [B, T, window_embed]; target [B, T, 1] enables teacher forcing
    (reference MFT/models.py:354-400)."""
    B, T, _ = x.shape
    r = jax.random.split(rng, 1)[0] if rng is not None else None
    e = dropout(x, r, embed_dropout)
    e = jax.nn.relu(linear(params["embed"], e))
    attn = _attn_weights(params, e)
    h, _ = lstm_scan(params["lstm"], e)
    context = convolve_local_attn(h, attn)
    in_part = linear(params["decoder_fc2"],
                     jax.nn.relu(linear(params["decoder_fc1"], context)))
    ar_weight = linear(params["autoreg"], context)  # [B, T, ar_order]

    if target is not None:
        # teacher forcing over shifted targets
        ar_stacked = jnp.stack([pad_shift(target, i)
                                for i in range(ar_order)], axis=-1)
        ar_part = jnp.sum(ar_weight[:, :, None, :] * ar_stacked, axis=-1)
        predicted = in_part + ar_part
    else:
        # autoregress on own (stop-gradient) predictions; carry = rolling
        # window of the last ar_order predictions, most recent last
        hist0 = jnp.full((B, ar_order), tgt_init, x.dtype)

        def body(hist, xs):
            w_t, in_t = xs           # [B, ar_order], [B, 1]
            ar_part = jnp.sum(w_t * jax.lax.stop_gradient(hist), axis=1,
                              keepdims=True)
            p = in_t + ar_part
            hist = jnp.concatenate([hist[:, 1:], p], axis=1)
            return hist, p

        _, preds = jax.lax.scan(
            body, hist0,
            (ar_weight.transpose(1, 0, 2), in_part.transpose(1, 0, 2)))
        predicted = preds.transpose(1, 0, 2)
    return predicted * mask
