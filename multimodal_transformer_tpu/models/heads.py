"""Output heads shared across the five families.

  * uni_transformer      — encoder + stepwise LSTM decoder over [o_prev, enc_t]
                           (reference MFT/multiTransformer.py:315-376); used by
                           MFT/SFT/B3 when a single modality is selected.
  * nlp_transformer      — same, but the input embed is Dropout->Linear->ReLU
                           (reference SFT/multiTransformer.py:421-484); the SFT
                           multimodal head.
  * uni_full_transformer — encoder + per-timestep linear header
                           (reference MFT/multiTransformer.py:378-420); the B2
                           head.
  * multi_lstm           — embed + time-softmax local attention + LSTM +
                           attention-convolve + MLP decoder
                           (reference B1-LSTM/models.py:135-216); the B1 head.

All decoders that the reference runs as per-timestep Python loops are
`lax.scan`s here, with the non-recurrent half of each step's input projection
hoisted out of the scan as one batched MXU matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.attention import encoder_init, encoder_stack
from ..ops.basic import dropout, linear
from ..ops.recurrent import convolve_local_attn, lstm_scan
from ..utils.torch_init import linear_init, lstm_init


# ---------------------------------------------------------------- encoder+LSTM

def uni_transformer_init(key, window_embed_size: int, embed_dim: int = 256,
                         h_dim: int = 128, n_enc: int = 6, d_ff: int = 128):
    k_embed, k_enc, k_dec, k_o1, k_o2 = jax.random.split(key, 5)
    return {
        "embed": linear_init(k_embed, window_embed_size, embed_dim),
        "encoder": encoder_init(k_enc, embed_dim, d_ff, n_enc),
        "decoder": lstm_init(k_dec, 2 * embed_dim, embed_dim),
        "dec_h0": jnp.zeros((1, embed_dim)),
        "dec_c0": jnp.zeros((1, embed_dim)),
        "out_fc1": linear_init(k_o1, embed_dim, h_dim),
        "out_fc2": linear_init(k_o2, h_dim, 1),
    }


def _lstm_decoder_scan(params, enc_out, embed_dim: int):
    """Stepwise decoder: i_t = [o_prev; enc_t] -> LSTM -> o (== new h).

    The enc_t half of the LSTM input projection is hoisted out of the scan;
    only the o_prev half and the h-to-h projection stay sequential.
    enc_out: [B, T, D].  Returns o: [B, T, D] (the LSTM hidden states).
    """
    B, T, D = enc_out.shape
    p = params["decoder"]
    w_ih = p["weight_ih"]                  # [4H, 2D]
    w_prev, w_enc = w_ih[:, :D], w_ih[:, D:]
    enc_proj = (jnp.einsum("btd,gd->btg", enc_out, w_enc)
                + p["bias_ih"] + p["bias_hh"]).transpose(1, 0, 2)  # [T, B, 4H]

    h0 = jnp.broadcast_to(params["dec_h0"], (B, embed_dim)).astype(enc_out.dtype)
    c0 = jnp.broadcast_to(params["dec_c0"], (B, embed_dim)).astype(enc_out.dtype)
    o_prev0 = jnp.zeros((B, embed_dim), enc_out.dtype)
    H = embed_dim

    def body(carry, ep):
        o_prev, h, c = carry
        z = ep + o_prev @ w_prev.T + h @ p["weight_hh"].T
        i = jax.nn.sigmoid(z[:, 0 * H:1 * H])
        f = jax.nn.sigmoid(z[:, 1 * H:2 * H])
        g = jnp.tanh(z[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(z[:, 3 * H:4 * H])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, h, c), h

    _, os_ = jax.lax.scan(body, (o_prev0, h0, c0), enc_proj)
    return os_.transpose(1, 0, 2)  # [B, T, D]


def uni_transformer_apply(params, x, mask, *, rng=None, mask_mode="query",
                          embed_dim: int = 256, h: int = 8,
                          dropout_p: float = 0.1, embed_is_mlp: bool = False,
                          embed_dropout: float = 0.1):
    """x: [B, T, window_embed]; mask: [B, T, 1].  Returns [B, T, 1].

    embed_is_mlp selects the NLPTransformer embed variant
    (Dropout -> Linear -> ReLU)."""
    rngs = jax.random.split(rng, 3) if rng is not None else [None] * 3
    if embed_is_mlp:
        e = dropout(x, rngs[0], embed_dropout)
        e = jax.nn.relu(linear(params["embed"], e))
    else:
        e = linear(params["embed"], x)
    enc = encoder_stack(params["encoder"], e, mask, h=h, rng=rngs[1],
                        dropout_p=dropout_p, mask_mode=mask_mode)
    o = _lstm_decoder_scan(params, enc, embed_dim)
    pred = linear(params["out_fc2"], jax.nn.relu(linear(params["out_fc1"], o)))
    return pred * mask


# ------------------------------------------------------------ encoder + linear

def uni_full_transformer_init(key, window_embed_size: int,
                              embed_dim: int = 256, h_dim: int = 128,
                              n_enc: int = 6, d_ff: int = 128):
    k_embed, k_enc, k_o1, k_o2 = jax.random.split(key, 4)
    return {
        "embed": linear_init(k_embed, window_embed_size, embed_dim),
        "encoder": encoder_init(k_enc, embed_dim, d_ff, n_enc),
        "out_fc1": linear_init(k_o1, embed_dim, h_dim),
        "out_fc2": linear_init(k_o2, h_dim, 1),
    }


def uni_full_transformer_apply(params, x, mask, *, rng=None,
                               mask_mode="query", h: int = 8,
                               dropout_p: float = 0.1):
    rngs = jax.random.split(rng, 1) if rng is not None else [None]
    e = linear(params["embed"], x)
    enc = encoder_stack(params["encoder"], e, mask, h=h, rng=rngs[0],
                        dropout_p=dropout_p, mask_mode=mask_mode)
    pred = linear(params["out_fc2"],
                  jax.nn.relu(linear(params["out_fc1"], enc)))
    return pred * mask


# ------------------------------------------------------------------- B1 head

def multi_lstm_init(key, window_embed_size: int, embed_dim: int = 512,
                    h_dim: int = 256, attn_len: int = 5):
    k_e, k_a1, k_a2, k_l, k_d1, k_d2 = jax.random.split(key, 6)
    return {
        "embed": linear_init(k_e, window_embed_size, embed_dim),
        "attn_fc1": linear_init(k_a1, embed_dim, embed_dim),
        "attn_fc2": linear_init(k_a2, embed_dim, attn_len),
        "lstm": lstm_init(k_l, embed_dim, h_dim),
        "decoder_fc1": linear_init(k_d1, h_dim, embed_dim),
        "decoder_fc2": linear_init(k_d2, embed_dim, 1),
    }


def time_softmax_attn_weights(params, e, mask=None):
    """The B1/legacy local-attention weights: Linear -> ReLU -> Linear ->
    softmax over the TIME axis (the reference's nn.Softmax(dim=1) on
    [B, T, attn_len] — B1-LSTM/models.py:161-164; a quirk, not a bug fix).

    mask=None reproduces the reference exactly (padded timesteps participate
    in the time-softmax, so outputs depend on padding length).  With a
    [B, T, 1] mask, padded logits are excluded, making the head
    padding-invariant — required by the bucketed/batched eval and serving
    paths (mask_mode='key_query')."""
    a = jax.nn.relu(linear(params["attn_fc1"], e))
    logits = linear(params["attn_fc2"], a)  # [B, T, K]
    if mask is not None:
        logits = jnp.where(mask == 0, -1e9, logits)
    return jax.nn.softmax(logits, axis=1)  # over time!


def multi_lstm_apply(params, x, mask, *, rng=None, embed_dropout: float = 0.4,
                     decoder_dropout: float = 0.4, mask_mode: str = "query"):
    """B1-LSTM head (reference B1-LSTM/models.py:135-216).

    mask_mode='query' keeps the reference's unmasked time-softmax (parity);
    'key_query' masks padded timesteps out of the softmax so outputs are
    padding-invariant (identical at bs=1 where no padding exists)."""
    rngs = jax.random.split(rng, 2) if rng is not None else [None, None]
    e = dropout(x, rngs[0], embed_dropout)
    e = jax.nn.relu(linear(params["embed"], e))           # [B, T, 512]
    a = time_softmax_attn_weights(
        params, e, mask if mask_mode == "key_query" else None)
    h, _ = lstm_scan(params["lstm"], e)                   # [B, T, 256]
    context = convolve_local_attn(h, a)
    d = jax.nn.relu(linear(params["decoder_fc1"], context))
    d = dropout(d, rngs[1], decoder_dropout)
    pred = linear(params["decoder_fc2"], d)
    return pred * mask
