"""Legacy LSTM variants (MultiEDLSTM / MultiARLSTM) vs torch oracles
(reference MFT/models.py:222-400)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from multimodal_transformer_tpu.models.legacy_lstm import (
    multi_ar_lstm_apply, multi_ar_lstm_init, multi_ed_lstm_apply,
    multi_ed_lstm_init)

import torch_oracle as oracle


def _lin(p, x):
    return oracle.t_linear(p, x)


def _lstm_steps(p, xs, h, c):
    outs = []
    for t in range(xs.shape[1]):
        h, c = oracle.t_lstm_cell(p, xs[:, t], h, c)
        outs.append(h.unsqueeze(1))
    return torch.cat(outs, 1), h, c


def _tshift(x, i):
    if i == 0:
        return x
    pad = torch.zeros(x.size(0), i, x.size(2))
    return torch.cat([pad, x[:, :-i, :]], dim=1)


def _convolve(h, a):
    K = a.shape[2]
    stacked = torch.stack([_tshift(h, i) for i in range(K)], dim=-1)
    return torch.sum(a.unsqueeze(2) * stacked, dim=-1)


def test_multi_ed_lstm_matches_torch():
    D = 20
    p = multi_ed_lstm_init(jax.random.PRNGKey(0), D)
    rs = np.random.RandomState(0)
    B, T = 2, 6
    x = rs.randn(B, T, D).astype(np.float32)
    mask = np.ones((B, T, 1), np.float32)
    mask[1, 4:] = 0
    got = np.asarray(multi_ed_lstm_apply(p, jnp.asarray(x),
                                         jnp.asarray(mask)))

    xt = torch.from_numpy(x)
    e = F.relu(_lin(p["embed"], xt))
    a = F.softmax(_lin(p["attn_fc2"], F.relu(_lin(p["attn_fc1"], e))), dim=1)
    H = 512
    h0 = torch.zeros(B, H)
    enc, _, _ = _lstm_steps(p["encoder"], e, h0.clone(), h0.clone())
    ctx = _convolve(enc, a)
    h, c = torch.zeros(B, H), torch.zeros(B, H)
    pt = torch.zeros(B, 1)
    preds = []
    for t in range(T):
        inp = torch.cat([pt, ctx[:, t]], dim=1)
        h, c = oracle.t_lstm_cell(p["decoder"], inp, h, c)
        pt = _lin(p["out_fc2"], F.relu(_lin(p["out_fc1"], h)))
        preds.append(pt.unsqueeze(1))
    want = (torch.cat(preds, 1) * torch.from_numpy(mask)).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_multi_ar_lstm_teacher_forcing_and_eval():
    D, K = 16, 3
    p = multi_ar_lstm_init(jax.random.PRNGKey(1), D, ar_order=K)
    rs = np.random.RandomState(1)
    B, T = 2, 7
    x = rs.randn(B, T, D).astype(np.float32)
    mask = np.ones((B, T, 1), np.float32)
    target = rs.rand(B, T, 1).astype(np.float32)

    # shared torch feature path
    xt = torch.from_numpy(x)
    e = F.relu(_lin(p["embed"], xt))
    a = F.softmax(_lin(p["attn_fc2"], F.relu(_lin(p["attn_fc1"], e))), dim=1)
    h0 = torch.zeros(B, 512)
    hs, _, _ = _lstm_steps(p["lstm"], e, h0.clone(), h0.clone())
    ctx = _convolve(hs, a)
    in_part = _lin(p["decoder_fc2"], F.relu(_lin(p["decoder_fc1"], ctx)))
    ar_w = _lin(p["autoreg"], ctx)

    # --- teacher forcing
    got_tf = np.asarray(multi_ar_lstm_apply(
        p, jnp.asarray(x), jnp.asarray(mask), target=jnp.asarray(target),
        ar_order=K))
    tt = torch.from_numpy(target)
    stacked = torch.stack([_tshift(tt, i) for i in range(K)], dim=-1)
    want_tf = (in_part + torch.sum(ar_w.unsqueeze(2) * stacked, dim=-1))
    want_tf = (want_tf * torch.from_numpy(mask)).detach().numpy()
    np.testing.assert_allclose(got_tf, want_tf, rtol=2e-3, atol=2e-4)

    # --- autoregressive eval (reference loop, MFT/models.py:388-397)
    got_ar = np.asarray(multi_ar_lstm_apply(
        p, jnp.asarray(x), jnp.asarray(mask), target=None, ar_order=K))
    predicted = [torch.zeros(B, 1)] * K
    for t in range(T):
        hist = torch.cat(predicted[-K:], dim=1)
        ar_part = torch.sum(ar_w[:, t, :] * hist, dim=1)
        pt = in_part[:, t, :] + ar_part.unsqueeze(-1)
        predicted.append(pt)
    want_ar = (torch.cat(predicted[K:], 1).unsqueeze(-1)
               * torch.from_numpy(mask)).detach().numpy()
    np.testing.assert_allclose(got_ar, want_ar, rtol=2e-3, atol=2e-4)
