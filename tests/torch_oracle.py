"""Torch oracle: the reference models' math re-expressed in torch for tests.

These functions take the JAX param pytrees produced by
multimodal_transformer_tpu and run the same computation with torch ops,
following the reference pipelines documented in SURVEY.md §2.2-2.4.  Used by
the model-parity tests to check full forward passes elementwise (eval mode).
"""

import numpy as np
import torch
import torch.nn.functional as F


def _t(x):
    # passthrough for torch tensors/Parameters: lets every oracle below run
    # DIFFERENTIABLY on a torch Parameter tree (training-dynamics parity
    # tests) while still accepting jax/numpy leaves (forward parity tests)
    if isinstance(x, torch.Tensor):
        return x
    return torch.from_numpy(np.asarray(x))


def t_linear(p, x):
    return F.linear(x, _t(p["weight"]), _t(p["bias"]))


def t_norm(p, x, eps=1e-6):
    mean = x.mean(-1, keepdim=True)
    std = x.std(-1, keepdim=True)  # unbiased, like the reference LayerNorm
    return _t(p["a_2"]) * (x - mean) / (std + eps) + _t(p["b_2"])


def t_attention(p, x, mask, h):
    B, T, D = x.shape
    d_k = D // h

    def split_heads(y):
        return y.view(B, -1, h, d_k).transpose(1, 2)

    q = split_heads(t_linear(p["linears"][0], x))
    k = split_heads(t_linear(p["linears"][1], x))
    v = split_heads(t_linear(p["linears"][2], x))
    scores = torch.matmul(q, k.transpose(-2, -1)) / np.sqrt(d_k)
    if mask is not None:
        scores = scores.masked_fill(mask.unsqueeze(1) == 0, -1e9)
    attn = F.softmax(scores, dim=-1)
    out = torch.matmul(attn, v).transpose(1, 2).contiguous().view(B, -1, D)
    return t_linear(p["linears"][3], out)


def t_encoder(p, x, mask, h=8):
    for layer in p["layers"]:
        x = x + t_attention(layer["self_attn"],
                            t_norm(layer["sublayer"][0]["norm"], x), mask, h)
        normed = t_norm(layer["sublayer"][1]["norm"], x)
        ff = layer["feed_forward"]
        x = x + t_linear(ff["w_2"], F.relu(t_linear(ff["w_1"], normed)))
    return t_norm(p["norm"], x)


def t_lstm_cell(p, x, h, c):
    z = (F.linear(x, _t(p["weight_ih"]), _t(p["bias_ih"]))
         + F.linear(h, _t(p["weight_hh"]), _t(p["bias_hh"])))
    H = h.shape[-1]
    i, f, g, o = (torch.sigmoid(z[:, :H]), torch.sigmoid(z[:, H:2 * H]),
                  torch.tanh(z[:, 2 * H:3 * H]), torch.sigmoid(z[:, 3 * H:]))
    c_new = f * c + i * g
    return o * torch.tanh(c_new), c_new


def t_frontend(params, inputs, mods, relu_proj=False):
    """CNN + Highway per modality, eval mode (dropout off).

    inputs: dict mod -> np [B, W, Fr, D].  Returns dict mod -> torch [B, W, E].
    """
    outs = {}
    for mod in mods:
        x = _t(inputs[mod])  # [B, W, Fr, D]
        B, W, Fr, D = x.shape
        conv_p = params[f"cnn_{mod}"]["conv1d"]
        w, b = _t(conv_p["weight"]), _t(conv_p["bias"])
        xc = x.reshape(B * W, Fr, D).permute(0, 2, 1)  # [BW, D, Fr]
        c = F.conv1d(xc, w, b)                          # [BW, E, Fr-1]
        pooled = F.max_pool1d(c, c.shape[2]).squeeze(2)  # [BW, E]
        hw = params[f"highway_{mod}"]
        proj = t_linear(hw["linear_projection"], pooled)
        if relu_proj:
            proj = F.relu(proj)
        gate = torch.sigmoid(t_linear(hw["linear_gate"], pooled))
        out = gate * proj + (1 - gate) * pooled
        outs[mod] = out.reshape(B, W, -1)
    return outs


def t_uni_transformer(p, x, mask, embed_dim=256, embed_is_mlp=False):
    """UniTransformer / NLPTransformer head, eval mode
    (reference MFT/multiTransformer.py:348-376)."""
    if embed_is_mlp:
        e = F.relu(t_linear(p["embed"], x))
    else:
        e = t_linear(p["embed"], x)
    enc = t_encoder(p["encoder"], e, mask)
    B, T, D = enc.shape
    h = _t(p["dec_h0"]).expand(B, embed_dim).contiguous()
    c = _t(p["dec_c0"]).expand(B, embed_dim).contiguous()
    o_prev = torch.zeros(B, embed_dim)
    preds = []
    for t in range(T):
        inp = torch.cat([o_prev, enc[:, t, :]], dim=1)
        h, c = t_lstm_cell(p["decoder"], inp, h, c)
        o_prev = h
        pr = t_linear(p["out_fc2"], F.relu(t_linear(p["out_fc1"], h)))
        preds.append(pr.unsqueeze(1))
    return torch.cat(preds, dim=1) * mask


def t_uni_full_transformer(p, x, mask):
    enc = t_encoder(p["encoder"], t_linear(p["embed"], x), mask)
    return t_linear(p["out_fc2"], F.relu(t_linear(p["out_fc1"], enc))) * mask


def t_multi_lstm(p, x, mask):
    """B1 head, eval mode (reference B1-LSTM/models.py:178-216)."""
    e = F.relu(t_linear(p["embed"], x))
    a = F.softmax(t_linear(p["attn_fc2"], F.relu(t_linear(p["attn_fc1"], e))),
                  dim=1)  # over TIME (reference Softmax(dim=1))
    B, T, _ = e.shape
    H = p["weight_hh"].shape[1] if "weight_hh" in p else p["lstm"]["weight_hh"].shape[1]
    h = torch.zeros(B, H)
    c = torch.zeros(B, H)
    hs = []
    for t in range(T):
        h, c = t_lstm_cell(p["lstm"], e[:, t, :], h, c)
        hs.append(h.unsqueeze(1))
    hst = torch.cat(hs, dim=1)  # [B, T, H]
    K = a.shape[2]

    def tshift(x_, i):
        if i == 0:
            return x_
        if i >= x_.size(1):
            # every element shifted out: all-padding (the reference's
            # pad_shift crashes here — MFT/models.py:10-19 negative slice
            # bound; ops/recurrent.py pad_shift handles it, mirror that)
            return torch.zeros_like(x_)
        padding = torch.zeros(x_.size(0), i, x_.size(2))
        return torch.cat((padding, x_[:, :-i, :]), dim=1)

    stacked = torch.stack([tshift(hst, i) for i in range(K)], dim=-1)
    context = torch.sum(a.unsqueeze(2) * stacked, dim=-1)
    d = F.relu(t_linear(p["decoder_fc1"], context))
    return t_linear(p["decoder_fc2"], d) * mask


def t_mfn(p, inputs, mods, hidden_dim, mem_dim):
    """MFN, eval mode, batch-major inputs dict mod -> np [B, T, D]."""
    B, T = inputs[mods[0]].shape[:2]
    h = {m: torch.zeros(B, hidden_dim[m]) for m in mods}
    c = {m: torch.zeros(B, hidden_dim[m]) for m in mods}
    mem = torch.zeros(B, mem_dim)
    all_hs, all_mems = [], []
    for t in range(T):
        prev_cs = torch.cat([c[m] for m in mods], dim=1)
        for m in mods:
            h[m], c[m] = t_lstm_cell(p[f"lstm_{m}"], _t(inputs[m][:, t]),
                                     h[m], c[m])
        new_cs = torch.cat([c[m] for m in mods], dim=1)
        c_star = torch.cat([prev_cs, new_cs], dim=1)
        att = F.softmax(t_linear(p["att1_fc2"],
                                 F.relu(t_linear(p["att1_fc1"], c_star))),
                        dim=1)
        attended = att * c_star
        c_hat = torch.tanh(t_linear(p["att2_fc2"],
                                    F.relu(t_linear(p["att2_fc1"], attended))))
        both = torch.cat([attended, mem], dim=1)
        g1 = torch.sigmoid(t_linear(p["gamma1_fc2"],
                                    F.relu(t_linear(p["gamma1_fc1"], both))))
        g2 = torch.sigmoid(t_linear(p["gamma2_fc2"],
                                    F.relu(t_linear(p["gamma2_fc1"], both))))
        mem = g1 * mem + g2 * c_hat
        all_hs.append(torch.cat([h[m] for m in mods], dim=1))
        all_mems.append(mem)
    outs = []
    for t in range(T):
        feats = torch.cat([all_hs[t], all_mems[t]], dim=1)
        outs.append(t_linear(p["out_fc2"],
                             F.relu(t_linear(p["out_fc1"], feats))).unsqueeze(1))
    return torch.cat(outs, dim=1)


def t_family_forward(params, family, mods, inputs, mask):
    """Full family forward (eval-mode math, reference pipelines SURVEY §2.4).

    Differentiable when `params` is a tree of torch Parameters (training-
    dynamics parity); also accepts jax/numpy-leaf trees (forward parity).
    inputs: dict mod -> np [B, W, F, D]; mask: torch [B, T, 1]."""
    mods = tuple(mods)
    if family == "B1-LSTM":
        fronts = t_frontend(params, inputs, mods, relu_proj=True)
        fused = torch.cat([fronts[m] for m in mods], dim=2)
        return t_multi_lstm(params["LSTM"], fused, mask)
    fronts = t_frontend(params, inputs, mods)
    if family == "B2-Trans":
        fused = torch.cat([fronts[m] for m in mods], dim=2)
        return t_uni_full_transformer(params["Transformer"], fused, mask)
    if family == "SFT":
        if len(mods) == 1:
            return t_uni_transformer(params["Transformer"], fronts[mods[0]],
                                     mask)
        fused = torch.cat([fronts[m] for m in mods], dim=2)
        fused = torch.tanh(t_linear(params["fusionLayer"], fused))
        return t_uni_transformer(params["Transformer"], fused, mask,
                                 embed_is_mlp=True)
    if family not in ("MFT", "B3-MFN"):
        raise ValueError(family)
    if len(mods) == 1:
        return t_uni_transformer(params["Transformer"], fronts[mods[0]],
                                 mask)
    from multimodal_transformer_tpu.ops.mfn_core import HIDDEN_DIM, MEM_DIM
    head = params["Transformer"]
    mfn_in = {}
    for m in mods:
        e = t_linear(head[f"embed_{m}"], fronts[m])
        if family == "MFT":
            e = t_encoder(head[f"transformer_{m}"], e, mask)
        mfn_in[m] = e
    return t_mfn(head["mfn"], mfn_in, mods, HIDDEN_DIM, MEM_DIM) * mask
