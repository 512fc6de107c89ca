"""Evaluation metrics: CCC, Pearson r, masked MSE.

CCC formula matches the reference exactly (reference MFT/train.py:42-50):
    ccc = 2*cov(y, yhat; biased) / (var_y + var_yhat + (mean_y - mean_yhat)^2)
with *biased* (population) variance/covariance, as np.var / np.cov(bias=True).

Both numpy (host, exact reference semantics) and jnp (device, batched/masked)
versions are provided.  The masked jnp version lets a whole padded eval batch
compute per-video CCCs in one fused XLA kernel instead of a bs=1 Python loop.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def ccc(y_true, y_pred):
    """Concordance correlation coefficient (host-side, reference-exact)."""
    y_true = np.asarray(y_true, dtype=np.float64)
    y_pred = np.asarray(y_pred, dtype=np.float64)
    true_mean, pred_mean = y_true.mean(), y_pred.mean()
    true_var, pred_var = y_true.var(), y_pred.var()
    covar = ((y_true - true_mean) * (y_pred - pred_mean)).mean()
    return 2 * covar / (true_var + pred_var + (pred_mean - true_mean) ** 2)


def pearson(y_true, y_pred):
    """Pearson correlation (host-side; reference uses scipy.stats.pearsonr)."""
    y_true = np.asarray(y_true, dtype=np.float64)
    y_pred = np.asarray(y_pred, dtype=np.float64)
    yt = y_true - y_true.mean()
    yp = y_pred - y_pred.mean()
    denom = np.sqrt((yt * yt).sum() * (yp * yp).sum())
    return float((yt * yp).sum() / denom)


def ccc_masked(y_true, y_pred, mask):
    """Batched per-sequence CCC on device.

    y_true, y_pred: [B, T]; mask: [B, T] in {0,1}.  Returns [B] CCCs, where
    statistics are computed only over masked-in positions.  Matches the
    reference's per-video eval (bs=1, exact length) when mask covers the valid
    prefix.
    """
    mask = mask.astype(y_true.dtype)
    n = jnp.sum(mask, axis=1)  # [B]
    n_safe = jnp.maximum(n, 1.0)  # all-masked rows yield 0, not NaN
    def _mean(x):
        return jnp.sum(x * mask, axis=1) / n_safe
    mt, mp = _mean(y_true), _mean(y_pred)
    dt = (y_true - mt[:, None]) * mask
    dp = (y_pred - mp[:, None]) * mask
    var_t = jnp.sum(dt * dt, axis=1) / n_safe
    var_p = jnp.sum(dp * dp, axis=1) / n_safe
    covar = jnp.sum(dt * dp, axis=1) / n_safe
    denom = var_t + var_p + (mp - mt) ** 2
    return jnp.where((n > 0) & (denom > 0), 2 * covar
                     / jnp.where(denom > 0, denom, 1.0), 0.0)


def masked_mse_sum(pred, target):
    """Sum-reduced MSE, matching nn.MSELoss(reduction='sum')
    (reference MFT/train.py:536).

    Predictions are already masked to zero at padded positions by every model
    head, and targets are zero-padded, so padding contributes exactly 0 to the
    sum — the same invariant the reference relies on.
    """
    d = pred - target
    return jnp.sum(d * d)
