"""Robustness checks: dropout statistics, windowing fuzz vs the pure-Python
reference loop, degenerate shapes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_transformer_tpu.ops.basic import dropout
from multimodal_transformer_tpu.ops.recurrent import pad_shift
from multimodal_transformer_tpu.data.windowing import (window_channel,
                                                       window_ratings)


def test_dropout_inverted_scaling_preserves_mean():
    """Train-mode dropout must be inverted (E[out] == in), matching torch."""
    x = jnp.ones((200, 200))
    out = dropout(x, jax.random.PRNGKey(0), 0.3)
    kept = np.asarray(out)
    # kept values scaled by 1/(1-p)
    nz = kept[kept != 0]
    np.testing.assert_allclose(nz, 1.0 / 0.7, rtol=1e-6)
    assert abs(kept.mean() - 1.0) < 0.02
    # eval mode: identity
    np.testing.assert_array_equal(np.asarray(dropout(x, None, 0.3)),
                                  np.asarray(x))


def _python_reference_windows(feats, times, window_size, oversample):
    """The reference loop, transcribed from SURVEY.md semantics, used as the
    fuzz oracle for both the numpy and native implementations."""
    wins, cur, start, i = [], 0.0, 0, 0
    n = len(times)
    while i < n:
        if times[i] <= cur + window_size:
            i += 1
        else:
            w = feats[start:i]
            for _ in range(oversample):
                wins.append(w)
            start = i
            cur += window_size
    return wins


@pytest.mark.parametrize("seed", range(8))
def test_windowing_fuzz_matches_reference_loop(seed):
    rs = np.random.RandomState(seed)
    n = rs.randint(1, 300)
    # irregular, sometimes bursty timestamps with occasional big gaps
    dts = rs.exponential(0.4, n)
    dts[rs.rand(n) < 0.05] += rs.exponential(5.0)
    times = np.cumsum(dts)
    feats = rs.randn(n, 3).astype(np.float32)
    ws = float(rs.choice([0.5, 1.0, 2.0, 5.0]))
    oversample = int(rs.choice([1, 2, 5]))
    got = window_channel(feats, times, ws, oversample)
    want = _python_reference_windows(feats, times, ws, oversample)
    assert len(got) == len(want), (n, ws, oversample)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)


def test_window_ratings_empty_input():
    assert window_ratings(np.zeros(0), np.zeros(0), 1.0) == []


def test_pad_shift_degenerate_shift():
    x = jnp.ones((2, 3, 4))
    np.testing.assert_array_equal(np.asarray(pad_shift(x, 3)),
                                  np.zeros((2, 3, 4)))
    np.testing.assert_array_equal(np.asarray(pad_shift(x, 5)),
                                  np.zeros((2, 3, 4)))
    np.testing.assert_array_equal(np.asarray(pad_shift(x, 0)), np.asarray(x))
