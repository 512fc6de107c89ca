"""Prediction plotting (reference MFT/train.py:259-315): top/bottom-4 fit grid
and the 10-panel pred-vs-true eval figure (the source of the reference's two
root PNGs).  Headless-safe: always saves to a file, never plt.show()."""

from __future__ import annotations

from typing import Sequence

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def plot_predictions(actuals: Sequence[Sequence[float]],
                     predictions: Sequence[Sequence[float]],
                     metric: Sequence[float], fig_path: str) -> None:
    """Top-4 and bottom-4 fits by metric, 4x2 grid
    (reference plot_predictions, train.py:259-279)."""
    sel_idx = np.concatenate((np.argsort(metric)[-4:][::-1],
                              np.argsort(metric)[:4]))
    fig, axes = plt.subplots(4, 2, figsize=(8, 10))
    for n, idx in enumerate(sel_idx):
        j, i = divmod(n, 4)
        ax = axes[i, j]
        true, pred = actuals[idx], predictions[idx]
        ax.plot(true, "b-")
        ax.plot(pred, "c-")
        ax.set_xlim(0, len(true))
        ax.set_ylim(-1, 1)
        ax.set_title("Fit = {:0.3f}".format(metric[idx]))
    fig.tight_layout()
    fig.savefig(fig_path)
    plt.close(fig)


def plot_eval(pred_sort: Sequence[Sequence[float]],
              ccc_sort: Sequence[float],
              actual_sort: Sequence[Sequence[float]],
              seq_sort: Sequence[str], fig_path: str,
              window_size: float = 5) -> None:
    """10-panel prediction-vs-truth grid with CCC titles
    (reference plot_eval, train.py:281-315).  Values are rescaled from [0,1]
    to [-1,1] like the reference."""
    fig = plt.figure(figsize=(18, 7))
    fig.subplots_adjust(hspace=0.4, wspace=0.4)
    n = min(10, len(pred_sort))
    for i in range(1, n + 1):
        ax = fig.add_subplot(2, 5, i)
        ccc = ccc_sort[i - 1]
        pred = list(pred_sort[i - 1])
        actual = list(actual_sort[i - 1])
        m = min(len(pred), len(actual))
        pred = [(p - 0.5) * 2.0 for p in pred[:m]]
        actual = [(a - 0.5) * 2.0 for a in actual[:m]]
        t = [k * window_size for k in range(m)]
        ax.plot(t, pred, "-", color="r", linewidth=2.0, label="Prediction")
        ax.plot(t, actual, "-", color="b", linewidth=2.0, label="True")
        ax.legend()
        ax.set_ylabel("valence(0-1)")
        ax.set_xlabel("time(s)")
        ax.set_ylim(-1, 1)
        ax.set_title("ccc=" + str(ccc)[:5] + "-vid=" + seq_sort[i - 1])
    fig.savefig(fig_path)
    plt.close(fig)
