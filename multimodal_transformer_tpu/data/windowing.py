"""Wall-clock windowing + static-shape padding pipeline.

Replicates the reference L1 pipeline semantics exactly
(reference MFT/train.py:371-514):

  window_channel   (videoInputHelper, train.py:371-406): NaN -> 0 scrub; group
                   frames into windows of `window_size[channel]` seconds by
                   timestamp; each completed window is emitted
                   `oversample = window_size[channel] // window_size['ratings']`
                   times so slow channels align with the rating cadence; empty
                   windows are emitted as empty; the trailing partial window is
                   DROPPED (the reference's while-loop never flushes it).
  window_ratings   (ratingInputHelper, train.py:408-427): mean rating per
                   rating-window; trailing partial window dropped likewise.
  construct_input  (train.py:432-454): per video, truncate every channel and
                   the ratings to the common minimum window count.
  pad_input        (padInputHelper/padInput, train.py:456-502): zero-pad every
                   window to the corpus-max frames-per-window and every video
                   to the corpus-max window count -> dense [V, W, F, D] float32.
  pad_rating       (train.py:507-514): zero-pad targets to [V, W].

The output arrays are the static-shaped device feed; per-batch time
truncation/bucketing happens in batching.py.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from .send import SendDataset


def window_channel(features: np.ndarray, times: np.ndarray,
                   window_size: float, oversample: int) -> List[np.ndarray]:
    """Group per-frame features [T, D] into wall-clock windows.

    Returns a list of [n_frames_w, D] arrays (possibly 0-row for empty
    windows), each completed window replicated `oversample` times.  Matches
    videoInputHelper including its trailing-window drop.
    """
    feats = np.nan_to_num(np.asarray(features, dtype=np.float32), nan=0.0,
                          posinf=np.inf, neginf=-np.inf)
    times = np.asarray(times, dtype=np.float64).reshape(-1)
    n = len(feats)

    # native fast path: O(T) C++ assignment (native/fastload.cpp)
    from . import native_loader
    assign = native_loader.window_assign(times, window_size)
    if assign is not None:
        starts, counts = assign
        windows: List[np.ndarray] = []
        for s, c in zip(starts, counts):
            w = feats[s:s + c]
            for _ in range(oversample):
                windows.append(w)
        return windows

    windows = []
    current_time = 0.0
    start = 0
    i = 0
    while i < n:
        if times[i] <= current_time + window_size:
            i += 1
        else:
            w = feats[start:i]
            for _ in range(oversample):
                windows.append(w)
            start = i
            current_time += window_size
    return windows


def window_ratings(ratings: np.ndarray, times: np.ndarray,
                   window_size: float) -> List[float]:
    """Mean rating per window (ratingInputHelper); trailing partial dropped."""
    r = np.asarray(ratings, dtype=np.float64).reshape(-1)
    times = np.asarray(times, dtype=np.float64).reshape(-1)
    out: List[float] = []
    current_time = 0.0
    start = 0
    i = 0
    n = len(r)
    while i < n:
        if times[i] <= current_time + window_size:
            i += 1
        else:
            if i == start:
                # the reference crashes here with a bare ZeroDivisionError
                # (sum/len of an empty window); fail loudly but informatively
                raise ValueError(
                    f"empty rating window at t={current_time:.2f}s "
                    f"(gap in rating timestamps larger than the "
                    f"{window_size}s window)")
            out.append(float(r[start:i].mean()))
            start = i
            current_time += window_size
    return out


def construct_input(dataset: SendDataset, window_size: Dict[str, float],
                    channels: Sequence[str]
                    ) -> Tuple[Dict[str, List[List[np.ndarray]]],
                               List[List[float]]]:
    """Per-video windowing for every channel + ratings, truncated to the
    common minimum window count (constructInput, train.py:432-454)."""
    features: Dict[str, List[List[np.ndarray]]] = {c: [] for c in channels}
    all_ratings: List[List[float]] = []
    for v in range(len(dataset)):
        min_len = None
        per_channel = {}
        for c in channels:
            oversample = int(window_size[c] / window_size["ratings"])
            if oversample < 1:
                # the reference silently emits ZERO windows here
                # (int(1/5) == 0 when e.g. acoustic ws=1 < ratings ws=5,
                # B1-LSTM config); fail loudly instead of training on an
                # empty time axis
                raise ValueError(
                    f"channel {c!r} window ({window_size[c]}s) is smaller "
                    f"than the ratings window ({window_size['ratings']}s); "
                    "oversample would be 0 and every video would have zero "
                    "windows")
            wins = window_channel(dataset.data[c][v], dataset.timers[c][v],
                                  window_size[c], oversample)
            per_channel[c] = wins
            if min_len is None or len(wins) < min_len:
                min_len = len(wins)
        ratings = window_ratings(dataset.data["ratings"][v],
                                 dataset.timers["ratings"][v],
                                 window_size["ratings"])
        if len(ratings) < min_len:
            min_len = len(ratings)
        for c in channels:
            features[c].append(per_channel[c][:min_len])
        all_ratings.append(ratings[:min_len])
    return features, all_ratings


def pad_input(features: Dict[str, List[List[np.ndarray]]],
              channels: Sequence[str], dims: Dict[str, int]
              ) -> Tuple[Dict[str, np.ndarray], List[int]]:
    """Dense [V, W_max, F_max, D] per channel + per-video window counts."""
    out: Dict[str, np.ndarray] = {}
    seq_lens: List[int] = []
    for c in channels:
        vids = features[c]
        n_windows = [len(v) for v in vids]
        w_max = max(n_windows)
        f_max = max((len(w) for v in vids for w in v), default=1)
        f_max = max(f_max, 1)
        arr = np.zeros((len(vids), w_max, f_max, dims[c]), dtype=np.float32)
        for vi, vid in enumerate(vids):
            for wi, w in enumerate(vid):
                if len(w):
                    arr[vi, wi, :len(w), :] = w
        out[c] = arr
        seq_lens = n_windows
    return out, seq_lens


def pad_rating(ratings: List[List[float]], max_len: int) -> np.ndarray:
    """[V, max_len] float32 zero-padded targets."""
    out = np.zeros((len(ratings), max_len), dtype=np.float32)
    for i, r in enumerate(ratings):
        out[i, :len(r)] = r
    return out


def window_pipeline(dataset: SendDataset, window_size: Dict[str, float],
                    channels: Sequence[str], dims: Dict[str, int]):
    """Full L1 pipeline: dataset -> (padded dict, targets [V, W], seq_lens)."""
    feats, ratings = construct_input(dataset, window_size, channels)
    padded, seq_lens = pad_input(feats, channels, dims)
    targets = pad_rating(ratings, max(seq_lens))
    return padded, targets, seq_lens
