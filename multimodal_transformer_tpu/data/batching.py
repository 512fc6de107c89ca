"""Batching: reference-faithful chunked batches + TPU bucketed batches.

`make_batches` replicates the reference batcher semantics
(reference MFT/train.py:52-108 `chunks`/`generateInputChunkHelper`/
`generateTrainBatch`): shuffle indices (train only), chunk into batch_size
(train default 25, eval 1 — train.py:74,169,218), sort each chunk by length
descending (stable), truncate the time dim to the chunk max, and build a
[B, T, 1] float mask.  With the reference's query-row attention mask, outputs
depend on the padded length, so parity evaluation must use these exact shapes.

`bucketed_eval_batches` is the TPU-throughput path: videos are grouped into a
small set of (T, F) shape buckets (powers-of-two-ish) so XLA compiles a
handful of programs instead of one per video; correctness under padding
requires the models' "key_query" mask mode (padding-invariant — see
ops/attention.py).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np


@dataclasses.dataclass
class Batch:
    data: Dict[str, np.ndarray]   # mod -> [B, T, F, D]
    target: np.ndarray            # [B, T, 1]
    mask: np.ndarray              # [B, T, 1]
    lengths: List[int]            # descending
    indices: Optional[List[int]] = None  # original video indices


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _take_time(a: np.ndarray, idx: List[int], t: int) -> np.ndarray:
    """a[idx] with the time axis sliced or zero-padded to exactly t."""
    out = a[idx][:, :t]
    if out.shape[1] < t:
        pad = [(0, 0)] * out.ndim
        pad[1] = (0, t - out.shape[1])
        out = np.pad(out, pad)
    return out


def make_batches(data: Dict[str, np.ndarray], target: np.ndarray,
                 seq_lens: Sequence[int], batch_size: int = 25,
                 shuffle: bool = False,
                 rng: Optional[np.random.RandomState] = None,
                 pad_time_to: Optional[int] = None) -> Iterator[Batch]:
    """Yield reference-semantics batches.

    data: mod -> [V, W, F, D]; target: [V, W]; seq_lens: per-video window
    counts.  pad_time_to: optionally round the chunk-max time up to a multiple
    (TPU-friendly static shapes; only valid with key-masked attention).
    """
    n = target.shape[0]
    index = list(range(n))
    if shuffle:
        (rng or np.random).shuffle(index)
    for i in range(0, n, batch_size):
        chunk = index[i:i + batch_size]
        lens = [int(seq_lens[j]) for j in chunk]
        # stable sort by length descending (reference itemgetter sort)
        order = sorted(range(len(chunk)), key=lambda k: -lens[k])
        chunk = [chunk[k] for k in order]
        lens = [lens[k] for k in order]
        t_max = max(lens)
        if pad_time_to is not None:
            t_max = _round_up(t_max, pad_time_to)
        batch_data = {m: _take_time(a, chunk, t_max) for m, a in data.items()}
        tgt = _take_time(target, chunk, t_max)[..., None].astype(np.float32)
        # INVARIANT (relied on by the fused Pallas encoder kernels): masks
        # are TRAILING — mask[bi] is 1 for the first `ln` steps then 0.
        # The fused eval kernel skips query-row masking, so padded-query
        # rows carry bounded garbage that is only harmless because (a)
        # padding is trailing and (b) every consumer re-masks outputs /
        # recurrent heads only propagate forward in time.  Every mask this
        # package feeds a model comes from here or bucketed_eval_batches
        # (same loop) — do not construct interior-hole masks.
        mask = np.zeros((len(chunk), t_max, 1), dtype=np.float32)
        for bi, ln in enumerate(lens):
            mask[bi, :ln] = 1.0
        yield Batch(batch_data, tgt, mask, lens, list(chunk))


# -------------------------------------------------------- collate utilities
# numpy ports of the reference's collate helpers (MFT/datasets.py:193-239),
# used there by the datasets/models __main__ smoke tests.

def len_to_mask(lengths: Sequence[int]) -> np.ndarray:
    """[B, T_max, 1] boolean mask (reference len_to_mask)."""
    t_max = max(lengths)
    ar = np.arange(t_max)[None, :] < np.asarray(lengths)[:, None]
    return ar[:, :, None]


def pad_and_merge(sequences: Sequence[np.ndarray],
                  max_len: Optional[int] = None) -> np.ndarray:
    """Zero-pad [T_i, D] sequences into one [B, T_max, D] float32 batch."""
    dims = sequences[0].shape[1]
    lengths = [len(s) for s in sequences]
    if max_len is None:
        max_len = max(lengths)
    out = np.zeros((len(sequences), max_len, dims), np.float32)
    for i, s in enumerate(sequences):
        out[i, :lengths[i]] = s[:max_len]
    return out


def seq_collate_dict(items: List[Dict[str, np.ndarray]]):
    """Collate dict items (with a 'length' key) into padded batch + mask
    (reference seq_collate_dict): sorts by length descending."""
    modalities = [k for k in items[0] if k != "length"]
    items = sorted(items, key=lambda d: d["length"], reverse=True)
    lengths = [d["length"] for d in items]
    batch = {m: pad_and_merge([np.asarray(d[m]) for d in items],
                              max(lengths)) for m in modalities}
    return batch, len_to_mask(lengths), lengths


def bucketed_eval_batches(data: Dict[str, np.ndarray], target: np.ndarray,
                          seq_lens: Sequence[int], batch_size: int = 32,
                          time_multiple: int = 32) -> Iterator[Batch]:
    """Group videos by padded-length bucket, then emit FIXED-SHAPE batches.

    Every batch's time dim is the bucket bound (a multiple of
    `time_multiple`) and its batch dim is exactly `batch_size` — the final
    partial batch of each bucket is padded by cycling its videos with the
    padded rows' target and mask zeroed, so they contribute nothing to loss
    or metrics.  `lengths`/`indices` cover only the real rows.  Total XLA
    programs per model: at most ceil(T_max/time_multiple).
    """
    n = target.shape[0]
    buckets: Dict[int, List[int]] = {}
    for v in range(n):
        b = _round_up(max(int(seq_lens[v]), 1), time_multiple)
        buckets.setdefault(b, []).append(v)
    for bound in sorted(buckets):
        vids = buckets[bound]
        for i in range(0, len(vids), batch_size):
            chunk = vids[i:i + batch_size]
            real = len(chunk)
            lens = [int(seq_lens[j]) for j in chunk]
            padded_chunk = (chunk if real == batch_size
                            else list(np.resize(chunk, batch_size)))
            batch_data = {m: _take_time(a, padded_chunk, bound)
                          for m, a in data.items()}
            tgt = _take_time(target, padded_chunk,
                             bound)[..., None].astype(np.float32)
            tgt[real:] = 0.0
            mask = np.zeros((batch_size, bound, 1), dtype=np.float32)
            for bi, ln in enumerate(lens):
                mask[bi, :ln] = 1.0
            yield Batch(batch_data, tgt, mask, lens, list(chunk))
