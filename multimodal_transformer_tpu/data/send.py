"""SENDv1 host-side reader.

Replicates the reference data layer's observable behavior
(reference MFT/datasets.py:11-191 `MultiseqDataset` and :241-297
`load_dataset`): per-modality file discovery by regex with captured
(subject, video) sequence IDs, strict cross-modality ID alignment, pandas
parsing of tsv/csv/ssv/txt feature tables with per-modality column slices, and
auto-added `ratings` + per-modality `*_timer` channels.

Differences by design (TPU-first, not a port):
  * everything is numpy — no torch Dataset machinery; downstream consumers are
    the windowing pipeline and jnp.asarray;
  * timers are always flattened to 1-D float arrays (the reference sometimes
    carries [T,1] lists and compensates at windowing time,
    reference MFT/train.py:396-397);
  * the B1 variant's BERT linguistic features are selected via
    `linguistic_variant="bert"` instead of a forked copy of the file
    (reference B1-LSTM/datasets.py:245-246,271).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from typing import Dict, List, Sequence, Tuple

import numpy as np
import pandas as pd


@dataclass(frozen=True)
class ChannelSpec:
    subdir: str                    # relative to base_dir
    regex: str                     # filename pattern with (subject, video) groups
    fmt: str                       # tsv | csv | ssv | txt
    col_start: str                 # first feature column label (inclusive)
    col_stop: str                  # last feature column label (inclusive)
    scale: float = 1.0             # applied after slicing (ratings / 100)
    timer_col: str = ""            # timestamp column label


# Directory layout, filename regexes, and column slices exactly as wired in the
# reference loader (MFT/datasets.py:244-280).
SCHEMA: Dict[str, ChannelSpec] = {
    "linguistic": ChannelSpec(
        subdir=os.path.join("features", "{subset}", "linguistic-word-level"),
        regex=r"ID(\d+)_vid(\d+)_.*\.tsv", fmt="tsv",
        col_start="glove0", col_stop="glove299", timer_col="time-offset"),
    "linguistic_bert": ChannelSpec(
        subdir=os.path.join("features", "{subset}",
                            "linguistic-word-level-bert"),
        regex=r"ID(\d+)_vid(\d+)_.*\.tsv", fmt="tsv",
        col_start="bert0", col_stop="bert1023", timer_col="time-offset"),
    "emotient": ChannelSpec(
        subdir=os.path.join("features", "{subset}", "emotient"),
        regex=r"ID(\d+)_vid(\d+)_.*\.txt", fmt="txt",
        col_start="AU1", col_stop="AU43", timer_col="Frametime"),
    "image": ChannelSpec(
        subdir=os.path.join("features", "{subset}", "image"),
        regex=r"ID(\d+)_vid(\d+)_.*\.ssv", fmt="ssv",
        col_start="vector0", col_stop="vector999", timer_col="Frametime"),
    "acoustic": ChannelSpec(
        subdir=os.path.join("features", "{subset}", "acoustic-egemaps"),
        regex=r"ID(\d+)_vid(\d+)_.*\.csv", fmt="csv",
        col_start=" F0semitoneFrom27.5Hz_sma3nz_amean",
        col_stop=" equivalentSoundLevel_dBp", timer_col=" frameTime"),
    "ratings": ChannelSpec(
        subdir=os.path.join("ratings", "{subset}", "observer_EWE"),
        regex=r"results_(\d+)_(\d+)\.csv", fmt="csv",
        col_start="evaluatorWeightedEstimate",
        col_stop="evaluatorWeightedEstimate", scale=1.0 / 100.0,
        timer_col="time"),
}


@dataclass
class SendDataset:
    """Per-video aligned multimodal sequences (host memory, numpy)."""
    modalities: Tuple[str, ...]
    seq_ids: List[Tuple[str, str]]
    data: Dict[str, List[np.ndarray]]      # mod -> per-video [T_i, D] float32
    timers: Dict[str, List[np.ndarray]]    # mod -> per-video [T_i] float64
    lengths: List[int] = field(default_factory=list)

    def __len__(self):
        return len(self.seq_ids)

    def normalize(self) -> "SendDataset":
        """Rescale every modality to [-1, 1] using per-dimension global
        min/max (reference datasets.py:140-154 normalize_)."""
        data = {}
        for m in self.modalities:
            m_max = np.stack([a.max(0) for a in self.data[m]]).max(0)
            m_min = np.stack([a.min(0) for a in self.data[m]]).min(0)
            rng = m_max - m_min
            rng = np.where(rng > 0, rng, 1e-10)
            data[m] = [(a - m_min) / rng * 2 - 1 for a in self.data[m]]
        return SendDataset(self.modalities, list(self.seq_ids), data,
                           {m: list(v) for m, v in self.timers.items()},
                           list(self.lengths))

    def split(self, n: int) -> "SendDataset":
        """Split each sequence into n chunks (reference datasets.py:162-175)."""
        data = {m: [c for a in self.data[m] for c in np.array_split(a, n, 0)]
                for m in self.modalities}
        timers = {m: [c for a in self.timers[m]
                      for c in np.array_split(a, n, 0)]
                  for m in self.timers}
        seq_ids = [i for i in self.seq_ids for _ in range(n)]
        lengths = [len(d) for d in data[self.modalities[0]]]
        return SendDataset(self.modalities, seq_ids, data, timers, lengths)

    @classmethod
    def merge(cls, a: "SendDataset", b: "SendDataset") -> "SendDataset":
        if a.modalities != b.modalities:
            raise ValueError("Modalities need to match.")
        return cls(a.modalities, a.seq_ids + b.seq_ids,
                   {m: a.data[m] + b.data[m] for m in a.modalities},
                   {m: a.timers[m] + b.timers[m] for m in a.timers},
                   a.lengths + b.lengths)


def _read_table(path: str, fmt: str) -> pd.DataFrame:
    if fmt == "tsv":
        return pd.read_csv(path, sep="\t")
    if fmt == "ssv":
        return pd.read_csv(path, sep=r"\s+")
    return pd.read_csv(path)  # csv and txt are comma-separated in SENDv1


def _load_columns(path: str, spec: ChannelSpec, use_native: bool):
    """Returns (features [T, D] float32, timer [T] float64).

    Fast path: the native C++ parser (native/fastload.cpp) with label slicing
    done on its header; falls back to pandas with the reference's df.loc
    label-slice semantics."""
    if use_native:
        from . import native_loader
        parsed = native_loader.parse_table(path, spec.fmt)
        if parsed is not None:
            arr, header = parsed
            idx = {h: i for i, h in enumerate(header)}
            if spec.col_start in idx:
                start = idx[spec.col_start]
                stop = idx.get(spec.col_stop, len(header) - 1)
                feats = arr[:, start:stop + 1].astype(np.float32) * spec.scale
                t = arr[:, idx[spec.timer_col]].astype(np.float64)
                return feats, t
    df = _read_table(path, spec.fmt)
    stop = (spec.col_stop if spec.col_stop in df.columns else df.columns[-1])
    feats = np.asarray(df.loc[:, spec.col_start:stop], dtype=np.float32)
    if feats.ndim == 1:
        feats = feats[:, None]
    feats = feats * spec.scale
    t = np.asarray(df.loc[:, spec.timer_col], dtype=np.float64).reshape(-1)
    return feats, t


def _discover(dir_path: str, regex: str) -> List[Tuple[Tuple[str, str], str]]:
    """Returns sorted [(seq_id, path)] for files matching the regex."""
    out = []
    pat = re.compile(regex)
    for fn in os.listdir(dir_path):
        m = pat.match(fn)
        if m:
            out.append((m.groups(), os.path.join(dir_path, fn)))
    out.sort(key=lambda kv: kv[0])
    return out


def load_send(modalities: Sequence[str], base_dir: str, subset: str,
              linguistic_variant: str = "glove",
              use_native: bool = True) -> SendDataset:
    """Load aligned SENDv1 sequences for the given modalities.

    modalities: subset of {linguistic, emotient, image, acoustic}; `ratings`
    is always added (reference datasets.py:281-282).  Each modality also gets
    a timer array from its own file's timestamp column.
    """
    mods = [m for m in modalities if m != "ratings"] + ["ratings"]
    specs = {}
    for m in mods:
        key = ("linguistic_bert"
               if m == "linguistic" and linguistic_variant == "bert" else m)
        spec = SCHEMA[key]
        specs[m] = spec

    discovered = {}
    for m, spec in specs.items():
        d = os.path.join(base_dir, spec.subdir.format(subset=subset))
        discovered[m] = _discover(d, spec.regex)

    seq_ids = [sid for sid, _ in discovered[mods[0]]]
    for m in mods:
        ids_m = [sid for sid, _ in discovered[m]]
        if len(ids_m) != len(seq_ids):
            raise ValueError(
                f"Number of files ({len(ids_m)}) do not match for {m}.")
        if ids_m != seq_ids:
            raise ValueError(f"Sequence IDs do not match for {m}.")

    data = {m: [] for m in mods}
    timers = {m: [] for m in mods}
    lengths = []
    for i in range(len(seq_ids)):
        seq_len = None
        for m, spec in specs.items():
            path = discovered[m][i][1]
            feats, t = _load_columns(path, spec, use_native)
            data[m].append(feats)
            timers[m].append(t)
            if spec.fmt == "tsv":
                # the reference takes seq length from the tsv modality
                # (datasets.py:92-95)
                seq_len = len(feats)
        if seq_len is None:
            seq_len = len(data[mods[0]][-1])
        lengths.append(seq_len)

    return SendDataset(tuple(mods), seq_ids, data, timers, lengths)


if __name__ == "__main__":
    # Executable smoke test, mirroring the reference's
    # `python datasets.py --dir --subset` (reference MFT/datasets.py:299-326):
    # load the dataset, collate a 10-item batch, print shapes, and scan for
    # cross-modality length mismatches.
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument('--dir', type=str, default="../data",
                        help='data directory')
    parser.add_argument('--subset', type=str, default="Train",
                        help='whether to load Train/Valid/Test data')
    args = parser.parse_args()

    print("Loading data...")
    modalities = ['acoustic', 'linguistic', 'emotient', 'ratings']
    dataset = load_send(modalities, args.dir, args.subset)
    print("Testing batch collation...")
    from .batching import seq_collate_dict
    items = [{m: dataset.data[m][i] for m in dataset.modalities}
             | {"length": dataset.lengths[i]}
             for i in range(min(10, len(dataset)))]
    batch, mask, lengths = seq_collate_dict(items)
    print("Batch shapes:")
    for m, b in batch.items():
        print(m, b.shape)
    print("Sequence lengths: ", lengths)
    print("Checking through data for mismatched sequence lengths...")
    for i in range(len(dataset)):
        print("Subject, Video: ", dataset.seq_ids[i])
        shapes = [dataset.data[m][i].shape for m in modalities]
        print(*shapes)
        n_ratings = len(dataset.data['ratings'][i])
        if not all(len(dataset.data[m][i]) == n_ratings
                   for m in modalities[:-1]):
            print("WARNING: Mismatched sequence lengths.")
