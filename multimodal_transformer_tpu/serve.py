"""Serving API: load a checkpoint, predict valence traces for raw SENDv1-style
inputs at production throughput.

The reference has no serving path at all (eval is research code at bs=1);
this is the framework's deployment surface:

    predictor = ValencePredictor.from_checkpoint("MFT-VAL-88.ckpt", "MFT")
    traces = predictor.predict_dataset(load_send([...], data_dir, "Test"))
    # {"165_2": np.array([...valence per rating window...]), ...}

Implementation: host windowing pipeline -> bucketed static-shape batches
(a handful of compiled programs, padding-invariant key-masked attention) ->
jitted forward (optionally bf16) -> per-video traces cut back to true length.
`warmup(max_windows)` pre-compiles the bucket programs so first-request
latency is flat in production.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from .data.batching import bucketed_eval_batches
from .data.send import SendDataset
from .data.windowing import window_pipeline
from .engine.checkpoint import load_checkpoint
from .engine.csv_io import seq_id_strings
from .models import ModelConfig, build_model, default_config


class ValencePredictor:
    def __init__(self, cfg: ModelConfig, params, *, batch_size: int = 32,
                 time_multiple: int = 32, bf16: bool = True):
        if cfg.mask_mode != "key_query":
            # serving uses bucketed padding; require the padding-invariant
            # mode but keep every other field (custom mod_dimension /
            # window_size from checkpoint metadata included)
            import dataclasses
            cfg = dataclasses.replace(cfg, mask_mode="key_query")
        from .utils.compile_cache import enable_compile_cache
        enable_compile_cache()  # warm-start bucket programs across procs
        self.cfg = cfg
        self.batch_size = batch_size
        self.time_multiple = time_multiple
        self.dtype = jnp.bfloat16 if bf16 else jnp.float32
        _, apply = build_model(cfg)
        self.params = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, self.dtype), params)

        def fwd(params, data, mask):
            pred = apply(params, data, mask, rng=None)
            return pred.astype(jnp.float32)

        self._fwd = jax.jit(fwd)

    # ------------------------------------------------------------ constructors

    @classmethod
    def from_checkpoint(cls, path: str, family: str, **kw) -> "ValencePredictor":
        """Load a .ckpt (native) or .pth (reference torch) checkpoint."""
        if path.endswith(".pth"):
            from .engine.convert import convert_pth
            cfg, params, _ = convert_pth(path, family,
                                         mask_mode="key_query")
        else:
            ck = load_checkpoint(path)
            variant = "default"
            if (family == "B1-LSTM" and "LSTM" in ck["model"]
                    and ck["model"]["LSTM"]["embed"]["weight"].shape[0]
                    == 128):
                variant = "legacy"  # MFT-style MultiLSTM head (no Highway
                #                     ReLU) — same autodetect as convert.py
            cfg = default_config(family, ck["modalities"],
                                 mask_mode="key_query", variant=variant)
            object.__setattr__(cfg, "mod_dimension",
                               {k: int(v) for k, v in
                                ck["mod_dimension"].items()})
            object.__setattr__(cfg, "window_size",
                               {k: int(v) for k, v in
                                ck["window_size"].items()})
            params = ck["model"]
        return cls(cfg, params, **kw)

    # ------------------------------------------------------------- prediction

    def predict_padded(self, data: Dict[str, np.ndarray],
                       seq_lens: Sequence[int]) -> list:
        """data: mod -> [V, W, F, D] windowed arrays.  Returns a list of
        per-video 1-D valence traces (true lengths)."""
        V = next(iter(data.values())).shape[0]
        dummy_target = np.zeros(
            (V, max(int(max(seq_lens)), 1)), np.float32)
        out: list = [None] * V
        for batch in bucketed_eval_batches(data, dummy_target, seq_lens,
                                           batch_size=self.batch_size,
                                           time_multiple=self.time_multiple):
            bd = {m: jnp.asarray(v, self.dtype)
                  for m, v in batch.data.items()}
            bm = jnp.asarray(batch.mask, self.dtype)
            pred = np.asarray(self._fwd(self.params, bd, bm))
            for row, (vi, ln) in enumerate(zip(batch.indices, batch.lengths)):
                out[vi] = pred[row, :ln, 0].copy()
        return out

    def predict_dataset(self, dataset: SendDataset) -> Dict[str, np.ndarray]:
        """Full pipeline from a loaded SendDataset; keys are 'subj_vid'."""
        padded, _, seq_lens = window_pipeline(
            dataset, self.cfg.window_size, self.cfg.modalities,
            self.cfg.mod_dimension)
        traces = self.predict_padded(padded, seq_lens)
        return dict(zip(seq_id_strings(dataset.seq_ids), traces))

    def warmup(self, max_windows: int, frames: Dict[str, int]) -> int:
        """Pre-compile every bucket program up to max_windows.

        frames: frames-per-window (the padded F dim) PER MODALITY — it must
        match what the windowing pipeline will produce for your data (each
        distinct F is a distinct XLA program), e.g. derive it from a windowed
        sample: {m: padded[m].shape[2] for m in mods}.  Returns the number of
        programs compiled."""
        n = 0
        t = self.time_multiple
        for bound in range(t, ((max_windows + t - 1) // t) * t + 1, t):
            data = {m: np.zeros((self.batch_size, bound, frames[m],
                                 self.cfg.mod_dimension[m]), np.float32)
                    for m in self.cfg.modalities}
            self.predict_padded(data, [bound] * self.batch_size)
            n += 1
        return n
