"""Train/eval engine: jitted steps, epoch loops, per-video CCC evaluation.

Mirrors the reference L4 engine semantics (reference MFT/train.py:110-257):
  * loss    = MSE(sum) over the masked batch, divided by sum(lengths) for the
    gradient step (train.py:135-139);
  * one Adam step per batch, then zero grads (step-then-zero order is
    irrelevant in a functional setting);
  * evaluation at batch_size=1 per video, CCC per video, mean over videos
    (train.py:199-257) — the `parity` path;
  * additionally a TPU-throughput `batched` eval path over bucketed
    static-shape batches with on-device per-video CCC (a capability the
    reference never had; requires mask_mode='key_query' for exactness).

Log-line formats are byte-identical to the reference (they are part of the
observable API — SURVEY.md §5).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.batching import Batch, bucketed_eval_batches, make_batches
from ..models import ModelConfig, build_model
from ..ops.metrics import ccc, ccc_masked, pearson
from .optim import ReduceLROnPlateau, select_adam


class Engine:
    """Owns the jitted step functions for one (family, modalities) config."""

    def __init__(self, cfg: ModelConfig, lr: float = 1e-4,
                 weight_decay: float = 1e-4, seed: int = 1,
                 mesh=None, logger=None, nan_guard: bool = True,
                 eval_dtype=None, train_dtype=None):
        from .guards import NanGuard
        self.cfg = cfg
        self.lr = lr
        self.mesh = mesh
        self.logger = logger
        self.nan_guard = NanGuard() if nan_guard else None
        # Data-parallel layout when a mesh is provided: params/opt replicated,
        # batches sharded on the leading axis (parallel/mesh.py).
        self._repl = self._bsh = None
        if mesh is not None:
            from ..parallel.mesh import batch_sharding, replicated
            self._repl = replicated(mesh)
            self._bsh = batch_sharding(mesh)
        init_fn, apply_fn = build_model(cfg)
        self.apply_fn = apply_fn
        self.params = init_fn(jax.random.PRNGKey(seed))
        # optimizer layout knob (MMTX_FLAT_ADAM, bit-identical params
        # either way — see engine/optim.py select_adam)
        adam_init, adam_update, self._opt_reconcile = select_adam()
        self._adam_update = adam_update
        self.opt_state = adam_init(self.params)
        self.scheduler = ReduceLROnPlateau(lr=lr)
        self._wd = weight_decay
        self._epoch = 0

        # Mixed-precision training (train_dtype=jnp.bfloat16): params/inputs
        # are cast INSIDE the loss, so fwd+bwd matmuls run bf16 on the MXU
        # (fp32 MXU throughput is ~4x lower on v5e) while the fp32 master
        # params + Adam state are untouched — grads flow through the cast
        # and arrive fp32.  Loss/metrics always accumulate in fp32.
        # Reference trains fp32 (torch); this is the documented TPU-native
        # speed knob (train curves differ within bf16 noise).
        self.train_dtype = train_dtype

        def _cast_tree(t):
            return jax.tree_util.tree_map(
                lambda a: a.astype(train_dtype), t)

        def loss_fn(params, data, target, mask, denom, rng):
            if train_dtype is not None:
                params, data = _cast_tree(params), _cast_tree(data)
                mask = mask.astype(train_dtype)
            pred = apply_fn(params, data, mask, rng=rng)
            d = (pred.astype(jnp.float32) - target)
            batch_loss = jnp.sum(d * d)
            return batch_loss / denom, batch_loss

        def train_step(params, opt_state, data, target, mask, denom, lr_now,
                       rng):
            (_, batch_loss), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, data, target, mask, denom, rng)
            params, opt_state = adam_update(params, grads, opt_state, lr_now,
                                            weight_decay=weight_decay)
            return params, opt_state, batch_loss

        if self._repl is not None:
            self.params = jax.device_put(self.params, self._repl)
            self.opt_state = jax.device_put(self.opt_state, self._repl)
            r, b = self._repl, self._bsh
            data_sh = lambda: {m: b for m in cfg.modalities}
            self._train_step = jax.jit(
                train_step, donate_argnums=(0, 1),
                in_shardings=(r, r, data_sh(), b, b, r, r, r),
                out_shardings=(r, r, r))
            self._eval_step = jax.jit(
                lambda p, d, m: apply_fn(p, d, m, rng=None),
                in_shardings=(r, data_sh(), b), out_shardings=b)
        else:
            self._train_step = jax.jit(train_step, donate_argnums=(0, 1))
            self._eval_step = jax.jit(
                lambda p, d, m: apply_fn(p, d, m, rng=None))

        # Optional reduced-precision batched-eval path: params + activations
        # in bf16 (halves HBM traffic; ~2x faster on v5e, |diff| ~1e-3 on
        # valence range), metrics always computed in fp32.
        self.eval_dtype = eval_dtype

        def eval_batched_step(params, data, target, mask):
            if eval_dtype is not None:
                cast = lambda t: jax.tree_util.tree_map(
                    lambda x: x.astype(eval_dtype), t)
                pred = apply_fn(cast(params), cast(data),
                                mask.astype(eval_dtype), rng=None)
                pred = pred.astype(jnp.float32)
            else:
                pred = apply_fn(params, data, mask, rng=None)
            d = pred - target
            loss = jnp.sum(d * d)
            cccs = ccc_masked(target[..., 0], pred[..., 0], mask[..., 0])
            return pred, loss, cccs

        if self._repl is not None:
            r, b = self._repl, self._bsh
            self._eval_batched_step = jax.jit(
                eval_batched_step,
                in_shardings=(r, {m: b for m in cfg.modalities}, b, b),
                out_shardings=(b, r, b))
        else:
            self._eval_batched_step = jax.jit(eval_batched_step)

    # ------------------------------------------------------------------ train

    def _device_batch(self, batch: Batch):
        if self._bsh is not None:
            from ..parallel.mesh import pad_batch_rows
            n = self.mesh.devices.size
            put = lambda a: jax.device_put(pad_batch_rows(np.asarray(a), n),
                                           self._bsh)
            data = {m: put(v) for m, v in batch.data.items()}
            return data, put(batch.target), put(batch.mask)
        data = {m: jnp.asarray(v) for m, v in batch.data.items()}
        return data, jnp.asarray(batch.target), jnp.asarray(batch.mask)

    def train_epoch(self, data: Dict[str, np.ndarray], target: np.ndarray,
                    seq_lens: List[int], *, batch_size: int = 25,
                    rng: Optional[np.random.RandomState] = None,
                    jax_rng: Optional[jax.Array] = None,
                    pad_time_to: Optional[int] = None,
                    prefetch: int = 2) -> float:
        """One epoch over reference-semantics batches.  Returns mean loss per
        timepoint (the reference's epoch loss, train.py:152-154).

        Batches are staged onto the device `prefetch` ahead by a background
        thread (data/prefetch.py), overlapping host padding + H2D transfer
        with device compute."""
        from ..data.prefetch import DevicePrefetcher

        self._epoch += 1
        if jax_rng is None:
            jax_rng = jax.random.PRNGKey(self._epoch)
        loss_sum, data_num, batch_num = 0.0, 0, 0
        batches = make_batches(data, target, seq_lens,
                               batch_size=batch_size, shuffle=True,
                               rng=rng, pad_time_to=pad_time_to)
        for batch, (bd, bt, bm) in DevicePrefetcher(
                batches, self._device_batch, depth=prefetch):
            denom = jnp.asarray(float(sum(batch.lengths)))
            step_rng = jax.random.fold_in(jax_rng, batch_num)
            self.params, self.opt_state, batch_loss = self._train_step(
                self.params, self.opt_state, bd, bt, bm, denom,
                jnp.asarray(self.scheduler.lr, jnp.float32), step_rng)
            loss_sum += float(batch_loss)
            if self.nan_guard:
                self.nan_guard.check(float(batch_loss), self.params)
            data_num += sum(batch.lengths)
            if self.logger:
                self.logger.info('Batch: {:5d}\tLoss: {:2.5f}'.format(
                    batch_num, loss_sum / data_num))
            batch_num += 1
        epoch_loss = loss_sum / max(data_num, 1)
        if self.logger:
            self.logger.info('---')
            self.logger.info('Epoch: {}\tLoss: {:2.5f}'.format(
                self._epoch, epoch_loss))
        return epoch_loss

    # ------------------------------------------------- device-resident train

    def upload_dataset(self, data: Dict[str, np.ndarray], target: np.ndarray,
                       seq_lens: List[int]):
        """Stage the full padded training split into HBM once.

        Returns an opaque handle for train_epoch_resident.  SEND-scale splits
        are ~2 GB fp32 — comfortably HBM-resident on v5e; afterwards training
        epochs involve ZERO host->device tensor traffic (only the shuffled
        index vector per batch).  With a mesh, the video axis is sharded over
        'data' (rows padded to the mesh size; pad rows have zero length and
        are never selected by any batch index)."""
        from ..data.batching import len_to_mask

        lengths = np.asarray(seq_lens)
        mask = len_to_mask(seq_lens).astype(np.float32)
        target = target[..., None].astype(np.float32)
        data = dict(data)
        if self._bsh is not None:
            from ..parallel.mesh import pad_batch_rows
            nd = self.mesh.devices.size
            data = {m: pad_batch_rows(np.asarray(v), nd)
                    for m, v in data.items()}
            target = pad_batch_rows(target, nd)
            mask = pad_batch_rows(mask, nd)
            put = lambda a: jax.device_put(a, self._bsh)
        else:
            put = jnp.asarray
        return {
            "data": {m: put(v) for m, v in data.items()},
            "target": put(target),
            "mask": put(mask),
            "lengths": lengths,  # real videos only
        }

    def train_epoch_resident(self, store, *, batch_size: int = 25,
                             rng: Optional[np.random.RandomState] = None,
                             jax_rng: Optional[jax.Array] = None) -> float:
        """One epoch over HBM-resident data: batches are gathered on device
        by index (jnp.take), never re-transferred.

        Note: batches keep the full padded time dim (masks handle validity)
        instead of the reference's per-batch max-length truncation — exact
        for mask_mode='key_query' (padding-invariant); with the reference
        'query' quirk the extra padded keys perturb attention, so parity
        training should use train_epoch instead."""
        if not hasattr(self, "_resident_step"):
            apply_fn = self.apply_fn
            wd = self._wd
            train_dtype = self.train_dtype

            # the reference divides the loss by sum(lengths) before backward;
            # replicated by scaling inside loss_fn.  row_valid zeroes the
            # repeated rows a remainder batch pads with, so they contribute
            # nothing to loss or gradient.
            def step_scaled(params, opt_state, data, target, mask, idx,
                            row_valid, denom, lr_now, rng):
                rv = row_valid[:, None, None]
                bd = {m: jnp.take(v, idx, axis=0) for m, v in data.items()}
                bt = jnp.take(target, idx, axis=0) * rv
                bm = jnp.take(mask, idx, axis=0) * rv

                def loss_fn(p):
                    bdl, bml = bd, bm
                    if train_dtype is not None:  # mixed precision (see init)
                        p = jax.tree_util.tree_map(
                            lambda a: a.astype(train_dtype), p)
                        bdl = {m: v.astype(train_dtype)
                               for m, v in bd.items()}
                        bml = bm.astype(train_dtype)
                    pred = apply_fn(p, bdl, bml, rng=rng)
                    d = pred.astype(jnp.float32) - bt
                    batch_loss = jnp.sum(d * d)
                    return batch_loss / denom, batch_loss

                (_, batch_loss), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                params, opt_state = self._adam_update(
                    params, grads, opt_state, lr_now, weight_decay=wd)
                return params, opt_state, batch_loss

            if self._repl is not None:
                r, b = self._repl, self._bsh
                dsh = {m: b for m in self.cfg.modalities}
                self._resident_step = jax.jit(
                    step_scaled, donate_argnums=(0, 1),
                    in_shardings=(r, r, dsh, b, b, r, r, r, r, r),
                    out_shardings=(r, r, r))
            else:
                self._resident_step = jax.jit(step_scaled,
                                              donate_argnums=(0, 1))

        self._epoch += 1
        if jax_rng is None:
            jax_rng = jax.random.PRNGKey(self._epoch)
        # real videos only: under a mesh, store rows are padded to a multiple
        # of the mesh size, and those pad rows must never enter a batch index
        n = len(store["lengths"])
        index = np.arange(n)
        (rng or np.random).shuffle(index)
        loss_sum, data_num, batch_num = 0.0, 0, 0
        for i in range(0, n, batch_size):
            chunk = index[i:i + batch_size]
            # keep the reference's desc-length batch ordering (also makes
            # dropout draws line up with the host-batched path)
            order = sorted(range(len(chunk)),
                           key=lambda k: -int(store["lengths"][chunk[k]]))
            chunk = chunk[order]
            real = len(chunk)
            if real < batch_size:  # static shapes: pad by cycling rows;
                chunk = np.resize(chunk, batch_size)  # row_valid zeroes them
            row_valid = (np.arange(batch_size) < real).astype(np.float32)
            lens = store["lengths"][chunk][:real]
            denom = jnp.asarray(float(lens.sum()))
            step_rng = jax.random.fold_in(jax_rng, batch_num)
            self.params, self.opt_state, batch_loss = self._resident_step(
                self.params, self.opt_state, store["data"], store["target"],
                store["mask"], jnp.asarray(chunk), jnp.asarray(row_valid),
                denom, jnp.asarray(self.scheduler.lr, jnp.float32), step_rng)
            loss_sum += float(batch_loss)
            if self.nan_guard:
                self.nan_guard.check(float(batch_loss), self.params)
            data_num += int(lens.sum())
            if self.logger:
                self.logger.info('Batch: {:5d}\tLoss: {:2.5f}'.format(
                    batch_num, loss_sum / data_num))
            batch_num += 1
        epoch_loss = loss_sum / max(data_num, 1)
        if self.logger:
            self.logger.info('---')
            self.logger.info('Epoch: {}\tLoss: {:2.5f}'.format(
                self._epoch, epoch_loss))
        return epoch_loss

    # ------------------------------------------------------------------- eval

    def evaluate_per_video(self, data, target, seq_lens, *,
                           shuffle_rng=None
                           ) -> Tuple[List[float], List[List[float]],
                                      List[List[float]], float, Dict,
                                      Tuple]:
        """Reference-exact eval: bs=1 per video, no shuffle, zero padding.
        Returns (cccs, predictions, actuals, loss, stats,
        (best_pred, best_actual, best_index)).

        shuffle_rng (opt-in, np.random.Generator/RandomState): replicate
        the reference MFT evaluate() quirk of visiting videos in a
        SHUFFLED order (MFT/train.py:214-218 calls generateTrainBatch
        without onEval=True).  Mean/std/loss/per-video CCCs are
        order-invariant; only the "best single video" tie-breaking and the
        logged trace order can differ.  The reference's own order is
        unreproducible — its shuffle is the UNSEEDED stdlib
        random.shuffle (MFT/train.py:27,80; main() seeds only torch and
        np.random, :523-526) — so parity on those traces is excluded from
        the contract (PARITY.md); this knob exists to replicate the
        order-visiting *behavior*, not any specific reference stream."""
        cccs, corrs, preds, actuals = [], [], [], []
        loss_sum, data_num = 0.0, 0
        best = (-1.0, None, None, 0)
        index = 0
        for batch in make_batches(data, target, seq_lens, batch_size=1,
                                  shuffle=shuffle_rng is not None,
                                  rng=shuffle_rng):
            bd, bt, bm = self._device_batch(batch)
            out = self._eval_step(self.params, bd, bm)
            nb = len(batch.lengths)  # drop mesh-padding rows, if any
            out = np.asarray(out)[:nb]
            d = out - batch.target
            loss_sum += float((d * d).sum())
            data_num += sum(batch.lengths)
            o = out.reshape(-1)
            t = batch.target.reshape(-1)
            preds.append(o.tolist())
            actuals.append(t.tolist())
            cur = ccc(t, o)
            cccs.append(cur)
            corrs.append(pearson(t, o))
            index += 1
            if cur > best[0]:
                best = (cur, o, t, index)
        loss = loss_sum / max(data_num, 1)
        stats = {"corr": float(np.mean(corrs)),
                 "corr_std": float(np.std(corrs)),
                 "ccc": float(np.mean(cccs)), "ccc_std": float(np.std(cccs)),
                 "max_ccc": best[0]}
        if self.logger:
            self.logger.info(
                'Evaluation\tLoss: {:2.5f}\tCorr: {:0.3f}\tCCC: {:0.9f}'.format(
                    loss, stats['corr'], stats['ccc']))
        return cccs, preds, actuals, loss, stats, (best[1], best[2], best[3])

    def evaluate_batched(self, data, target, seq_lens, *,
                         batch_size: int = 32, time_multiple: int = 32
                         ) -> Tuple[List[float], float, Dict]:
        """TPU-throughput eval over bucketed static shapes.

        Per-video CCC computed on device; a handful of XLA programs total.
        Exact iff cfg.mask_mode == 'key_query' (padding-invariant attention)
        — enforced here: under the reference 'query' quirk, padded keys are
        attended, so bucket padding would silently perturb every metric.
        Use evaluate_per_video for parity evals in 'query' mode.
        """
        if self.cfg.mask_mode != "key_query":
            raise ValueError(
                "evaluate_batched pads the time axis to bucket bounds, "
                "which is only metric-preserving with mask_mode='key_query' "
                f"(got {self.cfg.mask_mode!r}); use evaluate_per_video")
        n_videos = target.shape[0]
        cccs = np.zeros(n_videos)
        loss_sum, data_num = 0.0, 0
        for batch in bucketed_eval_batches(data, target, seq_lens,
                                           batch_size=batch_size,
                                           time_multiple=time_multiple):
            bd, bt, bm = self._device_batch(batch)
            _, loss, c = self._eval_batched_step(self.params, bd, bt, bm)
            loss_sum += float(loss)
            data_num += sum(batch.lengths)
            # buckets reorder videos; place CCCs back by original index
            cccs[batch.indices] = np.asarray(c)[:len(batch.lengths)]
        cccs = cccs.tolist()
        stats = {"ccc": float(np.mean(cccs)), "ccc_std": float(np.std(cccs)),
                 "max_ccc": float(np.max(cccs))}
        return cccs, loss_sum / max(data_num, 1), stats

    def scheduler_step(self, eval_loss: float) -> float:
        return self.scheduler.step(eval_loss)

    # ------------------------------------------------------- resume-from-step

    def save_state(self, path: str, best_ccc: float = -1.0,
                   backend: str = "msgpack") -> None:
        """Persist full training state (params + Adam moments + scheduler +
        epoch) for preemption-safe resume — a capability the reference lacks
        (its --load flag is parsed but inert, SURVEY.md §5).

        backend: "msgpack" (single atomic file, default) or "orbax"
        (atomic directory commit, multi-host aware)."""
        from .checkpoint import save_train_state, save_train_state_orbax
        fn = {"msgpack": save_train_state,
              "orbax": save_train_state_orbax}[backend]
        fn(path, params=self.params, opt_state=self.opt_state,
           epoch=self._epoch,
           scheduler_state={"lr": self.scheduler.lr,
                            "best": self.scheduler.best,
                            "num_bad": self.scheduler.num_bad},
           best_ccc=best_ccc, modalities=self.cfg.modalities,
           mod_dimension=self.cfg.mod_dimension,
           window_size=self.cfg.window_size)

    def restore_state(self, path: str, backend: str = None) -> float:
        """Restore from save_state (either backend; auto-detected from the
        on-disk shape — orbax commits are directories).  Returns the
        recorded best CCC."""
        import os

        from .checkpoint import load_train_state, load_train_state_orbax
        if backend is None:
            backend = "orbax" if os.path.isdir(path) else "msgpack"
        st = {"msgpack": load_train_state,
              "orbax": load_train_state_orbax}[backend](path)
        self.params = st["model"]
        # a checkpoint written under the other MMTX_FLAT_ADAM layout is
        # converted to the active one (bit-identical trajectories)
        self.opt_state = self._opt_reconcile(st["opt_state"], self.params)
        self._epoch = int(st["epoch"])
        sch = st["scheduler"]
        self.scheduler.lr = float(sch["lr"])
        self.scheduler.best = float(sch["best"])
        self.scheduler.num_bad = int(sch["num_bad"])
        return float(st["best_ccc"])
