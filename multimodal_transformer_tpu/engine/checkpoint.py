"""Checkpointing with the reference's metadata-dict semantics.

The reference saves {'modalities', 'mod_dimension', 'window_size',
'model': state_dict} via torch.save whenever mean eval CCC improves
(reference MFT/train.py:345-351, 589-592), and eval/perf modes restore config
FROM the checkpoint metadata (Performance-Eval/train.py:548-551).  We keep the
same dict shape; the payload is msgpack (flax.serialization) instead of torch
pickle.  `save_train_state` additionally persists optimizer state + epoch for
resume-from-step — a capability the reference lacks (its --load flag is inert,
SURVEY.md §5).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(modalities, mod_dimension, window_size, params,
                    path: str, extra: Optional[Dict[str, Any]] = None) -> None:
    payload = {
        "modalities": list(modalities),
        "mod_dimension": dict(mod_dimension),
        "window_size": dict(window_size),
        "model": _to_host(params),
    }
    if extra:
        payload["extra"] = extra
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    # atomic: a preemption mid-write must not truncate the previously-saved
    # best checkpoint (same tmp+replace hardening as save_train_state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    payload["modalities"] = list(payload["modalities"])
    return payload


def save_train_state(path: str, *, params, opt_state, epoch: int,
                     scheduler_state: Dict[str, Any],
                     best_ccc: float, modalities, mod_dimension,
                     window_size) -> None:
    """Full resumable training state (params + Adam moments + schedule)."""
    payload = {
        "modalities": list(modalities),
        "mod_dimension": dict(mod_dimension),
        "window_size": dict(window_size),
        "model": _to_host(params),
        "opt_state": _to_host(opt_state),
        "epoch": epoch,
        "scheduler": dict(scheduler_state),
        "best_ccc": float(best_ccc),
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    os.replace(tmp, path)  # atomic: preemption-safe


def load_train_state(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


# ------------------------------------------------------------ orbax backend
# Alternative durable-checkpoint backend (SURVEY.md §5 plan: "orbax
# checkpointing w/ resume-from-step").  Orbax adds atomic directory commits,
# async-friendly saves, and multi-host coordination for pod-slice training;
# the msgpack format above stays the default for single-file portability.

def save_train_state_orbax(path: str, **kwargs) -> None:
    """Same payload as save_train_state, persisted via orbax: the array
    trees (params + optimizer moments) go through StandardCheckpointer
    (atomic directory commit, multi-host aware); the non-array metadata
    rides in a JSON sidecar inside the committed directory."""
    import json

    import orbax.checkpoint as ocp
    arrays = {"model": _to_host(kwargs["params"]),
              "opt_state": _to_host(kwargs["opt_state"])}
    meta = {
        "modalities": list(kwargs["modalities"]),
        "mod_dimension": {k: int(v) for k, v in
                          kwargs["mod_dimension"].items()},
        "window_size": {k: int(v) for k, v in kwargs["window_size"].items()},
        "epoch": int(kwargs["epoch"]),
        "scheduler": {k: float(v) if k != "num_bad" else int(v)
                      for k, v in kwargs["scheduler_state"].items()},
        "best_ccc": float(kwargs["best_ccc"]),
    }
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, arrays, force=True)
    with open(os.path.join(path, "mmtx_meta.json"), "w") as f:
        json.dump(meta, f)


def load_train_state_orbax(path: str) -> Dict[str, Any]:
    import json

    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        arrays = ckptr.restore(path)
    with open(os.path.join(path, "mmtx_meta.json")) as f:
        meta = json.load(f)
    return {**arrays, **meta}
