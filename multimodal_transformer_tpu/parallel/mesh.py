"""Device-mesh data parallelism (pjit/GSPMD over ICI).

The reference is strictly single-process single-device (zero parallelism —
SURVEY.md §2/§5); at SEND scale (<10M params) the right TPU scaling axis is
pure data parallelism: parameters replicated, the batch dimension sharded over
a 1-D mesh, XLA inserting the gradient all-reduce over ICI.  Everything goes
through jax.sharding.NamedSharding so the same jitted train step runs on 1
chip, a v5e pod slice, or the 8-virtual-device CPU test mesh unchanged.

Sequence/tensor/pipeline parallelism are intentionally out of scope for this
workload (documented capability decision, SURVEY.md §5): sequences are a few
hundred windows and layers are tiny, so DP saturates ICI long before TP would
pay for its collectives.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              devices=None) -> Mesh:
    """1-D data-parallel mesh over the first n devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """device_put every array with its leading (batch) axis sharded."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def pad_batch_rows(arr: np.ndarray, multiple: int) -> np.ndarray:
    """Zero-pad the batch axis up to a multiple of the mesh size.  Padded rows
    carry an all-zero mask, so they contribute nothing to loss or metrics."""
    b = arr.shape[0]
    rem = (-b) % multiple
    if rem == 0:
        return arr
    pad = [(0, rem)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad)
