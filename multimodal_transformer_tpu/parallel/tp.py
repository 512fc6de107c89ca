"""Tensor-parallel sharding layout (2-D data x model mesh).

The workload itself only needs DP (SURVEY.md §5) — but the framework exposes
the full idiomatic-JAX scaling recipe: annotate weight shardings on a 2-D
mesh and let XLA's SPMD partitioner insert the collectives (all-gather /
reduce-scatter over ICI).  Nothing is hand-communicated.

Layout (Megatron-style, per encoder layer):
  * attention q/k/v projections: output (head) dim sharded over 'model'
    — each shard computes its local heads;
  * attention out projection: input dim sharded (row-parallel) — XLA emits
    the psum;
  * FFN w_1: output (d_ff) dim sharded (column-parallel);
    FFN w_2: input dim sharded (row-parallel);
  * everything else (norms, embeds, heads, MFN) replicated — they are tiny.

Torch-layout weights are [out, in], so "output sharded" = axis 0 sharded.

`tp_param_shardings(params, mesh)` walks any family's param pytree and
returns a matching tree of NamedShardings; `dryrun` jits a forward with the
batch sharded over 'data' and weights over 'model'.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh_2d(n_data: int, n_model: int, devices=None) -> Mesh:
    import numpy as np
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[:n_data * n_model]).reshape(
        n_data, n_model)
    return Mesh(devices, ("data", "model"))


def _is_encoder_layer(path_keys) -> bool:
    return any(k == "layers" for k in path_keys)


def tp_param_shardings(params, mesh: Mesh):
    """Tree of NamedShardings: encoder attention/FFN weights sharded over
    'model', everything else replicated."""
    repl = NamedSharding(mesh, P())

    def spec_for(path, leaf):
        keys = [getattr(p, "key", getattr(p, "idx", None))
                for p in path]
        if "layers" in keys:
            if "self_attn" in keys and "linears" in keys:
                # linears list index: position of the int after "linears"
                li = keys[keys.index("linears") + 1]
                if leaf.ndim == 2:
                    if li in (0, 1, 2):   # q, k, v: shard heads (out dim)
                        return NamedSharding(mesh, P("model", None))
                    return NamedSharding(mesh, P(None, "model"))  # out proj
                if leaf.ndim == 1 and li in (0, 1, 2):
                    return NamedSharding(mesh, P("model"))
                return repl  # out-proj bias: replicated (added post-psum)
            if "feed_forward" in keys:
                if "w_1" in keys:
                    if leaf.ndim == 2:
                        return NamedSharding(mesh, P("model", None))
                    return NamedSharding(mesh, P("model"))
                if "w_2" in keys:
                    if leaf.ndim == 2:
                        return NamedSharding(mesh, P(None, "model"))
                    return repl
        return repl

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params_tp(params, mesh: Mesh):
    shardings = tp_param_shardings(params, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, shardings), shardings
