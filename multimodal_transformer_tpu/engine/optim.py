"""Optimizer: torch-exact Adam with coupled L2 weight decay, and a
ReduceLROnPlateau controller.

The reference trains every family with
    optim.Adam(params, lr=1e-4, weight_decay=1e-4)
    ReduceLROnPlateau(mode='min', patience=100, factor=0.5)
(reference MFT/train.py:557-558; B1 has no scheduler, B1-LSTM/train.py:593).

torch's Adam weight_decay adds wd*p to the *gradient* (coupled L2, not AdamW),
and the denominator is sqrt(v_hat) + eps.  Both replicated exactly.  The
update is a pure jittable function; the learning rate is passed as a traced
scalar so plateau LR drops do NOT retrigger compilation.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def adam_init(params):
    zeros = lambda p: jnp.zeros_like(p)
    return {
        "step": jnp.zeros((), jnp.int32),
        "m": jax.tree_util.tree_map(zeros, params),
        "v": jax.tree_util.tree_map(zeros, params),
    }


def adam_update(params, grads, state, lr, *, beta1=0.9, beta2=0.999,
                eps=1e-8, weight_decay=1e-4):
    """One torch-Adam step.  Returns (new_params, new_state)."""
    step = state["step"] + 1
    bc1 = 1.0 - beta1 ** step.astype(jnp.float32)
    bc2 = 1.0 - beta2 ** step.astype(jnp.float32)

    def upd(p, g, m, v):
        g = g + weight_decay * p
        m = beta1 * m + (1.0 - beta1) * g
        v = beta2 * v + (1.0 - beta2) * (g * g)
        m_hat = m / bc1
        v_hat = v / bc2
        return p - lr * m_hat / (jnp.sqrt(v_hat) + eps), m, v

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state["m"])
    flat_v = treedef.flatten_up_to(state["v"])
    new = [upd(p, g, m, v) for p, g, m, v in
           zip(flat_p, flat_g, flat_m, flat_v)]
    new_p = treedef.unflatten([n[0] for n in new])
    new_m = treedef.unflatten([n[1] for n in new])
    new_v = treedef.unflatten([n[2] for n in new])
    return new_p, {"step": step, "m": new_m, "v": new_v}


def flat_adam_init(params):
    """Adam state with the moments as ONE flat fp32 vector.

    Motivation (examples/bench_optim.py): `adam_init`/`adam_update` hold
    the moments as param-shaped trees, so XLA lowers the update as ~400
    independent tiny elementwise chains (one per leaf — biases and
    LayerNorm vectors dominate the count).  Keeping m/v flat and doing
    the update on one contiguous vector replaces those with a single
    fused kernel.  Values are BIT-EXACT vs adam_update: concatenation
    does not change elementwise math."""
    n = sum(p.size for p in jax.tree_util.tree_leaves(params))
    # m and v must be DISTINCT buffers: the train step donates the whole
    # opt state, and aliased leaves trip "donate the same buffer twice"
    return {"step": jnp.zeros((), jnp.int32),
            "m": jnp.zeros((n,), jnp.float32),
            "v": jnp.zeros((n,), jnp.float32)}


def flat_adam_update(params, grads, state, lr, *, beta1=0.9, beta2=0.999,
                     eps=1e-8, weight_decay=1e-4):
    """One torch-Adam step over the flattened tree (tree-in / tree-out).

    Same signature and bit-identical results as `adam_update`; only the
    optimizer-state layout differs ({"step", "m": [n], "v": [n]}).  Pays
    one grads-concat + one params-concat/split per step (~3x param bytes
    of extra HBM traffic) in exchange for one fused update kernel."""
    from jax.flatten_util import ravel_pytree
    fp, unravel = ravel_pytree(params)
    fg, _ = ravel_pytree(grads)
    step = state["step"] + 1
    bc1 = 1.0 - beta1 ** step.astype(jnp.float32)
    bc2 = 1.0 - beta2 ** step.astype(jnp.float32)
    g = fg + weight_decay * fp
    m = beta1 * state["m"] + (1.0 - beta1) * g
    v = beta2 * state["v"] + (1.0 - beta2) * (g * g)
    new_fp = fp - lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps)
    return unravel(new_fp), {"step": step, "m": m, "v": v}


def _is_flat_state(state) -> bool:
    m = state.get("m")
    return not isinstance(m, dict) and getattr(m, "ndim", None) == 1


def opt_state_to_flat(state, params=None):
    """Convert an adam_init-style tree state to the flat layout (for
    resuming pre-flat checkpoints).  No-op if already flat."""
    del params
    if _is_flat_state(state):
        return state
    from jax.flatten_util import ravel_pytree
    fm, _ = ravel_pytree(state["m"])
    fv, _ = ravel_pytree(state["v"])
    return {"step": state["step"], "m": fm, "v": fv}


def opt_state_from_flat(state, params):
    """Inverse of opt_state_to_flat: unravel a flat state back into the
    param tree's structure (resuming a flat checkpoint with the tree
    optimizer).  No-op if already a tree."""
    if not _is_flat_state(state):
        return state
    from jax.flatten_util import ravel_pytree
    _, unravel = ravel_pytree(params)
    m = jnp.asarray(state["m"])
    return {"step": state["step"], "m": unravel(m),
            "v": unravel(jnp.asarray(state["v"]))}


def select_adam():
    """(init, update, reconcile) per MMTX_FLAT_ADAM.

    ROUND-4 VERDICT (v5e, examples/bench_optim.py, full MFT tree of 350
    leaves / 7.82 M params): flat LOSES 5.8x (2.537 vs 0.437 ms/step) —
    the per-step ravel/unravel copies dwarf the dispatch overhead they
    remove, and tree-Adam already runs within 1.7x of its 0.267 ms HBM
    floor.  Default stays "0" (tree layout); "1" = the flat-moment
    layout, kept as tested code (bit-identical param trajectories,
    tests/test_engine.py).  reconcile converts a restored opt state
    (either layout, e.g. a cross-layout checkpoint) into the active
    one."""
    import os
    if os.environ.get("MMTX_FLAT_ADAM", "0") == "1":
        return flat_adam_init, flat_adam_update, opt_state_to_flat
    return adam_init, adam_update, opt_state_from_flat


@dataclasses.dataclass
class ReduceLROnPlateau:
    """Host-side plateau controller matching torch defaults
    (mode='min', threshold=1e-4 rel, cooldown=0, min_lr=0)."""
    lr: float
    patience: int = 100
    factor: float = 0.5
    threshold: float = 1e-4
    best: float = float("inf")
    num_bad: int = 0

    def step(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr *= self.factor
                self.num_bad = 0
        return self.lr
