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
