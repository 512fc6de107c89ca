"""Numerical-failure detection (SURVEY.md §5: the reference has no sanitizers;
crashes are fatal and silent NaNs poison training).

  * assert_finite_tree: host-side check of any pytree (params/grads/loss).
  * NanGuard: train-loop helper — checks loss every step and params every
    `check_every` steps; raises NonFiniteError with the offending leaf paths
    so failures are detected at the step they occur, not epochs later.
"""

from __future__ import annotations

from typing import Any, List

import jax
import numpy as np


class NonFiniteError(RuntimeError):
    pass


def nonfinite_leaves(tree: Any) -> List[str]:
    bad = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        a = np.asarray(leaf)
        if not np.all(np.isfinite(a)):
            bad.append(jax.tree_util.keystr(path))
    return bad


def assert_finite_tree(tree: Any, what: str = "tree") -> None:
    bad = nonfinite_leaves(tree)
    if bad:
        raise NonFiniteError(f"non-finite values in {what}: {bad[:5]}"
                             + (f" (+{len(bad) - 5} more)"
                                if len(bad) > 5 else ""))


class NanGuard:
    def __init__(self, check_every: int = 50):
        self.check_every = check_every
        self.step = 0

    def check(self, loss: float, params=None) -> None:
        self.step += 1
        if not np.isfinite(loss):
            raise NonFiniteError(f"loss became non-finite at step "
                                 f"{self.step}: {loss}")
        if params is not None and self.step % self.check_every == 0:
            assert_finite_tree(params, f"params at step {self.step}")
