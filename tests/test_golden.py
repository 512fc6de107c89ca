"""Numeric-regression goldens: every family's eval forward must reproduce the
committed outputs bit-for-bit-ish (1e-6) at fixed seeds.  Guards against
silent numeric drift across refactors between build rounds.  Regenerate with
tests/make_goldens.py only when a numeric change is intended."""

import os

import numpy as np
import pytest

from make_goldens import (CASES, GOLDEN_DIR, TRAIN_CASES, build_case,
                          build_train_case)


@pytest.mark.parametrize("name,family,mods,mask_mode,variant", CASES)
def test_golden(name, family, mods, mask_mode, variant):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    assert os.path.exists(path), f"golden missing: run tests/make_goldens.py"
    want = np.load(path)["out"]
    got = build_case(family, mods, mask_mode, variant)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7,
                               err_msg=name)


@pytest.mark.parametrize(
    "kernel",
    [pytest.param(False, id="jnp"),
     # the kernel path forces every Pallas train kernel through interpret
     # mode on CPU (~45 s per family) — the expensive half of the lock
     pytest.param(True, id="kernel", marks=pytest.mark.slow)])
@pytest.mark.parametrize("name,family,mods", TRAIN_CASES)
def test_train_golden(name, family, mods, kernel):
    """Fixed-seed TRAINING numerics lock (VERDICT r2 #5): 2 epochs of the
    real Engine (Adam + wd, hash dropout, loss denominator) per family per
    kernel path must reproduce the committed per-epoch losses and final
    param checksums.  Catches training-path drift the tolerance-based
    parity tests absorb (hand-written Pallas backwards, dropout seed
    tables, optimizer changes)."""
    tag = "kernel" if kernel else "jnp"
    path = os.path.join(GOLDEN_DIR, f"train_{name}_{tag}.npz")
    assert os.path.exists(path), "golden missing: run tests/make_goldens.py"
    want = np.load(path)
    losses, sums, abs_sums = build_train_case(family, mods, kernel)
    np.testing.assert_allclose(losses, want["losses"], rtol=1e-6,
                               err_msg=f"train_{name}_{tag} losses")
    np.testing.assert_allclose(sums, want["sums"], rtol=1e-6, atol=1e-8,
                               err_msg=f"train_{name}_{tag} param sums")
    np.testing.assert_allclose(abs_sums, want["abs_sums"], rtol=1e-6,
                               err_msg=f"train_{name}_{tag} param abs sums")
