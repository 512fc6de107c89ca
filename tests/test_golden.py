"""Numeric-regression goldens: every family's eval forward must reproduce the
committed outputs bit-for-bit-ish (1e-6) at fixed seeds.  Guards against
silent numeric drift across refactors between build rounds.  Regenerate with
tests/make_goldens.py only when a numeric change is intended."""

import os

import numpy as np
import pytest

from make_goldens import CASES, GOLDEN_DIR, build_case


@pytest.mark.parametrize("name,family,mods,mask_mode,variant", CASES)
def test_golden(name, family, mods, mask_mode, variant):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    assert os.path.exists(path), f"golden missing: run tests/make_goldens.py"
    want = np.load(path)["out"]
    got = build_case(family, mods, mask_mode, variant)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7,
                               err_msg=name)
