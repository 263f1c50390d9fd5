"""Pseudo-golden regression: fixed random weights + fixed inputs must keep
producing the committed stage outputs (tests/data/pseudo_golden.npz).

This is the always-on stand-in for the weights-gated reference golden
tests (test_golden_parity.py; reference model main.cpp:6256-6510): a
change that bends any stage's default-precision numerics fails here even
if the unit-test oracles were updated in the same commit. Regenerate with
`python tests/gen_pseudo_golden.py` ONLY for intentional numerics changes.
"""

import numpy as np
import pytest

from pseudo_golden_lib import DATA_PATH, compute_outputs


@pytest.fixture(scope="module")
def golden():
    return dict(np.load(DATA_PATH))


@pytest.fixture(scope="module")
def computed():
    return compute_outputs()


def test_no_missing_or_extra_keys(golden, computed):
    assert sorted(golden) == sorted(computed)


def test_outputs_match(golden, computed):
    bad = []
    for name in sorted(golden):
        want, got = golden[name], np.asarray(computed[name])
        if want.shape != got.shape:
            bad.append(f"{name}: shape {got.shape} != {want.shape}")
            continue
        err = np.max(np.abs(got.astype(np.float64) -
                            want.astype(np.float64)))
        scale = max(1e-3, float(np.max(np.abs(want))))
        if err > 1e-3 * scale:
            bad.append(f"{name}: max|delta|={err:.3e} (scale {scale:.3e})")
    assert not bad, "pseudo-golden drift:\n" + "\n".join(bad)
