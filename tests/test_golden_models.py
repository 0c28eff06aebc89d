"""Golden-output regression tests per model family (VERDICT r4 item 6).

Each family's tiny fixed-seed model (golden_builders.py) must reproduce
the frozen output statistics + probe values in golden/models_golden.json
bit-for-bit to f32 tolerance on CPU. Unlike the torch-parity suites
(which compare two LIVE implementations), these freeze the expected
numbers — an unintended change to OUR architecture math fails the exact
family that moved, even when torch is unavailable or both sides drift.

Regenerate after an intended change: python tests/gen_golden_models.py
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from golden_builders import BUILDERS, probe

_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "golden", "models_golden.json")


def _golden():
    if not os.path.exists(_PATH):
        pytest.skip("golden file missing — run tests/gen_golden_models.py")
    with open(_PATH) as f:
        return json.load(f)


@pytest.mark.parametrize("family", sorted(BUILDERS))
def test_golden_model_output(family):
    golden = _golden()
    if family not in golden:
        pytest.skip(f"no golden entry for {family} — regenerate")
    expect = golden[family]
    got = probe(np.asarray(BUILDERS[family]()))
    assert got["size"] == expect["size"], (got["size"], expect["size"])
    scale = max(abs(expect["absmax"]), 1e-3)
    # f32 accumulation over different XLA fusion choices: allow 1e-4
    # relative to the tensor's max magnitude
    tol = 1e-4 * scale
    assert abs(got["mean"] - expect["mean"]) < tol, family
    assert abs(got["std"] - expect["std"]) < tol, family
    np.testing.assert_allclose(got["values"], expect["values"], atol=10 * tol,
                               err_msg=family)
