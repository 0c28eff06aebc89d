"""Aux-subsystem contracts (SURVEY.md §5): checkify NaN/OOB sanitizer,
finiteness probe, restartable checkpointed jobs."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kornia_tpu.utils.debug import assert_finite, checked
from kornia_tpu.utils.elastic import latest_checkpoint, run_restartable


class TestChecked:
    def test_nan_detected(self):
        def bad(x):
            return jnp.log(x)  # NaN for negative input
        err, out = jax.jit(checked(bad))(jnp.asarray([-1.0]))
        with pytest.raises(Exception):
            err.throw()

    def test_clean_passes(self):
        def good(x):
            return jnp.log(x + 2.0)
        err, out = jax.jit(checked(good))(jnp.asarray([1.0]))
        err.throw()  # no error
        np.testing.assert_allclose(np.asarray(out), np.log(3.0), rtol=1e-6)

    def test_oob_gather_detected(self):
        def gather(x, i):
            return x[i]
        err, _ = jax.jit(checked(gather))(jnp.arange(4.0), jnp.asarray(9))
        with pytest.raises(Exception):
            err.throw()


def test_assert_finite():
    assert_finite({"a": jnp.ones(3)}, "ok")  # no raise
    with pytest.raises(FloatingPointError):
        assert_finite(jnp.asarray([1.0, jnp.nan]), "bad")


class TestRestartable:
    def test_resume_from_checkpoint(self):
        calls = []

        def step(state):
            calls.append(1)
            return {"x": state["x"] + 1.0}

        with tempfile.TemporaryDirectory() as d:
            ck = os.path.join(d, "run")
            out = run_restartable(step, {"x": jnp.asarray(0.0)}, 5, ck,
                                  checkpoint_every=2)
            assert float(out["x"]) == 5.0
            assert latest_checkpoint(ck)[0] == 5
            # simulate preemption: rerun — resumes at step 5, no new work
            calls.clear()
            out2 = run_restartable(step, {"x": jnp.asarray(0.0)}, 5, ck,
                                   checkpoint_every=2)
            assert float(out2["x"]) == 5.0 and not calls
            # extend the run: continues from 5, only 3 more steps
            out3 = run_restartable(step, {"x": jnp.asarray(0.0)}, 8, ck,
                                   checkpoint_every=2)
            assert float(out3["x"]) == 8.0 and len(calls) == 3
