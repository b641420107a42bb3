"""Temporal smoothness + debugging utils tests."""

import numpy as np
import jax
import jax.numpy as jnp

from fpc_diffrend_tpu.fit import losses as losses_mod
from fpc_diffrend_tpu.fit.config import FitConfig
from fpc_diffrend_tpu.utils import debugging


def test_temporal_smoothness_values():
    config = FitConfig(weight_temporal=2.0)
    params = {
        "per_frame_t": jnp.asarray(np.array(
            [[0, 0, 0], [1, 0, 0], [1, 1, 0]], np.float32)),
        "per_frame_q": jnp.asarray(np.tile([0, 0, 0, 1.0], (3, 1))
                                   .astype(np.float32)),
    }
    # frame 1: dt = (1,0,0) -> 1. frame 2: dt = (0,1,0) -> 1. frame 0 gated.
    v = float(losses_mod.temporal_smoothness(
        config, params, jnp.asarray([0, 1, 2])))
    np.testing.assert_allclose(v, 2.0 * (0 + 1 + 1) / 3, rtol=1e-6)

    # zero when disabled
    config0 = FitConfig(weight_temporal=0.0)
    assert float(losses_mod.temporal_smoothness(
        config0, params, jnp.asarray([1]))) == 0.0

    # differentiable
    g = jax.grad(lambda t: losses_mod.temporal_smoothness(
        config, {**params, "per_frame_t": t}, jnp.asarray([1, 2])))(
        params["per_frame_t"])
    assert np.abs(np.asarray(g)).sum() > 0


def test_assert_finite():
    debugging.assert_finite({"a": jnp.ones(3)}, "ok")
    try:
        debugging.assert_finite({"a": jnp.asarray([1.0, np.nan])}, "bad")
        assert False, "should have raised"
    except FloatingPointError as e:
        assert "bad" in str(e)


def test_finite_or_zero():
    x = jnp.asarray([1.0, np.inf, np.nan, -2.0])
    np.testing.assert_allclose(np.asarray(debugging.finite_or_zero(x)),
                               [1.0, 0.0, 0.0, -2.0])
