"""Test harness config: run on a virtual 8-device CPU mesh.

The standard JAX fake-backend trick (SURVEY.md §4): force the host platform
and split it into 8 devices so sharding/collective tests run anywhere.
Must set env vars before jax is imported.
"""

import os

# Force CPU even when the environment pins JAX_PLATFORMS to a TPU platform:
# unit tests must be hermetic and run with 8 virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Kernel parity tests verify the EXACT math paths with tight tolerances;
# the production default is the convergence-validated fast precision
# (bf16 gradient contractions, ~4e-3 relative — see texture_tpu
# GRAD_PRECISION). Pin exact here; test_precision_knobs covers fast.
os.environ.setdefault("FPC_GRAD_PREC", "exact")
os.environ.setdefault("FPC_TEX_PREC", "exact")

import jax  # noqa: E402

# Some environments register an external TPU platform at interpreter start
# (sitecustomize) and override jax_platforms via jax.config — override it
# back after import, before any backend is initialized.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
