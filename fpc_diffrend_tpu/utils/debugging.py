"""Numerics checking and kernel-debugging helpers (SURVEY.md §5).

The reference relies on nvdiffrast's correctness and has no sanitizers;
here the equivalents are Pallas interpreter-mode execution (bit-level
kernel checking without hardware) and XLA NaN/Inf guards.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def nan_checks():
    """Enable jax debug_nans within a scope (fails fast on NaN/Inf)."""
    prev = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


@contextlib.contextmanager
def pallas_interpret_mode():
    """Run every Pallas kernel through the interpreter (race/memory-safe
    reference semantics; the TPU-world analogue of running under a
    sanitizer)."""
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def assert_finite(tree, name: str = "tree") -> None:
    """Host-side finite check over a pytree (call outside jit)."""
    import numpy as np

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            bad = int((~np.isfinite(arr)).sum())
            raise FloatingPointError(
                f"{name}{jax.tree_util.keystr(path)}: {bad} non-finite values")


def finite_or_zero(x):
    """In-graph guard: replace non-finite values with zeros."""
    return jnp.where(jnp.isfinite(x), x, 0.0)
