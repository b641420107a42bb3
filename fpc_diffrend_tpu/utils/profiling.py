"""Profiling / tracing hooks (SURVEY.md §5: absent in the reference).

Thin wrappers over jax.profiler plus a robust wall-clock timer that
synchronizes through a scalar fetch — on remote-attached TPU backends,
``block_until_ready`` can return before device completion, and multi-MB
device->host transfers are slow, so timing must force completion via a
small reduction.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


def sync(tree) -> float:
    """Force completion of a pytree computation; returns a checksum."""
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    if not leaves:
        return 0.0
    total = sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in leaves)
    return float(total)


def time_fn(fn, *args, iters: int = 10, warmup: int = 1):
    """(seconds_per_call, last_result) with proper device sync."""
    r = None
    for _ in range(warmup):
        r = fn(*args)
    sync(r)
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    sync(r)
    return (time.time() - t0) / iters, r


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> dict:
    """Per-device memory stats when the backend exposes them."""
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
