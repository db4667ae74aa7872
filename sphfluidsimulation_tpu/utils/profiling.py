"""Profiling helpers: jax.profiler traces and robust device timing.

Quirk this module exists for: on the tunneled axon TPU backend,
``jax.block_until_ready`` can return before results are actually
materialized host-visibly, so wall-clock timing must force a scalar
transfer. ``device_sync`` does that portably.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


def device_sync(*pytrees) -> float:
    """Force full evaluation of all arrays; returns a checksum scalar
    (the transfer is the synchronization)."""
    total = 0.0
    for t in pytrees:
        for leaf in jax.tree.leaves(t):
            total += float(jnp.sum(leaf.astype(jnp.float32)))
    return total


@contextlib.contextmanager
def trace(log_dir: str | None):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


class ThroughputTimer:
    """Times a window of work and reports particle-substeps/sec."""

    def __init__(self, n_particles: int, substeps: int = 5):
        self.n_particles = n_particles
        self.substeps = substeps
        self._t0 = None
        self.elapsed = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0

    def rate(self, n_frames: int) -> float:
        return self.n_particles * self.substeps * n_frames / self.elapsed
