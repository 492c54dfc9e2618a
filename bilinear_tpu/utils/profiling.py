"""Tracing / profiling harness (SURVEY.md §5 'Tracing / profiling').

The reference's only instrumentation is a tqdm loss postfix
(train_bilinear.py:57,88-89). Here:

- ``trace(log_dir)``: jax.profiler context writing a TensorBoard trace
  (viewable with tensorboard-plugin-profile);
- ``Timer``: throughput/step-time accounting that forces execution with a
  host fetch — REQUIRED on tunneled TPU platforms where block_until_ready
  does not synchronize (see .claude/skills/verify/SKILL.md);
- ``measure_fn``: RTT-cancelling kernel timing — jit K iterations ending in a
  scalar fetch for two different K and difference them (the method bench.py
  uses).
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile a block into ``{log_dir}/plugins/profile`` for TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock step timing with forced device sync."""

    def __init__(self):
        self.t0 = None
        self.steps = 0
        self.items = 0
        self.elapsed = 0.0

    def start(self):
        self.t0 = time.perf_counter()

    def stop(self, result=None, items: int = 0):
        """Fetches a leaf of ``result`` to force execution, then accumulates."""
        if result is not None:
            leaves = jax.tree.leaves(result)
            if leaves:
                jax.device_get(jax.tree.leaves(result)[0])
        self.elapsed += time.perf_counter() - self.t0
        self.steps += 1
        self.items += items

    @property
    def steps_per_sec(self) -> float:
        return self.steps / self.elapsed if self.elapsed else 0.0

    @property
    def items_per_sec(self) -> float:
        return self.items / self.elapsed if self.elapsed else 0.0


def measure_fn(
    fn: Callable[[jnp.ndarray], jnp.ndarray],
    k1: int = 4,
    k2: int = 24,
    reps: int = 3,
) -> float:
    """Seconds per call of ``fn(eps)``, measured by differencing jitted
    K-iteration loops so per-fetch RTT cancels.

    CRITICAL CONTRACT: ``fn`` receives a tiny traced scalar (|eps| ~ 1e-38 *
    output magnitude) and MUST mix it into its inputs (e.g. ``x + eps``).
    Without that, every iteration is loop-invariant and XLA hoists the body
    out of the loop — the measurement silently times ONE execution."""

    def loop(k):
        @jax.jit
        def run():
            def body(_, acc):
                out = fn(acc * 1e-38)
                return jnp.sum(out).astype(jnp.float32) * 1e-6

            return jax.lax.fori_loop(0, k, body, jnp.float32(0))

        return run

    run1, run2 = loop(k1), loop(k2)
    float(run1())
    float(run2())

    def best(r):
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(r())
            b = min(b, time.perf_counter() - t0)
        return b

    return (best(run2) - best(run1)) / (k2 - k1)
