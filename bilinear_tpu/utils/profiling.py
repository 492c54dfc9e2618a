"""Tracing / profiling harness (SURVEY.md §5 'Tracing / profiling').

The reference's only instrumentation is a tqdm loss postfix
(train_bilinear.py:57,88-89). Here:

- ``trace(log_dir)``: jax.profiler context writing a TensorBoard trace
  (viewable with tensorboard-plugin-profile);
- ``Timer``: throughput/step-time accounting that forces execution with a
  host fetch — correct even on tunneled TPU platforms where
  block_until_ready may not synchronize (probe with cli.doctor; see
  .claude/skills/verify/SKILL.md);
- ``measure_fn``: RTT-cancelling kernel timing — jit K iterations ending in a
  scalar fetch for two different K and difference them (the method bench.py
  uses).
"""
from __future__ import annotations

import contextlib
import os
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
        self.last_elapsed = 0.0
        self.last_items = 0

    def start(self):
        self.t0 = time.perf_counter()

    def stop(self, result=None, items: int = 0):
        """Fetches a leaf of ``result`` to force execution, then accumulates."""
        if result is not None:
            leaves = jax.tree.leaves(result)
            if leaves:
                jax.device_get(jax.tree.leaves(result)[0])
        self.last_elapsed = time.perf_counter() - self.t0
        self.last_items = items
        self.elapsed += self.last_elapsed
        self.steps += 1
        self.items += items

    @property
    def steps_per_sec(self) -> float:
        return self.steps / self.elapsed if self.elapsed else 0.0

    @property
    def items_per_sec(self) -> float:
        return self.items / self.elapsed if self.elapsed else 0.0

    @property
    def last_items_per_sec(self) -> float:
        """Rate of the most recent start/stop interval only — per-epoch
        throughput that is not dragged down by epoch 1's first-time compile
        (250-580 s on tunneled platforms) the way the cumulative average is."""
        return self.last_items / self.last_elapsed if self.last_elapsed else 0.0


def mix(x: jnp.ndarray, eps) -> jnp.ndarray:
    """Rewrite-proof way to make ``x`` iteration-dependent inside measure_fn.

    ``x + eps`` is NOT enough when everything downstream of the mix is
    linear (matmuls, convolutions, slices, pads, selects-free resamples):
    XLA's algebraic simplifier distributes ``(x + eps) @ w`` into a hoisted
    ``x @ w`` plus a rank-1 eps term, and the loop "measures" only the cheap
    update (observed: a 2048^3 bf16 matmul timed 3x faster than its own
    profiler-trace duration). The select below has no distribution rule, so
    the full computation stays inside the loop; its predicate is always true
    at runtime (|eps| ~ 1e-38) and costs one fused elementwise op."""
    return jnp.where(eps > -1.0, x + eps, x - 1.0)


def measure_fn(
    fn: Callable[[jnp.ndarray], jnp.ndarray],
    k1: int = 4,
    k2: int = 24,
    reps: int = 3,
) -> float:
    """Seconds per call of ``fn(eps)``, measured by differencing jitted
    K-iteration loops so per-fetch RTT cancels.

    CRITICAL CONTRACT: ``fn`` receives a tiny traced scalar (|eps| ~ 1e-38 *
    output magnitude) and MUST mix it into its inputs. Without that, every
    iteration is loop-invariant and XLA hoists the body out of the loop —
    the measurement silently times ONE execution. Use ``mix(x, eps)`` (not
    a bare ``x + eps``) whenever the computation under test is linear in
    ``x`` — a bare add lets the algebraic simplifier hoist the linear part
    (see mix's docstring); nonlinear networks (ReLU/BN after the first
    layer) only leak their first linear layer, usually negligible.

    The differenced signal must dwarf the per-fetch RTT jitter (~ms on the
    tunnel): after a pilot run with (k1, k2), the loop length is re-sized so
    (k2' - k1) * t >= ``target_s`` and the measurement repeated. Without
    this, sub-millisecond ops read 2-3x off (caught by the cross-check:
    a 2048^3 bf16 matmul "measured" 0.04 ms against a 0.10 ms trace truth).

    Cross-validation: benchmarks/measure_crosscheck.py checks this harness
    against jax.profiler trace durations and an RTT-amortized long run."""

    def loop(k):
        @jax.jit
        def run():
            def body(_, acc):
                out = fn(acc * 1e-38)
                return jnp.sum(out).astype(jnp.float32) * 1e-6

            return jax.lax.fori_loop(0, k, body, jnp.float32(0))

        return run

    return _adaptive_diff(loop, k1, k2, reps, target_s=0.5)


def measure_step_fn(step_fn, state, *args, k1: int = 2, k2: int = 8,
                    reps: int = 3) -> float:
    """Seconds per call of a state-carrying train step
    ``step_fn(state, *args) -> (state, scalar)``, K-differenced via
    lax.scan. The state dependency chains iterations, so nothing hoists —
    this is the one legitimate alternative to measure_fn's eps contract
    (which a threaded TrainState cannot satisfy). Shares the adaptive
    loop-sizing with measure_fn (sub-ms steps would otherwise read 2-3x off
    against tunnel-RTT jitter)."""

    def loop(k):
        @jax.jit
        def run():
            def body(s, _):
                s, out = step_fn(s, *args)
                return s, out
            _, outs = jax.lax.scan(body, state, None, length=k)
            return jnp.sum(jnp.asarray(outs[-1], jnp.float32))
        return run

    return _adaptive_diff(loop, k1, k2, reps, target_s=0.5)


def adaptive_diff(loop, k1, k2, reps, target_s, _max_iters: int = 2_000_000):
    """Difference loop(k2)-loop(k1) wall times; re-size k2 after a pilot so
    the differenced signal is >= target_s (RTT-jitter safe).

    Under heavy concurrent device traffic (another process sharing the chip)
    the differenced signal can still come out non-positive; the loop below
    escalates k2 up to twice more, and if the difference never stabilizes
    positive it falls back to the amortized estimate best(loop(k2))/k2 —
    always positive, biased high by at most one fetch RTT over >= target_s
    of work (~5% on this tunnel), never nonsense."""

    def best(r):
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(r())
            b = min(b, time.perf_counter() - t0)
        return b

    run1 = loop(k1)
    float(run1())  # compile
    t1 = best(run1)

    t_hi = {}

    def diff_estimate(k_hi):
        run_hi = loop(k_hi)
        float(run_hi())
        t_hi[k_hi] = best(run_hi)
        return (t_hi[k_hi] - t1) / (k_hi - k1)

    t = diff_estimate(k2)
    for escalation in range(3):
        if t > 0 and (k2 - k1) * t >= target_s:
            return t
        # Pilot for re-sizing: the measured difference when it is usable;
        # otherwise a floor derived from the short loop's wall time (which
        # includes the RTT, so it over-estimates per-iteration cost — fine
        # for a floor, wrong as the primary estimate).
        t_pilot = t if t > 0 else max(t1 / max(k1, 1) * 0.05, 1e-7)
        k2_new = min(
            max(k1 + int(target_s * (2 ** escalation) / t_pilot) + 1, k2 * 2),
            _max_iters,
        )
        if k2_new == k2:
            break
        k2 = k2_new
        t = diff_estimate(k2)
    if t > 0:
        return t
    return t_hi[k2] / k2  # amortized fallback (includes one RTT)


_adaptive_diff = adaptive_diff  # back-compat alias


def trace_per_dispatch(dispatch, k: int = 16, include_host_execute: bool = False):
    """Per-dispatch duration from a jax.profiler xplane trace.

    ``dispatch()`` must run ONE already-compiled device program and return
    its output (compile before calling this). Returns (seconds_or_None,
    info). Events are grouped by (plane, line, metadata-name); groups with
    exactly one event per dispatch are preferred (trace lines nest module +
    sub-events), then the longest total wins. Parses the .xplane.pb proto
    directly — the tensorboard-plugin converter is broken in this image."""
    import glob
    import tempfile

    out = None
    tmp = tempfile.mkdtemp(prefix="trace_dispatch_")
    jax.profiler.start_trace(tmp)
    for _ in range(k):
        out = dispatch()
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(jnp.asarray(leaf, jnp.float32)))  # force completion
    jax.profiler.stop_trace()

    paths = glob.glob(os.path.join(tmp, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        return None, "no trace file"
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except Exception as e:  # pragma: no cover
        return None, f"no xplane proto ({e})"
    xs = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        xs.ParseFromString(f.read())

    groups = {}
    for plane in xs.planes:
        device = not plane.name.startswith("/host:")
        for line in plane.lines:
            for ev in line.events:
                name = (
                    plane.event_metadata[ev.metadata_id].name
                    if ev.metadata_id in plane.event_metadata
                    else ""
                )
                if device or (
                    include_host_execute and "Executable::Execute" in name
                ):
                    key = (plane.name, line.name, name)
                    tot, n = groups.get(key, (0.0, 0))
                    groups[key] = (tot + ev.duration_ps * 1e-12, n + 1)
    if not groups:
        return None, "no executable events in trace"
    per_dispatch = {kk: v for kk, v in groups.items() if v[1] == k}
    pool = per_dispatch or groups
    key, (total, n) = max(pool.items(), key=lambda kv: kv[1][0])
    return total / n, f"{n} x {key[2]} on {key[0]}/{key[1]}"
