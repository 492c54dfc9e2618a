"""Validate the measure_fn timing harness against independent methods.

RESULTS.md numbers come from utils/profiling.py::measure_fn — a differenced
K-iteration jitted loop ending in a scalar fetch (correct on the tunneled
platform whatever block_until_ready does that jax version — probe with
cli.doctor — and immune to XLA hoisting naive loops). A harness that
silently measured the wrong thing would poison every
number, so this script cross-checks it two independent ways:

1. trace:    run the same op under jax.profiler and read the executable's
             run duration straight out of the .xplane.pb protobuf
             (PjRtCpuExecutable::Execute / device-plane events). This is the
             profiler-derived duration VERDICT.md round 1 asked for.
2. long-run: one un-differenced jitted loop long enough that the per-fetch
             RTT is <1% of the total (K=200+), i.e. the naive method in the
             regime where it is valid.

Both must agree with measure_fn within tolerance. The trace leg needs the
profiler to record executable events for the active platform (true on CPU;
the tunneled 'axon' TPU may only trace host activity — the script reports
what it finds and falls back to the long-run leg for the verdict there).

Usage: python benchmarks/measure_crosscheck.py [--op matmul|hourglass]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bilinear_tpu.utils.profiling import measure_fn, mix, trace_per_dispatch


def build_op(name: str):
    if name == "matmul":
        x = jax.random.normal(jax.random.PRNGKey(0), (2048, 2048), jnp.bfloat16)

        def fn(eps):
            # mix(), not x + eps: a bare add lets XLA hoist the whole
            # loop-invariant matmul (this script is what caught that).
            return mix(x, eps) @ x

        return fn
    if name == "hourglass":
        from bilinear_tpu.models.hourglass_torch7 import MainModel

        model = MainModel(dtype=jnp.bfloat16)
        xin = jax.random.normal(jax.random.PRNGKey(0), (8, 256, 256, 3))
        v = model.init(jax.random.PRNGKey(0), xin[:1], train=False)

        def fn(eps):
            return model.apply(v, xin + eps, train=False)[-1]

        return fn
    raise ValueError(name)


def longrun_estimate(fn, t_est: float, reps: int = 3) -> float:
    """Un-differenced K-loop wall time / K, with K sized from a first
    estimate so the single fetch RTT (~25 ms on the tunnel) is <1% of the
    loop: K*t >= 3 s."""
    k = max(200, int(3.0 / max(t_est, 1e-6)))

    @jax.jit
    def run():
        def body(_, acc):
            out = fn(acc * 1e-38)
            return jnp.sum(out).astype(jnp.float32) * 1e-6

        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    float(run())  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run())
        best = min(best, time.perf_counter() - t0)
    return best / k


def trace_estimate(fn, k: int = 32) -> tuple:
    """Average executable duration from a jax.profiler xplane trace, via the
    shared utils/profiling.trace_per_dispatch parser. Returns
    (seconds_or_None, how)."""
    compiled = jax.jit(lambda eps: jnp.sum(fn(eps)).astype(jnp.float32))
    float(compiled(jnp.float32(0)))  # compile
    counter = iter(range(10 ** 9))

    def dispatch():
        return compiled(jnp.float32(next(counter)) * 1e-38)

    return trace_per_dispatch(dispatch, k=k, include_host_execute=True)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--op", default="matmul", choices=["matmul", "hourglass"])
    p.add_argument("--tolerance", type=float, default=0.20)
    args = p.parse_args(argv)

    fn = build_op(args.op)
    t_measure = measure_fn(fn, k1=4, k2=24)
    t_long = longrun_estimate(fn, t_measure)
    t_trace, how = trace_estimate(fn)

    rel_long = abs(t_long - t_measure) / t_measure
    result = {
        "metric": "measure_fn_crosscheck",
        "op": args.op,
        "platform": jax.devices()[0].platform,
        "measure_fn_ms": round(t_measure * 1e3, 4),
        "longrun_ms": round(t_long * 1e3, 4),
        "longrun_rel_diff": round(rel_long, 4),
        "trace_ms": None if t_trace is None else round(t_trace * 1e3, 4),
        "trace_info": how,
        "trace_rel_diff": None
        if t_trace is None
        else round(abs(t_trace - t_measure) / t_measure, 4),
        "tolerance": args.tolerance,
    }
    ok = rel_long <= args.tolerance
    if t_trace is not None:
        # The trace measures pure executable time; measure_fn's loop adds the
        # scan carry overhead, so trace <= measure_fn is expected. Gate on
        # agreement within tolerance.
        ok = ok and abs(t_trace - t_measure) / t_measure <= args.tolerance
    result["ok"] = bool(ok)
    print(json.dumps(result), flush=True)
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
