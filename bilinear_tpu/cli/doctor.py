"""Environment self-check: `python -m bilinear_tpu.cli.doctor`.

The reference assumes a local CUDA GPU and silently falls back to CPU
(/root/reference/util/config.py:9,17) — on a TPU fleet, hosts fail in less
visible ways: the wrong PJRT plugin on the path, tunneled devices whose
``block_until_ready`` does not actually synchronize, slow host links that
turn per-dispatch weight re-uploads into the (invisible) bottleneck, cold
persistent caches that make the first backward compile take minutes, and
half-written checkpoint directories. ``doctor`` measures each of these once,
up front, and prints ONE JSON report to stdout so a mis-provisioned host is
diagnosed in seconds instead of from inside a hung training job.

Probes (each an independent section in the report; a probe failure is
reported, never fatal to the others):

- ``platform``      backend / device kind + count / process topology
- ``memory``        per-device HBM in use / limit where the runtime exposes it
- ``dispatch``      round-trip latency of a tiny compiled program (host fetch)
- ``sync``          whether ``block_until_ready`` really waits (it does NOT on
                    some tunneled platforms — timing code must fetch instead)
- ``transfer``      host->device and device->host bandwidth, MB/s
- ``matmul``        bf16 MXU throughput via the RTT-cancelling harness
                    (utils/profiling.measure_fn + mix)
- ``compile_cache`` round-trips an entry through --compile-cache-dir
- ``checkpoints``   scans --run-dir/parameter: newest epoch, finalized marker

Exit code is 0 when every probe ran (warnings are advisory), 1 if any probe
raised.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def probe_platform() -> dict:
    import jax

    devs = jax.devices()
    return {
        "jax_version": jax.__version__,
        "backend": jax.default_backend(),
        "device_kind": devs[0].device_kind if devs else None,
        "n_devices": len(devs),
        "n_local_devices": jax.local_device_count(),
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
    }


def probe_memory() -> dict:
    import jax

    per_device = []
    for d in jax.local_devices():
        try:
            stats = d.memory_stats() or {}
        except Exception:  # runtimes without memory_stats support
            stats = {}
        per_device.append(
            {
                "id": d.id,
                "bytes_in_use": stats.get("bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
        )
    return {"devices": per_device}


def probe_dispatch(reps: int = 20) -> dict:
    """Median host-visible round trip of one tiny compiled program."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda s: s + 1.0)
    x = jnp.float32(0.0)
    float(f(x))  # compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(x))
        times.append(time.perf_counter() - t0)
    return {"rtt_ms": round(float(np.median(times)) * 1e3, 3), "reps": reps}


def _timed_loop(n: int, min_fetch_s: float = 0.2):
    """A jitted matmul fori_loop sized (by doubling) so one fetched run takes
    >= min_fetch_s — long enough that a non-waiting block_until_ready is
    unmistakable against RTT jitter."""
    import jax
    import jax.numpy as jnp

    x = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.bfloat16)

    def build(length):
        @jax.jit
        def run():
            def body(_, a):
                return jnp.tanh(a @ x)  # tanh: nothing hoists or reassociates

            return jnp.sum(
                jax.lax.fori_loop(0, length, body, x).astype(jnp.float32)
            )

        return run

    length = 8
    while True:
        run = build(length)
        float(run())  # compile + warm
        t0 = time.perf_counter()
        float(run())
        t_fetch = time.perf_counter() - t0
        if t_fetch >= min_fetch_s or length >= 2**20:
            return run, t_fetch
        # Grow toward the target in one jump (xN, at least x2), so slow
        # hosts re-compile the loop a handful of times, not dozens.
        length = min(
            max(length * 2, int(length * min_fetch_s / max(t_fetch, 1e-6) * 1.3)),
            2**20,
        )


def probe_sync(n: int = 512, min_fetch_s: float = 0.2) -> dict:
    """Does block_until_ready actually wait? On some tunneled PJRT platforms
    it returns immediately; every timing/throughput number taken with it is
    then fiction (the bug class utils/profiling.py exists to avoid)."""
    run, t_fetch = _timed_loop(n, min_fetch_s)
    t0 = time.perf_counter()
    run().block_until_ready()
    t_block = time.perf_counter() - t0
    float(run())  # drain the queue before later probes
    syncs = t_block >= 0.5 * t_fetch
    out = {
        "block_until_ready_syncs": bool(syncs),
        "fetch_s": round(t_fetch, 4),
        "block_until_ready_s": round(t_block, 4),
    }
    if not syncs:
        out["warning"] = (
            "block_until_ready returns before execution finishes on this "
            "platform — time by fetching a scalar (see utils/profiling.py)"
        )
    return out


def probe_transfer(mb: int = 32) -> dict:
    """Host->device and device->host bandwidth. H2D completion is forced by
    a pre-compiled element read (block_until_ready may not wait, see
    probe_sync); the read moves 4 bytes back, so its cost is one RTT."""
    import jax
    import jax.numpy as jnp

    n = mb * (1 << 20) // 4
    host = np.arange(n, dtype=np.float32)
    probe = jax.jit(lambda a: a[0])
    warm = jax.device_put(host)
    float(probe(warm))  # compile the reader for this shape

    t0 = time.perf_counter()
    dev = jax.device_put(host)
    float(probe(dev))
    t_h2d = time.perf_counter() - t0

    t0 = time.perf_counter()
    back = jax.device_get(dev)
    t_d2h = time.perf_counter() - t0
    assert back[-1] == host[-1]

    return {
        "mb": mb,
        "h2d_mb_per_s": round(mb / t_h2d, 1),
        "d2h_mb_per_s": round(mb / t_d2h, 1),
    }


def probe_matmul(n: int = 2048) -> dict:
    """bf16 matmul throughput through the vetted RTT-cancelling harness.
    `mix` is REQUIRED: a matmul is linear in its input, so a bare `x + eps`
    gets algebraically hoisted and the loop measures nothing."""
    import jax
    import jax.numpy as jnp

    from bilinear_tpu.utils.profiling import measure_fn, mix

    x = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.bfloat16)
    # Cast eps to bf16 before mixing so jnp promotion cannot silently turn
    # this into an f32 matmul on some jax versions.
    t = measure_fn(
        lambda eps: mix(x, jnp.asarray(eps, x.dtype)) @ w, k1=2, k2=16
    )
    return {
        "n": n,
        "ms": float(f"{t * 1e3:.4g}"),
        # Significant digits, not fixed decimals: a small-n probe on a slow
        # host is ~0.04 TFLOPS and must not round to a 0.0 that trips health
        # checks asserting > 0.
        "tflops": float(f"{2 * n**3 / t / 1e12:.3g}"),
    }


def probe_compile_cache(path: str) -> dict:
    """Round-trip a (unique, trivial) program through the persistent cache
    directory the train CLIs accept via --compile-cache-dir."""
    import os

    import jax
    import jax.numpy as jnp

    from bilinear_tpu.config import enable_compile_cache

    enable_compile_cache(path, zero_thresholds=True)
    before = len(os.listdir(path))
    salt = float(time.time_ns() % (1 << 20))  # new fingerprint each run
    float(jax.jit(lambda s: jnp.sin(s) * salt)(jnp.float32(0.5)))
    entries = len(os.listdir(path))
    out = {"path": path, "entries": entries, "wrote_entry": entries > before}
    if not out["wrote_entry"]:
        out["warning"] = "no cache entry written — check directory permissions"
    return out


def probe_checkpoints(run_dir: str) -> dict:
    import os

    from bilinear_tpu.io.checkpoint import is_finalized, latest_epoch

    parameter_dir = os.path.join(run_dir, "parameter")
    epoch = latest_epoch(parameter_dir)
    out = {
        "parameter_dir": parameter_dir,
        "latest_epoch": epoch,
        "finalized": is_finalized(parameter_dir),
    }
    if epoch <= 0 and not out["finalized"]:
        out["warning"] = "no checkpoints found — a fresh run will init from scratch"
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--mb", type=int, default=32, help="transfer probe size")
    p.add_argument("--matmul-n", type=int, default=2048)
    p.add_argument("--sync-n", type=int, default=512)
    p.add_argument("--run-dir", default=None,
                   help="scan this run's checkpoint directory")
    p.add_argument("--compile-cache-dir", default=None,
                   help="round-trip an entry through this cache directory")
    p.add_argument("--skip", nargs="*", default=[],
                   help="probe names to skip (e.g. --skip matmul transfer)")
    args = p.parse_args(argv)

    probes = {
        "platform": probe_platform,
        "memory": probe_memory,
        "dispatch": probe_dispatch,
        "sync": lambda: probe_sync(args.sync_n),
        "transfer": lambda: probe_transfer(args.mb),
        "matmul": lambda: probe_matmul(args.matmul_n),
    }
    if args.compile_cache_dir:
        probes["compile_cache"] = lambda: probe_compile_cache(
            args.compile_cache_dir
        )
    if args.run_dir:
        probes["checkpoints"] = lambda: probe_checkpoints(args.run_dir)

    report, failed = {}, False
    for name, fn in probes.items():
        if name in args.skip:
            report[name] = {"skipped": True}
            continue
        try:
            report[name] = fn()
        except Exception as e:  # keep the other probes alive
            report[name] = {"error": f"{type(e).__name__}: {e}"}
            failed = True
        if "warning" in report[name]:
            print(f"[doctor] {name}: {report[name]['warning']}", file=sys.stderr)

    print(json.dumps(report, indent=2))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
