"""On-chip HTTP serving benchmark: the full network path (PoseClient ->
PoseHTTPServer -> DynamicBatcher -> compiled program -> back) for both
routes, with concurrent clients.

This measures what a colocated client actually pays, on top of the raw
device numbers in RESULTS.md (0.615 ms batch-1 end2end dispatch, 20.9/33.8 M
poses/s lifting). On this dev box the host side is a worst case (1 CPU core,
~25 ms-RTT tunnel to the TPU); read the absolute numbers with that caveat —
the interesting quantities are the daemon's own overhead (HTTP parse + npz +
batcher queueing) and how coalescing holds throughput as client count grows.

Usage:
    python benchmarks/serving_http_bench.py [--quantize int8] [--clients 8]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quantize", default="", choices=["", "int8"])
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--lift-rows", type=int, default=4096,
                    help="rows per lifting request")
    ap.add_argument("--tiny", action="store_true",
                    help="1-stack/8-feature detector + interpret kernels "
                         "(CPU smoke test of the harness itself)")
    ap.add_argument("--max-rows", type=int, default=4096,
                    help="DynamicBatcher per-dispatch row cap; round-robin "
                         "shares across queued requests bound the convoy "
                         "tail (round-3 ran effectively uncapped: 4096*8)")
    ap.add_argument("--routes", default="lift,pose_b8,pose_b1",
                    help="comma list of routes to measure; on a cold "
                         "service each distinct compiled shape costs "
                         "minutes, and lift-only skips the production "
                         "detector compiles entirely")
    args = ap.parse_args()
    routes = [r.strip() for r in args.routes.split(",") if r.strip()]
    known = {"lift", "pose_b8", "pose_b1"}
    unknown = [r for r in routes if r not in known]
    if unknown:
        ap.error(
            f"unknown route(s) {unknown}; valid: {sorted(known)}"
        )
    want_pose = any(r.startswith("pose") for r in routes)

    import jax
    import jax.numpy as jnp

    from bilinear_tpu.client import PoseClient
    from bilinear_tpu.data.h36m import Protocol, Task, load_h36m
    from bilinear_tpu.data.synthetic import write_h36m_dataset
    from bilinear_tpu.io.checkpoint import save_checkpoint
    from bilinear_tpu.serving import End2EndServer, LiftingServer
    from bilinear_tpu.serving_http import PoseHTTPServer
    from bilinear_tpu.train.bilinear import BilinearTrainer
    from bilinear_tpu.train.end2end import End2EndTrainer

    tmp = tempfile.mkdtemp(prefix="servbench")
    data_dir = os.path.join(tmp, "h36m")
    write_h36m_dataset(data_dir, n_train=64, n_valid=16)
    tr = load_h36m(data_dir, Protocol.GT)[Task.Train]

    model_kw = dict(n_stacks=1, features=8, depth=1) if args.tiny else None
    lift_dir = os.path.join(tmp, "lift")
    save_checkpoint(
        lift_dir + "/parameter", 1,
        BilinearTrainer().init_state(jax.random.PRNGKey(0)),
    )
    quant = args.quantize or None
    lifting, _ = LiftingServer.from_run_dir(
        lift_dir, tr, quantize=quant, interpret=args.tiny
    )
    end2end = None
    if want_pose:
        e2e_dir = os.path.join(tmp, "e2e")
        e2e_trainer = End2EndTrainer(model_kw=model_kw)
        save_checkpoint(
            e2e_dir + "/parameter", 1,
            e2e_trainer.init_state(
                jax.random.PRNGKey(0),
                jnp.asarray(tr.mean_part), jnp.asarray(tr.std_part),
            ),
        )
        end2end = End2EndServer.from_run_dir(
            e2e_dir, tr, batch_sizes=(1, 8, 16), quantize=quant,
            model_kw=model_kw,
            **(dict(dtype=jnp.float32) if args.tiny else {}),
        )
    # Admission cap sized for the routes actually measured (ADVICE r4): a
    # pose-only run with a small --lift-rows must still admit pose bursts.
    # Generous on the pose side — 128 rows/client keeps several 16-frame
    # waves in flight; a tight cap (16/client) measured 40% lower pose
    # throughput via 503-retry backoff, which is admission-control working,
    # not daemon capacity (VERIFICATION_R5).
    pending_cap = max(
        (args.lift_rows * args.clients) if "lift" in routes else 0,
        (128 * args.clients) if want_pose else 0,
    )
    server = PoseHTTPServer(
        lifting=lifting, end2end=end2end, port=0, max_delay_ms=2.0,
        max_rows=args.max_rows,
        max_pending_rows=pending_cap,
    )
    server.start()
    # Backpressure-aware client: a 503 from admission control is flow
    # control for a load generator, not failure — retry per Retry-After.
    client = PoseClient(f"http://{server.host}:{server.port}", timeout=600,
                        busy_retries=1000, busy_backoff=0.2)

    # Warm every compiled size through the daemon itself — including the
    # COALESCED shapes the measurement produces (clients x rows lift rows;
    # every end2end batch size, since N concurrent b-row requests dispatch
    # as chunks of the larger compiled sizes). The end2end program bakes
    # the dataset's normalization stats in as constants, so each fresh
    # synthetic dataset misses the service compile cache: an unwarmed size
    # would compile DURING the measurement and dominate the percentiles.
    kp = (np.random.RandomState(0).rand(args.lift_rows, 16, 2) * 200).astype(
        np.float32
    )
    # uint8 frames: the realistic camera wire format, 4x fewer bytes than
    # f32 over HTTP and the tunnel (the daemon rescales on device).
    frames = (np.random.RandomState(1).rand(8, 256, 256, 3) * 255).astype(
        np.uint8
    )
    if "lift" in routes:
        # Warm the dispatch shapes the row cap ACTUALLY produces. Every
        # device call is padded to a TILE-row multiple by the lifting
        # kernel, and a capped dispatch never exceeds max_rows, so the
        # complete compiled-shape set is the TILE grid up to
        # min(max_rows, clients*lift_rows): round-robin shares can produce
        # any grid total at wave tails, and an effectively-uncapped run
        # coalesces co-queued requests up to clients*lift_rows. Warm each
        # grid point with one lone request of that size (a lone request
        # <= cap dispatches once, exactly that shape).
        from bilinear_tpu.ops.pallas.lifting import TILE

        top = min(args.max_rows, args.clients * args.lift_rows)
        big = np.concatenate([kp] * -(-top // kp.shape[0]))
        for k in range(1, -(-top // TILE) + 1):
            n = min(k * TILE, top)
            client.lift(big[:n])
            if n == top:
                break
    if want_pose:
        for b in sorted(end2end.batch_sizes):
            client.pose(
                (np.random.RandomState(b).rand(b, 256, 256, 3) * 255).astype(
                    np.uint8
                )
            )

    results = {}
    for route, payload, rows in (
        ("lift", lambda c: c.lift(kp), args.lift_rows),
        ("pose_b8", lambda c: c.pose(frames), 8),
        ("pose_b1", lambda c: c.pose(frames[:1]), 1),
    ):
        if route not in routes:
            continue
        lat: list = []
        stop = time.monotonic() + args.seconds
        lock = threading.Lock()

        def worker():
            while time.monotonic() < stop:
                t0 = time.monotonic()
                payload(client)
                dt = time.monotonic() - t0
                with lock:
                    lat.append(dt)

        threads = [
            threading.Thread(target=worker) for _ in range(args.clients)
        ]
        t_start = time.monotonic()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.monotonic() - t_start
        lat.sort()
        n = len(lat)
        results[route] = {
            "requests": n,
            "rows_per_sec": round(n * rows / wall, 1),
            "p50_ms": round(lat[n // 2] * 1e3, 2),
            "p95_ms": round(lat[int(n * 0.95)] * 1e3, 2),
            "clients": args.clients,
        }
        print(json.dumps({route: results[route]}), flush=True)

    h = server.health()
    print(json.dumps({"health": h}), flush=True)
    server.stop()


if __name__ == "__main__":
    main()
