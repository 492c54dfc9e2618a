"""Pose-serving daemon — HTTP front-end with dynamic batching and
checkpoint hot-reload over the compiled inference paths.

The reference has no serving story beyond the (broken) webcam loop
(/root/reference/webcam.py, model/end2end.py:21-43); this is its
production counterpart: the fused frame->3D program and/or the Pallas
lifting kernel behind a network API.

Usage:
  # frame -> 2D+3D (End2End program), hot-reloading its run dir:
  python -m bilinear_tpu.cli.serve --kind end2end \
      --run-dir "save/End2End" --data-dir data/Human3.6M --port 8900 \
      --reload-every 30

  # 2D -> 3D lifting only (bf16 Pallas kernel; --quantize int8 for the
  # int8 MXU path):
  python -m bilinear_tpu.cli.serve --kind lifting \
      --run-dir "save/Bilinear GT" --data-dir data/Human3.6M --port 8900

  # deployment box: serve AOT artifact(s) (cli.export_aot) — no
  # checkpoints, normalization data, or flax needed; hot-swap by
  # atomically replacing the artifact file:
  python -m bilinear_tpu.cli.serve --aot lifting.aot end2end.aot \
      --port 8900 --reload-every 30

Endpoints: GET /healthz, POST /v1/lift (JSON {"keypoints": (N,16,2)} or
application/x-npy), POST /v1/pose (npz: frames (N,256,256,3) [+ centers,
scales]), POST /admin/reload.
"""
from __future__ import annotations

import argparse
import logging
import time

from bilinear_tpu.config import apply_platform_override

apply_platform_override()  # before any backend touch (same as parse_config)

import jax
import jax.numpy as jnp

from bilinear_tpu.data.h36m import Protocol, Task, load_h36m
from bilinear_tpu.serving import End2EndServer, LiftingServer
from bilinear_tpu.serving_http import PoseHTTPServer


def build_server(args, logger=None) -> PoseHTTPServer:
    if args.aot:
        return _build_aot_server(args, logger)
    splits = load_h36m(args.data_dir, args.protocol)
    train = splits[Task.Train]
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    quantize = args.quantize or None
    model_kw = {}
    if args.n_stacks:
        model_kw = dict(
            n_stacks=args.n_stacks, features=args.features, depth=args.depth
        )

    interpret = args.interpret
    if not interpret and jax.default_backend() == "cpu":
        # The Pallas lifting kernels only run natively on TPU; on a CPU
        # backend every /v1/lift would 500 at request time. Fall back to
        # interpret mode (same numerics) instead of serving a broken route.
        interpret = True
        if logger:
            logger.info("cpu backend: interpret-mode Pallas kernels")

    lifting = end2end = None
    if args.kind in ("lifting", "both"):
        lifting, epoch = LiftingServer.from_run_dir(
            args.lifting_run_dir or args.run_dir, train,
            dtype=dtype, quantize=quantize, interpret=interpret,
        )
        if logger:
            logger.info("lifting model: epoch %d", epoch)
    if args.kind in ("end2end", "both"):
        end2end = End2EndServer.from_run_dir(
            args.run_dir, train, variant=args.variant,
            model_kw=model_kw or None, dtype=dtype,
            batch_sizes=tuple(args.batch_sizes),
            # static scales apply to the lifting MLP only; the detector
            # keeps dynamic int8 convs.
            quantize="int8" if quantize == "int8-static" else quantize,
        )
        if logger:
            logger.info("end2end model: epoch %d", end2end.epoch)

    return PoseHTTPServer(
        lifting=lifting,
        end2end=end2end,
        host=args.host,
        port=args.port,
        max_delay_ms=args.max_delay_ms,
        max_rows=args.max_rows,
        max_pending_rows=args.max_pending_rows,
        reload_every=args.reload_every,
        logger=logger,
    )


def _build_aot_server(args, logger=None) -> PoseHTTPServer:
    """Serve AOT artifact(s) — no checkpoints, data dir, or flax needed;
    each artifact's manifest kind assigns it to the lift or pose route."""
    from bilinear_tpu.io.aot import AOTServer

    servers = {}
    for path in args.aot:
        srv = AOTServer(path)
        if srv.kind in servers:
            raise ValueError(f"two {srv.kind!r} artifacts given: "
                             f"{servers[srv.kind].path!r} and {path!r}")
        servers[srv.kind] = srv
        if logger:
            logger.info(
                "aot %s: %s (epoch %d, jax %s, platforms %s, programs %s)",
                srv.kind, path, srv.epoch,
                srv.manifest.get("jax_version"),
                ",".join(srv.manifest.get("platforms", [])),
                ",".join(srv.manifest.get("programs", {})),
            )
    return PoseHTTPServer(
        lifting=servers.get("lifting"),
        end2end=servers.get("end2end"),
        host=args.host,
        port=args.port,
        max_delay_ms=args.max_delay_ms,
        max_rows=args.max_rows,
        max_pending_rows=args.max_pending_rows,
        reload_every=args.reload_every,
        logger=logger,
    )


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--kind", choices=["lifting", "end2end", "both"],
                   default="end2end")
    p.add_argument("--aot", nargs="+", default=[], metavar="ARTIFACT",
                   help="serve AOT artifact(s) (cli.export_aot output) "
                        "instead of checkpoints — route per manifest kind; "
                        "--run-dir/--data-dir are then not needed and "
                        "--reload-every polls the artifact files")
    p.add_argument("--run-dir", default="",
                   help="run dir holding parameter/{epoch}.save "
                        "(required unless --aot)")
    p.add_argument("--lifting-run-dir", default="",
                   help="separate run dir for the lifting model (kind=both)")
    p.add_argument("--data-dir", default="",
                   help="H36M dir (normalization stats come from its train "
                        "split; required unless --aot)")
    p.add_argument("--protocol", default=Protocol.GT)
    p.add_argument("--variant", default="torch7")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--quantize", default="",
                   choices=["", "int8", "int8-static"])
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8900)
    p.add_argument("--batch-sizes", type=int, nargs="+", default=[1, 8, 16],
                   help="compiled end2end sizes; 16 is the measured "
                        "conv-stack throughput peak "
                        "(benchmarks/detector_serving_sweep.py), >=32 "
                        "loses ~30%% to layout/HBM pressure")
    p.add_argument("--max-delay-ms", type=float, default=2.0)
    p.add_argument("--max-rows", type=int, default=256)
    p.add_argument("--max-pending-rows", type=int, default=8192,
                   help="admission-control bound; beyond it requests get 503")
    p.add_argument("--reload-every", type=float, default=30.0)
    p.add_argument("--interpret", action="store_true",
                   help="interpret-mode Pallas kernels (CPU testing)")
    p.add_argument("--warm", action="store_true",
                   help="pre-compile every dispatchable program shape "
                        "(lift TILE grid up to --max-rows, each pose "
                        "batch size) before accepting requests, so no "
                        "request ever rides a compile")
    p.add_argument("--n-stacks", type=int, default=0,
                   help="override hourglass size (0 = production 8/256/4)")
    p.add_argument("--features", type=int, default=256)
    p.add_argument("--depth", type=int, default=4)
    return p


def main(argv=None) -> None:
    parser = build_parser()
    args = parser.parse_args(argv)
    if not args.aot and not (args.run_dir and args.data_dir):
        parser.error("--run-dir and --data-dir are required unless --aot "
                     "artifacts are given")
    logging.basicConfig(
        level=logging.INFO, format="[%(levelname)s|serve] %(message)s"
    )
    logger = logging.getLogger("serve")
    server = build_server(args, logger)
    if args.warm:
        t0 = time.monotonic()
        warmed = server.warm()
        logger.info(
            "warmed %s in %.1f s", warmed, time.monotonic() - t0
        )
    logger.info("listening on http://%s:%d", server.host, server.port)
    server.serve_forever()


if __name__ == "__main__":
    main()
