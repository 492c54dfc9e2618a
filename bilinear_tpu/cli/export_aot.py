"""Export a trained checkpoint to a self-contained AOT serving artifact.

Captures the serving program (StableHLO via jax.export) + weights +
normalization stats into ONE file a deployment box runs with jax alone —
no flax, no checkpoint format, no framework (io/aot.py's loader half).
The reference has no deployment path at all (its online path is broken,
/root/reference/webcam.py:6-11).

Usage:
  # 2D->3D lifting, one symbolic-batch program, runs on cpu AND tpu:
  python -m bilinear_tpu.cli.export_aot --kind lifting \
      --run-dir "save/Bilinear GT" --data-dir data/Human3.6M \
      --out lifting.aot --platforms cpu tpu

  # fused frame->3D at the serving batch sizes:
  python -m bilinear_tpu.cli.export_aot --kind end2end \
      --run-dir save/End2End --data-dir data/Human3.6M \
      --out end2end.aot --batch-sizes 1 8 16
"""
from __future__ import annotations

import argparse
import logging
import os

from bilinear_tpu.config import apply_platform_override

apply_platform_override()  # before any backend touch (same as parse_config)

import jax
import jax.numpy as jnp

from bilinear_tpu.data.h36m import Protocol, Task, load_h36m
from bilinear_tpu.io.aot import export_end2end, export_lifting, save_artifact
from bilinear_tpu.io.checkpoint import resume_or_init


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--kind", choices=["lifting", "end2end"], required=True)
    p.add_argument("--run-dir", required=True,
                   help="run dir holding parameter/{epoch}.save")
    p.add_argument("--data-dir", required=True,
                   help="H36M dir (normalization stats from its train split)")
    p.add_argument("--out", required=True, help="artifact path to write")
    p.add_argument("--protocol", default=Protocol.GT)
    p.add_argument("--variant", default="torch7")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--platforms", nargs="*", default=None,
                   help="lowering targets, e.g. --platforms cpu tpu "
                        "(default: the current backend)")
    p.add_argument("--quantize", default="", choices=["", "int8-static"],
                   help="lifting only: export the calibrated static-scale "
                        "int8 program (38M poses/sec on-chip vs 20-21M bf16)")
    p.add_argument("--batch-sizes", type=int, nargs="+", default=None,
                   help="fixed batch sizes; lifting default is one "
                        "symbolic-batch program, end2end default 1 8 16")
    p.add_argument("--n-stacks", type=int, default=0,
                   help="override hourglass size (0 = production 8/256/4)")
    p.add_argument("--features", type=int, default=256)
    p.add_argument("--depth", type=int, default=4)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    logging.basicConfig(
        level=logging.INFO, format="[%(levelname)s|export_aot] %(message)s"
    )
    log = logging.getLogger("export_aot")
    splits = load_h36m(args.data_dir, args.protocol)
    train = splits[Task.Train]
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    parameter_dir = os.path.join(args.run_dir, "parameter")

    if args.kind == "lifting":
        from bilinear_tpu.train.bilinear import BilinearTrainer

        template = BilinearTrainer().init_state(jax.random.PRNGKey(0))
        state, epoch = resume_or_init(template, parameter_dir)
        if epoch == 0:
            raise FileNotFoundError(
                f"no checkpoint under {parameter_dir!r} — refusing to export "
                "uninitialized weights"
            )
        programs = export_lifting(
            state.params, state.batch_stats,
            train.mean_part, train.std_part, train.mean_s, train.std_s,
            dtype=dtype, platforms=args.platforms,
            batch_sizes=args.batch_sizes,
            quantize=args.quantize or None,
            calib_sample=train.part,  # z-scored train inputs (int8-static)
        )
    else:
        if args.quantize:
            raise SystemExit(
                "--quantize applies to --kind lifting only (detector int8 "
                "is measured NOT faster than bf16 on v5e — RESULTS.md)"
            )
        from bilinear_tpu.train.end2end import End2EndTrainer

        model_kw = None
        if args.n_stacks:
            model_kw = dict(n_stacks=args.n_stacks, features=args.features,
                            depth=args.depth)
        trainer = End2EndTrainer(variant=args.variant, model_kw=model_kw)
        template = trainer.init_state(
            jax.random.PRNGKey(0),
            jnp.asarray(train.mean_part), jnp.asarray(train.std_part),
        )
        state, epoch = resume_or_init(template, parameter_dir)
        if epoch == 0:
            raise FileNotFoundError(
                f"no checkpoint under {parameter_dir!r} — refusing to export "
                "uninitialized weights"
            )
        programs = export_end2end(
            {"params": state.params, "batch_stats": state.batch_stats},
            train.mean_part, train.std_part, train.mean_s, train.std_s,
            variant=args.variant, dtype=dtype, model_kw=model_kw,
            batch_sizes=args.batch_sizes or (1, 8, 16),
            platforms=args.platforms,
        )

    # The int8-static program fixes its own dtypes (int8 hidden layers,
    # bf16 encode/decode); recording the user's --dtype would mislabel it.
    dtype_recorded = "int8/bfloat16" if args.quantize else args.dtype
    if args.quantize and args.dtype == "float32":
        log.warning("--dtype float32 has no effect with --quantize %s "
                    "(encode/decode are bf16, hidden layers int8)",
                    args.quantize)
    manifest = save_artifact(
        args.out, args.kind, programs,
        manifest_extra={"epoch": epoch, "dtype": dtype_recorded,
                        "quantize": args.quantize or None,
                        "run_dir": os.path.abspath(args.run_dir)},
    )
    size = os.path.getsize(args.out)
    log.info("wrote %s (%.1f MB): kind=%s epoch=%d platforms=%s programs=%s",
             args.out, size / 1e6, manifest["kind"], epoch,
             ",".join(manifest["platforms"]),
             ",".join(manifest["programs"]))


if __name__ == "__main__":
    main()
