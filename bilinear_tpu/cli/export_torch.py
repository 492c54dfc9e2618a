"""Export our newest checkpoint to the reference's torch format.

The reverse of the torch->ours migration (utils/torch_compat.py): writes a
``{epoch}.save`` torch checkpoint ({'epoch','step','state','optimizer'},
train_bilinear.py:96-104) that the reference's own ``model.*.load()``
resumes from — weights, BN running stats, and optimizer moments included —
so models trained in this framework can be taken back to the reference
(or any torch consumer of its checkpoint format).

Usage:
  python -m bilinear_tpu.cli.export_torch --family bilinear \
      --save-root save --out-dir /path/to/torch/parameter
"""
from __future__ import annotations

import argparse
import os

import jax

from bilinear_tpu.config import apply_platform_override
from bilinear_tpu.io.checkpoint import latest_epoch, load_checkpoint, restore_state
from bilinear_tpu.io.logger import get_logger
from bilinear_tpu.utils.torch_compat import (
    save_reference_bilinear_checkpoint,
    save_reference_hourglass_checkpoint,
)

_DEFAULT_COMMENT = {
    "bilinear": "Bilinear GT",
    "hourglass": "Hourglass",
    "hourglass_ft": "Hourglass FT",
}


def main(argv=None) -> None:
    apply_platform_override()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--family", choices=sorted(_DEFAULT_COMMENT), required=True)
    p.add_argument("--save-root", default="save")
    p.add_argument("--comment", default=None,
                   help="run dir name; defaults to the family's usual comment")
    p.add_argument("--out-dir", default=None,
                   help="where to write {epoch}.save (default: "
                        "<run dir>/torch_export)")
    p.add_argument("--learning-rate", type=float, default=None,
                   help="lr recorded in the exported optimizer param_group "
                        "(default: the family's reference lr)")
    p.add_argument("--n-stacks", type=int, default=None)
    p.add_argument("--features", type=int, default=None)
    p.add_argument("--depth", type=int, default=None)
    args = p.parse_args(argv)

    comment = args.comment or _DEFAULT_COMMENT[args.family]
    logger, log_dir, _ = get_logger(comment, args.save_root)
    parameter_dir = os.path.join(log_dir, "parameter")
    out_dir = args.out_dir or os.path.join(log_dir, "torch_export")

    epoch = latest_epoch(parameter_dir)
    if epoch <= 0:
        raise SystemExit(f"no checkpoint found under {parameter_dir}")

    if args.family == "bilinear":
        from bilinear_tpu.train.bilinear import BilinearTrainer

        trainer = BilinearTrainer()
        lr = args.learning_rate or 1e-3
    else:
        from bilinear_tpu.train.hourglass import HourglassTrainer

        trainer = HourglassTrainer(
            variant="torch7" if args.family == "hourglass" else "preact",
            n_stacks=args.n_stacks, features=args.features, depth=args.depth,
        )
        lr = args.learning_rate or 2.5e-4

    template = trainer.init_state(jax.random.PRNGKey(0))
    state = restore_state(template, load_checkpoint(parameter_dir, epoch))

    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, f"{epoch}.save")
    if args.family == "bilinear":
        save_reference_bilinear_checkpoint(out_path, state, epoch, lr)
    else:
        save_reference_hourglass_checkpoint(
            out_path, state, epoch,
            family="torch7" if args.family == "hourglass" else "preact",
            learning_rate=lr,
        )
    logger.info("Exported epoch %d -> %s", epoch, out_path)
    print(out_path)


if __name__ == "__main__":
    main()
