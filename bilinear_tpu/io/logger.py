"""Run logging with the reference's artifact contract (util/log.py:6-28):

- run dir  : save/{comment}/   (timestamp when comment is None)
- log file : save/{comment}/debug.log, plus console, both at DEBUG with the
             format '[LEVEL|file:line] time > message'
- the returned log_dir anchors checkpoints (parameter/) and TensorBoard
  events (visualize/), exactly like the reference's train scripts.
"""
from __future__ import annotations

import logging
import os
from datetime import datetime
from typing import Optional, Tuple

FORMAT = "[%(levelname)s|%(filename)s:%(lineno)s] %(asctime)s > %(message)s"


def get_logger(
    comment: Optional[str] = None, save_root: str = "save"
) -> Tuple[logging.Logger, str, str]:
    if comment is None:
        comment = datetime.now().strftime("%b%d_%H-%M-%S")

    log_dir = os.path.join(save_root, comment)
    os.makedirs(log_dir, exist_ok=True)

    formatter = logging.Formatter(FORMAT)
    logger = logging.getLogger("bilinear_tpu")
    logger.setLevel(logging.DEBUG)
    logger.propagate = False

    # Idempotent across repeated get_logger calls in one process.
    wanted_file = os.path.abspath(os.path.join(log_dir, "debug.log"))
    have_file = any(
        isinstance(h, logging.FileHandler)
        and getattr(h, "baseFilename", None) == wanted_file
        for h in logger.handlers
    )
    if not have_file:
        fh = logging.FileHandler(wanted_file)
        fh.setFormatter(formatter)
        logger.addHandler(fh)
    if not any(
        type(h) is logging.StreamHandler for h in logger.handlers
    ):
        sh = logging.StreamHandler()
        sh.setFormatter(formatter)
        logger.addHandler(sh)

    return logger, log_dir, comment
