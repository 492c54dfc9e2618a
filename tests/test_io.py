"""io layer: visualizer parity vs a torch transcription of the reference,
logger artifact contract, config CLI overrides."""
import logging
import os

import numpy as np
import pytest

import jax.numpy as jnp
import torch

from bilinear_tpu.config import BilinearConfig, HourglassConfig, parse_config
from bilinear_tpu.io.logger import get_logger
from bilinear_tpu.io.visualize import COLOR_SPECTRUM, colorize, overlap, upscale_nchw


def _torch_colorize(heatmaps, lut):
    """Transcription of util/visualize.py:19-32."""
    lut = torch.from_numpy(lut)
    t = torch.from_numpy(heatmaps)
    batch, _, h, w = t.shape
    t, _ = t.max(dim=1)
    t = t.view(-1)
    index = t.mul(len(lut) - 1).clamp(0, len(lut) - 1)
    lo, hi = index.floor(), index.ceil()
    rate = (index - lo).view(-1, 1)
    out = lut.index_select(0, lo.long()) * (1 - rate) + lut.index_select(
        0, hi.long()
    ) * rate
    return out.view(batch, h, w, 3).permute(0, 3, 1, 2).numpy()


def test_colorize_matches_reference_transcription():
    rng = np.random.RandomState(0)
    hm = rng.rand(2, 16, 8, 8).astype(np.float32)
    ours = np.asarray(colorize(jnp.asarray(hm)))
    ref = _torch_colorize(hm, COLOR_SPECTRUM)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_overlap_blend():
    a = jnp.ones((1, 3, 4, 4))
    b = jnp.zeros((1, 3, 4, 4))
    np.testing.assert_allclose(np.asarray(overlap(a, b, 0.25)), 0.25)


def test_upscale_nearest():
    x = jnp.asarray(np.arange(4).reshape(1, 1, 2, 2).astype(np.float32))
    up = np.asarray(upscale_nchw(x, 2))
    assert up.shape == (1, 1, 4, 4)
    assert up[0, 0, 0, 0] == up[0, 0, 1, 1] == 0
    assert up[0, 0, 3, 3] == 3


def test_logger_contract(tmp_path):
    """save/{comment}/debug.log + console, '[LEVEL|file:line] time > msg'
    format (util/log.py:6-28)."""
    logger, log_dir, comment = get_logger("TestRun", save_root=str(tmp_path))
    assert comment == "TestRun"
    assert log_dir == os.path.join(str(tmp_path), "TestRun")
    logger.info("hello contract")
    for h in logger.handlers:
        h.flush()
    content = open(os.path.join(log_dir, "debug.log")).read()
    assert "hello contract" in content
    assert "[INFO|" in content and "] " in content and " > " in content
    # Timestamped dir when comment is None.
    _, anon_dir, anon = get_logger(None, save_root=str(tmp_path))
    assert os.path.isdir(anon_dir) and anon != "TestRun"


def test_config_cli_overrides():
    cfg = parse_config(
        BilinearConfig(),
        ["--batch-size", "128", "--protocol", "SH", "--comment", "Bilinear SH"],
    )
    assert cfg.batch_size == 128
    assert cfg.protocol == "SH"
    assert cfg.comment == "Bilinear SH"
    # Defaults preserved, lr schedule block untouched.
    assert cfg.lr_decay.base_lr == 1e-3
    hg = parse_config(HourglassConfig(), ["--variant", "preact"])
    assert hg.variant == "preact"
    assert hg.batch_size == 8  # reference default (util/config.py:7)
