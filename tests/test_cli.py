"""CLI entry points driven in-process on CPU with synthetic data: the same
surface a user hits, minus the TPU."""
import json
import os

import numpy as np
import pytest

from bilinear_tpu.cli import train_bilinear, valid_bilinear
from bilinear_tpu.data.synthetic import write_h36m_dataset


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    data = str(tmp_path_factory.mktemp("Human3.6M"))
    write_h36m_dataset(data, n_train=200, n_valid=64)
    save = str(tmp_path_factory.mktemp("save"))
    return data, save


def test_train_then_valid_then_resume(env):
    data, save = env
    args = [
        "--data-dir", data, "--save-root", save, "--batch-size", "64",
        "--epochs-per-run", "2", "--comment", "Bilinear GT",
    ]
    train_bilinear.main(args)
    pdir = os.path.join(save, "Bilinear GT", "parameter")
    assert sorted(os.listdir(pdir)) == ["1.save", "2.save"]

    valid_bilinear.main(args)
    report = os.path.join(save, "Bilinear GT", "mpjpe_epoch2.json")
    with open(report) as f:
        payload = json.load(f)
    assert payload["epoch"] == 2
    assert np.isfinite(payload["overall"])
    assert set(payload["per_action"])  # per-action table present

    # Second invocation resumes and extends.
    train_bilinear.main(args)
    assert "4.save" in os.listdir(pdir)

    # Artifacts contract: debug.log + TB events dir.
    assert os.path.exists(os.path.join(save, "Bilinear GT", "debug.log"))
    assert os.path.isdir(os.path.join(save, "Bilinear GT", "visualize"))


def test_train_bilinear_debug_nans_flag(env):
    """--debug-nans wires utils.debug.debug_mode around the fit: a healthy
    run completes (and checkpoints) with NaN-trapping active."""
    data, save = env
    train_bilinear.main([
        "--data-dir", data, "--save-root", save, "--batch-size", "64",
        "--epochs-per-run", "1", "--comment", "Bilinear NaNguard",
        "--debug-nans", "true",
    ])
    pdir = os.path.join(save, "Bilinear NaNguard", "parameter")
    assert "1.save" in os.listdir(pdir)


def test_webcam_synthetic_smoke(tmp_path, env):
    """The demo path end-to-end with a tiny fused model (checkpoint-free)."""
    from bilinear_tpu.cli import webcam

    # No checkpoint -> fresh-init full model would be slow on CPU; only
    # exercise the frame plumbing + drawing with a stub forward.
    frames = list(webcam.synthetic_frames(2))
    assert frames[0].shape == (256, 256, 3)
    pose = np.asarray([[10.0, 20.0], [100.0, 200.0]], np.float32)
    overlay = webcam.draw_keypoints(frames[0], pose)
    assert overlay.shape == (1024, 1024, 3)
    assert (overlay[80:84, 40:44] == (255, 0, 0)).all()
