"""The complete SH+FT protocol loop as ONE scripted flow through the real
CLI entry points (SURVEY.md §3.5, H36M/protocol.py:1-4):

    train_hourglass (MPII)  ->  train_hourglass_FT (H36M, preact)
    ->  sh_preprocess --protocol-out SH+FT  ->  train_bilinear --protocol SH+FT
    ->  valid_bilinear MPJPE

Round 1 tested each stage in isolation; this chains all five CLIs on
synthetic data, sharing one save root, exactly as a user would run them.
"""
import json
import os

import numpy as np

from bilinear_tpu.cli import (
    sh_preprocess,
    train_bilinear,
    train_hourglass,
    train_hourglass_ft,
    valid_bilinear,
)
from bilinear_tpu.data.h36m import Protocol, Task, load_h36m
from bilinear_tpu.data.synthetic import write_h36m_dataset, write_mpii_dataset

TINY = ["--n-stacks", "1", "--features", "8", "--depth", "1"]


def test_sh_ft_protocol_chain(tmp_path):
    h36m = write_h36m_dataset(
        str(tmp_path / "Human3.6M"), n_train=24, n_valid=8, with_images=True
    )
    mpii = write_mpii_dataset(str(tmp_path / "MPII"), n_train_images=6)
    sroot = str(tmp_path / "save")
    hg_common = [
        "--batch-size", "4", "--epochs-per-run", "1",
        "--steps-per-dispatch", "1", "--save-root", sroot,
    ] + TINY

    # 1. MPII detector training (torch7 variant, train_hourglass.py).
    train_hourglass.main(["--data-dir", mpii] + hg_common)
    assert os.path.exists(os.path.join(sroot, "Hourglass", "parameter", "1.save"))

    # 2. H36M fine-tune (preact variant, train_hourglass_FT.py).
    train_hourglass_ft.main(["--data-dir", h36m] + hg_common)
    assert os.path.exists(
        os.path.join(sroot, "Hourglass FT", "parameter", "1.save")
    )

    # 3. The notebook replacement: FT detections -> {train,valid}_SH+FT.bin.
    sh_preprocess.main(
        [
            "--comment", "Hourglass FT", "--variant", "preact",
            "--h36m-dir", h36m, "--protocol-out", "SH+FT",
            "--batch-size", "4", "--save-root", sroot,
        ]
        + TINY
    )
    for task in ("train", "valid"):
        assert os.path.exists(os.path.join(h36m, f"{task}_SH+FT.bin"))
    sh_ft = load_h36m(h36m, Protocol.SH_FT)
    gt = load_h36m(h36m, Protocol.GT)
    # Detections replace the GT 2D source; 3D targets are untouched.
    assert not np.allclose(
        sh_ft[Task.Train].raw_part, gt[Task.Train].raw_part
    )
    np.testing.assert_allclose(sh_ft[Task.Train].raw_s, gt[Task.Train].raw_s)

    # 4. Lift from the detections (train_bilinear.py with Protocol.SH_FT).
    bl_common = [
        "--data-dir", h36m, "--protocol", "SH+FT",
        "--comment", "Bilinear SH+FT", "--save-root", sroot,
        "--batch-size", "8",
    ]
    train_bilinear.main(bl_common + ["--epochs-per-run", "2"])
    assert os.path.exists(
        os.path.join(sroot, "Bilinear SH+FT", "parameter", "2.save")
    )

    # 5. MPJPE eval (valid_bilinear.py) -> machine-readable metrics file.
    valid_bilinear.main(bl_common)
    with open(os.path.join(sroot, "Bilinear SH+FT", "mpjpe_epoch2.json")) as f:
        metrics = json.load(f)
    assert np.isfinite(metrics["overall"])
    assert metrics["per_action"]
