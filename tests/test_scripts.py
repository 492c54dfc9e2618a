"""The outer driver scripts (scripts/{bilinear,hourglass}.sh — the
reference's bilinear.sh x40 / hourglass.sh x20 contracts) actually execute:
alternate train/valid invocations with all cross-invocation state in
checkpoints."""
import json
import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bilinear_sh_alternates_and_resumes(tmp_path):
    """4 sequential CPU jax invocations: minutes on this 1-core box, so
    slow-marked (default-on, like the parity harnesses)."""
    from bilinear_tpu.data.synthetic import write_h36m_dataset

    data_dir = str(tmp_path / "Human3.6M")
    write_h36m_dataset(data_dir, n_train=96, n_valid=32)

    env = dict(os.environ)
    env["RUNS"] = "2"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    # sitecustomize re-pins JAX_PLATFORMS in every subprocess; the CLIs read
    # this and force the platform via jax.config (config.apply_platform_override)
    env["BILINEAR_TPU_PLATFORM"] = "cpu"
    proc = subprocess.run(
        [
            "bash", os.path.join(REPO, "scripts", "bilinear.sh"),
            "--data-dir", data_dir, "--epochs-per-run", "1",
            "--batch-size", "32", "--save-root", str(tmp_path / "save"),
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=2400,
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-4000:])

    # 2 runs x 1 epoch -> checkpoints 1, 2; run 2 resumed from epoch 1.
    pdir = tmp_path / "save" / "Bilinear GT" / "parameter"
    epochs = sorted(int(p.name.split(".")[0]) for p in pdir.glob("*.save"))
    assert epochs == [1, 2]
    log = (tmp_path / "save" / "Bilinear GT" / "debug.log").read_text()
    assert "Resumed from epoch 1" in log

    # valid_bilinear ran after each train block and recorded MPJPE.
    mpjpe_files = sorted(
        (tmp_path / "save" / "Bilinear GT").glob("mpjpe_epoch*.json")
    )
    assert len(mpjpe_files) >= 2
    payload = json.loads(mpjpe_files[-1].read_text())
    assert payload["epoch"] == 2
    assert payload["overall"] > 0 and payload["per_action"]


@pytest.mark.slow
def test_hourglass_sh_alternates_and_resumes(tmp_path):
    """The detector's outer driver (hourglass.sh): 2 runs x 1 epoch at tiny
    model size, PCKh validation (BN recalibration + flip TTA) after each
    block, resume across invocations."""
    from bilinear_tpu.data.synthetic import write_mpii_dataset

    data_dir = str(tmp_path / "MPII")
    write_mpii_dataset(data_dir, n_train_images=8, n_test_images=1)

    env = dict(os.environ)
    env["RUNS"] = "2"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    # sitecustomize re-pins JAX_PLATFORMS in every subprocess; the CLIs read
    # this and force the platform via jax.config (config.apply_platform_override)
    env["BILINEAR_TPU_PLATFORM"] = "cpu"
    proc = subprocess.run(
        [
            "bash", os.path.join(REPO, "scripts", "hourglass.sh"),
            "--data-dir", data_dir, "--epochs-per-run", "1",
            "--batch-size", "4", "--canvas", "128",
            "--n-stacks", "1", "--features", "8", "--depth", "1",
            "--steps-per-dispatch", "1",
            "--save-root", str(tmp_path / "save"),
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=2400,
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-4000:])

    pdir = tmp_path / "save" / "Hourglass" / "parameter"
    epochs = sorted(int(p.name.split(".")[0]) for p in pdir.glob("*.save"))
    assert epochs == [1, 2]
    log = (tmp_path / "save" / "Hourglass" / "debug.log").read_text()
    assert "Resumed from epoch 1" in log

    pckh_files = sorted(
        (tmp_path / "save" / "Hourglass").glob("pckh_epoch*.json")
    )
    assert len(pckh_files) >= 2
    payload = json.loads(pckh_files[-1].read_text())
    assert payload["epoch"] == 2
    # PCKh is reported in PERCENT (eval/pckh.py:85-88, matching the
    # reference's valid_hourglass.py:138-142 log convention).
    assert 0.0 <= payload["avg"] <= 100.0 and payload["per_joint"]
