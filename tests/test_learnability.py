"""End-to-end learnability: camera-projected synthetic poses from a shared
low-rank manifold (so 2D fully determines 3D — a linear regression floor of
~0.2 mm exists), run through the ENTIRE stack — GT-bin generation from real
calibration -> loader/normalization -> whole-epoch training -> MPJPE
protocol — must collapse MPJPE by >10x.

This validates the full pipeline end to end, not just that loss decreases:
a sign error anywhere (projection, normalization, un-normalization, metric)
would keep MPJPE high even as the MSE falls.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bilinear_tpu.data.camera import load_camera
from bilinear_tpu.data.h36m import Protocol, Task, load_h36m
from bilinear_tpu.data.h36m_generate import write_gt_bins
from bilinear_tpu.eval.mpjpe import evaluate_mpjpe
from bilinear_tpu.models.bilinear import BilinearUnit
from bilinear_tpu.train.bilinear import BilinearTrainer

CALIB = "/root/reference/calibration"
RANK = 5

_struct = np.random.RandomState(1234)
BASE = _struct.randn(17, 3) * 150
BASIS = _struct.randn(RANK, 17, 3) * 80


def _manifold_poses(n, seed):
    """Poses on ONE shared rank-5 affine manifold (train and valid differ
    only in the latent draws, so the mapping generalizes)."""
    z = np.random.RandomState(seed).randn(n, RANK)
    s = BASE[None] + np.einsum("nr,rjd->njd", z, BASIS)
    s[:, :, 2] += 5000.0
    return s.astype(np.float32)


def _names(n, tag):
    return [f"S1_Posing.54138969_{tag}{i:06d}.jpg" for i in range(n)]


def test_full_stack_learns_lifting(tmp_path):
    cam = load_camera(CALIB, "54138969")
    write_gt_bins(
        str(tmp_path),
        {
            Task.Train: {
                "S": _manifold_poses(4096, 0), "images": _names(4096, "t"),
                "camera": cam,
            },
            Task.Valid: {
                "S": _manifold_poses(512, 1), "images": _names(512, "v"),
                "camera": cam,
            },
        },
    )
    splits = load_h36m(str(tmp_path), Protocol.GT)
    train, valid = splits[Task.Train], splits[Task.Valid]

    # Sanity: the task has a (near-)zero linear floor, so it IS learnable.
    X = np.concatenate([train.part, np.ones((len(train), 1))], 1)
    W, *_ = np.linalg.lstsq(X, train.s, rcond=None)
    Xv = np.concatenate([valid.part, np.ones((len(valid), 1))], 1)
    p = (Xv @ W) * valid.std_s + valid.mean_s
    gt = valid.raw_s.reshape(-1, 16, 3)
    floor = np.sqrt(((p.reshape(-1, 16, 3) - gt) ** 2).sum(2)).sum(1).mean() / 16
    assert floor < 5.0, floor

    trainer = BilinearTrainer(batch_size=64, dropout=0.0)
    trainer.model = BilinearUnit(hidden=256, dropout=0.0)  # CPU-sized
    state = trainer.init_state(jax.random.PRNGKey(0))
    x, y = jnp.asarray(train.part), jnp.asarray(train.s)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    _, mpjpe_init = evaluate_mpjpe(trainer.model, variables, valid, chunk=512)

    for e in range(1, 11):
        state, _ = trainer.train_epoch(
            state, x, y, jax.random.fold_in(jax.random.PRNGKey(1), e)
        )

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    _, mpjpe = evaluate_mpjpe(trainer.model, variables, valid, chunk=512)

    assert mpjpe < 0.1 * mpjpe_init, (mpjpe_init, mpjpe)
    assert mpjpe < 100.0  # observed ~45 mm at 10 epochs; floor ~0.2 mm
