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


# ---------------------------------------------------------------------------
# Detector learnability (learnable synthetic MPII: body-structured template
# + size/shape/hue-coded markers rendered at the keypoints)
# ---------------------------------------------------------------------------

def test_learnable_mpii_markers_at_keypoints(tmp_path):
    """learnable=True renders a bright marker at every annotated joint and
    keeps the default mode's schema (all 16 joints, one rect per image)."""
    import scipy.io
    from PIL import Image

    from bilinear_tpu.data.synthetic import write_mpii_dataset

    root = str(tmp_path / "MPII")
    write_mpii_dataset(root, n_train_images=3, n_test_images=1,
                       img_size=(200, 240), seed=7, learnable=True)
    m = scipy.io.loadmat(
        root + "/mpii_human_pose_v1_u12_2/mpii_human_pose_v1_u12_1.mat",
        squeeze_me=True, struct_as_record=False,
    )["RELEASE"]
    for i in range(3):
        a = m.annolist[i]
        rect = a.annorect if not isinstance(a.annorect, np.ndarray) else a.annorect[0]
        pts = np.atleast_1d(rect.annopoints.point)
        assert len(pts) == 16
        img = np.asarray(Image.open(f"{root}/images/{i:09d}.jpg"))
        for p in pts:
            x = int(round(float(p.x)))
            y = int(round(float(p.y)))
            px = img[np.clip(y, 0, img.shape[0] - 1),
                     np.clip(x, 0, img.shape[1] - 1)]
            assert int(px.max()) > 140, (i, int(p.id), px)
        # Background stays dim outside markers (dominant-contrast contract).
        assert img.mean() < 110


@pytest.mark.slow
def test_detector_learns_keypoints(tmp_path):
    """Full detector stack learnability: on the learnable synthetic MPII
    tree (markers ARE the supervision signal), MPII-protocol training —
    crop/rotate/flip/jitter augmentation, sum-of-stacks MSE, RMSprop —
    must lift valid-split PCKh@0.5 far above the ~3% chance floor that the
    unlearnable (noise-image) fixtures are stuck at by construction. This is
    the detector-side analogue of test_full_stack_learns_lifting: it would
    catch a sign/coordinate error anywhere in the canvas->crop->heatmap->
    decode->PCKh chain even while the MSE falls.

    Epoch count: 50, NOT fewer. The epoch-35 PCKh of this marginal config
    is genuinely nondeterministic run-to-run (measured 14-45 across five
    runs of IDENTICAL code+data in round 5 — XLA CPU parallel reductions
    compound over training and the tiny model sits on the marker-reading
    phase transition; a round-5 bisect across r3..r5 proved every commit
    statistically identical). By epoch 50 every measured run cleared 47
    (range 47.6-63.1), so the 25% gate discriminates a real coordinate bug
    (which pins PCKh at ~3) from this variance."""
    from bilinear_tpu.data.mpii import MPIIAnnotations
    from bilinear_tpu.data.pipeline import MPIIHostPipeline
    from bilinear_tpu.data.synthetic import write_mpii_dataset
    from bilinear_tpu.eval.pckh import evaluate_pckh
    from bilinear_tpu.eval.recalibrate import recalibrate
    from bilinear_tpu.models.hourglass_torch7 import MainModel
    from bilinear_tpu.train.hourglass import HourglassTrainer

    root = str(tmp_path / "MPII")
    write_mpii_dataset(root, n_train_images=60, n_test_images=2,
                       img_size=(256, 320), seed=0, learnable=True)
    anns_tr = MPIIAnnotations(root, Task.Train, split_seed=0)
    anns_va = MPIIAnnotations(root, Task.Valid)

    trainer = HourglassTrainer(batch_size=4, canvas=256)
    trainer.model = MainModel(n_stacks=1, features=32, depth=2)
    state = trainer.init_state(jax.random.PRNGKey(0))
    pipe = MPIIHostPipeline(anns_tr, batch_size=4, canvas=256, shuffle=True,
                            drop_last=True, seed=1)
    for epoch in range(50):
        state, _ = trainer.fit_epoch(state, pipe, epoch, jax.random.PRNGKey(2))

    stats = recalibrate(
        trainer.model, state.params, state.batch_stats,
        MPIIHostPipeline(anns_tr, 4, canvas=256, pad=True), max_batches=8,
    )
    _, avg = evaluate_pckh(
        trainer.model, {"params": state.params, "batch_stats": stats},
        MPIIHostPipeline(anns_va, 4, canvas=256, pad=True),
    )
    assert avg > 25.0, f"valid PCKh {avg:.1f}"


def test_learnable_h36m_tree_markers_and_floor(tmp_path):
    """write_h36m_learnable_dataset: MPII-id-coded markers land on the
    camera-projected joints that sh_convert's FROM_MPII_TO_H36M gather
    reads, and the lifting task has a small linear floor (2D determines 3D
    on the shared manifold)."""
    import pickle

    from PIL import Image

    from bilinear_tpu.data.synthetic import write_h36m_learnable_dataset
    from bilinear_tpu.ops.joints import FROM_MPII_TO_H36M

    d = write_h36m_learnable_dataset(
        str(tmp_path / "Human3.6M"), n_train=48, n_valid=16
    )
    splits = load_h36m(d)
    with open(d + "/train_GT.bin", "rb") as f:
        b = pickle.load(f)
    part = np.asarray(b["part"][0])
    img = np.asarray(Image.open(f"{d}/S1/{b['image'][0]}"))
    inv = {int(m): h for h, m in enumerate(FROM_MPII_TO_H36M) if h != 9}
    for m in range(16):
        x, y = part[inv[m]]
        px = img[int(round(y)), int(round(x))]
        assert int(px.max()) > 140, (m, px)

    tr, va = splits[Task.Train], splits[Task.Valid]
    X = np.concatenate([tr.part, np.ones((len(tr), 1))], 1)
    W, *_ = np.linalg.lstsq(X, tr.s, rcond=None)
    p = (np.concatenate([va.part, np.ones((len(va), 1))], 1) @ W) \
        * va.std_s + va.mean_s
    gt = va.raw_s.reshape(-1, 16, 3)
    floor = np.sqrt(((p.reshape(-1, 16, 3) - gt) ** 2).sum(2)).sum(1).mean() / 16
    assert floor < 10.0, floor
