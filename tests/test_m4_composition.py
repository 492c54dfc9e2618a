"""M4 integration: hourglass-FT on H36M heatmaps, GT->SH conversion feeding
the SH lifting protocol, the fused End2End program, and the MPII test-set
export + converter."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bilinear_tpu.data.h36m import Protocol, Task, load_h36m
from bilinear_tpu.data.h36m_images import H36MImageRecords
from bilinear_tpu.data.mpii import MPIITestAnnotations
from bilinear_tpu.data.pipeline import MPIIHostPipeline
from bilinear_tpu.data.sh_convert import convert_gt_to_sh
from bilinear_tpu.data.synthetic import write_h36m_dataset, write_mpii_dataset
from bilinear_tpu.eval.mpii_test_export import convert_predictions, export_predictions
from bilinear_tpu.models.end2end import End2End, assemble_variables
from bilinear_tpu.models.hourglass_torch7 import MainModel
from bilinear_tpu.ops.joints import FROM_H36M_TO_MPII, FROM_MPII_TO_H36M
from bilinear_tpu.train.end2end import End2EndTrainer
from bilinear_tpu.train.hourglass import HourglassTrainer


@pytest.fixture(scope="module")
def h36m_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("Human3.6M")
    return write_h36m_dataset(str(d), n_train=24, n_valid=8, with_images=True)


@pytest.fixture(scope="module")
def small_hourglass():
    t = HourglassTrainer(
        batch_size=4, canvas=256, joint_remap=FROM_H36M_TO_MPII, flip_prob=0.0
    )
    t.model = MainModel(n_stacks=2, features=16, depth=2)
    return t


def test_hourglass_ft_trains_on_h36m(h36m_dir, small_hourglass):
    splits = load_h36m(h36m_dir, Protocol.GT)
    records = H36MImageRecords(splits[Task.Train], h36m_dir)
    pipe = MPIIHostPipeline(records, 4, canvas=256, shuffle=True, drop_last=True)
    state = small_hourglass.init_state(jax.random.PRNGKey(0))
    losses = []
    for epoch in range(2):
        state, loss = small_hourglass.fit_epoch(
            state, pipe, epoch, jax.random.PRNGKey(1)
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_sh_convert_roundtrip(h36m_dir, small_hourglass):
    """GT->SH conversion writes schema-exact bins loadable via Protocol.SH."""
    state = small_hourglass.init_state(jax.random.PRNGKey(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    written = convert_gt_to_sh(
        small_hourglass.model, variables, h36m_dir, batch_size=4, canvas=256
    )
    assert set(written) == {Task.Train, Task.Valid}
    splits = load_h36m(h36m_dir, Protocol.SH)
    tr = splits[Task.Train]
    assert tr.part.shape[1] == 32
    # Detections differ from GT but live in image space (0..256 canvas).
    gt = load_h36m(h36m_dir, Protocol.GT)[Task.Train]
    assert not np.allclose(tr.raw_part, gt.raw_part)
    assert np.abs(tr.raw_part).max() < 1000
    # 3D targets are untouched.
    np.testing.assert_allclose(tr.raw_s, gt.raw_s)


def test_joint_remap_roundtrip():
    """H36M->MPII->H36M-17: thorax duplication makes the maps consistent."""
    mpii_from_h36m = np.asarray(FROM_H36M_TO_MPII)
    h36m_from_mpii = np.asarray(FROM_MPII_TO_H36M)
    # Round trip through MPII order: every H36M-16 joint recoverable.
    x = np.arange(16)
    as_mpii = x[mpii_from_h36m]  # 16 MPII-ordered
    back17 = as_mpii[h36m_from_mpii]  # 17 H36M-ordered
    # Slots 9 and 10 both carry the thorax (H36M16 index 9).
    assert back17[9] == back17[10]
    # Deleting slot 9 recovers the original 16 exactly.
    np.testing.assert_array_equal(np.delete(back17, 9), x)


def test_end2end_fused_forward(h36m_dir):
    splits = load_h36m(h36m_dir, Protocol.GT)
    tr = splits[Task.Train]
    from bilinear_tpu.models.bilinear import BilinearUnit

    class TinyE2E(End2End):  # CPU-sized hourglass
        def setup(self):
            self.hourglass = MainModel(
                n_stacks=2, features=16, depth=2, name="hourglass"
            )
            self.bilinear = BilinearUnit(name="bilinear")

    model = TinyE2E()
    images = jnp.asarray(np.random.RandomState(0).rand(2, 256, 256, 3), jnp.float32)
    centers = jnp.asarray([[128.0, 128.0]] * 2)
    scales = jnp.asarray([1.0, 1.2])
    mean = jnp.asarray(tr.mean_part)
    std = jnp.asarray(tr.std_part)
    variables = model.init(
        jax.random.PRNGKey(0), images, centers, scales, mean, std, train=False
    )
    fwd = jax.jit(
        lambda v, im: model.apply(v, im, centers, scales, mean, std, train=False)
    )
    heatmaps, pose2d, pose3d = fwd(variables, images)
    assert heatmaps.shape == (2, 2, 64, 64, 16)
    assert pose2d.shape == (2, 16, 2)
    assert pose3d.shape == (2, 48)
    assert np.isfinite(np.asarray(pose3d)).all()
    # Fused program is differentiable end-to-end: 3D loss reaches the stem.
    def loss(v):
        _, _, p3 = model.apply(v, images, centers, scales, mean, std, train=False)
        return jnp.sum(p3**2)

    g = jax.grad(lambda p: loss({"params": p, "batch_stats": variables["batch_stats"]}))(
        variables["params"]
    )
    stem = g["hourglass"]["stem_conv"]["kernel"]
    assert float(jnp.abs(stem).max()) > 0


def test_end2end_assemble_variables():
    hg = {"params": {"a": 1}, "batch_stats": {"b": 2}}
    bi = {"params": {"c": 3}, "batch_stats": {"d": 4}}
    v = assemble_variables(hg, bi)
    assert v["params"]["hourglass"]["a"] == 1
    assert v["batch_stats"]["bilinear"]["d"] == 4


@pytest.fixture(scope="module")
def mpii_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("MPII")
    write_mpii_dataset(str(root), n_train_images=6, n_test_images=4)
    from bilinear_tpu.data.mpii import MPIIAnnotations
    from bilinear_tpu.data.h36m import Task as _Task
    MPIIAnnotations(str(root), _Task.Train, split_seed=0)
    return str(root)


class _DeltaModel:
    """Fake detector: every joint's last-stack heatmap peaks at exactly
    (y=20, x=45), regardless of input."""

    def apply(self, variables, crops, train=False):
        b = crops.shape[0]
        hm = jnp.zeros((1, b, 64, 64, 16))
        return hm.at[:, :, 20, 45, :].set(1.0)


def test_export_coordinates_are_original_image_space(mpii_dir, tmp_path):
    """Regression for the canvas-frame bug: the pipeline's batch
    centers/scales are canvas-space (shifted by the crop offset ul and
    divided by the downscale f), so decoding with them exports canvas
    coordinates. The official toolkit needs original-frame pixels: with a
    known heatmap peak p, every exported point must equal
    rec.center + (p - 32)/64 * 200 * rec.scale with the ORIGINAL record
    values (eval_hourglass.py:148-156)."""
    annotations = MPIITestAnnotations(mpii_dir)
    pred_dir = str(tmp_path / "pred_frame")
    n = export_predictions(
        _DeltaModel(), {}, annotations, pred_dir, batch_size=2, canvas=256
    )
    assert n == len(annotations)
    p = np.asarray([45.0, 20.0], np.float32)  # (x, y) heatmap peak
    for i in range(len(annotations)):
        rec = annotations.record(i)
        expected = rec.center + (p - 32.0) / 64.0 * (200.0 * rec.scale)
        got = np.loadtxt(
            os.path.join(pred_dir, f"{rec.img_idx}.{rec.r_idx}.txt")
        )[:, 1:]
        np.testing.assert_allclose(got, np.tile(expected, (16, 1)), atol=1e-3)
    # Discriminating power: canvas-space decode differs from original-space
    # by the crop offset ul = center - 100*scale*margin; require that at
    # least one record's offset is visibly large so the buggy path could
    # not have passed.
    offsets = [
        np.abs(annotations.record(i).center - 128.0).max()
        for i in range(len(annotations))
    ]
    assert max(offsets) > 25.0


def test_mpii_test_export_and_converter(mpii_dir, tmp_path):
    annotations = MPIITestAnnotations(mpii_dir)
    assert len(annotations) > 0
    # Subset-relative 1-based indices.
    assert min(r.img_idx for r in annotations.entries) == 1
    # Test-set centers have NO +15*scale shift.
    rec = annotations.record(0)

    trainer = HourglassTrainer(batch_size=2, canvas=256)
    trainer.model = MainModel(n_stacks=2, features=16, depth=2)
    state = trainer.init_state(jax.random.PRNGKey(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    pred_dir = str(tmp_path / "prediction")
    n = export_predictions(
        trainer.model, variables, annotations, pred_dir, batch_size=2, canvas=256
    )
    assert n == len(annotations)
    files = os.listdir(pred_dir)
    assert len(files) == n
    sample = np.loadtxt(os.path.join(pred_dir, files[0]))
    assert sample.shape == (16, 3)
    np.testing.assert_array_equal(sample[:, 0], np.arange(16))

    out_mat = str(tmp_path / "pred_keypoints_mpii.mat")
    injected = convert_predictions(mpii_dir, pred_dir, out_mat)
    assert injected == n
    # Round-trip: the saved struct carries our predictions.
    import scipy.io

    pred = scipy.io.loadmat(out_mat, squeeze_me=True, struct_as_record=False)["pred"]
    pred = list(np.atleast_1d(pred))
    pts = None
    for img in pred:
        rects = img.annorect
        for r in np.atleast_1d(rects):
            ap = getattr(r, "annopoints", None)
            if ap is not None:
                pts = np.atleast_1d(ap.point)
                break
        if pts is not None:
            break
    assert pts is not None and len(pts) == 16


def test_end2end_trainer_decreases_joint_loss(h36m_dir):
    """VERDICT r4 #4a: End2EndTrainer.train_step must actually TRAIN — the
    joint loss decreases over repeated steps and the DETECTOR parameters
    move (the 3D term reaching the stem is tested elsewhere; this pins the
    optimizer path end-to-end). Mirrors the cli/train_end2end.py batch
    contract (train_end2end.py:101-114)."""
    splits = load_h36m(h36m_dir, Protocol.GT)
    train = splits[Task.Train]
    records = H36MImageRecords(train, h36m_dir)
    pipe = MPIIHostPipeline(records, 4, shuffle=True, seed=0, drop_last=True)
    trainer = End2EndTrainer(
        batch_size=4, model_kw=dict(n_stacks=1, features=8, depth=1)
    )
    mean_part = jnp.asarray(train.mean_part)
    std_part = jnp.asarray(train.std_part)
    state = trainer.init_state(jax.random.PRNGKey(0), mean_part, std_part)
    stem0 = np.asarray(
        state.params["hourglass"]["stem_conv"]["kernel"]
    ).copy()
    bil0 = np.asarray(
        state.params["bilinear"]["encode"]["linear"]["kernel"]
    ).copy()

    s_norm_all = jnp.asarray(train.s)
    orig_centers = jnp.asarray(np.asarray(train.centers, np.float32))
    orig_scales = jnp.asarray(np.asarray(train.scales, np.float32))
    rng = jax.random.PRNGKey(1)
    losses, losses_3d = [], []
    for epoch in range(1, 7):
        for batch in pipe.epoch(epoch):
            state, loss, hm_loss, loss_3d = trainer.train_step(
                state,
                {
                    "images": batch.images,
                    "centers": batch.centers,
                    "scales": batch.scales,
                    "keypoints": batch.keypoints,
                    "valid": batch.valid,
                    "s_norm": s_norm_all[jnp.asarray(batch.index)],
                    "decode_centers": orig_centers[jnp.asarray(batch.index)],
                    "decode_scales": orig_scales[jnp.asarray(batch.index)],
                },
                (mean_part, std_part),
                jax.random.fold_in(rng, epoch),
            )
            losses.append(float(loss))
            losses_3d.append(float(loss_3d))

    assert all(np.isfinite(losses)), losses
    k = max(3, len(losses) // 3)
    head = float(np.mean(losses[:k]))
    tail = float(np.mean(losses[-k:]))
    assert tail < head, (head, tail, losses)

    # Both sub-networks moved (joint optimization, not one branch frozen).
    stem1 = np.asarray(state.params["hourglass"]["stem_conv"]["kernel"])
    bil1 = np.asarray(state.params["bilinear"]["encode"]["linear"]["kernel"])
    assert float(np.abs(stem1 - stem0).max()) > 1e-6
    assert float(np.abs(bil1 - bil0).max()) > 1e-6
