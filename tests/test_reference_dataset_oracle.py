"""The reference's OWN Dataset classes as in-process oracles.

Rounds 1-3 oracle-tested model/*.py and H36M/util.py by executing the
reference code; the dataset layer's parity rested on hand-derived
expectations because H36M/data.py and MPII/data.py import torchvision
(absent here). With tests/oracle_loader.py's torchvision shim the
reference's dataset code now RUNS over the synthetic fixtures, and any
drift in split membership, annotation math, z-scored tuples, or rendered
heatmaps fails against the reference executing — not against numbers we
derived by reading it.

Matches: /root/reference/H36M/data.py:17-162, /root/reference/MPII/data.py:14-143.
"""
import math
import os
import pickle
import random as py_random

import numpy as np
import pytest

import jax.numpy as jnp

from bilinear_tpu.data.h36m import (
    Protocol,
    Task,
    _install_vectormath_shim,
    decode_image_name,
    load_h36m,
)
from bilinear_tpu.data.mpii import MPIIAnnotations
from bilinear_tpu.data.synthetic import write_h36m_dataset, write_mpii_dataset
from bilinear_tpu.ops.heatmap import keypoints_to_heatmap_space, render_heatmaps

from oracle_loader import load_reference_package


def _vectorize_centers(data_dir: str) -> None:
    """Real bins pickle vectormath.Vector2 centers (H36M/data.py:96-97 calls
    .x/.y on them); rewrite the synthetic bins' plain arrays as shim
    Vector2s so the reference code exercises its real access path."""
    _install_vectormath_shim()
    import vectormath

    for task in (Task.Train, Task.Valid):
        path = os.path.join(data_dir, f"{task}_GT.bin")
        with open(path, "rb") as f:
            data = pickle.load(f)
        data["center"] = [vectormath.Vector2(np.asarray(c)) for c in data["center"]]
        with open(path, "wb") as f:
            pickle.dump(data, f)


@pytest.fixture(scope="module")
def h36m_tree(tmp_path_factory):
    data_dir = str(tmp_path_factory.mktemp("h36m") / "Human3.6M")
    write_h36m_dataset(data_dir, n_train=64, n_valid=32, with_images=True)
    _vectorize_centers(data_dir)
    return data_dir


@pytest.fixture(scope="module")
def mpii_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mpii") / "MPII")
    write_mpii_dataset(root, n_train_images=24, n_test_images=4, seed=3)
    return root


# ---------------------------------------------------------------- H36M


def test_h36m_oracle_zscored_tuples_match(h36m_tree):
    """Record-level: the reference Dataset's z-scored __getitem__ dict
    (position_only=True) equals our load_h36m arrays — including the
    'normalize BOTH splits with Train stats' rule (H36M/data.py:85-110)."""
    H36M = load_reference_package("H36M")
    ours = load_h36m(h36m_tree, Protocol.GT)

    for task in (Task.Train, Task.Valid):
        ref = H36M.Dataset(h36m_tree, task)
        split = ours[task]
        assert len(ref) == len(split)
        for i in [0, 1, len(split) // 2, len(split) - 1]:
            data, image, heatmap, action = ref[i]
            assert image == -1 and heatmap == -1
            np.testing.assert_allclose(
                np.asarray(data["part"], np.float32), split.part[i],
                rtol=1e-5, atol=1e-5,
            )
            np.testing.assert_allclose(
                np.asarray(data["S"], np.float32), split.s[i],
                rtol=1e-5, atol=1e-5,
            )
            np.testing.assert_allclose(
                np.asarray(data["center"], np.float32), split.centers[i],
                rtol=1e-6,
            )
            assert np.float32(data["scale"]) == split.scales[i]
            _, our_action, _, _ = decode_image_name(split.images[i])
            assert action == our_action


def test_h36m_oracle_train_statistics_match(h36m_tree):
    """The derived 'mean of'/'stddev of' keys (H36M/data.py:57-59) equal our
    split statistics bit-for-bit in float32."""
    H36M = load_reference_package("H36M")
    ref = H36M.Dataset(h36m_tree, Task.Train)
    ours = load_h36m(h36m_tree, Protocol.GT)[Task.Train]
    A = H36M.Annotation
    np.testing.assert_allclose(
        ref.data[Task.Train][A.Mean_Of + A.S], ours.mean_s, rtol=1e-6)
    np.testing.assert_allclose(
        ref.data[Task.Train][A.Stddev_Of + A.S], ours.std_s, rtol=1e-5)
    np.testing.assert_allclose(
        ref.data[Task.Train][A.Mean_Of + A.Part], ours.mean_part, rtol=1e-6)
    np.testing.assert_allclose(
        ref.data[Task.Train][A.Stddev_Of + A.Part], ours.std_part, rtol=1e-5)


def test_h36m_oracle_train_heatmaps_match_device_render(h36m_tree):
    """Train-path target heatmaps (position_only=False): seed the stdlib RNG,
    let the reference sample its scale/rotation augments and render via
    draw_heatmap paste (H36M/data.py:117-162), then reproduce the SAME
    augment draws and assert our device-side
    keypoints_to_heatmap_space+render_heatmaps emits identical maps —
    including the out-of-bounds skip rule (:155-156)."""
    H36M = load_reference_package("H36M")
    ref = H36M.Dataset(h36m_tree, Task.Train, position_only=False)
    ours = load_h36m(h36m_tree, Protocol.GT)[Task.Train]

    for i, seed in [(0, 11), (3, 12), (7, 13), (9, 14)]:
        py_random.seed(seed)
        _, image, ref_heatmap, _ = ref[i]

        # Replicate the reference's augment draws in its exact order
        # (H36M/data.py:127-129 via util.rand = clipped random.gauss).
        py_random.seed(seed)
        r = py_random.gauss(0, 1) * 0.25
        scale = ours.scales[i] * 2 ** max(-0.5, min(0.5, r))
        u = py_random.random()
        if u <= 0.4:
            a = py_random.gauss(0, 1) * 30
            angle = max(-60.0, min(60.0, a))
        else:
            angle = 0.0

        kp = ours.raw_part[i].reshape(16, 2)
        hm_xy = keypoints_to_heatmap_space(
            jnp.asarray(kp)[None], jnp.asarray(ours.centers[i])[None],
            jnp.asarray(scale)[None], jnp.asarray(angle)[None],
        )
        got = np.asarray(render_heatmaps(hm_xy, jnp.ones((1, 16), bool)))[0]
        assert isinstance(ref_heatmap, np.ndarray), (
            "seeded draw disagrees with reference augment order")
        np.testing.assert_allclose(got, ref_heatmap, atol=1e-5)
        assert tuple(image.shape) == (3, 256, 256)


# ---------------------------------------------------------------- MPII


def test_mpii_oracle_split_files_identical(mpii_tree, tmp_path):
    """Split generation parity: the reference's refresh_subset (stdlib
    shuffle over intact-objpos rects, MPII/data.py:37-68) and ours produce
    IDENTICAL MPII-{train,valid}.txt files from the same seed, and each
    side loads the other's files."""
    MPII = load_reference_package("MPII")

    ref_dir = str(tmp_path / "refsplit")
    os.makedirs(ref_dir)
    for sub in ("images", "mpii_human_pose_v1_u12_2"):
        os.symlink(os.path.join(mpii_tree, sub), os.path.join(ref_dir, sub))

    py_random.seed(123)
    ref = MPII.Dataset(ref_dir, "train")  # triggers refresh_subset
    ref_train = np.loadtxt(os.path.join(ref_dir, "MPII-train.txt"), dtype=np.int64)
    ref_valid = np.loadtxt(os.path.join(ref_dir, "MPII-valid.txt"), dtype=np.int64)

    our_dir = str(tmp_path / "oursplit")
    os.makedirs(our_dir)
    for sub in ("images", "mpii_human_pose_v1_u12_2"):
        os.symlink(os.path.join(mpii_tree, sub), os.path.join(our_dir, sub))
    ours = MPIIAnnotations(our_dir, Task.Train, split_seed=123)

    np.testing.assert_array_equal(
        np.atleast_2d(ref_train),
        np.loadtxt(os.path.join(our_dir, "MPII-train.txt"), dtype=np.int64))
    np.testing.assert_array_equal(
        np.atleast_2d(ref_valid),
        np.loadtxt(os.path.join(our_dir, "MPII-valid.txt"), dtype=np.int64))
    assert len(ref) == len(ours)

    # Cross-load: our annotations over the reference-written files.
    cross = MPIIAnnotations(ref_dir, Task.Valid)
    assert len(cross) == len(np.atleast_2d(ref_valid))


def test_mpii_oracle_getitem_annotation_math_matches(mpii_tree):
    """Record-level (augment=False, deterministic): position/center/scale/
    head of the reference's 6-tuple (MPII/data.py:70-140) equal our
    MPIIRecord fields, NaN masks included."""
    MPII = load_reference_package("MPII")
    # Ensure a split exists (deterministically) before either side loads.
    MPIIAnnotations(mpii_tree, Task.Train, split_seed=7)

    for task in (Task.Train, Task.Valid):
        ref = MPII.Dataset(mpii_tree, task, augment=False)
        ours = MPIIAnnotations(mpii_tree, task)
        assert len(ref) == len(ours)
        for i in range(min(len(ref), 6)):
            _, ref_hm, ref_pos, ref_center, ref_scale, ref_head = ref[i]
            rec = ours.record(i)
            np.testing.assert_allclose(ref_center, rec.center, rtol=1e-6)
            assert np.isclose(float(ref_scale), rec.scale, rtol=1e-6)
            np.testing.assert_allclose(ref_head[0], rec.head, rtol=1e-6)
            # NaN pattern and values
            np.testing.assert_array_equal(
                np.isnan(ref_pos).any(1), ~rec.valid)
            np.testing.assert_allclose(
                np.nan_to_num(ref_pos), np.nan_to_num(rec.keypoints),
                rtol=1e-5, atol=1e-4,
            )

            # Rendered target heatmaps: ours via the device ops at the
            # record's raw annotations (rotate 0), reference via PIL paste.
            hm_xy = keypoints_to_heatmap_space(
                jnp.asarray(np.nan_to_num(rec.keypoints))[None],
                jnp.asarray(rec.center)[None],
                jnp.asarray(rec.scale)[None],
                jnp.zeros((1,)),
            )
            got = np.asarray(
                render_heatmaps(hm_xy, jnp.asarray(rec.valid)[None]))[0]
            np.testing.assert_allclose(got, ref_hm, atol=1e-5)


def test_mpii_oracle_crop_pixels_close(mpii_tree):
    """The reference's PIL crop (ToTensor'd CHW [0,1]) vs our canvas +
    device affine gather: same geometry, resampling differences only."""
    from bilinear_tpu.data.pipeline import record_to_canvas
    from bilinear_tpu.ops.affine import crop_batch
    from PIL import Image

    MPII = load_reference_package("MPII")
    MPIIAnnotations(mpii_tree, Task.Train, split_seed=7)
    ref = MPII.Dataset(mpii_tree, Task.Valid, augment=False)
    ours = MPIIAnnotations(mpii_tree, Task.Valid)

    for i in range(2):
        ref_img = np.asarray(ref[i][0])  # (3, 256, 256) float [0,1]
        rec = ours.record(i)
        with Image.open(ours.image_path(rec)) as img:
            canvas, c, s, _, _ = record_to_canvas(img.convert("RGB"), rec, 768)
        crop = np.asarray(crop_batch(
            jnp.asarray(canvas)[None], jnp.asarray(c)[None],
            jnp.asarray(s)[None], jnp.zeros((1,)),
        ))[0]  # (256, 256, 3)
        diff = np.abs(crop.transpose(2, 0, 1) - ref_img)
        assert diff.mean() < 0.03, diff.mean()
