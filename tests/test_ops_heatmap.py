"""Heatmap render parity vs the reference's numpy draw_heatmap/gaussian
(same-process oracle from /root/reference)."""
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from bilinear_tpu.data.h36m import _install_vectormath_shim

_install_vectormath_shim()
sys.path.insert(0, "/root/reference")

from bilinear_tpu.ops.heatmap import keypoints_to_heatmap_space, render_heatmaps


@pytest.fixture(scope="module")
def ref_util():
    from oracle_loader import load_reference_module

    return load_reference_module("H36M/util.py", "ref_h36m_util")


def test_single_heatmap_matches_reference(ref_util):
    rng = np.random.RandomState(0)
    for _ in range(20):
        x0 = rng.uniform(0, 64)
        y0 = rng.uniform(0, 64)
        ref = ref_util.draw_heatmap(64, y0, x0)
        ours = render_heatmaps(
            jnp.asarray([[x0, y0]]), jnp.asarray([True]), size=64, sigma=1
        )[0]
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-6)


def test_boundary_clipping_matches_reference(ref_util):
    # Centers near edges: the reference clips the pasted patch.
    for x0, y0 in [(0.2, 0.7), (63.4, 63.9), (1.0, 62.5), (62.9, 0.0)]:
        ref = ref_util.draw_heatmap(64, y0, x0)
        ours = render_heatmaps(
            jnp.asarray([[x0, y0]]), jnp.asarray([True]), size=64, sigma=1
        )[0]
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5, atol=1e-6)


def test_out_of_bounds_joint_skipped():
    # The caller skips joints with float coords outside [0, 64)
    # (MPII/data.py:131-135); our mask handles it in-op.
    ours = render_heatmaps(
        jnp.asarray([[-0.01, 30.0], [64.0, 30.0], [30.0, 30.0]]),
        jnp.asarray([True, True, True]),
    )
    assert float(ours[0].sum()) == 0.0
    assert float(ours[1].sum()) == 0.0
    assert float(ours[2].max()) == 1.0


def test_invalid_mask_suppresses():
    ours = render_heatmaps(
        jnp.asarray([[30.0, 30.0]]), jnp.asarray([False])
    )
    assert float(ours.sum()) == 0.0


def test_batched_shapes():
    coords = jnp.zeros((4, 16, 2)) + 32.0
    valid = jnp.ones((4, 16), bool)
    hm = render_heatmaps(coords, valid)
    assert hm.shape == (4, 16, 64, 64)


def test_keypoint_to_heatmap_space_matches_reference_formula():
    """vs the inline math at MPII/data.py:119-131."""
    import math

    rng = np.random.RandomState(1)
    for _ in range(10):
        kp = rng.uniform(0, 1000, size=(2,))
        center = rng.uniform(200, 800, size=(2,))
        scale = rng.uniform(1, 3)
        rotate = rng.uniform(-30, 30)

        in_hm = (kp - center) * 64 / (200 * scale)
        cos, sin = math.cos(rotate * math.pi / 180), math.sin(rotate * math.pi / 180)
        expected = np.asarray(
            [sin * in_hm[1] + cos * in_hm[0], cos * in_hm[1] - sin * in_hm[0]]
        ) + 32

        ours = keypoints_to_heatmap_space(
            jnp.asarray(kp, jnp.float32)[None, :],
            jnp.asarray(center, jnp.float32),
            jnp.float32(scale),
            jnp.float32(rotate),
        )[0]
        np.testing.assert_allclose(np.asarray(ours), expected, rtol=1e-4)
