"""Decode/flip-TTA parity vs torch transcriptions of the reference protocols."""
import jax
import numpy as np

import jax.numpy as jnp
import torch

from bilinear_tpu.ops.decode import (
    argmax_decode,
    flip_average,
    heatmap_to_image_space,
    softargmax,
)
from bilinear_tpu.ops.joints import MPII_FLIP_SWAP


def test_argmax_decode_matches_reference_indexing():
    """x = idx % 64, y = idx // 64 (valid_hourglass.py:100-103)."""
    rng = np.random.RandomState(0)
    hm = rng.rand(3, 16, 64, 64).astype(np.float32)
    ours = np.asarray(argmax_decode(jnp.asarray(hm)))

    t = torch.from_numpy(hm)
    poses = torch.argmax(t.reshape(3, 16, -1), dim=-1)
    expected = torch.stack([poses % 64, poses // 64], dim=-1).float().numpy()
    np.testing.assert_array_equal(ours, expected)


def test_heatmap_to_image_space_matches_reference():
    """center + (p - 32)/64*scale*200 (valid_hourglass.py:104-106)."""
    rng = np.random.RandomState(1)
    pose = rng.uniform(0, 64, (2, 16, 2)).astype(np.float32)
    centers = rng.uniform(100, 900, (2, 2)).astype(np.float32)
    scales = rng.uniform(1, 3, (2,)).astype(np.float32)
    ours = np.asarray(
        heatmap_to_image_space(jnp.asarray(pose), jnp.asarray(centers), jnp.asarray(scales))
    )
    expected = centers[:, None, :] + (pose - 32) / 64 * scales[:, None, None] * 200
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


def test_softargmax_matches_reference_formula():
    """Per-axis sum -> x10 -> softmax -> expectation (model/end2end.py:9-18;
    torch transcription minus its .cuda())."""
    rng = np.random.RandomState(2)
    hm = rng.rand(64, 64).astype(np.float32)

    t = torch.from_numpy(hm)
    expected = np.zeros(2, np.float32)
    for dim in [0, 1]:
        marg = 10 * torch.sum(t, dim=dim)
        soft = torch.nn.Softmax(dim=0)(marg)
        expected[dim] = float(torch.sum(soft * torch.arange(0, 64).float()))

    ours = np.asarray(softargmax(jnp.asarray(hm)))
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-4)


def test_softargmax_peaks_at_argmax():
    hm = np.zeros((16, 64, 64), np.float32)
    hm[:, 20, 45] = 5.0
    out = np.asarray(softargmax(jnp.asarray(hm)))
    np.testing.assert_allclose(out[:, 0], 45, atol=0.5)
    np.testing.assert_allclose(out[:, 1], 20, atol=0.5)


def test_softargmax_finite_under_jit_at_extreme_magnitudes():
    """Regression: XLA's algebraic simplifier can hoist exp(-max) out of the
    softmax sum, recreating the overflowing exp(10*marginal) for heatmaps
    >~1e7 (garbage weights in a serving hot-reload scenario). The clip
    barrier in ops/decode.py::softargmax must keep the jitted program
    finite at any input magnitude, and exact at sane ones."""
    rng = np.random.RandomState(7)
    base = rng.rand(2, 16, 64, 64).astype(np.float32)
    jitted = jax.jit(softargmax)
    for mag in (1.0, 1e3, 1e7, 1e20):
        out = np.asarray(jitted(jnp.asarray(base * mag)))
        assert np.isfinite(out).all(), f"non-finite at magnitude {mag:g}"
        assert (out >= 0).all() and (out <= 63).all()
    # at sane magnitudes jit and eager agree exactly
    np.testing.assert_allclose(
        np.asarray(jitted(jnp.asarray(base))),
        np.asarray(softargmax(jnp.asarray(base))),
        rtol=1e-5, atol=1e-4,
    )


def test_flip_average_matches_reference():
    """swap channels, unflip, average (valid_hourglass.py:92-96)."""
    rng = np.random.RandomState(3)
    hm = rng.rand(2, 16, 64, 64).astype(np.float32)
    flipped = rng.rand(2, 16, 64, 64).astype(np.float32)

    t_out = torch.from_numpy(hm)
    t_flip = torch.from_numpy(flipped)
    swap = torch.tensor(MPII_FLIP_SWAP, dtype=torch.long)
    t_flip = torch.index_select(t_flip, 1, swap).flip(3)
    expected = ((t_out + t_flip) / 2).numpy()

    ours = np.asarray(flip_average(jnp.asarray(hm), jnp.asarray(flipped)))
    np.testing.assert_allclose(ours, expected, rtol=1e-6)
