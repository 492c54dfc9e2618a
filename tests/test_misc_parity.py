"""Odds and ends: sigma!=1 heatmap parity, pipeline shuffle determinism."""
import numpy as np
import pytest

import jax.numpy as jnp

from oracle_loader import load_reference_module

from bilinear_tpu.data.h36m import Task
from bilinear_tpu.data.mpii import MPIIAnnotations
from bilinear_tpu.data.pipeline import MPIIHostPipeline
from bilinear_tpu.data.synthetic import write_mpii_dataset
from bilinear_tpu.ops.heatmap import render_heatmaps


@pytest.mark.parametrize("sigma", [1, 2, 3])
def test_heatmap_sigma_generalizes(sigma):
    """render_heatmaps matches the reference draw_heatmap for any sigma
    (the reference hardcodes sigma=1 at call sites but the kernel shape
    formula generalizes, H36M/util.py:104-114)."""
    ref = load_reference_module("H36M/util.py", "ref_h36m_util_sigma")
    rng = np.random.RandomState(sigma)
    for _ in range(5):
        x0 = rng.uniform(3 * sigma, 64 - 3 * sigma)
        y0 = rng.uniform(3 * sigma, 64 - 3 * sigma)
        expected = ref.draw_heatmap(64, y0, x0, sigma=sigma)
        ours = render_heatmaps(
            jnp.asarray([[x0, y0]]), jnp.asarray([True]), size=64, sigma=sigma
        )[0]
        np.testing.assert_allclose(np.asarray(ours), expected, rtol=1e-5, atol=1e-6)


def test_pipeline_shuffle_deterministic(tmp_path):
    root = str(tmp_path)
    write_mpii_dataset(root, n_train_images=8, n_test_images=1)
    MPIIAnnotations(root, Task.Train, split_seed=0)
    anns = MPIIAnnotations(root, Task.Train)
    pipe = MPIIHostPipeline(anns, batch_size=4, canvas=128, shuffle=True, seed=3)
    order1 = [tuple(b.index) for b in pipe.epoch(1, prefetch=0)]
    order2 = [tuple(b.index) for b in pipe.epoch(1, prefetch=0)]
    order3 = [tuple(b.index) for b in pipe.epoch(2, prefetch=0)]
    assert order1 == order2  # same epoch -> same order (resumable)
    assert order1 != order3  # different epoch -> reshuffled
