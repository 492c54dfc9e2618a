"""Grouped multi-step dispatch must be numerically identical to step-by-step
execution (same per-step keys, same order, tail batches handled)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bilinear_tpu.data.h36m import Task
from bilinear_tpu.data.mpii import MPIIAnnotations
from bilinear_tpu.data.pipeline import MPIIHostPipeline
from bilinear_tpu.data.synthetic import write_mpii_dataset
from bilinear_tpu.models.hourglass_torch7 import MainModel
from bilinear_tpu.train.hourglass import HourglassTrainer


@pytest.fixture(scope="module")
def pipe(tmp_path_factory):
    root = tmp_path_factory.mktemp("MPII")
    write_mpii_dataset(str(root), n_train_images=8, n_test_images=1)
    MPIIAnnotations(str(root), Task.Train, split_seed=0)
    anns = MPIIAnnotations(str(root), Task.Train)
    return MPIIHostPipeline(anns, batch_size=3, canvas=128)


def _trainer():
    t = HourglassTrainer(batch_size=3, canvas=128)
    t.model = MainModel(n_stacks=1, features=8, depth=1)
    return t


def test_grouped_equals_ungrouped(pipe):
    t1 = _trainer()
    s1 = t1.init_state(jax.random.PRNGKey(0))
    s1, l1 = t1.fit_epoch(s1, pipe, 0, jax.random.PRNGKey(7), group=1)

    t2 = _trainer()
    s2 = t2.init_state(jax.random.PRNGKey(0))
    s2, l2 = t2.fit_epoch(s2, pipe, 0, jax.random.PRNGKey(7), group=4)

    assert int(s1.step) == int(s2.step)
    # scan-body vs standalone-jit compile differently, and XLA-CPU conv
    # reductions are not order-stable under thread scheduling, so two
    # executions of the same epoch drift at the fp noise floor and amplify
    # chaotically over the steps (benchmarks/RESULTS.md "Measured context").
    # A real grouping bug (wrong per-step keys/order, dropped tail batch)
    # shows up as O(1) differences; gate at the float level only.
    assert float(l1) == pytest.approx(float(l2), rel=1e-2)
    np.testing.assert_allclose(
        np.asarray(s1.params["htmap_0"]["kernel"]),
        np.asarray(s2.params["htmap_0"]["kernel"]),
        rtol=3e-2, atol=1e-4,
    )
