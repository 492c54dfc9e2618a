"""Golden-value regression tests (SURVEY.md §4): fixed-seed training
trajectories pinned against recorded values. Any change to initializers,
optimizer math, BN, shuffling, or the epoch program shows up here first.

Regenerate after an INTENTIONAL numerics change with:
    python tests/golden/regen.py
"""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bilinear_tpu.train.bilinear import BilinearTrainer

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "bilinear_train.json")


def test_bilinear_training_trajectory_matches_golden():
    with open(GOLDEN) as f:
        golden = json.load(f)

    rng = np.random.RandomState(42)
    x = jnp.asarray(rng.randn(96, 32).astype(np.float32))
    y = jnp.asarray(rng.randn(96, 48).astype(np.float32))
    trainer = BilinearTrainer(batch_size=32)
    state = trainer.init_state(jax.random.PRNGKey(7))
    losses = []
    for e in range(4):
        state, l = trainer.train_epoch(state, x, y, jax.random.PRNGKey(100 + e))
        losses.extend([float(v) for v in np.asarray(l)])

    np.testing.assert_allclose(losses, golden["losses"], rtol=1e-4)
    assert int(state.step) == golden["final_step"]
    assert float(jnp.sum(state.params["decode"]["kernel"])) == pytest.approx(
        golden["decode_kernel_sum"], rel=1e-3
    )
