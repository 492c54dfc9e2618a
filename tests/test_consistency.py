"""Cross-cutting consistency tests from the SURVEY.md §4 plan: jit-vs-eager,
bf16 training path, async checkpointing, and debug utilities."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bilinear_tpu.io.checkpoint import (
    load_checkpoint,
    save_checkpoint,
    wait_for_async_saves,
)
from bilinear_tpu.models.bilinear import BilinearUnit
from bilinear_tpu.train.bilinear import BilinearTrainer
from bilinear_tpu.utils.debug import assert_tree_finite, tree_all_finite


def test_jit_vs_eager_bilinear_forward():
    model = BilinearUnit()
    x = jnp.asarray(np.random.RandomState(0).randn(8, 32).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    eager = model.apply(v, x, train=False)
    jitted = jax.jit(lambda v, x: model.apply(v, x, train=False))(v, x)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted),
                               rtol=1e-6, atol=1e-6)


def test_jit_vs_eager_train_step():
    trainer = BilinearTrainer(batch_size=8, learning_rate=1e-3, dropout=0.0)
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    bx = jnp.asarray(rng.randn(8, 32).astype(np.float32))
    by = jnp.asarray(rng.randn(8, 48).astype(np.float32))
    k = jax.random.PRNGKey(2)
    s_eager, l_eager = trainer._train_step(state, bx, by, k)
    s_jit, l_jit = jax.jit(trainer._train_step)(state, bx, by, k)
    assert float(l_eager) == pytest.approx(float(l_jit), rel=1e-6)
    np.testing.assert_allclose(
        np.asarray(s_eager.params["decode"]["kernel"]),
        np.asarray(s_jit.params["decode"]["kernel"]),
        rtol=2e-5, atol=2e-7,  # jit fusion reassociates float ops slightly
    )


def test_bf16_training_path_runs_and_learns():
    """The dtype knob: bf16 compute, f32 params/stats, loss finite and
    decreasing."""
    trainer = BilinearTrainer(batch_size=16, dtype=jnp.bfloat16)
    state = trainer.init_state(jax.random.PRNGKey(0))
    assert state.params["decode"]["kernel"].dtype == jnp.float32
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(64, 32).astype(np.float32))
    y = jnp.asarray(rng.randn(64, 48).astype(np.float32))
    state, losses0 = trainer.train_epoch(state, x, y, jax.random.PRNGKey(1))
    for e in range(3):
        state, losses = trainer.train_epoch(state, x, y, jax.random.PRNGKey(2 + e))
    assert np.isfinite(np.asarray(losses)).all()
    assert float(losses.mean()) < float(losses0.mean())


def test_async_checkpoint_roundtrip(tmp_path):
    trainer = BilinearTrainer(batch_size=8)
    state = trainer.init_state(jax.random.PRNGKey(0))
    pdir = str(tmp_path / "parameter")
    save_checkpoint(pdir, 1, state, async_save=True)
    wait_for_async_saves()
    payload = load_checkpoint(pdir, 1)
    assert payload["epoch"] == 1
    np.testing.assert_allclose(
        payload["state"]["params"]["decode"]["kernel"],
        np.asarray(state.params["decode"]["kernel"]),
    )


def test_debug_utils():
    assert bool(tree_all_finite({"a": jnp.ones(3)}))
    assert not bool(tree_all_finite({"a": jnp.asarray([jnp.nan])}))
    with pytest.raises(FloatingPointError):
        assert_tree_finite({"x": {"y": jnp.asarray([jnp.inf])}})
