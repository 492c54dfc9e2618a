"""MainModel(fused=True) integration: identical variable tree to the
standard model (checkpoint compatibility) and matching numerics through a
full train step. On CPU the fused path runs the pure-jnp formulation that
the kernel unit tests (test_pallas_resmodule.py) prove equal to the Pallas
kernels — the TPU measurement harness (benchmarks/hourglass_fused.py)
re-asserts fused-vs-standard closeness with the real kernels."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bilinear_tpu.models.hourglass_torch7 import MainModel
from bilinear_tpu.train.hourglass import HourglassTrainer


def _models():
    std = MainModel(n_stacks=2, features=16, depth=2)
    fused = MainModel(n_stacks=2, features=16, depth=2, fused=True)
    return std, fused


def test_fused_variable_tree_identical():
    std, fused = _models()
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    vs = std.init(jax.random.PRNGKey(0), x, train=False)
    vf = fused.init(jax.random.PRNGKey(0), x, train=False)
    # Same tree structure...
    assert jax.tree_util.tree_structure(vs) == jax.tree_util.tree_structure(vf)
    # ...and same VALUES: the param-holder modules replicate nn.Conv /
    # TorchBatchNorm shapes, init distributions, and rng stream order.
    flat_s = jax.tree_util.tree_flatten_with_path(vs)[0]
    flat_f = jax.tree_util.tree_flatten_with_path(vf)[0]
    for (ps, s), (pf, f) in zip(flat_s, flat_f):
        assert ps == pf
        np.testing.assert_array_equal(np.asarray(s), np.asarray(f), err_msg=str(ps))


def test_fused_forward_matches_standard():
    std, fused = _models()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    variables = std.init(jax.random.PRNGKey(0), x, train=False)

    out_s, mut_s = std.apply(variables, x, train=True, mutable=["batch_stats"])
    out_f, mut_f = fused.apply(variables, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_s), rtol=2e-4, atol=2e-4
    )
    for (p, s), (_, f) in zip(
        jax.tree_util.tree_flatten_with_path(mut_s["batch_stats"])[0],
        jax.tree_util.tree_flatten_with_path(mut_f["batch_stats"])[0],
    ):
        np.testing.assert_allclose(
            np.asarray(f), np.asarray(s), rtol=2e-4, atol=1e-5, err_msg=str(p)
        )

    # Eval mode too (running stats path).
    e_s = std.apply(variables, x, train=False)
    e_f = fused.apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(e_f), np.asarray(e_s), rtol=2e-4, atol=2e-4
    )


def test_fused_train_step_matches_standard():
    def run(fused):
        t = HourglassTrainer(batch_size=4, canvas=128, fused_blocks=fused)
        t.model = MainModel(n_stacks=1, features=8, depth=1, fused=fused)
        state = t.init_state(jax.random.PRNGKey(0))
        rng = np.random.RandomState(0)
        batch = {
            "images": jnp.asarray(rng.rand(4, 128, 128, 3).astype(np.float32)),
            "centers": jnp.full((4, 2), 64.0),
            "scales": jnp.full((4,), 0.5),
            "keypoints": jnp.asarray(
                rng.uniform(30, 100, (4, 16, 2)).astype(np.float32)
            ),
            "valid": jnp.ones((4, 16), bool),
        }
        s2, loss = jax.jit(t._train_step)(state, batch, jax.random.PRNGKey(1))
        return float(loss), s2

    loss_s, s_std = run(False)
    loss_f, s_fus = run(True)
    assert loss_f == pytest.approx(loss_s, rel=1e-4)
    # Updated parameters agree (gradients through the fused formulation).
    ks = np.asarray(s_std.params["hg_0"]["res1"]["conv2"]["kernel"])
    kf = np.asarray(s_fus.params["hg_0"]["res1"]["conv2"]["kernel"])
    np.testing.assert_allclose(kf, ks, rtol=1e-3, atol=1e-5)
