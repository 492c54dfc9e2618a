"""Fused Pallas lifting kernel vs the flax model (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bilinear_tpu.models.bilinear import BilinearUnit
from bilinear_tpu.ops.pallas.lifting import (
    TILE,
    fold_bn,
    lifting_forward,
    prepare_weights,
)


@pytest.fixture(scope="module")
def variables():
    model = BilinearUnit()
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 32)), train=False)
    # Non-trivial BN statistics.
    rng = np.random.RandomState(0)

    def scramble(path, leaf):
        name = str(path[-1].key)
        if name == "mean":
            return jnp.asarray(rng.randn(*leaf.shape).astype(np.float32) * 0.3)
        if name == "var":
            return jnp.asarray(rng.uniform(0.5, 1.5, leaf.shape).astype(np.float32))
        return leaf

    stats = jax.tree_util.tree_map_with_path(scramble, v["batch_stats"])
    return {"params": v["params"], "batch_stats": stats}


def test_fold_bn_math(variables):
    """Folded Linear+BN == Linear then BN, eval mode."""
    p = variables["params"]["encode"]
    s = variables["batch_stats"]["encode"]
    bn = dict(s["bn"]) | {"scale": p["bn"]["scale"], "bias": p["bn"]["bias"]}
    k, b = fold_bn(p["linear"]["kernel"], p["linear"]["bias"], bn)

    x = jnp.asarray(np.random.RandomState(1).randn(8, 32).astype(np.float32))
    lin = x @ p["linear"]["kernel"] + p["linear"]["bias"]
    ref = (lin - s["bn"]["mean"]) / jnp.sqrt(s["bn"]["var"] + 1e-5) * p["bn"][
        "scale"
    ] + p["bn"]["bias"]
    np.testing.assert_allclose(np.asarray(x @ k + b), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_kernel_matches_flax_eval(variables):
    model = BilinearUnit()
    x = jnp.asarray(np.random.RandomState(2).randn(TILE, 32).astype(np.float32))
    ref = model.apply(variables, x, train=False)
    out = lifting_forward(
        variables["params"], variables["batch_stats"], x,
        dtype=jnp.float32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_kernel_pads_odd_batches(variables):
    model = BilinearUnit()
    x = jnp.asarray(np.random.RandomState(3).randn(100, 32).astype(np.float32))
    ref = model.apply(variables, x, train=False)
    out = lifting_forward(
        variables["params"], variables["batch_stats"], x,
        dtype=jnp.float32, interpret=True,
    )
    assert out.shape == (100, 48)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_prepared_weights_reuse(variables):
    x = jnp.asarray(np.random.RandomState(4).randn(64, 32).astype(np.float32))
    prepared = prepare_weights(
        variables["params"], variables["batch_stats"], jnp.float32
    )
    a = lifting_forward(
        variables["params"], variables["batch_stats"], x,
        dtype=jnp.float32, interpret=True,
    )
    b = lifting_forward(
        variables["params"], variables["batch_stats"], x,
        dtype=jnp.float32, interpret=True, prepared=prepared,
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
