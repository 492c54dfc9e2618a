"""BilinearUnit forward parity vs the reference torch model (same-process
oracle, weights copied via torch_compat)."""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from bilinear_tpu.models.bilinear import IN_FEATURES, OUT_FEATURES, BilinearUnit
from bilinear_tpu.utils.torch_compat import bilinear_from_torch

sys.path.insert(0, "/root/reference")


@pytest.fixture(scope="module")
def torch_model():
    from model import bilinear as ref_bilinear  # noqa: reference oracle

    torch.manual_seed(0)
    m = ref_bilinear.BilinearUnit()
    # Randomize BN stats so eval mode is a nontrivial check.
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm1d):
                mod.running_mean.normal_(0, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
                mod.weight.normal_(1.0, 0.2)
                mod.bias.normal_(0, 0.2)
    return m


def test_forward_eval_parity(torch_model):
    params, stats = bilinear_from_torch(torch_model.state_dict())
    ours = BilinearUnit()

    x = np.random.RandomState(0).randn(16, IN_FEATURES).astype(np.float32)
    torch_model.eval()
    with torch.no_grad():
        y_t = torch_model(torch.from_numpy(x)).numpy()
    y_j = ours.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )
    assert y_j.shape == (16, OUT_FEATURES)
    np.testing.assert_allclose(y_t, np.asarray(y_j), rtol=1e-4, atol=1e-5)


def test_forward_train_bn_parity(torch_model):
    """Train mode with dropout disabled: batch stats path must match."""
    params, stats = bilinear_from_torch(torch_model.state_dict())
    ours = BilinearUnit(dropout=0.0)

    x = np.random.RandomState(1).randn(32, IN_FEATURES).astype(np.float32)
    torch_model.train()
    for mod in torch_model.modules():
        if isinstance(mod, torch.nn.Dropout):
            mod.eval()
    with torch.no_grad():
        y_t = torch_model(torch.from_numpy(x)).numpy()

    y_j, _ = ours.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x),
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(0)},
    )
    np.testing.assert_allclose(y_t, np.asarray(y_j), rtol=1e-4, atol=1e-4)


def test_param_count(torch_model):
    """~4.3 M params (SURVEY.md §2.1), exactly matching the reference."""
    ours = BilinearUnit()
    variables = ours.init(
        jax.random.PRNGKey(0), jnp.zeros((2, IN_FEATURES)), train=False
    )
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    n_ref = sum(p.numel() for p in torch_model.parameters())
    assert n == n_ref


def test_dropout_active_in_train():
    ours = BilinearUnit()
    x = jnp.ones((8, IN_FEATURES))
    variables = ours.init(jax.random.PRNGKey(0), x, train=False)
    y1, _ = ours.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    y2, _ = ours.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
