"""Oracle tests: TorchBatchNorm vs torch.nn.BatchNorm1d/2d, including the
cumulative (momentum=None) mode the reference's BN-recalibration protocol
relies on (SURVEY.md §7 hard parts #1)."""
import numpy as np

import jax
import jax.numpy as jnp
import torch

from bilinear_tpu.core.norm import TorchBatchNorm, reset_batch_stats


def _init(mod, x):
    variables = mod.init(jax.random.PRNGKey(0), x, train=True)
    return variables["params"], variables["batch_stats"]


def _sync_from_torch(tbn, params, stats):
    params = dict(params)
    stats = dict(stats)
    params["scale"] = jnp.asarray(tbn.weight.detach().numpy())
    params["bias"] = jnp.asarray(tbn.bias.detach().numpy())
    return params, stats


def test_bn1d_train_and_eval_match_torch():
    torch.manual_seed(0)
    tbn = torch.nn.BatchNorm1d(5, momentum=0.1)
    with torch.no_grad():
        tbn.weight.mul_(1.3).add_(0.1)
        tbn.bias.add_(-0.2)

    mod = TorchBatchNorm(momentum=0.1)
    x0 = np.random.RandomState(0).randn(8, 5).astype(np.float32)
    params, stats = _init(mod, jnp.asarray(x0))
    params, stats = _sync_from_torch(tbn, params, stats)

    rng = np.random.RandomState(1)
    for _ in range(4):
        x = rng.randn(8, 5).astype(np.float32) * 2 + 0.5
        tbn.train()
        y_t = tbn(torch.from_numpy(x)).detach().numpy()
        y_j, mut = mod.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(x),
            train=True,
            mutable=["batch_stats"],
        )
        stats = mut["batch_stats"]
        np.testing.assert_allclose(y_t, np.asarray(y_j), rtol=1e-4, atol=1e-5)

    np.testing.assert_allclose(
        tbn.running_mean.numpy(), np.asarray(stats["mean"]), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        tbn.running_var.numpy(), np.asarray(stats["var"]), rtol=1e-5, atol=1e-6
    )

    # Eval mode uses running statistics.
    x = rng.randn(8, 5).astype(np.float32)
    tbn.eval()
    y_t = tbn(torch.from_numpy(x)).detach().numpy()
    y_j = mod.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )
    np.testing.assert_allclose(y_t, np.asarray(y_j), rtol=1e-4, atol=1e-5)


def test_bn_cumulative_mode_matches_torch():
    """momentum=None => factor 1/num_batches_tracked (model/hourglass.py:9 and
    the reset_statistics protocol, valid_hourglass.py:23-48)."""
    tbn = torch.nn.BatchNorm1d(3, momentum=None)
    mod = TorchBatchNorm(momentum=None)
    x0 = np.random.RandomState(0).randn(6, 3).astype(np.float32)
    params, stats = _init(mod, jnp.asarray(x0))
    params, stats = _sync_from_torch(tbn, params, stats)

    rng = np.random.RandomState(2)
    tbn.train()
    for _ in range(5):
        x = rng.randn(6, 3).astype(np.float32) * 3 - 1
        tbn(torch.from_numpy(x))
        _, mut = mod.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(x),
            train=True,
            mutable=["batch_stats"],
        )
        stats = mut["batch_stats"]

    np.testing.assert_allclose(
        tbn.running_mean.numpy(), np.asarray(stats["mean"]), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        tbn.running_var.numpy(), np.asarray(stats["var"]), rtol=1e-5, atol=1e-6
    )
    assert int(stats["count"]) == int(tbn.num_batches_tracked)


def test_bn2d_nhwc_matches_torch_nchw():
    tbn = torch.nn.BatchNorm2d(4, momentum=0.1)
    mod = TorchBatchNorm(momentum=0.1)
    x = np.random.RandomState(3).randn(2, 4, 8, 8).astype(np.float32)  # NCHW
    x_nhwc = x.transpose(0, 2, 3, 1)
    params, stats = _init(mod, jnp.asarray(x_nhwc))
    params, stats = _sync_from_torch(tbn, params, stats)

    tbn.train()
    y_t = tbn(torch.from_numpy(x)).detach().numpy()
    y_j, mut = mod.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x_nhwc),
        train=True,
        mutable=["batch_stats"],
    )
    np.testing.assert_allclose(
        y_t, np.asarray(y_j).transpose(0, 3, 1, 2), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        tbn.running_var.numpy(),
        np.asarray(mut["batch_stats"]["var"]),
        rtol=1e-5,
        atol=1e-6,
    )


def test_reset_batch_stats():
    mod = TorchBatchNorm(momentum=0.1)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 3).astype(np.float32))
    params, stats = _init(mod, x)
    _, mut = mod.apply(
        {"params": params, "batch_stats": stats}, x, train=True,
        mutable=["batch_stats"],
    )
    stats = reset_batch_stats(mut["batch_stats"])
    np.testing.assert_array_equal(np.asarray(stats["mean"]), np.zeros(3))
    np.testing.assert_array_equal(np.asarray(stats["var"]), np.ones(3))
    assert int(stats["count"]) == 0


def test_momentum_call_override():
    """Recalibration constructs with momentum=0.1 but applies with
    momentum=None — the override must win."""
    mod = TorchBatchNorm(momentum=0.1)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 3).astype(np.float32) + 5.0)
    params, stats = _init(mod, x)
    _, mut = mod.apply(
        {"params": params, "batch_stats": stats}, x, train=True,
        momentum=None, mutable=["batch_stats"],
    )
    # Cumulative with count 0 -> running mean equals the batch mean exactly.
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["mean"]),
        np.asarray(jnp.mean(x, axis=0)),
        rtol=1e-6,
    )
