"""Hourglass forward parity vs the reference torch models (same-process
oracles, weights converted via torch_compat). Small configs keep CPU runtime
sane; the architecture code is config-independent."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from oracle_loader import load_reference_module

from bilinear_tpu.models.hourglass import StackedHourglass
from bilinear_tpu.models.hourglass_torch7 import MainModel
from bilinear_tpu.utils.torch_compat import (
    hourglass_from_torch,
    hourglass_torch7_from_torch,
)


def _randomize_bn(m):
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.3)
                mod.running_var.uniform_(0.5, 1.5)
                mod.weight.normal_(1.0, 0.1)
                mod.bias.normal_(0, 0.1)


@pytest.fixture(scope="module")
def torch7_pair():
    ref = load_reference_module("model/hourglass_torch7.py", "ref_hg_t7")
    ref.CONFIG.nStacks = 2
    ref.CONFIG.nFeatures = 32
    ref.CONFIG.nDepth = 2
    torch.manual_seed(0)
    tm = ref.MainModel()
    _randomize_bn(tm)
    tm.eval()
    ours = MainModel(n_stacks=2, features=32, depth=2)
    params, stats = hourglass_torch7_from_torch(
        tm.state_dict(), n_stacks=2, n_depth=2
    )
    return tm, ours, params, stats


def test_torch7_forward_parity(torch7_pair):
    tm, ours, params, stats = torch7_pair
    x = np.random.RandomState(0).rand(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x))  # list of (B, J, h, w)
    out = ours.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False,
    )
    assert out.shape == (2, 2, 16, 16, 16)  # (S, B, H, W, J)
    for s in range(2):
        np.testing.assert_allclose(
            ref_out[s].numpy(),
            np.asarray(out[s]).transpose(0, 3, 1, 2),
            rtol=1e-3,
            atol=1e-4,
        )


def test_torch7_train_mode_parity(torch7_pair):
    tm, ours, params, stats = torch7_pair
    x = np.random.RandomState(1).rand(2, 3, 64, 64).astype(np.float32)
    tm.train()
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x))
    tm.eval()
    out, mut = ours.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=True,
        mutable=["batch_stats"],
    )
    np.testing.assert_allclose(
        ref_out[-1].numpy(),
        np.asarray(out[-1]).transpose(0, 3, 1, 2),
        rtol=1e-3,
        atol=5e-4,
    )


@pytest.fixture(scope="module")
def preact_pair():
    ref = load_reference_module("model/hourglass.py", "ref_hg_preact")
    torch.manual_seed(1)
    tm = ref.StackedHourglass(
        stacks=2, joints=16, out_channels=32, compression_time=2
    )
    _randomize_bn(tm)
    tm.eval()
    ours = StackedHourglass(
        stacks=2, joints=16, out_channels=32, compression_time=2
    )
    params, stats = hourglass_from_torch(
        tm.state_dict(), n_stacks=2, compression_time=2
    )
    return tm, ours, params, stats


def test_preact_forward_parity(preact_pair):
    tm, ours, params, stats = preact_pair
    x = np.random.RandomState(2).rand(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x)).numpy()  # (S, B, J, h, w)
    out = ours.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False,
    )
    assert out.shape == (2, 2, 16, 16, 16)
    np.testing.assert_allclose(
        ref_out,
        np.asarray(out).transpose(0, 1, 4, 2, 3),
        rtol=1e-3,
        atol=1e-4,
    )


def test_preact_param_count_matches(preact_pair):
    tm, ours, params, stats = preact_pair
    n_ref = sum(p.numel() for p in tm.parameters())
    n_ours = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert n_ours == n_ref


def test_torch7_param_count_close(torch7_pair):
    """torch7 allocates conv_skip even when unused; our init skips those, so
    converted params >= our fresh-init params, equal on used set."""
    tm, ours, params, stats = torch7_pair
    variables = ours.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    used = {
        "/".join(str(k.key) for k in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    }
    converted = {
        "/".join(str(k.key) for k in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    assert used <= converted
    extra = converted - used
    assert all("conv_skip" in e for e in extra)


def test_torch7_forward_parity_nmodules2():
    """CONFIG.nModules=2 (model/hourglass_torch7.py:9,47-49,58): reference
    checkpoints at nModules>1 must import losslessly (auto-detected) and the
    converted forward must match the torch oracle; the export direction must
    round-trip every used key back into the reference model."""
    ref = load_reference_module("model/hourglass_torch7.py", "ref_hg_t7_m2")
    ref.CONFIG.nStacks = 1
    ref.CONFIG.nFeatures = 32
    ref.CONFIG.nDepth = 2
    ref.CONFIG.nModules = 2
    torch.manual_seed(1)
    tm = ref.MainModel()
    _randomize_bn(tm)
    tm.eval()

    params, stats = hourglass_torch7_from_torch(
        tm.state_dict(), n_stacks=1, n_depth=2
    )
    # the detector found the second module of every slot
    assert "res1_m1" in params["hg_0"] and "waist_m1" in params["hg_0"]["sub"]

    ours = MainModel(n_stacks=1, features=32, depth=2, n_modules=2)
    x = np.random.RandomState(1).rand(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x))
    out = ours.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        train=False,
    )
    np.testing.assert_allclose(
        np.asarray(out[0]).transpose(0, 3, 1, 2),
        ref_out[0].numpy(), rtol=2e-4, atol=2e-4,
    )

    # Export round-trip: our tree -> reference state_dict -> torch model.
    from bilinear_tpu.utils.torch_compat import hourglass_torch7_to_torch_state

    ex = hourglass_torch7_to_torch_state(params, stats)
    sd = tm.state_dict()
    used = [k for k in sd if not (
        k.endswith(("conv_skip.weight", "conv_skip.bias"))
        and sd[k.rsplit(".", 2)[0] + ".conv_skip.weight"].shape[0]
        == sd[k.rsplit(".", 2)[0] + ".conv_skip.weight"].shape[1]
    )]
    assert set(ex.sd) == set(sd)
    for k in used:
        np.testing.assert_allclose(np.asarray(ex.sd[k]), sd[k].numpy(),
                                   rtol=1e-6, err_msg=k)
