"""Whole-step parity for the hourglass trainer: forward + sum-of-stacks MSE +
backward + clip(1.0) + RMSprop(2.5e-4) vs the same loop on the reference
torch model (small config, CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from oracle_loader import load_reference_module

from bilinear_tpu.core.optim import hourglass_optimizer
from bilinear_tpu.core.state import TrainState
from bilinear_tpu.models.hourglass_torch7 import MainModel
from bilinear_tpu.utils.torch_compat import hourglass_torch7_from_torch


def test_hourglass_train_step_matches_torch():
    ref = load_reference_module("model/hourglass_torch7.py", "ref_hg_t7_step")
    ref.CONFIG.nStacks = 2
    ref.CONFIG.nFeatures = 16
    ref.CONFIG.nDepth = 2
    torch.manual_seed(3)
    tm = ref.MainModel()
    tm.train()
    topt = torch.optim.RMSprop(tm.parameters(), lr=2.5e-4)
    crit = torch.nn.MSELoss()

    params, stats = hourglass_torch7_from_torch(tm.state_dict(), 2, 2)
    ours = MainModel(n_stacks=2, features=16, depth=2)
    tx = hourglass_optimizer(2.5e-4)
    state = TrainState.create(jax.device_put(params), jax.device_put(stats), tx)

    @jax.jit
    def step(state, x, tgt):
        def loss_fn(p):
            out, mut = ours.apply(
                {"params": p, "batch_stats": state.batch_stats},
                x, train=True, mutable=["batch_stats"],
            )
            return (
                jnp.sum(jnp.mean(jnp.square(out - tgt[None]), axis=(1, 2, 3, 4))),
                mut["batch_stats"],
            )

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        return state.apply_updates(tx, grads).replace(batch_stats=new_stats), loss

    rng = np.random.RandomState(0)
    for i in range(4):
        x = rng.rand(2, 3, 64, 64).astype(np.float32)
        tgt = rng.rand(2, 16, 16, 16).astype(np.float32)  # (B, J, h, w)

        topt.zero_grad()
        outs = tm(torch.from_numpy(x.copy()))
        tl = sum(crit(o, torch.from_numpy(tgt.copy())) for o in outs)
        tl.backward()
        torch.nn.utils.clip_grad_norm_(tm.parameters(), max_norm=1)
        topt.step()

        state, jl = step(
            state,
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(tgt.transpose(0, 2, 3, 1)),
        )
        # Float noise amplifies fast through 100+ conv/BN layers + RMSprop;
        # early steps must match tightly, later ones track within a percent.
        rel = 5e-3 if i < 2 else 3e-2
        assert float(tl.detach()) == pytest.approx(float(jl), rel=rel), f"step {i}"

    # Spot-check a deep parameter after 4 RMSprop steps. Early RMSprop
    # updates can reach ~10x lr (sqrt(sq) << |g|), so exact parity decays
    # fast; require the torch and jax trajectories to stay within a few
    # update quanta and strongly aligned.
    p2, _ = hourglass_torch7_from_torch(tm.state_dict(), 2, 2)
    a = np.asarray(state.params["hg_1"]["res3"]["conv2"]["kernel"]).ravel()
    b = p2["hg_1"]["res3"]["conv2"]["kernel"].ravel()
    assert np.abs(a - b).max() < 0.02
    cos = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.999
