"""Drop-in migration from reference torch checkpoints: model weights AND Adam
moments transfer, and training continues in lockstep with torch."""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from bilinear_tpu.train.bilinear import BilinearTrainer
from bilinear_tpu.utils.torch_compat import load_reference_bilinear_checkpoint

sys.path.insert(0, "/root/reference")


def test_checkpoint_migration_continues_in_lockstep(tmp_path):
    from model import bilinear as ref_bilinear

    torch.manual_seed(0)
    tm = ref_bilinear.BilinearUnit()
    topt = torch.optim.Adam(tm.parameters(), lr=1e-3)
    tm.train()
    for mod in tm.modules():
        if isinstance(mod, torch.nn.Dropout):
            mod.eval()

    rng = np.random.RandomState(0)
    crit = torch.nn.MSELoss()

    def torch_step(bx, by):
        topt.zero_grad()
        loss = crit(tm(torch.from_numpy(bx.copy())), torch.from_numpy(by.copy()))
        loss.backward()
        torch.nn.utils.clip_grad_norm_(tm.parameters(), max_norm=1)
        topt.step()
        return float(loss.detach())

    # 3 torch steps, then checkpoint in the reference's format.
    batches = [
        (rng.randn(32, 32).astype(np.float32), rng.randn(32, 48).astype(np.float32))
        for _ in range(6)
    ]
    for bx, by in batches[:3]:
        torch_step(bx, by)
    ckpt = str(tmp_path / "3.save")
    torch.save(
        {"epoch": 3, "step": 4, "state": tm.state_dict(),
         "optimizer": topt.state_dict()},
        ckpt,
    )

    # Migrate and continue on our side; torch continues on its side.
    trainer = BilinearTrainer(batch_size=32, learning_rate=1e-3, dropout=0.0)
    template = trainer.init_state(jax.random.PRNGKey(0))
    state, epoch = load_reference_bilinear_checkpoint(ckpt, template)
    assert epoch == 3
    assert int(state.step) == 4
    assert int(state.opt_state[1].count) == 3  # Adam moments carried over

    step_fn = jax.jit(trainer._train_step)
    for i, (bx, by) in enumerate(batches[3:]):
        tl = torch_step(bx, by)
        state, jl = step_fn(
            state, jnp.asarray(bx), jnp.asarray(by), jax.random.PRNGKey(9)
        )
        # Lockstep: identical losses AFTER resume proves weights AND
        # optimizer moments migrated.
        assert tl == pytest.approx(float(jl), rel=3e-4), f"post-resume step {i}"
