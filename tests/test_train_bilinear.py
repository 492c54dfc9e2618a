"""M1 integration: end-to-end bilinear training on synthetic schema-exact
bins, step-for-step loss/param parity vs a torch reference loop, checkpoint
round-trip, and MPJPE protocol correctness."""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from bilinear_tpu.data.h36m import Protocol, Task, load_h36m
from bilinear_tpu.data.synthetic import write_h36m_dataset
from bilinear_tpu.eval.mpjpe import evaluate_mpjpe
from bilinear_tpu.io.checkpoint import (
    latest_epoch,
    load_checkpoint,
    resume_or_init,
    save_checkpoint,
)
from bilinear_tpu.models.bilinear import BilinearUnit
from bilinear_tpu.train.bilinear import BilinearTrainer
from bilinear_tpu.utils.torch_compat import bilinear_from_torch

sys.path.insert(0, "/root/reference")


@pytest.fixture(scope="module")
def h36m_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("Human3.6M")
    return write_h36m_dataset(str(d), n_train=200, n_valid=96)


@pytest.fixture(scope="module")
def splits(h36m_dir):
    return load_h36m(h36m_dir, Protocol.GT)


def test_load_preprocessing_matches_reference_semantics(splits):
    tr = splits[Task.Train]
    assert tr.part.shape[1] == 32 and tr.s.shape[1] == 48
    # Normalized train data has ~zero mean / unit std per dimension.
    np.testing.assert_allclose(tr.part.mean(axis=0), 0, atol=1e-5)
    np.testing.assert_allclose(tr.part.std(axis=0), 1, atol=1e-4)
    # Valid split normalized with TRAIN stats, not its own.
    va = splits[Task.Valid]
    np.testing.assert_allclose(va.mean_part, tr.mean_part)
    assert not np.allclose(va.part.mean(axis=0), 0, atol=1e-3)
    # Sub-action suffixes merged: 'Walking_1' never survives as an action.
    assert all("_" not in a for a in tr.action_names)


def test_train_loss_decreases(splits):
    tr = splits[Task.Train]
    trainer = BilinearTrainer(batch_size=32)
    state = trainer.init_state(jax.random.PRNGKey(0))
    x, y = jnp.asarray(tr.part), jnp.asarray(tr.s)
    state, losses0 = trainer.train_epoch(state, x, y, jax.random.PRNGKey(1))
    for e in range(4):
        state, losses = trainer.train_epoch(state, x, y, jax.random.PRNGKey(2 + e))
    assert float(losses.mean()) < float(losses0.mean())
    # drop_last=False parity: 200 % 32 = 8 -> 7 steps per epoch.
    assert losses.shape[0] == 7
    assert int(state.step) == 1 + 5 * 7


def test_step_parity_vs_torch_reference_loop(splits):
    """Whole-step parity: forward+MSE+backward+clip(1)+Adam with the
    reference's exact hyperparameters, same weights, same batches, dropout
    disabled. Losses and params must track torch step-for-step."""
    from model import bilinear as ref_bilinear  # reference oracle

    torch.manual_seed(0)
    tm = ref_bilinear.BilinearUnit()

    def weight_init(m):
        if isinstance(m, torch.nn.Linear):
            torch.nn.init.kaiming_normal_(m.weight)

    tm.apply(weight_init)
    topt = torch.optim.Adam(tm.parameters(), lr=1e-3)
    tm.train()
    for mod in tm.modules():
        if isinstance(mod, torch.nn.Dropout):
            mod.eval()

    params, stats = bilinear_from_torch(tm.state_dict())
    trainer = BilinearTrainer(batch_size=32, learning_rate=1e-3, dropout=0.0)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state = state.replace(params=jax.device_put(params), batch_stats=jax.device_put(stats))

    tr = splits[Task.Train]
    step_fn = jax.jit(trainer._train_step)
    crit = torch.nn.MSELoss()

    for i in range(6):  # 200 samples -> 6 full 32-sample batches
        bx = tr.part[i * 32 : (i + 1) * 32]
        by = tr.s[i * 32 : (i + 1) * 32]

        topt.zero_grad()
        out = tm(torch.from_numpy(bx.copy()))
        tl = crit(out, torch.from_numpy(by.copy()))
        tl.backward()
        torch.nn.utils.clip_grad_norm_(tm.parameters(), max_norm=1)
        topt.step()

        state, jl = step_fn(
            state, jnp.asarray(bx), jnp.asarray(by), jax.random.PRNGKey(9)
        )
        assert float(tl.detach()) == pytest.approx(float(jl), rel=2e-4), f"step {i}"

    # Params still aligned after 8 optimizer steps.
    p2, s2 = bilinear_from_torch(tm.state_dict())
    for ours, theirs in [
        (state.params["decode"]["kernel"], p2["decode"]["kernel"]),
        (state.params["encode"]["linear"]["kernel"], p2["encode"]["linear"]["kernel"]),
        (state.batch_stats["encode"]["bn"]["mean"], s2["encode"]["bn"]["mean"]),
    ]:
        np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-3, atol=1e-4)


def test_checkpoint_roundtrip_and_resume(splits, tmp_path):
    tr = splits[Task.Train]
    x, y = jnp.asarray(tr.part), jnp.asarray(tr.s)
    pdir = str(tmp_path / "parameter")

    trainer = BilinearTrainer(batch_size=32)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state, _ = trainer.train_epoch(state, x, y, jax.random.PRNGKey(1))
    save_checkpoint(pdir, 1, state)
    state, _ = trainer.train_epoch(state, x, y, jax.random.PRNGKey(2))
    save_checkpoint(pdir, 2, state)

    assert latest_epoch(pdir) == 2
    assert load_checkpoint(pdir, 2)["epoch"] == 2

    # Resume from epoch 1 and re-run epoch 2 -> identical state as straight-through.
    from bilinear_tpu.io.checkpoint import restore_state

    trainer2 = BilinearTrainer(batch_size=32)
    template = trainer2.init_state(jax.random.PRNGKey(99))
    resumed = restore_state(template, load_checkpoint(pdir, 1))
    resumed, _ = trainer2.train_epoch(resumed, x, y, jax.random.PRNGKey(2))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        ),
        resumed.params,
        state.params,
    )
    assert int(resumed.step) == int(state.step)


def test_resume_picks_newest(tmp_path, splits):
    pdir = str(tmp_path / "parameter")
    trainer = BilinearTrainer(batch_size=32)
    state = trainer.init_state(jax.random.PRNGKey(0))
    for e in [1, 5, 3]:
        save_checkpoint(pdir, e, state.replace(step=jnp.asarray(e * 100, jnp.int32)))
    template = trainer.init_state(jax.random.PRNGKey(1))
    resumed, epoch = resume_or_init(template, pdir)
    assert epoch == 5
    assert int(resumed.step) == 500


def test_mpjpe_protocol_against_numpy_oracle(splits):
    """Evaluator must equal a direct numpy transcription of
    valid_bilinear.py:51-83."""
    va = splits[Task.Valid]
    model = BilinearUnit()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 32)), train=False
    )

    per_action, overall = evaluate_mpjpe(model, variables, va, chunk=32)

    pred = np.asarray(
        model.apply(variables, jnp.asarray(va.part), train=False)
    )
    pred_mm = pred * va.std_s + va.mean_s
    gt_mm = va.s * va.std_s + va.mean_s
    d = np.sqrt(
        ((pred_mm.reshape(-1, 16, 3) - gt_mm.reshape(-1, 16, 3)) ** 2).sum(2)
    ).sum(1)
    exp_overall = d.sum() / (len(va) * 16)
    assert overall == pytest.approx(exp_overall, rel=1e-5)

    for i, name in enumerate(va.action_names):
        m = va.actions == i
        if m.sum():
            assert per_action[name] == pytest.approx(
                d[m].sum() / (m.sum() * 16), rel=1e-5
            ), name
