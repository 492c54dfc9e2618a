"""Reverse migration: our checkpoints -> reference torch format.

Round-trips (torch -> ours -> torch must be exact) and true consumption by
the reference's own loaders (model/bilinear.py:58-92 resumes an exported
checkpoint and continues training in lockstep — weights, BN stats AND
optimizer moments transfer)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from oracle_loader import load_reference_module

from bilinear_tpu.core.optim import hourglass_optimizer
from bilinear_tpu.core.state import TrainState
from bilinear_tpu.models.hourglass_torch7 import MainModel
from bilinear_tpu.train.bilinear import BilinearTrainer
from bilinear_tpu.utils.torch_compat import (
    bilinear_from_torch,
    bilinear_to_torch_state,
    hourglass_from_torch,
    hourglass_to_torch_state,
    hourglass_torch7_from_torch,
    hourglass_torch7_to_torch_state,
    save_reference_bilinear_checkpoint,
    save_reference_hourglass_checkpoint,
)


def _assert_sd_equal(ours_sd, ref_sd, skip_keys=()):
    assert set(ours_sd) == set(ref_sd), (
        set(ours_sd) ^ set(ref_sd)
    )
    for k, v in ref_sd.items():
        if k in skip_keys:
            continue
        np.testing.assert_array_equal(
            ours_sd[k], v.detach().numpy(), err_msg=k
        )


def test_bilinear_roundtrip_exact():
    ref = load_reference_module("model/bilinear.py", "ref_bl_export")
    torch.manual_seed(0)
    tm = ref.BilinearUnit()
    sd = tm.state_dict()
    params, stats = bilinear_from_torch(sd)
    ex = bilinear_to_torch_state(params, stats)
    _assert_sd_equal(ex.sd, sd)
    # The spec's param-id order must equal model.parameters() order (that is
    # what torch optimizer integer ids index).
    named = [k for k, _ in tm.named_parameters()]
    assert [k for k, _, _ in ex.spec] == named


def test_torch7_roundtrip():
    ref = load_reference_module("model/hourglass_torch7.py", "ref_t7_export")
    ref.CONFIG.nStacks = 2
    ref.CONFIG.nFeatures = 32
    ref.CONFIG.nDepth = 2
    torch.manual_seed(1)
    tm = ref.MainModel()
    sd = tm.state_dict()
    params, stats = hourglass_torch7_from_torch(sd, n_stacks=2, n_depth=2)
    ex = hourglass_torch7_to_torch_state(params, stats)
    # conv_skip is registered even where in==out but never used in forward
    # (model/hourglass_torch7.py:19,33-37); import drops those, export emits
    # zeros — every USED key must round-trip exactly.
    unused = {
        k for k in sd
        if k.endswith(("conv_skip.weight", "conv_skip.bias"))
        and sd[k.rsplit(".", 2)[0] + ".conv_skip.weight"].shape[0]
        == sd[k.rsplit(".", 2)[0] + ".conv_skip.weight"].shape[1]
    }
    _assert_sd_equal(ex.sd, sd, skip_keys=unused)
    tm.load_state_dict(
        {k: torch.from_numpy(np.array(v)) for k, v in ex.sd.items()},
        strict=True,
    )
    named = [k for k, _ in tm.named_parameters()]
    assert [k for k, _, _ in ex.spec] == named


def test_preact_roundtrip():
    ref = load_reference_module("model/hourglass.py", "ref_hg_export")
    torch.manual_seed(2)
    tm = ref.StackedHourglass(
        stacks=2, joints=16, out_channels=32, compression_time=2
    )
    sd = tm.state_dict()
    params, stats = hourglass_from_torch(sd, n_stacks=2, compression_time=2)
    ex = hourglass_to_torch_state(params, stats)
    _assert_sd_equal(ex.sd, sd)
    tm.load_state_dict(
        {k: torch.from_numpy(np.array(v)) for k, v in ex.sd.items()},
        strict=True,
    )
    named = [k for k, _ in tm.named_parameters()]
    assert [k for k, _, _ in ex.spec] == named


def test_bilinear_export_resumes_in_reference(tmp_path):
    """The reference's model.bilinear.load() resumes OUR checkpoint and then
    trains in lockstep with us — the full reverse-migration contract."""
    ref = load_reference_module("model/bilinear.py", "ref_bl_resume")

    trainer = BilinearTrainer(batch_size=32, learning_rate=1e-3, dropout=0.0)
    state = trainer.init_state(jax.random.PRNGKey(0))
    step_fn = jax.jit(trainer._train_step)

    rng = np.random.RandomState(0)
    batches = [
        (rng.randn(32, 32).astype(np.float32),
         rng.randn(32, 48).astype(np.float32))
        for _ in range(6)
    ]
    for bx, by in batches[:3]:
        state, _ = step_fn(
            state, jnp.asarray(bx), jnp.asarray(by), jax.random.PRNGKey(7)
        )

    save_reference_bilinear_checkpoint(
        str(tmp_path / "5.save"), state, epoch=5
    )

    tm, topt, step, epoch = ref.load(torch.device("cpu"), str(tmp_path))
    assert epoch == 5
    assert step == int(state.step)

    # Forward parity (eval mode: BN running stats must have transferred).
    tm.eval()
    x = rng.randn(16, 32).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x)).numpy()
    ours_out = trainer.model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(x), train=False,
    )
    np.testing.assert_allclose(np.asarray(ours_out), ref_out, atol=2e-5)

    # Lockstep continuation: identical losses prove the Adam moments (and
    # their param-id ordering) migrated too.
    tm.train()
    for mod in tm.modules():
        if isinstance(mod, torch.nn.Dropout):
            mod.eval()
    crit = torch.nn.MSELoss()
    for i, (bx, by) in enumerate(batches[3:]):
        topt.zero_grad()
        tl = crit(tm(torch.from_numpy(bx.copy())),
                  torch.from_numpy(by.copy()))
        tl.backward()
        torch.nn.utils.clip_grad_norm_(tm.parameters(), max_norm=1)
        topt.step()
        state, jl = step_fn(
            state, jnp.asarray(bx), jnp.asarray(by), jax.random.PRNGKey(9)
        )
        assert float(tl.detach()) == pytest.approx(float(jl), rel=3e-4), (
            f"post-export step {i}"
        )


def test_hourglass_export_resumes_in_reference(tmp_path):
    """model.hourglass_torch7.load() resumes our detector checkpoint;
    RMSprop square_avg moments transfer (lockstep loss after resume)."""
    ref = load_reference_module("model/hourglass_torch7.py", "ref_t7_resume")
    ref.CONFIG.nStacks = 2
    ref.CONFIG.nFeatures = 16
    ref.CONFIG.nDepth = 2

    ours = MainModel(n_stacks=2, features=16, depth=2)
    rng = np.random.RandomState(3)
    x0 = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    variables = ours.init(jax.random.PRNGKey(0), x0, train=False)
    tx = hourglass_optimizer(2.5e-4)
    state = TrainState.create(
        variables["params"], variables["batch_stats"], tx
    )

    @jax.jit
    def step(state, x, tgt):
        def loss_fn(p):
            out, mut = ours.apply(
                {"params": p, "batch_stats": state.batch_stats},
                x, train=True, mutable=["batch_stats"],
            )
            return (
                jnp.sum(jnp.mean(jnp.square(out - tgt[None]),
                                 axis=(1, 2, 3, 4))),
                mut["batch_stats"],
            )

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        return (
            state.apply_updates(tx, grads).replace(batch_stats=new_stats),
            loss,
        )

    batches = [
        (rng.rand(2, 64, 64, 3).astype(np.float32),
         rng.rand(2, 16, 16, 16).astype(np.float32))
        for _ in range(4)
    ]
    for bx, bt in batches[:2]:
        state, _ = step(state, jnp.asarray(bx), jnp.asarray(bt))

    save_reference_hourglass_checkpoint(
        str(tmp_path / "3.save"), state, epoch=3, family="torch7"
    )

    tm, topt, step_no, epoch = ref.load(torch.device("cpu"), str(tmp_path))
    assert epoch == 3

    crit = torch.nn.MSELoss()
    tm.train()
    for i, (bx, bt) in enumerate(batches[2:]):
        topt.zero_grad()
        outs = tm(torch.from_numpy(bx.transpose(0, 3, 1, 2).copy()))
        tl = sum(crit(o, torch.from_numpy(bt.transpose(0, 3, 1, 2).copy()))
                 for o in outs)
        tl.backward()
        torch.nn.utils.clip_grad_norm_(tm.parameters(), max_norm=1)
        topt.step()
        state, jl = step(state, jnp.asarray(bx), jnp.asarray(bt))
        assert float(tl.detach()) == pytest.approx(float(jl), rel=1e-3), (
            f"post-export step {i}"
        )


def test_export_torch_cli(tmp_path):
    """The export_torch CLI: our-format checkpoint on disk -> reference
    torch file the reference loader resumes."""
    from bilinear_tpu.cli.export_torch import main as export_main
    from bilinear_tpu.io.checkpoint import save_checkpoint

    ref = load_reference_module("model/bilinear.py", "ref_bl_cli")

    trainer = BilinearTrainer(batch_size=16, dropout=0.0)
    state = trainer.init_state(jax.random.PRNGKey(1))
    run_dir = tmp_path / "save" / "Bilinear GT" / "parameter"
    save_checkpoint(str(run_dir), 4, state.replace(step=jnp.asarray(9)))

    out_dir = tmp_path / "export"
    export_main([
        "--family", "bilinear",
        "--save-root", str(tmp_path / "save"),
        "--out-dir", str(out_dir),
    ])
    tm, _, step, epoch = ref.load(torch.device("cpu"), str(out_dir))
    assert (epoch, step) == (4, 9)

    tm.eval()
    x = np.random.RandomState(5).randn(4, 32).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x)).numpy()
    ours_out = trainer.model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(x), train=False,
    )
    np.testing.assert_allclose(np.asarray(ours_out), ref_out, atol=2e-5)
