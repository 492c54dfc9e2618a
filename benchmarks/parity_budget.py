"""Full-budget trajectory parity vs the reference implementation.

BASELINE.md's accuracy target is "MPJPE within 0.5 mm of the reference's
attained value". Round 1 proved 4-step whole-step parity; this harness runs
the reference's ACTUAL training semantics (train_bilinear.py:56-105: per-batch
LR-fire check via the util/config.py:19-23 lambdas, MSE, backward,
clip_grad_norm_(1), Adam step, step counter, epoch checkpoints with
{'epoch','step','state','optimizer'}) against our jitted train step in
LOCKSTEP on identical synthetic bins, through:

- >= 2 full epochs including the trailing partial batch
  (DataLoader drop_last=False semantics),
- one checkpoint/save -> fresh-process-style restore boundary on BOTH sides
  after epoch 1 (ours via io.checkpoint, theirs via torch state_dicts, the
  model/bilinear.py:63-83 resume contract),
- the step==1 LR fire (first batch) and the step==100000 LR fire
  (both sides' step counters fast-forwarded identically),

then evaluates final MPJPE with both protocols (ours: eval/mpjpe.py; theirs:
a direct transcription of valid_bilinear.py:51-83) and asserts the gap.

Both sides run with dropout p=0 — the one RNG the two frameworks cannot
share; everything else (init, data order, BN batch statistics, bias
correction, clipping, schedule fires) is exercised bit-for-bit-comparably.

Run standalone:  python benchmarks/parity_budget.py
(forces CPU: this is a torch-CPU lockstep by construction).
"""
from __future__ import annotations

import importlib.util
import json
import os
import sys
import tempfile
from typing import Optional

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_reference_module(relpath: str, name: str):
    """Import one reference file as an oracle without executing its package
    __init__ (which imports torchvision, absent here)."""
    from bilinear_tpu.data.h36m import _install_vectormath_shim

    _install_vectormath_shim()
    spec = importlib.util.spec_from_file_location(
        name, f"/root/reference/{relpath}"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _torch_mpjpe(tm, split, batch: int = 64) -> float:
    """Transcription of valid_bilinear.py:51-83 (overall average, mm)."""
    import numpy as np
    import torch

    tm.eval()
    dt = next(tm.parameters()).dtype
    total, n = 0.0, len(split)
    with torch.no_grad():
        for i in range(0, n, batch):
            x = torch.from_numpy(split.part[i : i + batch].copy()).to(dt)
            pred = tm(x).numpy()
            pred_mm = pred * split.std_s + split.mean_s
            gt_mm = split.raw_s[i : i + batch]
            d = np.sqrt(
                np.sum(
                    np.square(pred_mm.reshape(-1, 16, 3) - gt_mm.reshape(-1, 16, 3)),
                    axis=2,
                )
            ).sum()
            total += float(d)
    tm.train()
    return total / (n * 16)


def run_parity(
    n_train: int = 2080,  # 64*32 + 32 -> exercises the trailing partial batch
    n_valid: int = 512,
    epochs: int = 2,
    batch: int = 64,
    seed: int = 0,
    lr_fire_steps: int = 6,
    data_dir: Optional[str] = None,
    precision: str = "float64",
    loss_rtol: Optional[float] = None,
    mpjpe_tol_mm: float = 0.5,
    verbose: bool = True,
) -> dict:
    """Two complementary claims (measured fact: trajectory differences grow
    chaotically at ~1.5x/step from the fp noise floor, because torch-CPU and
    XLA-CPU can never share summation order — so no fixed per-step tolerance
    survives an unsynced full budget at any precision):

    - precision='float64' (requires jax_enable_x64): the SEMANTIC proof.
      Full state (params, BN stats, Adam moments, counters) is re-synced from
      torch at each epoch boundary, so every epoch-long segment must track at
      the f64 noise floor (per-step rel < 1e-6, ~100x margin over the
      measured amplified floor) — any systematic formula mismatch (BN eps,
      bias correction, clip rule, LR fire) would blow past it immediately.
    - precision='float32': deployment precision, NO resync — the whole
      budget runs free on both sides and only the final evaluated MPJPE gap
      is asserted (< 0.5 mm, the BASELINE.md target)."""
    import numpy as np
    import torch
    import torch.nn as tnn

    import jax
    import jax.numpy as jnp

    from bilinear_tpu.core.optim import reference_bilinear_schedule
    from bilinear_tpu.data.h36m import Task, load_h36m
    from bilinear_tpu.data.synthetic import write_h36m_dataset
    from bilinear_tpu.eval.mpjpe import evaluate_mpjpe
    from bilinear_tpu.io.checkpoint import (
        load_checkpoint,
        restore_state,
        save_checkpoint,
    )
    from bilinear_tpu.train.bilinear import BilinearTrainer
    from bilinear_tpu.core.optim import TorchAdamState
    from bilinear_tpu.utils.torch_compat import (
        bilinear_from_torch,
        bilinear_optimizer_from_torch,
    )

    assert precision in ("float32", "float64")
    f64 = precision == "float64"
    if f64:
        assert jax.config.jax_enable_x64, (
            "float64 parity needs jax_enable_x64 (run via __main__)"
        )
    if loss_rtol is None:
        loss_rtol = 1e-6 if f64 else float("inf")
    resync = f64
    npdt = np.float64 if f64 else np.float32

    torch.manual_seed(seed)
    tmp = None
    if data_dir is None:
        tmp = tempfile.TemporaryDirectory()
        data_dir = os.path.join(tmp.name, "Human3.6M")
    write_h36m_dataset(data_dir, n_train=n_train, n_valid=n_valid, seed=seed)
    splits = load_h36m(data_dir)
    tr, va = splits[Task.Train], splits[Task.Valid]

    # ---- reference side: model + Kaiming init + Adam, dropout off ---------
    ref = _load_reference_module("model/bilinear.py", "_parity_ref_bilinear")
    tm = ref.BilinearUnit()
    if f64:
        tm = tm.double()
    for m in tm.modules():  # the reference's no-checkpoint init path (:86-90)
        if isinstance(m, tnn.Linear):
            tnn.init.kaiming_normal_(m.weight)
        if isinstance(m, tnn.Dropout):
            m.p = 0.0
    tm.train()
    opt = torch.optim.Adam(tm.parameters(), lr=1.0e-3)
    crit = tnn.MSELoss()
    lr_condition = lambda step: step % 100000 == 0 or step == 1  # noqa: E731
    lr_function = lambda step: 1.0e-3 * 0.96 ** (step / 100000)  # noqa: E731
    torch_step = 1  # model/bilinear.py:62 fresh-load value

    # ---- our side: identical starting weights -----------------------------
    trainer = BilinearTrainer(
        batch_size=batch, dropout=0.0,
        dtype=jnp.float64 if f64 else jnp.float32,
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    p0, s0 = bilinear_from_torch(tm.state_dict())
    state = state.replace(
        params=jax.tree.map(jnp.asarray, p0),
        batch_stats=jax.tree.map(jnp.asarray, s0),
    )
    step_fn = jax.jit(trainer._train_step)
    key = jax.random.PRNGKey(1)  # unused randomness: dropout p=0

    rng = np.random.RandomState(seed + 123)
    max_rel = 0.0
    n_steps = 0
    lr_fire_checked = {"step1": False, "step100k": False}

    def lockstep_batch(state, idx, tag):
        nonlocal torch_step, max_rel, n_steps
        bx = tr.part[idx].astype(npdt)
        by = tr.s[idx].astype(npdt)
        # reference loop body (train_bilinear.py:61-89)
        if lr_condition(torch_step):
            lr = lr_function(torch_step)
            for g in opt.param_groups:
                g["lr"] = lr
            if torch_step == 1:
                lr_fire_checked["step1"] = True
            if torch_step % 100000 == 0:
                lr_fire_checked["step100k"] = True
        opt.zero_grad()
        tl = crit(tm(torch.from_numpy(bx.copy())), torch.from_numpy(by.copy()))
        tl.backward()
        tnn.utils.clip_grad_norm_(tm.parameters(), max_norm=1)
        opt.step()
        torch_step += 1
        # our whole-step program
        state, jl = step_fn(state, jnp.asarray(bx), jnp.asarray(by), key)
        rel = abs(float(tl.detach()) - float(jl)) / max(abs(float(tl.detach())), 1e-9)
        max_rel = max(max_rel, rel)
        n_steps += 1
        assert rel < loss_rtol, (
            f"{tag} step {n_steps}: torch loss {float(tl.detach())} vs "
            f"jax {float(jl)} (rel {rel:.2e})"
        )
        return state

    def resync_from_torch(state):
        """Copy torch's full training state (weights, BN stats, Adam moments,
        step count) onto ours, resetting chaotic drift to zero so the next
        segment re-proves semantic parity from an identical state."""
        p, s = bilinear_from_torch(tm.state_dict())
        count, mu, nu = bilinear_optimizer_from_torch(opt.state_dict())
        clip_s, _ = state.opt_state
        adam_s = TorchAdamState(
            jnp.asarray(count, jnp.int32),
            jax.tree.map(jnp.asarray, mu),
            jax.tree.map(jnp.asarray, nu),
        )
        return state.replace(
            params=jax.tree.map(jnp.asarray, p),
            batch_stats=jax.tree.map(jnp.asarray, s),
            opt_state=(clip_s, adam_s),
        )

    ckpt_dir = tempfile.mkdtemp(prefix="parity_ckpt_")
    for epoch in range(1, epochs + 1):
        perm = rng.permutation(len(tr))
        for i in range(0, len(tr), batch):  # drop_last=False: tail included
            state = lockstep_batch(state, perm[i : i + batch], f"epoch{epoch}")
        if resync:
            state = resync_from_torch(state)

        if epoch == 1:
            # checkpoint/resume boundary on both sides.
            save_checkpoint(ckpt_dir, 1, state)
            torch.save(
                {
                    "epoch": 1,
                    "step": torch_step,
                    "state": tm.state_dict(),
                    "optimizer": opt.state_dict(),
                },
                os.path.join(ckpt_dir, "1.torchsave"),
            )
            trainer = BilinearTrainer(
                batch_size=batch, dropout=0.0,
                dtype=jnp.float64 if f64 else jnp.float32,
            )
            template = trainer.init_state(jax.random.PRNGKey(99))
            state = restore_state(template, load_checkpoint(ckpt_dir, 1))
            step_fn = jax.jit(trainer._train_step)

            payload = torch.load(
                os.path.join(ckpt_dir, "1.torchsave"), weights_only=False
            )
            tm = ref.BilinearUnit()
            if f64:
                tm = tm.double()
            for m in tm.modules():
                if isinstance(m, tnn.Dropout):
                    m.p = 0.0
            tm.load_state_dict(payload["state"])
            tm.train()
            opt = torch.optim.Adam(tm.parameters(), lr=1.0e-3)
            opt.load_state_dict(payload["optimizer"])
            torch_step = payload["step"]
            if verbose:
                print(f"resumed both sides at step {torch_step}")

    # ---- fast-forward both step counters to the 100k LR fire --------------
    offset = 100_000 - torch_step
    torch_step += offset
    for st in opt.state.values():
        st["step"] += offset
    clip_s, adam_s = state.opt_state
    adam_s = adam_s._replace(count=adam_s.count + offset)
    state = state.replace(opt_state=(clip_s, adam_s))
    for k in range(lr_fire_steps):
        idx = rng.permutation(len(tr))[:batch]
        state = lockstep_batch(state, idx, "lr-fire")
    assert lr_fire_checked["step1"] and lr_fire_checked["step100k"], (
        "LR schedule fire points not both exercised"
    )
    fired_lr = float(opt.param_groups[0]["lr"])
    sched = reference_bilinear_schedule()
    ours_lr = float(sched(jnp.asarray(100_000 + lr_fire_steps - 1)))
    assert abs(fired_lr - 0.96e-3) < 1e-9, fired_lr
    assert abs(ours_lr - fired_lr) < 1e-9, (ours_lr, fired_lr)

    # ---- final MPJPE, both protocols ---------------------------------------
    ref_mpjpe = _torch_mpjpe(tm, va, batch)
    _, ours_mpjpe = evaluate_mpjpe(
        trainer.model,
        {"params": state.params, "batch_stats": state.batch_stats},
        va,
        chunk=256,
    )
    gap = abs(ref_mpjpe - ours_mpjpe)
    assert gap < mpjpe_tol_mm, (
        f"final MPJPE gap {gap:.4f} mm exceeds {mpjpe_tol_mm} mm "
        f"(ref {ref_mpjpe:.4f}, ours {ours_mpjpe:.4f})"
    )
    result = {
        "precision": precision,
        "steps": n_steps,
        "epochs": epochs,
        "n_train": n_train,
        "max_step_loss_rel_diff": max_rel,
        "ref_mpjpe_mm": ref_mpjpe,
        "ours_mpjpe_mm": ours_mpjpe,
        "mpjpe_gap_mm": gap,
        "resume_boundary": True,
        "lr_fires": ["step==1", "step==100000"],
    }
    if verbose:
        print(json.dumps(result))
    if tmp is not None:
        tmp.cleanup()
    return result


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_enable_x64", True)
    run_parity(precision="float64")
    run_parity(precision="float32")
