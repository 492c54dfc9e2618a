"""Resume-contract tests beyond the bilinear basics:

- the Orbax backend participates in the reference's newest-epoch auto-resume
  scan (model/bilinear.py:63-83) — round 1 left `latest_epoch` scanning only
  `.save` pickles, so Orbax runs could never resume;
- hourglass train/checkpoint/resume at N/2 equals training N steps straight,
  including RMSprop state and cumulative-BN statistics (the bilinear side had
  this; the hourglass side didn't).
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bilinear_tpu.io.checkpoint import (
    latest_epoch,
    load_checkpoint,
    resume_or_init,
    restore_state,
    save_checkpoint,
    save_checkpoint_orbax,
)
from bilinear_tpu.models.hourglass_torch7 import MainModel
from bilinear_tpu.train.bilinear import BilinearTrainer
from bilinear_tpu.train.hourglass import HourglassTrainer


def _assert_trees_equal(a, b, rtol=1e-6, atol=1e-7):
    jax.tree.map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=rtol, atol=atol
        ),
        a,
        b,
    )


def test_orbax_checkpoint_auto_resumes(tmp_path):
    pdir = str(tmp_path / "parameter")
    trainer = BilinearTrainer(batch_size=16)
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(16, 32).astype(np.float32))
    y = jnp.asarray(rng.randn(16, 48).astype(np.float32))
    step = jax.jit(trainer._train_step)

    state, _ = step(state, x, y, jax.random.PRNGKey(1))
    save_checkpoint(pdir, 1, state)
    state, _ = step(state, x, y, jax.random.PRNGKey(2))
    save_checkpoint_orbax(pdir, 2, state)

    # The Orbax epoch must win the resume scan and load transparently.
    assert latest_epoch(pdir) == 2
    payload = load_checkpoint(pdir, 2)
    assert int(payload["epoch"]) == 2
    template = trainer.init_state(jax.random.PRNGKey(99))
    resumed, epoch = resume_or_init(template, pdir)
    assert epoch == 2
    assert int(resumed.step) == int(state.step)
    _assert_trees_equal(resumed.params, state.params)
    _assert_trees_equal(resumed.opt_state, state.opt_state)
    _assert_trees_equal(resumed.batch_stats, state.batch_stats)


def test_orbax_missing_epoch_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_checkpoint(str(tmp_path), 3)


def _hg_batch(seed, B=4, canvas=128):
    rng = np.random.RandomState(seed)
    return {
        "images": jnp.asarray(rng.rand(B, canvas, canvas, 3).astype(np.float32)),
        "centers": jnp.asarray(np.full((B, 2), 64.0, np.float32)),
        "scales": jnp.asarray(np.full((B,), 0.5, np.float32)),
        "keypoints": jnp.asarray(
            rng.uniform(30, 100, (B, 16, 2)).astype(np.float32)
        ),
        "valid": jnp.ones((B, 16), bool),
    }


def test_hourglass_resume_equivalence(tmp_path):
    """Train 4 steps straight vs. train 2 / checkpoint / restore / train 2:
    identical params, RMSprop state, BN stats, and step counter. Per-step
    augment/dropout keys derive from fold_in(rng, state.step), so the resumed
    run replays the same randomness."""
    pdir = str(tmp_path / "parameter")

    def make():
        t = HourglassTrainer(batch_size=4, canvas=128)
        t.model = MainModel(n_stacks=1, features=8, depth=1)
        return t

    batches = [_hg_batch(s) for s in range(4)]
    rng = jax.random.PRNGKey(7)

    straight = make()
    s = straight.init_state(jax.random.PRNGKey(0))
    step = jax.jit(straight._train_step)
    for b in batches:
        s, _ = step(s, b, rng)

    resumed_tr = make()
    r = resumed_tr.init_state(jax.random.PRNGKey(0))
    rstep = jax.jit(resumed_tr._train_step)
    for b in batches[:2]:
        r, _ = rstep(r, b, rng)
    save_checkpoint(pdir, 1, r)

    template = make().init_state(jax.random.PRNGKey(42))
    r2, epoch = resume_or_init(template, pdir)
    assert epoch == 1
    for b in batches[2:]:
        r2, _ = rstep(r2, b, rng)

    assert int(r2.step) == int(s.step)
    _assert_trees_equal(r2.params, s.params)
    _assert_trees_equal(r2.opt_state, s.opt_state)
    _assert_trees_equal(r2.batch_stats, s.batch_stats)


_CONCURRENT_WRITER = """
import sys
import numpy as np
from types import SimpleNamespace
from bilinear_tpu.io.checkpoint import save_checkpoint

pdir = sys.argv[1]
state = SimpleNamespace(
    step=7,
    params={"w": np.arange(1 << 16, dtype=np.float32)},
    batch_stats={},
    opt_state={},
)
for epoch in range(1, 16):
    save_checkpoint(pdir, epoch, state)
print("WRITER_OK")
"""


def test_concurrent_checkpoint_writers_do_not_race(tmp_path):
    """Two processes saving the same epochs into one save dir must both
    succeed (regression: the fixed '{epoch}.save.tmp' name let the winner's
    os.replace rename the loser's in-progress tmp away, crashing the loser
    with FileNotFoundError — observed when an orphaned trainer overlapped
    its relaunch in the round-3 budget run)."""
    import os as _os
    import subprocess
    import sys as _sys

    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    env = dict(_os.environ)
    env["PYTHONPATH"] = repo + _os.pathsep + env.get("PYTHONPATH", "")
    pdir = str(tmp_path / "parameter")
    procs = [
        subprocess.Popen(
            [_sys.executable, "-c", _CONCURRENT_WRITER, pdir],
            cwd=repo,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for _ in range(2)
    ]
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err[-4000:]
        assert "WRITER_OK" in out

    assert latest_epoch(pdir) == 15
    for epoch in range(1, 16):
        payload = load_checkpoint(pdir, epoch)
        np.testing.assert_array_equal(
            payload["state"]["params"]["w"],
            np.arange(1 << 16, dtype=np.float32),
        )
    # no tmp litter left behind
    leftovers = [f for f in _os.listdir(pdir) if ".tmp" in f]
    assert leftovers == []


def test_prune_checkpoints_retention(tmp_path):
    """prune_checkpoints keeps the newest N epochs, keep_every milestones,
    the -1 finalized sentinel, and foreign files; keep_last=0 is a no-op
    (the reference's keep-everything behavior). Resume still finds the
    newest epoch afterwards."""
    from types import SimpleNamespace

    from bilinear_tpu.io.checkpoint import prune_checkpoints

    pdir = str(tmp_path / "parameter")
    state = SimpleNamespace(
        step=1, params={"w": np.zeros(4, np.float32)}, batch_stats={},
        opt_state={},
    )
    for epoch in range(1, 11):
        save_checkpoint(pdir, epoch, state)
    save_checkpoint(pdir, -1, state)  # finalized sentinel
    (tmp_path / "parameter" / "notes.txt").write_text("keep me")

    assert prune_checkpoints(pdir, 0) == []  # default: keep all
    assert latest_epoch(pdir) == 10

    removed = prune_checkpoints(pdir, 3, keep_every=5)
    kept = sorted(
        int(f.split(".")[0]) for f in os.listdir(pdir)
        if f.endswith(".save")
    )
    # newest 3 = {8, 9, 10}; milestones {5, 10}; sentinel -1.
    assert kept == [-1, 5, 8, 9, 10]
    assert len(removed) == 6
    assert (tmp_path / "parameter" / "notes.txt").exists()
    assert latest_epoch(pdir) == 10  # resume contract intact


def test_prune_checkpoints_covers_orbax(tmp_path):
    """Orbax checkpoint directories participate in pruning like pickles."""
    from types import SimpleNamespace

    from bilinear_tpu.io.checkpoint import prune_checkpoints

    pdir = str(tmp_path / "parameter")
    state = SimpleNamespace(
        step=1, params={"w": np.zeros(4, np.float32)}, batch_stats={},
        opt_state={},
    )
    for epoch in (1, 2, 3):
        save_checkpoint_orbax(pdir, epoch, state)
    prune_checkpoints(pdir, 1)
    left = sorted(f for f in os.listdir(pdir) if f.endswith(".orbax"))
    assert left == ["3.orbax"]
    assert latest_epoch(pdir) == 3


def test_train_cli_keep_checkpoints(tmp_path, monkeypatch):
    """--keep-checkpoints prunes after each save in the bilinear train CLI;
    the run still resumes from the newest epoch on the next invocation."""
    from bilinear_tpu.cli.train_bilinear import main
    from bilinear_tpu.data.synthetic import write_h36m_dataset

    d = str(tmp_path / "Human3.6M")
    write_h36m_dataset(d, n_train=64, n_valid=16)
    monkeypatch.chdir(tmp_path)
    args = ["--data-dir", d, "--epochs-per-run", "3", "--batch-size", "32",
            "--keep-checkpoints", "2"]
    main(args)
    pdir = tmp_path / "save" / "Bilinear GT" / "parameter"
    kept = sorted(int(f.split(".")[0]) for f in os.listdir(pdir)
                  if f.endswith(".save"))
    assert kept == [2, 3]
    main(args)  # resumes from 3, trains 4-6, prunes to {5, 6}
    kept = sorted(int(f.split(".")[0]) for f in os.listdir(pdir)
                  if f.endswith(".save"))
    assert kept == [5, 6]


def test_prune_checkpoints_milestone_only(tmp_path):
    """keep_every alone (keep_last <= 0) must prune too — it previously
    no-op'd silently — keeping the milestones plus the newest epoch."""
    from types import SimpleNamespace

    from bilinear_tpu.io.checkpoint import prune_checkpoints

    pdir = str(tmp_path / "parameter")
    state = SimpleNamespace(
        step=1, params={"w": np.zeros(4, np.float32)}, batch_stats={},
        opt_state={},
    )
    for epoch in range(1, 13):
        save_checkpoint(pdir, epoch, state)
    prune_checkpoints(pdir, 0, keep_every=5)
    kept = sorted(int(f.split(".")[0]) for f in os.listdir(pdir)
                  if f.endswith(".save"))
    assert kept == [5, 10, 12]  # milestones + the newest (resume target)
