"""Packed host->device transfers (utils/residency.py) and the fast resume
path (io/checkpoint.py::resume_or_init_fast).

Why these exist: on tunneled TPU platforms every transfer pays a ~100 ms
round-trip, so leaf-by-leaf upload of a production state costs minutes
(round-4 probe: 157 s vs 14 s packed for a 1600-leaf / 315 MB tree). The
packed path must be a pure performance change — identical values, dtypes,
shapes, and tree structure."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bilinear_tpu.io.checkpoint import (
    resume_or_init,
    resume_or_init_fast,
    save_checkpoint,
)
from bilinear_tpu.utils.residency import packed_device_put


def _mixed_tree():
    rng = np.random.RandomState(0)
    return {
        "a": rng.randn(7, 3).astype(np.float32),
        "b": [rng.randn(4).astype(np.float32) for _ in range(5)],
        "c": {"w": rng.randint(-5, 5, (2, 2, 2)).astype(np.int32),
              "flag": np.asarray(True),
              "scalar": np.float32(3.5)},
        "d": rng.randn(1).astype(np.float64),
        "e": 17,  # python scalar passes through
        "f": jnp.arange(3),  # already a device array
        "g": np.zeros((0,), np.float32),  # empty leaf
        "h": rng.randn(3, 1, 2).astype(np.float32),
    }


def test_packed_device_put_round_trips_values_and_structure():
    tree = _mixed_tree()
    out = packed_device_put(tree)
    ref = jax.device_put(tree)
    assert jax.tree.structure(out) == jax.tree.structure(ref)
    for got, want in zip(jax.tree.leaves(out), jax.tree.leaves(ref)):
        assert isinstance(got, jax.Array)
        assert got.shape == want.shape
        assert got.dtype == want.dtype
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_packed_device_put_small_tree_uses_plain_path():
    tree = {"x": np.ones(3, np.float32), "y": np.zeros(2, np.int32)}
    out = packed_device_put(tree)
    np.testing.assert_array_equal(np.asarray(out["x"]), tree["x"])
    assert isinstance(out["x"], jax.Array)


def test_packed_device_put_replicated_sharding():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    mesh = Mesh(np.array(jax.devices()), ("data",))
    sharding = NamedSharding(mesh, PartitionSpec())
    tree = _mixed_tree()
    out = packed_device_put(tree, sharding)
    for got, want in zip(jax.tree.leaves(out),
                         jax.tree.leaves(jax.device_put(tree))):
        assert len(got.sharding.device_set) == len(jax.devices())
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def _tiny_trainer():
    from bilinear_tpu.models.bilinear import BilinearUnit
    from bilinear_tpu.train.bilinear import BilinearTrainer

    trainer = BilinearTrainer(batch_size=8)
    trainer.model = BilinearUnit(hidden=32)
    return trainer


def test_resume_or_init_fast_matches_slow_resume(tmp_path):
    trainer = _tiny_trainer()
    key = jax.random.PRNGKey(3)
    state = trainer.init_state(key)
    pdir = str(tmp_path / "parameter")

    # Perturb params so the checkpoint is distinguishable from init values.
    state = state.replace(
        params=jax.tree.map(lambda a: a + 1.0, state.params),
        step=jnp.asarray(42, jnp.int32),
    )
    save_checkpoint(pdir, 4, state)

    slow, e_slow = resume_or_init(trainer.init_state(key), pdir)
    fast, e_fast = resume_or_init_fast(trainer.init_state, key, pdir)
    assert e_slow == e_fast == 4
    for got, want in zip(jax.tree.leaves(fast), jax.tree.leaves(slow)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        # fast path lands everything on device (donation-ready)
    assert all(isinstance(l, jax.Array) for l in jax.tree.leaves(fast))


def test_resume_or_init_fast_fresh_run_initializes(tmp_path):
    trainer = _tiny_trainer()
    key = jax.random.PRNGKey(3)
    fast, epoch = resume_or_init_fast(trainer.init_state, key,
                                      str(tmp_path / "parameter"))
    assert epoch == 0
    ref = trainer.init_state(key)
    for got, want in zip(jax.tree.leaves(fast), jax.tree.leaves(ref)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_resume_or_init_fast_pack_false_returns_host_leaves(tmp_path):
    trainer = _tiny_trainer()
    key = jax.random.PRNGKey(3)
    state = trainer.init_state(key)
    pdir = str(tmp_path / "parameter")
    save_checkpoint(pdir, 1, state)
    host, epoch = resume_or_init_fast(trainer.init_state, key, pdir,
                                      pack=False)
    assert epoch == 1
    # multi-process DP needs replicatable host inputs: params/opt leaves stay numpy
    assert all(isinstance(l, np.ndarray)
               for l in jax.tree.leaves(host.params))
