"""Multi-device tests on the 8-virtual-CPU mesh: DP batch sharding, TP param
sharding, and numerical equivalence with the single-device program."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from bilinear_tpu.parallel import mesh as mesh_lib
from bilinear_tpu.parallel.tp import bilinear_param_specs, shard_train_state
from bilinear_tpu.train.bilinear import BilinearTrainer


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    return (
        rng.randn(64, 32).astype(np.float32),
        rng.randn(64, 48).astype(np.float32),
    )


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_dp_step_matches_single_device(data):
    x, y = data
    ref_trainer = BilinearTrainer(batch_size=64, learning_rate=1e-3, dropout=0.0)
    state0 = ref_trainer.init_state(jax.random.PRNGKey(0))
    sref, lref = jax.jit(ref_trainer._train_step)(
        state0, jnp.asarray(x), jnp.asarray(y), jax.random.PRNGKey(1)
    )

    mesh = mesh_lib.make_mesh(jax.devices())  # 8-way data parallel
    dp_trainer = BilinearTrainer(
        batch_size=64, learning_rate=1e-3, dropout=0.0, mesh=mesh
    )
    state1 = dp_trainer.init_state(jax.random.PRNGKey(0))
    bx = jax.device_put(jnp.asarray(x), mesh_lib.batch_sharding(mesh, 2))
    by = jax.device_put(jnp.asarray(y), mesh_lib.batch_sharding(mesh, 2))
    sdp, ldp = jax.jit(dp_trainer._train_step)(
        state1, bx, by, jax.random.PRNGKey(1)
    )

    assert float(lref) == pytest.approx(float(ldp), rel=1e-5)
    a = np.asarray(sref.params["decode"]["kernel"])
    b = np.asarray(sdp.params["decode"]["kernel"])
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_tp_dp_step_matches_single_device(data):
    """(data=4, model=2) mesh with Megatron param sharding: same numbers."""
    x, y = data
    ref_trainer = BilinearTrainer(batch_size=64, learning_rate=1e-3, dropout=0.0)
    state0 = ref_trainer.init_state(jax.random.PRNGKey(0))
    sref, lref = jax.jit(ref_trainer._train_step)(
        state0, jnp.asarray(x), jnp.asarray(y), jax.random.PRNGKey(1)
    )

    mesh = mesh_lib.make_mesh(jax.devices(), data=4, model=2)
    trainer = BilinearTrainer(
        batch_size=64, learning_rate=1e-3, dropout=0.0, mesh=mesh
    )
    state1 = trainer.init_state(jax.random.PRNGKey(0))
    state1 = shard_train_state(state1, mesh)

    # Param shardings landed where intended.
    enc = state1.params["encode"]["linear"]["kernel"]
    assert enc.sharding.spec == P(None, "model")
    row = state1.params["bilinear_0_1"]["linear"]["kernel"]
    assert row.sharding.spec == P("model", None)
    mu_enc = state1.opt_state[1].mu["encode"]["linear"]["kernel"]
    assert mu_enc.sharding.spec == P(None, "model")

    bx = jax.device_put(jnp.asarray(x), mesh_lib.batch_sharding(mesh, 2))
    by = jax.device_put(jnp.asarray(y), mesh_lib.batch_sharding(mesh, 2))
    stp, ltp = jax.jit(trainer._train_step)(state1, bx, by, jax.random.PRNGKey(1))

    assert float(lref) == pytest.approx(float(ltp), rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(sref.params["encode"]["linear"]["kernel"]),
        np.asarray(stp.params["encode"]["linear"]["kernel"]),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(sref.batch_stats["encode"]["bn"]["mean"]),
        np.asarray(stp.batch_stats["encode"]["bn"]["mean"]),
        rtol=1e-4, atol=1e-6,
    )


def test_whole_epoch_under_dp_mesh(data):
    x, y = data
    mesh = mesh_lib.make_mesh(jax.devices())
    trainer = BilinearTrainer(batch_size=16, mesh=mesh)
    state = trainer.init_state(jax.random.PRNGKey(0))
    bx = jax.device_put(jnp.asarray(x), mesh_lib.batch_sharding(mesh, 2))
    by = jax.device_put(jnp.asarray(y), mesh_lib.batch_sharding(mesh, 2))
    state, losses = trainer.train_epoch(state, bx, by, jax.random.PRNGKey(1))
    assert losses.shape == (4,)
    assert np.isfinite(np.asarray(losses)).all()


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[-1] == 48
    ge.dryrun_multichip(8)


def test_global_from_host_shards_batch_axis(data):
    """global_from_host builds 'data'-sharded global arrays from host data
    every process holds in full (the multi-host bilinear CLI path); on a
    single process it must equal a plain device_put."""
    x, y = data
    mesh = mesh_lib.make_mesh(jax.devices())
    gx, gy = mesh_lib.global_from_host(mesh, (x, y))
    assert gx.shape == x.shape and gy.shape == y.shape
    np.testing.assert_array_equal(np.asarray(gx), x)
    np.testing.assert_array_equal(np.asarray(gy), y)
    # Leading axis genuinely sharded over 'data'.
    assert gx.sharding.spec == P(mesh_lib.DATA_AXIS, None)
    shard_rows = {s.index[0].start or 0 for s in gx.addressable_shards}
    assert len(shard_rows) == mesh.shape[mesh_lib.DATA_AXIS]


def test_global_batch_single_process_matches_shard_batch(data):
    """With one process, global_batch (the multi-process contract) must
    assemble the same global arrays as shard_batch."""
    x, y = data
    mesh = mesh_lib.make_mesh(jax.devices())
    a = mesh_lib.global_batch(mesh, {"x": x, "y": y})
    b = mesh_lib.shard_batch(mesh, {"x": x, "y": y})
    for k in ("x", "y"):
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
        assert a[k].sharding == b[k].sharding
