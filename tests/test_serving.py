"""LiftingServer: normalization round-trip and checkpoint loading."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bilinear_tpu.data.h36m import Protocol, Task, load_h36m
from bilinear_tpu.data.synthetic import write_h36m_dataset
from bilinear_tpu.io.checkpoint import save_checkpoint
from bilinear_tpu.models.bilinear import BilinearUnit
from bilinear_tpu.serving import LiftingServer
from bilinear_tpu.train.bilinear import BilinearTrainer


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("Human3.6M"))
    write_h36m_dataset(d, n_train=64, n_valid=16)
    splits = load_h36m(d, Protocol.GT)
    run_dir = str(tmp_path_factory.mktemp("run"))
    trainer = BilinearTrainer(batch_size=16)
    state = trainer.init_state(jax.random.PRNGKey(0))
    save_checkpoint(run_dir + "/parameter", 3, state)
    return d, splits, run_dir, state


def test_lift_matches_model_plus_stats(setup):
    _, splits, run_dir, state = setup
    tr = splits[Task.Train]
    server, epoch = LiftingServer.from_run_dir(
        run_dir, tr, dtype=jnp.float32, interpret=True
    )
    assert epoch == 3

    kp = tr.raw_part[:10].reshape(10, 16, 2)
    mm = np.asarray(server.lift(kp))
    assert mm.shape == (10, 16, 3)

    # Oracle: flax model + manual normalization.
    model = BilinearUnit()
    x = (tr.raw_part[:10] - tr.mean_part) / tr.std_part
    ref = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(x), train=False,
    )
    ref_mm = (np.asarray(ref) * tr.std_s + tr.mean_s).reshape(10, 16, 3)
    np.testing.assert_allclose(mm, ref_mm, rtol=2e-3, atol=2e-2)


def test_lift_normalized_contract(setup):
    _, splits, run_dir, _ = setup
    server, _ = LiftingServer.from_run_dir(
        run_dir, splits[Task.Train], dtype=jnp.float32, interpret=True
    )
    out = server.lift_normalized(np.zeros((5, 32), np.float32))
    assert out.shape == (5, 48)
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# End2EndServer
# ---------------------------------------------------------------------------

E2E_KW = dict(n_stacks=1, features=8, depth=1)


@pytest.fixture(scope="module")
def e2e_setup(tmp_path_factory):
    from bilinear_tpu.train.end2end import End2EndTrainer

    d = str(tmp_path_factory.mktemp("Human3.6M"))
    write_h36m_dataset(d, n_train=64, n_valid=16)
    splits = load_h36m(d, Protocol.GT)
    tr = splits[Task.Train]
    run_dir = str(tmp_path_factory.mktemp("e2e_run"))
    trainer = End2EndTrainer(model_kw=E2E_KW)
    state = trainer.init_state(
        jax.random.PRNGKey(0), jnp.asarray(tr.mean_part), jnp.asarray(tr.std_part)
    )
    save_checkpoint(run_dir + "/parameter", 1, state)
    return splits, run_dir, trainer, state


def test_end2end_server_batching_matches_direct(e2e_setup):
    """Chunked/padded dispatch (batch sizes {1, 4}) must equal one direct
    full-batch apply — padding must not leak into real results."""
    from bilinear_tpu.serving import End2EndServer

    splits, run_dir, trainer, state = e2e_setup
    tr = splits[Task.Train]
    server = End2EndServer.from_run_dir(
        run_dir, tr, model_kw=E2E_KW, dtype=jnp.float32, batch_sizes=(1, 4)
    )
    assert server.epoch == 1

    rng = np.random.RandomState(0)
    n = 7  # -> chunks 4 + 1 + 1 + 1 under {1, 4}
    frames = rng.rand(n, 256, 256, 3).astype(np.float32)
    pose2d, mm = server.predict(frames)
    assert pose2d.shape == (n, 16, 2) and mm.shape == (n, 16, 3)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    _, p2_ref, p3_ref = trainer.model.apply(
        variables, jnp.asarray(frames),
        jnp.full((n, 2), 128.0), jnp.full((n,), 1.28),
        jnp.asarray(tr.mean_part), jnp.asarray(tr.std_part), train=False,
    )
    np.testing.assert_allclose(pose2d, np.asarray(p2_ref), rtol=1e-4, atol=1e-3)
    ref_mm = (np.asarray(p3_ref) * tr.std_s + tr.mean_s).reshape(n, 16, 3)
    np.testing.assert_allclose(mm, ref_mm, rtol=1e-4, atol=1e-2)

    # uint8 input path.
    p2_u8, _ = server.predict((frames * 255).astype(np.uint8))
    np.testing.assert_allclose(p2_u8, pose2d, atol=1.0)


def test_end2end_server_hot_reload(e2e_setup):
    from bilinear_tpu.serving import End2EndServer

    splits, run_dir, trainer, state = e2e_setup
    tr = splits[Task.Train]
    server = End2EndServer.from_run_dir(
        run_dir, tr, model_kw=E2E_KW, dtype=jnp.float32, batch_sizes=(2,)
    )
    frames = np.random.RandomState(1).rand(2, 256, 256, 3).astype(np.float32)
    _, mm_before = server.predict(frames)
    assert server.reload() is False  # nothing newer

    # A new epoch lands (perturbed weights) -> reload picks it up.
    bumped = state.replace(
        params=jax.tree.map(lambda v: v + 0.05, state.params)
    )
    save_checkpoint(run_dir + "/parameter", 2, bumped)
    assert server.reload() is True
    assert server.epoch == 2
    _, mm_after = server.predict(frames)
    assert not np.allclose(mm_after, mm_before)


@pytest.mark.parametrize("quantize", [None, "int8", "int8-static"])
def test_mesh_sharded_lifting_matches_single_device(setup, quantize):
    """Pod-scale serving: LiftingServer(mesh=...) shards the request batch
    over the 'data' axis (shard_map around the same kernel) and must
    reproduce the single-device outputs, including non-divisible batch
    sizes (padded internally)."""
    from bilinear_tpu.parallel.mesh import make_mesh

    _, splits, _, state = setup
    tr = splits[Task.Train]
    kw = dict(interpret=True, quantize=quantize, dtype=jnp.float32)
    plain = LiftingServer(
        state.params, state.batch_stats,
        tr.mean_part, tr.std_part, tr.mean_s, tr.std_s, **kw,
    )
    sharded = LiftingServer(
        state.params, state.batch_stats,
        tr.mean_part, tr.std_part, tr.mean_s, tr.std_s,
        mesh=make_mesh(), **kw,
    )
    kp = np.random.RandomState(11).rand(13, 16, 2).astype(np.float32) * 200
    got = np.asarray(sharded.lift(kp))
    want = np.asarray(plain.lift(kp))
    if quantize is None:
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-3)
    elif quantize == "int8-static":
        # Static scales are per-layer CONSTANTS: regrouping rows into
        # different shards/tiles cannot change any row's math, so sharded
        # serving is bit-identical to single-device — one of the practical
        # upsides of the calibrated mode.
        np.testing.assert_array_equal(got, want)
    else:
        # int8 activation scales are DYNAMIC per row-tile; sharding regroups
        # rows into different tiles, so outputs agree only to within the
        # quantization noise envelope (the same envelope the accuracy gate
        # in tests/test_lifting_int8.py bounds).
        # (~5% worst-case / ~0.5% mean on an UNTRAINED random net, whose
        # activation distributions are the worst case for dynamic scales.)
        scale = np.std(want)
        assert np.max(np.abs(got - want)) < 0.08 * scale
        assert np.mean(np.abs(got - want)) < 0.015 * scale


def test_end2end_server_mesh_sharded_matches(e2e_setup):
    """End2EndServer(mesh=...): the fused frame->3D program sharded over the
    data axis must reproduce the single-device server's outputs; batch sizes
    that don't divide the mesh are rejected."""
    from bilinear_tpu.parallel.mesh import make_mesh
    from bilinear_tpu.serving import End2EndServer

    splits, run_dir, trainer, state = e2e_setup
    tr = splits[Task.Train]
    mesh = make_mesh()
    server = End2EndServer.from_run_dir(
        run_dir, tr, model_kw=E2E_KW, dtype=jnp.float32, batch_sizes=(8,),
        mesh=mesh,
    )
    plain = End2EndServer.from_run_dir(
        run_dir, tr, model_kw=E2E_KW, dtype=jnp.float32, batch_sizes=(8,)
    )
    frames = np.random.RandomState(2).rand(11, 256, 256, 3).astype(np.float32)
    p2_s, mm_s = server.predict(frames)
    p2_p, mm_p = plain.predict(frames)
    np.testing.assert_allclose(p2_s, p2_p, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(mm_s, mm_p, rtol=1e-4, atol=1e-2)

    with pytest.raises(ValueError, match="divide"):
        End2EndServer.from_run_dir(
            run_dir, tr, model_kw=E2E_KW, batch_sizes=(1, 8), mesh=mesh
        )


def test_int8_static_reload_publishes_engine_atomically(
    setup, tmp_path, monkeypatch
):
    """Hot-reload safety (regression): in int8-static mode _set_weights must
    keep serving the OLD (weights, calibration-scales, program) snapshot for
    the whole rebuild — including the slow jitted calibration forward — and
    publish the new engine in one reference assignment. The original code
    assigned self._prepared first and self._static_scales seconds later,
    so a concurrent lift quantized the NEW checkpoint's activations with
    the OLD checkpoint's scales."""
    _, splits, _, state = setup
    tr = splits[Task.Train]
    run_dir = str(tmp_path / "run")
    save_checkpoint(run_dir + "/parameter", 1, state)
    server, _ = LiftingServer.from_run_dir(
        run_dir, tr, interpret=True, quantize="int8-static"
    )
    old_engine = server._engine
    kp = tr.raw_part[:4].reshape(4, 16, 2)
    before = np.asarray(server.lift(kp))

    import bilinear_tpu.ops.pallas.lifting_int8 as li8

    real_cal = li8.calibrate_scales
    seen = {}

    def spying_cal(prepared, x, **kw):
        # Mid-rebuild (weights already folded, calibration running): the
        # published engine must still be the old snapshot.
        seen["engine_during_calibration"] = server._engine
        return real_cal(prepared, x, **kw)

    monkeypatch.setattr(li8, "calibrate_scales", spying_cal)

    bumped = state.replace(
        params=jax.tree.map(lambda v: v * 1.5 + 0.05, state.params)
    )
    save_checkpoint(run_dir + "/parameter", 2, bumped)
    assert server.reload() is True
    assert seen["engine_during_calibration"] is old_engine
    assert server._engine is not old_engine
    after = np.asarray(server.lift(kp))
    assert not np.allclose(after, before)


def test_reload_survives_pruned_checkpoint_race(setup, tmp_path, monkeypatch):
    """A trainer with --keep-checkpoints can delete the epoch reload() just
    scanned (TOCTOU between latest_epoch and load_checkpoint). reload()
    must return False and keep serving the old weights instead of raising
    through the poll thread / POST /admin/reload."""
    import bilinear_tpu.serving as serving_mod

    _, splits, _, state = setup
    tr = splits[Task.Train]
    run_dir = str(tmp_path / "run")
    save_checkpoint(run_dir + "/parameter", 1, state)
    server, _ = LiftingServer.from_run_dir(
        run_dir, tr, dtype=jnp.float32, interpret=True
    )
    save_checkpoint(run_dir + "/parameter", 2, state)

    def vanished(parameter_dir, epoch):
        raise FileNotFoundError(f"{epoch}.save pruned between scan and load")

    monkeypatch.setattr(serving_mod, "load_checkpoint", vanished)
    assert server.reload() is False
    assert server.epoch == 1
    monkeypatch.undo()
    assert server.reload() is True and server.epoch == 2
