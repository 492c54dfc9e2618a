"""AOT serving artifacts (io/aot.py): export -> serialize -> reload ->
numerics vs the live model, symbolic-batch and fixed-batch dispatch, and
the export CLI."""
import json
import zipfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bilinear_tpu.data.h36m import Protocol, Task, load_h36m
from bilinear_tpu.data.synthetic import write_h36m_dataset
from bilinear_tpu.io.aot import (
    export_end2end,
    export_lifting,
    load_artifact,
    save_artifact,
)
from bilinear_tpu.io.checkpoint import save_checkpoint
from bilinear_tpu.train.bilinear import BilinearTrainer


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("Human3.6M"))
    write_h36m_dataset(d, n_train=64, n_valid=16)
    splits = load_h36m(d, Protocol.GT)
    run_dir = str(tmp_path_factory.mktemp("run"))
    state = BilinearTrainer(batch_size=16).init_state(jax.random.PRNGKey(0))
    save_checkpoint(run_dir + "/parameter", 3, state)
    return d, splits, run_dir, state


def _lift_oracle(state, tr, kp):
    from bilinear_tpu.models.bilinear import BilinearUnit

    x = (kp.reshape(len(kp), 32) - tr.mean_part) / tr.std_part
    out = BilinearUnit().apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(x), train=False,
    )
    return (np.asarray(out) * tr.std_s + tr.mean_s).reshape(len(kp), 16, 3)


def test_lifting_symbolic_roundtrip(setup, tmp_path):
    """One symbolic-batch program serves every N; serialized round-trip
    matches the live model + stats to float tolerance."""
    _, splits, _, state = setup
    tr = splits[Task.Train]
    programs = export_lifting(
        state.params, state.batch_stats,
        tr.mean_part, tr.std_part, tr.mean_s, tr.std_s,
        dtype=jnp.float32,
    )
    assert set(programs) == {"sym"}
    path = str(tmp_path / "lifting.aot")
    manifest = save_artifact(path, "lifting", programs,
                             manifest_extra={"epoch": 3})
    assert manifest["kind"] == "lifting" and manifest["epoch"] == 3

    pose = load_artifact(path)
    assert pose.kind == "lifting" and pose.manifest["epoch"] == 3
    for n in (1, 5, 64):
        kp = tr.raw_part[:n].reshape(n, 16, 2)
        np.testing.assert_allclose(
            pose(kp), _lift_oracle(state, tr, kp), rtol=2e-4, atol=2e-3
        )


def test_lifting_fixed_batch_chunking(setup, tmp_path):
    """Fixed-batch artifact: greedy chunking + tail padding must equal the
    oracle — padding rows must not leak into real results."""
    _, splits, _, state = setup
    tr = splits[Task.Train]
    programs = export_lifting(
        state.params, state.batch_stats,
        tr.mean_part, tr.std_part, tr.mean_s, tr.std_s,
        dtype=jnp.float32, batch_sizes=(4, 16),
    )
    assert set(programs) == {"b4", "b16"}
    path = str(tmp_path / "lifting_fixed.aot")
    save_artifact(path, "lifting", programs)
    pose = load_artifact(path)
    assert pose.batch_sizes == (4, 16)
    for n in (2, 7, 16, 23):  # pad-only, chunk+pad, exact, multi-chunk+pad
        kp = tr.raw_part[:n].reshape(n, 16, 2)
        np.testing.assert_allclose(
            pose(kp), _lift_oracle(state, tr, kp), rtol=2e-4, atol=2e-3
        )


def test_end2end_artifact(setup, tmp_path):
    """Fused frame->3D program exported at fixed sizes: chunked dispatch,
    default crop semantics, uint8 input, numerics vs direct apply."""
    from bilinear_tpu.train.end2end import End2EndTrainer

    _, splits, _, _ = setup
    tr = splits[Task.Train]
    kw = dict(n_stacks=1, features=8, depth=1)
    trainer = End2EndTrainer(model_kw=kw)
    state = trainer.init_state(
        jax.random.PRNGKey(0), jnp.asarray(tr.mean_part),
        jnp.asarray(tr.std_part),
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    programs = export_end2end(
        variables, tr.mean_part, tr.std_part, tr.mean_s, tr.std_s,
        dtype=jnp.float32, model_kw=kw, batch_sizes=(1, 4),
    )
    path = str(tmp_path / "end2end.aot")
    save_artifact(path, "end2end", programs, manifest_extra={"epoch": 1})
    pose = load_artifact(path)
    assert pose.kind == "end2end" and pose.batch_sizes == (1, 4)

    rng = np.random.RandomState(0)
    n = 5  # -> chunks 4 + 1
    frames = rng.rand(n, 256, 256, 3).astype(np.float32)
    pose2d, mm = pose(frames)
    assert pose2d.shape == (n, 16, 2) and mm.shape == (n, 16, 3)

    _, p2_ref, p3_ref = trainer.model.apply(
        variables, jnp.asarray(frames),
        jnp.full((n, 2), 128.0), jnp.full((n,), 1.28),
        jnp.asarray(tr.mean_part), jnp.asarray(tr.std_part), train=False,
    )
    np.testing.assert_allclose(pose2d, np.asarray(p2_ref), rtol=1e-4,
                               atol=1e-3)
    ref_mm = (np.asarray(p3_ref) * tr.std_s + tr.mean_s).reshape(n, 16, 3)
    np.testing.assert_allclose(mm, ref_mm, rtol=1e-4, atol=1e-2)

    p2_u8, _ = pose.predict((frames * 255).astype(np.uint8))
    np.testing.assert_allclose(p2_u8, pose2d, atol=1.0)


def test_cli_export_aot(setup, tmp_path):
    """The CLI end to end: checkpoint + synthetic stats -> artifact on disk
    -> loadable and callable, manifest carries the resumed epoch."""
    from bilinear_tpu.cli.export_aot import main

    d, splits, run_dir, state = setup
    out = str(tmp_path / "cli_lifting.aot")
    main([
        "--kind", "lifting", "--run-dir", run_dir, "--data-dir", d,
        "--out", out, "--dtype", "float32",
    ])
    pose = load_artifact(out)
    assert pose.manifest["epoch"] == 3
    assert pose.manifest["jax_version"] == jax.__version__
    tr = splits[Task.Train]
    kp = tr.raw_part[:6].reshape(6, 16, 2)
    np.testing.assert_allclose(
        pose(kp), _lift_oracle(state, tr, kp), rtol=2e-4, atol=2e-3
    )


def _export_lifting_artifact(state, tr, path, epoch):
    programs = export_lifting(
        state.params, state.batch_stats,
        tr.mean_part, tr.std_part, tr.mean_s, tr.std_s,
        dtype=jnp.float32,
    )
    save_artifact(path, "lifting", programs, manifest_extra={"epoch": epoch})


def test_aot_server_hot_swap(setup, tmp_path):
    """AOTServer (the daemon adapter): lift numerics, epoch from the
    manifest, and reload() picking up an atomically-replaced artifact."""
    import os

    from bilinear_tpu.io.aot import AOTServer

    _, splits, _, state = setup
    tr = splits[Task.Train]
    path = str(tmp_path / "srv.aot")
    _export_lifting_artifact(state, tr, path, epoch=3)

    srv = AOTServer(path)
    assert srv.kind == "lifting" and srv.epoch == 3
    assert srv.reload() is False  # unchanged file -> no reload
    kp = tr.raw_part[:5].reshape(5, 16, 2)
    np.testing.assert_allclose(
        srv.lift(kp), _lift_oracle(state, tr, kp), rtol=2e-4, atol=2e-3
    )

    nxt = str(tmp_path / "srv.aot.tmp")
    _export_lifting_artifact(state, tr, nxt, epoch=7)
    os.replace(nxt, path)  # the sanctioned hot-swap: atomic replace
    assert srv.reload() is True and srv.epoch == 7
    np.testing.assert_allclose(
        srv.lift(kp), _lift_oracle(state, tr, kp), rtol=2e-4, atol=2e-3
    )


def test_serve_cli_aot_daemon(setup, tmp_path):
    """The daemon serving an artifact: `cli.serve --aot` build path, HTTP
    lift round-trip, /healthz epoch, and /admin/reload hot-swapping a
    replaced artifact — no checkpoints or data dir anywhere."""
    import os

    from bilinear_tpu.cli.serve import build_parser, build_server
    from bilinear_tpu.client import PoseClient

    _, splits, _, state = setup
    tr = splits[Task.Train]
    path = str(tmp_path / "daemon.aot")
    _export_lifting_artifact(state, tr, path, epoch=2)

    args = build_parser().parse_args(
        ["--aot", path, "--port", "0", "--reload-every", "0",
         "--max-delay-ms", "1"]
    )
    server = build_server(args)
    server.start()
    try:
        client = PoseClient(f"http://{server.host}:{server.port}")
        h = client.health()
        assert h["lift"]["epoch"] == 2 and h["pose"] is None
        kp = tr.raw_part[:4].reshape(4, 16, 2)
        np.testing.assert_allclose(
            client.lift(kp), _lift_oracle(state, tr, kp),
            rtol=2e-4, atol=2e-3,
        )
        nxt = str(tmp_path / "daemon.aot.tmp")
        _export_lifting_artifact(state, tr, nxt, epoch=9)
        os.replace(nxt, path)
        assert client.reload()["lift_epoch"] == 9
        assert client.health()["lift"]["epoch"] == 9
    finally:
        server.stop()


def test_serve_cli_aot_rejects_duplicate_kind(setup, tmp_path):
    from bilinear_tpu.cli.serve import build_parser, build_server

    _, splits, _, state = setup
    tr = splits[Task.Train]
    a, b = str(tmp_path / "a.aot"), str(tmp_path / "b.aot")
    _export_lifting_artifact(state, tr, a, epoch=1)
    _export_lifting_artifact(state, tr, b, epoch=2)
    args = build_parser().parse_args(["--aot", a, b, "--port", "0"])
    with pytest.raises(ValueError, match="two 'lifting' artifacts"):
        build_server(args)


def test_load_rejects_foreign_zip(tmp_path):
    path = str(tmp_path / "not_aot.zip")
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("manifest.json", json.dumps({"format": "other"}))
    with pytest.raises(ValueError, match="not a bilinear-tpu-aot"):
        load_artifact(path)


def test_single_fixed_size_serves_any_n(setup, tmp_path):
    """An artifact with ONE compiled size still serves any request size via
    chunk + tail padding."""
    _, splits, _, state = setup
    tr = splits[Task.Train]
    programs = export_lifting(
        state.params, state.batch_stats,
        tr.mean_part, tr.std_part, tr.mean_s, tr.std_s,
        dtype=jnp.float32, batch_sizes=(4,),
    )
    path = str(tmp_path / "only4.aot")
    save_artifact(path, "lifting", programs)
    pose = load_artifact(path)
    # 6 = 4 + tail 2 -> padded to 4: fine. Sizes (4,) always fit any n.
    out = pose(tr.raw_part[:6].reshape(6, 16, 2))
    assert out.shape == (6, 16, 3)


def test_int8_static_artifact_matches_live_server(setup, tmp_path):
    """quantize="int8-static" exports the calibrated static-scale int8
    program with a SYMBOLIC batch (no data-dependent scale math). The
    artifact must reproduce the live LiftingServer's int8-static outputs —
    static scales make both paths tile/grouping independent — and reject
    the dynamic mode, whose per-tile amax cannot be exported symbolically."""
    from bilinear_tpu.serving import LiftingServer

    _, splits, _, state = setup
    tr = splits[Task.Train]
    programs = export_lifting(
        state.params, state.batch_stats,
        tr.mean_part, tr.std_part, tr.mean_s, tr.std_s,
        quantize="int8-static",
    )
    assert set(programs) == {"sym"}
    path = str(tmp_path / "lift_i8s.aot")
    save_artifact(path, "lifting", programs,
                  manifest_extra={"epoch": 3, "quantize": "int8-static"})
    pose = load_artifact(path)
    assert pose.manifest["quantize"] == "int8-static"

    live = LiftingServer(
        state.params, state.batch_stats,
        tr.mean_part, tr.std_part, tr.mean_s, tr.std_s,
        interpret=True, quantize="int8-static",
    )
    for n in (1, 5, 33):
        kp = tr.raw_part[:n].reshape(n, 16, 2)
        got = pose(kp)
        want = np.asarray(live.lift(kp))
        assert got.shape == (n, 16, 3)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)

    with pytest.raises(ValueError, match="int8-static"):
        export_lifting(
            state.params, state.batch_stats,
            tr.mean_part, tr.std_part, tr.mean_s, tr.std_s,
            quantize="int8",
        )


def test_cli_export_aot_int8_static(setup, tmp_path):
    from bilinear_tpu.cli.export_aot import main

    d, splits, run_dir, state = setup
    out = str(tmp_path / "cli_i8s.aot")
    main([
        "--kind", "lifting", "--run-dir", run_dir, "--data-dir", d,
        "--out", out, "--quantize", "int8-static",
    ])
    pose = load_artifact(out)
    assert pose.manifest["quantize"] == "int8-static"
    tr = splits[Task.Train]
    kp = tr.raw_part[:6].reshape(6, 16, 2)
    # int8 quantization noise vs the float oracle is bounded by the same
    # envelope the accuracy gate in tests/test_lifting_int8.py measures.
    want = _lift_oracle(state, tr, kp)
    got = pose(kp)
    scale = np.abs(want).mean()
    assert np.abs(got - want).mean() < 0.05 * scale
