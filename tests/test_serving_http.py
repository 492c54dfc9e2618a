"""HTTP serving daemon: dynamic batching, wire formats, hot reload.

The server under test runs in-process (threads) on a loopback port with
the tiny End2End model and interpret-mode lifting kernel, so everything
here is CPU-only and fast.
"""
import io
import json
import os
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bilinear_tpu.data.h36m import Protocol, Task, load_h36m
from bilinear_tpu.data.synthetic import write_h36m_dataset
from bilinear_tpu.io.checkpoint import save_checkpoint
from bilinear_tpu.serving import End2EndServer, LiftingServer
from bilinear_tpu.serving_http import DynamicBatcher, PoseHTTPServer

E2E_KW = dict(n_stacks=1, features=8, depth=1)


# ---------------------------------------------------------------------------
# DynamicBatcher unit tests (no HTTP, no models)
# ---------------------------------------------------------------------------


def test_batcher_coalesces_and_scatters():
    calls = []

    def fn(x):
        calls.append(x.shape[0])
        return (x * 2.0,)

    # Wide window: this box has one CPU core, so thread starts can lag.
    b = DynamicBatcher(fn, n_inputs=1, max_delay_ms=1000.0)
    results = {}

    def client(i):
        x = np.full((i + 1, 3), float(i), np.float32)
        (y,) = b.submit(x)
        results[i] = y

    threads = [threading.Thread(target=client, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    b.stop()

    for i in range(4):
        np.testing.assert_array_equal(
            results[i], np.full((i + 1, 3), 2.0 * i, np.float32)
        )
    # 4 concurrent requests inside one 30 ms window -> fewer backend calls
    # than requests (usually exactly 1), and rows add up.
    assert len(calls) < 4
    assert sum(calls) == 1 + 2 + 3 + 4


def test_batcher_max_rows_closes_window():
    def fn(x):
        return (x,)

    b = DynamicBatcher(fn, n_inputs=1, max_delay_ms=10_000.0, max_rows=4)
    # A single submit of >= max_rows rows must not wait out the 10 s window.
    (y,) = b.submit(np.zeros((5, 2), np.float32))
    assert y.shape == (5, 2)
    b.stop()


def test_batcher_propagates_errors():
    def fn(x):
        raise RuntimeError("backend exploded")

    b = DynamicBatcher(fn, n_inputs=1, max_delay_ms=1.0)
    with pytest.raises(RuntimeError, match="backend exploded"):
        b.submit(np.zeros((1, 2), np.float32))
    # The dispatcher thread must survive the error and serve again.
    with pytest.raises(RuntimeError, match="backend exploded"):
        b.submit(np.zeros((1, 2), np.float32))
    b.stop()


def test_submit_relabels_backend_errors_as_server_side():
    """A ValueError escaping the batcher is a SERVER failure (requests are
    fully validated before submit) and must not reach the handler's
    ValueError->400 mapping — it 400-blamed every co-batched rider for a
    backend bug. _submit wraps it in BackendError (-> 500); ModelNotLoaded
    (404) and ServerBusy (503) keep their routes."""
    from bilinear_tpu.serving_http import (
        BackendError,
        ModelNotLoaded,
        ServerBusy,
        _submit,
    )

    def bad_backend(x):
        raise ValueError("shape mismatch deep in the backend")

    b = DynamicBatcher(bad_backend, n_inputs=1, max_delay_ms=1.0)
    with pytest.raises(BackendError, match="ValueError: shape mismatch"):
        _submit(b, np.zeros((1, 2), np.float32))
    b.stop()

    def not_loaded(x):
        raise ModelNotLoaded("no lifting model is loaded")

    b = DynamicBatcher(not_loaded, n_inputs=1, max_delay_ms=1.0)
    with pytest.raises(ModelNotLoaded):
        _submit(b, np.zeros((1, 2), np.float32))
    b.stop()

    def busy(x):
        raise ServerBusy("retry later")

    b = DynamicBatcher(busy, n_inputs=1, max_delay_ms=1.0)
    with pytest.raises(ServerBusy):
        _submit(b, np.zeros((1, 2), np.float32))
    b.stop()


def test_batcher_coerce_hook_normalizes_mixed_dtypes():
    """Deterministic unit test of the coerce hook (the HTTP-level mixed
    test depends on two threads actually coalescing): a u8 and an f32
    rider in ONE batch must reach the backend as f32 in [0, 1], not as
    np.concatenate's promotion of 0-255 u8 values; a homogeneous u8 batch
    must stay u8 (the 4x-fewer-transfer-bytes path)."""
    seen = []

    def coerce(arrs):
        if len({a.dtype for a in arrs}) == 1:
            return arrs
        return [
            a.astype(np.float32) / 255.0 if a.dtype == np.uint8
            else a.astype(np.float32)
            for a in arrs
        ]

    def fn(x):
        seen.append((x.dtype, x.copy()))
        return (x.astype(np.float32),)

    b = DynamicBatcher(fn, n_inputs=1, max_delay_ms=1000.0,
                       coerce={0: coerce})
    results = {}
    u8 = np.array([[0, 128, 255]], np.uint8)
    f32 = np.array([[0.25, 0.5, 0.75]], np.float32)

    def client(name, x):
        (y,) = b.submit(x)
        results[name] = y

    threads = [threading.Thread(target=client, args=("u8", u8)),
               threading.Thread(target=client, args=("f32", f32))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # Coalesced into one batch (1000 ms window): dtype promoted via the
    # coercer, u8 rider normalized to [0, 1].
    assert len(seen) == 1 and seen[0][0] == np.float32
    np.testing.assert_allclose(
        results["u8"], [[0.0, 128 / 255.0, 1.0]], atol=1e-6
    )
    np.testing.assert_allclose(results["f32"], f32, atol=1e-6)

    # Homogeneous u8 batch: stays u8 end to end.
    seen.clear()
    (y,) = b.submit(u8)
    assert seen[0][0] == np.uint8
    np.testing.assert_array_equal(y, u8.astype(np.float32))
    b.stop()


def test_batcher_input_validation():
    b = DynamicBatcher(lambda x, y: (x,), n_inputs=2, max_delay_ms=1.0)
    with pytest.raises(ValueError, match="expected 2"):
        b.submit(np.zeros((1, 2)))
    with pytest.raises(ValueError, match="row count"):
        b.submit(np.zeros((1, 2)), np.zeros((2, 2)))
    b.stop()


# ---------------------------------------------------------------------------
# Full daemon over HTTP
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def daemon(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("Human3.6M"))
    write_h36m_dataset(d, n_train=64, n_valid=16)
    splits = load_h36m(d, Protocol.GT)
    tr = splits[Task.Train]

    from bilinear_tpu.train.bilinear import BilinearTrainer
    from bilinear_tpu.train.end2end import End2EndTrainer

    lift_dir = str(tmp_path_factory.mktemp("lift_run"))
    lift_state = BilinearTrainer(batch_size=16).init_state(jax.random.PRNGKey(0))
    save_checkpoint(lift_dir + "/parameter", 1, lift_state)

    e2e_dir = str(tmp_path_factory.mktemp("e2e_run"))
    e2e_trainer = End2EndTrainer(model_kw=E2E_KW)
    e2e_state = e2e_trainer.init_state(
        jax.random.PRNGKey(0), jnp.asarray(tr.mean_part), jnp.asarray(tr.std_part)
    )
    save_checkpoint(e2e_dir + "/parameter", 1, e2e_state)

    lifting, _ = LiftingServer.from_run_dir(
        lift_dir, tr, dtype=jnp.float32, interpret=True
    )
    end2end = End2EndServer.from_run_dir(
        e2e_dir, tr, model_kw=E2E_KW, dtype=jnp.float32, batch_sizes=(1, 4)
    )
    # 250 ms batching window: wide enough that the concurrency test's six
    # HTTP clients land in few batches even under full CPU contention.
    server = PoseHTTPServer(
        lifting=lifting, end2end=end2end, port=0, max_delay_ms=250.0
    )
    server.start()
    yield server, tr, e2e_dir, e2e_state, lifting
    server.stop()


def _url(server, path):
    return f"http://{server.host}:{server.port}{path}"


def _post(server, path, body, ctype):
    req = urllib.request.Request(
        _url(server, path), data=body, headers={"Content-Type": ctype}
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.read(), r.headers.get("Content-Type")


def test_healthz(daemon):
    server = daemon[0]
    with urllib.request.urlopen(_url(server, "/healthz"), timeout=30) as r:
        h = json.loads(r.read())
    assert h["status"] == "ok"
    assert h["pose"]["epoch"] == 1


def test_lift_json_and_npy_match_direct(daemon):
    server, tr, _, _, lifting = daemon
    kp = tr.raw_part[:6].reshape(6, 16, 2).astype(np.float32)
    want = np.asarray(lifting.lift(kp))

    body = json.dumps({"keypoints": kp.tolist()}).encode()
    out, _ = _post(server, "/v1/lift", body, "application/json")
    got = np.asarray(json.loads(out)["poses_mm"], np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)

    buf = io.BytesIO()
    np.save(buf, kp)
    out, ctype = _post(server, "/v1/lift", buf.getvalue(), "application/x-npy")
    assert ctype == "application/x-npy"
    got_npy = np.load(io.BytesIO(out))
    np.testing.assert_allclose(got_npy, want, rtol=1e-4, atol=1e-3)


def test_pose_npz_matches_direct(daemon):
    server = daemon[0]
    frames = np.random.RandomState(0).rand(3, 256, 256, 3).astype(np.float32)
    p2_want, p3_want = server.end2end.predict(frames)

    buf = io.BytesIO()
    np.savez(buf, frames=frames)
    out, ctype = _post(server, "/v1/pose", buf.getvalue(), "application/x-npz")
    assert ctype == "application/x-npz"
    with np.load(io.BytesIO(out)) as z:
        np.testing.assert_allclose(z["pose2d"], p2_want, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(z["pose3d_mm"], p3_want, rtol=1e-4, atol=1e-2)


def test_concurrent_lift_requests_coalesce(daemon):
    server, tr, _, _, lifting = daemon
    kp = tr.raw_part[:2].reshape(2, 16, 2).astype(np.float32)
    want = np.asarray(lifting.lift(kp))
    body = json.dumps({"keypoints": kp.tolist()}).encode()

    before = server.lift_batcher.batches_dispatched
    outs = [None] * 6
    errs = []

    def client(i):
        try:
            out, _ = _post(server, "/v1/lift", body, "application/json")
            outs[i] = np.asarray(json.loads(out)["poses_mm"], np.float32)
        except Exception as e:  # surface in the main thread
            errs.append(e)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    for o in outs:
        np.testing.assert_allclose(o, want, rtol=1e-4, atol=1e-3)
    dispatched = server.lift_batcher.batches_dispatched - before
    assert dispatched < 6  # at least some coalescing happened
    assert server.lift_batcher.rows_served >= 12


def test_http_reload_route(daemon):
    server, _, e2e_dir, e2e_state, _ = daemon
    frames = np.random.RandomState(1).rand(1, 256, 256, 3).astype(np.float32)
    _, before = server.end2end.predict(frames)

    out, _ = _post(server, "/admin/reload", b"", "application/json")
    assert json.loads(out) == {"reloaded": False, "epoch": 1, "lift_epoch": 1}

    bumped = e2e_state.replace(
        params=jax.tree.map(lambda v: v + 0.05, e2e_state.params)
    )
    save_checkpoint(e2e_dir + "/parameter", 2, bumped)
    out, _ = _post(server, "/admin/reload", b"", "application/json")
    assert json.loads(out) == {"reloaded": True, "epoch": 2, "lift_epoch": 1}
    _, after = server.end2end.predict(frames)
    assert not np.allclose(after, before)


def test_lifting_hot_reload(daemon):
    """LiftingServer.reload() re-folds the kernel weights: a new epoch in
    the lifting run dir changes /v1/lift outputs after /admin/reload."""
    server, tr, _, _, lifting = daemon
    kp = tr.raw_part[:2].reshape(2, 16, 2).astype(np.float32)
    before = np.asarray(lifting.lift(kp))

    from bilinear_tpu.train.bilinear import BilinearTrainer

    run_dir = os.path.dirname(lifting.parameter_dir)
    newer = BilinearTrainer(batch_size=16).init_state(jax.random.PRNGKey(7))
    save_checkpoint(lifting.parameter_dir, lifting.epoch + 1, newer)

    out, _ = _post(server, "/admin/reload", b"", "application/json")
    r = json.loads(out)
    assert r["reloaded"] is True and r["lift_epoch"] == lifting.epoch
    after = np.asarray(lifting.lift(kp))
    assert not np.allclose(after, before)
    assert run_dir  # silence unused (kept for debuggability)


def test_missing_model_route_is_404(tmp_path):
    """A daemon with only a lifting model 404s /v1/pose (not 400)."""
    d = str(tmp_path / "h36m")
    write_h36m_dataset(d, n_train=32, n_valid=8)
    tr = load_h36m(d, Protocol.GT)[Task.Train]

    from bilinear_tpu.train.bilinear import BilinearTrainer

    run = str(tmp_path / "run")
    state = BilinearTrainer(batch_size=16).init_state(jax.random.PRNGKey(0))
    save_checkpoint(run + "/parameter", 1, state)
    lifting, _ = LiftingServer.from_run_dir(
        run, tr, dtype=jnp.float32, interpret=True
    )
    server = PoseHTTPServer(lifting=lifting, port=0, max_delay_ms=1.0)
    server.start()
    try:
        buf = io.BytesIO()
        np.savez(buf, frames=np.zeros((1, 256, 256, 3), np.float32))
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server, "/v1/pose", buf.getvalue(), "application/x-npz")
        assert e.value.code == 404
    finally:
        server.stop()


def test_pose_rejects_malformed_centers_scales(daemon):
    """Shape validation happens before the batcher so a bad request cannot
    fail innocent coalesced neighbors."""
    server = daemon[0]
    frames = np.zeros((2, 256, 256, 3), np.float32)
    for bad in (
        {"frames": frames, "centers": np.zeros((2, 3), np.float32)},
        {"frames": frames, "scales": np.zeros((2, 1), np.float32)},
    ):
        buf = io.BytesIO()
        np.savez(buf, **bad)
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server, "/v1/pose", buf.getvalue(), "application/x-npz")
        assert e.value.code == 400


def test_from_run_dir_refuses_empty_dir(daemon, tmp_path):
    """Serving must never silently serve random init (epoch 0)."""
    _, tr, _, _, _ = daemon
    with pytest.raises(FileNotFoundError, match="refusing to serve"):
        LiftingServer.from_run_dir(str(tmp_path / "nope"), tr)
    with pytest.raises(FileNotFoundError, match="refusing to serve"):
        End2EndServer.from_run_dir(
            str(tmp_path / "nope2"), tr, model_kw=E2E_KW
        )


def test_bad_requests_are_400(daemon):
    server = daemon[0]
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/v1/lift", b"not json", "application/json")
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(
            server, "/v1/lift",
            json.dumps({"keypoints": [[1.0, 2.0]]}).encode(),
            "application/json",
        )
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, "/nope", b"", "application/json")
    assert e.value.code == 404


def test_batcher_backpressure_rejects_over_budget():
    """Admission control: submits beyond max_pending_rows raise ServerBusy
    instead of growing the backlog without bound."""
    from bilinear_tpu.serving_http import ServerBusy

    release = threading.Event()
    entered = threading.Event()

    def fn(x):
        entered.set()
        release.wait(timeout=30)
        return (x,)

    b = DynamicBatcher(fn, n_inputs=1, max_delay_ms=1.0, max_pending_rows=4)
    # Occupy the dispatcher inside fn, then fill the queue to the budget.
    first = threading.Thread(
        target=lambda: b.submit(np.zeros((1, 2), np.float32))
    )
    first.start()
    assert entered.wait(timeout=30)  # dispatcher is now blocked inside fn
    queued = threading.Thread(
        target=lambda: b.submit(np.zeros((3, 2), np.float32))
    )
    queued.start()
    deadline = time.monotonic() + 10
    while b._pending_rows < 3 and time.monotonic() < deadline:
        time.sleep(0.01)
    assert b._pending_rows == 3
    with pytest.raises(ServerBusy, match="retry later"):
        b.submit(np.zeros((2, 2), np.float32))  # 3 queued + 2 > 4
    assert b.rows_rejected == 2
    release.set()
    first.join(timeout=30)
    queued.join(timeout=30)
    b.stop()


def test_metrics_endpoint(daemon):
    server = daemon[0]
    with urllib.request.urlopen(_url(server, "/metrics"), timeout=30) as r:
        assert r.headers.get("Content-Type", "").startswith("text/plain")
        text = r.read().decode()
    for needle in (
        "bilinear_uptime_seconds ",
        'bilinear_rows_served_total{route="lift"}',
        'bilinear_batches_total{route="pose"}',
        'bilinear_model_epoch{route="pose"}',
        'bilinear_dispatch_seconds_total{route="lift"}',
    ):
        assert needle in text, f"missing {needle!r} in /metrics"


def test_http_503_when_saturated(daemon):
    """A server with a 1-row budget 503s a 2-row request (Retry-After set)."""
    _, _, _, _, lifting = daemon
    small = PoseHTTPServer(
        lifting=lifting, port=0, max_delay_ms=1.0, max_pending_rows=1
    )
    small.start()
    try:
        kp = np.zeros((2, 16, 2), np.float32)
        body = json.dumps({"keypoints": kp.tolist()}).encode()
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(small, "/v1/lift", body, "application/json")
        assert e.value.code == 503
        assert e.value.headers.get("Retry-After") == "1"
    finally:
        small.stop()


def test_garbage_bodies_never_5xx_and_daemon_survives(daemon):
    """Robustness: random garbage at every POST route must map to a 4xx
    (bad request / wrong payload), never a 5xx, and the daemon must keep
    serving afterwards."""
    server = daemon[0]
    rng = np.random.RandomState(11)
    bodies = [
        b"",
        b"\x00" * 64,
        rng.bytes(257),
        b'{"keypoints": "nope"}',
        b'{"unrelated": 1}',
        b"\x93NUMPY garbage that is not a real npy header",
        json.dumps({"keypoints": [[[1e308] * 2] * 16] * 2}).encode(),
    ]
    ctypes_ = ["application/json", "application/x-npy", "application/x-npz"]
    for path in ("/v1/lift", "/v1/pose"):
        for body in bodies:
            for ctype in ctypes_:
                try:
                    _post(server, path, body, ctype)
                except urllib.error.HTTPError as e:
                    assert 400 <= e.code < 500, (
                        f"{path} {ctype} {body[:20]!r} gave {e.code}"
                    )
    # Daemon still healthy and still serves real work.
    with urllib.request.urlopen(_url(server, "/healthz"), timeout=30) as r:
        assert json.loads(r.read())["status"] == "ok"
    kp = np.zeros((1, 16, 2), np.float32)
    out, _ = _post(
        server, "/v1/lift",
        json.dumps({"keypoints": kp.tolist()}).encode(), "application/json",
    )
    assert np.asarray(json.loads(out)["poses_mm"]).shape == (1, 16, 3)


def test_pose_client_round_trips(daemon):
    """client.py::PoseClient end-to-end against the live daemon: lift and
    pose match the direct server objects; health/reload work; server-side
    validation errors surface as ServerError with the daemon's message."""
    from bilinear_tpu.client import PoseClient, ServerError

    server, tr, _, _, lifting = daemon
    client = PoseClient(f"http://{server.host}:{server.port}", timeout=60)

    h = client.health()
    assert h["status"] == "ok" and h["pose"] is not None

    kp = tr.raw_part[:5].reshape(5, 16, 2).astype(np.float32)
    mm = client.lift(kp)
    want = np.asarray(lifting.lift(kp)).reshape(5, 16, 3)
    np.testing.assert_allclose(mm, want, rtol=1e-4, atol=1e-3)

    frames = (np.random.RandomState(9).rand(2, 256, 256, 3) * 255).astype(
        np.uint8
    )
    p2, p3 = client.pose(frames)
    w2, w3 = server.end2end.predict(frames)
    np.testing.assert_allclose(p2, w2, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(p3, w3, rtol=1e-4, atol=1e-2)

    r = client.reload()
    assert set(r) == {"reloaded", "epoch", "lift_epoch"}

    with pytest.raises(ValueError, match=r"\(N, 16, 2\)"):
        client.lift(np.zeros((3, 2), np.float32))  # client-side shape gate
    with pytest.raises(ServerError) as e:
        # valid npy wire bytes, wrong payload shape -> server-side 400
        client._request(
            "/v1/lift",
            _npy_wire(np.zeros((1, 2, 2), np.float32)),
            "application/x-npy",
            method="POST",
        )
    assert e.value.status == 400 and "16, 2" in e.value.message


def _npy_wire(arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


def test_serve_cli_build(daemon, tmp_path):
    """cli/serve.py's parser + build_server produce a working daemon
    (end-to-end through /healthz and /v1/pose), without the serve loop."""
    import bilinear_tpu.cli.serve as serve_mod

    _, _, e2e_dir, _, lifting = daemon
    lift_run_dir = os.path.dirname(lifting.parameter_dir)
    data_dir = str(tmp_path / "h36m")
    write_h36m_dataset(data_dir, n_train=32, n_valid=8)
    ns = serve_mod.build_parser().parse_args([
        "--kind", "both", "--run-dir", e2e_dir,
        "--lifting-run-dir", lift_run_dir, "--data-dir", data_dir,
        "--dtype", "float32", "--n-stacks", "1", "--features", "8",
        "--depth", "1", "--batch-sizes", "1", "4", "--port", "0",
        "--reload-every", "0", "--interpret",
    ])
    srv = serve_mod.build_server(ns)
    srv.start()
    try:
        with urllib.request.urlopen(_url(srv, "/healthz"), timeout=30) as r:
            h = json.loads(r.read())
        assert h["status"] == "ok"
        assert h["lift"] is not None and h["pose"] is not None
        frames = (np.random.RandomState(3).rand(2, 256, 256, 3) * 255).astype(
            np.uint8
        )
        buf = io.BytesIO()
        np.savez(buf, frames=frames)
        out, _ = _post(srv, "/v1/pose", buf.getvalue(), "application/x-npz")
        with np.load(io.BytesIO(out)) as z:
            assert z["pose2d"].shape == (2, 16, 2)
            assert z["pose3d_mm"].shape == (2, 16, 3)
            assert np.isfinite(z["pose3d_mm"]).all()
        kp = np.random.RandomState(4).rand(3, 16, 2).astype(np.float32) * 200
        body = json.dumps({"keypoints": kp.tolist()}).encode()
        out, _ = _post(srv, "/v1/lift", body, "application/json")
        mm = np.asarray(json.loads(out)["poses_mm"], np.float32)
        assert mm.shape == (3, 16, 3) and np.isfinite(mm).all()
    finally:
        srv.stop()


def test_client_retries_503_with_backpressure():
    """PoseClient(busy_retries=N) treats admission-control 503s as flow
    control: it sleeps Retry-After and retries instead of raising — so a
    load generator or offline batch client rides out a full backlog.
    Default (busy_retries=0) still surfaces the 503 immediately."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from bilinear_tpu.client import PoseClient, ServerError

    codes = [503, 503, 200]

    class _Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            code = codes.pop(0)
            body = (json.dumps({"status": "ok"}) if code == 200
                    else json.dumps({"error": "retry later"})).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            if code == 503:
                self.send_header("Retry-After", "0.05")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        assert PoseClient(url, busy_retries=5).health() == {"status": "ok"}
        assert codes == []  # both 503s were consumed by retries

        codes.extend([503, 200])
        with pytest.raises(ServerError) as e:
            PoseClient(url).health()  # default: no retry
        assert e.value.status == 503
    finally:
        srv.shutdown()


def test_pose_mixed_dtype_coalescing(daemon):
    """uint8 frames ride the batcher as uint8 (4x fewer device-transfer
    bytes); when a u8 and an f32 request coalesce into ONE batch, the frame
    coercer must normalize them instead of letting np.concatenate promote
    u8 0-255 values into the [0,1]-float program."""
    server = daemon[0]
    rng = np.random.RandomState(3)
    f_u8 = (rng.rand(2, 256, 256, 3) * 255).astype(np.uint8)
    # The f32 rider carries the SAME pixel values the u8 rider decodes to,
    # so the two requests must produce (near-)identical poses whether or
    # not they land in one coalesced batch. Un-coerced promotion would feed
    # the u8 rider 0-255 floats and move its poses wildly.
    f_f32 = f_u8.astype(np.float32) / 255.0

    results = {}

    def post(name, frames):
        buf = io.BytesIO()
        np.savez(buf, frames=frames)
        out, _ = _post(server, "/v1/pose", buf.getvalue(), "application/x-npz")
        with np.load(io.BytesIO(out), allow_pickle=False) as z:
            results[name] = (z["pose2d"], z["pose3d_mm"])

    threads = [
        threading.Thread(target=post, args=("u8", f_u8)),
        threading.Thread(target=post, args=("f32", f_f32)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    np.testing.assert_allclose(results["u8"][0], results["f32"][0], atol=1.0)
    np.testing.assert_allclose(
        results["u8"][1], results["f32"][1], rtol=1e-3, atol=1.0
    )


def test_batcher_splits_bulk_requests_and_interleaves():
    """VERDICT r3 item 10: a bulk request is split across max_rows-capped
    dispatches, and a small request submitted while the bulk one is queued
    completes WITHOUT waiting for the whole bulk body (round-robin shares,
    bounded tail under concurrent bulk clients)."""
    import threading as th

    from bilinear_tpu.serving_http import DynamicBatcher

    dispatch_rows = []
    release = th.Event()

    def fn(x):
        dispatch_rows.append(int(x.shape[0]))
        time.sleep(0.05)  # make each dispatch observable
        return (x * 2.0,)

    b = DynamicBatcher(fn, n_inputs=1, max_delay_ms=1.0, max_rows=64,
                       max_pending_rows=100_000)
    try:
        big = np.arange(1024, dtype=np.float32).reshape(1024, 1)
        small = np.asarray([[7.0]], np.float32)
        t_small_done = {}

        def run_big():
            (out,) = b.submit(big)
            t_small_done["big"] = time.monotonic()
            np.testing.assert_array_equal(out, big * 2.0)

        def run_small():
            time.sleep(0.08)  # arrive while the bulk body is mid-flight
            (out,) = b.submit(small)
            t_small_done["small"] = time.monotonic()
            np.testing.assert_array_equal(out, small * 2.0)

        tb = th.Thread(target=run_big)
        ts = th.Thread(target=run_small)
        tb.start(); ts.start()
        tb.join(30); ts.join(30)
        assert "big" in t_small_done and "small" in t_small_done
        # Every dispatch respected the row cap (no mega-dispatch).
        assert max(dispatch_rows) <= 64, dispatch_rows
        assert len(dispatch_rows) >= 1024 // 64
        # The small request did not wait for the bulk request to finish.
        assert t_small_done["small"] < t_small_done["big"], t_small_done
    finally:
        b.stop()


def test_warm_precompiles_every_dispatchable_shape(daemon):
    """PoseHTTPServer.warm() must cover exactly the shapes the batchers can
    dispatch: the lifting TILE grid up to max_rows (incl. a non-multiple
    top) and one (batch, dtype) pose program per compiled size. On a cold
    remote service an unwarmed shape compiles lazily MID-REQUEST (measured
    20.5 s, VERIFICATION_R5 section 2) — warm() exists so daemon restarts
    never pay that inside a request."""
    server, tr, _, _, lifting = daemon
    from bilinear_tpu.ops.pallas.lifting import TILE

    warmed = server.warm()
    top = server.lift_batcher._max_rows
    want_grid = list(range(TILE, top + 1, TILE))
    if not want_grid or want_grid[-1] != top:
        want_grid.append(top)
    assert warmed["lift_rows"] == sorted(set(want_grid))
    assert warmed["pose"] == [(b, "uint8") for b in server.end2end.batch_sizes]

    # Both dtypes on request; f32 frames are a distinct compiled program.
    warmed2 = server.warm(pose_dtypes=("uint8", "float32"))
    assert (server.end2end.batch_sizes[0], "float32") in warmed2["pose"]

    # The servers still answer correctly after warming (weights untouched).
    kp = np.random.RandomState(0).rand(3, 16, 2).astype(np.float32) * 200
    out = np.asarray(lifting.lift(kp))
    assert out.shape == (3, 16, 3) and np.isfinite(out).all()


def test_warm_skips_backends_without_warm(daemon):
    """AOT artifact servers (io/aot.py) have no warm(); PoseHTTPServer.warm
    must skip them rather than crash (cli.serve --warm with --aot)."""
    server, *_ = daemon

    class NoWarm:  # duck-typed AOTServer stand-in
        pass

    orig_l, orig_e = server.lifting, server.end2end
    try:
        server.lifting = NoWarm()
        server.end2end = NoWarm()
        assert server.warm() == {}
    finally:
        server.lifting, server.end2end = orig_l, orig_e
