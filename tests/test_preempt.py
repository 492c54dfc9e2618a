"""Graceful preemption (utils/preempt.py) + persistent compilation cache
(config.py::enable_compile_cache) — the two production-hardening knobs for
the reference's process-per-epoch-block driver design (bilinear.sh:1)."""
import os
import signal
import subprocess
import sys
import tempfile
import time

import pytest

from bilinear_tpu.utils.preempt import GracefulShutdown, global_requested

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_graceful_shutdown_latches_and_restores():
    calls = []
    prev = signal.signal(signal.SIGUSR1, lambda *a: calls.append(a))
    try:
        gs = GracefulShutdown(signals=(signal.SIGUSR1,))
        with gs as stop:
            assert stop.requested is False
            os.kill(os.getpid(), signal.SIGUSR1)
            assert stop.requested is True
            assert calls == []  # our latch consumed it, not the old handler
        # Context exit restores the previous handler.
        os.kill(os.getpid(), signal.SIGUSR1)
        assert len(calls) == 1
    finally:
        signal.signal(signal.SIGUSR1, prev)


def test_second_signal_falls_through():
    """After the latch fires once it re-arms the previous handler, so a
    second signal of the same kind is a hard kill (double-Ctrl-C)."""
    outer = []
    prev = signal.signal(signal.SIGUSR1, lambda *a: outer.append(a))
    try:
        with GracefulShutdown(signals=(signal.SIGUSR1,)) as stop:
            os.kill(os.getpid(), signal.SIGUSR1)
            assert stop.requested
            os.kill(os.getpid(), signal.SIGUSR1)
            assert len(outer) == 1  # second one reached the old handler
    finally:
        signal.signal(signal.SIGUSR1, prev)


def test_global_requested_single_process_identity():
    # Single-process: pure pass-through, no collective dispatched.
    assert global_requested(True) is True
    assert global_requested(False) is False


def test_none_previous_handler_degrades_to_default():
    """C-installed handlers read back as None; the latch must re-arm/restore
    SIG_DFL instead of raising TypeError mid-epoch."""
    gs = GracefulShutdown(signals=(signal.SIGUSR2,))
    prev = signal.signal(signal.SIGUSR2, signal.SIG_IGN)
    try:
        with gs:
            gs._previous[signal.SIGUSR2] = None  # simulate a C handler
            os.kill(os.getpid(), signal.SIGUSR2)
            assert gs.requested
            assert signal.getsignal(signal.SIGUSR2) == signal.SIG_DFL
    finally:
        signal.signal(signal.SIGUSR2, prev)


def test_train_bilinear_sigterm_checkpoints_and_exits_zero(tmp_path):
    """Drive the real CLI as a process: SIGTERM mid-run must finish the
    in-flight epoch, checkpoint it, log the preemption, and exit 0 with
    fewer epochs than requested."""
    from bilinear_tpu.data.synthetic import write_h36m_dataset

    data = str(tmp_path / "Human3.6M")
    # 2048 samples x 500 epochs: long enough that the run cannot complete
    # between the 0.5 s checkpoint polls and SIGTERM delivery (the 256x50
    # original could, flaking the epochs[-1] < N assertion below).
    write_h36m_dataset(data, n_train=2048, n_valid=32)
    save = str(tmp_path / "save")
    env = dict(os.environ)
    env["BILINEAR_TPU_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(
        [sys.executable, "-m", "bilinear_tpu.cli.train_bilinear",
         "--data-dir", data, "--save-root", save,
         "--batch-size", "64", "--epochs-per-run", "500"],
        cwd=str(tmp_path), env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    pdir = os.path.join(save, "Bilinear GT", "parameter")
    try:
        deadline = time.time() + 600
        while time.time() < deadline:
            if os.path.isdir(pdir) and any(
                f.endswith(".save") for f in os.listdir(pdir)
            ):
                break
            if proc.poll() is not None:
                pytest.fail("CLI exited before first checkpoint:\n"
                            + proc.communicate()[0][-4000:])
            time.sleep(0.5)
        else:
            pytest.fail("no checkpoint appeared within 600s")
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=300)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate()
    assert proc.returncode == 0, out[-4000:]
    epochs = sorted(
        int(f.split(".")[0]) for f in os.listdir(pdir) if f.endswith(".save")
    )
    if "Preempted after epoch" not in out and epochs and epochs[-1] >= 500:
        pytest.skip("run completed before SIGTERM landed; race not exercised")
    assert "Preempted after epoch" in out, out[-4000:]
    assert epochs and epochs[-1] < 500
    # The preempted run is resumable: a follow-up invocation picks up from
    # the last saved epoch (the reference's restart contract).
    proc2 = subprocess.run(
        [sys.executable, "-m", "bilinear_tpu.cli.train_bilinear",
         "--data-dir", data, "--save-root", save,
         "--batch-size", "64", "--epochs-per-run", "1"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert proc2.returncode == 0, proc2.stderr[-4000:]
    assert f"Resumed from epoch {epochs[-1]}" in proc2.stdout + proc2.stderr


def test_enable_compile_cache_populates_dir():
    import jax
    import jax.numpy as jnp

    from bilinear_tpu.config import enable_compile_cache

    old = jax.config.jax_compilation_cache_dir
    old_secs = jax.config.jax_persistent_cache_min_compile_time_secs
    old_bytes = jax.config.jax_persistent_cache_min_entry_size_bytes
    d = tempfile.mkdtemp()
    try:
        enable_compile_cache(d, zero_thresholds=True)
        # A fresh program shape so this compiles (and therefore caches).
        f = jax.jit(lambda x: jnp.tanh(x) @ x.T + 0.12345)
        f(jnp.ones((17, 23))).block_until_ready()
        assert os.listdir(d), "compilation cache dir stayed empty"
    finally:
        jax.config.update("jax_compilation_cache_dir", old)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", old_secs)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", old_bytes)


def test_parse_config_wires_compile_cache(tmp_path):
    import jax

    from bilinear_tpu.config import BilinearConfig, parse_config

    old = jax.config.jax_compilation_cache_dir
    old_secs = jax.config.jax_persistent_cache_min_compile_time_secs
    old_bytes = jax.config.jax_persistent_cache_min_entry_size_bytes
    d = str(tmp_path / "xla_cache")
    try:
        cfg = parse_config(BilinearConfig(), ["--compile-cache-dir", d])
        assert cfg.compile_cache_dir == d
        assert jax.config.jax_compilation_cache_dir == d
        assert os.path.isdir(d)
    finally:
        jax.config.update("jax_compilation_cache_dir", old)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", old_secs)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", old_bytes)
