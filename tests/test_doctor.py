"""cli.doctor — environment self-check probes.

Runs every probe at tiny sizes on the CPU-forced suite backend and checks the
report contract (sections, units, warning semantics). The probes' value is on
real TPU hosts (see docs/VERIFICATION_R3.md's platform quirks); here we pin
that they run, return sane numbers, and never poison global state.
"""
from __future__ import annotations

import json
import os

from bilinear_tpu.cli import doctor


def test_platform_probe_reports_suite_topology():
    p = doctor.probe_platform()
    assert p["backend"] == "cpu"
    assert p["n_devices"] == 8  # conftest's virtual-device mesh
    assert p["process_count"] == 1


def test_memory_probe_one_entry_per_local_device():
    m = doctor.probe_memory()
    assert len(m["devices"]) == 8
    assert all("bytes_in_use" in d for d in m["devices"])


def test_dispatch_probe_positive_rtt():
    d = doctor.probe_dispatch(reps=5)
    assert d["rtt_ms"] > 0


def test_sync_probe_cpu_block_until_ready_waits():
    s = doctor.probe_sync(n=64, min_fetch_s=0.02)
    assert s["block_until_ready_syncs"] is True
    assert "warning" not in s


def test_transfer_probe_positive_bandwidth():
    t = doctor.probe_transfer(mb=2)
    assert t["h2d_mb_per_s"] > 0
    assert t["d2h_mb_per_s"] > 0


def test_matmul_probe_positive_throughput():
    r = doctor.probe_matmul(n=128)
    assert r["tflops"] > 0
    assert r["ms"] > 0


def test_compile_cache_probe_round_trips_an_entry(tmp_path):
    import jax

    old = jax.config.jax_compilation_cache_dir
    try:
        out = doctor.probe_compile_cache(str(tmp_path / "cache"))
        assert out["wrote_entry"] is True
        assert out["entries"] >= 1
    finally:
        jax.config.update("jax_compilation_cache_dir", old)


def test_checkpoint_probe_empty_dir_warns_then_sees_epochs(tmp_path):
    run_dir = tmp_path / "run"
    param = run_dir / "parameter"
    os.makedirs(param)

    out = doctor.probe_checkpoints(str(run_dir))
    assert out["latest_epoch"] == 0
    assert out["finalized"] is False
    assert "warning" in out

    (param / "3.save").write_bytes(b"x")
    (param / "10.save").write_bytes(b"x")
    out = doctor.probe_checkpoints(str(run_dir))
    assert out["latest_epoch"] == 10
    assert "warning" not in out


def test_main_prints_one_json_report(tmp_path, capsys):
    run_dir = tmp_path / "run"
    os.makedirs(run_dir / "parameter")
    rc = doctor.main(
        [
            "--skip", "sync", "matmul", "transfer",
            "--run-dir", str(run_dir),
        ]
    )
    assert rc == 0
    report = json.loads(capsys.readouterr().out)
    assert report["platform"]["backend"] == "cpu"
    assert report["sync"] == {"skipped": True}
    assert report["checkpoints"]["latest_epoch"] == 0
    assert "dispatch" in report and "memory" in report


def test_main_probe_failure_sets_exit_code(tmp_path, capsys):
    # An unreadable compile-cache path makes exactly that probe error out;
    # the rest of the report must still be produced.
    bad = tmp_path / "file-not-dir"
    bad.write_bytes(b"")
    rc = doctor.main(
        [
            "--skip", "sync", "matmul", "transfer", "dispatch", "memory",
            "--compile-cache-dir", str(bad / "sub"),
        ]
    )
    report = json.loads(capsys.readouterr().out)
    assert rc == 1
    assert "error" in report["compile_cache"]
    assert report["platform"]["backend"] == "cpu"
