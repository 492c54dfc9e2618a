"""Multi-process (multi-host analogue) execution: 2 CPU processes x 4
virtual devices form ONE 8-device mesh via jax.distributed + gloo and must
reproduce the single-process 8-device DP losses for both trainers
(SURVEY.md §5 'Distributed communication backend'; round-2 VERDICT item 2 —
init_distributed exercised for real, not dead code).

The single-process reference runs the IDENTICAL program (same mesh shape,
same shardings, same data — tests/distributed_case.py) on this process's 8
in-process virtual devices; the workers differ only by the process/DCN
boundary, so losses, updated-parameter digests, and global BN batch stats
must agree to float tolerance.
"""
import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dp_matches_single_process():
    from bilinear_tpu.parallel import mesh as mesh_lib
    from tests import distributed_case as case

    mesh = mesh_lib.make_mesh()  # conftest: 8 in-process virtual devices
    ref = case.run_steps(mesh, lambda t: mesh_lib.shard_batch(mesh, t))

    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    worker = os.path.join(REPO, "tests", "distributed_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), f"localhost:{port}"],
            cwd=REPO,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    results = []
    for p in procs:
        out, err = p.communicate(timeout=1200)
        assert p.returncode == 0, (out[-2000:], err[-4000:])
        lines = [l for l in out.splitlines() if l.startswith("{")]
        assert lines, (out, err[-2000:])
        results.append(json.loads(lines[-1]))

    assert {r["process_id"] for r in results} == {0, 1}
    for got in results:
        for key, want in ref.items():
            # Same program; only the psum crosses a process boundary (gloo
            # ring vs in-process reduction order).
            assert got[key] == pytest.approx(want, rel=2e-4, abs=1e-7), (
                key, got, ref,
            )
