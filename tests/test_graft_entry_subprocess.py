"""Driver-contract test for __graft_entry__.dryrun_multichip.

Round 1's failure (MULTICHIP_r01.json rc=1): the dryrun assumed enough
devices were already visible, which only held under tests/conftest.py's
pre-provisioned 8-CPU mesh — the driver invokes it standalone on the 1-chip
tunneled TPU. This test reproduces the driver's shape: a fresh interpreter
with exactly ONE visible device, no conftest, calling dryrun_multichip(8).
The function must self-provision the virtual 8-device CPU mesh in its own
subprocess and propagate failures.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_self_provisions_from_single_device():
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_num_cpu_devices', 1)\n"
        "import __graft_entry__ as ge\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "ge.dryrun_multichip(8)\n"
        "print('PARENT_OK')\n"
    )
    env = dict(os.environ)
    env.pop("BILINEAR_TPU_DRYRUN_CHILD", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-4000:])
    assert "DRYRUN_MULTICHIP_OK" in proc.stdout
    assert "PARENT_OK" in proc.stdout
