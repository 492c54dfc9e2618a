"""BILINEAR_TPU_PLATFORM must win no matter what gets imported first.

The environment's sitecustomize registers the TPU plugin and pins the
platform through jax.config, so a subprocess's JAX_PLATFORMS env var cannot
force CPU; the only reliable lever is a jax.config.update BEFORE backend
initialization. Regression coverage for the bug where a module-level
``jnp.asarray`` in ops/augment.py initialized the backend at import time —
every CLI subprocess then ran its tiny smoke configs over the remote-TPU
tunnel (minutes per compile) instead of on local CPU, timing out the
outer-driver tests.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The heaviest import chains in-tree: each CLI pulls in its full train/eval
# stack, so importing these exercises every module that could accidentally
# create a device array at import time.
_IMPORT_ROOTS = [
    "bilinear_tpu.cli.train_hourglass",
    "bilinear_tpu.cli.train_bilinear",
    "bilinear_tpu.cli.valid_hourglass",
    "bilinear_tpu.cli.valid_bilinear",
    "bilinear_tpu.cli.train_end2end",
    "bilinear_tpu.cli.eval_hourglass",
    "bilinear_tpu.serving_http",
]


def test_cpu_override_survives_full_cli_import_chain():
    code = (
        "import sys; sys.path.insert(0, {repo!r})\n"
        "import importlib\n"
        "for m in {mods!r}:\n"
        "    importlib.import_module(m)\n"
        "import jax\n"
        "assert jax.default_backend() == 'cpu', jax.default_backend()\n"
        "assert jax.devices()[0].platform == 'cpu', jax.devices()\n"
        "print('cpu-ok')\n"
    ).format(repo=REPO, mods=_IMPORT_ROOTS)
    env = dict(os.environ)
    env["BILINEAR_TPU_PLATFORM"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "cpu-ok" in proc.stdout


def test_package_has_no_import_time_device_arrays():
    """Importing the whole package with an unregistered platform name must
    not raise: nothing may initialize the backend at import time."""
    code = (
        "import sys; sys.path.insert(0, {repo!r})\n"
        "import importlib\n"
        "for m in {mods!r}:\n"
        "    importlib.import_module(m)\n"
        "print('no-backend-touch')\n"
    ).format(repo=REPO, mods=_IMPORT_ROOTS)
    env = dict(os.environ)
    # An invalid platform makes ANY backend initialization throw, so success
    # proves no import created a device array.
    env["BILINEAR_TPU_PLATFORM"] = "there_is_no_such_platform"
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "no-backend-touch" in proc.stdout
