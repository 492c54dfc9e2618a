"""Test configuration: force CPU with 8 virtual devices so multi-chip sharding
logic is exercised without TPU hardware (SURVEY.md §4).

Note: the environment's sitecustomize imports jax at interpreter startup and
pins JAX_PLATFORMS to the TPU plugin, so setting env vars here is too late —
we must go through jax.config before any backend is initialized.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Full-precision matmuls so torch-CPU oracle comparisons are exact.
jax.config.update("jax_default_matmul_precision", "highest")
