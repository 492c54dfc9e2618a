"""Shared fixture for the multi-process distributed test: one bilinear DP
step and one hourglass DP step (GSPMD-global BN batch stats) over a given
mesh. Used by BOTH the single-process reference (tests/test_distributed.py,
8 in-process virtual devices) and the 2-process workers
(tests/distributed_worker.py, 4 virtual devices each, jax.distributed over
gloo) so the two executions are guaranteed to be the same program on the
same data — the only difference is the process boundary (SURVEY.md §5
'Distributed communication backend').
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

B_BILINEAR = 16
B_HOURGLASS = 8


def make_data():
    rng = np.random.RandomState(0)
    bx = rng.randn(B_BILINEAR, 32).astype(np.float32)
    by = rng.randn(B_BILINEAR, 48).astype(np.float32)
    hg = {
        "images": rng.rand(B_HOURGLASS, 128, 128, 3).astype(np.float32),
        "centers": np.full((B_HOURGLASS, 2), 64.0, np.float32),
        "scales": np.full((B_HOURGLASS,), 0.5, np.float32),
        "keypoints": rng.uniform(30, 100, (B_HOURGLASS, 16, 2)).astype(
            np.float32
        ),
        "valid": np.ones((B_HOURGLASS, 16), bool),
    }
    return bx, by, hg


def local_slice(tree, pid: int, n_proc: int):
    """Each process's contiguous row-block of every batch-leading array —
    the layout jax.make_array_from_process_local_data assembles back into
    the global batch (process p owns global devices [p*d, (p+1)*d))."""
    return jax.tree.map(
        lambda v: v[(pid * v.shape[0]) // n_proc:
                    ((pid + 1) * v.shape[0]) // n_proc],
        tree,
    )


def run_steps(mesh, to_global):
    """One DP train step of each trainer; returns scalar evidence (losses +
    updated-parameter digests) for cross-process comparison. ``to_global``
    maps a host pytree to global arrays for this process's view."""
    from bilinear_tpu.models.hourglass_torch7 import MainModel
    from bilinear_tpu.train.bilinear import BilinearTrainer
    from bilinear_tpu.train.hourglass import HourglassTrainer

    bx, by, hg = make_data()

    t = BilinearTrainer(batch_size=B_BILINEAR, dropout=0.0, mesh=mesh)
    # device_get -> numpy leaves: replicated under jit, and (in the worker)
    # addressable from every process.
    st = jax.device_get(t.init_state(jax.random.PRNGKey(0)))
    gx, gy = to_global((bx, by))
    new_st, loss = jax.jit(t._train_step)(st, gx, gy, jax.random.PRNGKey(1))
    digest = float(
        jnp.sum(jnp.abs(new_st.params["encode"]["linear"]["kernel"]))
    )

    ht = HourglassTrainer(batch_size=B_HOURGLASS, mesh=mesh, canvas=128)
    ht.model = MainModel(n_stacks=1, features=8, depth=1)
    hst = jax.device_get(ht.init_state(jax.random.PRNGKey(0)))
    ghg = to_global(hg)
    hnew, hloss = jax.jit(ht._train_step)(hst, ghg, jax.random.PRNGKey(2))
    hdigest = float(jnp.sum(jnp.abs(hnew.params["htmap_0"]["kernel"])))
    # Global BN batch stats must have been updated (not the init zeros/ones).
    bn_mean = float(
        jnp.sum(jnp.abs(hnew.batch_stats["stem_bn"]["mean"]))
    )

    return {
        "bilinear_loss": float(loss),
        "bilinear_digest": digest,
        "hourglass_loss": float(hloss),
        "hourglass_digest": hdigest,
        "hourglass_bn_mean": bn_mean,
    }
