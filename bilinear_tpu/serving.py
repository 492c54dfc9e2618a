"""Batched lifting inference service — the production serving path.

Wraps the fused Pallas kernel (ops/pallas/lifting.py) with everything a
caller needs to go from raw image-space 2D keypoints to 3D millimeters:

  image-space (N, 16, 2) -> z-score with the TRAIN-split part stats
  -> fused kernel (BN folded, weights VMEM-resident, bf16 MXU)
  -> un-normalize with the TRAIN-split S stats -> (N, 16, 3) mm,
     root-centered (pelvis at the origin, reference convention).

Requests are padded to the kernel's tile size; weights are folded once at
construction. ``from_run_dir`` resumes the newest checkpoint with the
reference's dir-scan contract.
"""
from __future__ import annotations

import os
import jax
import jax.numpy as jnp
import numpy as np

from bilinear_tpu.data.h36m import H36MSplit
from bilinear_tpu.io.checkpoint import resume_or_init
from bilinear_tpu.ops.pallas.lifting import lifting_forward, prepare_weights


class LiftingServer:
    def __init__(
        self,
        params,
        batch_stats,
        mean_part: np.ndarray,
        std_part: np.ndarray,
        mean_s: np.ndarray,
        std_s: np.ndarray,
        dtype=jnp.bfloat16,
        interpret: bool = False,
    ):
        self._params = params
        self._batch_stats = batch_stats
        self._prepared = prepare_weights(params, batch_stats, dtype)
        self._mean_part = jnp.asarray(mean_part)
        self._std_part = jnp.asarray(std_part)
        self._mean_s = jnp.asarray(mean_s)
        self._std_s = jnp.asarray(std_s)
        self._dtype = dtype
        self._interpret = interpret

    @classmethod
    def from_run_dir(cls, run_dir: str, split: H36MSplit, **kw):
        """Load the newest ``{run_dir}/parameter/{epoch}.save`` checkpoint and
        take normalization stats from the (train) split."""
        from bilinear_tpu.train.bilinear import BilinearTrainer

        trainer = BilinearTrainer()
        template = trainer.init_state(jax.random.PRNGKey(0))
        state, epoch = resume_or_init(
            template, os.path.join(run_dir, "parameter")
        )
        return cls(
            state.params,
            state.batch_stats,
            split.mean_part,
            split.std_part,
            split.mean_s,
            split.std_s,
            **kw,
        ), epoch

    def lift(self, keypoints_2d) -> jnp.ndarray:
        """(N, 16, 2) image-space keypoints (H36M 16-joint order, nose
        dropped) -> (N, 16, 3) root-centered 3D mm."""
        kp = jnp.asarray(keypoints_2d, jnp.float32)
        n = kp.shape[0]
        x = (kp.reshape(n, 32) - self._mean_part) / self._std_part
        out = lifting_forward(
            self._params,
            self._batch_stats,
            x,
            dtype=self._dtype,
            interpret=self._interpret,
            prepared=self._prepared,
        )
        mm = out * self._std_s + self._mean_s
        return mm.reshape(n, 16, 3)

    def lift_normalized(self, x_norm) -> jnp.ndarray:
        """(N, 32) pre-normalized inputs -> (N, 48) normalized outputs (the
        raw model contract, for pipelines that manage stats themselves)."""
        return lifting_forward(
            self._params,
            self._batch_stats,
            jnp.asarray(x_norm, jnp.float32),
            dtype=self._dtype,
            interpret=self._interpret,
            prepared=self._prepared,
        )
