"""Joint end-to-end training of hourglass + lifting — the working rebuild of
the reference's train_end2end.py skeleton (which documents intent only: it
imports a nonexistent package, passes wrong kwargs, and uses undefined
variables — SURVEY.md §2.3).

Loss = sum-of-stacks heatmap MSE (the hourglass term, train_hourglass.py:76)
     + lambda_3d * MSE(predicted normalized 3D, GT normalized 3D)
       (the bilinear term, train_bilinear.py:78),
optimized with RMSprop 2.5e-4 + clip(1.0) over ALL parameters, 100 epochs per
invocation (train_end2end.py:53-61 documents the budget and the shared
checkpoint format).

Gradient flows from the 3D loss back through soft-argmax into the detector —
the differentiable decode is exactly why softargmax (not argmax) exists in
the reference's sketch. Augmentation is scale/color only (no rotation or
flip): the fused decode maps heatmap -> image space with center+scale, which
rotation would invalidate, and the reference never flips H36M.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from bilinear_tpu.core.optim import hourglass_optimizer
from bilinear_tpu.core.state import TrainState
from bilinear_tpu.models.end2end import End2End
from bilinear_tpu.ops import augment as aug
from bilinear_tpu.ops.affine import crop_batch
from bilinear_tpu.ops.heatmap import keypoints_to_heatmap_space, render_heatmaps
from bilinear_tpu.ops.joints import FROM_H36M_TO_MPII
from bilinear_tpu.parallel import mesh as mesh_lib


class End2EndTrainer:
    def __init__(
        self,
        variant: str = "torch7",
        batch_size: int = 8,
        learning_rate: float = 2.5e-4,
        lambda_3d: float = 1.0,
        mesh=None,
        dtype=jnp.float32,
        model_kw=None,  # detector size overrides (n_stacks/features/depth)
    ):
        self.model = End2End(variant=variant, dtype=dtype, **(model_kw or {}))
        self.tx = hourglass_optimizer(learning_rate)
        self.batch_size = batch_size
        self.lambda_3d = lambda_3d
        self.mesh = mesh
        self._step = None

    def init_state(self, rng: jax.Array, mean_part, std_part) -> TrainState:
        variables = self.model.init(
            rng,
            jnp.zeros((1, 256, 256, 3), jnp.float32),
            jnp.zeros((1, 2)),
            jnp.ones((1,)),
            mean_part,
            std_part,
            train=False,
        )
        return TrainState.create(
            variables["params"], variables["batch_stats"], self.tx
        )

    def _train_step(self, state, batch, stats, rng):
        """batch: images/centers/scales/keypoints(H36M-16 order)/valid/s_norm
        + decode_centers/decode_scales — the SAME crop box expressed in
        ORIGINAL image space. The fused decode maps heatmap coords through
        center+(p-32)/64*200*scale; the lifting stats (mean_part/std_part)
        are statistics of ORIGINAL-image-space keypoints, so the decode must
        use the original-space box, not the canvas-space one the crop uses —
        mixing spaces feeds the (possibly warm-started) lifter z-scores from
        the wrong distribution (measured: 488 mm vs 44 mm fused MPJPE,
        VERIFICATION_R5). Both boxes denote the same pixels, so one aug
        scale factor applies to both. stats: (mean_part, std_part)."""
        mean_part, std_part = stats
        images = batch["images"]
        if self.mesh is not None:
            images = mesh_lib.constrain_batch(images, self.mesh)

        # One fold per step, three independent streams: folding rng again
        # with step+1 for dropout would make step N's dropout key identical
        # to step N+1's preprocess key (key reuse).
        k_pre = jax.random.fold_in(rng, state.step)
        k_geo, k_jit, k_drop = jax.random.split(k_pre, 3)
        B = images.shape[0]
        params_aug = aug.sample_geometry(k_geo, B, rotate_prob=0.0, flip_prob=0.0)
        scales = batch["scales"] * params_aug.scale_factor
        dec_centers = batch["decode_centers"]
        dec_scales = batch["decode_scales"] * params_aug.scale_factor

        crops = crop_batch(images, batch["centers"], scales, jnp.zeros(B), res=256)
        crops = aug.color_jitter_batch(k_jit, crops)

        hm_xy = keypoints_to_heatmap_space(
            jnp.nan_to_num(batch["keypoints"]), batch["centers"], scales,
            jnp.zeros(B),
        )
        targets = render_heatmaps(hm_xy, batch["valid"])  # (B, 16-H36M, 64, 64)
        targets = jnp.take(targets, jnp.asarray(FROM_H36M_TO_MPII), axis=-3)
        targets = jnp.transpose(targets, (0, 2, 3, 1))  # (B, H, W, J) MPII order

        def loss_fn(params):
            (heatmaps, _, pose3d), mut = self.model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                crops,
                dec_centers,
                dec_scales,
                mean_part,
                std_part,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": k_drop},
            )
            hm_loss = jnp.sum(
                jnp.mean(jnp.square(heatmaps - targets[None]), axis=(1, 2, 3, 4))
            )
            loss_3d = jnp.mean(jnp.square(pose3d - batch["s_norm"]))
            return hm_loss + self.lambda_3d * loss_3d, (
                mut["batch_stats"], hm_loss, loss_3d,
            )

        (loss, (new_stats, hm_loss, loss_3d)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_updates(self.tx, grads).replace(batch_stats=new_stats)
        return state, loss, hm_loss, loss_3d

    @property
    def train_step(self):
        if self._step is None:
            # Donated state: no full-state copy per dispatch (see
            # train/hourglass.py train_step).
            self._step = jax.jit(self._train_step, donate_argnums=0)
        return self._step
