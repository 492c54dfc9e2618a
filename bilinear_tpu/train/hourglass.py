"""Hourglass trainer — preprocess + forward + loss + RMSprop in one program.

The reference's hot loop (train_hourglass.py:63-95, SURVEY.md §3.3) spends
its time in DataLoader workers doing per-sample PIL geometry. Here the whole
per-batch pipeline is ONE jitted XLA program on device:

    canvas batch -> sample augment params -> affine crop+rotate -> flip
    -> color jitter -> Gaussian heatmap render -> hourglass forward
    -> sum-of-stacks MSE -> clip(1.0) -> RMSprop(2.5e-4)

Protocol parity with train_hourglass.py: loss = sum over stacks of the
per-stack mean MSE vs target heatmaps (:76), grad-clip max-norm 1 (:79),
RMSprop lr 2.5e-4 (model/hourglass_torch7.py:134), torch7 variant by default
(:45); step counter starts at 1, 10 epochs per invocation, per-epoch
checkpoints.

Augmentation parity (MPII/data.py:83-138): scale *= 2^rand(0.25); rotation
rand(30) w.p. 0.4; flip w.p. 0.4 with L/R joint swap, keypoint mirror about
center.x and rotate negation; ColorJitter(.3,.3,.3,.3); out-of-bounds joints
masked out of the heatmap target.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from bilinear_tpu.core.optim import hourglass_optimizer
from bilinear_tpu.core.state import TrainState
from bilinear_tpu.models.hourglass import StackedHourglass
from bilinear_tpu.models.hourglass_torch7 import MainModel
from bilinear_tpu.ops import augment as aug
from bilinear_tpu.ops.affine import crop_batch, hflip
from bilinear_tpu.ops.heatmap import keypoints_to_heatmap_space, render_heatmaps
from bilinear_tpu.ops.joints import MPII_FLIP_SWAP
from bilinear_tpu.parallel import mesh as mesh_lib


def make_model(variant: str = "torch7", dtype=jnp.float32,
               n_stacks=None, features=None, depth=None, fused=False,
               n_modules=None):
    """'torch7' = the network train_hourglass.py trains; 'preact' = the
    re-implementation train_hourglass_FT.py fine-tunes. Size overrides
    (None = reference defaults: 8 stacks, 256 features, depth 4) enable tiny
    smoke/integration runs of every CLI. ``fused`` routes the torch7
    ResModules through the whole-block Pallas kernels (same variable tree)."""
    if variant == "torch7":
        kw = {}
        if n_stacks is not None:
            kw["n_stacks"] = n_stacks
        if features is not None:
            kw["features"] = features
        if depth is not None:
            kw["depth"] = depth
        if n_modules is not None:
            kw["n_modules"] = n_modules
        return MainModel(dtype=dtype, fused=fused, **kw)
    if variant == "preact":
        kw = {}
        if n_stacks is not None:
            kw["stacks"] = n_stacks
        if features is not None:
            kw["out_channels"] = features
        if depth is not None:
            kw["compression_time"] = depth
        if n_modules is not None:
            kw["n_modules"] = n_modules
        return StackedHourglass(dtype=dtype, **kw)
    raise ValueError(f"unknown hourglass variant {variant!r}")


def preprocess_batch(
    rng: jax.Array,
    images,  # (B, C, C, 3) canvases
    centers,  # (B, 2) canvas-space
    scales,  # (B,)
    keypoints,  # (B, 16, 2) canvas-space, NaN where unannotated
    valid,  # (B, 16)
    augment: bool,
    res: int = 256,
    heatmap_size: int = 64,
    flip_prob: float = 0.4,  # MPII flips w.p. 0.4; H36M-FT never flips
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Device-side crop/augment/render. Returns (crops, target_heatmaps,
    positions). Fully static shapes; 'augment=False' is the eval path."""
    B = images.shape[0]
    if augment:
        k_geo, k_jit = jax.random.split(rng)
        params = aug.sample_geometry(k_geo, B, flip_prob=flip_prob)
        scales = scales * params.scale_factor
        rotate = params.rotate_deg
        flip = params.flip
    else:
        rotate = jnp.zeros(B)
        flip = jnp.zeros(B, bool)

    crops = crop_batch(images, centers, scales, rotate, res=res)

    if augment:
        crops = jnp.where(flip[:, None, None, None], hflip(crops), crops)
        mirrored = aug.flip_keypoints_x(keypoints, centers[:, 0:1], MPII_FLIP_SWAP)
        keypoints = jnp.where(flip[:, None, None], mirrored, keypoints)
        valid = jnp.where(flip[:, None], valid[:, MPII_FLIP_SWAP], valid)
        rotate = jnp.where(flip, -rotate, rotate)
        crops = aug.color_jitter_batch(k_jit, crops)

    hm_xy = keypoints_to_heatmap_space(
        jnp.nan_to_num(keypoints), centers, scales, rotate, size=heatmap_size
    )
    heatmaps = render_heatmaps(hm_xy, valid, size=heatmap_size)
    return crops, heatmaps, keypoints


class HourglassTrainer:
    def __init__(
        self,
        variant: str = "torch7",
        batch_size: int = 8,
        learning_rate: float = 2.5e-4,
        mesh=None,
        dtype=jnp.float32,
        canvas: int = 512,
        joint_remap=None,  # e.g. FROM_H36M_TO_MPII for the FT pipeline
        flip_prob: float = 0.4,  # 0.0 for H36M-FT (the reference never flips H36M)
        remat: bool = False,  # rematerialize per-stack activations (memory
        # for FLOPs — enables much larger batches, SURVEY.md HBM guidance)
        n_stacks=None,  # model size overrides, None = reference defaults
        features=None,
        depth=None,
        fused_blocks: bool = False,  # Pallas whole-block ResModules (torch7)
        n_modules=None,  # ResModules per hourglass slot (CONFIG.nModules)
    ):
        self.variant = variant
        self.batch_size = batch_size
        self.mesh = mesh
        self.canvas = canvas
        self.model = make_model(
            variant, dtype, n_stacks, features, depth, fused=fused_blocks,
            n_modules=n_modules,
        )
        self.tx = hourglass_optimizer(learning_rate)
        self.joint_remap = joint_remap
        self.flip_prob = flip_prob
        self.remat = remat
        self._step = None
        self._multi = None

    def init_state(self, rng: jax.Array) -> TrainState:
        variables = self.model.init(
            rng, jnp.zeros((1, 256, 256, 3), jnp.float32), train=False
        )
        return TrainState.create(
            variables["params"], variables["batch_stats"], self.tx
        )

    # ------------------------------------------------------------- step
    def _train_step(self, state: TrainState, batch: dict, rng: jax.Array):
        images = batch["images"]
        if self.mesh is not None:
            images = mesh_lib.constrain_batch(images, self.mesh)

        k_pre, k_drop = jax.random.split(jax.random.fold_in(rng, state.step))
        crops, targets, _ = preprocess_batch(
            k_pre,
            images,
            batch["centers"],
            batch["scales"],
            batch["keypoints"],
            batch["valid"],
            augment=True,
            flip_prob=self.flip_prob,
        )
        if self.joint_remap is not None:
            targets = jnp.take(targets, jnp.asarray(self.joint_remap), axis=-3)

        def forward(params, crops):
            return self.model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                crops,
                train=True,
                mutable=["batch_stats"],
            )

        if self.remat:
            forward = jax.checkpoint(forward)

        def loss_fn(params):
            out, mut = forward(params, crops)
            # (S, B, H, W, J) vs (B, J, H, W) targets
            tgt = jnp.transpose(targets, (0, 2, 3, 1))  # (B, H, W, J)
            loss = jnp.sum(
                jnp.mean(jnp.square(out - tgt[None]), axis=(1, 2, 3, 4))
            )  # sum over stacks of per-stack mean MSE (train_hourglass.py:76)
            return loss, mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_updates(self.tx, grads).replace(batch_stats=new_stats)
        return state, loss

    @property
    def train_step(self):
        if self._step is None:
            # Donating the state halves per-dispatch cost (measured 44.7 ->
            # 22.6 ms at batch 8): without it XLA copies the whole 25 M-param
            # state (params + RMSprop accumulator + BN stats) every call.
            # Callers must not reuse the state they pass in (fit_epoch
            # reassigns; checkpoint saves fetch to host synchronously first).
            self._step = jax.jit(self._train_step, donate_argnums=0)
        return self._step

    def _multi_step(self, state: TrainState, batches: dict, rng: jax.Array):
        """K steps in one program: lax.scan over stacked (K, B, ...) batches.
        Amortizes per-dispatch overhead (material on tunneled TPU setups
        where a dispatch costs ~an RTT) without changing any numerics —
        per-step dropout/augment keys still derive from fold_in(rng, step)."""

        def body(s, batch):
            s, loss = self._train_step(s, batch, rng)
            return s, loss

        return jax.lax.scan(body, state, batches)

    @property
    def multi_step(self):
        if self._multi is None:
            self._multi = jax.jit(self._multi_step, donate_argnums=0)
        return self._multi

    def fit_epoch(self, state: TrainState, pipeline, epoch: int, rng: jax.Array,
                  log_every: int = 0, logger=None, group: int = 1):
        """Run one epoch. ``group`` > 1 executes that many same-shaped batches
        per device dispatch (identical numerics, fewer host round-trips).

        The state passed in is DONATED to the device step and must not be
        reused by the caller afterwards; its buffers are explicitly deleted
        after the first dispatch so a stale alias fails loudly even on CPU
        (where donation is a no-op and the TPU-only invalidation would
        otherwise go untested)."""
        last_loss = None
        pending = []
        step_count = 0
        last_logged = 0

        # Multi-process DP: every process runs the same (seeded) pipeline, so
        # each one feeds its contiguous slice of every batch and the slices
        # assemble into one global array over the mesh (parallel/mesh.py::
        # global_batch). Single-process: plain host arrays, jit shards them.
        n_proc = jax.process_count()
        pid = jax.process_index()

        def as_dict(batch):
            d = {
                "images": batch.images,
                "centers": batch.centers,
                "scales": batch.scales,
                "keypoints": batch.keypoints,
                "valid": batch.valid,
            }
            if self.mesh is not None and n_proc > 1:
                local = {
                    k: v[(pid * v.shape[0]) // n_proc:
                         ((pid + 1) * v.shape[0]) // n_proc]
                    for k, v in d.items()
                }
                d = mesh_lib.global_batch(self.mesh, local)
            return d

        def flush_pending(state, pending):
            nonlocal last_loss, step_count, last_logged
            old_state = state
            if len(pending) > 1:
                stacked = jax.tree.map(
                    lambda *xs: jnp.stack(xs), *pending
                )
                state, losses = self.multi_step(state, stacked, rng)
                last_loss = losses[-1]
                step_count += len(pending)
            elif pending:
                state, last_loss = self.train_step(state, pending[0], rng)
                step_count += 1
            if pending and state is not old_state:
                # Enforce the donation contract (see train_step): on TPU the
                # dispatch above already invalidated these buffers.
                for leaf in jax.tree.leaves(old_state):
                    if isinstance(leaf, jax.Array) and not leaf.is_deleted():
                        leaf.delete()
            if log_every and logger and step_count - last_logged >= log_every:
                logger.info(
                    "epoch %d step %d loss %f", epoch, step_count, float(last_loss)
                )
                last_logged = step_count
            return state

        lead_shape = None
        for batch in pipeline.epoch(epoch):
            d = as_dict(batch)
            shape = d["images"].shape
            if lead_shape is not None and shape != lead_shape:
                state = flush_pending(state, pending)
                pending = []
            lead_shape = shape
            pending.append(d)
            if len(pending) >= group:
                state = flush_pending(state, pending)
                pending = []
        state = flush_pending(state, pending)
        return state, last_loss
