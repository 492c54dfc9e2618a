"""End-to-end hourglass -> soft-argmax -> lifting, as ONE fused XLA program.

The reference sketches this composition but every path is broken: a
nonexistent ``Model`` package and ``load_model`` API, ``__forward__`` that
never dispatches, a hard-coded .cuda() and a per-joint Python loop in
softargmax (model/end2end.py:5-43, train_end2end.py, webcam.py — SURVEY.md
§2.3 'known defects'). This is the working rebuild of the documented intent,
TPU-first: the whole detector->decode->normalize->lift chain is a single
differentiable jitted program (BASELINE.json north star: 'end2end
hourglass->lifting path fused into one XLA program').

Pipeline per batch:
  images (B,256,256,3) -> hourglass (8 stacks) -> last-stack heatmaps
  -> softargmax with the x10 temperature (model/end2end.py:14)
  -> heatmap space -> image space (center/scale)

SPACE CONTRACT: ``centers``/``scales`` must describe the crop box in the
SAME coordinate space as ``mean_part``/``std_part`` were computed in —
for H36M bins that is ORIGINAL image space (H36M/data.py:57-59). Feeding
canvas-space boxes with original-space stats z-scores the lifter's input
from the wrong distribution (measured 488 mm vs 44 mm fused MPJPE before
round 5's fix; train/end2end.py carries decode_centers/decode_scales for
exactly this reason — the pipeline's canvas box crops, the original box
decodes).
  -> MPII->H36M joint remap with the nose slot deleted (H36M16_FROM_MPII)
  -> z-score with the H36M train-split part statistics
  -> BilinearUnit -> normalized 48-d 3D pose.

Submodules are named 'hourglass' and 'bilinear' so params/batch_stats from
independently trained checkpoints assemble directly into this module's
variable tree.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from bilinear_tpu.models.bilinear import BilinearUnit
from bilinear_tpu.models.hourglass import StackedHourglass
from bilinear_tpu.models.hourglass_torch7 import MainModel
from bilinear_tpu.ops.decode import decode_to_normalized


class End2End(nn.Module):
    variant: str = "torch7"
    temperature: float = 10.0
    dtype: jnp.dtype = jnp.float32
    # Detector size overrides (None = reference defaults) for small
    # integration/dryrun builds; and the fused whole-block kernel knob.
    n_stacks: int = None
    features: int = None
    depth: int = None
    fused: bool = False
    # "int8": eval-only dynamic-int8 detector convs (ops/int8.py), both
    # variants. The lifting stage keeps its own quantized kernel path
    # (LiftingServer); here it stays in self.dtype — it is ~0.1% of the
    # program's FLOPs.
    quantize: str = None

    def setup(self):
        kw = {"quantize": self.quantize}
        if self.variant == "torch7":
            if self.n_stacks is not None:
                kw["n_stacks"] = self.n_stacks
            if self.features is not None:
                kw["features"] = self.features
            if self.depth is not None:
                kw["depth"] = self.depth
            self.hourglass = MainModel(
                dtype=self.dtype, fused=self.fused, name="hourglass", **kw
            )
        else:
            if self.n_stacks is not None:
                kw["stacks"] = self.n_stacks
            if self.features is not None:
                kw["out_channels"] = self.features
            if self.depth is not None:
                kw["compression_time"] = self.depth
            self.hourglass = StackedHourglass(
                dtype=self.dtype, name="hourglass", **kw
            )
        self.bilinear = BilinearUnit(dtype=self.dtype, name="bilinear")

    def __call__(
        self,
        images,  # (B, 256, 256, 3)
        centers,  # (B, 2) crop centers in source-image space
        scales,  # (B,)
        mean_part,  # (32,) H36M train-split stats
        std_part,  # (32,)
        *,
        train: bool = False,
    ):
        """Returns (per-stack heatmaps (S,B,H,W,J), image-space 2D pose
        (B,16,2 MPII order), normalized 3D pose (B,48))."""
        heatmaps = self.hourglass(images, train=train)
        pose_img, normalized = decode_to_normalized(
            heatmaps[-1], centers, scales, mean_part, std_part,
            self.temperature,
        )
        pose_3d = self.bilinear(normalized, train=train)
        return heatmaps, pose_img, pose_3d


def assemble_variables(hourglass_vars, bilinear_vars):
    """Merge independently trained checkpoints into End2End's tree."""
    return {
        "params": {
            "hourglass": hourglass_vars["params"],
            "bilinear": bilinear_vars["params"],
        },
        "batch_stats": {
            "hourglass": hourglass_vars["batch_stats"],
            "bilinear": bilinear_vars["batch_stats"],
        },
    }
