"""bilinear_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework for the
Martinez-style 3D human-pose baseline stack.

Re-implements, TPU-first, the full capability surface of the reference
``nulledge/bilinear`` repo (see /root/reference and SURVEY.md):

- ``models``   : bilinear lifting MLP, stacked-hourglass 2D detector (both the
                 pre-activation re-implementation and the torch7-faithful
                 variant), and the fused end-to-end hourglass->lifting program.
- ``ops``      : geometry & image kernels — Gaussian heatmap rendering, affine
                 crop/rotate sampling, argmax/softargmax decode, flip-TTA,
                 joint-order remaps, augmentation RNG — all static-shape,
                 device-resident, fusable XLA/Pallas ops.
- ``data``     : H36M pickled-bin reader (+stat normalization), MPII .mat
                 parser (+90/10 split persistence), camera calibration
                 project/unproject, synthetic fixture generators.
- ``core``     : torch-parity numerics substrate (initializers, Adam/RMSprop,
                 global-norm clipping, cumulative BatchNorm) and jitted
                 train/eval step builders.
- ``parallel`` : device mesh construction and sharding rules (DP batch
                 sharding first-class; optional TP over hidden dims).
- ``train`` / ``eval`` : training loops and the MPJPE / PCKh@0.5 protocols.
- ``io``       : checkpoint save/resume (reference dir-layout contract),
                 logging, TensorBoard, heatmap visualization.
"""

__version__ = "0.1.0"

# Honor BILINEAR_TPU_PLATFORM at package-import time (duplicated from
# config.apply_platform_override, which stays the canonical entry point —
# importing config here would cycle through data.h36m). This must run before
# ANY submodule can touch jax: the environment's sitecustomize registers the
# TPU plugin and pins the platform through jax.config, so a subprocess's
# JAX_PLATFORMS env var cannot force CPU, and the first device-array creation
# anywhere (even an accidental module-level constant) would otherwise lock in
# the TPU backend before the CLIs' parse_config gets a chance to override.
import os as _os


def _apply_platform_override() -> None:
    platform = _os.environ.get("BILINEAR_TPU_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)


_apply_platform_override()
del _os, _apply_platform_override
