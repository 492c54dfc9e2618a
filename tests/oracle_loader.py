"""Load reference modules/packages as in-process oracles.

Two tiers:

- ``load_reference_module``: one file, no package __init__ — enough for
  model/*.py and H36M/util.py (needs only the vectormath shim).
- ``load_reference_package``: the full H36M/MPII packages, whose Dataset
  classes import torchvision (not installed in this image). A minimal
  deterministic torchvision shim (ToTensor/Compose/functional.hflip real;
  ColorJitter an identity, so oracle comparisons are reproducible) makes
  the reference's OWN dataset code executable against synthetic fixtures —
  the strongest parity oracle available for the data layer.
"""
import importlib
import importlib.util
import sys

import numpy as np


def load_reference_module(relpath: str, name: str):
    from bilinear_tpu.data.h36m import _install_vectormath_shim

    _install_vectormath_shim()
    spec = importlib.util.spec_from_file_location(
        name, f"/root/reference/{relpath}"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def install_torchvision_shim() -> None:
    """Register a minimal ``torchvision`` good enough for the reference's
    dataset classes (H36M/data.py:7,61-68; MPII/data.py:7,32-35,115,137-138).

    ColorJitter is deliberately an IDENTITY: the oracle's job is checking
    geometry/normalization/heatmap semantics record-for-record, which needs
    the photometric augmentation disabled on both sides."""
    if "torchvision" in sys.modules:
        return
    import types

    import torch
    from PIL import Image

    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")
    functional = types.ModuleType("torchvision.transforms.functional")

    class ToTensor:
        def __call__(self, pic):
            arr = np.asarray(pic)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            t = torch.from_numpy(arr.transpose(2, 0, 1).copy())
            return t.float().div(255.0)

    class Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    class ColorJitter:
        def __init__(self, *args, **kwargs):
            pass

        def __call__(self, img):
            return img

    def hflip(img):
        return img.transpose(Image.FLIP_LEFT_RIGHT)

    transforms.ToTensor = ToTensor
    transforms.Compose = Compose
    transforms.ColorJitter = ColorJitter
    transforms.functional = functional
    functional.hflip = hflip
    tv.transforms = transforms
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.functional"] = functional


def load_reference_package(name: str):
    """Import the reference's ``H36M`` or ``MPII`` package (with its real
    relative-import structure) under the shims. Returns the package."""
    from bilinear_tpu.data.h36m import _install_vectormath_shim

    _install_vectormath_shim()
    install_torchvision_shim()
    if "skimage" not in sys.modules:
        # MPII/util.py:3 imports skimage but never uses it — empty shim.
        import types

        sk = types.ModuleType("skimage")
        sk.transform = types.ModuleType("skimage.transform")
        sys.modules["skimage"] = sk
        sys.modules["skimage.transform"] = sk.transform
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    return importlib.import_module(name)
