"""Load single reference modules as oracles without triggering package
__init__ imports (the reference's packages import torchvision, which is not
installed in this image)."""
import importlib.util
import sys


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
