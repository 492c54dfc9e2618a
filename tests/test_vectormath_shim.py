"""Real reference bins pickle vectormath.Vector2 centers; the shim must load
them (and support the full surface the reference's crop code touches)."""
import pickle

import numpy as np

from bilinear_tpu.data.h36m import Protocol, Task, _install_vectormath_shim, load_h36m
from bilinear_tpu.data.synthetic import make_h36m_bin


def test_bins_with_vector2_centers_load(tmp_path):
    _install_vectormath_shim()
    from vectormath import Vector2

    for task, n in [("train", 32), ("valid", 8)]:
        data = make_h36m_bin(n, seed=0 if task == "train" else 1)
        # Real bins store Vector2 objects, not arrays (SURVEY.md §8).
        data["center"] = [Vector2(c[0], c[1]) for c in data["center"]]
        with open(tmp_path / f"{task}_GT.bin", "wb") as f:
            pickle.dump(data, f)

    splits = load_h36m(str(tmp_path), Protocol.GT)
    tr = splits[Task.Train]
    assert tr.centers.shape == (32, 2)
    assert np.isfinite(tr.centers).all()


def test_shim_vector_surface():
    _install_vectormath_shim()
    from vectormath import Vector2

    v = Vector2(3.0, 4.0)
    assert v.x == 3.0 and v.y == 4.0
    assert v.length == 5.0
    vi = (v + 1).astype(int)
    assert isinstance(vi.x, int)
    # Pickle round-trip (what the bins actually exercise).
    v2 = pickle.loads(pickle.dumps(v))
    assert v2.x == 3.0
