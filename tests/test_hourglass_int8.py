"""Int8-quantized hourglass eval path (ops/int8.py + MainModel(quantize)):

- the quantized model's variable tree is byte-identical to the standard
  model's (same checkpoints load; serving needs no conversion step);
- train mode ignores the knob bitwise (quantization is eval/serving-only);
- quantization error is accuracy-gated on a briefly-trained detector
  (realistic weight/activation ranges): heatmaps move by well under 1% of
  their dynamic range and the soft-argmax decode by a fraction of a heatmap
  pixel (measured: mean 0.036% of range / 0.17 px on this fixture);
- End2EndServer(quantize="int8") serves it end-to-end.

The quantized convs are the body of the reference's ResModule
(/root/reference/model/hourglass_torch7.py:14-39); the reference has no
quantized mode anywhere.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bilinear_tpu.data.h36m import Task
from bilinear_tpu.data.mpii import MPIIAnnotations
from bilinear_tpu.data.pipeline import MPIIHostPipeline
from bilinear_tpu.data.synthetic import write_mpii_dataset
from bilinear_tpu.models.hourglass_torch7 import MainModel
from bilinear_tpu.ops.decode import softargmax
from bilinear_tpu.train.hourglass import HourglassTrainer

KW = dict(n_stacks=1, features=16, depth=2)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """A briefly-trained tiny detector — quantization error at random init
    is not representative of serving."""
    root = str(tmp_path_factory.mktemp("MPII"))
    write_mpii_dataset(root, n_train_images=8, n_test_images=1)
    MPIIAnnotations(root, Task.Train, split_seed=0)
    anns = MPIIAnnotations(root, Task.Train)
    pipe = MPIIHostPipeline(anns, batch_size=4, canvas=128)

    t = HourglassTrainer(batch_size=4, canvas=128)
    t.model = MainModel(**KW)
    s = t.init_state(jax.random.PRNGKey(0))
    for e in range(3):
        s, _ = t.fit_epoch(s, pipe, e, jax.random.PRNGKey(e), group=1)
    return {"params": s.params, "batch_stats": s.batch_stats}


def test_variable_tree_identical():
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v_f = MainModel(**KW).init(jax.random.PRNGKey(0), x, train=False)
    v_q = MainModel(quantize="int8", **KW).init(
        jax.random.PRNGKey(0), x, train=False
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        v_f, v_q,
    )


def test_train_mode_ignores_quantize(trained):
    x = jnp.asarray(np.random.RandomState(1).rand(2, 256, 256, 3), jnp.float32)
    y_f, st_f = MainModel(**KW).apply(
        trained, x, train=True, mutable=["batch_stats"]
    )
    y_q, st_q = MainModel(quantize="int8", **KW).apply(
        trained, x, train=True, mutable=["batch_stats"]
    )
    np.testing.assert_array_equal(np.asarray(y_f), np.asarray(y_q))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        st_f, st_q,
    )


def test_eval_accuracy_within_gates(trained):
    x = jnp.asarray(np.random.RandomState(5).rand(4, 256, 256, 3), jnp.float32)
    hm_f = np.asarray(MainModel(**KW).apply(trained, x, train=False)[-1])
    hm_q = np.asarray(
        MainModel(quantize="int8", **KW).apply(trained, x, train=False)[-1]
    )
    rng = hm_f.max() - hm_f.min()
    # measured on this fixture: mean 3.6e-4 (0.036% of range), max 0.31%.
    assert np.abs(hm_q - hm_f).mean() < 0.01 * rng
    assert np.abs(hm_q - hm_f).max() < 0.05 * rng

    # decode movement in heatmap pixels (the quantity PCKh depends on);
    # measured mean 0.17 px, max 0.95 px on this barely-trained fixture.
    def decode(hm):
        return np.asarray(
            softargmax(jnp.transpose(jnp.asarray(hm), (0, 3, 1, 2)), 10.0)
        )

    shift = np.linalg.norm(decode(hm_f) - decode(hm_q), axis=-1)
    assert shift.mean() < 0.5
    assert shift.max() < 2.0


def test_preact_variant_int8():
    """The FT family (StackedHourglass) carries the same knob: identical
    tree, bitwise train mode, small eval movement (measured 0.11% of output
    scale at random init)."""
    from bilinear_tpu.models.hourglass import StackedHourglass

    kw = dict(stacks=1, out_channels=16, compression_time=2)
    m_f = StackedHourglass(**kw)
    m_q = StackedHourglass(quantize="int8", **kw)
    x = jnp.asarray(
        np.random.RandomState(0).rand(2, 128, 128, 3), jnp.float32
    )
    v = m_f.init(jax.random.PRNGKey(0), x, train=False)
    v_q = m_q.init(jax.random.PRNGKey(0), x, train=False)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        v, v_q,
    )
    y_f = np.asarray(m_f.apply(v, x, train=False))
    y_q = np.asarray(m_q.apply(v, x, train=False))
    assert np.abs(y_q - y_f).mean() < 0.02 * np.abs(y_f).mean()
    y_t, _ = m_q.apply(v, x, train=True, mutable=["batch_stats"])
    y_t0, _ = m_f.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(y_t), np.asarray(y_t0))


def test_end2end_server_int8(trained):
    from bilinear_tpu.serving import End2EndServer

    rs = np.random.RandomState(0)
    mean_p, std_p = rs.randn(32).astype(np.float32), np.ones(32, np.float32)
    mean_s, std_s = np.zeros(48, np.float32), np.ones(48, np.float32)

    def server(quantize):
        from bilinear_tpu.models.end2end import End2End, assemble_variables
        from bilinear_tpu.models.bilinear import BilinearUnit

        bl = BilinearUnit()
        bv = bl.init(jax.random.PRNGKey(1), jnp.zeros((1, 32)), train=False)
        return End2EndServer(
            assemble_variables(trained, bv), mean_p, std_p, mean_s, std_s,
            dtype=jnp.float32, batch_sizes=(1, 4), model_kw=KW,
            quantize=quantize,
        )

    frames = rs.rand(3, 256, 256, 3).astype(np.float32)
    p2_f, mm_f = server(None).predict(frames)
    p2_q, mm_q = server("int8").predict(frames)
    assert p2_q.shape == (3, 16, 2) and mm_q.shape == (3, 16, 3)
    # image-space 2D decode moves by a fraction of a source pixel
    # (heatmap px * 200 * scale / 64 = 4 src px per hm px at scale 1.28).
    assert np.linalg.norm(p2_q - p2_f, axis=-1).mean() < 2.0
    # the 3D head is fed nearly identical inputs; outputs track accordingly.
    assert np.abs(mm_q - mm_f).mean() < 0.1 * (np.abs(mm_f).mean() + 1e-9)

    with pytest.raises(ValueError):
        server("int4")
