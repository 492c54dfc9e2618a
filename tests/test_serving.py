"""LiftingServer: normalization round-trip and checkpoint loading."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bilinear_tpu.data.h36m import Protocol, Task, load_h36m
from bilinear_tpu.data.synthetic import write_h36m_dataset
from bilinear_tpu.io.checkpoint import save_checkpoint
from bilinear_tpu.models.bilinear import BilinearUnit
from bilinear_tpu.serving import LiftingServer
from bilinear_tpu.train.bilinear import BilinearTrainer


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("Human3.6M"))
    write_h36m_dataset(d, n_train=64, n_valid=16)
    splits = load_h36m(d, Protocol.GT)
    run_dir = str(tmp_path_factory.mktemp("run"))
    trainer = BilinearTrainer(batch_size=16)
    state = trainer.init_state(jax.random.PRNGKey(0))
    save_checkpoint(run_dir + "/parameter", 3, state)
    return d, splits, run_dir, state


def test_lift_matches_model_plus_stats(setup):
    _, splits, run_dir, state = setup
    tr = splits[Task.Train]
    server, epoch = LiftingServer.from_run_dir(
        run_dir, tr, dtype=jnp.float32, interpret=True
    )
    assert epoch == 3

    kp = tr.raw_part[:10].reshape(10, 16, 2)
    mm = np.asarray(server.lift(kp))
    assert mm.shape == (10, 16, 3)

    # Oracle: flax model + manual normalization.
    model = BilinearUnit()
    x = (tr.raw_part[:10] - tr.mean_part) / tr.std_part
    ref = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(x), train=False,
    )
    ref_mm = (np.asarray(ref) * tr.std_s + tr.mean_s).reshape(10, 16, 3)
    np.testing.assert_allclose(mm, ref_mm, rtol=2e-3, atol=2e-2)


def test_lift_normalized_contract(setup):
    _, splits, run_dir, _ = setup
    server, _ = LiftingServer.from_run_dir(
        run_dir, splits[Task.Train], dtype=jnp.float32, interpret=True
    )
    out = server.lift_normalized(np.zeros((5, 32), np.float32))
    assert out.shape == (5, 48)
    assert np.isfinite(np.asarray(out)).all()
