"""Protocol plumbing: SH and SH+FT bins flow through conversion, loading and
training exactly like GT (the reference's three-protocol story,
H36M/protocol.py:1-4, util/config.py:24)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bilinear_tpu.data.h36m import Protocol, Task, load_h36m
from bilinear_tpu.data.sh_convert import convert_gt_to_sh
from bilinear_tpu.data.synthetic import write_h36m_dataset
from bilinear_tpu.models.hourglass_torch7 import MainModel
from bilinear_tpu.train.bilinear import BilinearTrainer
from bilinear_tpu.train.hourglass import HourglassTrainer


@pytest.fixture(scope="module")
def h36m_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("Human3.6M")
    return write_h36m_dataset(str(d), n_train=32, n_valid=8, with_images=True)


def test_sh_ft_protocol_naming_and_lifting(h36m_dir):
    """--protocol-out 'SH+FT' writes {task}_SH+FT.bin, loadable via
    Protocol.SH_FT and trainable."""
    trainer = HourglassTrainer(batch_size=4, canvas=256)
    trainer.model = MainModel(n_stacks=1, features=8, depth=1)
    state = trainer.init_state(jax.random.PRNGKey(0))
    written = convert_gt_to_sh(
        trainer.model,
        {"params": state.params, "batch_stats": state.batch_stats},
        h36m_dir,
        protocol_out=Protocol.SH_FT,
        batch_size=4,
        canvas=256,
    )
    assert written[Task.Train].endswith("train_SH+FT.bin")
    assert os.path.exists(os.path.join(h36m_dir, "valid_SH+FT.bin"))

    splits = load_h36m(h36m_dir, Protocol.SH_FT)
    tr = splits[Task.Train]
    bt = BilinearTrainer(batch_size=8)
    st = bt.init_state(jax.random.PRNGKey(0))
    st, losses = bt.train_epoch(
        st, jnp.asarray(tr.part), jnp.asarray(tr.s), jax.random.PRNGKey(1)
    )
    assert np.isfinite(np.asarray(losses)).all()
