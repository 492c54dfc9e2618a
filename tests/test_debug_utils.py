"""utils/debug.py debug_mode + utils/profiling.Timer — the two SURVEY §5
auxiliary hooks (sanitizer, step-time accounting) exercised directly."""
import time

import jax
import jax.numpy as jnp
import pytest

from bilinear_tpu.utils.debug import debug_mode
from bilinear_tpu.utils.profiling import Timer


def test_debug_mode_traps_first_nan_op():
    """jax_debug_nans re-runs the jitted program op-by-op and raises at the
    op that produced the NaN (the JAX-native 'sanitizer', SURVEY.md §5)."""
    with pytest.raises(FloatingPointError, match="nan"):
        with debug_mode():
            jax.jit(lambda x: jnp.log(x))(jnp.float32(-1.0)).block_until_ready()


def test_debug_mode_restores_config():
    healthy = jax.jit(lambda x: x * 2.0)
    with debug_mode():
        assert float(healthy(jnp.float32(3.0))) == 6.0
    # Outside the context NaNs flow again (config restored).
    y = jax.jit(lambda x: jnp.log(x))(jnp.float32(-1.0))
    assert bool(jnp.isnan(y))


def test_debug_mode_disable_jit():
    with debug_mode(nans=False, disable_jit=True):
        # Under disable_jit the traced function sees concrete values.
        seen = []
        jax.jit(lambda x: seen.append(float(x)) or x)(jnp.float32(7.0))
        assert seen == [7.0]


def test_timer_accumulates_and_forces_fetch():
    t = Timer()
    t.start()
    time.sleep(0.01)
    t.stop(result={"x": jnp.ones(4)}, items=8)
    t.start()
    time.sleep(0.01)
    t.stop(items=8)
    assert t.steps == 2 and t.items == 16
    assert t.elapsed >= 0.02
    assert 0 < t.items_per_sec <= 16 / t.elapsed + 1e-6
    assert t.steps_per_sec == pytest.approx(t.items_per_sec / 8)
