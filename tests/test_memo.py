"""utils/memo.py::memoize_factory — the compile-once guarantee behind the
eval entry points (eval/mpjpe.py, eval/pckh.py, eval/recalibrate.py)."""
import jax

from bilinear_tpu.utils.memo import memoize_factory


def test_memoize_factory_caches_by_value():
    calls = []

    @memoize_factory
    def build(a, b=1):
        calls.append((a, b))
        return object()

    first = build(1, b=2)
    assert build(1, b=2) is first
    assert build(1, b=3) is not first
    assert calls == [(1, 2), (1, 3)]


def test_memoize_factory_skips_unhashable():
    calls = []

    @memoize_factory
    def build(a):
        calls.append(1)
        return object()

    assert build([1, 2]) is not build([1, 2])  # no cache, no crash
    assert len(calls) == 2


def test_memoize_factory_keys_on_x64_mode():
    """The f64 parity harness toggles jax_enable_x64 in-process; a closure
    traced under the other mode must not be reused."""
    built = []

    @memoize_factory
    def build(a):
        built.append(bool(jax.config.jax_enable_x64))
        return object()

    old = bool(jax.config.jax_enable_x64)
    try:
        jax.config.update("jax_enable_x64", False)
        f32 = build(7)
        jax.config.update("jax_enable_x64", True)
        f64 = build(7)
        assert f32 is not f64
        jax.config.update("jax_enable_x64", False)
        assert build(7) is f32
    finally:
        jax.config.update("jax_enable_x64", old)
    assert built == [False, True]
