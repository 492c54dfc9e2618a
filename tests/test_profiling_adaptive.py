"""adaptive_diff robustness: the K-differenced timing harness must never
return a non-positive per-iteration time, even when concurrent traffic on
the chip makes the differenced signal vanish or go negative (observed live:
the int8 bench line printed -2.9 M poses/sec while a budget run shared the
TPU). These tests drive the pure control logic with a scripted clock — no
real timing, so they are immune to load on the 1-core CI box."""
import pytest

from bilinear_tpu.utils import profiling


class _Clock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def _loop_factory(clock, per_call):
    """loop(k) -> zero-arg callable advancing the scripted clock by
    per_call(k) seconds per invocation (the shape adaptive_diff expects)."""

    def loop(k):
        def run():
            clock.t += per_call(k)
            return 0.0

        return run

    return loop


@pytest.fixture
def clock(monkeypatch):
    c = _Clock()
    monkeypatch.setattr(profiling.time, "perf_counter", c)
    return c


def test_clean_signal_returns_exact_difference(clock):
    # Ideal machine: loop(k) takes exactly k milliseconds -> per-iteration
    # time is 1 ms, recovered exactly.
    loop = _loop_factory(clock, lambda k: 0.001 * k)
    t = profiling.adaptive_diff(loop, 2, 24, reps=1, target_s=0.01)
    assert t == pytest.approx(0.001)


def test_vanishing_difference_falls_back_positive(clock):
    # Pathological contention: every loop takes the same wall time no
    # matter k (device serialized behind another tenant). The difference is
    # exactly 0; the amortized fallback must still return a positive time.
    loop = _loop_factory(clock, lambda k: 1.0)
    t = profiling.adaptive_diff(loop, 2, 24, reps=1, target_s=0.01)
    assert t > 0


def test_negative_difference_falls_back_positive(clock):
    # Worse: the longer loop measures FASTER than the short one (RTT jitter
    # dwarfing the signal — the live failure mode). Must never surface as a
    # negative per-iteration time / negative throughput.
    loop = _loop_factory(clock, lambda k: 2.0 if k == 2 else 1.0)
    t = profiling.adaptive_diff(loop, 2, 24, reps=1, target_s=0.01)
    assert t > 0


def test_undersized_signal_escalates_k2(clock):
    # Signal below target_s: k2 must be re-sized upward until
    # (k2 - k1) * t >= target_s, and the estimate stays exact.
    seen = []

    def per_call(k):
        seen.append(k)
        return 1e-6 * k + 0.05  # 1 us/iter under a 50 ms fixed RTT

    t = profiling.adaptive_diff(
        _loop_factory(clock, per_call), 2, 24, reps=1, target_s=0.5
    )
    assert t == pytest.approx(1e-6)
    assert max(seen) - 2 >= 0.5 / 1e-6 * 0.999  # escalated to >= target span
