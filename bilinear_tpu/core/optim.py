"""Torch-semantics optimizers and gradient clipping, as optax transforms.

The reference trains with torch.optim.Adam (model/bilinear.py:60) and
torch.optim.RMSprop (model/hourglass.py:170, model/hourglass_torch7.py:134)
plus ``nn.utils.clip_grad_norm_(max_norm=1)`` (train_bilinear.py:81,
train_hourglass.py:79). optax's built-ins differ in small but
trajectory-affecting ways:

- optax.rmsprop puts eps INSIDE the sqrt; torch puts it outside.
- optax.clip_by_global_norm scales by max_norm/g; torch scales by
  max_norm/(g + 1e-6) and only when that coefficient is < 1.

We implement the torch formulas exactly so the rebuild can hit the 0.5 mm
MPJPE parity target (SURVEY.md §7 hard parts #2).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Callable, Union

import jax
import jax.numpy as jnp
import optax

Schedule = Callable[[jnp.ndarray], jnp.ndarray]
ScalarOrSchedule = Union[float, Schedule]


def _lr_value(learning_rate: ScalarOrSchedule, count: jnp.ndarray) -> jnp.ndarray:
    if callable(learning_rate):
        return learning_rate(count)
    return jnp.asarray(learning_rate)


class TorchAdamState(NamedTuple):
    count: jnp.ndarray  # int32, number of optimizer.step() calls so far
    mu: optax.Updates
    nu: optax.Updates


def torch_adam(
    learning_rate: ScalarOrSchedule,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """torch.optim.Adam:  p -= lr * m_hat / (sqrt(v_hat) + eps).

    Identical to optax.adam with eps_root=0, but spelled out so the state
    layout matches torch (exp_avg / exp_avg_sq / step) and can be
    round-tripped through checkpoints with torch-named leaves.
    """

    def init_fn(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return TorchAdamState(jnp.zeros([], jnp.int32), zeros, zeros)

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, updates)
        lr = _lr_value(learning_rate, count)

        def upd(m, v):
            # Bias correction in the leaf's own dtype (f32 normally; f64 when
            # running float64 parity checks) so it never injects f32 rounding.
            bc1 = 1 - b1 ** count.astype(m.dtype)
            bc2 = 1 - b2 ** count.astype(m.dtype)
            m_hat = m / bc1
            v_hat = v / bc2
            return -lr.astype(m.dtype) * m_hat / (jnp.sqrt(v_hat) + eps)

        return jax.tree.map(upd, mu, nu), TorchAdamState(count, mu, nu)

    return optax.GradientTransformation(init_fn, update_fn)


class TorchRMSpropState(NamedTuple):
    count: jnp.ndarray
    square_avg: optax.Updates


def torch_rmsprop(
    learning_rate: ScalarOrSchedule,
    alpha: float = 0.99,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """torch.optim.RMSprop (no momentum, not centered — the reference's
    configuration):  sq = alpha*sq + (1-alpha)*g^2 ; p -= lr * g/(sqrt(sq)+eps).

    Note eps sits OUTSIDE the sqrt (optax.rmsprop puts it inside).
    """

    def init_fn(params):
        return TorchRMSpropState(
            jnp.zeros([], jnp.int32), jax.tree.map(jnp.zeros_like, params)
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        sq = jax.tree.map(
            lambda s, g: alpha * s + (1 - alpha) * g * g, state.square_avg, updates
        )
        lr = _lr_value(learning_rate, count)
        out = jax.tree.map(lambda g, s: -lr * g / (jnp.sqrt(s) + eps), updates, sq)
        return out, TorchRMSpropState(count, sq)

    return optax.GradientTransformation(init_fn, update_fn)


def torch_clip_grad_norm(max_norm: float = 1.0) -> optax.GradientTransformation:
    """torch.nn.utils.clip_grad_norm_:
    coef = max_norm / (global_l2_norm + 1e-6); scale only if coef < 1."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        g_norm = optax.global_norm(updates)
        coef = jnp.minimum(max_norm / (g_norm + 1e-6), 1.0)
        return jax.tree.map(lambda g: g * coef, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def reference_bilinear_schedule(
    base_lr: float = 1.0e-3,
    decay: float = 0.96,
    period: int = 100_000,
) -> Schedule:
    """The reference's step-decay (util/config.py:19-23, train_bilinear.py:66-70):
    lr is RE-SET to base*decay^(step/period) only when step==1 or step%period==0,
    and held constant in between.  Closed-form: lr(step) = f(last fire <= step),
    fires at {1, period, 2*period, ...}.  Restart-invariant by construction.
    """

    def schedule(count: jnp.ndarray) -> jnp.ndarray:
        # jnp.result_type(float) is f32 normally and f64 under jax_enable_x64
        # (float64 parity harness) — identical HLO in the common case.
        step = jnp.maximum(count, 1).astype(jnp.result_type(float))
        last_fire = jnp.where(
            step >= period, jnp.floor(step / period) * period, 1.0
        )
        return base_lr * decay ** (last_fire / period)

    return schedule


def bilinear_optimizer(
    learning_rate: Optional[ScalarOrSchedule] = None, max_norm: float = 1.0
) -> optax.GradientTransformation:
    """clip(1.0) -> Adam(1e-3, reference step-decay). Mirrors
    train_bilinear.py:66-83."""
    if learning_rate is None:
        learning_rate = reference_bilinear_schedule()
    return optax.chain(torch_clip_grad_norm(max_norm), torch_adam(learning_rate))


def hourglass_optimizer(
    learning_rate: float = 2.5e-4, max_norm: float = 1.0
) -> optax.GradientTransformation:
    """clip(1.0) -> RMSprop(2.5e-4). Mirrors train_hourglass.py:79-81 and
    model/hourglass_torch7.py:134."""
    return optax.chain(torch_clip_grad_norm(max_norm), torch_rmsprop(learning_rate))
