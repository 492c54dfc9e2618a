"""Oracle tests: torch-parity optimizers / clipping vs torch.optim itself
(SURVEY.md §7 hard parts #2)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from bilinear_tpu.core.optim import (
    reference_bilinear_schedule,
    torch_adam,
    torch_clip_grad_norm,
    torch_rmsprop,
)


def _torch_params(shapes, seed=0):
    g = torch.Generator().manual_seed(seed)
    return [torch.randn(s, generator=g, requires_grad=True) for s in shapes]


def _run_pair(opt_jax, opt_torch_fn, shapes, n_steps=5, seed=0):
    tp = _torch_params(shapes, seed)
    topt = opt_torch_fn(tp)
    # NB: .copy() matters — on CPU jnp.asarray aliases the torch buffer,
    # and the torch optimizer mutates params in place.
    jp = [jnp.asarray(p.detach().numpy().copy()) for p in tp]
    state = opt_jax.init(jp)

    g = torch.Generator().manual_seed(seed + 1)
    for _ in range(n_steps):
        grads_t = [torch.randn(s, generator=g) for s in shapes]
        topt.zero_grad()
        for p, gr in zip(tp, grads_t):
            p.grad = gr.clone()
        topt.step()

        grads_j = [jnp.asarray(gt.numpy()) for gt in grads_t]
        updates, state = opt_jax.update(grads_j, state, jp)
        jp = jax.tree.map(lambda p, u: p + u, jp, updates)

    for p_t, p_j in zip(tp, jp):
        np.testing.assert_allclose(
            p_t.detach().numpy(), np.asarray(p_j), rtol=1e-5, atol=1e-6
        )


SHAPES = [(4, 7), (7,), (3, 2, 5)]


def test_adam_matches_torch():
    _run_pair(
        torch_adam(1e-3),
        lambda p: torch.optim.Adam(p, lr=1e-3),
        SHAPES,
        n_steps=7,
    )


def test_adam_large_lr_matches_torch():
    _run_pair(
        torch_adam(0.1, b1=0.8, b2=0.95, eps=1e-6),
        lambda p: torch.optim.Adam(p, lr=0.1, betas=(0.8, 0.95), eps=1e-6),
        SHAPES,
    )


def test_rmsprop_matches_torch():
    _run_pair(
        torch_rmsprop(2.5e-4),
        lambda p: torch.optim.RMSprop(p, lr=2.5e-4),
        SHAPES,
        n_steps=7,
    )


def test_clip_grad_norm_matches_torch():
    g = torch.Generator().manual_seed(3)
    grads_t = [10 * torch.randn(s, generator=g) for s in SHAPES]
    params_t = [torch.zeros(s, requires_grad=True) for s in SHAPES]
    for p, gr in zip(params_t, grads_t):
        p.grad = gr.clone()
    torch.nn.utils.clip_grad_norm_(params_t, max_norm=1.0)

    clip = torch_clip_grad_norm(1.0)
    grads_j = [jnp.asarray(gt.numpy()) for gt in grads_t]
    clipped, _ = clip.update(grads_j, clip.init(grads_j))
    for p_t, g_j in zip(params_t, clipped):
        np.testing.assert_allclose(p_t.grad.numpy(), np.asarray(g_j), rtol=1e-6)


def test_clip_noop_when_small():
    clip = torch_clip_grad_norm(1.0)
    grads = [jnp.asarray([0.01, 0.02])]
    out, _ = clip.update(grads, clip.init(grads))
    np.testing.assert_allclose(np.asarray(out[0]), [0.01, 0.02], rtol=1e-6)


def test_reference_schedule_semantics():
    """lr is re-set only at step 1 and multiples of 100k, held in between
    (train_bilinear.py:66-70, util/config.py:19-23)."""
    sched = reference_bilinear_schedule()
    lr1 = float(sched(jnp.asarray(1)))
    assert lr1 == pytest.approx(1e-3 * 0.96 ** (1 / 100000), rel=1e-5)
    # Held constant until the next fire.
    assert float(sched(jnp.asarray(99_999))) == pytest.approx(lr1, rel=1e-6)
    assert float(sched(jnp.asarray(100_000))) == pytest.approx(1e-3 * 0.96, rel=1e-5)
    assert float(sched(jnp.asarray(150_000))) == pytest.approx(1e-3 * 0.96, rel=1e-5)
    assert float(sched(jnp.asarray(200_000))) == pytest.approx(1e-3 * 0.96**2, rel=1e-5)
