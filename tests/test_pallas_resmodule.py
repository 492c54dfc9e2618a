"""Fused bottleneck-residual kernels (ops/pallas/resmodule.py) vs the flax
ResModule (models/hourglass_torch7.py) and autodiff.

Chain of evidence:
1. the pure-jnp formulation ``res_block_ref`` (rolls + masked matmuls)
   equals the flax ResModule to float tolerance (same math, different op
   order) — train AND eval mode, with and without the channel-change skip;
2. the Pallas kernels (interpret mode on CPU) equal ``res_block_ref``;
3. the custom_vjp backward kernel equals jax.grad through the reference.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bilinear_tpu.models.hourglass_torch7 import ResModule
from bilinear_tpu.ops.pallas.resmodule import (
    BatchStats,
    ResParams,
    res_block_eval,
    res_block_ref,
    res_block_train,
)

B, H, W = 2, 8, 8


def _make_case(ci, co, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, H, W, ci).astype(np.float32))
    module = ResModule(ci, co)
    variables = module.init(jax.random.PRNGKey(seed), x, train=False)
    return x, module, variables


def _to_resparams(variables, ci, co, noisy_bn=True, seed=1):
    """Flax ResModule variables -> flat ResParams (+ non-trivial BN params
    so affine/stat paths are actually exercised)."""
    p = variables["params"]
    rng = np.random.RandomState(seed)

    def vec(shape, base):
        if not noisy_bn:
            return jnp.asarray(np.full(shape, base, np.float32))
        return jnp.asarray(
            (base + 0.3 * rng.randn(*shape)).astype(np.float32)
        )

    half = co // 2
    bn = {
        "g1": vec((ci,), 1.0), "be1": vec((ci,), 0.0),
        "g2": vec((half,), 1.0), "be2": vec((half,), 0.0),
        "g3": vec((half,), 1.0), "be3": vec((half,), 0.0),
    }
    params = dict(
        w1=p["conv1"]["kernel"].reshape(ci, half),
        b1=p["conv1"]["bias"],
        w2=jnp.transpose(p["conv2"]["kernel"], (0, 1, 2, 3)).reshape(
            9, half, half
        ),
        b2=p["conv2"]["bias"],
        w3=p["conv3"]["kernel"].reshape(half, co),
        b3=p["conv3"]["bias"],
        **bn,
    )
    if ci != co:
        params["skip_w"] = p["conv_skip"]["kernel"].reshape(ci, co)
        params["skip_b"] = p["conv_skip"]["bias"]
    # Push the BN params into the flax variables too, so both sides use them.
    newv = jax.tree.map(lambda v: v, variables)
    newp = dict(newv["params"])
    for i, name in enumerate(["bn1", "bn2", "bn3"]):
        newp[name] = {
            "scale": params[f"g{i+1}"],
            "bias": params[f"be{i+1}"],
        }
    newv = {"params": newp, "batch_stats": newv["batch_stats"]}
    return ResParams(**params), newv


@pytest.mark.parametrize("ci,co", [(16, 16), (8, 16)])
def test_ref_matches_flax_resmodule_train(ci, co):
    x, module, variables = _make_case(ci, co)
    p, variables = _to_resparams(variables, ci, co)
    out_flax, mut = module.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    out_ref, stats = res_block_ref(x, p, train=True, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(out_ref), np.asarray(out_flax), rtol=1e-5, atol=1e-5
    )
    # The flax running stats after one step from zero-init with momentum 0.1:
    # ra_mean = 0.9*0 + 0.1*batch_mean.
    n = B * H * W
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["bn1"]["mean"]),
        0.1 * np.asarray(stats.m1), rtol=1e-5, atol=1e-6,
    )
    unbiased2 = np.asarray(stats.v2) * (n / (n - 1))
    np.testing.assert_allclose(
        np.asarray(mut["batch_stats"]["bn2"]["var"]),
        0.9 * 1.0 + 0.1 * unbiased2, rtol=1e-5, atol=1e-6,
    )


@pytest.mark.parametrize("ci,co", [(16, 16), (8, 16)])
def test_ref_matches_flax_resmodule_eval(ci, co):
    x, module, variables = _make_case(ci, co)
    p, variables = _to_resparams(variables, ci, co)
    # Non-trivial running stats.
    rng = np.random.RandomState(3)
    bs = {}
    for name, feat in [("bn1", ci), ("bn2", co // 2), ("bn3", co // 2)]:
        bs[name] = {
            "mean": jnp.asarray(rng.randn(feat).astype(np.float32) * 0.2),
            "var": jnp.asarray(
                (1.0 + 0.2 * rng.rand(feat)).astype(np.float32)
            ),
            "count": jnp.asarray(3, jnp.int32),
        }
    variables = {"params": variables["params"], "batch_stats": bs}
    out_flax = module.apply(variables, x, train=False)
    stats = BatchStats(
        bs["bn1"]["mean"], bs["bn1"]["var"],
        bs["bn2"]["mean"], bs["bn2"]["var"],
        bs["bn3"]["mean"], bs["bn3"]["var"],
    )
    out_ref, _ = res_block_ref(
        x, p, train=False, stats=stats, dtype=jnp.float32
    )
    np.testing.assert_allclose(
        np.asarray(out_ref), np.asarray(out_flax), rtol=1e-5, atol=1e-5
    )

    out_kernel = res_block_eval(
        x, p, stats, dtype=jnp.float32, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out_kernel), np.asarray(out_ref), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("ci,co", [(16, 16), (8, 16)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_kernel_forward_matches_ref(ci, co, dtype):
    x, module, variables = _make_case(ci, co)
    p, _ = _to_resparams(variables, ci, co)
    out_ref, stats_ref = res_block_ref(x, p, train=True, dtype=dtype)
    out_k, stats_k = res_block_train(x, p, dtype=dtype, interpret=True)
    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(
        np.asarray(out_k, np.float32), np.asarray(out_ref, np.float32),
        rtol=tol, atol=tol,
    )
    for a, b in zip(stats_k, stats_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=tol, atol=tol
        )


def test_fits_vmem_gate():
    """The dominant hourglass-body shapes fit the whole-block kernels; the
    128x128 stem block does not (measured 166 MB demanded on-chip) and must
    fall back to the standard conv path."""
    from bilinear_tpu.ops.pallas.resmodule import fits_vmem

    assert fits_vmem(8, 64, 64, 256, 128, 256, jnp.bfloat16)
    assert fits_vmem(8, 64, 64, 128, 128, 256, jnp.bfloat16)
    assert not fits_vmem(8, 128, 128, 64, 64, 128, jnp.bfloat16)
    # f32 doubles every buffer; the dominant body shape stops fitting.
    assert not fits_vmem(8, 64, 64, 256, 128, 256, jnp.float32)


def test_kernel_odd_batch_chunking():
    """N = 5*16*16 = 1280 is not divisible by the default 1024-row chunk;
    _chunk must halve until it divides (tail batches in fit_epoch hit this)
    and the kernel must still process EVERY row."""
    from bilinear_tpu.ops.pallas.resmodule import _chunk

    assert 1280 % _chunk(1280) == 0

    ci = co = 16
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(5, 16, 16, ci).astype(np.float32))
    module = ResModule(ci, co)
    variables = module.init(jax.random.PRNGKey(0), x, train=False)
    p, _ = _to_resparams(variables, ci, co)
    out_ref, stats_ref = res_block_ref(x, p, train=True, dtype=jnp.float32)
    out_k, stats_k = res_block_train(x, p, dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_ref), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(stats_k.m3), np.asarray(stats_ref.m3), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("ci,co", [(16, 16), (8, 16)])
def test_kernel_backward_matches_autodiff(ci, co):
    x, module, variables = _make_case(ci, co)
    p, _ = _to_resparams(variables, ci, co)
    rng = np.random.RandomState(7)
    probe = jnp.asarray(rng.randn(B, H, W, co).astype(np.float32))

    def loss_ref(x, p):
        out, _ = res_block_ref(x, p, train=True, dtype=jnp.float32)
        return jnp.sum(out * probe)

    def loss_kernel(x, p):
        out, _ = res_block_train(x, p, dtype=jnp.float32, interpret=True)
        return jnp.sum(out * probe)

    gx_ref, gp_ref = jax.grad(loss_ref, argnums=(0, 1))(x, p)
    gx_k, gp_k = jax.grad(loss_kernel, argnums=(0, 1))(x, p)

    np.testing.assert_allclose(
        np.asarray(gx_k), np.asarray(gx_ref), rtol=1e-4, atol=1e-4
    )
    for name in gp_ref._fields:
        a, b = getattr(gp_k, name), getattr(gp_ref, name)
        if a is None and b is None:
            continue
        np.testing.assert_allclose(
            np.asarray(a).reshape(np.asarray(b).shape), np.asarray(b),
            rtol=1e-4, atol=1e-4, err_msg=name,
        )
