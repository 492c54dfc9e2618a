"""Pallas TPU kernels: the torch7 bottleneck-residual block fused end-to-end.

The block (reference /root/reference/model/hourglass_torch7.py:14-39) is

    skip = conv_skip(x) if Cin != Cout else x
    a1 = relu(bn1(x));  h1 = conv1x1(a1)         # Cin  -> Ch (= Cout/2)
    a2 = relu(bn2(h1)); h2 = conv3x3(a2)         # Ch   -> Ch
    a3 = relu(bn3(h2)); out = skip + conv1x1(a3) # Ch   -> Cout

and it is the hourglass's entire body: ~13 of them per stack x 8 stacks.
Trained by XLA one conv at a time, every intermediate round-trips HBM and the
step is bandwidth-bound at 26-31% MFU against a 64% forward
(benchmarks/RESULTS.md 'MFU accounting'). These kernels keep the WHOLE block
VMEM-resident for the whole batch — HBM touches only x once and out once
(plus parameters), in forward AND backward.

Design (TPU v5e: ~128 MB VMEM/core, explicit vmem_limit_bytes — the default
scoped limit is 16 MB):

- Everything lives flattened as (N, C), N = B*H*W: matmul-native for the
  1x1 convs and for BN reductions.
- The 3x3 conv is 9 (roll, mask, matmul) steps in flat space: tap (dy, dx)
  of output q reads flat position q + dy*W + dx; a circular roll aligns it
  and an (N, 1) validity mask (row/column/image bounds from iota) zeroes
  taps that crossed an edge — wrap-around rows are always masked, so the
  roll's circularity is harmless. No padding, no relayout of 4D tiles.
- Train mode computes the BN batch statistics in-kernel (mean + biased var,
  f32, matching core/norm.py::TorchBatchNorm) and returns them so the module
  can update running stats (momentum or cumulative) outside.
- Backward (custom_vjp) recomputes activations from x and the saved batch
  stats (VMEM-resident recompute is ~free; the model is bandwidth-bound) and
  emits grads for x and every parameter in one kernel.

Numerical contract vs the XLA path (models/hourglass_torch7.py::ResModule):
same math in the same precision policy — BN arithmetic in f32 on the
conv outputs after their cast to ``dtype``, matmuls with f32 accumulation,
activations stored in ``dtype``. Reduction orders differ (one big kernel vs
many fused ops), so equality is to float tolerance, not bitwise; the pure-jnp
reference implementation ``res_block_ref`` (identical formulation) is the
oracle for kernel unit tests, and is itself tested against ResModule.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-5
TAPS = tuple((dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1))


class ResParams(NamedTuple):
    """Flat parameter bundle. 1x1 kernels are (Cin, Cout) matrices; the 3x3
    kernel is (9, Ch, Ch) in TAPS order. skip_w/skip_b are None when
    Cin == Cout (identity skip — the reference allocates conv_skip anyway
    but never applies it, hourglass_torch7.py:79)."""

    w1: jax.Array
    b1: jax.Array
    w2: jax.Array
    b2: jax.Array
    w3: jax.Array
    b3: jax.Array
    g1: jax.Array
    be1: jax.Array
    g2: jax.Array
    be2: jax.Array
    g3: jax.Array
    be3: jax.Array
    skip_w: Optional[jax.Array] = None
    skip_b: Optional[jax.Array] = None


class BatchStats(NamedTuple):
    m1: jax.Array
    v1: jax.Array
    m2: jax.Array
    v2: jax.Array
    m3: jax.Array
    v3: jax.Array


def _tap_masks(n: int, h: int, w: int):
    """(N, 1) validity masks for each 3x3 tap in flat space."""
    q = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    x = q % w
    y = (q // w) % h
    masks = []
    for dy, dx in TAPS:
        masks.append(
            (x + dx >= 0) & (x + dx < w) & (y + dy >= 0) & (y + dy < h)
        )
    return masks


def _rev_tap_masks(n: int, h: int, w: int):
    """Masks for the data-gradient taps: g_a2[p] uses tap t iff position
    p - (dy*W + dx) exists AND saw p as a valid tap, i.e. (x-dx, y-dy) is
    in bounds."""
    q = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    x = q % w
    y = (q // w) % h
    masks = []
    for dy, dx in TAPS:
        masks.append(
            (x - dx >= 0) & (x - dx < w) & (y - dy >= 0) & (y - dy < h)
        )
    return masks


def _roll(a, shift):
    """Circular roll along axis 0 with STATIC shift; jnp.roll semantics
    (out[i] = a[i-shift]). Implemented as two static slices + concat so the
    same code runs in plain jnp, pallas interpret mode, and Mosaic
    (pltpu.roll has no evaluation rule outside compiled kernels)."""
    n = a.shape[0]
    s = int(shift) % n
    if s == 0:
        return a
    return jnp.concatenate([a[n - s:], a[: n - s]], axis=0)


def _bn_fwd(h, gamma, beta, m, v):
    """BN + ReLU given stats, in promote(f32, dtype) like TorchBatchNorm;
    returns (activation, pre-relu)."""
    hf = h.astype(jnp.promote_types(jnp.float32, h.dtype))
    hhat = (hf - m) * jax.lax.rsqrt(v + EPS)
    y = hhat * gamma + beta
    return jnp.maximum(y, 0.0), y


def _stats(h):
    """Batch mean + biased variance over axis 0 in promote(f32, dtype),
    keepdims (1, C) — the TorchBatchNorm train-mode formulas
    (core/norm.py:59-60)."""
    hf = h.astype(jnp.promote_types(jnp.float32, h.dtype))
    m = jnp.mean(hf, axis=0, keepdims=True)
    v = jnp.mean(jnp.square(hf - m), axis=0, keepdims=True)
    return m, v


def _conv3x3(a2, w2, masks, dtype):
    """Sum of 9 masked-roll matmuls; f32 accumulation, W = row width."""
    n = a2.shape[0]
    acc = jnp.zeros((n, w2.shape[-1]), jnp.float32)
    for t, (dy, dx) in enumerate(TAPS):
        delta = dy * masks["w"] + dx
        shifted = _roll(a2, -delta)
        masked = jnp.where(masks["fwd"][t], shifted, jnp.zeros_like(shifted))
        acc += jnp.dot(
            masked.astype(dtype), w2[t], preferred_element_type=jnp.float32
        )
    return acc


def _bn_bwd(g_act, y_pre, hhat, gamma, rs, n):
    """Full train-mode BN+ReLU backward: returns (g_input f32, dgamma, dbeta)
    where g_input is the grad wrt the BN's input (batch-stat coupling
    included)."""
    gy = jnp.where(y_pre > 0.0, g_act, jnp.zeros_like(g_act))
    dgamma = jnp.sum(gy * hhat, axis=0, keepdims=True)
    dbeta = jnp.sum(gy, axis=0, keepdims=True)
    ghat = gy * gamma
    gh = (rs / n) * (
        n * ghat
        - jnp.sum(ghat, axis=0, keepdims=True)
        - hhat * jnp.sum(ghat * hhat, axis=0, keepdims=True)
    )
    return gh, dgamma, dbeta


# --------------------------------------------------------------------------
# Pure-jnp reference implementation (identical formulation; oracle for the
# kernels, fallback path on CPU, and the init-time implementation).
# --------------------------------------------------------------------------

def res_block_ref(
    x4d: jax.Array,
    p: ResParams,
    *,
    train: bool,
    stats: Optional[BatchStats] = None,
    dtype=jnp.bfloat16,
) -> Tuple[jax.Array, BatchStats]:
    """(B, H, W, Cin) -> ((B, H, W, Cout), batch stats). In train mode stats
    are computed from the batch; in eval mode pass the running stats."""
    b, h, w, ci = x4d.shape
    n = b * h * w
    x = x4d.reshape(n, ci).astype(dtype)

    fwd_masks = {"fwd": _tap_masks(n, h, w), "w": w}

    if train:
        m1, v1 = _stats(x)
    else:
        m1, v1 = stats.m1, stats.v1
    a1, _ = _bn_fwd(x, p.g1, p.be1, m1, v1)
    h1 = (
        jnp.dot(a1.astype(dtype), p.w1, preferred_element_type=jnp.float32)
    ).astype(dtype) + p.b1.astype(dtype)

    if train:
        m2, v2 = _stats(h1)
    else:
        m2, v2 = stats.m2, stats.v2
    a2f, _ = _bn_fwd(h1, p.g2, p.be2, m2, v2)
    a2 = a2f.astype(dtype)
    h2 = (_conv3x3(a2, p.w2, fwd_masks, dtype)).astype(dtype) + p.b2.astype(
        dtype
    )

    if train:
        m3, v3 = _stats(h2)
    else:
        m3, v3 = stats.m3, stats.v3
    a3, _ = _bn_fwd(h2, p.g3, p.be3, m3, v3)
    h3 = (
        jnp.dot(
            a3.astype(dtype), p.w3, preferred_element_type=jnp.float32
        )
    ).astype(dtype) + p.b3.astype(dtype)

    if p.skip_w is not None:
        skip = (
            jnp.dot(x, p.skip_w, preferred_element_type=jnp.float32)
        ).astype(dtype) + p.skip_b.astype(dtype)
    else:
        skip = x
    out = (skip + h3).reshape(b, h, w, -1)
    stats = BatchStats(
        *[jnp.asarray(s).reshape(-1) for s in (m1, v1, m2, v2, m3, v3)]
    )
    return out, stats


# --------------------------------------------------------------------------
# Kernels
# --------------------------------------------------------------------------

def _fwd_kernel_body(refs, *, shape, dtype, train):
    """Shared forward body. ``refs`` is a dict of pl.Ref by name."""
    b, h, w, ci, ch, co, has_skip = shape
    n = b * h * w
    x = refs["x"][:]
    masks = {"fwd": _tap_masks(n, h, w), "w": w}

    def stats_of(t, name_m, name_v):
        if train:
            m, v = _stats(t)
            refs[name_m][:] = m
            refs[name_v][:] = v
            return m, v
        return refs[name_m][:], refs[name_v][:]

    m1, v1 = stats_of(x, "m1", "v1")
    a1, _ = _bn_fwd(x, refs["g1"][:], refs["be1"][:], m1, v1)
    refs["h1"][:] = (
        jnp.dot(
            a1.astype(dtype), refs["w1"][:], preferred_element_type=jnp.float32
        )
    ).astype(dtype) + refs["b1"][:].astype(dtype)

    m2, v2 = stats_of(refs["h1"][:], "m2", "v2")
    a2f, _ = _bn_fwd(refs["h1"][:], refs["g2"][:], refs["be2"][:], m2, v2)
    refs["a2"][:] = a2f.astype(dtype)
    refs["h2"][:] = (
        _conv3x3(refs["a2"][:], refs["w2"][:], masks, dtype)
    ).astype(dtype) + refs["b2"][:].astype(dtype)

    m3, v3 = stats_of(refs["h2"][:], "m3", "v3")
    a3, _ = _bn_fwd(refs["h2"][:], refs["g3"][:], refs["be3"][:], m3, v3)
    h3 = (
        jnp.dot(
            a3.astype(dtype), refs["w3"][:], preferred_element_type=jnp.float32
        )
    ).astype(dtype) + refs["b3"][:].astype(dtype)

    if has_skip:
        skip = (
            jnp.dot(
                x, refs["skip_w"][:], preferred_element_type=jnp.float32
            )
        ).astype(dtype) + refs["skip_b"][:].astype(dtype)
    else:
        skip = x
    refs["out"][:] = skip + h3


def _bwd_kernel_body(refs, *, shape, dtype):
    """Backward: recompute activations from x + saved batch stats, then walk
    the chain in reverse emitting every gradient.

    VMEM liveness discipline: the big per-BN f32 intermediates (hhat, y) are
    recomputed JUST BEFORE each BN's backward from the resident x/h1/h2
    scratches rather than kept alive from the recompute phase (an extra
    handful of elementwise passes, irrelevant for a bandwidth-bound model),
    and gradients flow between stages in ``dtype`` like XLA's own backward."""
    b, h, w, ci, ch, co, has_skip = shape
    n = b * h * w
    nf = float(n)
    x = refs["x"][:]
    g_out = refs["g_out"][:]
    fwd_masks = {"fwd": _tap_masks(n, h, w), "w": w}
    rev_masks = _rev_tap_masks(n, h, w)

    m1, v1 = refs["m1"][:], refs["v1"][:]
    m2, v2 = refs["m2"][:], refs["v2"][:]
    m3, v3 = refs["m3"][:], refs["v3"][:]
    rs1 = jax.lax.rsqrt(v1 + EPS)
    rs2 = jax.lax.rsqrt(v2 + EPS)
    rs3 = jax.lax.rsqrt(v3 + EPS)

    def bn1_act(xv):
        hhat = (xv.astype(jnp.float32) - m1) * rs1
        y = hhat * refs["g1"][:] + refs["be1"][:]
        return hhat, y

    def bn2_act(h1v):
        hhat = (h1v.astype(jnp.float32) - m2) * rs2
        y = hhat * refs["g2"][:] + refs["be2"][:]
        return hhat, y

    def bn3_act(h2v):
        hhat = (h2v.astype(jnp.float32) - m3) * rs3
        y = hhat * refs["g3"][:] + refs["be3"][:]
        return hhat, y

    # ---- recompute forward (h1/a2/h2 persisted in scratch) ----
    _, y1 = bn1_act(x)
    refs["h1"][:] = (
        jnp.dot(
            jnp.maximum(y1, 0.0).astype(dtype), refs["w1"][:],
            preferred_element_type=jnp.float32,
        )
    ).astype(dtype) + refs["b1"][:].astype(dtype)
    del y1

    _, y2 = bn2_act(refs["h1"][:])
    refs["a2"][:] = jnp.maximum(y2, 0.0).astype(dtype)
    del y2
    refs["h2"][:] = (
        _conv3x3(refs["a2"][:], refs["w2"][:], fwd_masks, dtype)
    ).astype(dtype) + refs["b2"][:].astype(dtype)

    # ---- conv3 (+ skip) backward ----
    hhat3, y3 = bn3_act(refs["h2"][:])
    a3 = jnp.maximum(y3, 0.0).astype(dtype)
    refs["db3"][:] = jnp.sum(
        g_out.astype(jnp.float32), axis=0, keepdims=True
    )
    refs["dw3"][:] = jax.lax.dot_general(
        a3, g_out, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    del a3
    g_a3 = jax.lax.dot_general(
        g_out, refs["w3"][:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype)

    g_h2, dg3, dbe3 = _bn_bwd(
        g_a3.astype(jnp.float32), y3, hhat3, refs["g3"][:], rs3, nf
    )
    del g_a3, y3, hhat3
    refs["dg3"][:] = dg3
    refs["dbe3"][:] = dbe3
    g_h2 = g_h2.astype(dtype)

    # ---- conv2 backward ----
    refs["db2"][:] = jnp.sum(g_h2.astype(jnp.float32), axis=0, keepdims=True)
    g_a2_acc = jnp.zeros((n, ch), jnp.float32)
    for t, (dy, dx) in enumerate(TAPS):
        delta = dy * w + dx
        shifted_a2 = jnp.where(
            fwd_masks["fwd"][t], _roll(refs["a2"][:], -delta),
            jnp.zeros((n, ch), dtype),
        )
        refs["dw2"][t] = jax.lax.dot_general(
            shifted_a2, g_h2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        contrib = jax.lax.dot_general(
            _roll(g_h2, delta), refs["w2"][t], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        g_a2_acc += jnp.where(
            rev_masks[t], contrib, jnp.zeros_like(contrib)
        )

    hhat2, y2 = bn2_act(refs["h1"][:])
    g_h1, dg2, dbe2 = _bn_bwd(g_a2_acc, y2, hhat2, refs["g2"][:], rs2, nf)
    del g_a2_acc, y2, hhat2
    refs["dg2"][:] = dg2
    refs["dbe2"][:] = dbe2
    g_h1 = g_h1.astype(dtype)

    # ---- conv1 backward ----
    hhat1, y1 = bn1_act(x)
    a1 = jnp.maximum(y1, 0.0).astype(dtype)
    refs["db1"][:] = jnp.sum(g_h1.astype(jnp.float32), axis=0, keepdims=True)
    refs["dw1"][:] = jax.lax.dot_general(
        a1, g_h1, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    del a1
    g_a1 = jax.lax.dot_general(
        g_h1, refs["w1"][:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype)

    g_x_main, dg1, dbe1 = _bn_bwd(
        g_a1.astype(jnp.float32), y1, hhat1, refs["g1"][:], rs1, nf
    )
    del g_a1, y1, hhat1
    refs["dg1"][:] = dg1
    refs["dbe1"][:] = dbe1

    # ---- skip path ----
    if has_skip:
        refs["dskip_b"][:] = refs["db3"][:]
        refs["dskip_w"][:] = jax.lax.dot_general(
            x, g_out, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        g_skip = jax.lax.dot_general(
            g_out, refs["skip_w"][:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        g_skip = g_out.astype(jnp.float32)
    refs["g_x"][:] = (g_x_main + g_skip).astype(dtype)


_PARAM_NAMES = (
    "w1", "b1", "w2", "b2", "w3", "b3",
    "g1", "be1", "g2", "be2", "g3", "be3",
)
_STAT_NAMES = ("m1", "v1", "m2", "v2", "m3", "v3")


def _vmem_params(limit_mb: int = 120):
    return pltpu.CompilerParams(vmem_limit_bytes=limit_mb * 1024 * 1024)


def _as_rows(v):
    """(C,) param vectors -> (1, C) rows (TPU wants 2D)."""
    return v.reshape(1, -1).astype(jnp.float32)


def _param_arrays(p: ResParams, dtype):
    arrs = [
        p.w1.astype(dtype), _as_rows(p.b1),
        p.w2.astype(dtype), _as_rows(p.b2),
        p.w3.astype(dtype), _as_rows(p.b3),
        _as_rows(p.g1), _as_rows(p.be1),
        _as_rows(p.g2), _as_rows(p.be2),
        _as_rows(p.g3), _as_rows(p.be3),
    ]
    names = list(_PARAM_NAMES)
    if p.skip_w is not None:
        arrs += [p.skip_w.astype(dtype), _as_rows(p.skip_b)]
        names += ["skip_w", "skip_b"]
    return names, arrs


@functools.lru_cache(maxsize=64)
def _build_fwd(shape, dtype_name, train, interpret):
    b, h, w, ci, ch, co, has_skip = shape
    dtype = jnp.dtype(dtype_name).type
    n = b * h * w
    in_names = ["x"] + list(_PARAM_NAMES) + (
        ["skip_w", "skip_b"] if has_skip else []
    )
    out_names = ["out"]
    if train:
        out_names += list(_STAT_NAMES)
    else:
        in_names += list(_STAT_NAMES)
    scratch_names = ["h1", "a2", "h2"]

    def kernel(*refs_flat):
        refs = dict(zip(in_names + out_names + scratch_names, refs_flat))
        _fwd_kernel_body(refs, shape=shape, dtype=dtype, train=train)

    out_shape = [jax.ShapeDtypeStruct((n, co), dtype)]  # out
    if train:
        out_shape += [
            jax.ShapeDtypeStruct((1, ci), jnp.float32),
            jax.ShapeDtypeStruct((1, ci), jnp.float32),
            jax.ShapeDtypeStruct((1, ch), jnp.float32),
            jax.ShapeDtypeStruct((1, ch), jnp.float32),
            jax.ShapeDtypeStruct((1, ch), jnp.float32),
            jax.ShapeDtypeStruct((1, ch), jnp.float32),
        ]

    call = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(in_names),
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in out_shape
        ),
        scratch_shapes=[
            pltpu.VMEM((n, ch), dtype),  # h1
            pltpu.VMEM((n, ch), dtype),  # a2
            pltpu.VMEM((n, ch), dtype),  # h2
        ],
        compiler_params=_vmem_params(),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * (ci * ch + 9 * ch * ch + ch * co
                           + (ci * co if has_skip else 0)),
            bytes_accessed=n * (ci + co) * jnp.dtype(dtype_name).itemsize,
            transcendentals=0,
        ),
    )
    return call


@functools.lru_cache(maxsize=64)
def _build_bwd(shape, dtype_name, interpret):
    b, h, w, ci, ch, co, has_skip = shape
    dtype = jnp.dtype(dtype_name).type
    n = b * h * w
    in_names = (
        ["x", "g_out"] + list(_PARAM_NAMES)
        + (["skip_w", "skip_b"] if has_skip else []) + list(_STAT_NAMES)
    )
    out_names = [
        "g_x", "dw1", "db1", "dw2", "db2", "dw3", "db3",
        "dg1", "dbe1", "dg2", "dbe2", "dg3", "dbe3",
    ] + (["dskip_w", "dskip_b"] if has_skip else [])

    def kernel(*refs_flat):
        names = in_names + out_names + ["h1", "a2", "h2"]
        refs = dict(zip(names, refs_flat))
        _bwd_kernel_body(refs, shape=shape, dtype=dtype)

    f32 = jnp.float32
    out_shape = [
        jax.ShapeDtypeStruct((n, ci), dtype),       # g_x
        jax.ShapeDtypeStruct((ci, ch), f32),        # dw1
        jax.ShapeDtypeStruct((1, ch), f32),         # db1
        jax.ShapeDtypeStruct((9, ch, ch), f32),     # dw2
        jax.ShapeDtypeStruct((1, ch), f32),         # db2
        jax.ShapeDtypeStruct((ch, co), f32),        # dw3
        jax.ShapeDtypeStruct((1, co), f32),         # db3
        jax.ShapeDtypeStruct((1, ci), f32),         # dg1
        jax.ShapeDtypeStruct((1, ci), f32),         # dbe1
        jax.ShapeDtypeStruct((1, ch), f32),         # dg2
        jax.ShapeDtypeStruct((1, ch), f32),         # dbe2
        jax.ShapeDtypeStruct((1, ch), f32),         # dg3
        jax.ShapeDtypeStruct((1, ch), f32),         # dbe3
    ]
    if has_skip:
        out_shape += [
            jax.ShapeDtypeStruct((ci, co), f32),    # dskip_w
            jax.ShapeDtypeStruct((1, co), f32),     # dskip_b
        ]

    call = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shape),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(in_names),
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in out_shape
        ),
        scratch_shapes=[
            pltpu.VMEM((n, ch), dtype),  # h1
            pltpu.VMEM((n, ch), dtype),  # a2
            pltpu.VMEM((n, ch), dtype),  # h2
        ],
        compiler_params=_vmem_params(),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * n * (ci * ch + 9 * ch * ch + ch * co
                           + (ci * co if has_skip else 0)),
            bytes_accessed=n * (2 * ci + 2 * co)
            * jnp.dtype(dtype_name).itemsize,
            transcendentals=0,
        ),
    )
    return call


# --------------------------------------------------------------------------
# Public entry: custom_vjp train function + eval function, per static config
# --------------------------------------------------------------------------

def _shape_of(x4d, p: ResParams):
    b, h, w, ci = x4d.shape
    ch = p.w1.shape[-1]
    co = p.w3.shape[-1]
    return (b, h, w, ci, ch, co, p.skip_w is not None)


def res_block_train(x4d, p: ResParams, *, dtype=jnp.bfloat16,
                    interpret: bool = False):
    """Fused train-mode forward: (B,H,W,Ci) -> ((B,H,W,Co), BatchStats).
    Differentiable via custom_vjp (single fused backward kernel). The input
    is cast to ``dtype`` OUTSIDE the vjp boundary so the x-cotangent dtype
    matches the primal."""
    x4d = x4d.astype(dtype)
    return _res_train_vjp(
        x4d, p, _shape_of(x4d, p), jnp.dtype(dtype).name, interpret
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _res_train_vjp(x4d, p, shape, dtype_name, interpret):
    (out, stats), _res = _train_fwd_impl(x4d, p, shape, dtype_name, interpret)
    return out, stats


def _train_fwd_impl(x4d, p, shape, dtype_name, interpret):
    b, h, w, ci, ch, co, has_skip = shape
    dtype = jnp.dtype(dtype_name).type
    n = b * h * w
    x = x4d.reshape(n, ci).astype(dtype)
    _names, arrs = _param_arrays(p, dtype)
    call = _build_fwd(shape, dtype_name, True, interpret)
    res = call(x, *arrs)
    out = res[0].reshape(b, h, w, co)
    stats = BatchStats(*[s.reshape(-1) for s in res[1:7]])
    return (out, stats), (x, arrs, res[1:7])


def _train_fwd_rule(x4d, p, shape, dtype_name, interpret):
    (out, stats), (x, arrs, stat_rows) = _train_fwd_impl(
        x4d, p, shape, dtype_name, interpret
    )
    return (out, stats), (x, tuple(arrs), tuple(stat_rows))


def _train_bwd_rule(shape, dtype_name, interpret, residuals, ct):
    b, h, w, ci, ch, co, has_skip = shape
    dtype = jnp.dtype(dtype_name).type
    n = b * h * w
    x, arrs, stat_rows = residuals
    g_out, _g_stats = ct  # stats feed running-average updates only
    g_out = g_out.reshape(n, co).astype(dtype)
    call = _build_bwd(shape, dtype_name, interpret)
    grads = call(x, g_out, *arrs, *stat_rows)
    (g_x, dw1, db1, dw2, db2, dw3, db3,
     dg1, dbe1, dg2, dbe2, dg3, dbe3) = grads[:13]
    gp = ResParams(
        w1=dw1, b1=db1.reshape(-1), w2=dw2, b2=db2.reshape(-1),
        w3=dw3, b3=db3.reshape(-1),
        g1=dg1.reshape(-1), be1=dbe1.reshape(-1),
        g2=dg2.reshape(-1), be2=dbe2.reshape(-1),
        g3=dg3.reshape(-1), be3=dbe3.reshape(-1),
        skip_w=grads[13] if has_skip else None,
        skip_b=grads[14].reshape(-1) if has_skip else None,
    )
    return g_x.reshape(b, h, w, ci), gp


_res_train_vjp.defvjp(_train_fwd_rule, _train_bwd_rule)


def res_block_eval(x4d, p: ResParams, stats: BatchStats, *,
                   dtype=jnp.bfloat16, interpret: bool = False):
    """Fused eval-mode forward with running stats (no stat computation)."""
    shape = _shape_of(x4d, p)
    b, h, w, ci, ch, co, has_skip = shape
    dtype_name = jnp.dtype(dtype).name
    n = b * h * w
    x = x4d.reshape(n, ci).astype(jnp.dtype(dtype_name).type)
    _names, arrs = _param_arrays(p, jnp.dtype(dtype_name).type)
    stat_rows = [_as_rows(s) for s in stats]
    call = _build_fwd(shape, dtype_name, False, interpret)
    res = call(x, *arrs, *stat_rows)
    return res[0].reshape(b, h, w, co)
