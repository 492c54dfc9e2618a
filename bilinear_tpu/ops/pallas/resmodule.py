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

def _chunk(n: int) -> int:
    """Row-chunk size for in-kernel loops. Whole-batch single-shot kernels
    make Mosaic materialize full-size (N, C) transients and spill ~100 MB of
    'registers' to VMEM (measured: 156 MB scoped demand at (8,64,64,256)).
    Chunked passes over the VMEM-resident scratches keep every transient at
    (R, C). R must DIVIDE N (the pass loops run n // r steps) — halve until
    it does, so odd batch sizes (tail batches) stay correct."""
    r = min(1024, n)
    while n % r:
        r //= 2
    return r


_ALIGN = 32  # row alignment satisfying every dtype's sublane count


def _margin(w: int) -> int:
    """Margin rows around the flat array: every 3x3 tap read (offset
    dy*W + dx, |offset| <= W+1) plus the _ALIGN-window slack must stay in
    bounds, and the margin itself must be _ALIGN-aligned so interior
    writes start at provably-aligned rows."""
    return ((w + _ALIGN + _ALIGN - 1) // _ALIGN) * _ALIGN


def _tap_read(ref, m, s, delta, r):
    """Rows [m+s+delta, m+s+delta+r) of a margined ref. Mosaic requires
    dynamic-slice starts to be provably sublane-aligned; only the STATIC
    part (m + delta) is misaligned, so read an aligned window of r + _ALIGN
    rows and slice the static offset in-register."""
    ofs = (m + delta) % _ALIGN
    base = pl.multiple_of(m + s + delta - ofs, _ALIGN)
    win = ref[pl.ds(base, r + _ALIGN), :]
    return win[ofs:ofs + r]


def _chunk_tap_mask(s, r, h, w, dy, dx):
    """(R, 1) validity mask of tap (dy, dx) for output rows [s, s+R)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0) + s
    xp = rows % w
    yp = (rows // w) % h
    return (xp + dx >= 0) & (xp + dx < w) & (yp + dy >= 0) & (yp + dy < h)


def _fwd_kernel_body(refs, *, shape, dtype, train):
    """Shared forward body, chunked. ``refs`` maps names to pl.Ref.

    Persistent VMEM: x (input), out (output), h1 / h2 scratches (N, Ch) and
    the margin-padded a2 scratch ((N + 2M, Ch)). Every pass walks the rows
    in R-sized chunks so Mosaic's live values stay (R, C)-sized."""
    b, h, w, ci, ch, co, has_skip = shape
    n = b * h * w
    r = _chunk(n)
    m = _margin(w)
    steps = n // r
    f32 = jnp.float32

    def mean_of(ref, c, lo=0):
        def body(i, acc):
            return acc + jnp.sum(
                ref[pl.ds(lo + i * r, r), :].astype(f32), axis=0,
                keepdims=True,
            )
        s = jax.lax.fori_loop(0, steps, body, jnp.zeros((1, c), f32))
        return s / n

    def var_of(ref, mean, c, lo=0):
        def body(i, acc):
            d = ref[pl.ds(lo + i * r, r), :].astype(f32) - mean
            return acc + jnp.sum(d * d, axis=0, keepdims=True)
        s = jax.lax.fori_loop(0, steps, body, jnp.zeros((1, c), f32))
        return s / n

    def stats_of(ref, c, name_m, name_v, lo=0):
        if train:
            mean = mean_of(ref, c, lo)
            var = var_of(ref, mean, c, lo)
            refs[name_m][:] = mean
            refs[name_v][:] = var
            return mean, var
        return refs[name_m][:], refs[name_v][:]

    # ---- bn1 + conv1 -> h1 ----
    m1, v1 = stats_of(refs["x"], ci, "m1", "v1")
    rs1 = jax.lax.rsqrt(v1 + EPS)
    g1 = refs["g1"][:]
    be1 = refs["be1"][:]
    w1 = refs["w1"][:]
    b1 = refs["b1"][:].astype(dtype)

    def h1_body(i, _):
        xc = refs["x"][pl.ds(i * r, r), :].astype(f32)
        a1 = jnp.maximum((xc - m1) * rs1 * g1 + be1, 0.0).astype(dtype)
        refs["h1"][pl.ds(i * r, r), :] = (
            jnp.dot(a1, w1, preferred_element_type=f32)
        ).astype(dtype) + b1
        return _

    jax.lax.fori_loop(0, steps, h1_body, 0)

    # ---- bn2 -> a2 (margin scratch) ----
    m2, v2 = stats_of(refs["h1"], ch, "m2", "v2")
    rs2 = jax.lax.rsqrt(v2 + EPS)
    g2 = refs["g2"][:]
    be2 = refs["be2"][:]
    refs["a2"][0:m, :] = jnp.zeros((m, ch), dtype)
    refs["a2"][m + n:m + n + m, :] = jnp.zeros((m, ch), dtype)

    def a2_body(i, _):
        hc = refs["h1"][pl.ds(i * r, r), :].astype(f32)
        refs["a2"][pl.ds(m + i * r, r), :] = jnp.maximum(
            (hc - m2) * rs2 * g2 + be2, 0.0
        ).astype(dtype)
        return _

    jax.lax.fori_loop(0, steps, a2_body, 0)

    # ---- conv2 (9 masked shifted matmuls per chunk) -> h2 ----
    w2 = refs["w2"][:]
    b2 = refs["b2"][:].astype(dtype)

    def h2_body(i, _):
        s = i * r
        acc = jnp.zeros((r, ch), f32)
        for t, (dy, dx) in enumerate(TAPS):
            delta = dy * w + dx
            tap = _tap_read(refs["a2"], m, s, delta, r)
            mask = _chunk_tap_mask(s, r, h, w, dy, dx)
            tap = jnp.where(mask, tap, jnp.zeros_like(tap))
            acc += jnp.dot(tap, w2[t], preferred_element_type=f32)
        refs["h2"][pl.ds(s, r), :] = acc.astype(dtype) + b2
        return _

    jax.lax.fori_loop(0, steps, h2_body, 0)

    # ---- bn3 + conv3 + skip -> out ----
    m3, v3 = stats_of(refs["h2"], ch, "m3", "v3")
    rs3 = jax.lax.rsqrt(v3 + EPS)
    g3 = refs["g3"][:]
    be3 = refs["be3"][:]
    w3 = refs["w3"][:]
    b3 = refs["b3"][:].astype(dtype)
    if has_skip:
        wsk = refs["skip_w"][:]
        bsk = refs["skip_b"][:].astype(dtype)

    def out_body(i, _):
        hc = refs["h2"][pl.ds(i * r, r), :].astype(f32)
        a3 = jnp.maximum((hc - m3) * rs3 * g3 + be3, 0.0).astype(dtype)
        h3 = (
            jnp.dot(a3, w3, preferred_element_type=f32)
        ).astype(dtype) + b3
        xc = refs["x"][pl.ds(i * r, r), :]
        if has_skip:
            skip = (
                jnp.dot(xc, wsk, preferred_element_type=f32)
            ).astype(dtype) + bsk
        else:
            skip = xc
        refs["out"][pl.ds(i * r, r), :] = skip + h3
        return _

    jax.lax.fori_loop(0, steps, out_body, 0)


def _bwd_kernel_body_chunked(refs, *, shape, dtype):
    """Backward, chunked like the forward. Recomputes h1/a2/h2 from x and
    the saved batch stats (VMEM-resident recompute), then walks the chain in
    reverse. BN train-mode backward needs global reductions before the
    per-row gradient, so each BN costs one accumulate pass + one emit pass;
    per-chunk matmuls that feed two passes (conv3 dgrad, conv1 dgrad) are
    recomputed rather than materialized at (N, C). The gy2 tensor reuses the
    a2 margin scratch (a2 is dead after the conv2 weight-grad pass)."""
    b, h, w, ci, ch, co, has_skip = shape
    n = b * h * w
    r = _chunk(n)
    m = _margin(w)
    steps = n // r
    nf = float(n)
    f32 = jnp.float32

    m1, v1 = refs["m1"][:], refs["v1"][:]
    m2, v2 = refs["m2"][:], refs["v2"][:]
    m3, v3 = refs["m3"][:], refs["v3"][:]
    rs1 = jax.lax.rsqrt(v1 + EPS)
    rs2 = jax.lax.rsqrt(v2 + EPS)
    rs3 = jax.lax.rsqrt(v3 + EPS)
    g1 = refs["g1"][:]
    be1 = refs["be1"][:]
    g2 = refs["g2"][:]
    be2 = refs["be2"][:]
    g3 = refs["g3"][:]
    be3 = refs["be3"][:]
    w1 = refs["w1"][:]
    w2 = refs["w2"][:]
    w3 = refs["w3"][:]
    b1 = refs["b1"][:].astype(dtype)
    b2 = refs["b2"][:].astype(dtype)

    # ---- recompute h1, a2 (margin), h2 ----
    def rec_h1(i, _):
        xc = refs["x"][pl.ds(i * r, r), :].astype(f32)
        a1 = jnp.maximum((xc - m1) * rs1 * g1 + be1, 0.0).astype(dtype)
        refs["h1"][pl.ds(i * r, r), :] = (
            jnp.dot(a1, w1, preferred_element_type=f32)
        ).astype(dtype) + b1
        return _

    jax.lax.fori_loop(0, steps, rec_h1, 0)

    refs["a2"][0:m, :] = jnp.zeros((m, ch), dtype)
    refs["a2"][m + n:m + n + m, :] = jnp.zeros((m, ch), dtype)

    def rec_a2(i, _):
        hc = refs["h1"][pl.ds(i * r, r), :].astype(f32)
        refs["a2"][pl.ds(m + i * r, r), :] = jnp.maximum(
            (hc - m2) * rs2 * g2 + be2, 0.0
        ).astype(dtype)
        return _

    jax.lax.fori_loop(0, steps, rec_a2, 0)

    def rec_h2(i, _):
        s = i * r
        acc = jnp.zeros((r, ch), f32)
        for t, (dy, dx) in enumerate(TAPS):
            delta = dy * w + dx
            tap = _tap_read(refs["a2"], m, s, delta, r)
            mask = _chunk_tap_mask(s, r, h, w, dy, dx)
            tap = jnp.where(mask, tap, jnp.zeros_like(tap))
            acc += jnp.dot(tap, w2[t], preferred_element_type=f32)
        refs["h2"][pl.ds(s, r), :] = acc.astype(dtype) + b2
        return _

    jax.lax.fori_loop(0, steps, rec_h2, 0)

    # ---- pass: conv3/skip weight grads + bn3 reduction accumulators ----
    def bn3_act(i):
        hc = refs["h2"][pl.ds(i * r, r), :].astype(f32)
        hhat = (hc - m3) * rs3
        y = hhat * g3 + be3
        return hhat, y

    def gy3_of(i):
        hhat3, y3 = bn3_act(i)
        ga3 = jax.lax.dot_general(
            refs["g_out"][pl.ds(i * r, r), :], w3,
            (((1,), (1,)), ((), ())), preferred_element_type=f32,
        )
        return jnp.where(y3 > 0.0, ga3, jnp.zeros_like(ga3)), hhat3

    def p5(i, acc):
        dw3, db3, dg3, dbe3, dwsk = acc
        goc = refs["g_out"][pl.ds(i * r, r), :]
        gof = goc.astype(f32)
        db3 = db3 + jnp.sum(gof, axis=0, keepdims=True)
        hhat3, y3 = bn3_act(i)
        a3 = jnp.maximum(y3, 0.0)
        dw3 = dw3 + jax.lax.dot_general(
            a3.astype(dtype), goc, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        gy3, _ = gy3_of(i)
        dg3 = dg3 + jnp.sum(gy3 * hhat3, axis=0, keepdims=True)
        dbe3 = dbe3 + jnp.sum(gy3, axis=0, keepdims=True)
        if has_skip:
            dwsk = dwsk + jax.lax.dot_general(
                refs["x"][pl.ds(i * r, r), :], goc, (((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
        return (dw3, db3, dg3, dbe3, dwsk)

    dw3, db3, dg3, dbe3, dwsk = jax.lax.fori_loop(
        0, steps, p5,
        (
            jnp.zeros((ch, co), f32), jnp.zeros((1, co), f32),
            jnp.zeros((1, ch), f32), jnp.zeros((1, ch), f32),
            jnp.zeros((ci, co), f32),
        ),
    )
    refs["dw3"][:] = dw3
    refs["db3"][:] = db3
    refs["dg3"][:] = dg3
    refs["dbe3"][:] = dbe3
    if has_skip:
        refs["dskip_w"][:] = dwsk
        refs["dskip_b"][:] = db3

    # ---- pass: emit g_h2 into the margin scratch ----
    sum_ghat3 = g3 * dbe3
    sum_ghat_hhat3 = g3 * dg3
    refs["gh2"][0:m, :] = jnp.zeros((m, ch), dtype)
    refs["gh2"][m + n:m + n + m, :] = jnp.zeros((m, ch), dtype)

    def p6(i, _):
        gy3, hhat3 = gy3_of(i)
        ghat = gy3 * g3
        gh2 = (rs3 / nf) * (nf * ghat - sum_ghat3 - hhat3 * sum_ghat_hhat3)
        refs["gh2"][pl.ds(m + i * r, r), :] = gh2.astype(dtype)
        return _

    jax.lax.fori_loop(0, steps, p6, 0)

    # ---- pass: conv2 weight grads ----
    def p7(i, acc):
        dw2, db2 = acc
        s = i * r
        gh2c = refs["gh2"][pl.ds(m + s, r), :]
        db2 = db2 + jnp.sum(gh2c.astype(f32), axis=0, keepdims=True)
        new = []
        for t, (dy, dx) in enumerate(TAPS):
            delta = dy * w + dx
            tap = _tap_read(refs["a2"], m, s, delta, r)
            mask = _chunk_tap_mask(s, r, h, w, dy, dx)
            tap = jnp.where(mask, tap, jnp.zeros_like(tap))
            new.append(jax.lax.dot_general(
                tap, gh2c, (((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            ))
        return (dw2 + jnp.stack(new), db2)

    dw2, db2 = jax.lax.fori_loop(
        0, steps, p7,
        (jnp.zeros((9, ch, ch), f32), jnp.zeros((1, ch), f32)),
    )
    refs["dw2"][:] = dw2
    refs["db2"][:] = db2

    # ---- pass: g_a2 -> gy2 (reuse a2 scratch) + bn2 reductions ----
    def bn2_act(i):
        hc = refs["h1"][pl.ds(i * r, r), :].astype(f32)
        hhat = (hc - m2) * rs2
        return hhat, hhat * g2 + be2

    def ga2_of(i):
        s = i * r
        acc = jnp.zeros((r, ch), f32)
        for t, (dy, dx) in enumerate(TAPS):
            delta = dy * w + dx
            contrib = jax.lax.dot_general(
                _tap_read(refs["gh2"], m, s, -delta, r), w2[t],
                (((1,), (1,)), ((), ())), preferred_element_type=f32,
            )
            mask = _chunk_tap_mask(s, r, h, w, -dy, -dx)
            acc += jnp.where(mask, contrib, jnp.zeros_like(contrib))
        return acc

    def p8(i, acc):
        dg2, dbe2 = acc
        hhat2, y2 = bn2_act(i)
        gy2 = jnp.where(y2 > 0.0, ga2_of(i), jnp.zeros((r, ch), f32))
        refs["a2"][pl.ds(m + i * r, r), :] = gy2.astype(dtype)
        return (
            dg2 + jnp.sum(gy2 * hhat2, axis=0, keepdims=True),
            dbe2 + jnp.sum(gy2, axis=0, keepdims=True),
        )

    dg2, dbe2 = jax.lax.fori_loop(
        0, steps, p8,
        (jnp.zeros((1, ch), f32), jnp.zeros((1, ch), f32)),
    )
    refs["dg2"][:] = dg2
    refs["dbe2"][:] = dbe2

    # ---- pass: g_h1 ----
    sum_ghat2 = g2 * dbe2
    sum_ghat_hhat2 = g2 * dg2

    def p9(i, _):
        gy2 = refs["a2"][pl.ds(m + i * r, r), :].astype(f32)
        hhat2, _y = bn2_act(i)
        ghat = gy2 * g2
        gh1 = (rs2 / nf) * (nf * ghat - sum_ghat2 - hhat2 * sum_ghat_hhat2)
        refs["gh1"][pl.ds(i * r, r), :] = gh1.astype(dtype)
        return _

    jax.lax.fori_loop(0, steps, p9, 0)

    # ---- pass: conv1 grads + bn1 reductions ----
    def bn1_act(i):
        xc = refs["x"][pl.ds(i * r, r), :].astype(f32)
        hhat = (xc - m1) * rs1
        return hhat, hhat * g1 + be1

    def p10(i, acc):
        dw1, db1, dg1, dbe1 = acc
        gh1c = refs["gh1"][pl.ds(i * r, r), :]
        db1 = db1 + jnp.sum(gh1c.astype(f32), axis=0, keepdims=True)
        hhat1, y1 = bn1_act(i)
        a1 = jnp.maximum(y1, 0.0).astype(dtype)
        dw1 = dw1 + jax.lax.dot_general(
            a1, gh1c, (((0,), (0,)), ((), ())), preferred_element_type=f32
        )
        ga1 = jax.lax.dot_general(
            gh1c, w1, (((1,), (1,)), ((), ())), preferred_element_type=f32
        )
        gy1 = jnp.where(y1 > 0.0, ga1, jnp.zeros_like(ga1))
        dg1 = dg1 + jnp.sum(gy1 * hhat1, axis=0, keepdims=True)
        dbe1 = dbe1 + jnp.sum(gy1, axis=0, keepdims=True)
        return (dw1, db1, dg1, dbe1)

    dw1, db1, dg1, dbe1 = jax.lax.fori_loop(
        0, steps, p10,
        (
            jnp.zeros((ci, ch), f32), jnp.zeros((1, ch), f32),
            jnp.zeros((1, ci), f32), jnp.zeros((1, ci), f32),
        ),
    )
    refs["dw1"][:] = dw1
    refs["db1"][:] = db1
    refs["dg1"][:] = dg1
    refs["dbe1"][:] = dbe1

    # ---- pass: g_x ----
    sum_ghat1 = g1 * dbe1
    sum_ghat_hhat1 = g1 * dg1
    if has_skip:
        wsk = refs["skip_w"][:]

    def p11(i, _):
        hhat1, y1 = bn1_act(i)
        ga1 = jax.lax.dot_general(
            refs["gh1"][pl.ds(i * r, r), :], w1,
            (((1,), (1,)), ((), ())), preferred_element_type=f32,
        )
        gy1 = jnp.where(y1 > 0.0, ga1, jnp.zeros_like(ga1))
        ghat = gy1 * g1
        gx = (rs1 / nf) * (nf * ghat - sum_ghat1 - hhat1 * sum_ghat_hhat1)
        goc = refs["g_out"][pl.ds(i * r, r), :]
        if has_skip:
            gx = gx + jax.lax.dot_general(
                goc, wsk, (((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            )
        else:
            gx = gx + goc.astype(f32)
        refs["g_x"][pl.ds(i * r, r), :] = gx.astype(dtype)
        return _

    jax.lax.fori_loop(0, steps, p11, 0)


_PARAM_NAMES = (
    "w1", "b1", "w2", "b2", "w3", "b3",
    "g1", "be1", "g2", "be2", "g3", "be3",
)
_STAT_NAMES = ("m1", "v1", "m2", "v2", "m3", "v3")


def _vmem_params(limit_mb: int = 120):
    return pltpu.CompilerParams(vmem_limit_bytes=limit_mb * 1024 * 1024)


def fits_vmem(b, h, w, ci, ch, co, dtype, budget_mb: int = 118) -> bool:
    """Whether the whole-block kernels fit the v5e VMEM at this shape. The
    backward dominates: x + g_out + g_x + out-window (2N(ci+co)) plus five
    (N, Ch)-class scratches (h1, a2+margin, h2, g_h2+margin, g_h1). The
    128x128 stem block fails this (measured: 166 MB demanded) and falls
    back to the standard conv path."""
    n = b * h * w
    itemsize = jnp.dtype(dtype).itemsize
    margin_rows = 2 * _margin(w)
    bwd = itemsize * (
        2 * n * (ci + co) + ch * (3 * n + 2 * (n + margin_rows))
    )
    return bwd <= budget_mb * 1024 * 1024


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
            pltpu.VMEM((n, ch), dtype),                    # h1
            pltpu.VMEM((n + 2 * _margin(w), ch), dtype),   # a2 (margined)
            pltpu.VMEM((n, ch), dtype),                    # h2
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
        names = in_names + out_names + ["h1", "a2", "h2", "gh2", "gh1"]
        refs = dict(zip(names, refs_flat))
        _bwd_kernel_body_chunked(refs, shape=shape, dtype=dtype)

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
            pltpu.VMEM((n, ch), dtype),                    # h1
            pltpu.VMEM((n + 2 * _margin(w), ch), dtype),   # a2/gy2 (margined)
            pltpu.VMEM((n, ch), dtype),                    # h2
            pltpu.VMEM((n + 2 * _margin(w), ch), dtype),   # g_h2 (margined)
            pltpu.VMEM((n, ch), dtype),                    # g_h1
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
