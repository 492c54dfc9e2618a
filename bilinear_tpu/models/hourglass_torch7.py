"""Stacked hourglass, torch7-faithful variant (the reference's MainModel,
model/hourglass_torch7.py:1-129) — the network train_hourglass.py actually
trains.

Architecture: Conv7x7/s2 -> BN -> ReLU -> Res(64->128) -> MaxPool ->
Res(128,128) -> Res(128,256), then 8 stacks of [depth-4 recursive hourglass
-> lin(1x1 conv+BN+ReLU) -> 1x1 heatmap conv], with inter-stack feedback
``inter + ll_bar(ll) + htmap_bar(htmap)`` (model/hourglass_torch7.py:107-122).
ResModule is the *standard* post-BN bottleneck: [BN->ReLU->1x1, BN->ReLU->3x3,
BN->ReLU->1x1] + 1x1 skip conv used only when channels change (but always
allocated, matching the torch state_dict layout so reference checkpoints
convert losslessly — see utils/torch_compat.hourglass_torch7_from_torch).

TPU-native choices: NHWC layout throughout (MXU/convolution native), the
recursion unrolled at trace time (static depth), intermediate supervision
returned as one stacked (S, B, H, W, J) array, f32 parameters with a compute
dtype knob for bf16 MXU execution.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from bilinear_tpu.core.norm import TorchBatchNorm
from bilinear_tpu.models.layers import ConvParams, conv2d
from bilinear_tpu.ops.int8 import int8_conv

N_STACKS = 8
N_FEATURES = 256
N_JOINTS = 16
N_DEPTH = 4


def _conv(features, kernel, name, stride=1, bias=True, dtype=jnp.float32,
          fan_in=None):
    # Torch7 family default: biased convs (model/hourglass_torch7.py:14-39).
    return conv2d(features, kernel, name, bias=bias, stride=stride,
                  dtype=dtype, fan_in=fan_in)


def _ConvP(kshape, fan_in, name):
    """This family's convs always carry a bias with torch's fan_in init;
    the shared holder (models/layers.py::ConvParams) covers the rest."""
    return ConvParams(kshape, bias=True, fan_in=fan_in, name=name)


class _BNState(nn.Module):
    """Parameter/stat-holder mirroring TorchBatchNorm's variables, with the
    normalization math done elsewhere (the fused kernel). ``update=True``
    applies the torch running-stat update (momentum or cumulative) to the
    batch stats the kernel computed (core/norm.py:58-71)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, batch_mean=None, batch_var=None, n: int = 1,
                 momentum="__unset__", update: bool = False):
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(self.features, self.dtype)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(self.features, self.dtype)
        )
        count = self.variable(
            "batch_stats", "count", lambda: jnp.zeros([], jnp.int32)
        )
        gamma = self.param(
            "scale", nn.initializers.ones, (self.features,), self.dtype
        )
        beta = self.param(
            "bias", nn.initializers.zeros, (self.features,), self.dtype
        )
        if update and not self.is_initializing():
            unbiased = batch_var * (n / max(n - 1, 1))
            new_count = count.value + 1
            if momentum is None:
                factor = 1.0 / new_count.astype(self.dtype)
            else:
                factor = jnp.asarray(momentum, self.dtype)
            ra_mean.value = (1 - factor) * ra_mean.value + factor * batch_mean
            ra_var.value = (1 - factor) * ra_var.value + factor * unbiased
            count.value = new_count
        return gamma, beta, ra_mean.value, ra_var.value


class ResModule(nn.Module):
    """model/hourglass_torch7.py:14-39.

    ``fused=True`` routes through the whole-block Pallas kernels
    (ops/pallas/resmodule.py — VMEM-resident fwd + custom_vjp bwd) on TPU,
    or through the mathematically identical pure-jnp formulation elsewhere.
    The variable tree is IDENTICAL to the standard path (same names, shapes,
    and init rng streams), so checkpoints and converted torch weights load
    into either."""

    in_channels: int
    out_channels: int
    momentum: Optional[float] = 0.1
    dtype: jnp.dtype = jnp.float32
    fused: bool = False
    # "int8": eval/serving-only dynamic quantization of the three body convs
    # (ops/int8.py — per-channel int8 weights, per-sample int8 activations,
    # int32 MXU accumulation). Train mode and the skip conv stay float; the
    # variable tree is unchanged, so ordinary checkpoints serve quantized.
    quantize: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, train: bool, momentum="__unset__"):
        if momentum == "__unset__":
            momentum = self.momentum
        half = self.out_channels // 2
        use_int8 = self.quantize == "int8" and not train
        if self.fused and not use_int8:
            from bilinear_tpu.ops.pallas.resmodule import fits_vmem

            # Oversized blocks (the 128x128 stem at batch 8) exceed VMEM for
            # the whole-block kernels; they take the standard conv path. The
            # variable trees of the two branches are identical, so the choice
            # is purely an execution-path decision.
            b, hh, ww, _ = x.shape
            if fits_vmem(b, hh, ww, self.in_channels, half,
                         self.out_channels, self.dtype):
                return self._fused(x, train=train, momentum=momentum, half=half)

        def bn(name, h):
            return TorchBatchNorm(momentum=self.momentum, dtype=jnp.promote_types(jnp.float32, self.dtype), name=name)(
                h.astype(jnp.promote_types(jnp.float32, self.dtype)), train=train, momentum=momentum
            ).astype(self.dtype)

        # conv_skip is ALWAYS allocated (used only on channel change),
        # mirroring the reference state_dict.
        skip_conv = _conv(
            self.out_channels, 1, "conv_skip", dtype=self.dtype,
            fan_in=self.in_channels,
        )
        skip = skip_conv(x) if self.in_channels != self.out_channels else x

        def body_conv(name, h, feats, kernel, fan_in):
            if use_int8:
                # Same param names/shapes/inits as nn.Conv (_ConvP mirrors
                # them), applied through the dynamic-int8 conv instead.
                k, b = _ConvP((kernel, kernel, h.shape[-1], feats), fan_in,
                              name=name)()
                return int8_conv(h, k, b)
            return _conv(feats, kernel, name, dtype=self.dtype,
                         fan_in=fan_in)(h)

        h = nn.relu(bn("bn1", x))
        h = body_conv("conv1", h, half, 1, self.in_channels)
        h = nn.relu(bn("bn2", h))
        h = body_conv("conv2", h, half, 3, half * 9)
        h = nn.relu(bn("bn3", h))
        h = body_conv("conv3", h, self.out_channels, 1, half)
        return skip + h

    def _fused(self, x, *, train: bool, momentum, half: int):
        from bilinear_tpu.ops.pallas import resmodule as rk

        ci, co = self.in_channels, self.out_channels
        sdtype = jnp.promote_types(jnp.float32, self.dtype)
        bn1 = _BNState(ci, sdtype, name="bn1")
        bn2 = _BNState(half, sdtype, name="bn2")
        bn3 = _BNState(half, sdtype, name="bn3")
        g1, be1, rm1, rv1 = bn1()
        g2, be2, rm2, rv2 = bn2()
        g3, be3, rm3, rv3 = bn3()
        # conv_skip params materialize only on channel change — the standard
        # flax path constructs the module unconditionally but only CALLS it
        # when ci != co, and uncalled flax modules create no params.
        ksk = bsk = None
        if ci != co:
            ksk, bsk = _ConvP((1, 1, ci, co), ci, name="conv_skip")()
        k1, b1 = _ConvP((1, 1, ci, half), ci, name="conv1")()
        k2, b2 = _ConvP((3, 3, half, half), half * 9, name="conv2")()
        k3, b3 = _ConvP((1, 1, half, co), half, name="conv3")()

        p = rk.ResParams(
            w1=k1.reshape(ci, half), b1=b1,
            w2=k2.reshape(9, half, half), b2=b2,
            w3=k3.reshape(half, co), b3=b3,
            g1=g1, be1=be1, g2=g2, be2=be2, g3=g3, be3=be3,
            skip_w=ksk.reshape(ci, co) if ksk is not None else None,
            skip_b=bsk,
        )

        # The Pallas kernels require a compiled TPU backend (and bf16/f32);
        # everywhere else (CPU tests, init, f64 parity runs) the identical
        # pure-jnp formulation is used — same math, autodiff backward.
        use_kernel = (
            jax.default_backend() == "tpu"
            and not self.is_initializing()
            and jnp.dtype(self.dtype).itemsize <= 4
        )
        n = x.shape[0] * x.shape[1] * x.shape[2]
        if train:
            if use_kernel:
                out, stats = rk.res_block_train(x, p, dtype=self.dtype)
            else:
                out, stats = rk.res_block_ref(
                    x, p, train=True, dtype=self.dtype
                )
            bn1(stats.m1, stats.v1, n, momentum, update=True)
            bn2(stats.m2, stats.v2, n, momentum, update=True)
            bn3(stats.m3, stats.v3, n, momentum, update=True)
        else:
            stats = rk.BatchStats(rm1, rv1, rm2, rv2, rm3, rv3)
            if use_kernel:
                out = rk.res_block_eval(x, p, stats, dtype=self.dtype)
            else:
                out, _ = rk.res_block_ref(
                    x, p, train=False, stats=stats, dtype=self.dtype
                )
        return out


class Hourglass(nn.Module):
    """Recursive encoder/decoder (model/hourglass_torch7.py:42-75).

    ``n_modules`` chains that many ResModules per slot (the reference's
    CONFIG.nModules Sequential at :47-49,58). Module 0 keeps the bare slot
    name so nModules=1 trees — every existing checkpoint — are unchanged;
    extras are ``{slot}_m{k}``, mapping to torch's ``{slot}.{k}``."""

    depth: int
    features: int = N_FEATURES
    momentum: Optional[float] = 0.1
    dtype: jnp.dtype = jnp.float32
    fused: bool = False
    quantize: Optional[str] = None
    n_modules: int = 1

    @nn.compact
    def __call__(self, x, *, train: bool, momentum="__unset__"):
        if momentum == "__unset__":
            momentum = self.momentum
        kw = dict(momentum=self.momentum, dtype=self.dtype, fused=self.fused,
                  quantize=self.quantize)

        def chain(slot: str, h):
            for k in range(self.n_modules):
                name = slot if k == 0 else f"{slot}_m{k}"
                h = ResModule(self.features, self.features, name=name, **kw)(
                    h, train=train, momentum=momentum
                )
            return h

        up = chain("res1", x)
        low = nn.max_pool(x, (2, 2), strides=(2, 2))
        low = chain("res2", low)
        if self.depth > 1:
            low = Hourglass(
                self.depth - 1, self.features, self.momentum, self.dtype,
                self.fused, self.quantize, self.n_modules, name="sub",
            )(low, train=train, momentum=momentum)
        else:
            low = chain("waist", low)
        low = chain("res3", low)
        # UpsamplingNearest2d(scale_factor=2)
        low = jnp.repeat(jnp.repeat(low, 2, axis=-3), 2, axis=-2)
        return up + low


class Lin(nn.Module):
    """1x1 conv -> BN -> ReLU head (model/hourglass_torch7.py:124-129)."""

    features: int
    momentum: Optional[float] = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool, momentum="__unset__"):
        if momentum == "__unset__":
            momentum = self.momentum
        x = _conv(self.features, 1, "conv", dtype=self.dtype,
                  fan_in=x.shape[-1])(x)
        x = TorchBatchNorm(momentum=self.momentum, dtype=jnp.promote_types(jnp.float32, self.dtype), name="bn")(
            x.astype(jnp.promote_types(jnp.float32, self.dtype)), train=train, momentum=momentum
        ).astype(self.dtype)
        return nn.relu(x)


class MainModel(nn.Module):
    """The full 8-stack detector (model/hourglass_torch7.py:78-129).
    Input (B, 256, 256, 3) -> output (S, B, 64, 64, 16) heatmaps, one per
    stack for intermediate supervision."""

    n_stacks: int = N_STACKS
    features: int = N_FEATURES
    n_joints: int = N_JOINTS
    depth: int = N_DEPTH
    momentum: Optional[float] = 0.1
    dtype: jnp.dtype = jnp.float32
    fused: bool = False  # whole-block Pallas ResModules (ops/pallas/resmodule)
    quantize: Optional[str] = None  # "int8": eval/serving-only (ops/int8.py)
    n_modules: int = 1  # ResModules per hourglass slot (CONFIG.nModules,
    # model/hourglass_torch7.py:9,47-49,58); the stem/heads are unaffected,
    # exactly as in the reference

    @nn.compact
    def __call__(self, x, *, train: bool = False, momentum="__unset__"):
        if momentum == "__unset__":
            momentum = self.momentum
        x = x.astype(self.dtype)
        kw = dict(momentum=self.momentum, dtype=self.dtype, fused=self.fused,
                  quantize=self.quantize)

        h = _conv(64, 7, "stem_conv", stride=2, dtype=self.dtype, fan_in=3 * 49)(x)
        h = TorchBatchNorm(momentum=self.momentum, dtype=jnp.promote_types(jnp.float32, self.dtype), name="stem_bn")(
            h.astype(jnp.promote_types(jnp.float32, self.dtype)), train=train, momentum=momentum
        ).astype(self.dtype)
        h = nn.relu(h)
        h = ResModule(64, 128, name="stem_res1", **kw)(h, train=train, momentum=momentum)
        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = ResModule(128, 128, name="stem_res2", **kw)(h, train=train, momentum=momentum)
        inter = ResModule(128, self.features, name="stem_res3", **kw)(
            h, train=train, momentum=momentum
        )

        heatmaps = []
        for i in range(self.n_stacks):
            ll = Hourglass(
                self.depth, self.features, self.momentum, self.dtype,
                self.fused, self.quantize, self.n_modules, name=f"hg_{i}",
            )(inter, train=train, momentum=momentum)
            ll = Lin(self.features, self.momentum, self.dtype, name=f"lin_{i}")(
                ll, train=train, momentum=momentum
            )
            htmap = _conv(
                self.n_joints, 1, f"htmap_{i}", dtype=self.dtype,
                fan_in=self.features,
            )(ll)
            heatmaps.append(htmap.astype(jnp.promote_types(jnp.float32, self.dtype)))
            if i < self.n_stacks - 1:
                ll_ = _conv(
                    self.features, 1, f"ll_bar_{i}", dtype=self.dtype,
                    fan_in=self.features,
                )(ll)
                htmap_ = _conv(
                    self.features, 1, f"htmap_bar_{i}", dtype=self.dtype,
                    fan_in=self.n_joints,
                )(htmap)
                inter = inter + ll_ + htmap_

        return jnp.stack(heatmaps, axis=0)  # (S, B, 64, 64, J)
