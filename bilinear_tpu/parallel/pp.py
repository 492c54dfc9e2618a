"""Pipeline parallelism over hourglass stacks (inference/serving).

The reference is single-device (SURVEY.md §2 parallelism census) and the
25 M-param detector fits one chip, so PP has no reference counterpart — this
exists to complete the framework's scaling story alongside DP
(parallel/mesh.py) and TP (parallel/tp.py): the stacked hourglass
(/root/reference/model/hourglass_torch7.py:107-122) is a natural pipeline —
8 identical stacks chained through the ``inter`` feedback tensor — so its
stacks shard over a 'stage' mesh axis and microbatches stream through a
ppermute ring.

Design (TPU-native):
- The per-stack computation is re-expressed as ``StackBlock`` (hourglass ->
  lin -> heatmap head -> feedback convs), one flax module with a FIXED
  variable tree so all stacks stack into one pytree with a leading
  (n_stacks,) axis. ``split_pipeline_variables`` converts a trained
  ``MainModel`` checkpoint losslessly (the reference allocates no feedback
  convs on the final stack, hourglass_torch7.py:117-121 — those are
  zero-filled here, making the final feedback a no-op).
- ``pipeline_forward`` runs the classic synchronous pipeline schedule under
  ``shard_map``: the stacked stack-params shard over 'stage' (each device
  holds n_stacks/S consecutive stacks), microbatches enter at stage 0, and
  activations move stage->stage+1 via ``lax.ppermute`` inside a
  ``lax.scan`` over M + S - 1 ticks. The stem runs once before the pipeline
  as an ordinary GSPMD program.
- ``pipeline_forward`` itself runs in eval mode (BatchNorm running stats):
  microbatching is then exact, so the pipelined forward equals the
  single-device ``MainModel`` forward to float tolerance
  (tests/test_parallel_pp.py). TRAINING is provided separately by
  ``make_pp_train_step`` (below): GPipe-style microbatch-accumulated
  fwd+bwd over the stage mesh, with per-microbatch BN batch stats applied
  sequentially to match the reference's batch-8 steps; one PP train step
  equals the single-device gradient-accumulated step
  (tests/test_parallel_pp.py, dryrun leg 9). The 25 M-param detector does
  not NEED PP to fit — both paths exist to complete the scaling story, and
  that trade-off is documented, not hidden.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.sharding import Mesh, PartitionSpec as P

from bilinear_tpu.parallel.mesh import shard_map_compat as shard_map

from bilinear_tpu.core.norm import TorchBatchNorm
from bilinear_tpu.models.hourglass_torch7 import (
    Hourglass,
    Lin,
    N_DEPTH,
    N_FEATURES,
    N_JOINTS,
    ResModule,
    _conv,
)

STAGE_AXIS = "stage"

_STEM_KEYS = ("stem_conv", "stem_bn", "stem_res1", "stem_res2", "stem_res3")
def make_stage_mesh(devices=None, stages: Optional[int] = None) -> Mesh:
    """1-axis ('stage',) mesh for pipeline execution."""
    devices = list(devices if devices is not None else jax.devices())
    if stages is not None:
        if stages > len(devices):
            raise ValueError(
                f"requested {stages} stages but only {len(devices)} devices "
                "are available"
            )
        devices = devices[:stages]
    return Mesh(np.asarray(devices), (STAGE_AXIS,))


class StemBlock(nn.Module):
    """MainModel's stem (models/hourglass_torch7.py:325-335) as a standalone
    module with the SAME variable names, so a MainModel checkpoint's stem
    subtree loads directly. The eval-mode math is deliberately a line-match
    of MainModel's — drift is caught by the equality tests in
    tests/test_parallel_pp.py, which compare against MainModel itself."""

    features: int = N_FEATURES
    dtype: jnp.dtype = jnp.float32
    fused: bool = False
    quantize: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        sdtype = jnp.promote_types(jnp.float32, self.dtype)
        kw = dict(dtype=self.dtype, fused=self.fused, quantize=self.quantize)
        x = x.astype(self.dtype)
        h = _conv(64, 7, "stem_conv", stride=2, dtype=self.dtype,
                  fan_in=3 * 49)(x)
        h = TorchBatchNorm(momentum=0.1, dtype=sdtype, name="stem_bn")(
            h.astype(sdtype), train=train
        ).astype(self.dtype)
        h = nn.relu(h)
        h = ResModule(64, 128, name="stem_res1", **kw)(h, train=train)
        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = ResModule(128, 128, name="stem_res2", **kw)(h, train=train)
        return ResModule(128, self.features, name="stem_res3", **kw)(
            h, train=train
        )


class StackBlock(nn.Module):
    """One hourglass stack incl. heads and feedback (the loop body at
    models/hourglass_torch7.py:338-360) with stack-index-free variable names
    ('hg', 'lin', 'htmap', 'll_bar', 'htmap_bar') so every stack shares one
    tree structure. Returns (heatmap, next_inter); the final stack's
    (zero-filled) feedback makes next_inter == inter there. Like StemBlock,
    this mirrors MainModel's loop body — the parity tests guard drift."""

    features: int = N_FEATURES
    n_joints: int = N_JOINTS
    depth: int = N_DEPTH
    dtype: jnp.dtype = jnp.float32
    fused: bool = False
    quantize: Optional[str] = None
    n_modules: int = 1

    @nn.compact
    def __call__(self, inter, *, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        ll = Hourglass(self.depth, self.features, dtype=self.dtype,
                       fused=self.fused, quantize=self.quantize,
                       n_modules=self.n_modules,
                       name="hg")(inter, train=train)
        ll = Lin(self.features, dtype=self.dtype, name="lin")(
            ll, train=train
        )
        htmap = _conv(self.n_joints, 1, "htmap", dtype=self.dtype,
                      fan_in=self.features)(ll)
        ll_ = _conv(self.features, 1, "ll_bar", dtype=self.dtype,
                    fan_in=self.features)(ll)
        htmap_ = _conv(self.features, 1, "htmap_bar", dtype=self.dtype,
                       fan_in=self.n_joints)(htmap)
        out = htmap.astype(jnp.promote_types(jnp.float32, self.dtype))
        return out, inter + ll_ + htmap_


def _zero_feedback(features: int, n_joints: int, col):
    """Zero-filled feedback-conv variables for the final stack (collection
    'params' has them; 'batch_stats' has none)."""
    if col != "params":
        return {}
    return {
        "ll_bar": {
            "kernel": jnp.zeros((1, 1, features, features), jnp.float32),
            "bias": jnp.zeros((features,), jnp.float32),
        },
        "htmap_bar": {
            "kernel": jnp.zeros((1, 1, n_joints, features), jnp.float32),
            "bias": jnp.zeros((features,), jnp.float32),
        },
    }


def split_pipeline_variables(
    variables, n_stacks: int, *, features: int = N_FEATURES,
    n_joints: int = N_JOINTS,
):
    """MainModel variables -> (stem_variables, stacked_stack_variables).

    The stacked tree has a leading (n_stacks,) axis on every leaf and the
    StackBlock tree structure; shard it over 'stage' to give each pipeline
    stage its consecutive stacks."""
    per_stack = []
    for i in range(n_stacks):
        entry = {}
        for col, tree in variables.items():
            sub = {}
            for short, full in (
                ("hg", f"hg_{i}"), ("lin", f"lin_{i}"),
                ("htmap", f"htmap_{i}"), ("ll_bar", f"ll_bar_{i}"),
                ("htmap_bar", f"htmap_bar_{i}"),
            ):
                if full in tree:
                    sub[short] = tree[full]
            sub.update(
                {k: v for k, v in _zero_feedback(
                    features, n_joints, col
                ).items() if k not in sub}
            )
            entry[col] = sub
        per_stack.append(entry)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *per_stack)
    stem = {
        col: {k: tree[k] for k in _STEM_KEYS if k in tree}
        for col, tree in variables.items()
    }
    return stem, stacked


def make_pipeline_fn(
    variables,
    mesh: Mesh,
    *,
    n_stacks: int = 8,
    features: int = N_FEATURES,
    n_joints: int = N_JOINTS,
    depth: int = N_DEPTH,
    dtype=jnp.float32,
    microbatches: Optional[int] = None,
    fused: bool = False,
    quantize: Optional[str] = None,
):
    """Compile-once serving entry: split/stack the MainModel variables ONCE,
    return a jitted ``fn(images) -> heatmaps`` whose whole body (stem +
    pipeline) is one XLA program. Re-traces only on a new batch shape.

    ``fused``/``quantize`` mirror MainModel's execution knobs (whole-block
    Pallas kernels / dynamic-int8 eval convs) so a serving config keeps its
    kernel path under PP."""
    n_stages = mesh.shape[STAGE_AXIS]
    if n_stacks % n_stages:
        raise ValueError(
            f"{n_stages} stages do not divide {n_stacks} stacks"
        )
    local = n_stacks // n_stages
    stem_vars, stack_vars = split_pipeline_variables(
        variables, n_stacks, features=features, n_joints=n_joints
    )
    stem = StemBlock(features, dtype, fused, quantize)
    block = StackBlock(features, n_joints, depth, dtype, fused, quantize)
    sdtype = jnp.promote_types(jnp.float32, dtype)
    stack_specs = jax.tree.map(lambda _: P(STAGE_AXIS), stack_vars)

    def program(stem_v, stack_v, images):
        B = images.shape[0]
        M = microbatches if microbatches is not None else n_stages
        if B % M:
            raise ValueError(f"batch {B} does not divide {M} microbatches")
        mb = B // M
        stem_out = stem.apply(stem_v, images)
        h, w = stem_out.shape[1:3]
        xs = stem_out.reshape(M, mb, h, w, features)

        def body(local_vars, xs_rep):
            s = jax.lax.axis_index(STAGE_AXIS)

            def tick(carry, t):
                inter, out = carry
                x_t = jax.lax.dynamic_index_in_dim(
                    xs_rep, jnp.clip(t, 0, M - 1), 0, keepdims=False
                )
                inter = jnp.where(s == 0, x_t, inter)
                htmap = None
                for j in range(local):
                    pv = jax.tree.map(lambda a: a[j], local_vars)
                    htmap, inter = block.apply(pv, inter)
                idx = t - (n_stages - 1)
                upd = jax.lax.dynamic_update_index_in_dim(
                    out, htmap.astype(out.dtype), jnp.clip(idx, 0, M - 1), 0
                )
                out = jnp.where((s == n_stages - 1) & (idx >= 0), upd, out)
                if n_stages > 1:
                    inter = jax.lax.ppermute(
                        inter, STAGE_AXIS,
                        [(i, i + 1) for i in range(n_stages - 1)],
                    )
                return (inter, out), None

            init = (
                jnp.zeros((mb, h, w, features), stem_out.dtype),
                jnp.zeros((M, mb, h, w, n_joints), sdtype),
            )
            # The carry is stage-varying (each stage holds different state);
            # mark the replicated zeros as such for shard_map's VMA check.
            init = jax.tree.map(
                lambda a: jax.lax.pcast(a, (STAGE_AXIS,), to="varying"), init
            )
            (_, out), _ = jax.lax.scan(
                tick, init, jnp.arange(M + n_stages - 1)
            )
            # Only the last stage holds real outputs; replicate via psum.
            out = jax.lax.psum(
                jnp.where(s == n_stages - 1, out, jnp.zeros_like(out)),
                STAGE_AXIS,
            )
            return out

        out = shard_map(
            body, mesh=mesh,
            in_specs=(stack_specs, P()),
            out_specs=P(),
        )(stack_v, xs)
        return out.reshape(B, out.shape[-3], out.shape[-2], n_joints)

    jitted = jax.jit(program)
    return lambda images: jitted(stem_vars, stack_vars, images)


def pipeline_forward(
    variables,
    images,  # (B, R, R, 3)
    mesh: Mesh,
    *,
    n_stacks: int = 8,
    features: int = N_FEATURES,
    n_joints: int = N_JOINTS,
    depth: int = N_DEPTH,
    dtype=jnp.float32,
    microbatches: Optional[int] = None,
    fused: bool = False,
    quantize: Optional[str] = None,
) -> jnp.ndarray:
    """One-shot convenience around ``make_pipeline_fn`` (splits the variable
    tree and builds the program per call — serving loops should hold the
    function returned by ``make_pipeline_fn`` instead).

    Eval-mode pipelined forward: final-stack heatmaps (B, R/4, R/4, J),
    numerically matching ``MainModel.apply(...)[-1]``.

    The batch splits into M microbatches (default: one per stage); stage s
    holds stacks [s*k, (s+1)*k), k = n_stacks / n_stages. Total ticks
    M + S - 1; utilization M / (M + S - 1)."""
    fn = make_pipeline_fn(
        variables, mesh, n_stacks=n_stacks, features=features,
        n_joints=n_joints, depth=depth, dtype=dtype,
        microbatches=microbatches, fused=fused, quantize=quantize,
    )
    return fn(images)


def pipeline_end2end(
    variables,  # End2End variable tree (models/end2end.py, torch7 variant)
    images,  # (B, 256, 256, 3)
    centers,  # (B, 2)
    scales,  # (B,)
    mean_part,  # (32,)
    std_part,  # (32,)
    mesh: Mesh,
    *,
    temperature: float = 10.0,
    n_stacks: int = 8,
    features: int = N_FEATURES,
    n_joints: int = N_JOINTS,
    depth: int = N_DEPTH,
    dtype=jnp.float32,
    microbatches: Optional[int] = None,
):
    """The fused frame->3D program (models/end2end.py) with its detector
    pipelined over a 'stage' mesh: stem -> pipelined stacks ->
    ``ops.decode.decode_to_normalized`` (the same glue chain End2End uses)
    -> lifting MLP. Returns (pose_img, pose_3d), matching
    ``End2End.apply(...)[1:]`` to float tolerance
    (tests/test_parallel_pp.py)."""
    from bilinear_tpu.models.bilinear import BilinearUnit
    from bilinear_tpu.ops.decode import decode_to_normalized

    hg_vars = {col: tree["hourglass"] for col, tree in variables.items()}
    heat = pipeline_forward(
        hg_vars, images, mesh,
        n_stacks=n_stacks, features=features, n_joints=n_joints,
        depth=depth, dtype=dtype, microbatches=microbatches,
    )
    pose_img, normalized = decode_to_normalized(
        heat, centers, scales, mean_part, std_part, temperature
    )
    bl_vars = {col: tree["bilinear"] for col, tree in variables.items()}
    pose_3d = BilinearUnit(dtype=dtype).apply(bl_vars, normalized, train=False)
    return pose_img, pose_3d


def merge_pipeline_variables(stem_vars, stacked_vars, n_stacks: int):
    """Inverse of split_pipeline_variables: (stem, stacked) -> MainModel
    variables. The final stack's zero-filled feedback convs are dropped
    (the reference never allocates them, hourglass_torch7.py:117-121), so a
    PP-trained state round-trips into an ordinary MainModel checkpoint."""
    out = {col: dict(tree) for col, tree in stem_vars.items()}
    for col in stacked_vars:
        for i in range(n_stacks):
            per = jax.tree.map(lambda a: a[i], stacked_vars[col])
            for short, full in (
                ("hg", f"hg_{i}"), ("lin", f"lin_{i}"),
                ("htmap", f"htmap_{i}"), ("ll_bar", f"ll_bar_{i}"),
                ("htmap_bar", f"htmap_bar_{i}"),
            ):
                if short not in per:
                    continue
                if i == n_stacks - 1 and short in ("ll_bar", "htmap_bar"):
                    continue  # fake feedback convs of the final stack
                out.setdefault(col, {})[full] = per[short]
    return out


def make_pp_train_step(
    mesh: Mesh,
    tx,
    *,
    n_stacks: int = 8,
    features: int = N_FEATURES,
    n_joints: int = N_JOINTS,
    depth: int = N_DEPTH,
    dtype=jnp.float32,
    microbatches: int = None,
):
    """Pipeline-parallel TRAINING step (GPipe-style synchronous schedule).

    The round-3 gap: PP was eval-only. This extends the same 'stage'-mesh
    ppermute ring to fwd+bwd: microbatches stream forward through the ring
    inside ``lax.scan``, every stack computes its intermediate-supervision
    MSE at its own stage (losses psum'd), and the backward pass is JAX's
    transpose of the whole program — ``ppermute`` transposes to the reverse
    ring, so activation gradients flow stage S-1 -> 0 with no hand-written
    schedule. One optimizer update per step over the combined (stem,
    stacked-stacks) tree: global-norm clip(1) -> torch-RMSprop, exactly the
    single-device trainer's chain.

    Semantics (exact, tested in tests/test_parallel_pp.py and dryrun leg 9):
    the update equals a single-device GRADIENT-ACCUMULATED step over the
    same M microbatches — per-microbatch BN batch statistics (each
    microbatch is a reference-sized batch-8 step, train_hourglass.py:63-95)
    applied sequentially, grads averaged, one update. With M=1 this IS the
    single-device full-batch train step.

    Returns ``step(stem_vars, stacked_vars, opt_state, crops, targets) ->
    (stem_vars, stacked_vars, opt_state, loss)``; build opt_state with
    ``tx.init({'stem': stem_params, 'stacks': stacked_params})``.

    Tolerance note (tests/test_parallel_pp.py): losses and GRADS match the
    comparator to float32 reassociation noise (~1e-6 rel), but torch-RMSprop's
    FIRST step divides by sqrt(0.01*g^2) ~= 0.1|g|, making the update
    ~lr*sign(g) — near-zero grads amplify that noise into ~1e-4-absolute
    parameter differences. Gradient equality is the exactness check;
    parameter equality is asserted at the amplified tolerance.
    """
    loss_fn = make_pp_loss_fn(
        mesh, n_stacks=n_stacks, features=features, n_joints=n_joints,
        depth=depth, dtype=dtype, microbatches=microbatches,
    )

    def step(stem_vars, stacked_vars, opt_state, crops, targets):
        params = {"stem": stem_vars["params"], "stacks": stacked_vars["params"]}
        (loss, (stem_stats, stack_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, stem_vars["batch_stats"], stacked_vars["batch_stats"],
          crops, targets)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
        return (
            {"params": params["stem"], "batch_stats": stem_stats},
            {"params": params["stacks"], "batch_stats": stack_stats},
            opt_state,
            loss,
        )

    return step


def make_pp_loss_fn(
    mesh: Mesh,
    *,
    n_stacks: int = 8,
    features: int = N_FEATURES,
    n_joints: int = N_JOINTS,
    depth: int = N_DEPTH,
    dtype=jnp.float32,
    microbatches: int = None,
):
    """The differentiable pipeline loss under ``make_pp_train_step`` —
    exposed so tests can compare d(loss)/d(params) against the single-device
    gradient-accumulated comparator directly.

    ``loss_fn(params, stem_stats, stack_stats, crops, targets) ->
    (loss, (new_stem_stats, new_stack_stats))`` with
    ``params = {'stem': ..., 'stacks': ...}``.
    """
    n_stages = mesh.shape[STAGE_AXIS]
    if n_stacks % n_stages:
        raise ValueError(f"{n_stages} stages do not divide {n_stacks} stacks")
    local = n_stacks // n_stages
    M = microbatches or n_stages

    stem = StemBlock(features, dtype)
    block = StackBlock(features, n_joints, depth, dtype)
    sdtype = jnp.promote_types(jnp.float32, dtype)

    def loss_fn(params, stem_stats, stack_stats, crops, targets):
        B = crops.shape[0]
        if B % M:
            raise ValueError(f"batch {B} does not divide {M} microbatches")
        mb = B // M
        xs_in = crops.reshape(M, mb, *crops.shape[1:])

        # Stem per microbatch (sequential BN running-stat updates), matching
        # the gradient-accumulation comparator.
        def stem_micro(stats, x):
            out, mut = stem.apply(
                {"params": params["stem"], "batch_stats": stats},
                x, train=True, mutable=["batch_stats"],
            )
            return mut["batch_stats"], out

        new_stem_stats, stem_outs = jax.lax.scan(stem_micro, stem_stats, xs_in)
        h, w = stem_outs.shape[2:4]
        # (B, J, hm, hm) targets -> per-microbatch (M, mb, hm, hm, J)
        tg = jnp.transpose(targets, (0, 2, 3, 1)).reshape(
            M, mb, *targets.shape[2:], targets.shape[1]
        )

        stack_specs = jax.tree.map(lambda _: P(STAGE_AXIS), params["stacks"])
        stat_specs = jax.tree.map(lambda _: P(STAGE_AXIS), stack_stats)

        def body(stack_params, stats_local, xs_rep, tg_rep):
            s = jax.lax.axis_index(STAGE_AXIS)

            def tick(carry, t):
                inter, stats_l, loss_acc = carry
                m = jnp.clip(t - s, 0, M - 1)
                active = (t >= s) & (t - s < M)
                x_t = jax.lax.dynamic_index_in_dim(
                    xs_rep, jnp.clip(t, 0, M - 1), 0, keepdims=False
                )
                inter = jnp.where(s == 0, x_t, inter)
                tgt_m = jax.lax.dynamic_index_in_dim(tg_rep, m, 0, keepdims=False)
                new_stats = []
                stack_loss = jnp.zeros((), sdtype)
                for j in range(local):
                    pv = {
                        "params": jax.tree.map(lambda a: a[j], stack_params),
                        "batch_stats": jax.tree.map(lambda a: a[j], stats_l),
                    }
                    (htmap, inter), mut = block.apply(
                        pv, inter, train=True, mutable=["batch_stats"]
                    )
                    # per-stack mean MSE (train_hourglass.py:76)
                    stack_loss = stack_loss + jnp.mean(
                        jnp.square(htmap.astype(sdtype) - tgt_m)
                    )
                    new_stats.append(jax.tree.map(
                        lambda new, old: jnp.where(active, new, old),
                        mut["batch_stats"],
                        jax.tree.map(lambda a: a[j], stats_l),
                    ))
                stats_l = jax.tree.map(
                    lambda *xs: jnp.stack(xs), *new_stats
                )
                loss_acc = loss_acc + jnp.where(active, stack_loss, 0.0)
                if n_stages > 1:
                    inter = jax.lax.ppermute(
                        inter, STAGE_AXIS,
                        [(i, i + 1) for i in range(n_stages - 1)],
                    )
                return (inter, stats_l, loss_acc), None

            # inter/loss start as replicated zeros -> mark stage-varying
            # for shard_map's VMA check; stats_local is ALREADY varying (it
            # enters through a P(STAGE_AXIS) spec), so pcast must skip it.
            varying = lambda a: jax.lax.pcast(a, (STAGE_AXIS,), to="varying")
            init = (
                varying(jnp.zeros((mb, h, w, features), stem_outs.dtype)),
                stats_local,
                varying(jnp.zeros((), sdtype)),
            )
            (_, stats_l, loss_acc), _ = jax.lax.scan(
                tick, init, jnp.arange(M + n_stages - 1)
            )
            return jax.lax.psum(loss_acc, STAGE_AXIS), stats_l

        loss, new_stack_stats = shard_map(
            body, mesh=mesh,
            in_specs=(stack_specs, stat_specs, P(), P()),
            out_specs=(P(), jax.tree.map(lambda _: P(STAGE_AXIS), stack_stats)),
        )(params["stacks"], stack_stats, stem_outs, tg)
        # full-batch loss == mean over microbatches of per-microbatch loss
        loss = loss / M
        return loss, (new_stem_stats, new_stack_stats)

    return loss_fn
