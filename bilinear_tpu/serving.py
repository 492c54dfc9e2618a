"""Serving — the production inference paths.

``LiftingServer``: batched 2D->3D lifting around the fused Pallas kernel
(ops/pallas/lifting.py):

  image-space (N, 16, 2) -> z-score with the TRAIN-split part stats
  -> fused kernel (BN folded, weights VMEM-resident, bf16 MXU)
  -> un-normalize with the TRAIN-split S stats -> (N, 16, 3) mm,
     root-centered (pelvis at the origin, reference convention).

Requests are padded to the kernel's tile size; weights are folded once at
construction. ``from_run_dir`` resumes the newest checkpoint with the
reference's dir-scan contract.

``End2EndServer``: the frame->3D showcase path (hourglass -> softargmax ->
remap -> normalize -> lifting as ONE XLA program, 0.6 ms batch-1 on chip —
benchmarks/RESULTS.md). Requests are chunked/padded to a fixed set of
compiled batch sizes so every dispatch hits a cached program, and
checkpoints hot-reload by polling the run dir for newer epochs. This is the
working rebuild of the reference's broken online path (webcam.py:27-45,
model/end2end.py:21-43).
"""
from __future__ import annotations

import os
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bilinear_tpu.data.h36m import H36MSplit
from bilinear_tpu.io.checkpoint import (
    latest_epoch,
    load_checkpoint,
    restore_state,
    resume_or_init_fast,
)
from bilinear_tpu.ops.pallas.lifting import lifting_forward, prepare_weights


class _LiftingEngine(NamedTuple):
    """Immutable snapshot of everything one forward needs: raw variables,
    folded/quantized weights, calibration scales, and (mesh mode) the
    sharded program with those scales baked in. ``_set_weights`` builds a
    complete new engine and publishes it with ONE reference assignment, and
    ``_forward`` reads ``self._engine`` exactly once — so a hot reload can
    never pair new weights with a previous checkpoint's calibration scales
    or compiled program, even mid-request on another thread."""

    params: object
    batch_stats: object
    prepared: object
    static_scales: Optional[tuple]
    sharded_fwd: Optional[object]


class LiftingServer:
    def __init__(
        self,
        params,
        batch_stats,
        mean_part: np.ndarray,
        std_part: np.ndarray,
        mean_s: np.ndarray,
        std_s: np.ndarray,
        dtype=jnp.bfloat16,
        interpret: bool = False,
        quantize: Optional[str] = None,
        mesh=None,
        calib_sample: Optional[np.ndarray] = None,
    ):
        """``quantize="int8"`` switches the hidden layers to dynamic int8
        MXU matmuls (ops/pallas/lifting_int8.py) — ~2x the bf16 MAC peak on
        v5e-class chips at <0.1 mm MPJPE cost (tests/test_lifting_int8.py).
        ``quantize="int8-static"`` additionally bakes calibrated activation
        scales in as compile-time constants (~14% over dynamic int8 on-chip,
        benchmarks/int8_scale_probe.py). ``calib_sample`` is the calibration
        batch — pass a z-scored sample of the ACTUAL training inputs
        (from_run_dir uses ``split.part``), so the per-layer activation
        ranges reflect the real pose distribution, not the standard-normal
        assumption (scales from the two differ where the network's
        activations are correlation-driven; tests/test_lifting_int8.py pins
        the accuracy gate under data calibration). When None, a
        standard-normal sample stands in — a reasonable surrogate because
        ``lift`` z-scores with the train stats. Inputs whose activations
        exceed the calibrated range SATURATE at +-127 (graceful clipping,
        bounded error — not NaN/garbage; also pinned by the tests). Scales
        are re-calibrated (and the program re-jitted, usually hitting the
        compile cache thanks to 3-significant-digit rounding) on checkpoint
        hot-reload. Default (None) is the bf16 kernel.

        ``mesh``: a ``jax.sharding.Mesh`` (parallel/mesh.py) for pod-scale
        offline lifting — the request batch is sharded over the 'data' axis
        and each device runs the fused kernel on its shard (weights
        replicated; no cross-device traffic in the forward). On one device
        this degenerates to the plain path."""
        if quantize not in (None, "int8", "int8-static"):
            raise ValueError(f"unsupported quantize mode {quantize!r}")
        self._quantize = quantize
        self._dtype = dtype
        self._interpret = interpret
        self._mesh = mesh
        self._calib_sample = None if calib_sample is None else np.asarray(
            calib_sample, np.float32
        ).reshape(-1, 32)[:4096]
        if mesh is not None:
            from bilinear_tpu.parallel.mesh import DATA_AXIS

            self._data_size = int(mesh.shape[DATA_AXIS])
        self._set_weights(params, batch_stats)
        self.parameter_dir: Optional[str] = None  # set by from_run_dir
        self.epoch = 0
        self._template = None
        self._mean_part = jnp.asarray(mean_part)
        self._std_part = jnp.asarray(std_part)
        self._mean_s = jnp.asarray(mean_s)
        self._std_s = jnp.asarray(std_s)

    def _build_sharded(self, prepared, static_scales):
        """Build the mesh-sharded forward for one weight snapshot. For
        ``int8-static`` the scales compile in as constants, so the program
        belongs to the snapshot, not the server."""
        from jax.sharding import PartitionSpec as P

        from bilinear_tpu.parallel.mesh import DATA_AXIS, shard_map_compat

        interpret = self._interpret
        if self._quantize in ("int8", "int8-static"):
            from bilinear_tpu.ops.pallas.lifting_int8 import (
                lifting_forward_int8,
            )

            def kernel(weights, x):
                return lifting_forward_int8(
                    x=x, prepared=weights, interpret=interpret,
                    static_scales=static_scales,
                )
        else:
            dtype = self._dtype

            def kernel(weights, x):
                return lifting_forward(
                    None, None, x, dtype=dtype, interpret=interpret,
                    prepared=weights,
                )

        batch_spec = P(DATA_AXIS)
        return jax.jit(
            shard_map_compat(
                kernel, mesh=self._mesh,
                in_specs=(P(), batch_spec), out_specs=batch_spec,
                check_rep=False,
            )
        )

    def _set_weights(self, params, batch_stats) -> None:
        """(Re)fold the checkpoint into the kernel's prepared form. Builds
        the COMPLETE new engine (weights, calibration scales, sharded
        program) before publishing it in one atomic reference assignment —
        a concurrent ``_forward`` sees either the old snapshot or the new
        one, never new weights with old scales (serving hot-reload runs on
        a different thread from the request batcher)."""
        static_scales = None
        if self._quantize in ("int8", "int8-static"):
            from bilinear_tpu.ops.pallas.lifting_int8 import (
                calibrate_scales,
                prepare_weights_int8,
            )

            prepared = prepare_weights_int8(params, batch_stats)
            if self._quantize == "int8-static":
                # Prefer the actual (z-scored) training inputs; fall back
                # to a standard-normal surrogate (lift() normalizes with
                # the train stats, so the marginals match by construction).
                if self._calib_sample is not None:
                    calib = jnp.asarray(self._calib_sample)
                else:
                    calib = jax.random.normal(
                        jax.random.PRNGKey(0), (4096, 32)
                    )
                static_scales = calibrate_scales(prepared, calib)
        else:
            prepared = prepare_weights(params, batch_stats, self._dtype)
        sharded_fwd = (
            self._build_sharded(prepared, static_scales)
            if self._mesh is not None else None
        )
        self._engine = _LiftingEngine(
            params, batch_stats, prepared, static_scales, sharded_fwd
        )

    @classmethod
    def from_run_dir(cls, run_dir: str, split: H36MSplit, **kw):
        """Serve the newest ``{run_dir}/parameter/{epoch}.save`` checkpoint
        (normalization stats come from the train split) with hot-reload
        enabled. Raises FileNotFoundError when the dir holds no checkpoint —
        a serving process must never silently serve random init."""
        from bilinear_tpu.train.bilinear import BilinearTrainer

        trainer = BilinearTrainer()
        parameter_dir = os.path.join(run_dir, "parameter")
        state, epoch = resume_or_init_fast(
            trainer.init_state, jax.random.PRNGKey(0), parameter_dir,
            pack=False,  # __init__ commits weights to device itself
        )
        # Abstract template (zero device work) — reload() restores numpy
        # payloads onto its structure.
        template = jax.eval_shape(trainer.init_state, jax.random.PRNGKey(0))
        if epoch == 0:
            raise FileNotFoundError(
                f"no checkpoint under {parameter_dir!r} — refusing to serve "
                "uninitialized weights"
            )
        kw.setdefault("calib_sample", split.part)  # z-scored train inputs
        server = cls(
            state.params,
            state.batch_stats,
            split.mean_part,
            split.std_part,
            split.mean_s,
            split.std_s,
            **kw,
        )
        server.parameter_dir = parameter_dir
        server.epoch = epoch
        server._template = template
        return server, epoch

    def reload(self) -> bool:
        """Swap in the newest checkpoint (re-folding the kernel weights) if
        one landed since construction. Returns True when weights changed."""
        if self.parameter_dir is None or self._template is None:
            return False
        newest = latest_epoch(self.parameter_dir)
        if newest <= self.epoch:
            return False
        try:
            payload = load_checkpoint(self.parameter_dir, newest)
        except FileNotFoundError:
            # Scan/load race with a trainer pruning old checkpoints
            # (--keep-checkpoints): the epoch we scanned was deleted before
            # we opened it. The next poll sees the newer one.
            return False
        state = restore_state(self._template, payload)
        self._set_weights(state.params, state.batch_stats)
        self.epoch = newest
        return True

    def _forward(self, x) -> jnp.ndarray:
        eng = self._engine  # ONE read: a consistent (weights, scales,
        # program) snapshot even if reload() publishes mid-request
        if self._mesh is not None:
            n = x.shape[0]
            pad = (-n) % self._data_size
            if pad:
                x = jnp.concatenate(
                    [x, jnp.zeros((pad, x.shape[1]), x.dtype)], axis=0
                )
            return eng.sharded_fwd(eng.prepared, x)[:n]
        if self._quantize in ("int8", "int8-static"):
            from bilinear_tpu.ops.pallas.lifting_int8 import (
                lifting_forward_int8,
            )

            return lifting_forward_int8(
                x=x, prepared=eng.prepared, interpret=self._interpret,
                static_scales=eng.static_scales,
            )
        return lifting_forward(
            eng.params,
            eng.batch_stats,
            x,
            dtype=self._dtype,
            interpret=self._interpret,
            prepared=eng.prepared,
        )

    def lift(self, keypoints_2d) -> jnp.ndarray:
        """(N, 16, 2) image-space keypoints (H36M 16-joint order, nose
        dropped) -> (N, 16, 3) root-centered 3D mm."""
        kp = jnp.asarray(keypoints_2d, jnp.float32)
        n = kp.shape[0]
        x = (kp.reshape(n, 32) - self._mean_part) / self._std_part
        out = self._forward(x)
        mm = out * self._std_s + self._mean_s
        return mm.reshape(n, 16, 3)

    def lift_normalized(self, x_norm) -> jnp.ndarray:
        """(N, 32) pre-normalized inputs -> (N, 48) normalized outputs (the
        raw model contract, for pipelines that manage stats themselves)."""
        return self._forward(jnp.asarray(x_norm, jnp.float32))

    def warm(self, row_counts) -> list:
        """Pre-compile the forward for each row count (programs are cached
        per TILE-padded shape; compiles otherwise happen lazily at the
        first request of a new shape — measured 20.5 s mid-request on a
        cold remote service, VERIFICATION_R5 §2). Returns the warmed row
        counts. Typical grid: TILE multiples up to the batcher's max_rows."""
        warmed = []
        for n in sorted(set(int(n) for n in row_counts)):
            jax.block_until_ready(
                self._forward(jnp.zeros((n, 32), jnp.float32))
            )
            warmed.append(n)
        return warmed


class End2EndServer:
    """Batched frame->3D serving over the fused End2End program.

    - ``predict(frames)`` accepts any request size; it is dispatched as
      greedy largest-first chunks over ``batch_sizes`` with the remainder
      zero-padded up to the smallest fitting size, so every dispatch reuses
      an already-compiled program (compile once per size, ever).
    - ``reload()`` polls ``parameter_dir`` for a newer epoch and swaps the
      weights in place — same shapes, so no recompilation. Call it between
      requests (or from a timer) for zero-downtime checkpoint rollover.
    """

    def __init__(
        self,
        variables,
        mean_part,
        std_part,
        mean_s,
        std_s,
        variant: str = "torch7",
        dtype=jnp.bfloat16,
        batch_sizes: Sequence[int] = (1, 8, 16),
        model_kw: Optional[dict] = None,
        parameter_dir: Optional[str] = None,
        epoch: int = 0,
        quantize: Optional[str] = None,
        mesh=None,
    ):
        """``quantize="int8"`` serves the detector's body convs as dynamic
        int8 MXU convolutions (ops/int8.py) — same checkpoints, eval-only;
        accuracy-gated by tests/test_hourglass_int8.py.

        ``mesh``: a ``jax.sharding.Mesh`` — each compiled program shards its
        request batch over the 'data' axis (weights replicated; the fused
        frame->3D program is pure XLA, so GSPMD partitions it directly).
        Every entry of ``batch_sizes`` must divide evenly over the mesh's
        data axis."""
        from bilinear_tpu.models.end2end import End2End

        if quantize not in (None, "int8"):
            raise ValueError(f"unsupported quantize mode {quantize!r}")
        if mesh is not None:
            from bilinear_tpu.parallel.mesh import DATA_AXIS

            n_data = int(mesh.shape[DATA_AXIS])
            bad = [b for b in batch_sizes if b % n_data]
            if bad:
                raise ValueError(
                    f"batch_sizes {bad} do not divide the mesh's data axis "
                    f"({n_data}); pick multiples of it"
                )
        self._mesh = mesh
        self.model = End2End(
            variant=variant, dtype=dtype, quantize=quantize,
            **(model_kw or {}),
        )
        self._variables = self._commit(variables)
        self._mean_part = jnp.asarray(mean_part)
        self._std_part = jnp.asarray(std_part)
        self._mean_s = jnp.asarray(np.asarray(mean_s).reshape(-1))
        self._std_s = jnp.asarray(np.asarray(std_s).reshape(-1))
        self.batch_sizes = tuple(sorted(set(int(b) for b in batch_sizes)))
        self.parameter_dir = parameter_dir
        self.epoch = epoch
        self._template = None  # set by from_run_dir; required for reload()

        model, mean_p, std_p = self.model, self._mean_part, self._std_part

        def fwd(variables, frames, centers, scales):
            if frames.dtype == jnp.uint8:
                # uint8 frames ship 4x fewer host->device bytes; rescale on
                # device (dtype is static under jit — one executable per
                # (batch, dtype) pair).
                frames = frames.astype(jnp.float32) / 255.0
            _, pose2d, pose3d = model.apply(
                variables, frames, centers, scales, mean_p, std_p,
                train=False,
            )
            return pose2d, pose3d

        # One jitted callable for every batch size: jax.jit caches one
        # executable per (input shape, dtype), so each entry of batch_sizes
        # compiles once per frame dtype served (uint8 and float32 are
        # separate programs) — _chunks() guarantees only those shapes are
        # ever dispatched. Warm BOTH dtypes you intend to serve.
        if mesh is None:
            self._jitted = jax.jit(fwd)
        else:
            from bilinear_tpu.parallel.mesh import batch_sharding, replicated

            self._jitted = jax.jit(
                fwd,
                in_shardings=(
                    replicated(mesh),
                    batch_sharding(mesh, 4),
                    batch_sharding(mesh, 2),
                    batch_sharding(mesh, 1),
                ),
                out_shardings=(
                    batch_sharding(mesh, 3),
                    batch_sharding(mesh, 2),
                ),
            )

    def _commit(self, variables):
        """Pin the weights on device ONCE. Checkpoint restore yields numpy
        trees, and passing those into a jitted call re-uploads every leaf on
        EVERY dispatch — measured 2.3 s/dispatch for the production 25 M-
        param program through a 50 MB/s host link, dwarfing the 0.6 ms of
        compute. Mesh mode commits them replicated so GSPMD doesn't
        re-place them either."""
        from bilinear_tpu.utils.residency import packed_device_put

        if self._mesh is None:
            return packed_device_put(variables)
        from bilinear_tpu.parallel.mesh import replicated

        return packed_device_put(variables, replicated(self._mesh))

    @classmethod
    def from_run_dir(cls, run_dir: str, split: H36MSplit, variant="torch7",
                     model_kw: Optional[dict] = None, **kw):
        """Resume the newest End2End checkpoint from
        ``{run_dir}/parameter`` (reference dir-scan contract) and serve it
        with hot-reload enabled."""
        from bilinear_tpu.train.end2end import End2EndTrainer

        trainer = End2EndTrainer(variant=variant, model_kw=model_kw)
        mean = jnp.asarray(split.mean_part)
        std = jnp.asarray(split.std_part)
        parameter_dir = os.path.join(run_dir, "parameter")
        init_fn = lambda k: trainer.init_state(k, mean, std)
        state, epoch = resume_or_init_fast(
            init_fn, jax.random.PRNGKey(0),
            parameter_dir, pack=False,  # __init__ commits weights to device
        )
        template = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
        if epoch == 0:
            raise FileNotFoundError(
                f"no checkpoint under {parameter_dir!r} — refusing to serve "
                "uninitialized weights"
            )
        server = cls(
            {"params": state.params, "batch_stats": state.batch_stats},
            split.mean_part, split.std_part, split.mean_s, split.std_s,
            variant=variant, model_kw=model_kw,
            parameter_dir=parameter_dir, epoch=epoch, **kw,
        )
        server._template = template
        return server

    # ---------------------------------------------------------- hot reload
    def reload(self) -> bool:
        """Swap in the newest checkpoint if one landed since construction.
        Returns True when weights changed."""
        if self.parameter_dir is None or self._template is None:
            return False
        newest = latest_epoch(self.parameter_dir)
        if newest <= self.epoch:
            return False
        try:
            payload = load_checkpoint(self.parameter_dir, newest)
        except FileNotFoundError:
            # Scan/load race with a pruning trainer (see LiftingServer).
            return False
        state = restore_state(self._template, payload)
        self._variables = self._commit(
            {"params": state.params, "batch_stats": state.batch_stats}
        )
        self.epoch = newest
        return True

    # ------------------------------------------------------------ dispatch
    def _chunks(self, n: int):
        """Greedy largest-first split of n into compiled batch sizes; the
        remainder is padded up to the smallest size that fits."""
        sizes = self.batch_sizes
        out = []
        remaining = n
        while remaining > 0:
            fit = [b for b in sizes if b <= remaining]
            if fit:
                out.append((fit[-1], fit[-1]))
                remaining -= fit[-1]
            else:
                padded = next(b for b in sizes if b >= remaining)
                out.append((remaining, padded))
                remaining = 0
        return out

    def predict(
        self, frames, centers=None, scales=None
    ) -> Tuple[np.ndarray, np.ndarray]:
        """frames (N, 256, 256, 3) in [0, 1] (uint8 accepted) ->
        (pose2d (N, 16, 2) source-image px, pose3d (N, 16, 3) mm,
        root-centered). Defaults: full-frame crop (center 128, scale
        256/200 — webcam.py:13-25 semantics).

        uint8 frames stay uint8 all the way to the device (4x fewer
        host->device bytes than f32; /255 rescale happens in-program)."""
        frames = np.asarray(frames)
        if frames.dtype != np.uint8:
            # asarray preserves the no-copy fast path for f32 inputs
            # (astype always copies — ~12.6 MB per b16 request).
            frames = np.asarray(frames, np.float32)
        n = frames.shape[0]
        if centers is None:
            centers = np.full((n, 2), 128.0, np.float32)
        if scales is None:
            scales = np.full((n,), 256.0 / 200.0, np.float32)

        pose2d = np.zeros((n, 16, 2), np.float32)
        pose3d_n = np.zeros((n, 48), np.float32)
        # Snapshot once: a concurrent hot-reload between chunk dispatches
        # must not mix weight epochs within one response.
        variables = self._variables
        # Dispatch every chunk before fetching any: jax dispatch is async,
        # so the device pipelines the chunks back-to-back and the host
        # round-trips overlap with compute instead of serializing after it.
        dispatched = []
        done = 0
        for take, batch in self._chunks(n):
            idx = slice(done, done + take)
            f = frames[idx]
            c = centers[idx]
            s = scales[idx]
            if take < batch:
                pad = batch - take
                f = np.concatenate([f, np.zeros((pad,) + f.shape[1:], f.dtype)])
                c = np.concatenate([c, np.full((pad, 2), 128.0, np.float32)])
                s = np.concatenate([s, np.ones((pad,), np.float32)])
            dispatched.append((idx, take, self._jitted(variables, f, c, s)))
            done += take
        for idx, take, (p2, p3) in dispatched:
            pose2d[idx] = np.asarray(p2, np.float32)[:take]
            pose3d_n[idx] = np.asarray(p3, np.float32)[:take]

        mm = pose3d_n * np.asarray(self._std_s) + np.asarray(self._mean_s)
        return pose2d, mm.reshape(n, 16, 3)

    def warm(self, dtypes=("uint8",)) -> list:
        """Pre-compile one program per (batch size, frame dtype) — jit
        caches per shape+dtype, so an unwarmed pair compiles lazily at its
        first request (minutes on a cold remote service; measured 20.5 s
        mid-request, VERIFICATION_R5 §2). Warm BOTH dtypes if the daemon
        will serve mixed u8/f32 clients. Returns the (batch, dtype) pairs
        warmed."""
        warmed = []
        for dt in dtypes:
            np_dt = np.uint8 if dt in ("uint8", "u8") else np.float32
            for b in self.batch_sizes:
                self.predict(np.zeros((b, 256, 256, 3), np_dt))
                warmed.append((b, np.dtype(np_dt).name))
        return warmed
