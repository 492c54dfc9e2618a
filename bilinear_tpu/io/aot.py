"""AOT serving artifacts: jax.export (StableHLO) programs in one file.

The reference has no deployment story — its online path is broken
(/root/reference/webcam.py:6-11, model/end2end.py:21-43) — and the live
in-process servers (serving.py) need the framework, flax model code, and the
checkpoint format present on the serving box. This module captures a serving
program ONCE into a single versioned artifact: weights folded in as program
constants, normalization inside the program, manifest alongside. A box with
jax + numpy (no flax, no checkpoints, not even this package — the loader
half of this file is self-contained) runs it:

    pose = load_artifact("lifting.aot")
    mm = pose(keypoints)            # (N, 16, 2) px -> (N, 16, 3) mm

Why AOT instead of (or alongside) the live servers:

- **cross-platform lowering**: export FOR "tpu" from a CPU-only build box,
  or a multi-platform ("cpu", "tpu") artifact that runs on both;
- **symbolic batch** (lifting): one program serves every request size — no
  per-shape recompiles, no padding. The end2end conv program is exported at
  fixed batch sizes instead and the loader pads/chunks to the nearest
  compiled size (the same greedy policy as serving.py::End2EndServer);
- **version pinning**: the manifest records the jax version, platforms, and
  checkpoint epoch; jax.export's calling convention carries cross-release
  compatibility guarantees that re-tracing from source does not.

The exported program is the pure-XLA path (``model.apply``): StableHLO
round-trips it on every platform, and it is within ~5% of the fused Pallas
kernel (bench.py). Pallas/int8 serving stays the in-process
``LiftingServer``'s job.

Artifact format (zip): ``manifest.json`` + one ``program_{tag}.jaxexport``
per entry, tag = ``sym`` (symbolic batch) or ``b{N}`` (fixed batch N).
"""
from __future__ import annotations

import json
import os
import zipfile
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

FORMAT = "bilinear-tpu-aot-v1"


# ---------------------------------------------------------------------------
# Export side (needs the framework)
# ---------------------------------------------------------------------------

def export_lifting(
    params,
    batch_stats,
    mean_part,
    std_part,
    mean_s,
    std_s,
    *,
    dtype=jnp.bfloat16,
    platforms: Optional[Sequence[str]] = None,
    batch_sizes: Optional[Sequence[int]] = None,
    quantize: Optional[str] = None,
    calib_sample=None,
) -> Dict[str, jax_export.Exported]:
    """Export the full lifting serving computation — image-space (b, 16, 2)
    keypoints -> z-score with train-split stats -> BilinearUnit ->
    un-normalize -> (b, 16, 3) root-centered mm (serving.py::LiftingServer
    .lift semantics; protocol per /root/reference/valid_bilinear.py:51-54).

    ``batch_sizes=None`` exports ONE program with a symbolic batch dim.

    ``quantize="int8-static"`` exports the calibrated static-scale int8
    forward instead (hidden layers as int8 dot_generals with the activation
    scales baked in as constants — the only quantized mode with no
    data-dependent scale math, hence the only symbolic-batch-exportable
    one; dynamic ``"int8"`` and the Pallas kernels stay the in-process
    LiftingServer's job)."""
    mean_p = jnp.asarray(np.asarray(mean_part).reshape(-1), jnp.float32)
    std_p = jnp.asarray(np.asarray(std_part).reshape(-1), jnp.float32)
    mean_3 = jnp.asarray(np.asarray(mean_s).reshape(-1), jnp.float32)
    std_3 = jnp.asarray(np.asarray(std_s).reshape(-1), jnp.float32)

    if quantize == "int8-static":
        from bilinear_tpu.ops.pallas.lifting_int8 import (
            calibrate_scales,
            int8_static_forward,
            prepare_weights_int8,
        )

        prepared = prepare_weights_int8(params, batch_stats)
        # Calibrate on the actual z-scored training inputs when the caller
        # supplies them (same policy as LiftingServer); a standard-normal
        # sample is the fallback surrogate (lift z-scores with the train
        # stats first, so the marginals match by construction).
        if calib_sample is not None:
            calib = jnp.asarray(
                np.asarray(calib_sample, np.float32).reshape(-1, 32)[:4096]
            )
        else:
            calib = jax.random.normal(jax.random.PRNGKey(0), (4096, 32))
        forward = int8_static_forward(prepared, calibrate_scales(prepared, calib))
    elif quantize is not None:
        raise ValueError(
            f"unsupported AOT quantize mode {quantize!r} (only 'int8-static' "
            "has no data-dependent scale math to export)"
        )
    else:
        from bilinear_tpu.models.bilinear import BilinearUnit

        model = BilinearUnit(dtype=dtype)
        variables = {"params": params, "batch_stats": batch_stats}

        def forward(x):
            return model.apply(variables, x, train=False)

    def lift(kp):
        x = (kp.reshape(kp.shape[0], 32) - mean_p) / std_p
        out = forward(x)
        mm = out.astype(jnp.float32) * std_3 + mean_3
        return mm.reshape(kp.shape[0], 16, 3)

    jitted = jax.jit(lift)
    exp = jax_export.export(jitted, platforms=_plat(platforms))
    if batch_sizes is None:
        (b,) = jax_export.symbolic_shape("b")
        return {"sym": exp(jax.ShapeDtypeStruct((b, 16, 2), jnp.float32))}
    return {
        f"b{n}": exp(jax.ShapeDtypeStruct((int(n), 16, 2), jnp.float32))
        for n in sorted(set(int(n) for n in batch_sizes))
    }


def export_end2end(
    variables,
    mean_part,
    std_part,
    mean_s,
    std_s,
    *,
    variant: str = "torch7",
    dtype=jnp.bfloat16,
    model_kw: Optional[dict] = None,
    batch_sizes: Sequence[int] = (1, 8, 16),
    platforms: Optional[Sequence[str]] = None,
) -> Dict[str, jax_export.Exported]:
    """Export the fused frame->3D program — (b, 256, 256, 3) frames in
    [0, 1] + crop centers/scales -> (pose2d px, pose3d mm) — at each fixed
    batch size (one cached executable per size, the End2EndServer dispatch
    contract)."""
    from bilinear_tpu.models.end2end import End2End

    model = End2End(variant=variant, dtype=dtype, **(model_kw or {}))
    mean_p = jnp.asarray(np.asarray(mean_part).reshape(-1), jnp.float32)
    std_p = jnp.asarray(np.asarray(std_part).reshape(-1), jnp.float32)
    mean_3 = jnp.asarray(np.asarray(mean_s).reshape(-1), jnp.float32)
    std_3 = jnp.asarray(np.asarray(std_s).reshape(-1), jnp.float32)

    def fwd(frames, centers, scales):
        _, pose2d, pose3d = model.apply(
            variables, frames, centers, scales, mean_p, std_p, train=False
        )
        mm = pose3d.astype(jnp.float32) * std_3 + mean_3
        return pose2d, mm.reshape(mm.shape[0], 16, 3)

    jitted = jax.jit(fwd)
    exp = jax_export.export(jitted, platforms=_plat(platforms))
    out = {}
    for n in sorted(set(int(n) for n in batch_sizes)):
        out[f"b{n}"] = exp(
            jax.ShapeDtypeStruct((n, 256, 256, 3), jnp.float32),
            jax.ShapeDtypeStruct((n, 2), jnp.float32),
            jax.ShapeDtypeStruct((n,), jnp.float32),
        )
    return out


def _plat(platforms: Optional[Sequence[str]]) -> Optional[Sequence[str]]:
    return list(platforms) if platforms else None  # None -> default backend


def save_artifact(
    path: str,
    kind: str,
    programs: Dict[str, jax_export.Exported],
    manifest_extra: Optional[dict] = None,
) -> dict:
    """Write the artifact zip; returns the manifest written."""
    if kind not in ("lifting", "end2end"):
        raise ValueError(f"unknown artifact kind {kind!r}")
    if not programs:
        raise ValueError("no programs to save")
    first = next(iter(programs.values()))
    manifest = {
        "format": FORMAT,
        "kind": kind,
        "jax_version": jax.__version__,
        "platforms": list(first.platforms),
        "programs": {
            tag: {
                "in": [str(a) for a in exp.in_avals],
                "out": [str(a) for a in exp.out_avals],
            }
            for tag, exp in programs.items()
        },
        **(manifest_extra or {}),
    }
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("manifest.json", json.dumps(manifest, indent=1))
        for tag, exp in programs.items():
            z.writestr(f"program_{tag}.jaxexport", bytes(exp.serialize()))
    return manifest


# ---------------------------------------------------------------------------
# Load side (self-contained: jax + numpy only, no framework imports)
# ---------------------------------------------------------------------------

class AOTPose:
    """A loaded artifact. Call it:

    - kind "lifting":  pose(keypoints (N, 16, 2)) -> (N, 16, 3) mm
    - kind "end2end":  pose(frames (N, 256, 256, 3) [0,1] or uint8,
                            centers=None, scales=None)
                       -> (pose2d (N, 16, 2) px, pose3d (N, 16, 3) mm)

    Requests of any N are served: a symbolic program takes them directly;
    fixed-batch programs get greedy largest-first chunking with the tail
    padded up to the smallest compiled size that fits."""

    def __init__(self, manifest: dict, programs: Dict[str, object]):
        self.manifest = manifest
        self.kind = manifest["kind"]
        self._sym = programs.get("sym")
        self._fixed = {
            int(tag[1:]): exp for tag, exp in programs.items()
            if tag.startswith("b")
        }

    @property
    def batch_sizes(self) -> Tuple[int, ...]:
        return tuple(sorted(self._fixed))

    def _chunks(self, n: int):
        sizes = self.batch_sizes
        out, remaining = [], n
        while remaining > 0:
            fit = [b for b in sizes if b <= remaining]
            if fit:
                out.append((fit[-1], fit[-1]))
                remaining -= fit[-1]
            else:
                big = [b for b in sizes if b >= remaining]
                if not big:
                    raise ValueError(
                        f"request of {n} rows but artifact has no batch "
                        f"size <= or >= {remaining} (sizes {sizes})"
                    )
                out.append((remaining, big[0]))
                remaining = 0
        return out

    def _dispatch(self, arrays, n: int):
        """Run per-row-aligned ``arrays`` through the program(s); returns a
        list of (slice, take, results-tuple-or-array)."""
        if self._sym is not None:
            return [(slice(0, n), n, self._sym.call(*arrays))]
        dispatched, done = [], 0
        for take, batch in self._chunks(n):
            idx = slice(done, done + take)
            chunk = []
            for a in arrays:
                part = a[idx]
                if take < batch:
                    pad = np.zeros((batch - take,) + part.shape[1:],
                                   part.dtype)
                    part = np.concatenate([part, pad])
                chunk.append(part)
            dispatched.append((idx, take, self._fixed[batch].call(*chunk)))
            done += take
        return dispatched

    def __call__(self, *args, **kw):
        if self.kind == "lifting":
            return self.lift(*args, **kw)
        return self.predict(*args, **kw)

    def lift(self, keypoints_2d) -> np.ndarray:
        kp = np.ascontiguousarray(keypoints_2d, np.float32)
        n = kp.shape[0]
        out = np.zeros((n, 16, 3), np.float32)
        for idx, take, res in self._dispatch((kp,), n):
            out[idx] = np.asarray(res, np.float32)[:take]
        return out

    def predict(self, frames, centers=None, scales=None):
        frames = np.asarray(frames)
        if frames.dtype == np.uint8:
            frames = frames.astype(np.float32) / 255.0
        frames = np.ascontiguousarray(frames, np.float32)
        n = frames.shape[0]
        if centers is None:  # full-frame crop (webcam.py:13-25 semantics)
            centers = np.full((n, 2), 128.0, np.float32)
        if scales is None:
            scales = np.full((n,), 256.0 / 200.0, np.float32)
        centers = np.ascontiguousarray(centers, np.float32)
        scales = np.ascontiguousarray(scales, np.float32)
        pose2d = np.zeros((n, 16, 2), np.float32)
        pose3d = np.zeros((n, 16, 3), np.float32)
        for idx, take, (p2, p3) in self._dispatch(
            (frames, centers, scales), n
        ):
            pose2d[idx] = np.asarray(p2, np.float32)[:take]
            pose3d[idx] = np.asarray(p3, np.float32)[:take]
        return pose2d, pose3d


class AOTServer:
    """Adapts an artifact FILE to the daemon's server contract
    (serving_http.PoseHTTPServer: ``.lift``/``.predict`` + ``.epoch`` +
    ``.reload()``) — ``python -m bilinear_tpu.cli.serve --aot pose.aot``
    serves it with no flax, no checkpoints, and no normalization data on
    the box. ``reload()`` re-reads the file when its (mtime, size)
    changes, so atomically replacing the artifact (write tmp +
    ``os.replace``, as ``save_artifact`` callers should) hot-swaps the
    weights with zero downtime: the swap is one reference assignment and
    in-flight batches finish on the old programs."""

    def __init__(self, path: str):
        self.path = path
        self._sig = None
        self._pose: Optional[AOTPose] = None
        self.reload()

    @property
    def kind(self) -> str:
        return self._pose.kind

    @property
    def manifest(self) -> dict:
        return self._pose.manifest

    @property
    def epoch(self) -> int:
        return int(self._pose.manifest.get("epoch", -1))

    def reload(self) -> bool:
        # stat BEFORE reading: if the file is replaced mid-load we record
        # the pre-replace signature and the next poll reloads again.
        st = os.stat(self.path)
        sig = (st.st_mtime_ns, st.st_size)
        if sig == self._sig:
            return False
        pose = load_artifact(self.path)  # parse fully, then swap
        self._pose, self._sig = pose, sig
        return True

    def lift(self, keypoints_2d) -> np.ndarray:
        return self._pose.lift(keypoints_2d)

    def predict(self, frames, centers=None, scales=None):
        return self._pose.predict(frames, centers, scales)


def load_artifact(path: str) -> AOTPose:
    with zipfile.ZipFile(path) as z:
        manifest = json.loads(z.read("manifest.json"))
        if manifest.get("format") != FORMAT:
            raise ValueError(
                f"{path!r} is not a {FORMAT} artifact "
                f"(format={manifest.get('format')!r})"
            )
        programs = {}
        for tag in manifest["programs"]:
            data = z.read(f"program_{tag}.jaxexport")
            programs[tag] = jax_export.deserialize(bytearray(data))
    return AOTPose(manifest, programs)
