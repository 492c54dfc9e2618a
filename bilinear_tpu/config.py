"""Configuration — dataclass equivalents of the reference's static DotMaps
(util/config.py:1-25), plus a thin CLI override layer the reference lacks.

Semantics preserved: per-model config blocks, 'comment' names the run dir and
doubles as the resume key, LR decay as a closed-form function of step,
protocol selection for the bilinear pipeline.
"""
from __future__ import annotations

import argparse
import dataclasses
import os
from dataclasses import dataclass, field

from bilinear_tpu.data.h36m import Protocol


@dataclass
class LRDecayConfig:
    """util/config.py:19-23 — lr = base * rate^(step/period), re-set when
    step == 1 or step % period == 0."""

    activate: bool = True
    base_lr: float = 1.0e-3
    rate: float = 0.96
    period: int = 100_000


@dataclass
class BilinearConfig:
    comment: str = "Bilinear GT"
    batch_size: int = 64
    prefetch: int = 2  # replaces the reference's 8 loader workers
    data_dir: str = "data/Human3.6M"
    save_root: str = "save"
    protocol: str = Protocol.GT
    lr_decay: LRDecayConfig = field(default_factory=LRDecayConfig)
    epochs_per_run: int = 10  # train_bilinear.py:56
    total_runs: int = 40  # bilinear.sh
    seed: int = 0
    dtype: str = "float32"  # "bfloat16" for MXU-native training
    profile: bool = False  # write a jax.profiler trace under the run dir
    keep_checkpoints: int = 0  # prune to the newest N epoch checkpoints
    # after each save (0 = keep all, the reference's behavior); resume only
    # reads the newest epoch so the restart contract is unaffected
    keep_every: int = 0  # additionally keep every N-th epoch as a milestone
    debug_nans: bool = False  # trap the first NaN-producing op (utils/debug.py)
    compile_cache_dir: str = "auto"  # persistent XLA compilation cache. The
    # reference's outer driver re-invokes python 40x (bilinear.sh) and every
    # invocation pays full compilation; "auto" (the default) persists
    # compiled programs under {save_root}/{comment}/xla_cache so restart N
    # reuses restart N-1's programs. A path overrides; "" disables.
    # Multi-host bring-up (SURVEY.md §5; parallel/mesh.py::init_distributed).
    # Set --coordinator host:port plus --num-processes/--process-id on every
    # process; jax.devices() then spans the full slice and training runs DP
    # over the global mesh.
    coordinator: str = ""
    num_processes: int = 1
    process_id: int = 0


@dataclass
class HourglassConfig:
    comment: str = "Hourglass"
    batch_size: int = 8
    prefetch: int = 2
    data_dir: str = "data/MPII"
    save_root: str = "save"
    learning_rate: float = 2.5e-4
    epochs_per_run: int = 10  # train_hourglass.py:63
    total_runs: int = 20  # hourglass.sh
    variant: str = "torch7"  # 'torch7' (train_hourglass.py:45) or 'preact'
    seed: int = 0
    dtype: str = "float32"
    profile: bool = False
    steps_per_dispatch: int = 4  # batches per device call (identical numerics)
    transport: str = "u8"  # host->device image wire format: 'u8' ships uint8
    # canvases (4x less PCIe/tunnel traffic; device rescales in crop_batch),
    # 'f32' ships ready floats. Values are identical either way.
    canvas: int = 512  # host canvas size; smaller ships fewer bytes per step
    # (crops too big for it take the reference's two-stage resample path)
    cache_canvases: bool = False  # decode each JPEG once into a u8 memmap
    # under {data_dir}/canvas_cache; epochs then skip JPEG decode (the
    # reference re-decodes in 8 worker processes every epoch)
    # Model size (reference: model/hourglass_torch7.py:6-11). Override for
    # tiny smoke/integration runs of the CLIs.
    n_stacks: int = 8
    features: int = 256
    depth: int = 4
    n_modules: int = 1  # ResModules per hourglass slot (the reference's
    # CONFIG.nModules, model/hourglass_torch7.py:9,47-49,58)
    fused_blocks: bool = False  # Pallas whole-block ResModules (torch7 only;
    # same checkpoint tree, VMEM-resident fwd+bwd — ops/pallas/resmodule.py)
    keep_checkpoints: int = 0  # prune to the newest N epoch checkpoints
    # after each save (0 = keep all; ~300 MB/epoch at production size)
    keep_every: int = 0  # additionally keep every N-th epoch as a milestone
    debug_nans: bool = False  # trap the first NaN-producing op (utils/debug.py)
    compile_cache_dir: str = "auto"  # persistent XLA compilation cache
    # across invocations, on by default under {save_root}/{comment}/xla_cache
    # (see BilinearConfig.compile_cache_dir; hourglass.sh re-invokes 20x and
    # the fused train step is the longest compile in-tree). "" disables.
    # Multi-host bring-up (see BilinearConfig.coordinator).
    coordinator: str = ""
    num_processes: int = 1
    process_id: int = 0


@dataclass
class HourglassFTConfig(HourglassConfig):
    comment: str = "Hourglass FT"
    data_dir: str = "data/Human3.6M"
    epochs_per_run: int = 100  # train_hourglass_FT.py:67
    variant: str = "preact"  # train_hourglass_FT.py:47 uses model.hourglass


def _add_dataclass_args(parser: argparse.ArgumentParser, cfg) -> None:
    for f in dataclasses.fields(cfg):
        if dataclasses.is_dataclass(f.type) or dataclasses.is_dataclass(
            getattr(cfg, f.name)
        ):
            continue
        arg = "--" + f.name.replace("_", "-")
        val = getattr(cfg, f.name)
        if isinstance(val, bool):
            parser.add_argument(arg, type=lambda s: s.lower() in ("1", "true", "yes"),
                                default=val)
        else:
            parser.add_argument(arg, type=type(val), default=val)


def apply_platform_override() -> None:
    """Honor BILINEAR_TPU_PLATFORM=cpu|tpu|axon for CLI processes.

    The env's sitecustomize registers the TPU plugin and pins JAX_PLATFORMS
    before user code runs, so the standard env var cannot force CPU for a
    subprocess (tests/conftest.py has the same problem in-process). This
    applies the override through jax.config, which works any time before
    backend initialization."""
    platform = os.environ.get("BILINEAR_TPU_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)


def enable_compile_cache(path: str, zero_thresholds: bool = False) -> None:
    """Point JAX's persistent compilation cache at ``path``.

    Makes the reference's process-per-epoch-block driver design
    (bilinear.sh/hourglass.sh re-invoking python 40x/20x) cheap on TPU:
    every invocation after the first loads its programs from disk instead
    of recompiling. Production keeps JAX's own thresholds (sub-second
    compiles are not worth disk churn); ``zero_thresholds`` lets tests
    cache even trivial CPU programs."""
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    if zero_thresholds:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    # JAX initializes its persistent-cache object lazily ONCE and then
    # ignores later jax_compilation_cache_dir updates, so re-pointing the
    # cache mid-process (doctor's probe after earlier compiles; a second
    # enable_compile_cache call) would silently write to the old dir — or
    # nowhere. Reset the latched state so the next compile re-initializes
    # against ``path``. Private API, so degrade gracefully if it moves:
    # the config update above still covers the fresh-process CLI path.
    try:
        from jax._src import compilation_cache as _cc

        _cc.reset_cache()
    except (ImportError, AttributeError):
        pass


def parse_config(cfg, argv=None):
    """Overlay CLI flags onto a config dataclass instance."""
    apply_platform_override()
    parser = argparse.ArgumentParser()
    _add_dataclass_args(parser, cfg)
    args, _ = parser.parse_known_args(argv)
    for f in dataclasses.fields(cfg):
        if hasattr(args, f.name):
            setattr(cfg, f.name, getattr(args, f.name))
    cache = getattr(cfg, "compile_cache_dir", "")
    if cache == "auto":
        cache = os.path.join(getattr(cfg, "save_root", "save"),
                             getattr(cfg, "comment", "run"), "xla_cache")
    if cache:
        enable_compile_cache(cache)
    return cfg
