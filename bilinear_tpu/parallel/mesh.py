"""Device mesh construction and sharding rules.

The reference is strictly single-device (SURVEY.md §2 parallelism census); its
TPU-native equivalent is a first-class ``jax.sharding.Mesh`` with data
parallelism as the primary strategy (batch axis sharded over 'data'), and a
'model' axis reserved for tensor-parallel sharding of the lifting MLP's
1024-wide hidden layers (useful at very large serving batch sizes).

All programs in this framework are written against NamedSharding from day
one: on a 1-chip mesh every rule degenerates to replication at zero cost, and
the same jitted code scales to a pod slice with no loop changes
(SURVEY.md §5 'Distributed communication backend').
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def shard_map_compat(f, *, mesh, in_specs, out_specs, check_rep=True):
    """shard_map across jax versions: jax>=0.8 moved it to jax.shard_map
    and renamed check_rep -> check_vma (needed off for Pallas calls, whose
    replication jax cannot infer)."""
    if hasattr(jax, "shard_map"):
        return jax.shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=check_rep,
        )
    from jax.experimental.shard_map import shard_map  # pragma: no cover

    return shard_map(
        f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_rep=check_rep,
    )


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up (SURVEY.md §5): jax.distributed over DCN. On a
    single host (or under cloud TPU auto-detection) all arguments may be
    None. After this, jax.devices() spans the full slice and every mesh/
    sharding in this package scales across hosts unchanged — the per-host
    data pipelines feed their local shard via global_batch (multi-process)
    or shard_batch (single-process).

    Exercised end-to-end by tests/test_distributed.py: two CPU processes x 4
    virtual devices form one 8-device mesh and reproduce the single-process
    bilinear and hourglass DP losses exactly."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def maybe_init_distributed(cfg) -> bool:
    """CLI hook: bring up jax.distributed when the config carries
    --coordinator/--num-processes/--process-id flags. Returns True if
    distributed mode was initialized."""
    coordinator = getattr(cfg, "coordinator", "")
    if not coordinator:
        return False
    init_distributed(
        coordinator_address=coordinator,
        num_processes=int(cfg.num_processes),
        process_id=int(cfg.process_id),
    )
    return True


def global_batch(mesh: Mesh, tree):
    """Multi-process analogue of shard_batch: each process passes its LOCAL
    shard of the batch (leading dim = global_batch / process_count) and gets
    back global jax.Arrays sharded over 'data' — the contract of
    jax.make_array_from_process_local_data.

    EVERY leaf must be batch-like. Non-batch arrays (stats, scalars) must
    not ride this tree — a "shard if divisible, replicate otherwise" rule
    would silently concatenate per-process copies of a stats vector whose
    length happens to divide the mesh, so we fail loudly instead."""
    n_proc = jax.process_count()
    n_data = mesh.shape[DATA_AXIS]

    def put(x):
        x = np.asarray(x)
        if x.ndim < 1 or (x.shape[0] * n_proc) % n_data != 0:
            raise ValueError(
                f"global_batch leaf of shape {x.shape} is not batch-like: "
                f"{x.shape[0] if x.ndim else 1} rows x {n_proc} processes "
                f"does not divide the {n_data}-way data axis. Pass stats/"
                "scalars separately (they are replicated by jit on use)."
            )
        return jax.make_array_from_process_local_data(
            batch_sharding(mesh, x.ndim), x
        )

    return jax.tree.map(put, tree)


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Build a (data, model) mesh. By default all visible devices go to the
    data axis — the right layout for these small models (4.3 M / 25 M params
    need no weight sharding at training scale)."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    assert data * model == len(devices), (
        f"{len(devices)} devices cannot form a ({data}, {model}) mesh"
    )
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard the leading (batch) dimension over 'data'; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put a pytree of host arrays with the batch axis sharded over
    'data'. Arrays whose leading dim does not divide the mesh are replicated
    (e.g. scalar stats)."""
    n_data = mesh.shape[DATA_AXIS]

    def put(x):
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] % n_data == 0:
            return jax.device_put(x, batch_sharding(mesh, x.ndim))
        return jax.device_put(x, replicated(mesh))

    return jax.tree.map(put, tree)


def global_from_host(mesh: Mesh, tree):
    """Build global 'data'-sharded arrays from host data that every process
    holds IN FULL (e.g. the H36M bins, loaded identically everywhere). Each
    process contributes only the slices its devices own — contrast with
    global_batch, where each process holds only its local shard."""
    def put(x):
        x = np.asarray(x)
        sharding = batch_sharding(mesh, x.ndim) if x.ndim >= 1 else replicated(mesh)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx]
        )

    return jax.tree.map(put, tree)


def constrain_batch(x, mesh: Mesh):
    """Inside jit: pin an activation's batch axis to the 'data' axis."""
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(DATA_AXIS, *([None] * (x.ndim - 1))))
    )


def spatial_sharding(mesh: Mesh, ndim: int = 4, axis: int = 1) -> NamedSharding:
    """Shard a spatial dimension (default: H of NHWC) over the 'data' axis —
    the SP analogue for the conv stack (SURVEY.md §5 'long-context/SP': the
    reference has no sequence axis; images are the long axis here). GSPMD
    inserts the halo exchanges 3x3 convs and pools need at shard edges, so a
    single giant frame can span chips with no kernel changes."""
    spec = [None] * ndim
    spec[axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def shard_spatial(mesh: Mesh, x, axis: int = 1):
    """Device-put with a spatial (H) dimension sharded over 'data'."""
    x = np.asarray(x) if not isinstance(x, jax.Array) else x
    return jax.device_put(x, spatial_sharding(mesh, x.ndim, axis))
