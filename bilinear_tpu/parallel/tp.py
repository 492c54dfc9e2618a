"""Tensor-parallel shardings for the bilinear lifting MLP.

The reference has no model parallelism (SURVEY.md §2 census) and at 4.3 M
params none is *needed* — this exists so the framework's scaling story is
complete: huge-batch lifting service can shard both batch (DP) and the
1024-wide hidden dimension (TP) on a (data, model) mesh.

Scheme (Megatron pairing, expressed purely as GSPMD shardings — XLA inserts
the collectives):
- encode and the FIRST linear of each residual pair are column-parallel:
  kernel P(None,'model'); their bias/BN state live on the sharded feature
  axis P('model'). BatchNorm is per-feature, so it works sharded as-is.
- the SECOND linear of each pair is row-parallel: kernel P('model', None);
  XLA reduces the partial products (psum over 'model'), and its bias/BN state
  are replicated.
- decode and everything else replicate.

``shard_train_state`` mirrors the param shardings onto the optimizer state
(same tree shapes) so Adam moments stay local to each shard.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bilinear_tpu.parallel.mesh import MODEL_AXIS

COLUMN_PARALLEL = ("encode",) + tuple(
    f"bilinear_{b}_0" for b in range(8)
)  # generous block range
ROW_PARALLEL = tuple(f"bilinear_{b}_1" for b in range(8))


def _spec_for(path, leaf) -> P:
    names = [str(getattr(k, "key", k)) for k in path]
    top = names[0] if names else ""
    leafname = names[-1] if names else ""
    if top in COLUMN_PARALLEL:
        if leafname == "kernel":
            return P(None, MODEL_AXIS)
        if leaf.ndim == 1:  # bias / bn scale / bn bias / mean / var
            return P(MODEL_AXIS)
        return P()
    if top in ROW_PARALLEL:
        if leafname == "kernel":
            return P(MODEL_AXIS, None)
        return P()  # bias & BN on the replicated (full-width) output
    return P()


def bilinear_param_specs(params):
    """PartitionSpec tree matching a BilinearUnit params/batch_stats tree."""
    return jax.tree_util.tree_map_with_path(_spec_for, params)


def shard_train_state(state, mesh: Mesh):
    """device_put a TrainState with TP params + mirrored optimizer moments."""

    def put_tree(tree, specs):
        return jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs
        )

    p_specs = bilinear_param_specs(state.params)
    s_specs = bilinear_param_specs(state.batch_stats)
    params = put_tree(state.params, p_specs)
    stats = put_tree(state.batch_stats, s_specs)

    # Mirror param shardings onto optimizer moments: an opt-state leaf whose
    # key-path SUFFIX matches a param path (e.g. mu -> encode/linear/kernel)
    # gets that param's spec; counters/scalars replicate.
    param_path_spec = {
        tuple(str(getattr(k, "key", k)) for k in path): spec
        for path, spec in jax.tree_util.tree_flatten_with_path(p_specs)[0]
    }

    def put_opt(path, x):
        names = tuple(str(getattr(k, "key", k)) for k in path)
        for i in range(len(names)):
            spec = param_path_spec.get(names[i:])
            if spec is not None:
                return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, NamedSharding(mesh, P()))

    opt_state = jax.tree_util.tree_map_with_path(put_opt, state.opt_state)
    step = jax.device_put(state.step, NamedSharding(mesh, P()))
    return state.replace(
        params=params, batch_stats=stats, opt_state=opt_state, step=step
    )
