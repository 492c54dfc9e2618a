"""Packed host->device transfers for tunneled/remote TPU platforms.

The reference keeps weights wherever torch's .to(device) put them; on this
framework's target platforms a device can sit behind a network tunnel where
EVERY transfer pays a round-trip. Measured on the axon tunnel (round-4
probe, 1600-leaf / 315 MB production hourglass TrainState):

    per-leaf upload   157 s   (~2 MB/s — ~100 ms round-trip per leaf)
    packed upload      14 s   (~23 MB/s — bandwidth-bound)
    per-leaf fetch     11 s   (fetches pipeline; packing does NOT help reads)

``packed_device_put`` concatenates host leaves per dtype, ships ONE buffer
per dtype, and splits/reshapes back into the pytree in a single jitted
program on device (0.05 s warm; buffers donated so peak HBM is unchanged).
This is what makes the reference's process-per-epoch-block driver design
(bilinear.sh/hourglass.sh re-invoking python 40x/20x, checkpoint resume
every invocation) cheap on a tunneled chip.
"""
from __future__ import annotations

import jax
import numpy as np

# Below this many packable leaves the per-leaf path is already fine and the
# host-side concatenate would be pure overhead.
_MIN_PACK_LEAVES = 8


def packed_device_put(tree, sharding=None):
    """jax.device_put(tree) in O(#dtypes) transfers instead of O(#leaves).

    Numpy leaves are raveled, grouped by dtype, concatenated on host, shipped
    as one buffer per dtype, and split/reshaped on device inside one jitted
    program (inputs donated). Non-numpy leaves (device arrays, python
    scalars) pass through ``jax.device_put`` unchanged. ``sharding`` (e.g. a
    replicated NamedSharding for mesh serving) applies to every transfer.
    """
    leaves, treedef = jax.tree.flatten(tree)
    pack_idx = [
        i for i, leaf in enumerate(leaves)
        if isinstance(leaf, np.ndarray) and leaf.size > 0
    ]
    if len(pack_idx) < _MIN_PACK_LEAVES:
        return jax.device_put(tree, sharding) if sharding is not None \
            else jax.device_put(tree)

    groups = {}  # np.dtype -> [leaf index]
    for i in pack_idx:
        groups.setdefault(leaves[i].dtype, []).append(i)

    bufs = {
        str(dt): np.concatenate([np.ravel(leaves[i]) for i in idxs])
        for dt, idxs in groups.items()
    }
    if sharding is not None:
        bufs = {k: jax.device_put(v, sharding) for k, v in bufs.items()}
    else:
        bufs = {k: jax.device_put(v) for k, v in bufs.items()}

    shapes = {str(dt): [leaves[i].shape for i in idxs]
              for dt, idxs in groups.items()}

    def unpack(bufs):
        out = {}
        for dt, idxs in groups.items():
            buf, off = bufs[str(dt)], 0
            for i, shape in zip(idxs, shapes[str(dt)]):
                n = int(np.prod(shape, dtype=np.int64))
                out[i] = buf[off:off + n].reshape(shape)
                off += n
        return [out[i] for i in sorted(out)]

    unpacked = jax.jit(unpack, donate_argnums=0)(bufs)
    packed = dict(zip(sorted(pack_idx), unpacked))
    put_one = (lambda v: jax.device_put(v, sharding)) if sharding is not None \
        else jax.device_put
    new_leaves = [packed[i] if i in packed else put_one(leaf)
                  for i, leaf in enumerate(leaves)]
    return jax.tree.unflatten(treedef, new_leaves)
