"""Checkpoint save/resume with the reference's directory contract.

Layout (train_bilinear.py:92-104, util/log.py:10-13):
    save/{comment}/parameter/{epoch}.save
Payload keys mirror the reference exactly: {'epoch','step','state','optimizer'}
— 'state' holds {params, batch_stats} and 'optimizer' the optax state, both
as nested numpy dicts (flax.serialization state-dicts), so checkpoints are
torch-free, mmap-friendly pickles.

Resume rule: scan the directory for the max integer epoch
(model/bilinear.py:63-83). ``epoch = -1`` is the reference's "finalized,
training over" sentinel (eval_hourglass.py:47-57) — it marks completion and
never wins the resume scan.

Writes are atomic (tmp + rename): a crash mid-save can never corrupt the
newest checkpoint, preserving the reference's crash-recovery story
(SURVEY.md §5 failure detection) with a stronger guarantee.
"""
from __future__ import annotations

import os
import pickle
import threading
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

FINALIZED_EPOCH = -1


def _to_numpy_state_dict(tree) -> Dict[str, Any]:
    # jax.device_get pipelines the device->host fetches of the whole tree;
    # a tree.map(np.asarray) fetches leaf-by-leaf SEQUENTIALLY, which on a
    # tunneled TPU costs a round-trip per leaf (~2 min per production-size
    # checkpoint save vs ~11 s pipelined — round-4 probe).
    return jax.tree.map(
        np.asarray, jax.device_get(serialization.to_state_dict(tree))
    )


_async_lock = threading.Lock()
_async_thread: Optional[threading.Thread] = None


def save_checkpoint(parameter_dir: str, epoch: int, state,
                    async_save: bool = False) -> str:
    """Write ``{epoch}.save``. ``state`` is a core.state.TrainState.

    With ``async_save``, device->host fetches happen now (cheap relative to a
    step) but serialization+IO run on a background thread so training resumes
    immediately (SURVEY.md §5 'optional async checkpointing'). Saves are
    serialized by a lock; call wait_for_async_saves() before exiting.
    """
    global _async_thread
    os.makedirs(parameter_dir, exist_ok=True)
    payload = {
        "epoch": epoch,
        "step": int(state.step),
        "state": {
            "params": _to_numpy_state_dict(state.params),
            "batch_stats": _to_numpy_state_dict(state.batch_stats),
        },
        "optimizer": _to_numpy_state_dict(state.opt_state),
    }
    path = os.path.join(parameter_dir, f"{epoch}.save")

    def write():
        with _async_lock:
            # Per-process tmp name: two processes sharing a save dir (e.g. an
            # orphaned trainer overlapping its relaunch after a crash) must not
            # clobber each other's in-progress file — with a fixed ".tmp" name
            # the loser's os.replace raises FileNotFoundError after the winner
            # renames it away (observed in the round-3 budget run).
            tmp = f"{path}.tmp.{os.getpid()}"
            try:
                with open(tmp, "wb") as f:
                    pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
                os.replace(tmp, path)
            finally:
                if os.path.exists(tmp):
                    os.remove(tmp)

    if async_save:
        t = threading.Thread(target=write, daemon=True)
        t.start()
        _async_thread = t
    else:
        write()
    return path


def wait_for_async_saves() -> None:
    if _async_thread is not None:
        _async_thread.join()


# ---------------------------------------------------------------------------
# Optional Orbax backend (SURVEY.md §5): same payload and directory contract,
# stored as an Orbax PyTree checkpoint directory ``{epoch}.orbax`` instead of
# a pickle. Useful for very large states / multi-host sharded saving.
# ---------------------------------------------------------------------------


def save_checkpoint_orbax(parameter_dir: str, epoch: int, state) -> str:
    import orbax.checkpoint as ocp

    os.makedirs(parameter_dir, exist_ok=True)
    payload = {
        "epoch": epoch,
        "step": int(state.step),
        "state": {
            "params": _to_numpy_state_dict(state.params),
            "batch_stats": _to_numpy_state_dict(state.batch_stats),
        },
        "optimizer": _to_numpy_state_dict(state.opt_state),
    }
    path = os.path.abspath(os.path.join(parameter_dir, f"{epoch}.orbax"))
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    return path


def load_checkpoint_orbax(parameter_dir: str, epoch: int):
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(parameter_dir, f"{epoch}.orbax"))
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(path)


def _epoch_files(parameter_dir: Optional[str]):
    """Yield ``(epoch, path)`` for every epoch checkpoint in the dir —
    ``{epoch}.save`` pickles and ``{epoch}.orbax`` directories. The one
    place the filename contract lives; latest_epoch and prune_checkpoints
    must agree on it or resume and pruning drift apart."""
    if not (parameter_dir and os.path.isdir(parameter_dir)):
        return
    for fname in os.listdir(parameter_dir):
        stem, _, ext = fname.partition(".")
        if ext not in ("save", "orbax"):
            continue
        try:
            e = int(stem)
        except ValueError:
            continue
        yield e, os.path.join(parameter_dir, fname)


def latest_epoch(parameter_dir: Optional[str]) -> int:
    """Max integer epoch present, 0 if none (the reference's resume scan,
    model/bilinear.py:63-83). Both backends participate: ``{epoch}.save``
    pickles and ``{epoch}.orbax`` checkpoint directories."""
    return max((e for e, _ in _epoch_files(parameter_dir)), default=0)


def prune_checkpoints(parameter_dir: str, keep_last: int,
                      keep_every: int = 0) -> list:
    """Delete old epoch checkpoints, keeping the newest ``keep_last``
    epochs, every ``keep_every``-th epoch as a milestone (when set), the
    ``-1`` finalized sentinel, and anything that is not an epoch
    checkpoint. ``keep_last <= 0`` keeps everything — the reference's
    behavior and the default. Returns the removed paths.

    ``keep_every`` alone (keep_last <= 0) is also honored: milestones plus
    the newest epoch are kept, everything else pruned.

    Why: production-size states are ~300 MB, so a full hourglass.sh budget
    run (20x10 epochs) accumulates ~60 GB of checkpoints the reference
    never cleans up. Pruning preserves the restart contract because resume
    only ever reads the NEWEST epoch (model/bilinear.py:63-83); both the
    pickle and orbax backends are covered."""
    if keep_last <= 0 and keep_every <= 0:
        return []
    epochs: Dict[int, list] = {}
    for e, path in _epoch_files(parameter_dir):
        if e == FINALIZED_EPOCH:
            continue
        epochs.setdefault(e, []).append(path)

    # The newest epoch is always kept (resume reads it), even in
    # milestone-only mode.
    keep = set(sorted(epochs)[-max(keep_last, 1):])
    if keep_every > 0:
        keep |= {e for e in epochs if e % keep_every == 0}
    removed = []
    for e, paths in epochs.items():
        if e in keep:
            continue
        for p in paths:
            if os.path.isdir(p):  # orbax checkpoint directory
                import shutil

                shutil.rmtree(p)
            else:
                os.remove(p)
            removed.append(p)
    return removed


def load_checkpoint(parameter_dir: str, epoch: int) -> Dict[str, Any]:
    """Load ``{epoch}.save`` (preferred) or ``{epoch}.orbax`` — whichever
    backend wrote that epoch — so auto-resume holds for both."""
    path = os.path.join(parameter_dir, f"{epoch}.save")
    if os.path.exists(path):
        with open(path, "rb") as f:
            return pickle.load(f)
    if os.path.isdir(os.path.join(parameter_dir, f"{epoch}.orbax")):
        return load_checkpoint_orbax(parameter_dir, epoch)
    raise FileNotFoundError(
        f"no checkpoint for epoch {epoch} in {parameter_dir} "
        "(neither .save nor .orbax)"
    )


def restore_state(state_template, payload: Dict[str, Any]):
    """Map a checkpoint payload back onto a freshly-initialized TrainState
    (same treedefs), returning the resumed state."""
    params = serialization.from_state_dict(
        state_template.params, payload["state"]["params"]
    )
    batch_stats = serialization.from_state_dict(
        state_template.batch_stats, payload["state"]["batch_stats"]
    )
    opt_state = serialization.from_state_dict(
        state_template.opt_state, payload["optimizer"]
    )
    import jax.numpy as jnp

    return state_template.replace(
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        step=jnp.asarray(payload["step"], jnp.int32),
    )


def resume_or_init(state_template, parameter_dir: Optional[str]):
    """The reference's load() contract (model/bilinear.py:58-92): resume from
    the newest epoch if any checkpoint exists, else return the fresh state.
    Returns (state, start_epoch)."""
    epoch = latest_epoch(parameter_dir)
    if epoch > 0:
        payload = load_checkpoint(parameter_dir, epoch)
        return restore_state(state_template, payload), epoch
    return state_template, 0


def resume_or_init_fast(init_fn, rng, parameter_dir: Optional[str],
                        pack: bool = True):
    """resume_or_init without paying device-side init on the resume path.

    The reference's outer drivers re-invoke python per epoch block
    (bilinear.sh:1), so 39/19 of every budget run's invocations resume from
    a checkpoint — and on a tunneled TPU the old path (eagerly init the full
    state on device, then throw those values away and re-upload the restored
    numpy tree leaf-by-leaf) costs minutes per invocation (measured ~100 ms
    round-trip PER LEAF, ~1600 leaves at production hourglass size).

    When a checkpoint exists, the state template is built abstractly with
    ``jax.eval_shape`` (zero device work, no init compile) and the restored
    numpy tree is uploaded as packed per-dtype buffers
    (utils/residency.packed_device_put, ~11x faster). Only a genuinely fresh
    run executes ``init_fn`` on device. ``pack=False`` returns host (numpy)
    leaves for multi-process DP, where jit over the global mesh needs
    replicatable host inputs.

    Returns (state, start_epoch).
    """
    epoch = latest_epoch(parameter_dir)
    if epoch > 0:
        template = jax.eval_shape(init_fn, rng)
        state = restore_state(template, load_checkpoint(parameter_dir, epoch))
        if pack:
            from bilinear_tpu.utils.residency import packed_device_put

            state = packed_device_put(state)
        return state, epoch
    return init_fn(rng), 0


def mark_finalized(parameter_dir: str, state) -> str:
    """Write the ``-1.save`` 'training over' sentinel (eval_hourglass.py:47-57)."""
    return save_checkpoint(parameter_dir, FINALIZED_EPOCH, state)


def is_finalized(parameter_dir: str) -> bool:
    return os.path.exists(os.path.join(parameter_dir, f"{FINALIZED_EPOCH}.save"))
