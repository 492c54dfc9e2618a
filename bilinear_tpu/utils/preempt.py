"""Graceful preemption for the training CLIs.

TPU VMs (and any managed fleet) deliver SIGTERM ahead of reclamation. The
reference's crash story is restart-from-newest-checkpoint (bilinear.sh:1 +
model/bilinear.py:63-83): a kill loses the whole in-flight epochs_per_run
block. This narrows the loss to the current epoch: on SIGTERM/SIGINT the
trainer finishes the epoch it is in, checkpoints it as usual, and exits 0;
the next invocation's auto-resume continues from there.

Epoch granularity is deliberate — checkpoints are integer-epoch-tagged
(io/checkpoint.py) and the resume contract assumes a fully trained epoch,
so stopping mid-epoch would either corrupt the numbering or waste the
partial epoch anyway.
"""
from __future__ import annotations

import signal


class GracefulShutdown:
    """Context manager: latch SIGTERM/SIGINT instead of dying mid-epoch.

    Usage::

        with GracefulShutdown(logger) as stop:
            for epoch in ...:
                train_one_epoch(); save_checkpoint()
                if stop.requested:
                    break

    The first signal sets ``requested``; a second signal of the same kind
    falls through to the previous (default) handler, so a double Ctrl-C
    still kills a stuck process. Handlers are restored on exit.
    """

    def __init__(self, logger=None, signals=(signal.SIGTERM, signal.SIGINT)):
        self._logger = logger
        self._signals = signals
        self._previous = {}
        self.requested = False
        self._pending_signame = None  # logged from the main loop; logging
        # is not async-signal-safe, so the handler only sets flags (a signal
        # landing mid-emit could interleave with the trainer's own logging)

    def _handle(self, signum, frame):
        self.requested = True
        self._pending_signame = signal.Signals(signum).name
        # Re-arm the previous handler: a second signal is an actual kill.
        # signal.signal() reports None for handlers installed by C code
        # (e.g. a runtime plugin) — fall back to the default disposition.
        prev = self._previous.get(signum) or signal.SIG_DFL
        signal.signal(signum, prev)

    def log_pending(self) -> None:
        """Emit the deferred 'preemption received' line (main-thread-safe);
        called by the trainers at their next epoch-end check."""
        if self._pending_signame and self._logger is not None:
            self._logger.info(
                "%s received - finishing the current epoch, checkpointing, "
                "then exiting (auto-resume continues from there)",
                self._pending_signame,
            )
            self._pending_signame = None

    def __enter__(self):
        for s in self._signals:
            try:
                self._previous[s] = signal.signal(s, self._handle)
            except ValueError:  # not in the main thread (e.g. test runner)
                pass
        return self

    def __exit__(self, *exc):
        for s, prev in self._previous.items():
            try:
                signal.signal(s, prev or signal.SIG_DFL)
            except ValueError:
                pass
        return False


def global_requested(local: bool) -> bool:
    """Agree on preemption across processes (multi-host DP runs).

    A SIGTERM usually reaches only some processes (one host of a slice);
    if those exited alone the rest would hang in the next epoch's global
    collectives. Stop when ANY process was signaled: a one-element
    process_allgather doubles as the agreement barrier. Single-process
    runs short-circuit to the local flag.
    """
    import jax

    if jax.process_count() == 1:
        return local
    import numpy as np
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(np.asarray([bool(local)]))
    return bool(np.asarray(flags).any())
