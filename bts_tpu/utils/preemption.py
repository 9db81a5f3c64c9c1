"""Preemption-safe training: SIGTERM -> checkpoint at a step boundary -> exit 0.

Failure-recovery subsystem (SURVEY.md §5): the reference relies on manual
restart + checkpoint resume; on TPU pods preemption is ROUTINE — Cloud
preempts/maintenance-drains VMs with a SIGTERM and a short grace window —
so the train driver turns the signal into a cooperative stop:

    SIGTERM -> finish the in-flight step -> final orbax checkpoint
            -> exit 0 (scheduler restarts; sample-exact resume continues
               the data stream at the saved step)

Multi-host correctness: hosts can observe the signal at different step
indices; if one rank breaks a step earlier than another, the next
collective hangs until the grace window kills the job — losing the very
checkpoint the guard exists to write.  ``should_stop`` therefore only
decides at a fixed step cadence (``sync_freq``), where every process
contributes its local flag to a global OR (``process_allgather``); all
ranks see the same verdict at the same step and break together.
"""

from __future__ import annotations

import signal
from typing import Iterable

import numpy as np


class PreemptionGuard:
    """Install signal handlers that request a cooperative training stop.

    Usage (cli/bts_main.py)::

        guard = PreemptionGuard(sync_freq=cfg.preempt_sync_freq)
        try:
            state = trainer.run(..., should_stop=guard.should_stop)
        finally:
            guard.uninstall()
        # the driver's existing final save persists `state` at the break step

    Only the main thread may install signal handlers (CPython rule); the
    train loop already runs there in every driver.
    """

    def __init__(
        self,
        signals: Iterable[int] = (signal.SIGTERM,),
        sync_freq: int = 10,
    ):
        self.sync_freq = max(1, int(sync_freq))
        self._flag = False
        self._prev = {}
        for s in signals:
            self._prev[s] = signal.signal(s, self._handler)

    def _handler(self, signum, frame):
        self._flag = True
        print(
            f"[bts_tpu] received signal {signum}: will checkpoint and stop at "
            "the next step boundary",
            flush=True,
        )

    @property
    def preempted(self) -> bool:
        """Local flag only — for post-loop reporting, not loop control."""
        return self._flag

    def should_stop(self, step: int) -> bool:
        """True when ALL processes should break after ``step``.

        Single-process: the local flag, immediately.  Multi-process: a
        global OR evaluated only when ``step % sync_freq == 0`` — every rank
        executes the same allgather at the same step, so the collective
        cannot be entered by a subset of ranks.
        """
        import jax

        if jax.process_count() == 1:
            return self._flag
        if step % self.sync_freq != 0:
            return False
        from jax.experimental import multihost_utils

        return bool(multihost_utils.process_allgather(np.int32(self._flag)).max())

    def uninstall(self) -> None:
        """Restore the previous handlers (so in-process test drivers and
        chained CLI calls don't leak a stale guard)."""
        for s, h in self._prev.items():
            signal.signal(s, h)
        self._prev.clear()
