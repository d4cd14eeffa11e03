"""Preemption-signal handling (SURVEY.md §5 failure-detection row).

The reference has no preemption story (resume-only, reference
train_flow_latent.py:104-116). On Cloud TPU the idiomatic equivalent is
SIGTERM-driven checkpointing: the runtime delivers SIGTERM to the host
process ahead of a maintenance event / spot reclaim, and the training loop
flushes an Orbax content checkpoint and exits cleanly so the next
incarnation resumes mid-training.

Usage:
    with PreemptionGuard() as guard:
        for step in ...:
            ...
            if guard.preempted:
                save_content(...); return

The guard only sets a flag from the signal handler (async-signal-safe) —
the training loop decides when to act, so a checkpoint is never written
from inside a handler while a jitted step is in flight.
"""

from __future__ import annotations

import signal
from typing import Iterable


class PreemptionGuard:
    """Installs handlers for the given signals; restores previous handlers
    on exit. ``preempted`` flips to True when any signal arrives."""

    def __init__(self, signals: Iterable[int] = (signal.SIGTERM,)):
        self._signals = tuple(signals)
        self._previous = {}
        self._preempted = False

    @property
    def preempted(self) -> bool:
        return self._preempted

    def _handler(self, signum, frame):
        self._preempted = True

    def __enter__(self) -> "PreemptionGuard":
        for s in self._signals:
            self._previous[s] = signal.signal(s, self._handler)
        return self

    def __exit__(self, *exc):
        for s, prev in self._previous.items():
            signal.signal(s, prev)
        self._previous.clear()
        return False
