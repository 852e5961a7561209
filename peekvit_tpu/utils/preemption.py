"""Preemption-safe training: catch SIGTERM, checkpoint, exit clean.

TPU pods (especially preemptible/spot capacity) get reclaimed with a
SIGTERM and a short grace window. The reference has no notion of this —
an interrupted run loses everything since its last periodic save
(/root/reference/train/train.py:129-133 saves only every
``checkpoint_every`` epochs and installs no handler). Here the train
entries install a :class:`PreemptionGuard`: the signal only flips a flag,
the batch loop polls it between steps (``Trainer.train_epoch
(should_stop=...)``), and the entry then writes one SYNCHRONOUS
checkpoint — params AND optimizer state, tagged ``partial`` in its
metadata — before returning. Together with ``training.auto_resume`` the
contract is:

- a run killed mid-epoch N resumes AT epoch N (the partial epoch
  replays: optimizer state is a warm restart, not a bitwise
  continuation — the standard contract for preemption handlers);
- a run killed between epochs resumes at the next epoch;
- nothing is ever resumed from a torn file: visibility still rides
  orbax's atomic params-dir rename (utils/checkpoint.py).

The handler chains any previously-installed handler so test harnesses /
launchers that also trap SIGTERM keep working.
"""

from __future__ import annotations

import signal
import threading
from typing import Iterable


class PreemptionGuard:
    """Flag-only signal handler: safe to poll from the training loop.

    Use as a context manager so the previous handlers are restored::

        with PreemptionGuard() as guard:
            trainer.train_epoch(loader, e, should_stop=guard)

    The instance itself is callable (returns ``triggered``) so it can be
    passed directly as ``should_stop=``. Signal handlers only fire on the
    main thread; installing from a non-main thread raises in CPython, so
    ``install`` degrades to a no-op guard there (``triggered`` stays
    False) — covers pytest workers and the serving host's threads.
    """

    def __init__(self, signals: Iterable[int] = (signal.SIGTERM,)):
        self._signals = tuple(signals)
        self._prev = {}
        self._event = threading.Event()
        self.installed = False

    # -- flag surface -----------------------------------------------------
    @property
    def triggered(self) -> bool:
        return self._event.is_set()

    def __call__(self) -> bool:
        return self.triggered

    def trigger(self) -> None:
        """Manual trip (tests; cooperative shutdown without a signal)."""
        self._event.set()

    # -- handler lifecycle --------------------------------------------------
    def _handle(self, signum, frame):
        self._event.set()
        prev = self._prev.get(signum)
        if callable(prev):  # chain launcher/test-harness handlers
            prev(signum, frame)

    def install(self) -> "PreemptionGuard":
        if threading.current_thread() is not threading.main_thread():
            return self  # signals are main-thread-only in CPython
        for s in self._signals:
            self._prev[s] = signal.getsignal(s)
            signal.signal(s, self._handle)
        self.installed = True
        return self

    def uninstall(self) -> None:
        if not self.installed:
            return
        for s, prev in self._prev.items():
            signal.signal(s, prev)
        self._prev.clear()
        self.installed = False

    def __enter__(self) -> "PreemptionGuard":
        return self.install()

    def __exit__(self, *exc) -> None:
        self.uninstall()
