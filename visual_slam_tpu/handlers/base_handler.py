"""Periodic background-work handler ABC.

API parity with the reference BaseHandler (visual_slam/handlers/
base_handler.py:16-58): stoppable thread with a wakeup event + ``trigger()``.
Unlike the reference (whose trigger is never called — the loop is purely
timeout-driven, SURVEY.md §2 #17), ``trigger()`` here is actually wired:
the SLAM facade pokes the handler at each keyframe insertion.
Synchronous mode (threaded=False) runs ``step()`` inline from ``trigger()``.
"""
from __future__ import annotations

import abc
import logging
import threading


class BaseHandler(abc.ABC):
    def __init__(self, run_timeout: float = 0.1, threaded: bool = False,
                 logger: logging.Logger | None = None):
        self.run_timeout = run_timeout
        self.threaded = threaded
        self.logger = logger or logging.getLogger(self.__class__.__name__)
        self._stop_flag = threading.Event()
        self._wakeup = threading.Event()
        self._thread: threading.Thread | None = None

    def start(self) -> None:
        if self.threaded and self._thread is None:
            self._stop_flag.clear()
            self._thread = threading.Thread(
                target=self.run, daemon=True, name=self.__class__.__name__
            )
            self._thread.start()

    def stop(self) -> None:
        self._stop_flag.set()
        self._wakeup.set()

    def join(self, timeout: float | None = None) -> None:
        if self._thread is not None:
            self._thread.join(timeout)
            self._thread = None

    def trigger(self) -> None:
        """Request one unit of work. Inline when not threaded."""
        if self.threaded:
            self._wakeup.set()
        else:
            try:
                self.step()
            except Exception:  # pragma: no cover
                self.logger.exception("handler step failed")

    def run(self) -> None:
        while not self._stop_flag.is_set():
            self._wakeup.wait(timeout=self.run_timeout)
            self._wakeup.clear()
            if self._stop_flag.is_set():
                break
            try:
                self.step()
            except Exception:  # pragma: no cover
                self.logger.exception("handler step failed")

    @abc.abstractmethod
    def step(self) -> None:
        """One unit of background work."""
