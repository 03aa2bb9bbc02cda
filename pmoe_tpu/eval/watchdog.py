"""Hang detection for the closed-loop tick engine.

Rebuild of srunner's layered watchdogs (reference
srunner/scenariomanager/watchdog.py:21-77 + timer.py GameTime:17): a thread
timer that interrupts the main thread if the simulator or the agent stops
ticking (the reference's only failure detector during evaluation, SURVEY §5).
"""

from __future__ import annotations

import _thread
import threading
import time

__all__ = ["Watchdog", "GameTime"]


class Watchdog:
    """Raises KeyboardInterrupt in the main thread on timeout unless
    ``update()`` is called periodically."""

    def __init__(self, timeout: float = 1.0):
        self._timeout = timeout + 1.0
        self._failed = False
        self._timer = None
        self._stopped = True

    def start(self) -> None:
        self._stopped = False
        self._spawn()

    def _spawn(self) -> None:
        self._timer = threading.Timer(self._timeout, self._on_timeout)
        self._timer.daemon = True
        self._timer.start()

    def update(self) -> None:
        if self._stopped:
            return
        self._timer.cancel()
        self._spawn()

    def stop(self) -> None:
        self._stopped = True
        if self._timer is not None:
            self._timer.cancel()

    def _on_timeout(self) -> None:
        self._failed = True
        self._stopped = True
        _thread.interrupt_main()

    def get_status(self) -> bool:
        return not self._failed


class GameTime:
    """Simulation-clock singleton fed by tick callbacks
    (reference srunner timer.py:17-148)."""

    _current_game_time = 0.0
    _carla_time = 0.0
    _last_frame = 0
    _platform_timestamp = 0.0
    _init = False

    @staticmethod
    def on_carla_tick(timestamp) -> None:
        """timestamp: object with .frame and .elapsed_seconds (or a
        SensorFrame)."""
        frame = getattr(timestamp, "frame", 0)
        elapsed = getattr(timestamp, "elapsed_seconds",
                          getattr(timestamp, "timestamp", 0.0))
        if GameTime._last_frame < frame:
            frames = frame - GameTime._last_frame
            GameTime._last_frame = frame
            if GameTime._init:
                GameTime._current_game_time += (
                    elapsed - GameTime._carla_time)
            GameTime._carla_time = elapsed
            GameTime._platform_timestamp = time.time()
            GameTime._init = True

    @staticmethod
    def restart() -> None:
        GameTime._current_game_time = 0.0
        GameTime._carla_time = 0.0
        GameTime._last_frame = 0
        GameTime._init = False

    @staticmethod
    def get_time() -> float:
        return GameTime._current_game_time

    @staticmethod
    def get_frame() -> int:
        return GameTime._last_frame

    @staticmethod
    def get_wallclocktime() -> float:
        return GameTime._platform_timestamp
