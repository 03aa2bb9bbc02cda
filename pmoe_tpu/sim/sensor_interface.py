"""Sensor collection engine with the leaderboard's blocking semantics.

Functional rebuild of the reference SensorInterface
(/root/reference/PMoE/leaderboard/leaderboard/envs/sensor_interface.py):

* tag-keyed queue; ``get_data()`` blocks until EVERY registered sensor has
  delivered a payload for the pending frame, raising
  :class:`SensorReceivedNoData` after a timeout (sensor_interface.py:398-440);
* threaded pseudo-sensor readers for speedometer and collision
  (BaseReader poll loop :202-239, SpeedometerReader :261-319,
  CollisionReader :157-200) — here event-driven per sim frame so the engine
  keeps up with a faster-than-realtime fake backend while preserving the
  asynchronous delivery/failure modes;
* the evaluator-facing exception taxonomy (nocrash_evaluator.py:305-354):
  :class:`AgentError` aborts the episode and continues to the next route,
  :class:`SensorReceivedNoData` (and any other simulator error) aborts the run.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, List, Optional

from .interface import SensorFrame

__all__ = ["SensorReceivedNoData", "AgentError", "SensorConfigurationInvalid",
           "SensorInterface", "PseudoSensorReader", "SensorHub",
           "validate_sensors", "SENSOR_LIMITS"]


class SensorReceivedNoData(RuntimeError):
    """A registered sensor did not deliver data within the timeout."""


class AgentError(RuntimeError):
    """The agent's run_step crashed; the episode fails but the run continues."""


class SensorConfigurationInvalid(RuntimeError):
    """The declared sensor suite violates the track rules
    (reference agent_wrapper.py:204-252)."""


#: per-type sensor count limits (reference agent_wrapper.py track rules)
SENSOR_LIMITS = {"sensor.camera.rgb": 4, "sensor.lidar.ray_cast": 1,
                 "sensor.other.radar": 2, "sensor.other.gnss": 1,
                 "sensor.other.imu": 1, "sensor.speedometer": 1,
                 "sensor.collision": 1}
_MAX_SENSOR_OFFSET = 3.0


def validate_sensors(sensors, track) -> None:
    """Enforce the leaderboard track rules on a declared sensor suite:
    MAP-only sensors are rejected on the SENSORS track, per-type counts are
    capped, and extrinsics must stay within 3 m of the ego."""
    counts: Dict[str, int] = {}
    for s in sensors:
        stype = s.get("type", "")
        if stype in ("sensor.map", "sensor.opendrive_map") and \
                getattr(track, "name", str(track)) == "SENSORS":
            raise SensorConfigurationInvalid(
                f"{stype} is not allowed on the SENSORS track")
        counts[stype] = counts.get(stype, 0) + 1
        if counts[stype] > SENSOR_LIMITS.get(stype, 8):
            raise SensorConfigurationInvalid(
                f"too many {stype} sensors "
                f"(limit {SENSOR_LIMITS.get(stype, 8)})")
        offset = (float(s.get("x", 0.0)) ** 2 + float(s.get("y", 0.0)) ** 2
                  + float(s.get("z", 0.0)) ** 2) ** 0.5
        if offset > _MAX_SENSOR_OFFSET + 1e-9:
            raise SensorConfigurationInvalid(
                f"sensor {s.get('id', stype)} mounted {offset:.2f} m from "
                f"the ego (limit {_MAX_SENSOR_OFFSET} m)")


class SensorInterface:
    """Tag-keyed collection queue (reference sensor_interface.py:398-440)."""

    def __init__(self, timeout: float = 10.0):
        self._tags: List[str] = []
        self._queue: "queue.Queue" = queue.Queue()
        self._timeout = timeout

    def register(self, tag: str) -> None:
        if tag in self._tags:
            raise ValueError(f"duplicated sensor tag {tag!r}")
        self._tags.append(tag)

    @property
    def tags(self) -> List[str]:
        return list(self._tags)

    def update_sensor(self, tag: str, frame: int, payload) -> None:
        if tag not in self._tags:
            raise ValueError(f"sensor {tag!r} was never registered")
        self._queue.put((tag, frame, payload))

    def get_data(self) -> Dict[str, tuple]:
        """Block until every registered tag delivered one payload; returns
        {tag: (frame, payload)}. Raises SensorReceivedNoData on timeout."""
        data: Dict[str, tuple] = {}
        try:
            while len(data) < len(self._tags):
                tag, frame, payload = self._queue.get(True, self._timeout)
                data[tag] = (frame, payload)
        except queue.Empty:
            missing = sorted(set(self._tags) - set(data))
            raise SensorReceivedNoData(
                f"sensor(s) {missing} took longer than {self._timeout}s to "
                f"send their data") from None
        return data


class PseudoSensorReader:
    """Event-driven reader thread: wakes on each sim frame, reads via
    ``read_fn(frame)``, pushes into the interface (reference BaseReader
    :202-239). ``kill()`` simulates a dead sensor (stops delivering without
    deregistering) — used by failure-injection tests."""

    def __init__(self, iface: SensorInterface, tag: str,
                 read_fn: Callable[[SensorFrame], object]):
        self._iface = iface
        self._tag = tag
        self._read_fn = read_fn
        self._wake = threading.Event()
        self._pending: Optional[SensorFrame] = None
        self._stop = False
        self._dead = False
        iface.register(tag)
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def notify(self, frame: SensorFrame) -> None:
        self._pending = frame
        self._wake.set()

    def _loop(self) -> None:
        while not self._stop:
            if not self._wake.wait(timeout=0.5):
                continue
            self._wake.clear()
            frame = self._pending
            if frame is None or self._dead:
                continue
            try:
                self._iface.update_sensor(self._tag, frame.frame,
                                          self._read_fn(frame))
            except Exception as e:       # surfaces as SensorReceivedNoData;
                self._dead = True        # log the root cause first
                print(f"[sensor] reader {self._tag!r} died: "
                      f"{type(e).__name__}: {e}")

    def kill(self) -> None:
        self._dead = True

    def stop(self) -> None:
        self._stop = True
        self._wake.set()
        self._thread.join(timeout=2)


class SensorHub:
    """Wires a backend's per-tick :class:`SensorFrame` into the blocking
    interface: direct sensors (camera/GNSS/compass) are pushed synchronously —
    the analog of carla sensor callbacks — while speedometer and collision go
    through pseudo-sensor reader threads (reference :241-319)."""

    def __init__(self, timeout: float = 10.0, with_camera: bool = True,
                 birdview_fn: Optional[Callable] = None,
                 stitch_fn: Optional[Callable] = None,
                 opendrive_fn: Optional[Callable] = None):
        self.iface = SensorInterface(timeout=timeout)
        self.with_camera = with_camera
        if with_camera:
            self.iface.register("Narrow_RGB")
        self.iface.register("GPS")
        self.iface.register("COMPASS")
        self.readers = [
            PseudoSensorReader(self.iface, "EGO",
                               lambda f: {"spd": f.speed}),
            PseudoSensorReader(self.iface, "COLLISION",
                               lambda f: f.collision is not None),
        ]
        if birdview_fn is not None:
            # MapReader analog (reference sensor_interface.py:241-258): the
            # birdview rasterizer runs in its own reader thread
            self.readers.append(
                PseudoSensorReader(self.iface, "BIRDVIEW", birdview_fn))
        if stitch_fn is not None:
            # StitchCameraReader analog (reference sensor_interface.py:53-154)
            self.readers.append(
                PseudoSensorReader(self.iface, "STITCH_RGB", stitch_fn))
        if opendrive_fn is not None:
            # OpenDriveMapReader analog (reference sensor_interface.py:322-324):
            # delivers {'opendrive': <xodr string>} — the map is static, so the
            # callable caches the document and each frame re-delivers it
            self.readers.append(
                PseudoSensorReader(self.iface, "OPENDRIVE", opendrive_fn))

    @classmethod
    def for_agent(cls, agent, backend, route=None, timeout: float = 10.0,
                  frame: Optional[SensorFrame] = None) -> "SensorHub":
        """Build the hub from the agent's declared sensor suite (the
        AgentWrapper setup_sensors role, agent_wrapper.py:90-201), after
        validating it against the track rules."""
        sensors = agent.sensors() if hasattr(agent, "sensors") else []
        if sensors:
            validate_sensors(sensors, getattr(agent, "track", "SENSORS"))
        wants_camera = any(s.get("type", "").startswith("sensor.camera")
                           for s in sensors)
        has_camera = frame is None or frame.rgb is not None
        birdview_fn = None
        if any(s.get("type") == "sensor.map" for s in sensors):
            from .birdview import render_birdview

            birdview_fn = lambda f: render_birdview(backend, route)
        stitch_fn = None
        if any(s.get("type") == "sensor.stitch_camera.rgb" for s in sensors) \
                and hasattr(backend, "render_stitch"):
            stitch_fn = lambda f: backend.render_stitch()[..., ::-1]  # BGR
        opendrive_fn = None
        if any(s.get("type") == "sensor.opendrive_map" for s in sensors) \
                and hasattr(backend, "to_opendrive"):
            opendrive_fn = lambda f: {"opendrive": backend.to_opendrive()}
        return cls(timeout=timeout,
                   with_camera=wants_camera and has_camera,
                   birdview_fn=birdview_fn, stitch_fn=stitch_fn,
                   opendrive_fn=opendrive_fn)

    def on_frame(self, frame: SensorFrame) -> None:
        """Dispatch one synchronous tick's sensor payloads."""
        if self.with_camera and frame.rgb is not None:
            # cameras deliver BGR (reference CallBack image parser)
            self.iface.update_sensor("Narrow_RGB", frame.frame,
                                     frame.rgb[..., ::-1])
        self.iface.update_sensor("GPS", frame.frame, frame.gnss)
        self.iface.update_sensor("COMPASS", frame.frame, frame.compass)
        for r in self.readers:
            r.notify(frame)

    def get_data(self) -> Dict[str, tuple]:
        return self.iface.get_data()

    def stop(self) -> None:
        for r in self.readers:
            r.stop()
