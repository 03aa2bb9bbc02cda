"""Episode tick engine — the reference ScenarioManager's run loop
(/root/reference/PMoE/leaderboard/leaderboard/scenarios/scenario_manager.py:118-181)
rebuilt over the simulator seam and shared by the NoCrash and leaderboard
evaluators:

* blocking sensor collection through :class:`pmoe_tpu.sim.sensor_interface.SensorHub`
  (tag-keyed queue + pseudo-sensor reader threads, 10 s timeout);
* layered :class:`pmoe_tpu.eval.watchdog.Watchdog` around the tick +
  :class:`GameTime` fed per tick (scenario_manager.py:64-70,138-181);
* the exception taxonomy (nocrash_evaluator.py:305-354): agent crashes raise
  :class:`AgentError` (episode fails, run continues), sensor loss raises
  :class:`SensorReceivedNoData` (run aborts), simulator hangs surface as
  RuntimeError via the watchdog;
* optional adversarial :class:`pmoe_tpu.eval.scenarios.ScenarioInjector`
  triggers (route_scenario.py:362-415).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

from ..sim.interface import DrivingBackend, SensorFrame
from ..sim.sensor_interface import AgentError, SensorHub, SensorReceivedNoData
from .criteria import CriteriaTree
from .watchdog import GameTime, Watchdog

__all__ = ["run_episode", "EpisodeResult", "AgentError",
           "SensorReceivedNoData"]


@dataclass
class EpisodeResult:
    ticks: int = 0
    agent_error: Optional[str] = None
    fired_scenarios: List[str] = field(default_factory=list)

    @property
    def crashed(self) -> bool:
        return self.agent_error is not None


def run_episode(backend: DrivingBackend, agent, criteria: CriteriaTree,
                first_frame: SensorFrame, max_ticks: Optional[int] = None,
                injector=None, sensor_timeout: float = 10.0,
                watchdog_timeout: float = 120.0,
                sensor_hub: Optional[SensorHub] = None,
                route=None, recorder=None) -> EpisodeResult:
    """Run one closed-loop episode until a terminal criterion / max_ticks.

    The caller owns backend reset, criteria construction, and stats logging;
    ``sensor_hub`` may be injected for failure-injection tests. When the
    agent declares sensors, the hub is derived from (and validated against)
    that declaration; agents with no declaration get the default suite.
    ``recorder`` (an :class:`~pmoe_tpu.eval.recorder.EpisodeRecorder`) gets
    one ``on_tick`` per sim step plus the final criteria — the CARLA
    recorder-log analog the metrics module replays.
    """
    result = EpisodeResult()
    frame = first_frame
    if sensor_hub is not None:
        hub = sensor_hub
    elif getattr(agent, "sensors", lambda: [])():
        hub = SensorHub.for_agent(agent, backend, route=route,
                                  timeout=sensor_timeout, frame=frame)
    else:
        hub = SensorHub(timeout=sensor_timeout,
                        with_camera=frame.rgb is not None)
    watchdog = Watchdog(timeout=watchdog_timeout)
    GameTime.restart()
    try:
        hub.on_frame(frame)
        while True:
            GameTime.on_carla_tick(frame)
            input_data = hub.get_data()     # SensorReceivedNoData propagates
            try:
                control = agent.run_step(input_data, frame.timestamp)
            except Exception as e:          # agent crash != simulator crash
                raise AgentError(f"{type(e).__name__}: {e}") from e
            if result.ticks == 0:
                # arm only after the first step: the first run_step jit
                # compile (20-40 s on TPU, worse on loaded CPU) must not
                # count as a hang
                watchdog.start()
            frame = backend.tick(control)
            watchdog.update()
            hub.on_frame(frame)
            ego = backend.ego_state()
            if injector is not None:
                result.fired_scenarios += injector.update(
                    backend, (ego.x, ego.y))
            criteria.update(ego, frame)
            if recorder is not None:
                recorder.on_tick(backend, frame)
            result.ticks += 1
            if criteria.should_terminate:
                break
            if max_ticks is not None and result.ticks >= max_ticks:
                break
    except AgentError as e:
        result.agent_error = str(e)
    except KeyboardInterrupt:
        if not watchdog.get_status():
            raise RuntimeError(
                "simulator/agent stopped ticking (watchdog timeout)") from None
        raise
    finally:
        watchdog.stop()
        if sensor_hub is None:              # we own the hub's reader threads
            hub.stop()
    criteria.finalize()                     # settle achieved-goal criteria
    if recorder is not None:
        recorder.record_criteria(criteria)
    return result
