"""OpenSCENARIO (.xosc) support — the functional subset of the reference's
OpenSCENARIO engine (srunner/openscenario/, srunner/tools/openscenario_parser.py,
srunner/scenarios/open_scenario.py) compiled onto the behavior-tree engine.

An OpenSCENARIO 1.0 document is parsed into
:class:`OpenScenarioConfiguration` (entities, init actions, story events,
stop trigger, parameters) and executed by :class:`OpenScenario`, a
:class:`~pmoe_tpu.eval.behaviors.BasicScenario` whose behavior tree is
generated from the story:

* Entities: ``ScenarioObject`` with Vehicle / Pedestrian / MiscObject —
  mapped to the fake backend's vehicle / walker / static actor kinds. The
  entity named ``hero`` (or ``ego_vehicle``) is the ego and is driven by the
  agent, not scripted.
* Init: per-entity ``TeleportAction`` (WorldPosition or LanePosition) +
  ``SpeedAction``; global ``EnvironmentAction`` (starting weather).
* Story events: StartTrigger conditions ``SimulationTimeCondition``,
  ``ReachPositionCondition``, ``RelativeDistanceCondition`` /
  ``DistanceCondition``, ``TraveledDistanceCondition``; actions
  ``SpeedAction``, ``TeleportAction``, routing ``AcquirePositionAction``,
  and ``EnvironmentAction`` (mid-story weather change).
* Storyboard StopTrigger ``SimulationTimeCondition`` becomes the scenario
  timeout.
* ``ParameterDeclarations`` are substituted into ``$name`` references;
  parameters named ``criteria_<Name>`` enable the matching criterion, the
  srunner convention (openscenario_parser.py criteria handling).

Unsupported OpenSCENARIO features (catalogs, controllers, relative
positions, trajectories) raise a clear error rather than being silently
ignored.
"""

from __future__ import annotations

import math
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from ..sim.interface import Route
from .behaviors import (BasicScenario, Behavior, DriveDistance, Parallel,
                        Sequence, SetNPCPath, SetNPCSpeed, SpawnNPC, Status,
                        TriggerOnDistance, TriggerOnVehicleDistance,
                        WaitForSeconds)
from .criteria import (AverageVelocityTest, BlockedTest, CollisionTest,
                       EndofRoadTest, InRadiusRegionTest, InRouteTest,
                       KeepLaneTest, OffRoadTest, OnSidewalkTest,
                       ReachedRegionTest, RouteCompletionTest,
                       RunningRedLightTest, RunningStopTest, TimeoutTest,
                       WrongLaneTest)

__all__ = ["OpenScenarioConfiguration", "OpenScenario", "load_xosc",
           "UnsupportedOpenScenarioFeature"]

_EGO_NAMES = {"hero", "ego", "ego_vehicle"}


class UnsupportedOpenScenarioFeature(ValueError):
    """Raised for OpenSCENARIO constructs outside the supported subset."""


@dataclass
class _Entity:
    name: str
    kind: str                               # vehicle | walker | static
    position: Optional[np.ndarray] = None   # from Init TeleportAction
    heading: float = 0.0
    speed: float = 0.0                      # from Init SpeedAction
    position_spec: Optional[dict] = None    # unresolved (e.g. LanePosition)

    @property
    def is_ego(self) -> bool:
        return self.name.lower() in _EGO_NAMES


@dataclass
class _Event:
    name: str
    triggers: List[Behavior] = field(default_factory=list)
    actions: List[Behavior] = field(default_factory=list)


@dataclass
class OpenScenarioConfiguration:
    """Parsed .xosc content (srunner OpenScenarioConfiguration analog)."""

    name: str = "OpenScenario"
    entities: Dict[str, _Entity] = field(default_factory=dict)
    parameters: Dict[str, str] = field(default_factory=dict)
    timeout: Optional[float] = None
    init_weather: Optional[int] = None      # Init EnvironmentAction preset
    criteria_names: List[str] = field(default_factory=list)
    # raw event specs; behaviors are built per-run because they hold state
    _story: Optional[ET.Element] = None

    @property
    def ego(self) -> Optional[_Entity]:
        for e in self.entities.values():
            if e.is_ego:
                return e
        return None


# ---------------------------------------------------------------------------
# parsing
# ---------------------------------------------------------------------------

def _subst(value: str, params: Dict[str, str]) -> str:
    if value and value.startswith("$"):
        key = value[1:]
        if key not in params:
            raise UnsupportedOpenScenarioFeature(
                f"undeclared parameter reference ${key}")
        return params[key]
    return value


def _attr(elem: ET.Element, name: str, params: Dict[str, str],
          default: Optional[str] = None) -> Optional[str]:
    v = elem.get(name, default)
    return _subst(v, params) if isinstance(v, str) else v


def _position_spec(elem: ET.Element, params) -> dict:
    """Parse a Position into a backend-independent spec: WorldPosition
    resolves immediately; LanePosition (roadId/laneId/s/offset) resolves
    against the backend's map at scenario-build time (srunner converts it
    via carla.Map.get_waypoint_xodr, openscenario_parser.py
    convert_position_to_transform)."""
    wp = elem.find(".//WorldPosition")
    if wp is not None:
        x = float(_attr(wp, "x", params, "0"))
        y = float(_attr(wp, "y", params, "0"))
        h = float(_attr(wp, "h", params, "0"))
        return {"kind": "world", "xy": np.array([x, y]), "h": h}
    lp = elem.find(".//LanePosition")
    if lp is not None:
        return {"kind": "lane",
                "road": int(float(_attr(lp, "roadId", params, "0"))),
                "lane": int(float(_attr(lp, "laneId", params, "-1"))),
                "s": float(_attr(lp, "s", params, "0")),
                "offset": float(_attr(lp, "offset", params, "0"))}
    raise UnsupportedOpenScenarioFeature(
        "only WorldPosition / LanePosition are supported (got "
        f"{[c.tag for c in elem.iter()][1:3]})")


def _resolve_position(spec: dict, backend) -> tuple:
    """(xy, heading) for a position spec. LanePosition: ``roadId`` indexes
    the backend's ``road_polylines()`` table (the OpenDRIVE road-id analog
    of the map seam), ``s`` is arclength along the centerline, ``laneId``
    follows OpenDRIVE: negative lanes lie right of the reference line and
    run along +s, positive lanes left and against it."""
    if spec["kind"] == "world":
        return spec["xy"], spec["h"]
    roads = backend.road_polylines()
    if not (0 <= spec["road"] < len(roads)):
        raise UnsupportedOpenScenarioFeature(
            f"LanePosition roadId {spec['road']} outside the map's "
            f"{len(roads)} roads")
    line, half_width = roads[spec["road"]]
    line = np.asarray(line, float)
    seg = np.diff(line, axis=0)
    seg_len = np.linalg.norm(seg, axis=1)
    cum = np.concatenate([[0.0], np.cumsum(seg_len)])
    s = float(np.clip(spec["s"], 0.0, cum[-1]))
    i = int(np.searchsorted(cum[1:], s, side="right"))
    i = min(i, len(seg) - 1)
    t = (s - cum[i]) / max(seg_len[i], 1e-9)
    point = line[i] + t * seg[i]
    tangent = seg[i] / max(seg_len[i], 1e-9)
    normal_right = np.array([tangent[1], -tangent[0]])    # right of +s
    lane = spec["lane"]
    # lane centers sit (|laneId| - 0.5) widths from the reference line:
    # negative ids right of it, positive left; ``offset`` is the OpenDRIVE
    # t-offset (positive to the LEFT of +s)
    lateral = (abs(lane) - 0.5) * half_width if lane != 0 else 0.0
    side = 1.0 if lane < 0 else -1.0
    xy = point + side * lateral * normal_right - spec["offset"] * normal_right
    heading = math.atan2(tangent[1], tangent[0])
    if lane > 0:                                      # against +s
        heading += math.pi
    return xy, heading


def _weather_preset(env: ET.Element, params) -> int:
    """Map an OpenSCENARIO Weather element to the nearest NoCrash preset id
    (srunner builds carla.WeatherParameters from the same fields,
    openscenario_parser.py get_weather_from_env_action). Sun ``elevation``
    is radians; ``Precipitation intensity`` is 0..1."""
    sun = env.find(".//Sun")
    prec = env.find(".//Precipitation")
    elevation = float(_attr(sun, "elevation", params, "1.31")) \
        if sun is not None else 1.31
    intensity = float(_attr(prec, "intensity", params, "0")) \
        if prec is not None else 0.0
    noon = elevation > 0.52          # > 30 degrees
    if intensity <= 0.05:
        return 1 if noon else 8
    if intensity < 0.7:
        return 3 if noon else 10
    return 6 if noon else 14


def _world_position(elem: ET.Element, params) -> tuple:
    """WorldPosition-only resolution for call sites that have no backend."""
    spec = _position_spec(elem, params)
    if spec["kind"] != "world":
        raise UnsupportedOpenScenarioFeature(
            "this construct requires a WorldPosition")
    return spec["xy"], spec["h"]


def _speed_target(action: ET.Element, params) -> float:
    tgt = action.find(".//AbsoluteTargetSpeed")
    if tgt is None:
        raise UnsupportedOpenScenarioFeature(
            "only AbsoluteTargetSpeed SpeedActions are supported")
    return float(_attr(tgt, "value", params, "0"))


def load_xosc(path: str) -> OpenScenarioConfiguration:
    """Parse a .xosc file into an :class:`OpenScenarioConfiguration`."""
    root = ET.parse(path).getroot()
    cfg = OpenScenarioConfiguration()
    header = root.find("FileHeader")
    if header is not None:
        cfg.name = header.get("description", cfg.name)

    # parameters (+ criteria_* convention)
    for p in root.findall(".//ParameterDeclarations/ParameterDeclaration"):
        pname, pval = p.get("name", ""), p.get("value", "")
        cfg.parameters[pname] = pval
        if pname.startswith("criteria_") and pval.lower() not in ("false", "0"):
            cfg.criteria_names.append(pname[len("criteria_"):])

    # entities
    for so in root.findall(".//Entities/ScenarioObject"):
        name = so.get("name", f"entity{len(cfg.entities)}")
        if so.find("CatalogReference") is not None:
            raise UnsupportedOpenScenarioFeature(
                f"catalogs are not supported (entity {name})")
        if so.find("Vehicle") is not None:
            kind = "vehicle"
        elif so.find("Pedestrian") is not None:
            kind = "walker"
        elif so.find("MiscObject") is not None:
            kind = "static"
        else:
            raise UnsupportedOpenScenarioFeature(
                f"entity {name} has no Vehicle/Pedestrian/MiscObject")
        cfg.entities[name] = _Entity(name=name, kind=kind)

    # init actions
    for priv in root.findall(".//Storyboard/Init/Actions/Private"):
        ent = cfg.entities.get(priv.get("entityRef", ""))
        if ent is None:
            continue
        for action in priv.findall("PrivateAction"):
            tele = action.find(".//TeleportAction")
            if tele is not None:
                spec = _position_spec(tele, cfg.parameters)
                ent.position_spec = spec
                if spec["kind"] == "world":
                    ent.position, ent.heading = spec["xy"], spec["h"]
            speed = action.find(".//SpeedAction")
            if speed is not None:
                ent.speed = _speed_target(speed, cfg.parameters)

    # Init global EnvironmentAction -> starting weather preset
    for env in root.findall(
            ".//Storyboard/Init/Actions/GlobalAction//EnvironmentAction"):
        cfg.init_weather = _weather_preset(env, cfg.parameters)

    # storyboard stop trigger -> timeout
    for cond in root.findall(
            ".//Storyboard/StopTrigger//SimulationTimeCondition"):
        cfg.timeout = float(_attr(cond, "value", cfg.parameters, "300"))

    story = root.find(".//Storyboard/Story")
    cfg._story = story
    return cfg


# ---------------------------------------------------------------------------
# execution
# ---------------------------------------------------------------------------

class _TeleportNPC(Behavior):
    """TeleportAction on a scripted entity: instantaneous reposition."""

    def __init__(self, spawner: SpawnNPC, position, heading: float = 0.0):
        self.spawner = spawner
        self.position = np.asarray(position, float)
        self.heading = heading

    def tick(self, backend, ego) -> Status:
        npc = self.spawner.npc
        if npc is None:
            return Status.FAILURE
        d = np.array([math.cos(self.heading), math.sin(self.heading)])
        npc.a = self.position.copy()
        npc.b = self.position + 100.0 * d
        npc.phase = (-backend.t * npc.speed / 100.0) % 2.0
        return Status.SUCCESS


class _SetWeather(Behavior):
    """GlobalAction EnvironmentAction: switch the weather preset mid-episode
    (srunner ChangeWeather atomic, openscenario_parser.py
    get_weather_from_env_action)."""

    def __init__(self, preset: int):
        self.preset = int(preset)

    def tick(self, backend, ego) -> Status:
        backend.set_weather(self.preset)
        return Status.SUCCESS


class _TriggerOnNPCTraveled(Behavior):
    """TraveledDistanceCondition for a scripted entity."""

    def __init__(self, spawner: SpawnNPC, distance: float):
        self.spawner = spawner
        self.distance = distance
        self._start: Optional[np.ndarray] = None
        self._traveled = 0.0
        self._last: Optional[np.ndarray] = None

    def tick(self, backend, ego) -> Status:
        npc = self.spawner.npc
        if npc is None:
            return Status.FAILURE
        pos = npc.position(backend.t)
        if self._last is not None:
            self._traveled += float(np.linalg.norm(pos - self._last))
        self._last = pos
        return Status.SUCCESS if self._traveled >= self.distance \
            else Status.RUNNING


class OpenScenario(BasicScenario):
    """Executes a parsed .xosc (srunner/scenarios/open_scenario.py analog).

    Construct via :meth:`from_file` or pass a configuration::

        scenario = OpenScenario(backend, route, config=load_xosc(path))
    """

    def __init__(self, backend, route: Route, seed: int = 0,
                 config: Optional[OpenScenarioConfiguration] = None):
        if config is None:
            raise ValueError("OpenScenario requires a parsed configuration")
        self.config = config
        if config.timeout is not None:
            self.timeout = config.timeout
        self._spawners: Dict[str, SpawnNPC] = {}
        super().__init__(backend, route, seed=seed)

    @classmethod
    def from_file(cls, backend, route: Route, path: str, seed: int = 0):
        return cls(backend, route, seed=seed, config=load_xosc(path))

    # -- story compilation ----------------------------------------------------
    def _spawner_for(self, name: str) -> SpawnNPC:
        ent = self.config.entities[name]
        if name not in self._spawners:
            if ent.position is not None:
                pos, heading = ent.position, ent.heading
            elif ent.position_spec is not None:     # e.g. LanePosition
                pos, heading = _resolve_position(ent.position_spec,
                                                 self.backend)
            else:
                pos = np.asarray(self.route.positions[0], float) + 10.0
                heading = ent.heading
            d = np.array([math.cos(heading), math.sin(heading)])
            self._spawners[name] = SpawnNPC(
                ent.kind, pos, pos + 100.0 * d, speed=ent.speed)
        return self._spawners[name]

    def _position(self, elem: ET.Element) -> tuple:
        """(xy, heading) of any supported Position under ``elem``, resolved
        against this scenario's backend (LanePosition needs the map)."""
        return _resolve_position(
            _position_spec(elem, self.config.parameters), self.backend)

    def _compile_condition(self, cond: ET.Element) -> Optional[Behavior]:
        params = self.config.parameters
        st = cond.find(".//SimulationTimeCondition")
        if st is not None:
            return WaitForSeconds(float(_attr(st, "value", params, "0")))
        rp = cond.find(".//ReachPositionCondition")
        if rp is not None:
            pos, _h = self._position(rp)
            tol = float(_attr(rp, "tolerance", params, "5"))
            ref = self._condition_entity(cond)
            if ref is None or ref.is_ego:
                return TriggerOnDistance(pos, tol)
            raise UnsupportedOpenScenarioFeature(
                "ReachPositionCondition on scripted entities")
        # NB: explicit None checks — ElementTree elements are falsy when they
        # have no children, so `find(...) or find(...)` silently drops the
        # normal attribute-only <RelativeDistanceCondition .../> form.
        rd = cond.find(".//RelativeDistanceCondition")
        if rd is None:
            rd = cond.find(".//DistanceCondition")
        if rd is not None:
            value = float(_attr(rd, "value", params, "10"))
            other = _attr(rd, "entityRef", params) or \
                self._first_scripted_name()
            if other and not self.config.entities[other].is_ego:
                return TriggerOnVehicleDistance(self._spawner_for(other),
                                                value)
            ref = self._condition_entity(cond)
            if ref is not None and not ref.is_ego:
                return TriggerOnVehicleDistance(
                    self._spawner_for(ref.name), value)
            raise UnsupportedOpenScenarioFeature(
                "distance condition between two egos")
        td = cond.find(".//TraveledDistanceCondition")
        if td is not None:
            value = float(_attr(td, "value", params, "10"))
            ref = self._condition_entity(cond)
            if ref is None or ref.is_ego:
                return DriveDistance(value)
            return _TriggerOnNPCTraveled(self._spawner_for(ref.name), value)
        return None                     # unrecognized condition: no gate

    def _condition_entity(self, cond: ET.Element) -> Optional[_Entity]:
        for er in cond.findall(".//TriggeringEntities/EntityRef"):
            name = er.get("entityRef", "")
            if name in self.config.entities:
                return self.config.entities[name]
        return None

    def _first_scripted_name(self) -> Optional[str]:
        for name, e in self.config.entities.items():
            if not e.is_ego:
                return name
        return None

    def _compile_action(self, action: ET.Element, actor: str) \
            -> Optional[Behavior]:
        params = self.config.parameters
        ent = self.config.entities.get(actor)
        if ent is None or ent.is_ego:
            return None                 # the agent drives the ego
        spawner = self._spawner_for(actor)
        speed = action.find(".//SpeedAction")
        if speed is not None:
            return SetNPCSpeed(spawner, _speed_target(speed, params))
        tele = action.find(".//TeleportAction")
        if tele is not None:
            pos, h = self._position(tele)
            return _TeleportNPC(spawner, pos, h)
        acquire = action.find(".//AcquirePositionAction")
        if acquire is not None:
            pos, _h = self._position(acquire)
            return SetNPCPath(spawner, pos)
        return None

    def _create_behavior(self) -> Behavior:
        events: List[Behavior] = []
        spawn_all: List[Behavior] = []
        story = self.config._story
        if story is not None:
            for mg in story.findall(".//ManeuverGroup"):
                actors = [a.get("entityRef", "") for a in
                          mg.findall(".//Actors/EntityRef")]
                actor = actors[0] if actors else \
                    (self._first_scripted_name() or "")
                for ev in mg.findall(".//Event"):
                    event = _Event(name=ev.get("name", "event"))
                    for cond in ev.findall("StartTrigger//Condition"):
                        b = self._compile_condition(cond)
                        if b is not None:
                            event.triggers.append(b)
                    for act in ev.findall("Action"):
                        env = act.find(".//EnvironmentAction")
                        b = (_SetWeather(_weather_preset(
                                 env, self.config.parameters))
                             if env is not None
                             else self._compile_action(act, actor))
                        if b is not None:
                            event.actions.append(b)
                    if event.actions or event.triggers:
                        events.append(Sequence(
                            event.triggers + event.actions,
                            name=event.name))
        # Init EnvironmentAction: apply the starting weather before any tick
        if self.config.init_weather is not None:
            spawn_all.append(_SetWeather(self.config.init_weather))
        # spawn every scripted entity that has an init position up front
        for name, ent in self.config.entities.items():
            if not ent.is_ego and (ent.position is not None
                                   or ent.position_spec is not None):
                spawn_all.append(self._spawner_for(name))
        body: Behavior = Parallel(events, success_on_one=False,
                                  name="story") if events else \
            DriveDistance(max(0.5 * self.route.length, 20.0))
        return Sequence(spawn_all + [body], name=self.config.name)

    def _create_criteria(self) -> List:
        goal = np.asarray(self.route.positions[-1], float)
        table = {
            # the srunner openscenario_parser criteria_* surface (its imports
            # at tools/openscenario_parser.py:37-51) — full 18-class parity
            "CollisionTest": lambda: CollisionTest(),
            "RouteCompletionTest": lambda: RouteCompletionTest(self.route),
            "RunningRedLightTest": lambda: RunningRedLightTest(self.backend),
            "RunningStopTest": lambda: RunningStopTest(self.backend),
            "InRouteTest": lambda: InRouteTest(self.route),
            "BlockedTest": lambda: BlockedTest(),
            "TimeoutTest": lambda: TimeoutTest(self.route),
            "AverageVelocityTest": lambda: AverageVelocityTest(1.0),
            "KeepLaneTest": lambda: KeepLaneTest(self.backend),
            "OffRoadTest": lambda: OffRoadTest(self.backend),
            "EndofRoadTest": lambda: EndofRoadTest(self.backend),
            "OnSidewalkTest": lambda: OnSidewalkTest(self.backend),
            "WrongLaneTest": lambda: WrongLaneTest(self.backend),
            "ReachedRegionTest": lambda: ReachedRegionTest(
                goal[0] - 10.0, goal[0] + 10.0, goal[1] - 10.0, goal[1] + 10.0),
            "InRadiusRegionTest": lambda: InRadiusRegionTest(
                goal[0], goal[1], 10.0),
        }
        names = self.config.criteria_names or ["CollisionTest",
                                               "RouteCompletionTest"]
        unknown = [n for n in names if n not in table]
        if unknown:
            raise UnsupportedOpenScenarioFeature(
                f"unknown criteria {unknown}; supported: {sorted(table)}")
        return [table[n]() for n in names]
