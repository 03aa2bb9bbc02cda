"""OpenSCENARIO (.xosc) engine tests (pmoe_tpu/eval/openscenario.py —
reference srunner/openscenario + srunner/scenarios/open_scenario.py subset)."""

import numpy as np
import pytest

from pmoe_tpu.eval.behaviors import Status
from pmoe_tpu.eval.openscenario import (OpenScenario,
                                        UnsupportedOpenScenarioFeature,
                                        load_xosc)
from pmoe_tpu.eval.scenario_cli import ScriptedFollowAgent, run_scenario
from pmoe_tpu.sim.fake_carla import FakeCarlaBackend
from pmoe_tpu.sim.interface import VehicleControl

XOSC = "pmoe_tpu/assets/openscenario/lead_slowdown.xosc"


def test_parse_sample_document():
    cfg = load_xosc(XOSC)
    assert set(cfg.entities) == {"hero", "lead"}
    assert cfg.entities["hero"].is_ego
    assert cfg.entities["lead"].kind == "vehicle"
    assert np.allclose(cfg.entities["lead"].position, [10.0, 42.0])
    assert cfg.parameters["leadSpeed"] == "7.0"
    assert sorted(cfg.criteria_names) == ["CollisionTest",
                                          "RouteCompletionTest",
                                          "TimeoutTest"]
    assert cfg.timeout == 120.0


def test_executes_story_and_moves_the_adversary():
    backend = FakeCarlaBackend(render=False)
    cfg = load_xosc(XOSC)

    def factory(bk, route, seed=0):
        return OpenScenario(bk, route, seed=seed, config=cfg)

    factory.__name__ = "OpenScenario"
    scenario, result = run_scenario(backend, factory, ScriptedFollowAgent(None),
                                    start_idx=0, target_idx=3,
                                    max_ticks=4000, verbose=False)
    assert scenario.status == Status.SUCCESS
    assert len(backend._npcs) == 1          # the lead was spawned once
    lead = backend._npcs[0]
    # the SpeedAction fired (lead drove away from its init position) and the
    # final SpeedAction stopped it again
    assert float(np.linalg.norm(lead.position(backend.t) - [10.0, 42.0])) > 5.0
    assert lead.speed == 0.0
    backend.close()


def test_distance_condition_gates_event():
    """The attribute-only <RelativeDistanceCondition .../> must gate the lead's
    SpeedAction: while the ego idles 40 m away (trigger is 25 m) the lead may
    not move; once the ego teleports within range, the event fires.

    Regression: ElementTree's falsy childless elements made
    ``find(A) or find(B)`` drop the condition, so the action fired at t=0."""
    backend = FakeCarlaBackend(render=False)
    route = backend.trace_route(0, 3)
    backend.reset(route)
    sc = OpenScenario(backend, route, config=load_xosc(XOSC))
    idle = VehicleControl(steer=0.0, throttle=0.0, brake=1.0)
    for _ in range(20):
        frame = backend.tick(idle)
        sc.tick(frame)
    assert len(backend._npcs) == 1
    lead = backend._npcs[0]
    assert lead.speed == 0.0                      # gate held: lead not driving
    assert np.allclose(lead.position(backend.t), [10.0, 42.0], atol=1e-6)
    # teleport the ego within the 25 m trigger radius and tick again
    backend._ego.x, backend._ego.y = 10.0, 30.0
    for _ in range(3):
        frame = backend.tick(idle)
        sc.tick(frame)
    assert lead.speed == 7.0                      # SpeedAction fired
    backend.close()


def test_criteria_from_parameter_declarations():
    backend = FakeCarlaBackend(render=False)
    route = backend.trace_route(0, 3)
    backend.reset(route)
    sc = OpenScenario(backend, route, config=load_xosc(XOSC))
    names = {type(c).__name__ for c in sc.criteria.criteria}
    assert names == {"CollisionTest", "RouteCompletionTest", "TimeoutTest"}
    assert sc.timeout == 120.0
    backend.close()


def test_parameter_substitution_rejects_undeclared(tmp_path):
    bad = tmp_path / "bad.xosc"
    bad.write_text("""<?xml version="1.0"?>
<OpenSCENARIO><Entities>
  <ScenarioObject name="npc"><Vehicle name="v" vehicleCategory="car"/></ScenarioObject>
</Entities><Storyboard><Init><Actions>
  <Private entityRef="npc"><PrivateAction><TeleportAction><Position>
    <WorldPosition x="$nope" y="0"/>
  </Position></TeleportAction></PrivateAction></Private>
</Actions></Init></Storyboard></OpenSCENARIO>""")
    with pytest.raises(UnsupportedOpenScenarioFeature, match="nope"):
        load_xosc(str(bad))


def test_catalog_reference_raises(tmp_path):
    bad = tmp_path / "cat.xosc"
    bad.write_text("""<?xml version="1.0"?>
<OpenSCENARIO><Entities>
  <ScenarioObject name="npc"><CatalogReference catalogName="c" entryName="e"/></ScenarioObject>
</Entities></OpenSCENARIO>""")
    with pytest.raises(UnsupportedOpenScenarioFeature, match="catalog"):
        load_xosc(str(bad))


XOSC2 = "pmoe_tpu/assets/openscenario/crossing_multi_act.xosc"


def test_multi_act_two_entity_document_parses():
    """The richer document (VERDICT r3 item 9): two acts, a vehicle AND a
    pedestrian entity, routing + mid-story teleport."""
    cfg = load_xosc(XOSC2)
    assert set(cfg.entities) == {"hero", "lead", "jaywalker"}
    assert cfg.entities["jaywalker"].kind == "walker"
    assert np.allclose(cfg.entities["jaywalker"].position, [2.0, 90.0])
    assert cfg.timeout == 180.0
    assert sorted(cfg.criteria_names) == [
        "CollisionTest", "InRouteTest", "RouteCompletionTest", "TimeoutTest"]


def test_multi_act_story_executes_both_acts():
    """Both acts run: the lead pulls away toward its acquired position and
    the jaywalker crosses, then is teleported clear and stopped."""
    backend = FakeCarlaBackend(render=False)
    cfg = load_xosc(XOSC2)

    def factory(bk, route, seed=0):
        return OpenScenario(bk, route, seed=seed, config=cfg)

    factory.__name__ = "OpenScenario"
    scenario, result = run_scenario(backend, factory, ScriptedFollowAgent(None),
                                    start_idx=0, target_idx=3,
                                    max_ticks=4000, verbose=False)
    assert scenario.status == Status.SUCCESS
    assert len(backend._npcs) == 2          # lead + jaywalker, spawned once
    kinds = {n.kind for n in backend._npcs}
    assert kinds == {"vehicle", "walker"}
    lead = next(n for n in backend._npcs if n.kind == "vehicle")
    walker = next(n for n in backend._npcs if n.kind == "walker")
    # act 1: the lead left its init position toward (10, 170)
    assert float(np.linalg.norm(lead.position(backend.t) - [10.0, 44.0])) > 5.0
    # act 2 end state: jaywalker teleported clear of the road and stopped
    assert np.allclose(walker.position(backend.t), [30.0, 90.0], atol=1e-6)
    assert walker.speed == 0.0
    backend.close()


LANE_XOSC = "pmoe_tpu/assets/openscenario/lane_position.xosc"
WEATHER_XOSC = "pmoe_tpu/assets/openscenario/weather_change.xosc"


def test_lane_position_document_parses_to_spec():
    cfg = load_xosc(LANE_XOSC)
    ent = cfg.entities["parked"]
    assert ent.position is None                    # unresolved until a map
    assert ent.position_spec == {"kind": "lane", "road": 0, "lane": -1,
                                 "s": 52.0, "offset": 0.0}


def test_lane_position_resolves_on_the_map_and_story_executes():
    """Init LanePosition spawns the NPC at road 0 / lane -1 / s=52 (the
    vertical grid road at x=0 runs y=-10..+; lane -1 center is half a road
    width right of the reference line), and the mid-story
    AcquirePositionAction with a LanePosition target drives it to s=150."""
    backend = FakeCarlaBackend(render=False)
    cfg = load_xosc(LANE_XOSC)

    def factory(bk, route, seed=0):
        return OpenScenario(bk, route, seed=seed, config=cfg)

    factory.__name__ = "OpenScenario"
    scenario, result = run_scenario(backend, factory, ScriptedFollowAgent(None),
                                    start_idx=0, target_idx=3,
                                    max_ticks=3000, verbose=False)
    assert scenario.status == Status.SUCCESS
    assert len(backend._npcs) == 1
    npc = backend._npcs[0]
    # spawned at the resolved lane coordinate: road 0 is the x=0 polyline
    # from y=-10, so s=52 -> y=42; lane -1 -> x=+1.75 (half of half_width 3.5)
    line, half_width = backend.road_polylines()[0]
    assert np.allclose(npc.a, [0.0 + half_width / 2, line[0][1] + 52.0],
                       atol=1e-6)
    # the AcquirePositionAction retargeted it toward s=150 -> y=140 and the
    # SpeedAction started it moving
    assert float(npc.b[1]) > float(npc.a[1]) + 50.0
    assert npc.speed == 6.0
    backend.close()


def test_environment_action_sets_and_changes_weather():
    """Init EnvironmentAction -> wet-noon preset before the first frame;
    the storyboard's 2 s EnvironmentAction switches to hard-rain sunset
    (preset 14: sunset elevation 0.3 rad + intensity 0.9)."""
    backend = FakeCarlaBackend(render=False)
    cfg = load_xosc(WEATHER_XOSC)
    assert cfg.init_weather == 3                   # noon + intensity 0.4

    def factory(bk, route, seed=0):
        return OpenScenario(bk, route, seed=seed, config=cfg)

    factory.__name__ = "OpenScenario"
    scenario, result = run_scenario(backend, factory, ScriptedFollowAgent(None),
                                    start_idx=0, target_idx=3,
                                    max_ticks=3000, verbose=False)
    assert scenario.status == Status.SUCCESS
    assert backend._weather == 14                  # the storm rolled in
    assert backend.weather_state()["precipitation"] == pytest.approx(0.3)
    backend.close()
