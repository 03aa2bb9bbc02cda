"""Native C++ ingest + device prefetcher + route parser + scenario injection."""

import numpy as np
import pytest

from pmoe_tpu.data import native
from pmoe_tpu.data.dataset import CarlaSegPred, BatchLoader, imread, crop_resize
from pmoe_tpu.data.prefetch import DevicePrefetcher
from pmoe_tpu.eval.route_parser import (interpolate_route, downsample_route,
                                        parse_routes_file)
from pmoe_tpu.eval.scenarios import ScenarioInjector
from pmoe_tpu.sim.fake_carla import FakeCarlaBackend
from pmoe_tpu.sim.interface import RoadOption, VehicleControl


@pytest.mark.skipif(not native.available(),
                    reason="native lib not built (make -C native)")
def test_native_ingest_matches_cv2(synthetic_root):
    ep = sorted(synthetic_root.iterdir())[0]
    paths = sorted(str(p) for p in (ep / "rgb").iterdir())[:4]
    out = native.ingest_batch(paths, crop=(8, 8), resize=(32, 32))
    ref = np.stack([crop_resize(imread(p), (8, 8), (32, 32)) for p in paths])
    assert out.shape == (4, 32, 32, 3)
    # bilinear rounding differs by at most 1 LSB from cv2
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


def test_device_prefetcher(synthetic_root):
    ds = CarlaSegPred(root=str(synthetic_root), past_frames=4, future_frames=2,
                      load_measurements=True, crop=(8, 8), resize=(32, 32))
    loader = BatchLoader(ds, batch_size=4)
    batches = list(DevicePrefetcher(loader, depth=2))
    assert len(batches) == len(loader)
    imgs, meas = batches[0]
    assert imgs.shape == (4, 4, 32, 32, 3)
    assert hasattr(imgs, "devices")       # device-resident


def test_prefetcher_propagates_errors():
    def bad_loader():
        yield {"x": np.ones(3)}
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        list(DevicePrefetcher(bad_loader(), depth=1))


def test_route_xml_roundtrip(tmp_path):
    xml = tmp_path / "routes.xml"
    xml.write_text("""<routes>
      <route id="0" town="Town01">
        <waypoint x="0" y="0" z="0"/>
        <waypoint x="100" y="0" z="0"/>
        <waypoint x="100" y="80" z="0"/>
      </route>
    </routes>""")
    routes = parse_routes_file(xml)
    assert len(routes) == 1 and routes[0].town == "Town01"
    dense = interpolate_route(routes[0].waypoints, hop_resolution=1.0)
    assert 170 <= dense.length <= 185
    # a turn command appears near the corner
    assert any(o in (RoadOption.LEFT, RoadOption.RIGHT) for o in dense.options)
    down = downsample_route(dense, 50)
    assert len(down.positions) < len(dense.positions)
    # command-change nodes are preserved
    assert any(o in (RoadOption.LEFT, RoadOption.RIGHT) for o in down.options)


def test_scenario_injection():
    backend = FakeCarlaBackend(render=False)
    route = backend.trace_route(0, 2)          # 200 m straight
    backend.reset(route)
    inj = ScenarioInjector(route, spacing=80.0, seed=1)
    assert len(inj.triggers) >= 2
    n_npc_before = len(backend._npcs)
    # drive the ego along the route, firing triggers
    fired_total = []
    for _ in range(2000):
        backend.tick(VehicleControl(throttle=0.8))
        e = backend.ego_state()
        fired_total += inj.update(backend, (e.x, e.y))
        if all(t.fired for t in inj.triggers):
            break
    assert len(fired_total) == len(inj.triggers)
    assert len(backend._npcs) > n_npc_before
