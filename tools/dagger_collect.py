"""DAgger round: the TRAINED agent drives, the scripted expert labels.

Behavior cloning fails from compounding error: the clone visits states the
expert never demonstrated, where it has no supervision. DAgger closes the
loop — roll out the CURRENT policy (ImageAgent + checkpoint), and at every
tick record the frame with the EXPERT's action for that state (pure pursuit
on the dense route, the same policy that collects round-0 data). Episodes
land in the standard dataset layout, so retraining is just pointing stage-2
at the union of the BC and DAgger directories.

Usage: python tools/dagger_collect.py --conf logs/nocrash_r3/benchmark_agent.yaml
         --out logs/nocrash_r3/dagger [--episodes 16] [--ticks 1500]
"""

from __future__ import annotations

import argparse
import json
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/pmoe_tpu_xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import cv2
import numpy as np


def expert_action(waypointer, label_waypointer, gps, heading, speed,
                  target_speed=6.0):
    """The CollectorAgent pursuit policy, computed for an arbitrary state."""
    _, _, cmd = label_waypointer.tick(gps)
    waypointer.tick(gps)
    nxt = min(waypointer.current_idx + 1, len(waypointer.global_plan) - 1)
    wx, wy, _ = waypointer.global_plan[max(nxt, 0)]
    x, y = waypointer.latlon_to_xy(gps[0], gps[1])
    target = math.atan2(wy - y, wx - x)
    err = (target - heading + math.pi) % (2 * math.pi) - math.pi
    steer = float(np.clip(err, -1.0, 1.0))
    throttle = 0.7 if speed < target_speed else 0.0
    return steer, throttle, cmd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--conf", default="logs/nocrash_r3/benchmark_agent.yaml")
    ap.add_argument("--out", default="logs/nocrash_r3/dagger")
    ap.add_argument("--episodes", type=int, default=16)
    ap.add_argument("--ticks", type=int, default=1500)
    ap.add_argument("--town", default="Town01")
    ap.add_argument("--traffic", action="store_true",
                    help="spawn a traffic curriculum (empty/regular/dense "
                         "cycled per episode) and label with the privileged "
                         "TrafficAwareExpert's brake decision, so DAgger "
                         "states carry brake supervision too")
    args = ap.parse_args()

    from pmoe_tpu.agents.image_agent import ImageAgent
    from pmoe_tpu.agents.waypointer import Waypointer
    from pmoe_tpu.eval.nocrash import build_input_data
    from pmoe_tpu.sim.fake_carla import FakeCarlaBackend
    from pmoe_tpu.sim.interface import RoadOption
    from pmoe_tpu.utils import get_conf

    # the SAME non-suite training routes the BC data used
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "nb", Path(__file__).resolve().parent / "nocrash_benchmark.py")
    nb = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(nb)

    cfg = get_conf(args.conf)
    backend = FakeCarlaBackend(town=args.town, img_width=800, img_height=600,
                               render_seg=True)
    routes = nb._training_routes(backend, args.episodes)
    # privileged brake labeler (hazards + red lights); zero without --traffic
    from pmoe_tpu.agents.collector_agent import TrafficAwareExpert

    labeler = TrafficAwareExpert.labeler(backend)
    mix = ([(0, 0), (20, 50), (100, 200), (20, 50)] if args.traffic
           else [(0, 0)])
    total = 0
    for ep, (start, target) in enumerate(routes):
        cars, peds = mix[ep % len(mix)]
        route = backend.trace_route(start, target)
        frame = backend.reset(route, weather=[1, 3, 6, 8][ep % 4],
                              seed=1000 + ep, n_vehicles=cars,
                              n_pedestrians=peds)
        agent = ImageAgent(cfg)
        agent.set_global_plan(route.gps_plan())
        dense = route.gps_plan()
        wp = None
        ep_dir = Path(args.out) / f"dagger_{ep:03d}"
        for sub in ("rgb", "mask", "measurements"):
            (ep_dir / sub).mkdir(parents=True, exist_ok=True)
        goal = route.positions[-1]
        idx = 0
        for t in range(args.ticks):
            data = build_input_data(frame)
            gps = frame.gnss
            if wp is None:
                wp = Waypointer(dense, gps, threshold_before=8.0,
                                threshold_after=8.0)
                from pmoe_tpu.agents.autonomous_agent import downsample_plan

                label_wp = Waypointer(downsample_plan(dense), gps)
            steer, throttle, cmd = expert_action(
                wp, label_wp, gps, frame.compass, frame.speed)
            e = backend.ego_state()
            brake = labeler._brake_decision(e.x, e.y, frame.compass,
                                            frame.speed)
            if brake > 0:
                throttle = 0.0
            # record frame + EXPERT label
            name = f"{idx:06d}"
            cv2.imwrite(str(ep_dir / "rgb" / f"{name}.png"),
                        np.ascontiguousarray(frame.rgb[..., ::-1]))
            if frame.seg is not None:
                cv2.imwrite(str(ep_dir / "mask" / f"{name}.png"), frame.seg)
            cmd_value = int(cmd) if int(cmd) > 0 else int(
                RoadOption.LANEFOLLOW)
            (ep_dir / "measurements" / f"{name}.json").write_text(
                json.dumps({"steer": steer, "brake": float(brake),
                            "throttle": throttle, "speed": frame.speed,
                            "target_speed": 6.0, "command": cmd_value}))
            idx += 1
            # the POLICY drives
            control = agent.run_step(data, frame.timestamp)
            frame = backend.tick(control)
            ego = backend.ego_state()
            if frame.collision is not None:
                break
            if float(np.hypot(ego.x - goal[0], ego.y - goal[1])) < 5.0:
                break
            # off-route bail: beyond ~25 m the expert label is meaningless
            d = np.min(np.hypot(route.positions[:, 0] - ego.x,
                                route.positions[:, 1] - ego.y))
            if d > 25.0:
                break
        agent.destroy()
        total += idx
        print(f"[dagger] ep{ep} {start}->{target}: {idx} frames "
              f"(route dist left {np.hypot(ego.x - goal[0], ego.y - goal[1]):.0f} m)",
              flush=True)
    print(f"[dagger] total {total} frames over {len(routes)} episodes")


if __name__ == "__main__":
    main()
