"""Red-light compliance diagnosis (VERDICT r4 weak #6): WHY does the policy
run more lights in Town02 than Town01?

Protocol: drive the trained agent over N suite routes per town (empty
traffic, fixed seeds — the grid's Empty-cell protocol), recording a per-tick
trajectory plus the backend's red-light infraction telemetry
(fake_carla.last_red_light_event). For every light the ego APPROACHED
(came within 25 m of, while the light was red at any point inside that
window), classify the outcome:

* stopped  — ego speed dropped below 0.5 m/s inside the approach window
* ran      — a RunningRedLightTest event fired at this light
* green    — the light turned green before the ego reached 8 m (no test)

and record the approach telemetry the VERDICT asks for: speed at 25/15/8 m,
whether the light was inside the camera frustum (fov 100, facing forward)
for >= 10 consecutive frames of the approach, and the distance at which it
first turned red. The per-town summary quantifies whether Town02's extra
lights-ran come from (a) approaches the policy never brakes for (a BC
generalization gap), or (b) lights that were never visible in the rendered
frame before the 8 m line (a backend/map artifact).

Usage: python tools/lights_diagnose.py --conf logs/nocrash_r5/benchmark_agent.yaml
         [--routes 8] [--max-ticks 3000] [--out logs/lights_diag_r5.json]
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

import numpy as np

FOV_DEG = 100.0
APPROACH_M = 25.0
CROSS_M = 8.0


def in_frustum(ego_x, ego_y, yaw, lx, ly) -> bool:
    dx, dy = lx - ego_x, ly - ego_y
    ang = math.atan2(dy, dx) - yaw
    ang = (ang + math.pi) % (2 * math.pi) - math.pi
    return abs(ang) <= math.radians(FOV_DEG / 2)


def run_town(conf, town: str, n_routes: int, max_ticks: int):
    from pmoe_tpu.agents.image_agent import ImageAgent
    from pmoe_tpu.eval.criteria import (CriteriaTree, RouteCompletionTest,
                                        RunningRedLightTest)
    from pmoe_tpu.eval.manager import run_episode
    from pmoe_tpu.eval.nocrash import default_suite_path, load_suite
    from pmoe_tpu.sim.fake_carla import FakeCarlaBackend

    backend = FakeCarlaBackend(town=town, img_width=800, img_height=600)
    routes = load_suite(default_suite_path(town))[:n_routes]
    approaches = []
    for ri, (s, t) in enumerate(routes):
        route = backend.trace_route(s, t)
        frame = backend.reset(route, weather=1, seed=ri)
        agent = ImageAgent(conf)
        agent.set_global_plan(route.gps_plan())
        red_test = RunningRedLightTest(backend)
        criteria = CriteriaTree([RouteCompletionTest(route), red_test])

        traj = []

        class _Recorder:
            """Wraps the agent to log the ego trajectory each tick."""

            def __init__(self, inner):
                self.inner = inner

            def __getattr__(self, k):
                return getattr(self.inner, k)

            def run_step(self, data, timestamp):
                e = backend.ego_state()
                traj.append((backend.t, e.x, e.y, e.yaw, e.speed,
                             tuple((l.is_red(backend.t))
                                   for l in backend._lights)))
                return self.inner.run_step(data, timestamp)

        run_episode(backend, _Recorder(agent), criteria, frame,
                    max_ticks=max_ticks)
        agent.destroy()

        ran_lights = {ev.get("light"): ev for ev in red_test.events
                      if "light" in ev}
        lights = [(l.x, l.y) for l in backend._lights]
        # segment the trajectory into per-light approach windows
        for li, (lx, ly) in enumerate(lights):
            d = np.array([math.hypot(r[1] - lx, r[2] - ly) for r in traj])
            inside = d < APPROACH_M
            if not inside.any():
                continue
            # contiguous approach segments
            idx = np.flatnonzero(inside)
            splits = np.split(idx, np.flatnonzero(np.diff(idx) > 1) + 1)
            for seg in splits:
                was_red = any(traj[i][5][li] for i in seg)
                if not was_red:
                    continue
                speeds = {m: None for m in (25, 15, 8)}
                vis_run, vis_max = 0, 0
                first_red_d = None
                for i in seg:
                    t_, x_, y_, yaw_, v_, reds = traj[i]
                    di = d[i]
                    for m in speeds:
                        if di <= m and speeds[m] is None:
                            speeds[m] = v_
                    if reds[li]:
                        if first_red_d is None:
                            first_red_d = di
                        if in_frustum(x_, y_, yaw_, lx, ly):
                            vis_run += 1
                            vis_max = max(vis_max, vis_run)
                        else:
                            vis_run = 0
                stopped = any(traj[i][4] < 0.5 for i in seg)
                outcome = ("ran" if li in ran_lights
                           else "stopped" if stopped else "green")
                approaches.append({
                    "town": town, "route": ri, "light": li,
                    "outcome": outcome,
                    "speed_at": {str(m): (round(v, 2) if v is not None
                                          else None)
                                 for m, v in speeds.items()},
                    "visible_red_frames": int(vis_max),
                    "first_red_at_m": (round(float(first_red_d), 1)
                                       if first_red_d is not None else None),
                })
    backend.close()
    return approaches


def summarize(approaches, town):
    rows = [a for a in approaches if a["town"] == town]
    by = {}
    for a in rows:
        by.setdefault(a["outcome"], []).append(a)
    out = {"town": town, "red_approaches": len(rows)}
    for k, v in sorted(by.items()):
        sp8 = [a["speed_at"]["8"] for a in v if a["speed_at"]["8"]]
        vis = [a["visible_red_frames"] for a in v]
        out[k] = {
            "n": len(v),
            "mean_speed_at_8m": round(float(np.mean(sp8)), 2) if sp8 else None,
            "mean_visible_red_frames": round(float(np.mean(vis)), 1)
            if vis else None,
            "never_visible": sum(1 for a in v
                                 if a["visible_red_frames"] < 10),
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--conf", default="logs/nocrash_r5/benchmark_agent.yaml")
    ap.add_argument("--routes", type=int, default=8)
    ap.add_argument("--max-ticks", type=int, default=3000)
    ap.add_argument("--out", default="logs/lights_diag_r5.json")
    args = ap.parse_args()

    from pmoe_tpu.utils import get_conf

    conf = get_conf(args.conf)
    all_app = []
    for town in ("Town01", "Town02"):
        all_app += run_town(conf, town, args.routes, args.max_ticks)
        print(json.dumps(summarize(all_app, town), indent=1), flush=True)
    Path(args.out).write_text(json.dumps({
        "summary": [summarize(all_app, t) for t in ("Town01", "Town02")],
        "approaches": all_app}, indent=1))
    print(f"[lights] detail -> {args.out}")


if __name__ == "__main__":
    main()
