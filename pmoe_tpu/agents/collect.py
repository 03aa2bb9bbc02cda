"""Dataset collection entry point (the reference's collector-agent role,
/root/reference/PMoE/autoagents/collector_agents/random_collector.py — which
wrote WoR lmdb; here episodes are written directly in the framework's
``root/<episode>/{rgb,mask,measurements}/`` training layout so stages 0-2
consume them without conversion).

Usage: ``python -m pmoe_tpu.agents.collect --out data/train --episodes 4
[--backend fake|carla] [--noise 0.1]``
"""

from __future__ import annotations

import argparse

from ..sim.fake_carla import FakeCarlaBackend
from .collector_agent import (QCollectorAgent, RandomCollectorAgent,
                              collect_episode)

__all__ = ["main"]


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="data/train")
    parser.add_argument("--episodes", type=int, default=4)
    parser.add_argument("--town", default="Town01")
    parser.add_argument("--backend", default="fake",
                        choices=["fake", "carla"])
    parser.add_argument("--noise", type=float, default=0.0,
                        help="expert action noise std (noisy-expert data)")
    parser.add_argument("--random", action="store_true",
                        help="random-action policy (the reference phase-0 "
                             "random collector) instead of the expert follower")
    parser.add_argument("--q", action="store_true",
                        help="action-value (Q) collector: birdview-scored "
                             "action table sampled by Categorical(Q/temp), "
                             "Q labels recorded per tick (the reference "
                             "q_collector's role, rebuilt — see "
                             "QCollectorAgent)")
    parser.add_argument("--max-ticks", type=int, default=500)
    parser.add_argument("--img-width", type=int, default=800)
    parser.add_argument("--img-height", type=int, default=600)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    if args.backend == "carla":
        from ..sim.carla_bridge import CarlaBackend

        backend = CarlaBackend(town=args.town, img_width=args.img_width,
                               img_height=args.img_height)
    else:
        backend = FakeCarlaBackend(town=args.town, img_width=args.img_width,
                                   img_height=args.img_height,
                                   render_seg=True)
    n_spawn = len(backend.spawn_points())
    weathers = [1, 3, 6, 8]
    total = 0
    try:
        for ep in range(args.episodes):
            start = (2 * ep) % n_spawn
            target = (2 * ep + 5) % n_spawn
            n = collect_episode(
                backend, args.out, f"episode_{ep:03d}",
                start_idx=start, target_idx=target,
                weather=weathers[ep % len(weathers)],
                max_ticks=args.max_ticks, noise_std=args.noise,
                seed=args.seed + ep,
                agent_cls=(QCollectorAgent if args.q
                           else RandomCollectorAgent if args.random
                           else None))
            total += n
            print(f"[collect] episode_{ep:03d}: {n} frames "
                  f"({start}->{target})")
    finally:
        backend.close()
    print(f"[collect] wrote {total} frames to {args.out}")


if __name__ == "__main__":
    main()
