"""Stage-3 evidence run: does DDPG fine-tuning IMPROVE closed-loop driving?

The reference's whole purpose for stage 3 is to fine-tune the behavior-cloned
agent with DDPG in the simulator (reference trainer/train_3.py:45 +
conf/stage_3.yaml). Round-3 showed the learn step is fast and correct but
never that it helps driving (VERDICT r3 missing #3). This tool produces the
before/after:

1. BEFORE: spot-eval the BC checkpoint on held-out NoCrash suite routes
   (fixed seeds, deterministic policy, empty traffic — the protocol of
   RESULTS.md's Empty cells).
2. FINE-TUNE: DDPG (trainer/train_3.py loop, moe actor initialized from the
   BC checkpoint, fresh critic) on NON-suite Town01 routes for --steps env
   ticks, learning every tick; per-episode reward/RC logged for the curve.
3. AFTER: identical spot-eval on the fine-tuned actor.

Everything runs in ONE process (relay discipline: one long-lived TPU client).

Usage: python tools/ddpg_improve.py --workdir logs/nocrash_r4 \
         [--steps 4000] [--routes 8] [--episode-ticks 600]
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/pmoe_tpu_xla"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

spec = importlib.util.spec_from_file_location(
    "nb", Path(__file__).resolve().parent / "nocrash_benchmark.py")
nb = importlib.util.module_from_spec(spec)
spec.loader.exec_module(nb)


def critic_cfg(arch: str):
    mlp = lambda dims: {"dims": dims, "act": "relu", "l_act": False,
                        "bn": False, "dropout": 0.0}
    return {
        "lr": 1e-3,
        "backbone": {"type": "rgb", "n_frames": 4,
                     "rgb": {"arch": arch, "pretrained": False,
                             "gamma": 2, "b": 1}},
        "speed_encoder": mlp([1, 128, 128]),
        "command_encoder": mlp([6, 128, 128]),
        "action_encoder": mlp([2, 128, 128]),
        "value_prediction": mlp([1920, 128, 1]),
    }


def sha256(path: Path) -> str:
    import hashlib

    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def spot(conf_path, town, routes, slots, label, ckpt=None):
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from train_and_spot import spot_eval

    rcs = spot_eval(conf_path, town, routes, slots)
    sr = 100 * float(np.mean(rcs == 100))
    print(f"[ddpg_improve] {label}: SR={sr:.0f}% RC={float(rcs.mean()):.1f}%")
    rec = {"label": label, "sr": sr, "rc": float(rcs.mean()),
           "per_route": rcs.round(1).tolist(),
           "town": town, "routes": routes, "slots": slots}
    if ckpt is not None:
        rec["ckpt"] = str(ckpt)
        rec["ckpt_sha256"] = sha256(Path(ckpt))
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="logs/nocrash_r4")
    ap.add_argument("--ckpt", default=None,
                    help="BC checkpoint (.ckpt); default <workdir>/ckpt/moe-best.ckpt")
    ap.add_argument("--arch", default="resnet18")
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--episode-ticks", type=int, default=600)
    ap.add_argument("--routes", type=int, default=8)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--pmoe-conf", default=None,
                    help="agent conf yaml with a pmoe actor (from "
                         "tools/pmoe_chain.py); switches the fine-tune to "
                         "the reference stage-3 recipe's actor type "
                         "(conf/stage_3.yaml:73-75)")
    ap.add_argument("--exclude-freeze", nargs="*", default=None,
                    help="actor exclude_freeze list (names kept trainable); "
                         "default: ['action_pred'] for moe, the reference's "
                         "['model_weights','alpha'] for pmoe")
    ap.add_argument("--bc-warmstart", type=int, default=0,
                    help="fill the replay buffer with N env steps driven by "
                         "the BC policy BEFORE any learning, so the critic "
                         "warms on on-policy-quality data instead of "
                         "post-crash states (VERDICT r4 weak #7)")
    ap.add_argument("--learn-every", type=int, default=1,
                    help="gradient steps every N env ticks (UTD 1/N). The "
                         "reference learns every tick (train_3.py loop); at "
                         "~0.85 s/learn that caps a session at ~2k env "
                         "steps — N>1 trades update density for the >=10k "
                         "env-step envelope VERDICT r4 directs")
    ap.add_argument("--critic-warmup", type=int, default=0,
                    help="critic-only learn steps before any actor update "
                         "(fixes the run-1 failure mode: a fresh critic's "
                         "early gradients are noise and damage the BC actor)")
    ap.add_argument("--curve-name", default="ddpg_curve.json")
    ap.add_argument("--before-json", default=None,
                    help="reuse a recorded BEFORE spot result (JSON with "
                         "sr/rc/per_route) instead of re-measuring; the spot "
                         "is deterministic (fixed seeds + policy), so two "
                         "measurements are identical — see ddpg_r4b.log")
    ap.add_argument("--ckpt-name", default="moe-ddpg")
    ap.add_argument("--out", default=None,
                    help="append the result table to this markdown file")
    args = ap.parse_args()

    work = Path(args.workdir)
    # live rebalance knob: a queued session computes --steps from its time
    # budget at LAUNCH; if the budget shifted while earlier phases ran, the
    # operator drops an integer into this file and the re-exec'd run honors
    # it (the running queue process cannot be re-argued with)
    cap_file = work / "ddpg_steps_cap"
    if cap_file.exists():
        cap = int(cap_file.read_text().strip())
        if cap < args.steps:
            print(f"[ddpg_improve] steps capped {args.steps} -> {cap} "
                  f"by {cap_file}")
            args.steps = cap
    ckpt = Path(args.ckpt) if args.ckpt else work / "ckpt" / "moe-best.ckpt"
    assert ckpt.exists(), f"no BC checkpoint at {ckpt}"

    import jax
    import jax.numpy as jnp

    from pmoe_tpu.models.rl_agent import Agent
    from pmoe_tpu.sim.env import DrivingGym
    from pmoe_tpu.sim.fake_carla import FakeCarlaBackend
    from pmoe_tpu.utils import graft, load_checkpoint, save_checkpoint

    # ---- BEFORE ------------------------------------------------------------
    if args.routes == 0:
        # delta-only mode (run A of the reference-recipe experiment: the
        # analytic claim is the actor comes back bitwise unchanged, so the
        # spots are redundant — the unit test + max|Δ| report carry it)
        before = None
    elif args.before_json:
        before = json.loads(Path(args.before_json).read_text())
        # a recorded BEFORE is only valid against the SAME checkpoint and
        # protocol it was measured with (ADVICE r4: the r4 file was measured
        # against a checkpoint that no longer exists) — refuse stale reuse
        for key, want in (("ckpt_sha256", sha256(ckpt)),
                          ("routes", args.routes), ("slots", args.slots)):
            have = before.get(key)
            assert have == want, (
                f"--before-json {key}={have!r} does not match the current "
                f"run ({want!r}); re-measure BEFORE (drop --before-json)")
        before["label"] = "BEFORE (recorded)"
        print(f"[ddpg_improve] BEFORE (recorded): SR={before['sr']:.0f}% "
              f"RC={before['rc']:.1f}%")
    else:
        if args.pmoe_conf:
            import shutil

            conf_before = work / "ddpg_before.yaml"
            shutil.copyfile(args.pmoe_conf, conf_before)
        else:
            conf_before = nb.write_agent_conf(work / "ddpg_before.yaml", ckpt,
                                              args.arch)
        before = spot(conf_before, "Town01", args.routes, args.slots,
                      "BEFORE", ckpt=ckpt)
        (work / f"{args.ckpt_name}_before.json").write_text(
            json.dumps(before, indent=1))

    # ---- FINE-TUNE ---------------------------------------------------------
    backend = FakeCarlaBackend(town="Town01", img_width=800, img_height=600)
    env = DrivingGym(backend, past_frames=4, crop=(125, 90),
                     resize=(224, 224), n_commands=6, speed_factor=10,
                     episode_length=args.episode_ticks)
    if args.pmoe_conf:
        # reference stage-3 recipe: the pmoe actor with everything frozen
        # except names in exclude_freeze (conf/stage_3.yaml:73-75 —
        # ['model_weights','alpha'], i.e. the MoE gate heads; the lat/long
        # mixers match neither string and stay frozen, exactly like the
        # torch reference's substring freeze, utils/nn.py:22-58)
        import yaml

        actor_cfg = dict(yaml.safe_load(Path(args.pmoe_conf).read_text())
                         ["model"]["actor"])
        actor_cfg.pop("model_dir", None)      # grafted below from --ckpt
        actor_cfg["lr"] = args.lr
        actor_cfg["exclude_freeze"] = (args.exclude_freeze
                                       if args.exclude_freeze is not None
                                       else ["model_weights", "alpha"])
    else:
        actor_cfg = dict(nb.model_cfg(args.arch), lr=args.lr,
                         exclude_freeze=(args.exclude_freeze
                                         if args.exclude_freeze is not None
                                         else ["action_pred"]))
    print(f"[ddpg_improve] actor type={actor_cfg['type']} "
          f"exclude_freeze={actor_cfg['exclude_freeze']}")
    ddpg = {
        "gamma": 0.9, "tau": 0.001, "buffer_size": 20000,
        "batch_size": args.batch, "device_replay": "auto",
        "OU": {"mu": [0.0, 0.0], "sigma": [0.3, 0.1], "theta": 0.6},
        "actor": actor_cfg, "critic": critic_cfg(args.arch),
    }
    obs = env.reset()
    example = (jnp.asarray(obs[0]).astype(jnp.float32) / 255.0,
               jnp.asarray(obs[1]), jnp.asarray(obs[2]))
    agent = Agent(ddpg, example)
    ck = load_checkpoint(str(ckpt))
    restored = jax.device_put(graft(agent.state.actor_params,
                                    ck.get("model", ck), verbose=False))
    bs = ck.get("batch_stats")
    if bs:
        # the backbone's BatchNorm running stats are part of the policy —
        # without them agent.sample rolls out a different network than the
        # spot evals score (latent in the r4 runs; fixed this round)
        agent.state = agent.state._replace(
            actor_batch_stats=jax.device_put(
                graft(agent.state.actor_batch_stats, bs, verbose=False)))
    agent.state = agent.state._replace(
        actor_params=restored,
        target_actor_params=jax.tree_util.tree_map(jnp.array, restored))
    init_actor_host = jax.tree_util.tree_map(np.asarray, restored)
    print(f"[ddpg_improve] actor initialized from {ckpt} "
          f"(batch_stats {'restored' if bs else 'absent'})")

    routes = nb._training_routes(backend, 1000)      # non-suite, deterministic
    tuned = work / "ckpt_ddpg"
    tuned.mkdir(parents=True, exist_ok=True)
    # config snapshot FIRST (VERDICT r4 hygiene: the run must leave durable
    # artifacts even if the session dies mid-fine-tune)
    snap = {"args": vars(args), "ddpg": ddpg, "init_ckpt": str(ckpt),
            "init_ckpt_sha256": sha256(ckpt)}
    (tuned / f"{args.ckpt_name}_run.json").write_text(
        json.dumps(snap, indent=1, default=str))

    def save_actor(tag=""):
        actor_host = jax.tree_util.tree_map(np.asarray,
                                            agent.state.actor_params)
        save_checkpoint({"model": actor_host, "epoch": np.int64(episode)},
                        False, str(tuned), args.ckpt_name + tag)

    curve = []
    warm = int(args.bc_warmstart)
    total = warm + args.steps
    step, episode = 0, 0
    t0 = time.perf_counter()
    while step < total:
        start, target = routes[episode % len(routes)]
        images, speed, command = env.reset(
            start_idx=start, target_idx=target,
            weather=[1, 3, 6, 8][episode % 4], seed=episode)
        agent.noise.reset()
        ep_reward, done, info = 0.0, False, {"route_completion": 0.0}
        while not done and step < total:
            action = agent.sample(images, speed, command)[0]
            (ni, ns, nc), reward, done, info = env.step(action)
            agent.remember(images[0], speed[0], command[0],
                           action.astype(np.float32), np.float32(reward),
                           ni[0], ns[0], nc[0], np.float32(done))
            if step >= warm and (step - warm) % args.learn_every == 0:
                # warm-start phase: only COLLECT with the BC policy, so the
                # buffer holds successful-driving transitions before the
                # critic ever fits (VERDICT r4 weak #7: without this the
                # buffer is mostly post-crash data)
                agent.learn(fetch_metrics=False,
                            critic_only=step - warm < args.critic_warmup)
            images, speed, command = ni, ns, nc
            ep_reward += reward
            step += 1
        phase = ("warmstart" if step <= warm else
                 "critic_warmup" if step - warm <= args.critic_warmup
                 else "ddpg")
        curve.append({"episode": episode, "steps": step, "phase": phase,
                      "reward": round(float(ep_reward), 2),
                      "rc": round(float(info["route_completion"]), 1)})
        print(f"[ddpg_improve] ep{episode} [{phase}]: reward={ep_reward:.1f} "
              f"RC={info['route_completion']:.1f}% (step {step}/{total},"
              f" {step / (time.perf_counter() - t0):.2f} env-steps/s)",
              flush=True)
        episode += 1
        if episode % 5 == 0:          # mid-run durability: ckpt + curve
            save_actor()
            (work / args.curve_name).write_text(json.dumps(curve, indent=1))

    save_actor()
    (work / args.curve_name).write_text(json.dumps(curve, indent=1))

    # actor-delta report: with the reference recipe (pmoe +
    # exclude_freeze=['model_weights','alpha']) every trainable leaf's
    # gradient is identically zero (alphas only reach the action through an
    # argmax/detached sample), so the actor must come back bitwise unchanged
    # — printing the measured delta makes that analytic claim falsifiable
    final_actor = jax.tree_util.tree_map(np.asarray, agent.state.actor_params)
    deltas = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(a - b))) if a.size else 0.0,
        init_actor_host, final_actor)
    max_delta = max(jax.tree_util.tree_leaves(deltas) or [0.0])
    changed = sum(1 for d in jax.tree_util.tree_leaves(deltas) if d > 0)
    n_leaves = len(jax.tree_util.tree_leaves(deltas))
    print(f"[ddpg_improve] actor param delta after fine-tune: "
          f"max|Δ|={max_delta:.3e} over {changed}/{n_leaves} changed leaves")

    # ---- AFTER -------------------------------------------------------------
    tuned_ckpt = tuned / f"{args.ckpt_name}.ckpt"
    if before is None:
        print(f"[ddpg_improve] delta-only run complete ({args.steps} env "
              f"steps); tuned ckpt at {tuned_ckpt}")
        return
    if args.pmoe_conf:
        import yaml as _yaml

        conf_after = work / "ddpg_after.yaml"
        c = _yaml.safe_load(Path(args.pmoe_conf).read_text())
        c["model"]["actor"]["model_dir"] = str(tuned_ckpt)
        conf_after.write_text(_yaml.safe_dump(c))
    else:
        conf_after = nb.write_agent_conf(work / "ddpg_after.yaml", tuned_ckpt,
                                         args.arch)
    after = spot(conf_after, "Town01", args.routes, args.slots, "AFTER",
                 ckpt=tuned_ckpt)

    lines = [
        "\n## Stage-3 DDPG before/after (closed-loop, held-out suite routes)",
        "",
        f"Protocol: Town01 first {args.routes} suite routes, empty traffic, "
        f"weather 1, deterministic policy, fixed seeds — identical before "
        f"and after. Actor: {actor_cfg['type']} "
        f"(exclude_freeze={actor_cfg['exclude_freeze']}). Fine-tune: "
        f"{args.steps} env steps (learn every {args.learn_every} tick(s), "
        f"batch {args.batch}, "
        f"lr {args.lr}, {warm} BC-warmstart collect-only steps, critic "
        f"warmup {args.critic_warmup} critic-only steps) on non-suite "
        f"routes; curve in {args.curve_name}. Actor max|Δ| after fine-tune: "
        f"{max_delta:.3e} ({changed}/{n_leaves} leaves changed).",
        "",
        "| checkpoint | SR | RC |",
        "|---|---|---|",
        f"| BC (before) | {before['sr']:.0f}% | {before['rc']:.1f}% |",
        f"| BC + DDPG (after) | {after['sr']:.0f}% | {after['rc']:.1f}% |",
        "",
        f"Per-route RC before: {before['per_route']}",
        f"Per-route RC after:  {after['per_route']}",
    ]
    text = "\n".join(lines)
    print(text)
    if args.out:
        with open(args.out, "a") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
