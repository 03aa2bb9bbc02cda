"""Parallel evaluation fan-out — the Ray-actor replacement.

The reference wraps its evaluator in a ``@ray.remote(num_cpus=1/8,
num_gpus=1/4, max_restarts=100, max_task_retries=-1)`` actor so many shards run
against many CARLA servers (reference runners/scenario_runner.py:124;
SURVEY §2.9). TPU-native replacement: a host-side multiprocess controller —
each worker process owns one simulator backend + one jitted agent and drains a
shared task queue; crashed workers are restarted up to ``max_restarts`` (the
Ray auto-restart semantics). The device side stays a single jitted inference
function per shard.
"""

from __future__ import annotations

import multiprocessing as mp
import queue
import traceback
from typing import Callable, List, Sequence

__all__ = ["ParallelEvalRunner", "EvalTask"]


class EvalTask:
    """One episode of work: (traffic_idx, weather, start, target)."""

    def __init__(self, town: str, traffic_idx: int, weather: int,
                 start_idx: int, target_idx: int):
        self.town = town
        self.traffic_idx = traffic_idx
        self.weather = weather
        self.start_idx = start_idx
        self.target_idx = target_idx

    def __repr__(self):
        return (f"EvalTask({self.town}, t{self.traffic_idx}, w{self.weather}, "
                f"{self.start_idx}->{self.target_idx})")


def _worker_loop(worker_id: int, episode_fn_builder, task_q, result_q) -> None:
    """Child process: build the episode runner once, then drain tasks."""
    try:
        episode_fn = episode_fn_builder(worker_id)
    except Exception:
        result_q.put(("fatal", worker_id, traceback.format_exc()))
        return
    while True:
        try:
            task = task_q.get(timeout=1.0)
        except queue.Empty:
            continue
        if task is None:
            result_q.put(("done", worker_id, None))
            return
        try:
            result = episode_fn(task)
            result_q.put(("result", worker_id, (task, result)))
        except Exception:
            result_q.put(("error", worker_id, (task, traceback.format_exc())))
            return      # die; controller restarts the worker


class ParallelEvalRunner:
    """Fan episodes out over worker processes with auto-restart."""

    def __init__(self, episode_fn_builder: Callable[[int], Callable],
                 num_workers: int = 2, max_restarts: int = 100):
        self.episode_fn_builder = episode_fn_builder
        self.num_workers = num_workers
        self.max_restarts = max_restarts

    def run(self, tasks: Sequence[EvalTask]) -> List:
        ctx = mp.get_context("spawn")
        task_q = ctx.Queue()
        result_q = ctx.Queue()
        for t in tasks:
            task_q.put(t)
        for _ in range(self.num_workers):
            task_q.put(None)

        def start(worker_id):
            p = ctx.Process(target=_worker_loop,
                            args=(worker_id, self.episode_fn_builder,
                                  task_q, result_q), daemon=True)
            p.start()
            return p

        procs = {i: start(i) for i in range(self.num_workers)}
        restarts = 0
        results, errors = [], []
        finished_workers = 0
        while finished_workers < self.num_workers:
            kind, wid, payload = result_q.get()
            if kind == "result":
                results.append(payload)
            elif kind == "done":
                finished_workers += 1
            elif kind in ("error", "fatal"):
                errors.append(payload)
                if restarts < self.max_restarts:
                    restarts += 1
                    task_q.put(None)          # keep shutdown tokens balanced
                    procs[wid] = start(wid)
                else:
                    finished_workers += 1
        for p in procs.values():
            p.join(timeout=5)
        if errors:
            print(f"[parallel-eval] {len(errors)} episodes errored "
                  f"({restarts} worker restarts)")
        return results
