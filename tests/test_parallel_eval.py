"""Tests for the Ray-analog parallel eval fan-out and the NoCrash CLI entry.

Reference semantics under test: runners/scenario_runner.py:124 declares a
``@ray.remote(max_restarts=100, max_task_retries=-1)`` actor so evaluator
shards survive crashes; eval/evaluate_nocrash.py + runners/nocrash_runner.py
are the CLI entry (args, CSV resume). Here the fan-out is a spawn-based
multiprocess controller (pmoe_tpu/eval/parallel_runner.py) and the CLI is
``python -m pmoe_tpu.eval.evaluate_nocrash``.
"""

from __future__ import annotations

import csv

import pytest

from pmoe_tpu.eval.parallel_runner import EvalTask, ParallelEvalRunner


class _SquareBuilder:
    """Picklable episode-fn builder (spawn children re-import this module)."""

    def __init__(self, crash_on: int | None = None):
        self.crash_on = crash_on

    def __call__(self, worker_id: int):
        def episode_fn(task: EvalTask):
            if self.crash_on is not None and task.start_idx == self.crash_on:
                raise RuntimeError(f"boom on {task.start_idx}")
            return task.start_idx * task.start_idx
        return episode_fn


class _FatalBuilder:
    """Builder that dies during worker bootstrap (init-time crash path)."""

    def __call__(self, worker_id: int):
        raise RuntimeError("cannot build")


def _tasks(n):
    return [EvalTask("Town01", 0, 1, i, i + 1) for i in range(n)]


def test_parallel_runner_fans_out():
    runner = ParallelEvalRunner(_SquareBuilder(), num_workers=2)
    results = runner.run(_tasks(6))
    assert sorted(r for _t, r in results) == [0, 1, 4, 9, 16, 25]


def test_parallel_runner_restarts_crashed_worker():
    """A worker that dies mid-episode is restarted and the run completes
    (the crashed episode is reported, not retried — reference CSV resume
    handles re-running it)."""
    runner = ParallelEvalRunner(_SquareBuilder(crash_on=3), num_workers=2,
                                max_restarts=5)
    results = runner.run(_tasks(6))
    got = sorted(r for _t, r in results)
    assert got == [0, 1, 4, 16, 25]        # task 3 errored, others all finish


def test_parallel_runner_fatal_builder_terminates():
    """Workers that cannot even bootstrap must not hang the controller."""
    runner = ParallelEvalRunner(_FatalBuilder(), num_workers=2,
                                max_restarts=1)
    results = runner.run(_tasks(2))
    assert results == []                    # nothing ran; returned cleanly


def test_evaluate_nocrash_cli(tmp_path, monkeypatch):
    """The CLI end-to-end on the fake backend: argparse -> evaluator ->
    resume-aware CSV, with the scripted FollowAgent standing in for the
    jitted ImageAgent (the model path is covered by test_image_agent)."""
    from test_sim_eval import FollowAgent

    from pmoe_tpu.eval import evaluate_nocrash as cli

    monkeypatch.setattr(cli, "ImageAgent", lambda cfg: FollowAgent(None))
    log_dir = tmp_path / "results"
    argv = ["--town", "Town01", "--weather", "train", "--routes", "1",
            "--max-ticks", "300", "--log-dir", str(log_dir)]
    cli.main(argv)
    csv_path = log_dir / "Town01_train.csv"
    rows = list(csv.reader(csv_path.open()))
    from pmoe_tpu.eval.nocrash import TRAIN_WEATHERS

    n_weathers = len(TRAIN_WEATHERS)
    assert len(rows) == 1 + 3 * n_weathers  # header + 3 traffic x 1 route x weathers
    # resume: a second run adds nothing (every episode already finished)
    cli.main(argv + ["--resume"])
    rows2 = list(csv.reader(csv_path.open()))
    assert len(rows2) == len(rows)


def test_evaluate_leaderboard_cli(tmp_path, monkeypatch):
    """The leaderboard CLI end-to-end: argparse -> RouteIndexer ->
    LeaderboardEvaluator -> global stats JSON checkpoint."""
    import json

    from test_sim_eval import FollowAgent

    from pmoe_tpu.eval import evaluate as cli

    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    monkeypatch.setattr(cli, "ImageAgent", lambda cfg: FollowAgent(None))
    monkeypatch.chdir(tmp_path)         # env.checkpoint default is relative
    cli.main(["--town", "Town01", "--routes", "1", "--max-ticks", "300",
              "--config", str(repo / "pmoe_tpu" / "conf" / "benchmark")])
    ck = json.loads((tmp_path / "simulation_results.json").read_text())
    records = ck["_checkpoint"]["records"]
    assert len(records) == 1
    assert "scores" in records[0]
    assert ck["_checkpoint"]["global_record"]     # aggregation computed


def test_scenario_cli(capsys):
    """The standalone scenario CLI (reference scenario_runner.py role)."""
    from pmoe_tpu.eval import scenario_cli as cli

    with pytest.raises(SystemExit) as e:
        cli.main(["--scenario", "FollowLeadingVehicle", "--max-ticks", "400"])
    assert e.value.code == 0            # scenario reached SUCCESS
    out = capsys.readouterr().out
    assert "FollowLeadingVehicle" in out
