"""Console entry points mirroring the ``run.sh`` verbs.

The reference is pip-installable at its vendored roots
(/root/reference/setup.py:1, /root/reference/PMoE/leaderboard/setup.py); this
module gives the rebuild the same property: ``pip install -e .`` exposes
``pmoe-tpu-train`` / ``pmoe-tpu-benchmark`` / ``pmoe-tpu-nocrash`` /
``pmoe-tpu-bench`` (pyproject.toml [project.scripts]). ``run.sh`` stays the
thin dispatcher for the reference-parity CLI surface.
"""

from __future__ import annotations

import runpy
import sys
from pathlib import Path

__all__ = ["train", "bench"]

_STAGES = {
    "stage0": ("pmoe_tpu.trainer.train_0", "pmoe_tpu/conf/stage_0"),
    "stage1": ("pmoe_tpu.trainer.train_1", "pmoe_tpu/conf/stage_1"),
    "stage2": ("pmoe_tpu.trainer.train_2", None),   # conf is required
    "stage3": ("pmoe_tpu.trainer.train_3", "pmoe_tpu/conf/stage_3"),
}


def train(argv=None) -> None:
    """``pmoe-tpu-train STAGE [CONF]`` — run.sh stage0..stage3 equivalent."""
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] not in _STAGES:
        raise SystemExit(
            f"usage: pmoe-tpu-train {{{'|'.join(_STAGES)}}} [CONF]")
    module, default_conf = _STAGES[argv[0]]
    rest = argv[1:] or ([default_conf] if default_conf else [])
    if not rest:
        raise SystemExit("usage: pmoe-tpu-train stage2 CONF")
    import importlib

    importlib.import_module(module).main(rest)


def bench(argv=None) -> None:
    """``pmoe-tpu-bench`` — run the repo-root perf benchmark (bench.py)."""
    root = Path(__file__).resolve().parent.parent
    script = root / "bench.py"
    if not script.exists():
        raise SystemExit(
            "bench.py not found next to the pmoe_tpu package; the perf "
            "benchmark runs from a source checkout (pip install -e .)")
    sys.argv = [str(script)] + list(sys.argv[1:] if argv is None else argv)
    runpy.run_path(str(script), run_name="__main__")
