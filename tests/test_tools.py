"""Glue tests for the repo tools (no device work)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_nocrash_benchmark_agent_conf_roundtrip(tmp_path):
    """The benchmark harness writes an agent conf that get_conf loads back
    with the exact model section the trainer used (checkpoint path wired
    into model.actor.model_dir)."""
    from pmoe_tpu.utils import get_conf
    from tools.nocrash_benchmark import model_cfg, write_agent_conf

    ckpt = tmp_path / "ckpt" / "moe-best.ckpt"
    p = write_agent_conf(tmp_path / "agent.yaml", ckpt, "resnet18")
    cfg = get_conf(p)
    actor = cfg["model"]["actor"]
    assert actor["model_dir"] == str(ckpt)
    assert actor["n_commands"] == 6
    ref = model_cfg("resnet18")
    assert actor["backbone"] == ref["backbone"]
    assert actor["type"] == "moe" and actor["n_experts"] == ref["n_experts"]
    assert int(cfg["sensors"]["img_width"]) == 800
