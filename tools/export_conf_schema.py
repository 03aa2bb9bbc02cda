"""Record the reference conf YAML key schema as a golden JSON.

SURVEY.md §5: "YAML keys ARE the API schema" — configs are splatted
wholesale into constructors, so key-compatibility with the reference's
conf/*.yaml files is the public-API contract. This tool walks every
/root/reference/PMoE/conf/*.yaml and stores the nested KEY tree (no
values) in tests/golden/ref_conf_schema.json; tests/test_utils.py
asserts every key path exists in the matching pmoe_tpu/conf file.

Run once on a machine with the reference mounted:
    python tools/export_conf_schema.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

try:
    import yaml
except ImportError:
    from omegaconf import OmegaConf
    yaml = None

REF = Path("/root/reference/PMoE/conf")
OUT = Path(__file__).resolve().parent.parent / "tests" / "golden" / "ref_conf_schema.json"


def key_tree(node):
    if isinstance(node, dict):
        return {str(k): key_tree(v) for k, v in node.items()}
    return None   # leaf (scalar or list) — only key structure matters


def main():
    if not REF.is_dir():
        sys.exit(f"reference conf dir not found: {REF}")
    schema = {}
    for f in sorted(REF.glob("*.yaml")):
        if yaml is not None:
            with open(f) as fh:
                data = yaml.safe_load(fh)
        else:
            data = OmegaConf.to_container(OmegaConf.load(f))
        schema[f.name] = key_tree(data)
    OUT.write_text(json.dumps(schema, indent=1, sort_keys=True) + "\n")
    print(f"wrote {OUT} ({len(schema)} files)")


if __name__ == "__main__":
    main()
