"""Checkpoint soup: weighted average of two stage-2 checkpoints.

The round-4 recipe's T01/T02 balance came from a greedy soup
(0.7*dagger-retrain + 0.3*base, ROUND7.md item 1): DAgger rounds overfit
the DAgger town, and averaging with the base checkpoint restores held-out
performance (Model-Soups-style weight averaging works here because both
checkpoints share the BC init lineage). The r4 soup itself was an
untracked script and died with the session — this tool makes the
capability durable.

Usage: python tools/ckpt_soup.py A.ckpt B.ckpt --alpha 0.7 --out soup.ckpt
       (out = alpha*A + (1-alpha)*B; batch_stats from A)
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("a")
    ap.add_argument("b")
    ap.add_argument("--alpha", type=float, default=0.7,
                    help="weight on A (default 0.7, the r4 recipe)")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax

    from pmoe_tpu.utils import load_checkpoint, save_checkpoint

    cka, ckb = load_checkpoint(args.a), load_checkpoint(args.b)
    ta, tb = cka.get("model", cka), ckb.get("model", ckb)
    soup = jax.tree_util.tree_map(
        lambda x, y: (args.alpha * np.asarray(x, np.float64)
                      + (1 - args.alpha) * np.asarray(y, np.float64)
                      ).astype(np.asarray(x).dtype), ta, tb)
    out = Path(args.out)
    state = {"model": soup, "epoch": np.int64(0)}
    if "batch_stats" in cka:
        state["batch_stats"] = cka["batch_stats"]
    save_checkpoint(state, False, str(out.parent), out.name.removesuffix(".ckpt"))
    print(f"[soup] {args.alpha}*{args.a} + {1-args.alpha:.1f}*{args.b} "
          f"-> {out.parent}/{out.name}")


if __name__ == "__main__":
    main()
