"""Generate NoCrash suite files with the reference's 25 spawn pairs per town.

The reference ships 25-line suite files (start_idx target_idx per line,
/root/reference/PMoE/runners/suite/nocrash_Town01.txt) whose indices address
CARLA's spawn-point table. Our fake towns expose a grid spawn table
(sim/fake_carla.py:147-150: Town01 4x4 = 16 points, Town02 3x3 = 9), so the
suites are regenerated here deterministically: 25 ordered pairs per town,
mixing turn routes (both legs >= 1 block) and straight routes, with route
lengths spread over the town's extent, no duplicate pairs.

Usage: python tools/make_suites.py   (rewrites pmoe_tpu/assets/suites/*.txt)
"""

from __future__ import annotations

import sys
import zlib
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pmoe_tpu.sim.fake_carla import FakeCarlaBackend  # noqa: E402

N_PAIRS = 25
TOWNS = ("Town01", "Town02")


def make_pairs(town: str, n_pairs: int = N_PAIRS):
    backend = FakeCarlaBackend(town=town, render=False)
    spawn = backend.spawn_points()
    n = len(spawn)
    # stable across processes: str hash is randomized per run
    # (PYTHONHASHSEED), which would silently regenerate DIFFERENT suites and
    # invalidate cross-run comparisons (ADVICE r3); crc32 is deterministic
    rng = np.random.default_rng(zlib.crc32(town.encode()))

    def legs(a, b):
        (ax, ay), (bx, by) = spawn[a], spawn[b]
        return abs(bx - ax), abs(by - ay)

    # all candidate ordered pairs, bucketed by route kind
    turns, straights = [], []
    for a in range(n):
        for b in range(n):
            if a == b:
                continue
            dx, dy = legs(a, b)
            length = dx + dy
            if length < 80.0:       # too short to be a meaningful route
                continue
            (turns if dx > 1.0 and dy > 1.0 else straights).append(
                (a, b, length))

    # ~2/3 turn routes, 1/3 straights (CARLA NoCrash routes mix both),
    # sampled across the length distribution: sort by length, take evenly
    # spaced ranks after a deterministic shuffle breaks grid symmetry ties
    def pick(cands, k):
        cands = sorted(cands, key=lambda t: (t[2], rng.random()))
        idx = np.linspace(0, len(cands) - 1, k).round().astype(int)
        return [cands[i][:2] for i in idx]

    n_turns = min((2 * n_pairs + 2) // 3, len(turns))
    pairs = pick(turns, n_turns) + pick(straights, n_pairs - n_turns)
    assert len(pairs) == len(set(pairs)) == n_pairs, town
    return pairs


def main():
    out_dir = Path(__file__).resolve().parent.parent / "pmoe_tpu" / "assets" / "suites"
    out_dir.mkdir(parents=True, exist_ok=True)
    force = "--force" in sys.argv
    for town in TOWNS:
        pairs = make_pairs(town)
        path = out_dir / f"nocrash_{town}.txt"
        text = "".join(f"{a} {b}\n" for a, b in pairs)
        if path.exists() and path.read_text() != text and not force:
            # the committed suites are the canonical benchmark artifact:
            # every published result and every data-collection holdout is
            # defined against them — never silently replace them
            print(f"REFUSING to overwrite {path}: regenerated suite differs "
                  f"from the committed one (pass --force to replace, which "
                  f"invalidates all existing results/holdouts for {town})")
            continue
        path.write_text(text)
        print(f"wrote {path} ({len(pairs)} pairs)")


if __name__ == "__main__":
    main()
