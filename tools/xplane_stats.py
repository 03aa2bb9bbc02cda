"""Shared xplane (device trace) analysis: top HLO ops by self time.

Used by tools/profile_stage*.py; works offline on a saved trace directory.
"""

from __future__ import annotations

import glob
import gzip
import json
import os


def load_hlo_stats(outdir: str):
    xplanes = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                        recursive=True)
    if not xplanes:
        return None, None
    xplane = max(xplanes, key=os.path.getmtime)
    from xprof.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data([xplane], "hlo_stats", {})
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode()
    tbl = json.loads(data)
    cols = [c["label"] for c in tbl["cols"]]
    rows = [[cell.get("v") if cell else None for cell in r["c"]]
            for r in tbl["rows"]]
    return cols, rows


def print_top_ops(outdir: str, top: int = 40, steps: int = 3) -> None:
    cols, rows = load_hlo_stats(outdir)
    if cols is None:
        print("NO xplane captured — device-side tracing unsupported here?")
        return

    def col(name):
        for i, c in enumerate(cols):
            if name.lower() in c.lower():
                return i
        raise KeyError(f"{name} not in {cols}")

    i_cat = col("HLO op category")
    i_name = col("HLO op name")
    i_text = col("HLO op text")
    i_self = col("Total self time (us)")
    i_bound = col("Bound by")
    agg = {}
    for r in rows:
        cat = r[i_cat] or "?"
        agg[cat] = agg.get(cat, 0.0) + float(r[i_self] or 0)
    total = sum(agg.values())
    print(f"\n== by category (device self time {total / steps / 1e3:.1f} "
          f"ms/step over {steps} steps) ==")
    for k, v_ in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"  {k:40s} {v_ / steps / 1e3:9.2f} ms/step "
              f"{100 * v_ / total:5.1f}%")
    print(f"\n== top {top} ops by self time (ms/step) ==")
    rows.sort(key=lambda r: -float(r[i_self] or 0))
    for r in rows[:top]:
        print(f"  {float(r[i_self] or 0) / steps / 1e3:8.2f} "
              f"{str(r[i_bound]):<10s} {str(r[i_cat]):<20s} "
              f"{(r[i_name] or '')[:34]:<36s} {(r[i_text] or '')[:110]}")
