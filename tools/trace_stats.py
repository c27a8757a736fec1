#!/usr/bin/env python
"""Summarize an xprof trace directory: device self-time by HLO category.

Wall-clock timing of small/chained device work through the axon relay
UNDER-REPORTS (CLAUDE.md), so perf work on this stack trusts device traces:

    python tools/bench_train.py --trace /tmp/tr --modes fused --steps 10
    python tools/trace_stats.py /tmp/tr/fused [--top 25]

Prints total device time, per-step time (divide by --steps), and the
self-time breakdown by category (convolution / custom-call = the Pallas
kernels / loop fusions / data formatting / ...) plus the top ops.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
from collections import defaultdict


def find_xplane(tracedir: str) -> str:
    hits = sorted(
        glob.glob(os.path.join(tracedir, "**", "*.xplane.pb"), recursive=True)
    )
    if not hits:
        raise FileNotFoundError(f"no *.xplane.pb under {tracedir}")
    return hits[-1]


def hlo_stats_rows(xplane: str):
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data([xplane], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    table = json.loads(data)
    cols = [c["label"] for c in table["cols"]]
    for row in table["rows"]:
        yield dict(zip(cols, [c.get("v") for c in row["c"]]))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("tracedir")
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--steps", type=int, default=0,
                    help="divide totals by N steps")
    args = ap.parse_args(argv)

    rows = list(hlo_stats_rows(find_xplane(args.tracedir)))

    def col(r, *names, default=0.0):
        for n in names:
            if n in r and r[n] is not None:
                return r[n]
        return default

    by_cat = defaultdict(float)
    ops = []
    total = 0.0
    for r in rows:
        t = float(col(r, "Total self time (us)", "Total time (us)"))
        cat = str(col(r, "HLO op category", "HLO category", default="?"))
        name = str(col(r, "HLO op name", "HLO name", default="?"))
        by_cat[cat] += t
        total += t
        ops.append((t, cat, name))

    div = max(args.steps, 1)
    print(f"device total: {total/1e3:.1f} ms"
          + (f"  ({total/1e3/div:.1f} ms/step over {div} steps)"
             if args.steps else ""))
    print("\nby category:")
    for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {t/1e3:9.2f} ms  {100*t/max(total,1e-9):5.1f}%  {cat}")
    print(f"\ntop {args.top} ops:")
    for t, cat, name in sorted(ops, reverse=True)[: args.top]:
        print(f"  {t/1e3:9.2f} ms  [{cat}]  {name[:100]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
