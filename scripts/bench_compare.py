"""Compare a BENCH_detail.json warm series against a reference series and
flag regressions.

Usage: python scripts/bench_compare.py [detail_json] [reference_json]

Defaults: ../BENCH_detail.json vs scripts/r3_warm_reference.json (the
recovered round-3 warm values). A query is flagged when it is BOTH >1.5x its
reference time AND >0.3 s absolute slower — small queries jitter by
milliseconds on a shared VM, and the ratio alone would cry wolf on them.
Exit code 1 when any query is flagged, so the round-end checklist can gate
on it.
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def main() -> int:
    detail_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(HERE, "..", "BENCH_detail.json")
    ref_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(HERE, "r3_warm_reference.json")
    with open(detail_path) as fh:
        detail = json.load(fh)
    with open(ref_path) as fh:
        ref = json.load(fh)["warm"]

    cur = detail["queries"]
    flagged, improved = [], []
    for name, ref_t in sorted(ref.items()):
        if name not in cur:
            continue
        t = cur[name]
        if t > 1.5 * ref_t and t - ref_t > 0.3:
            flagged.append((name, ref_t, t))
        elif t < 0.67 * ref_t and ref_t - t > 0.3:
            improved.append((name, ref_t, t))

    common = [n for n in ref if n in cur]
    print(f"compared {len(common)} queries | total warm now "
          f"{sum(cur.values()):.1f}s over {len(cur)} queries")
    print(f"common-subset total: ref {sum(ref[n] for n in common):.1f}s "
          f"-> now {sum(cur[n] for n in common):.1f}s")
    for name, a, b in improved:
        print(f"  improved  {name}: {a:.2f}s -> {b:.2f}s")
    for name, a, b in flagged:
        print(f"  REGRESSED {name}: {a:.2f}s -> {b:.2f}s ({b / a:.1f}x)")
    if not flagged:
        print("no regressions flagged (>1.5x and >0.3s)")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
