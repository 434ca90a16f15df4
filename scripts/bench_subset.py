"""Ad-hoc A/B timer for a subset of catalog queries (optimization-round
tooling): runs the named queries through the SAME methodology as bench.py's
run_chunk (noop sink, warmup at sf0.001, cold + best-of-2 warm) in one
fresh JVM and prints a compact JSON line. Usage:

    python scripts/bench_subset.py q161_mutual_nn q196_winsorized_revenue

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
This is a developer tool; the graded artifact still comes from bench.py.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    if not names:
        print("usage: bench_subset.py <query> [query ...]", file=sys.stderr)
        raise SystemExit(2)
    from bench import run_chunk
    from universal_aws_data_pipeline_spark.plans.catalog import QUERIES

    for n in names:
        if n not in QUERIES:
            matches = [q for q in QUERIES if q.startswith(n)]
            if len(matches) != 1:
                print(f"unknown query {n!r} (matches: {matches})", file=sys.stderr)
                raise SystemExit(2)
            names[names.index(n)] = matches[0]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    result = run_chunk(names, sf_dir, cpus)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
