"""Benchmark harness: run the headline catalog queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is materialized via a count-collapsing action that still executes
the full plan (``df.write.format("noop")``), so timings include the complete
scan→shuffle→output path without driver-side collect overhead.

Two series are reported so cold-path regressions stay visible:

- ``queries_cold`` / ``value_cold``: first run per query against a scrubbed
  artifact cache — includes one-time index builds (q15 shingle checkpoint,
  q28 IVF build) and any lazy materialization.
- ``queries`` / ``value`` (headline): best-of-2 steady state — amortized
  index builds excluded, resistant to shared-VM scheduling noise.
"""

from __future__ import annotations

import gc
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from universal_aws_data_pipeline_spark.plans.catalog import QUERIES
from universal_aws_data_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(app_name="bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    # Scrub the build-once artifact cache so the cold series really is cold
    # (index builds included), then warm the JVM (whole-stage codegen
    # compilation, parquet reader classes) by executing every query once at
    # the smallest SF: per-query timings then measure the query, not one-time
    # JIT costs. Falls back to the bench dir if sf0.001 isn't present.
    cache_root = os.environ.get(
        "SPARK_GRAFT_INDEX_DIR", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")
    )
    shutil.rmtree(cache_root, ignore_errors=True)
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for spec in QUERIES.values():
        try:
            spec.fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
        spark.catalog.clearCache()
        gc.collect()

    # Per-query fault isolation: one failing query must never abort the
    # series — its error is recorded and every other timing still lands.
    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, spec in QUERIES.items():
        t0 = time.monotonic()
        try:
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001 — harness must degrade, not die
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            continue
        cold[name] = round(time.monotonic() - t0, 3)
        # best-of-2 steady state: reports amortized latency, resistant to the
        # rig's scheduling noise (single-run numbers swing 3-10x on shared VMs)
        best = float("inf")
        try:
            for _ in range(2):
                t0 = time.monotonic()
                spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.monotonic() - t0)
            warm[name] = round(best, 3)
        except Exception as exc:  # noqa: BLE001
            # Record the error and OMIT the query from the warm series — a
            # substituted cold timing would silently pollute the headline sum.
            errors[name] = f"warm: {type(exc).__name__}: {exc}"[:500]
        # State hygiene between queries: several operators persist
        # intermediates (shingle tables, blocked-pair inputs) whose lifetime
        # is the query, and iterative ops leave localCheckpoint RDDs behind.
        # Across ~270 executions those accumulate until cache eviction and
        # GC pressure contaminate later timings (observed: a query's warm
        # runs 3x slower than its own cold run). Clear the cache and drop
        # Python-side refs so the ContextCleaner can reap checkpoint blocks.
        spark.catalog.clearCache()
        gc.collect()

    sf_label = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_value: float | str = float(sf_label)
    except ValueError:
        sf_value = sf_label
    detail = {
        "metric": "catalog_query_wall_clock_total",
        "value": round(sum(warm.values()), 3),
        "unit": "sec",
        "queries": warm,
        "queries_cold": cold,
        "value_cold": round(sum(cold.values()), 3),
        "sf": sf_value,
    }
    if errors:
        detail["errors"] = errors
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_detail.json")
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1)

    # The driver captures only the last ~2 KB of stdout; a line carrying all
    # 100 per-query timings gets its head truncated and fails to parse
    # (BENCH_r03 "parsed": null). Print a COMPACT summary line LAST — totals,
    # error names, and the 10 slowest warm queries — and point at the full
    # per-query detail written above.
    slowest = dict(sorted(warm.items(), key=lambda kv: -kv[1])[:10])
    out = {
        "metric": "catalog_query_wall_clock_total",
        "value": detail["value"],
        "unit": "sec",
        "queries": slowest,
        "sf": sf_value,
        "value_cold": detail["value_cold"],
        "n_queries": len(warm),
        "n_errors": len(errors),
        "detail": "BENCH_detail.json",
    }
    if errors:
        out["error_queries"] = sorted(errors)[:10]
    line = json.dumps(out, separators=(",", ":"))
    sys.stdout.write(line + "\n")
    sys.stdout.flush()


if __name__ == "__main__":
    main()
