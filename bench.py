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

Fixed-size JVM sessions (round 8, VERDICT r7 item 7): ~200 queries in one
JVM is ~8,600 Spark stages, and every round's warm drift concentrated in
the same mid-session block — accumulated JIT/GC/codegen-cache state makes a
query's timing depend on its POSITION in the series. The harness therefore
splits the catalog into consecutive chunks of $SPARK_GRAFT_BENCH_SESSION_SIZE
queries (default 50) and runs each chunk in its OWN subprocess JVM: warmup,
cold, and warm series all happen inside the chunk's session, so a query's
number is comparable across rounds as the catalog grows — its session
context is pinned by position, not by whatever ran before it globally.
BENCH_detail.json carries a ``sessions`` map (query → session index) so
``scripts/bench_compare.py`` and the committed warm references can see the
boundaries. Set the size to 0 to restore the single-session behavior.
"""

from __future__ import annotations

import gc
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_REPO = os.path.dirname(os.path.abspath(__file__))


def _query_names() -> list[str]:
    from universal_aws_data_pipeline_spark.plans.catalog import QUERIES

    return list(QUERIES)


def run_chunk(names: list[str], sf_dir: str, cpus: str) -> dict:
    """Warm up, then time the given queries inside THIS process's Spark
    session. Returns {"cold": {...}, "warm": {...}, "errors": {...},
    "load": [before_1m, after_1m, after_5m]}.

    The loadavg capture (round 12, VERDICT r11 item 2) exists because
    adjudicating the r11 driver run as host-drag pollution took a
    forensic session (warm>cold inversions + quiet-host re-runs): with
    the host load recorded per chunk session, a polluted series is
    identifiable from its own artifact — ``scripts/bench_compare.py``
    prints it next to the per-session subtotals, and the close protocol
    gates "ship" on the recorded reading instead of `uptime` eyeballing.
    """
    from universal_aws_data_pipeline_spark.plans.catalog import QUERIES
    from universal_aws_data_pipeline_spark.session import get_spark

    load_before = os.getloadavg()[0]
    spark = get_spark(
        app_name="bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM (whole-stage codegen compilation, parquet reader classes)
    # by executing every chunk query once at the smallest SF: per-query
    # timings then measure the query, not one-time JIT costs. Falls back to
    # the bench dir if sf0.001 isn't present.
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for name in names:
        try:
            QUERIES[name].fn(spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
        spark.catalog.clearCache()
        gc.collect()

    # Per-query fault isolation: one failing query must never abort the
    # series — its error is recorded and every other timing still lands.
    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        spec = QUERIES[name]
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
        # Across hundreds of executions those accumulate until cache eviction
        # and GC pressure contaminate later timings (observed: a query's warm
        # runs 3x slower than its own cold run). Clear the cache and drop
        # Python-side refs so the ContextCleaner can reap checkpoint blocks.
        spark.catalog.clearCache()
        gc.collect()
    after = os.getloadavg()
    # before_1m is the host state the session STARTED under (pre-existing
    # contention); after_1m/after_5m say what it ran under — the 5-minute
    # average spans a typical ~50-query chunk, so a quiet before + hot
    # after-5m reads as "this bench was the load", which is fine; a hot
    # BEFORE reads as external drag.
    return {
        "cold": cold,
        "warm": warm,
        "errors": errors,
        "load": [round(load_before, 2), round(after[0], 2), round(after[1], 2)],
    }


def _chunk_child(out_path: str, span: str) -> None:
    """Subprocess entry: time queries [start, end) of the catalog order and
    write the partial result JSON to ``out_path``."""
    start, end = (int(x) for x in span.split(":"))
    names = _query_names()[start:end]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    result = run_chunk(names, sf_dir, cpus)
    with open(out_path, "w") as fh:
        json.dump(result, fh)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    session_size = int(os.environ.get("SPARK_GRAFT_BENCH_SESSION_SIZE", "50"))

    # Scrub the build-once artifact cache so the cold series really is cold
    # (index builds included).
    cache_root = os.environ.get(
        "SPARK_GRAFT_INDEX_DIR", os.path.join(_REPO, ".cache")
    )
    shutil.rmtree(cache_root, ignore_errors=True)

    names = _query_names()
    if session_size <= 0:
        chunks = [(0, len(names))]
    else:
        chunks = [
            (i, min(i + session_size, len(names)))
            for i in range(0, len(names), session_size)
        ]

    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    errors: dict[str, str] = {}
    sessions: dict[str, int] = {}
    load: dict[str, list[float]] = {}
    for si, (start, end) in enumerate(chunks):
        for n in names[start:end]:
            sessions[n] = si
        if len(chunks) == 1:
            part = run_chunk(names[start:end], sf_dir, cpus)
        else:
            out_path = os.path.join(_REPO, f".bench_chunk_{si}.json")
            try:
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--chunk", out_path, f"{start}:{end}"],
                    cwd=_REPO,
                    stdout=sys.stderr,
                    stderr=sys.stderr,
                )
                if proc.returncode != 0 or not os.path.exists(out_path):
                    for n in names[start:end]:
                        errors[n] = f"session {si} subprocess rc={proc.returncode}"
                    continue
                with open(out_path) as fh:
                    part = json.load(fh)
            finally:
                if os.path.exists(out_path):
                    os.remove(out_path)
        cold.update(part["cold"])
        warm.update(part["warm"])
        errors.update(part["errors"])
        if "load" in part:
            load[str(si)] = part["load"]

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
        "cpus": int(cpus),
        "session_size": session_size,
        "sessions": sessions,
        # host loadavg per chunk session: [before_1m, after_1m, after_5m] —
        # the self-evidence that distinguishes a drag-polluted series from a
        # real regression (VERDICT r11 item 2)
        "load": load,
    }
    if errors:
        detail["errors"] = errors
    # Per-CPU detail file IN ADDITION to the legacy path (VERDICT r13 item
    # 2: the round-13 8-core scaling run overwrote the 32-core per-query
    # detail because both wrote BENCH_detail.json). Runs at different
    # $SPARK_GRAFT_CPUS now leave separate details on disk; the legacy
    # filename keeps pointing at the most recent run for existing readers.
    detail_json = json.dumps(detail, indent=1)
    for detail_path in (
        os.path.join(_REPO, "BENCH_detail.json"),
        os.path.join(_REPO, f"BENCH_detail_c{int(cpus)}.json"),
    ):
        with open(detail_path, "w") as fh:
            fh.write(detail_json)

    # The driver captures only the last ~2 KB of stdout; a line carrying all
    # per-query timings gets its head truncated and fails to parse
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
        "n_sessions": len(chunks),
        "cpus": int(cpus),
        # the discriminating drag signal: what the host was doing BEFORE the
        # first chunk started. after_1m is dominated by the bench's own
        # ~CPUS worker threads and reads hot on every healthy run; later
        # sessions' before_1m inherit the previous chunk's tail. null — not
        # 0.0 — when session 0 produced no sample (a failed chunk must not
        # read as a perfectly quiet host).
        "load_s0_before_1m": load.get("0", [None])[0],
        "detail": "BENCH_detail.json",
    }
    if errors:
        out["error_queries"] = sorted(errors)[:10]
    line = json.dumps(out, separators=(",", ":"))
    sys.stdout.write(line + "\n")
    sys.stdout.flush()


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "--chunk":
        _chunk_child(sys.argv[2], sys.argv[3])
    else:
        main()
