"""Quantify the agg-view maintainer twins' marginal per-batch cost at
realistic group counts (VERDICT r7, item 5).

The round-7 twin test proves v1 (foreachBatch + crash-safe parquet view,
``operators/incremental.agg_view_stream_fn``) and v2
(``streaming/stateful.agg_view_v2`` — ValueState on RocksDB) maintain
identical views, but only at toy scale where fixed startup cost dominates.
PERF.md claims "v2 wins when |groups| >> touched-per-batch" because v1
re-reads and rewrites the FULL |groups|-row parquet view every batch while
v2 touches only the batch's state rows. This script attaches numbers:

For each |groups| in argv (default 1000 and 100000):

1. build a stream: batch b0 creates every group (one +1 row each), each
   later batch touches TOUCHED=1000 groups (one +1 row each);
2. run each maintainer twice — once with 1 touch batch, once with
   1 + EXTRA touch batches — as availableNow runs with
   maxFilesPerTrigger=1, so startup + b0 cost cancels in the difference:
       marginal per-batch = (t_long - t_short) / EXTRA
3. report the maintainer's state footprint after the long run (v1: the
   statestore view directory; v2: the checkpoint's state/ tree).

Prints a PERF.md-ready markdown table plus one JSON line.

Run on a QUIET machine (same discipline as bench.py); the numbers ride the
same local-mode noise band (~3%), and the marginal-difference design
additionally cancels constant per-run cost.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# protobuf vendoring shim (state-v2 Arrow workers need a real google.protobuf)
# must land on PYTHONPATH BEFORE the JVM launches — same seam as tests/conftest
_PB_VENDOR = os.path.join(REPO, "tests", "pb_vendor")
if _PB_VENDOR not in os.environ.get("PYTHONPATH", ""):
    os.environ["PYTHONPATH"] = (
        _PB_VENDOR + os.pathsep + os.environ["PYTHONPATH"]
        if os.environ.get("PYTHONPATH")
        else _PB_VENDOR
    )
sys.path.insert(0, _PB_VENDOR)
import sitecustomize as _pb_shim  # noqa: F401,E402

from pyspark.sql import functions as F  # noqa: E402

from universal_aws_data_pipeline_spark.session import get_spark  # noqa: E402

TOUCHED = 1000
EXTRA = 8  # extra touch batches in the long run


def _write_batches(d: str, groups: int, touch_batches: int) -> None:
    """b0: every group appears once; b1..bN: the first TOUCHED groups get
    one +1 row each. Staggered mtimes give maxFilesPerTrigger=1 a stable
    replay order."""
    os.makedirs(d)
    paths = []
    p0 = os.path.join(d, "b000.json")
    with open(p0, "w") as f:
        for g in range(groups):
            f.write(json.dumps({"g": g, "v": g % 97, "_sign": 1}) + "\n")
    paths.append(p0)
    for i in range(1, touch_batches + 1):
        p = os.path.join(d, f"b{i:03d}.json")
        with open(p, "w") as f:
            for g in range(min(TOUCHED, groups)):
                f.write(json.dumps({"g": g, "v": 1, "_sign": 1}) + "\n")
        paths.append(p)
    base = os.path.getmtime(p0)
    for i, p in enumerate(paths):
        os.utime(p, (base + i, base + i))


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            try:
                total += os.path.getsize(os.path.join(root, fn))
            except OSError:
                pass
    return total


def _run_v1(spark, data_dir: str, work: str) -> tuple[float, int]:
    from universal_aws_data_pipeline_spark.operators.incremental import (
        agg_view_stream_fn,
    )
    from universal_aws_data_pipeline_spark.streaming.ops import write_stream_sink

    state = os.path.join(work, "state")
    fn = agg_view_stream_fn(state, ["g"], ["v"], count_col="n_rows")
    stream = (
        spark.readStream.schema("g LONG, v LONG, _sign INT")
        .option("maxFilesPerTrigger", 1)
        .json(data_dir)
    )
    t0 = time.monotonic()
    q = write_stream_sink(
        stream,
        {
            "type": "foreach_batch",
            "fn": fn,
            "checkpoint": os.path.join(work, "ckpt"),
            "output_mode": "append",
            "trigger": {"availableNow": True},
        },
    )
    q.awaitTermination(1800)
    return time.monotonic() - t0, _dir_bytes(state)


def _run_v2(
    spark, data_dir: str, work: str, expected_out_rows: int
) -> tuple[float, int]:
    """transformWithStateInPandas + availableNow does NOT self-terminate:
    after draining the files the stateful operator keeps scheduling empty
    batches forever (observed: 660+ empty commits; the round-7 twin test
    never noticed because its awaitTermination(180) simply timed out after
    the data had been processed). The measurement therefore polls the
    foreachBatch output-row counter — the maintainer emits one row per
    touched group per batch, so the expected total is known exactly — and
    stops the query once everything has been processed. Poll granularity
    (100 ms) is inside the noise of the marginal-difference design."""
    from universal_aws_data_pipeline_spark.streaming.ops import write_stream_sink
    from universal_aws_data_pipeline_spark.streaming.stateful import agg_view_v2

    stream = (
        spark.readStream.schema("g LONG, v LONG, _sign INT")
        .option("maxFilesPerTrigger", 1)
        .json(data_dir)
    )

    seen = {"rows": 0}

    def fold(batch_df, _bid):  # drain the changelog without driver-side joins
        seen["rows"] += batch_df.count()

    ckpt = os.path.join(work, "ckpt")
    t0 = time.monotonic()
    q = write_stream_sink(
        agg_view_v2(stream, group_col="g", measure_cols=["v"]),
        {
            "type": "foreach_batch",
            "fn": fold,
            "checkpoint": ckpt,
            "output_mode": "update",
            "trigger": {"availableNow": True},
        },
    )
    deadline = time.monotonic() + 1800
    while seen["rows"] < expected_out_rows and time.monotonic() < deadline:
        if not q.isActive:
            break
        time.sleep(0.1)
    elapsed = time.monotonic() - t0
    q.stop()
    if seen["rows"] < expected_out_rows:
        raise RuntimeError(
            f"v2 run incomplete: {seen['rows']}/{expected_out_rows} output rows"
        )
    state_bytes = 0
    for p in glob.glob(os.path.join(ckpt, "state")):
        state_bytes += _dir_bytes(p)
    return elapsed, state_bytes


def measure(spark, groups: int) -> dict:
    out: dict = {"groups": groups, "touched": min(TOUCHED, groups)}
    for label, runner in (("v1", _run_v1), ("v2", _run_v2)):
        times = {}
        state_bytes = 0
        for tag, touch_batches in (("short", 1), ("long", 1 + EXTRA)):
            root = tempfile.mkdtemp(prefix=f"sv2_{label}_{tag}_")
            try:
                data = os.path.join(root, "in")
                _write_batches(data, groups, touch_batches)
                if label == "v2":
                    expected = groups + touch_batches * min(TOUCHED, groups)
                    elapsed, sb = runner(
                        spark, data, os.path.join(root, "work"), expected
                    )
                else:
                    elapsed, sb = runner(spark, data, os.path.join(root, "work"))
                times[tag] = elapsed
                print(
                    f"# {groups} groups {label} {tag}: {elapsed:.1f}s",
                    file=sys.stderr,
                    flush=True,
                )
                if tag == "long":
                    state_bytes = sb
            finally:
                shutil.rmtree(root, ignore_errors=True)
        out[label] = {
            "short_s": round(times["short"], 2),
            "long_s": round(times["long"], 2),
            "marginal_batch_ms": round(1000 * (times["long"] - times["short"]) / EXTRA),
            "state_bytes": state_bytes,
        }
    return out


def main() -> None:
    group_counts = [int(a) for a in sys.argv[1:]] or [1000, 100_000]
    spark = get_spark(
        app_name="state_v2_overhead", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    results = [measure(spark, g) for g in group_counts]

    print("\n| groups | touched/batch | v1 marginal ms/batch | v2 marginal ms/batch "
          "| v1 state | v2 state |")
    print("|---|---|---|---|---|---|")
    for r in results:
        print(
            f"| {r['groups']:,} | {r['touched']:,} | {r['v1']['marginal_batch_ms']:,} "
            f"| {r['v2']['marginal_batch_ms']:,} "
            f"| {r['v1']['state_bytes'] / 1e6:.1f} MB | {r['v2']['state_bytes'] / 1e6:.1f} MB |"
        )
    sys.stdout.write(json.dumps({"results": results}) + "\n")


if __name__ == "__main__":
    main()
