"""Dual-reader portability for the events table (VERDICT r2, item 4).

``events.ts`` is physically TIMESTAMP(NANOS); depending on the Spark reader
version it surfaces as native TIMESTAMP_NTZ, raw nanos ``bigint`` (legacy
``nanosAsLong``), or — for re-written copies — plain TIMESTAMP. ``_t``
normalizes all three to TIMESTAMP_NTZ. These tests materialize the same
logical data through each branch and assert (a) the normalized type, and
(b) that the real events queries (lag-gap q33, windowed agg q24, as-of q40)
return identical results over every branch — so a Spark-version bump that
flips the reader branch cannot silently break half the events catalog.
"""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from universal_aws_data_pipeline_spark.plans.catalog import QUERIES, _t

EVENTS_QUERIES = ["q24_events_hourly_window", "q33_event_gaps", "q40_asof_join"]


def _rows():
    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    out = []
    eid = 0
    for user in range(1, 6):
        for k in range(20):
            eid += 1
            ts = base + dt.timedelta(seconds=37 * k * user + k * k, microseconds=123456 * k)
            etype = ["click", "view", "purchase", "click"][k % 4]
            out.append((eid, ts, user, etype, float(k) * 1.5, '{"k":%d}' % k))
    return out


@pytest.fixture(scope="module")
def variant_dirs(spark, tmp_path_factory):
    """Write the same events data through each physical representation."""
    rows = _rows()
    schema_ntz = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    dirs = {}

    # Branch 1: native TIMESTAMP_NTZ (what the pinned PySpark 4.1.2 yields).
    d = tmp_path_factory.mktemp("events_ntz")
    spark.createDataFrame(rows, schema_ntz).repartition(2).write.parquet(str(d / "events.parquet"))
    dirs["ntz"] = str(d)

    # Branch 2: raw nanos bigint (what a nanosAsLong legacy reader yields).
    d = tmp_path_factory.mktemp("events_nanos")
    nanos = [
        (eid, int(ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000) * 1000, u, et, v, p)
        for (eid, ts, u, et, v, p) in rows
    ]
    schema_big = T.StructType(
        [T.StructField("event_id", T.LongType()), T.StructField("ts", T.LongType())] + schema_ntz.fields[2:]
    )
    spark.createDataFrame(nanos, schema_big).repartition(2).write.parquet(str(d / "events.parquet"))
    dirs["nanos_bigint"] = str(d)

    # Branch 3: plain TIMESTAMP (LTZ micros — a re-written copy of the table).
    d = tmp_path_factory.mktemp("events_ltz")
    spark.createDataFrame(rows, schema_ntz).withColumn(
        "ts", F.expr("timestampadd(MICROSECOND, timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01', ts), TIMESTAMP '1970-01-01 00:00:00+00:00')")
    ).repartition(2).write.parquet(str(d / "events.parquet"))
    dirs["ltz"] = str(d)
    return dirs


def test_all_branches_normalize_to_ntz(spark, variant_dirs):
    for label, d in variant_dirs.items():
        df = _t(spark, d, "events")
        assert dict(df.dtypes)["ts"] == "timestamp_ntz", f"{label}: ts is {dict(df.dtypes)['ts']}"


def test_normalized_values_identical(spark, variant_dirs):
    ref = None
    for label, d in variant_dirs.items():
        got = sorted(
            _t(spark, d, "events").select("event_id", F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")).collect()
        )
        if ref is None:
            ref = got
        else:
            assert got == ref, f"{label} diverges from first branch"


@pytest.mark.parametrize("qname", EVENTS_QUERIES)
def test_events_queries_agree_across_branches(spark, variant_dirs, qname):
    """The epoch/gap/window/as-of expressions must produce identical results
    whichever physical representation the reader surfaced."""
    spec = QUERIES[qname]
    ref = None
    for label, d in variant_dirs.items():
        got = sorted(map(tuple, spec.fn(spark, d).collect()))
        if ref is None:
            ref = got
        else:
            assert got == ref, f"{qname}: branch {label} diverges"
        assert len(got) > 0, f"{qname}: branch {label} returned no rows"
