"""Skew strategies: salted join correctness, bucketed co-located join plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from universal_aws_data_pipeline_spark.operators.skew import colocated_join, salted_join, write_bucketed


def test_salted_join_matches_plain_join(spark):
    # hot key: 'h' carries 90% of rows
    left = spark.createDataFrame([("h" if i % 10 else f"k{i}", i) for i in range(1000)], "key STRING, v LONG")
    right = spark.createDataFrame([("h", 1.0), ("k10", 2.0), ("k20", 3.0)], "key STRING, w DOUBLE")
    plain = left.join(right, "key").groupBy("key").agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
    salted = salted_join(left, right, "key", salt_buckets=4).groupBy("key").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([("a", 1), ("b", 2)], "key STRING, v LONG")
    right = spark.createDataFrame([("a", 10.0)], "key STRING, w DOUBLE")
    rows = {r["key"]: r["w"] for r in salted_join(left, right, "key", salt_buckets=3, how="left").collect()}
    assert rows == {"a": 10.0, "b": None}


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    # spark.sql.warehouse.dir is static — tables land in ./spark-warehouse
    # (gitignored); DROP TABLE removes managed-table files in teardown
    big1 = spark.range(0, 10000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("a"))
    big2 = spark.range(0, 10000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("b"))
    write_bucketed(big1, "t_buck_a", "k", n_buckets=4)
    write_bucketed(big2, "t_buck_b", "k", n_buckets=4)
    try:
        # disable broadcast so the join would otherwise shuffle both sides
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = colocated_join(spark, "t_buck_a", "t_buck_b", "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert joined.count() == 10000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.sql("DROP TABLE IF EXISTS t_buck_a")
        spark.sql("DROP TABLE IF EXISTS t_buck_b")


def test_aqe_native_skew_join_splits_hot_partition(spark):
    """The engine's own lever, proven next to the manual one: with AQE skew
    handling enabled (and thresholds lowered to fixture scale), a join on a
    pathologically hot key gets its oversized shuffle partition SPLIT at
    runtime — the physical plan's SortMergeJoin reports isSkew=true without
    any salting code. Documents when users need salted_join at all: only
    when the skew is known ahead of time and they want to avoid the AQE
    re-plan, when the join is broadcast-ineligible BUT the hot side must
    stay on one key for a later stage, or on engines/versions without AQE.
    """
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # fixture-sized thresholds: any partition >16KB and 2x median is skewed
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16384",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8192",
        # force the SMJ path: broadcast would absorb the skew invisibly
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "8",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # 200k rows of one hot key + a uniform tail, joined to a 3-row dim
        left = spark.range(220_000).select(
            F.when(F.col("id") < 200_000, F.lit(1))
            .otherwise((F.col("id") % 3).cast("long"))
            .alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("pad"),
        )
        right = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], "k: long, v: string")
        # aggregate over a RIGHT-side column so the join cannot be pruned,
        # keep the wide left column live so the hot shuffle partition is
        # genuinely oversized after column pruning + compression, and
        # execute THIS dataset so its own AQE plan finalizes in place
        joined = left.join(right, "k").agg(
            F.count("v").alias("n"), F.sum(F.length("pad")).alias("pad_bytes")
        )
        assert joined.collect()[0]["n"] == 200_000 + 20_000
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final
        assert "isSkew=true" in final or "skew=true" in final.lower(), (
            "AQE skew split missing from final plan:\n" + final[:2000]
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
