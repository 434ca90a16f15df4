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
