"""plan_lint: each rule fires on a plan engineered to exhibit it and stays
quiet on the clean twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from universal_aws_data_pipeline_spark.plans.lint import assert_scale_clean, lint_plan


def _rules(df):
    return {f.rule for f in lint_plan(df) if f.severity == "warn"}


def test_cartesian_flagged_equi_join_clean(spark):
    a = spark.range(10).withColumnRenamed("id", "x")
    b = spark.range(10).withColumnRenamed("id", "y")
    assert "cartesian-product" in _rules(a.crossJoin(b))
    assert "cartesian-product" not in _rules(a.join(b, a["x"] == b["y"]))


def test_row_udf_flagged_builtin_and_arrow_clean(spark):
    from pyspark.sql.types import LongType

    df = spark.range(100)
    slow = F.udf(lambda v: v + 1, LongType(), useArrow=False)
    assert "python-row-udf" in _rules(df.select(slow("id")))
    assert _rules(df.select(F.col("id") + 1)) == set()


def test_global_window_flagged_grouped_window_clean(spark):
    from pyspark.sql.window import Window

    df = spark.range(100).select((F.col("id") % 7).alias("k"), "id")
    global_w = df.select(F.row_number().over(Window.partitionBy().orderBy("id")).alias("r"))
    assert "single-partition-exchange" in _rules(global_w)
    grouped = df.select(
        F.row_number().over(Window.partitionBy("k").orderBy("id")).alias("r")
    )
    assert "single-partition-exchange" not in _rules(grouped)


def test_unpushed_filter_flagged_pushable_clean(spark, tmp_path, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/customer.parquet")
    pushed = df.filter(F.col("c_acctbal") > 0).select("c_custkey")
    assert "unpushed-scan-filter" not in _rules(pushed)
    from pyspark.sql.types import BooleanType

    opaque = F.udf(lambda s: True, BooleanType(), useArrow=False)
    blocked = df.filter(opaque(F.col("c_name"))).select("c_custkey")
    assert "unpushed-scan-filter" in _rules(blocked)


def test_assert_scale_clean_raises_and_allows(spark):
    a = spark.range(5).withColumnRenamed("id", "x")
    b = spark.range(5).withColumnRenamed("id", "y")
    bad = a.crossJoin(b)
    with pytest.raises(AssertionError, match="cartesian-product"):
        assert_scale_clean(bad)
    assert_scale_clean(bad, allow={"cartesian-product"})  # scalar-attach escape hatch
    assert_scale_clean(a.join(b, a["x"] == b["y"]))


def test_catalog_flagships_are_scale_clean(spark, sf_dir):
    """The linter agrees with the hand-pinned plan tests on real queries."""
    from universal_aws_data_pipeline_spark.plans.catalog import QUERIES

    for name in ("q01_pricing_summary", "q04_region_revenue", "q15_neardup_minhash_lsh"):
        assert_scale_clean(
            QUERIES[name].fn(spark, sf_dir),
            # 1-row scalar reductions legitimately exchange to one partition
            allow={"single-partition-exchange"},
        )
