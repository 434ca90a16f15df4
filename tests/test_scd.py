"""SCD type-2 merge unit tests."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from universal_aws_data_pipeline_spark.operators.scd import scd2_apply

DIM_SCHEMA = "k: long, attr: string, city: string, valid_from: date, valid_to: date, is_current: boolean"
D0 = dt.date(2020, 1, 1)
EFF = dt.date(2024, 6, 1)


def _dim(spark, rows):
    return spark.createDataFrame(rows, DIM_SCHEMA)


def _upd(spark, rows):
    return spark.createDataFrame(rows, "k: long, attr: string, eff: date")


def test_change_closes_and_opens(spark):
    dim = _dim(spark, [(1, "a", "rome", D0, None, True)])
    out = scd2_apply(dim, _upd(spark, [(1, "b", EFF)]), "k", ["attr"], "eff").collect()
    rows = sorted(((r["attr"], r["valid_from"], r["valid_to"], r["is_current"]) for r in out))
    assert rows == [("a", D0, EFF, False), ("b", EFF, None, True)]
    # untracked attribute carries forward onto the new version
    assert {r["city"] for r in out} == {"rome"}


def test_noop_update_and_unmatched_pass_through(spark):
    dim = _dim(spark, [(1, "a", "rome", D0, None, True), (2, "x", "oslo", D0, None, True)])
    out = scd2_apply(dim, _upd(spark, [(1, "a", EFF)]), "k", ["attr"], "eff").collect()
    assert len(out) == 2
    assert all(r["is_current"] and r["valid_to"] is None for r in out)


def test_history_rows_untouched(spark):
    dim = _dim(
        spark,
        [(1, "old", "rome", dt.date(2019, 1, 1), D0, False), (1, "a", "rome", D0, None, True)],
    )
    out = scd2_apply(dim, _upd(spark, [(1, "b", EFF)]), "k", ["attr"], "eff")
    hist = out.filter(F.col("valid_from") == dt.date(2019, 1, 1)).collect()
    assert len(hist) == 1 and hist[0]["valid_to"] == D0 and not hist[0]["is_current"]
    assert out.count() == 3


def test_null_safe_compare(spark):
    # NULL -> value is a change; NULL -> NULL is not
    dim = _dim(spark, [(1, None, "rome", D0, None, True), (2, None, "oslo", D0, None, True)])
    out = scd2_apply(dim, _upd(spark, [(1, "v", EFF), (2, None, EFF)]), "k", ["attr"], "eff")
    assert out.filter(F.col("k") == 1).count() == 2
    assert out.filter(F.col("k") == 2).count() == 1
