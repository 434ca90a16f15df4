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


def test_scd2_stream_fn_merges_batches_latest_wins_and_replays_noop(spark, tmp_path):
    from universal_aws_data_pipeline_spark.operators.scd import scd2_stream_fn

    dim_path = str(tmp_path / "dim")
    spark.createDataFrame(
        [(1, "NY", "2024-01-01", None, True), (2, "LA", "2024-01-01", None, True)],
        "cust_id LONG, city STRING, valid_from STRING, valid_to STRING, is_current BOOLEAN",
    ).write.parquet(dim_path)

    fn = scd2_stream_fn(dim_path, key="cust_id", tracked=["city"], effective="eff")
    # batch 0: change customer 1
    fn(spark.createDataFrame([(1, "SF", "2024-02-01")], "cust_id LONG, city STRING, eff STRING"), 0)
    # batch 1: two same-key updates - the later effective date must win
    fn(
        spark.createDataFrame(
            [(2, "SEA", "2024-03-01"), (2, "PDX", "2024-03-15")],
            "cust_id LONG, city STRING, eff STRING",
        ),
        1,
    )
    dim = spark.read.parquet(dim_path)
    cur = {r["cust_id"]: r for r in dim.filter("is_current").collect()}
    assert cur[1]["city"] == "SF" and cur[1]["valid_from"] == "2024-02-01"
    assert cur[2]["city"] == "PDX" and cur[2]["valid_from"] == "2024-03-15"
    closed = {(r["cust_id"], r["city"], r["valid_to"]) for r in dim.filter("NOT is_current").collect()}
    assert closed == {(1, "NY", "2024-02-01"), (2, "LA", "2024-03-15")}

    # replay batch 1: dimension must be unchanged
    before = sorted(map(tuple, dim.collect()))
    fn(
        spark.createDataFrame(
            [(2, "SEA", "2024-03-01"), (2, "PDX", "2024-03-15")],
            "cust_id LONG, city STRING, eff STRING",
        ),
        1,
    )
    assert sorted(map(tuple, spark.read.parquet(dim_path).collect())) == before
