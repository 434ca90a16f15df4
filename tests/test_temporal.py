"""Direct contracts for the temporal join operators (q40/q41 exercise them
end-to-end against DuckDB oracles; these pin the per-function semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from universal_aws_data_pipeline_spark.operators.temporal import asof_join, range_join_pairs


def _left(spark):
    return spark.createDataFrame(
        [(1, 100, "p1"), (1, 205, "p2"), (2, 50, "p3")],
        "user_id long, es long, name string",
    )


def _right(spark):
    return spark.createDataFrame(
        [(1, 90, 900), (1, 100, 1000), (1, 200, 2000), (3, 10, 30)],
        "user_id long, es long, rid long",
    )


def test_asof_join_picks_latest_prior_inclusive(spark):
    out = {
        r["name"]: (r["rid_r"], r["es_r"])
        for r in asof_join(
            _left(spark), _right(spark), on=["user_id"], left_ts="es", right_ts="es", right_cols=["rid"]
        ).collect()
    }
    assert out["p1"] == (1000, 100)  # exact-ts match wins (inclusive)
    assert out["p2"] == (2000, 200)  # latest prior
    assert out["p3"] == (None, None)  # no right rows for user 2 -> left join nulls


def test_asof_join_strict_excludes_exact_ts(spark):
    out = {
        r["name"]: r["rid_r"]
        for r in asof_join(
            _left(spark), _right(spark), on=["user_id"], left_ts="es", right_ts="es",
            right_cols=["rid"], allow_exact_matches=False,
        ).collect()
    }
    assert out["p1"] == 900  # es=100 right row no longer eligible


def test_asof_join_no_join_in_plan(spark):
    """The whole point: as-of compiles to window-over-union — NO join node
    (an inequality join would plan BroadcastNestedLoopJoin: quadratic)."""
    plan = (
        asof_join(_left(spark), _right(spark), on=["user_id"], left_ts="es", right_ts="es", right_cols=["rid"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert "Window" in plan


def test_range_join_pairs_boundaries(spark):
    left = spark.createDataFrame([(1, 1000, 7)], "user_id long, es long, lid long")
    right = spark.createDataFrame(
        [(1, 399, 1), (1, 400, 2), (1, 999, 3), (1, 1000, 4), (2, 500, 5)],
        "user_id long, es long, rid long",
    )
    # window [es - 600, es): 400..999 inclusive-exclusive
    pairs = range_join_pairs(left, right, on=["user_id"], left_epoch="es", right_epoch="es", lower=-600, upper=0)
    assert sorted(r["rid_r"] for r in pairs.collect()) == [2, 3]


def test_range_join_no_nested_loop(spark):
    left = spark.createDataFrame([(1, 1000, 7)], "user_id long, es long, lid long")
    right = spark.createDataFrame([(1, 999, 3)], "user_id long, es long, rid long")
    plan = (
        range_join_pairs(left, right, on=["user_id"], left_epoch="es", right_epoch="es", lower=-600, upper=0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
