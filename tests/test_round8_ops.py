"""Round-8 verdict/advice closures.

1. VERDICT r7 item 1 — rfm_scores is size-gated: the exact global-ntile
   window path (dimension scale) and the quickselect composite-boundary
   path (corpus scale) must assign IDENTICAL quintiles, fill rule and
   custkey tiebreaks included.
2. Exemption audit follow-on — gini_micro's window-rank path and its
   two-phase stratified-prefix-count path must agree (Σ i·x is invariant
   across any rank assignment consistent with the value order).
3. ADVICE r7 — token_entropy must keep emitting a row for NULL text (the
   length-gate predicates both fail on a NULL size without the sentinel).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _rfm_rows(df):
    return sorted(
        (r["o_custkey"], r["r_score"], r["f_score"], r["m_score"], r["rfm"])
        for r in df.collect()
    )


def test_rfm_gated_path_matches_ntile_path(spark):
    from universal_aws_data_pipeline_spark.operators.segmentation import rfm_scores

    # 23 customers (not divisible by 5 — exercises the first-(n mod k)-
    # buckets-get-one-extra fill rule) with heavy ties in every measure:
    # n_orders collides across most customers, several share a last order
    # date, and two pairs share total_cents — so boundary ties are decided
    # by the custkey tiebreak on both paths.
    rows = []
    for c in range(1, 24):
        n_orders = 1 + (c % 3)  # only values 1..3 -> massive tie blocks
        for i in range(n_orders):
            rows.append(
                (
                    c,
                    f"2024-0{1 + (c % 4)}-15",  # 4 distinct dates
                    float(100 * (1 + (c % 5)) + (7 if i == 0 else 0)),
                )
            )
    orders = spark.createDataFrame(
        rows, "o_custkey: long, o_orderdate: string, o_totalprice: double"
    ).withColumn("o_orderdate", F.to_date("o_orderdate"))

    exact = rfm_scores(orders, ntile_max_rows=10**9)
    gated = rfm_scores(orders, ntile_max_rows=0)
    assert _rfm_rows(exact) == _rfm_rows(gated)


def test_rfm_gated_path_matches_on_fixture(spark, sf_dir):
    """Same agreement on the real sf0.001 orders table (1.5k customers,
    real date/value distributions)."""
    from universal_aws_data_pipeline_spark.operators.segmentation import rfm_scores

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exact = rfm_scores(orders, ntile_max_rows=10**9)
    gated = rfm_scores(orders, ntile_max_rows=0)
    assert _rfm_rows(exact) == _rfm_rows(gated)


def test_rfm_ntile_cum_ranks_fill_rule():
    from universal_aws_data_pipeline_spark.operators.segmentation import (
        _ntile_cum_ranks,
    )

    # 23 rows / 5 buckets: sizes 5,5,5,4,4 -> cumulative 5,10,15,19
    assert _ntile_cum_ranks(23, 5) == [5, 10, 15, 19]
    assert _ntile_cum_ranks(20, 5) == [4, 8, 12, 16]
    # n < buckets: first n buckets get one row each
    assert _ntile_cum_ranks(3, 5) == [1, 2, 3, 3]


def test_gini_gated_path_matches_window_path(spark):
    from universal_aws_data_pipeline_spark.operators.econ import gini_micro

    rows = []
    for g in ("a", "b"):
        for i in range(40):
            rows.append((g, (i % 7) * 10))  # tie blocks within each group
    rows.append(("c", 5))  # singleton group (gini 0)
    df = spark.createDataFrame(rows, "grp: string, v: long")

    window = {
        r["grp"]: (r["n"], r["total"], r["gini_micro"])
        for r in gini_micro(df, "grp", "v", window_max_rows=10**9).collect()
    }
    gated = {
        r["grp"]: (r["n"], r["total"], r["gini_micro"])
        for r in gini_micro(df, "grp", "v", window_max_rows=0).collect()
    }
    assert window == gated
    assert gated["c"] == (1, 5, 0)


def test_gini_drops_zero_total_groups(spark):
    from universal_aws_data_pipeline_spark.operators.econ import gini_micro

    df = spark.createDataFrame(
        [("z", 0), ("z", 0), ("a", 3), ("a", 1)], "grp: string, v: long"
    )
    got = {r["grp"] for r in gini_micro(df, "grp", "v").collect()}
    assert got == {"a"}


def test_token_entropy_null_text_emits_row(spark):
    from universal_aws_data_pipeline_spark.operators.text import token_entropy

    df = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, None), (3, "")],
        "doc_id: long, text: string",
    )
    got = {r["doc_id"]: r for r in token_entropy(df).collect()}
    assert set(got) == {1, 2, 3}, "null/empty text rows must not be dropped"
    assert got[2]["n_tokens"] is None and got[2]["entropy_nats"] is None
    assert got[1]["n_tokens"] == 3
