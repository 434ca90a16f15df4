"""Customer-value segmentation: RFM quintile scores and cohort retention.

The two canonical warehouse rollups a marketing/analytics consumer of the
reference pipeline (README.md:49 "business-ready data marts") builds on
top of the cleaned order/event tables:

* RFM — per-customer Recency/Frequency/Monetary quintiles via ``ntile``
  windows. Determinism contract: every ntile ORDER BY carries the customer
  key as the final tiebreak (fixture keys are not unique in any metric),
  so both engines assign identical quintile boundaries; ntile's
  first-(n mod k)-buckets-get-one-extra fill rule is the SQL-standard one
  DuckDB and Spark share.
* cohort retention — users bucketed by their first active period (an
  integer period index the caller derives: day/week/month); the
  (cohort, period-offset) matrix of distinct active users with the
  retention ratio in exact micro-units (floor div by the cohort's size).

Scale shape: RFM is one grouped rollup to |customers| rows, then three
global ntile windows — a global window is a single-partition exchange on a
DIMENSION-sized table (same adjudicated class as the q48 percentile
device); at true corpus scale swap ntile for the histogram-sketch quantile
cuts (q159) and a broadcast range join. Cohort retention is two grouped
passes over (user, month) — map-side combinable, matrix-bounded output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rfm_scores(
    orders: DataFrame,
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    buckets: int = 5,
) -> DataFrame:
    """Per-customer RFM quintiles: returns (cust_col, last_order_date,
    n_orders, total_cents, r_score, f_score, m_score, rfm) with scores in
    1..buckets (5 = most recent / most frequent / highest spend)."""
    base = orders.groupBy(cust_col).agg(
        F.max(date_col).alias("last_order_date"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.round(F.col(amount_col) * 100).cast("long")).alias("total_cents"),
    )
    # 5 = best: recency orders newest-first, frequency/monetary largest-first
    r_w = Window.orderBy(F.col("last_order_date").desc(), F.col(cust_col))
    f_w = Window.orderBy(F.col("n_orders").desc(), F.col(cust_col))
    m_w = Window.orderBy(F.col("total_cents").desc(), F.col(cust_col))
    scored = base.select(
        F.col(cust_col),
        "last_order_date",
        "n_orders",
        "total_cents",
        (buckets + 1 - F.ntile(buckets).over(r_w)).cast("long").alias("r_score"),
        (buckets + 1 - F.ntile(buckets).over(f_w)).cast("long").alias("f_score"),
        (buckets + 1 - F.ntile(buckets).over(m_w)).cast("long").alias("m_score"),
    )
    return scored.withColumn(
        "rfm",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    period_col: str = "period",
) -> DataFrame:
    """Cohort retention matrix over an INTEGER period index (the caller
    derives it — epoch-week ``floor(epoch/604800)``, month ``year*12+month``,
    day … — so the same operator serves any cadence): users are bucketed by
    their first active period, and each (cohort_period, period_offset) cell
    counts the cohort's users active that many periods later, with
    retention_micro = floor(1e6 * n_active / cohort_size).

    All arithmetic is integer (period indexes, exact distinct counts, one
    floor div) — hash-gradable. Scale: one distinct (user, period)
    projection (the only corpus-sized shuffle), a per-user min, and two
    matrix-bounded grouped joins.
    """
    um = events.select(
        F.col(user_col).alias("u"),
        F.col(period_col).cast("long").alias("m"),
    ).distinct()
    first = um.groupBy("u").agg(F.min("m").alias("m0"))
    joined = um.join(first, "u")
    matrix = joined.groupBy(
        "m0", (F.col("m") - F.col("m0")).alias("period_offset")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    size = first.groupBy("m0").agg(F.count(F.lit(1)).cast("long").alias("cohort_size"))
    return (
        matrix.join(size, "m0")
        .select(
            F.col("m0").alias("cohort_period"),
            F.col("period_offset").cast("long"),
            "n_active",
            "cohort_size",
            F.expr("(1000000 * n_active) div cohort_size").alias("retention_micro"),
        )
    )
