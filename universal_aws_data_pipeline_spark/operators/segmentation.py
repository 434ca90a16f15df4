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

Scale shape: RFM is one grouped rollup to |customers| rows, then quintile
assignment — and |customers| is NOT domain-bounded: TPC-H customers scale
linearly with SF, so a global ntile window (single-task sort) over the
rollup is the wrong plan at corpus scale (round-7 verdict, item 1). The
implementation is therefore SIZE-GATED, mirroring graph.py's hits_micro
gate: at or below ``ntile_max_rows`` rollup rows it keeps the exact
global-ntile windows (one tiny exchange, cheapest at dimension scale);
above the gate it switches to exact composite-boundary cuts found by
distributed quickselect (robust.py::exact_rank_long — bounded driver
state, no global sort) plus a map-side comparison against the
buckets−1 boundary literals. Both paths assign IDENTICAL buckets (the
(measure, customer-key) composite is a total order, so rank comparison ==
composite comparison; proven by tests/test_round8_ops.py). Cohort
retention is two grouped passes over (user, month) — map-side combinable,
matrix-bounded output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .robust import exact_rank_long


def _ntile_cum_ranks(n: int, buckets: int) -> list[int]:
    """Cumulative last-rank of each of the first buckets−1 ntile buckets
    over n rows: SQL-standard fill (first n mod k buckets get one extra)."""
    q, r = divmod(n, buckets)
    out, cum = [], 0
    for i in range(1, buckets):
        cum += q + (1 if i <= r else 0)
        out.append(cum)
    return out


def _composite_boundaries(
    d: DataFrame, ranks: list[int]
) -> list[tuple[int, int]]:
    """Exact (k, t) composite values at the given 1-based ascending ranks
    of d(k long, t long) ordered by (k, t) — t is unique (a customer key),
    so the composite is a total order. Two distributed quickselects plus
    one count per boundary; driver state stays O(4096) per round and no
    task ever holds the full value set (contrast: a global sort window
    funnels ALL rows through one task)."""
    out = []
    for rk in ranks:
        k = exact_rank_long(d, "k", rk)
        below = d.filter(F.col("k") < k).count()
        ties = d.filter(F.col("k") == k)
        t = exact_rank_long(ties, "t", rk - below)
        out.append((k, t))
    return out


def rfm_scores(
    orders: DataFrame,
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    buckets: int = 5,
    ntile_max_rows: int = 10_000_000,
) -> DataFrame:
    """Per-customer RFM quintiles: returns (cust_col, last_order_date,
    n_orders, total_cents, r_score, f_score, m_score, rfm) with scores in
    1..buckets (5 = most recent / most frequent / highest spend).

    ``ntile_max_rows`` gates the physical plan (see module docstring):
    rollups at or under it use exact global-ntile windows; larger rollups
    use the quickselect boundary path, which requires ``cust_col`` to be
    integer-castable (it is the tiebreak; TPC-H custkeys are). Assignments
    are identical on both paths. The rollup is localCheckpoint()ed either
    way: the gate needs its count, and the three windows / twelve
    boundary probes then rescan materialized rows instead of re-running
    the corpus aggregation."""
    base = orders.groupBy(cust_col).agg(
        F.max(date_col).alias("last_order_date"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.round(F.col(amount_col) * 100).cast("long")).alias("total_cents"),
    ).localCheckpoint(eager=True)
    n = base.count()
    # 5 = best: recency orders newest-first, frequency/monetary largest-first
    if n <= ntile_max_rows:
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
    else:
        # desc ntile order == ascending order of the NEGATED measure; the
        # composite (−measure, custkey) is a strict total order, so
        # bucket(row) = 1 + #{boundary composites < row composite} — a
        # pure map-side expression against 3×(buckets−1) literals.
        ranks = _ntile_cum_ranks(n, buckets)
        measures: list[tuple[str, Column]] = [
            ("r_score", -F.datediff(F.col("last_order_date"), F.lit("1970-01-01"))),
            ("f_score", -F.col("n_orders")),
            ("m_score", -F.col("total_cents")),
        ]
        scored = base
        for name, key in measures:
            kc = key.cast("long")
            tc = F.col(cust_col).cast("long")
            d = base.select(kc.alias("k"), tc.alias("t"))
            bucket: Column = F.lit(1)
            for bk, bt in _composite_boundaries(d, ranks):
                after = (kc > F.lit(bk)) | ((kc == F.lit(bk)) & (tc > F.lit(bt)))
                bucket = bucket + after.cast("int")
            scored = scored.withColumn(
                name, (buckets + 1 - bucket).cast("long")
            )
        scored = scored.select(
            F.col(cust_col),
            "last_order_date",
            "n_orders",
            "total_cents",
            "r_score",
            "f_score",
            "m_score",
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
