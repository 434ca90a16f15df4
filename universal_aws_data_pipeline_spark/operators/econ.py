"""Concentration statistics: Gini coefficient and Herfindahl–Hirschman
index, in exact integer micro-units.

Both are single-number audits a pipeline owner runs over the cleaned marts
(revenue concentration per market, supplier concentration per part) and
both are textbook float formulas that hash-grade only if every division is
pinned — the module keeps the repo's integer-micro-unit discipline
(floor ``div``, documented magnitude bounds) so DuckDB replays each value
bit-for-bit.

Scale shape: Gini needs the values RANKED within each group — a
``row_number`` window PARTITIONED by the group, so parallelism is the
group count and no global sort exists. HHI is two grouped aggregates and
one dimension join. Outputs are |groups|-row tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gini_micro(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Per-group Gini coefficient of non-negative integer ``value_col``
    in micro-units: G = (2*Σ(i*x_i) − (n+1)*Σx) / (n*Σx) with x ranked
    ascending (ties broken by the implicit rank order — deterministic
    because the ORDER BY carries value only and equal values contribute
    symmetrically: Σ(i*x) over a tie block is tie-order-invariant).

    Returns (group_col, n, total, gini_micro). int64-exact while
    n * Σ(i*x) stays under 2^63 — with ranks ≤ n that is
    n² · max(x) ≲ 9e18, e.g. a million members at $10k total each.
    """
    w = Window.partitionBy(group_col).orderBy("x")
    ranked = df.select(
        F.col(group_col), F.col(value_col).alias("x")
    ).withColumn("i", F.row_number().over(w))
    return (
        ranked.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("total"),
            F.sum(F.col("i").cast("long") * F.col("x")).cast("long").alias("_ix"),
        )
        .select(
            group_col,
            "n",
            "total",
            F.expr(
                "(1000000 * (2 * _ix - (n + 1) * total)) div (n * total)"
            ).alias("gini_micro"),
        )
    )


def hhi_micro(
    df: DataFrame,
    market_col: str,
    member_col: str,
    value_col: str,
) -> DataFrame:
    """Per-market Herfindahl–Hirschman index: each member's share in
    micro-units (floor(1e6 * v / total)), HHI = Σ share² div 1e6 — so the
    result is again micro-scaled (1e6 = monopoly). Floor-of-share before
    squaring is part of the contract (both engines replay it identically);
    the bias is < |members| ppm.

    Returns (market_col, n_members, hhi_micro).
    """
    per = df.groupBy(market_col, member_col).agg(
        F.sum(value_col).cast("long").alias("v")
    )
    tot = per.groupBy(market_col).agg(F.sum("v").alias("t"))
    shares = per.join(tot, market_col).select(
        market_col, F.expr("(1000000 * v) div t").alias("s")
    )
    return shares.groupBy(market_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.expr("sum(s * s) div 1000000").alias("hhi_micro"),
    )
