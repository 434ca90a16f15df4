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
    window_max_rows: int = 10_000_000,
) -> DataFrame:
    """Per-group Gini coefficient of non-negative integer ``value_col``
    in micro-units: G = (2*Σ(i*x_i) − (n+1)*Σx) / (n*Σx) with x ranked
    ascending (ties broken by the implicit rank order — deterministic
    because the ORDER BY carries value only and equal values contribute
    symmetrically: Σ(i*x) over a tie block is tie-order-invariant).

    SIZE-GATED rank plan (round-8 exemption audit): a per-group window
    sort puts each group's ENTIRE member set in one task — fine when the
    member table is small (the exchange moves little), but groups here
    are customers-per-nation, which scales linearly with corpus. At or
    under ``window_max_rows`` input rows the window path runs (cheapest
    at dimension scale); above it, ranks come from the two-phase
    stratified prefix count (sampling.py::stratified_prefix_sum, weight
    1): range-partition on (group, x) so a group SPANS many tasks,
    per-shard running counts, broadcast shard offsets. Both paths yield
    identical Gini because Σ(i*x) is invariant across any rank
    assignment consistent with the x order (tests/test_round8_ops.py).
    The gate counts the UN-checkpointed projection (the common
    dimension-scale case pays two cheap scans, never an eager blocking
    materialization — round-8 ADVICE); only the large path checkpoints,
    because the prefix-sum device then rescans materialized rows instead
    of re-running the caller's upstream plan.

    Returns (group_col, n, total, gini_micro). int64-exact while
    n * Σ(i*x) stays under 2^63 — with ranks ≤ n that is
    n² · max(x) ≲ 9e18, e.g. a million members at $10k total each.
    Groups whose total is 0 (all-zero values) are dropped — Gini is
    undefined there, and Spark's ``div`` would yield NULL while DuckDB's
    ``//`` raises, so emitting them could never oracle-match anyway.
    """
    d = df.select(F.col(group_col), F.col(value_col).alias("x"))
    if d.count() <= window_max_rows:
        w = Window.partitionBy(group_col).orderBy("x")
        ranked = d.withColumn("i", F.row_number().over(w))
    else:
        from .sampling import stratified_prefix_sum

        d = d.localCheckpoint(eager=True)
        ranked = stratified_prefix_sum(
            d.withColumn("_one", F.lit(1).cast("long")),
            strata_col=group_col,
            order_cols=[F.col("x")],
            weight_col="_one",
            out_col="_before",
        ).select(
            F.col(group_col), "x", (F.col("_before") + 1).cast("long").alias("i")
        )
    return (
        ranked.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("x").cast("long").alias("total"),
            F.sum(F.col("i").cast("long") * F.col("x")).cast("long").alias("_ix"),
        )
        .filter(F.col("total") > 0)
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

    Returns (market_col, n_members, hhi_micro). Markets with zero total
    are dropped (shares are undefined; see gini_micro's div-vs-// note).
    """
    per = df.groupBy(market_col, member_col).agg(
        F.sum(value_col).cast("long").alias("v")
    )
    tot = per.groupBy(market_col).agg(F.sum("v").alias("t")).filter(F.col("t") > 0)
    shares = per.join(tot, market_col).select(
        market_col, F.expr("(1000000 * v) div t").alias("s")
    )
    return shares.groupBy(market_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.expr("sum(s * s) div 1000000").alias("hhi_micro"),
    )
