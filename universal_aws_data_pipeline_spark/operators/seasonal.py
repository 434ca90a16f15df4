"""Day-of-week seasonal decomposition in exact integer arithmetic.

The first question asked of any business time series — "is Monday really
down, or is that just the weekly shape?" — answered as a seasonal-index
table: per weekday, the mean daily value and its ratio to the global
daily mean. The classical-decomposition seasonal component at weekly
period, restricted to the mean estimator so the whole computation stays
in exact int64 (the q115/q150 integer-micro device): cents sums are
exact, means are floor divisions, and the index is
floor(1e6 * dow_mean / global_mean) — bit-identical across engines,
hash-gradable.

Scale shape: one map-side-combinable rollup to |days| rows, then a
|7|-row aggregate; the global mean rides a 1-row broadcast. Corpus volume
touches only the first rollup — at 100 TB this is a scan + two tiny aggs.
Overflow: the index numerator is 1e6 * PER-DAY mean (not the weekday sum),
so it is bounded by daily volume whatever the history length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def dow_seasonal_index(
    df: DataFrame,
    ts_col: str,
    value_cents: F.Column,
) -> DataFrame:
    """(weekday 1=Mon..7=Sun, n_days, mean_cents, seasonal_micro) from a
    fact table: daily cents rollup -> weekday means -> index vs the global
    daily mean. ``value_cents`` must be an exact integer column expression
    (e.g. round(price*100) cast long)."""
    daily = (
        df.select(F.to_date(F.col(ts_col)).alias("d"), value_cents.alias("cents"))
        .groupBy("d")
        .agg(F.sum("cents").alias("cents"))
    )
    dow = daily.groupBy(F.expr("cast(weekday(d) + 1 as bigint)").alias("weekday")).agg(
        F.sum("cents").alias("sw"), F.count(F.lit(1)).alias("nw")
    )
    total = daily.agg(F.sum("cents").alias("st"), F.count(F.lit(1)).alias("nt"))
    return (
        dow.join(F.broadcast(total))  # 1-row scalar attach
        .select(
            "weekday",
            F.col("nw").cast("long").alias("n_days"),
            F.expr("sw div nw").alias("mean_cents"),
            F.expr(f"({MICRO} * (sw div nw)) div (st div nt)").alias("seasonal_micro"),
        )
    )
