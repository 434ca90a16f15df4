"""Per-group time-series trend and dispersion statistics in exact integer
micro-units: OLS slope, Fano-factor burstiness, MASE forecast error.

These complement the existing stats family along the axes it lacks:
q174's Theil–Sen is ROBUST but one global series; ``ols_slope_micro`` is
the per-group least-squares twin (thousands of series in one grouped
pass). q151/q153 detect level changes; ``fano_micro`` scores over- vs
under-dispersion (burstiness) and ``mase_micro`` scores forecastability
against the seasonal-naive baseline — the triage trio for "which series
deserve a model".

Exactness: every statistic is spelled as integer sums + floor ``div`` so
DuckDB replays it bit-for-bit. Magnitude contracts are documented per
function; inputs beyond them need milli- instead of micro-units.

Scale shape: one map-side-combinable grouped aggregate each (plus a lag
window partitioned by group for MASE) over a |groups × days| daily table —
never over raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ols_slope_micro(
    daily: DataFrame,
    group_col: str,
    x_col: str = "d",
    y_col: str = "y",
) -> DataFrame:
    """Per-group least-squares slope in micro-units:
    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), floor(1e6 ·) via integer
    div. Returns (group_col, n_points, slope_micro); groups with a single
    point (zero variance in x) are dropped — their slope is undefined.

    int64-exact while 1e6 · n · Σxy < 2^63: with day indexes ≤ 4096 and
    |days| ≤ 4096 that allows y up to ~3e5 per day — pass COUNTS or
    milli-scaled values for heavier series (documented contract, same
    device as q115/q174).
    """
    agg = daily.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x_col).cast("long").alias("sx"),
        F.sum(y_col).cast("long").alias("sy"),
        F.sum(F.col(x_col).cast("long") * F.col(y_col)).cast("long").alias("sxy"),
        F.sum(F.col(x_col).cast("long") * F.col(x_col)).cast("long").alias("sxx"),
    )
    return agg.filter("n * sxx - sx * sx != 0").select(
        group_col,
        F.col("n").alias("n_points"),
        F.expr("(1000000 * (n * sxy - sx * sy)) div (n * sxx - sx * sx)").alias(
            "slope_micro"
        ),
    )


def fano_micro(
    daily: DataFrame,
    group_col: str,
    count_col: str = "c",
) -> DataFrame:
    """Per-group Fano factor (variance-to-mean ratio of the daily counts)
    as the pinned expression
    ``floor(1e6·Σc²/Σc) − floor(1e6·Σc/n)``  — algebraically
    var/mean · 1e6 up to the two floors (≤ 2 μ absolute error), chosen so
    every intermediate stays int64 for daily counts up to ~5e4 over a
     10-year window (1e6 · Σc² < 2^63). 1e6 = Poisson; above = bursty.

    Returns (group_col, n_days, total, fano_micro).
    """
    return (
        daily.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum(count_col).cast("long").alias("total"),
            F.sum(F.col(count_col).cast("long") * F.col(count_col))
            .cast("long")
            .alias("_ss"),
        )
        .filter("total > 0")
        .select(
            group_col,
            "n_days",
            "total",
            F.expr(
                "(1000000 * _ss) div total - (1000000 * total) div n_days"
            ).alias("fano_micro"),
        )
    )


def mase_micro(
    daily: DataFrame,
    group_col: str,
    day_col: str = "d",
    value_col: str = "v",
    season: int = 7,
) -> DataFrame:
    """Per-group MASE of the seasonal-naive forecast against the one-step
    naive scale: floor(1e6 · Σ|v_d − v_{d−season}| / Σ|v_d − v_{d−1}|)
    over lag pairs that exist on BOTH sides' windows (rows with a defined
    lag). < 1e6 means the weekly pattern predicts better than persistence
    — the series has exploitable seasonality.

    The day axis must be DENSE per group (one row per consecutive day
    index, zeros filled upstream) — lags are positional. One lag window
    per group partition; |groups|-row output.
    """
    w = Window.partitionBy(group_col).orderBy(day_col)
    lagged = daily.select(
        F.col(group_col),
        F.col(value_col).cast("long").alias("v"),
        F.lag(F.col(value_col).cast("long"), 1).over(w).alias("v1"),
        F.lag(F.col(value_col).cast("long"), season).over(w).alias("vs"),
    )
    return (
        lagged.filter(F.col("vs").isNotNull())
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_scored"),
            F.sum(F.abs(F.col("v") - F.col("vs"))).cast("long").alias("_es"),
            F.sum(F.abs(F.col("v") - F.col("v1"))).cast("long").alias("_e1"),
        )
        .filter("_e1 > 0")
        .select(
            group_col,
            "n_scored",
            F.expr("(1000000 * _es) div _e1").alias("mase_micro"),
        )
    )


def js_divergence(
    df: DataFrame,
    group_col: str,
    type_col: str,
) -> DataFrame:
    """Per-group Jensen–Shannon divergence (nats) between the group's
    categorical distribution P and the GLOBAL distribution Q over
    ``type_col`` — the bounded, symmetric drift score (0 ≤ JS ≤ ln 2) that
    complements PSI (q95/q170: unbounded, asymmetric, bin-fragile) for
    monitoring event-mix shift per period:

        JS(P,Q) = ½ Σ_t p ln(2p/(p+q)) + ½ Σ_t q ln(2q/(p+q))

    The sum runs over the FULL type domain (a type absent from the group
    contributes its q-term: missing mass IS drift). Float ln with a
    round(4) contract after the final sum — the source-KL discipline
    (q156), summed over a domain-bounded |types| so cross-engine float
    order is a last-bit concern only.

    Returns (group_col, n_events, js_nats). Scale: ONE map-side-combined
    rollup to |groups × types| cells — the only pass that touches the
    corpus — localCheckpoint()ed (tiny, domain-bounded) so the global
    |types| rollup, the per-group totals, and the corpus total N are all
    derived from the materialized cells instead of re-scanning the input
    (round-8 ADVICE: the old shape ran three separate corpus scans). N
    comes driver-side from one collect of the |types|-row rollup; the
    zero-cell grid is a cross join of two bounded tables.
    """
    cells = (
        df.groupBy(group_col, type_col)
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    gtot = cells.groupBy(type_col).agg(F.sum("c").cast("long").alias("gc"))
    per_g = cells.groupBy(group_col).agg(F.sum("c").alias("n_events"))
    n_all = sum(r["gc"] for r in gtot.collect())
    grid = per_g.crossJoin(F.broadcast(gtot))
    full = grid.join(cells, [group_col, type_col], "left").select(
        group_col,
        "n_events",
        F.coalesce(F.col("c"), F.lit(0)).cast("double").alias("c"),
        F.col("gc").cast("double").alias("gc"),
    )
    p = F.col("c") / F.col("n_events").cast("double")
    q = F.col("gc") / F.lit(float(n_all))
    m = (p + q) / F.lit(2.0)
    term = (
        F.when(p > 0, p * F.log(p / m) / F.lit(2.0)).otherwise(F.lit(0.0))
        + q * F.log(q / m) / F.lit(2.0)
    )
    return (
        full.groupBy(group_col, "n_events")
        .agg(F.round(F.sum(term), 4).alias("js_nats"))
        .select(group_col, F.col("n_events").cast("long"), "js_nats")
    )
