"""Catalog chunk: q208–q210 (round-9).

Two exact, hash-gradable two-sample comparisons on the DECLARED cents grid
of ``events.value`` (2-dp currency — the same grid contract q145's round-9
redefinition rests on), filling the nonparametric gap in the drift/compare
family: q169 chi-square needs categorical cells, q95/q170 PSI needs chosen
bins and smoothing, q197 JS compares categorical mixes — none compares two
CONTINUOUS-measure samples distribution-free. q208 is the two-sample
Kolmogorov–Smirnov distance (max CDF gap), q209 the Mann–Whitney rank-sum
effect (AUC) — both computed from grid-bounded histograms in exact integer
micro-units, never from ranked raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from universal_aws_data_pipeline_spark.plans._shared import (
    _t,
    register,
)

# --------------------------------------------------------------------------
# q208 — per-type Kolmogorov–Smirnov drift (A/STR-support family): for each
# event type, the exact two-sample KS distance between the type's value
# distribution and the REST of the corpus — "which event type's spend
# profile deviates most", distribution-free (no bins to choose, unlike
# PSI/chi-square). D = max over the value grid of |F_type(v) − F_rest(v)|,
# reported in floor-micro units.
# Operators: one map-side-combined rollup to (type, cents) cells, a
# |grid|-row global rollup, the |types| × |grid| zero-cell grid (cross join
# of two DOMAIN-BOUNDED tables — the q197 adjudicated scalar/grid-attach
# class), cumulative windows PARTITIONED BY TYPE over the bounded cell
# table, one max per type. DEVICE PRECONDITION (q196-style): the histogram
# is |distinct cents| per type, bounded by the declared 2-dp PRICE GRID
# (value spans ~0..500 ⇒ ≤ ~5×10⁴ cells/type at ANY sf), never by rows.
# int64-exact while 10⁶·n < 2⁶³ (n ≤ ~9×10¹² rows — documented magnitude
# contract, the gini_micro pattern; ANSI mode fails loudly beyond).
# Oracle: identical histogram-CDF walk; DuckDB's HUGEINT window sums are
# cast back to BIGINT at the exact same floor-div boundaries.
# --------------------------------------------------------------------------
@register(
    "q208_ks_type_drift",
    """
    WITH e AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
    ), h AS (
      SELECT event_type, cents, CAST(count(*) AS BIGINT) AS c
      FROM e GROUP BY event_type, cents
    ), g AS (
      SELECT cents, CAST(sum(c) AS BIGINT) AS gc FROM h GROUP BY cents
    ), tt AS (
      SELECT event_type, CAST(sum(c) AS BIGINT) AS n_type FROM h GROUP BY event_type
    ), tot AS (
      SELECT CAST(sum(gc) AS BIGINT) AS na FROM g
    ), grid AS (
      SELECT tt.event_type, tt.n_type, g.cents, g.gc,
             CAST(coalesce(h.c, 0) AS BIGINT) AS c
      FROM tt CROSS JOIN g
      LEFT JOIN h ON h.event_type = tt.event_type AND h.cents = g.cents
    ), cum AS (
      SELECT event_type, n_type, cents,
             CAST(sum(c) OVER (PARTITION BY event_type ORDER BY cents) AS BIGINT) AS ct,
             CAST(sum(gc) OVER (PARTITION BY event_type ORDER BY cents) AS BIGINT) AS cg
      FROM grid
    )
    SELECT event_type,
           n_type,
           CAST(na - n_type AS BIGINT) AS n_rest,
           CAST(max(abs((1000000 * ct) // n_type
                        - (1000000 * (cg - ct)) // (na - n_type))) AS BIGINT)
             AS ks_micro
    FROM cum CROSS JOIN tot
    WHERE na - n_type > 0
    GROUP BY event_type, n_type, na
    """,
    "per-type two-sample Kolmogorov-Smirnov drift on the declared cents grid: exact max CDF gap (floor-micro) between each event type's value distribution and the rest of the corpus, from grid-bounded histograms — the distribution-free complement of PSI/chi-square (A-family)",
)
def q208(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which event type's spend distribution is unlike the others'? The
    exact two-sample KS statistic needs only the two empirical CDFs, and
    on a declared value grid both live in ONE histogram: corpus volume
    touches a single map-side-combined (type, cents) rollup; the CDF walk
    and the max run over the grid-bounded cell table (cumulative window
    partitioned by type — each partition ≤ |grid| rows by the device
    precondition, never by data volume). Floor-div micro units both
    engines replay bit-identically."""
    e = _t(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    h = e.groupBy("event_type", "cents").agg(F.count(F.lit(1)).cast("long").alias("c"))
    g = h.groupBy("cents").agg(F.sum("c").cast("long").alias("gc"))
    tt = h.groupBy("event_type").agg(F.sum("c").cast("long").alias("n_type"))
    tot = g.agg(F.sum("gc").cast("long").alias("na"))
    grid = (
        tt.crossJoin(F.broadcast(g))
        .join(h, ["event_type", "cents"], "left")
        .select(
            "event_type",
            "n_type",
            "cents",
            "gc",
            F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("c"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = grid.select(
        "event_type",
        "n_type",
        F.sum("c").over(w).cast("long").alias("ct"),
        F.sum("gc").over(w).cast("long").alias("cg"),
    )
    d = F.expr(
        "abs((1000000 * ct) div n_type - (1000000 * (cg - ct)) div (na - n_type))"
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("na") - F.col("n_type") > 0)
        .groupBy("event_type", "n_type", (F.col("na") - F.col("n_type")).alias("n_rest"))
        .agg(F.max(d).cast("long").alias("ks_micro"))
        .select("event_type", "n_type", F.col("n_rest").cast("long"), "ks_micro")
    )


# --------------------------------------------------------------------------
# q209 — Mann–Whitney funnel-value effect (analytics family): do purchase
# events carry larger values than view events, and by how much? The
# rank-sum U statistic, reported as the doubled integer U (2·U, exact —
# halves from ties never appear) and the AUC effect size
# P(view < purchase) + ½·P(tie) in floor-micro units: 500000 = no effect,
# 1e6 = every purchase exceeds every view. Nonparametric — no normality
# assumption, unlike q186's z-test.
# Operators: one filtered map-side-combined rollup to the shared cents
# grid (n_view/n_purchase per cell via conditional sums), ONE cumulative
# window over the grid-bounded cell table (global, adjudicated — the
# table is ≤ |grid| rows by the cents-grid precondition), a 1-row
# reduction. U = Σ_v np(v)·(2·cum_view_before(v) + nv(v)) is pure int64,
# and the BINDING bound is the 10⁶·u_doubled multiply in auc_micro:
# u_doubled ≤ 2·n_view·n_purchase, so the query is exact while
# n_view·n_purchase < ~4.6×10¹² (~2×10⁶ rows per side balanced — documented
# magnitude contract; ANSI mode fails loudly beyond, subsample per side or
# compute the AUC from per-side hash samples above it).
# Oracle: identical grid walk; DuckDB HUGEINT sums cast at the same
# boundaries.
# --------------------------------------------------------------------------
@register(
    "q209_mann_whitney",
    """
    WITH e AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type IN ('view', 'purchase')
    ), h AS (
      SELECT cents,
             CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS nv,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS np
      FROM e GROUP BY cents
    ), cum AS (
      SELECT nv, np,
             CAST(coalesce(sum(nv) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cvb
      FROM h
    ), agg AS (
      SELECT CAST(sum(nv) AS BIGINT) AS n_view,
             CAST(sum(np) AS BIGINT) AS n_purchase,
             CAST(sum(np * (2 * cvb + nv)) AS BIGINT) AS u_doubled
      FROM cum
    )
    SELECT n_view, n_purchase, u_doubled,
           CAST((1000000 * u_doubled) // (2 * n_view * n_purchase) AS BIGINT)
             AS auc_micro
    FROM agg
    WHERE n_view > 0 AND n_purchase > 0
    """,
    "Mann-Whitney rank-sum effect between view and purchase values on the declared cents grid: exact doubled-U and floor-micro AUC (P(view<purchase)+half-ties) from one grid-bounded histogram — the nonparametric complement of the q186 z-test (analytics family)",
)
def q209(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Are purchases bigger than views, distribution-free? U needs, for
    every purchase value, the count of smaller view values plus half the
    ties — which is ONE prefix sum over the shared value histogram, never
    a rank over raw rows: corpus volume touches a single conditional
    rollup to the cents grid; the walk and the 1-row reduction run on the
    grid-bounded table (adjudicated global window/exchange — sketch-sized
    by the device precondition). A one-sided corpus (zero views or zero
    purchases) makes the AUC divisor 0 — Spark's div yields NULL where
    DuckDB's // raises, so BOTH sides filter the degenerate case to zero
    rows (the gini_micro convention; round-9 ADVICE)."""
    e = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    ).select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    h = e.groupBy("cents").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long")
        .alias("nv"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("np"),
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    cum = h.select(
        "nv",
        "np",
        F.coalesce(F.sum("nv").over(w), F.lit(0)).cast("long").alias("cvb"),
    )
    agg = cum.agg(
        F.sum("nv").cast("long").alias("n_view"),
        F.sum("np").cast("long").alias("n_purchase"),
        F.sum(F.col("np") * (2 * F.col("cvb") + F.col("nv")))
        .cast("long")
        .alias("u_doubled"),
    )
    return (
        agg.filter((F.col("n_view") > 0) & (F.col("n_purchase") > 0))
        .select(
            "n_view",
            "n_purchase",
            "u_doubled",
            F.expr("(1000000 * u_doubled) div (2 * n_view * n_purchase)")
            .cast("long")
            .alias("auc_micro"),
        )
    )


# --------------------------------------------------------------------------
# q210 — watermark-loss tradeoff curve (STR-support family): q146 measures
# how disordered the stream IS (p95/max backward jump); this measures what
# each CANDIDATE watermark delay would COST — per event type and delay D ∈
# {1 m, 1 h, 6 h, 24 h}, the share of events arriving more than D behind
# the user's running event-time high-water mark (the per-key lateness that
# drives dropped state in per-user stateful aggregations). Read the two
# together: pick the smallest D whose loss is acceptable. Same
# deterministic 6-hour late-feed perturbation as q146 (every 37th event),
# so the curve has real structure: D < 6 h shows losses, D = 24 h is 0.
# Operators: one per-user running-max window (arrival order = event_id,
# the q27/q146 family — partition key scales with |users|, parallel), ONE
# map-side-combinable conditional rollup to |types| wide rows, and a
# stack() unpivot to |types × 4| cells — never an explode multiplying the
# corpus. All integer micro units (timestampdiff MICROSECOND; floor-div
# loss shares).
# Oracle: identical window + conditional sums; UNION ALL unpivot.
# --------------------------------------------------------------------------
_Q210_DELAYS_S = [60, 3600, 21600, 86400]


@register(
    "q210_watermark_loss_curve",
    f"""
    WITH late AS (
      SELECT event_type, user_id, event_id,
             CASE WHEN event_id % 37 = 0 THEN ts - INTERVAL 6 HOUR
                  ELSE ts END AS ts
      FROM events
    ), o AS (
      SELECT event_type,
             datediff('microsecond', ts,
               max(ts) OVER (PARTITION BY user_id ORDER BY event_id)) AS late_us
      FROM late
    ), g AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             {", ".join(f"CAST(sum(CASE WHEN late_us > CAST({d} AS BIGINT) * 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS n{d}" for d in _Q210_DELAYS_S)}
      FROM o GROUP BY event_type
    ), u AS (
      {" UNION ALL ".join(f"SELECT event_type, CAST({d} AS BIGINT) AS delay_s, n_events, n{d} AS n_late FROM g" for d in _Q210_DELAYS_S)}
    )
    SELECT event_type, delay_s, n_events, n_late,
           CAST((1000000 * n_late) // n_events AS BIGINT) AS loss_micro
    FROM u
    """,
    "watermark-loss tradeoff curve: per event type and candidate delay (1m/1h/6h/24h), the exact floor-micro share of events arriving later than the delay behind the user's running event-time high-water mark — the cost side of q146's disorder measurement (STR-support family)",
)
def q210(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What would each watermark delay actually drop? Lateness is measured
    against the per-user running event-time max in arrival order (the
    per-key disorder that costs state in per-user stateful aggs); the four
    candidate delays are answered by ONE conditional rollup over the
    window output (wide counts, then a stack() unpivot of the |types|-row
    table — the corpus is never multiplied). Exact integers end to end."""
    e = _t(spark, sf_dir, "events").withColumn(
        "ts",
        F.when(
            F.col("event_id") % 37 == 0, F.col("ts") - F.expr("INTERVAL 6 HOUR")
        ).otherwise(F.col("ts")),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    o = (
        e.select("event_type", "ts", F.max("ts").over(w).alias("hwm"))
        .select(
            "event_type",
            F.expr("timestampdiff(MICROSECOND, ts, hwm)").alias("late_us"),
        )
    )
    g = o.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        *[
            F.sum((F.col("late_us") > d * 1_000_000).cast("int"))
            .cast("long")
            .alias(f"n{d}")
            for d in _Q210_DELAYS_S
        ],
    )
    stack = ", ".join(f"{d}L, n{d}" for d in _Q210_DELAYS_S)
    return g.select(
        "event_type",
        "n_events",
        F.expr(f"stack({len(_Q210_DELAYS_S)}, {stack}) as (delay_s, n_late)"),
    ).select(
        "event_type",
        F.col("delay_s").cast("long"),
        "n_events",
        F.col("n_late").cast("long"),
        F.expr("(1000000 * n_late) div n_events").cast("long").alias("loss_micro"),
    )
