"""Catalog chunk: q211–q212 (round-10).

Two graded composites over the round-10 engine work: q211 runs Theil–Sen
PER GROUP through the grouped-histogram selection engine
(``robust.exact_ranks_grouped`` — all group medians share one refinement
loop, scan cost flat in |groups|), and q212 is the BATCH form of the
streaming drift-trio monitor (PSI + JS + KS between the two calendar
halves of the corpus, all three legs from ONE histogram — the same
``operators/drift.py`` cell functions the foreachBatch monitor composes,
graded here against a full SQL oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from universal_aws_data_pipeline_spark.plans._shared import (
    _t,
    register,
)

# --------------------------------------------------------------------------
# q211 — per-type Theil–Sen value trend (stats family): q174 answers "is
# revenue trending" for ONE series; this answers it for EVERY event type at
# once — the robust slope of each type's daily value, promo-spike-proof
# where per-type OLS is not. Slopes in exact integer micro-cents/day via
# floor div; each median is an integer order statistic (lower median).
# Operators: one daily rollup (corpus volume touches only this), a
# within-group pair self-join bounded by |days|² PER TYPE (calendar-
# bounded, the q174 adjudication, ×|types| groups), and ONE shared
# exact_ranks_grouped refinement loop selecting ALL type medians together
# (round-10 engine: literal-map rounds, scan cost flat in |groups| —
# never |groups| sequential driver loops, never a percentile aggregate's
# single-task value buffer).
# Oracle: identical grid; DuckDB percentile_disc(0.5) is the same lower
# median (the q174 convention).
# --------------------------------------------------------------------------


@register(
    "q211_type_trend",
    """
    WITH daily AS (
      SELECT event_type,
             CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS d,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ), slopes AS (
      SELECT a.event_type,
             (1000000 * (b.cents - a.cents)) // (b.d - a.d) AS s
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.d < b.d
    ), nd AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_points
      FROM daily GROUP BY 1
    )
    SELECT s.event_type,
           CAST(max(nd.n_points) AS BIGINT) AS n_points,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY s.s) AS BIGINT)
             AS slope_micro
    FROM slopes s JOIN nd ON nd.event_type = s.event_type
    GROUP BY s.event_type
    """,
    "per-type Theil-Sen robust trend: exact-integer lower-median pairwise daily slope (micro-cents/day) for every event type, all medians selected in ONE shared grouped-quickselect loop — the grouped form of q174 (stats family)",
)
def q211(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which event types are trending up — robustly, all at once: per-type
    median pairwise slope. The pair space is |days|² per type (calendar-
    bounded at any corpus size); every type's median comes out of ONE
    shared refinement loop (`robust.theil_sen_micro_grouped` →
    `exact_ranks_grouped`: one constant-folded literal map per round, each
    row pays a single hash lookup for its own type's targets — scan cost
    flat in |types|, bounded driver state, never percentile_disc's
    single-merge-task value buffer)."""
    from universal_aws_data_pipeline_spark.operators.robust import (
        theil_sen_micro_grouped,
    )

    e = _t(spark, sf_dir, "events")
    daily = (
        e.select(
            "event_type",
            F.unix_date(F.col("ts").cast("date")).cast("long").alias("d"),
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        .groupBy("event_type", "d")
        .agg(F.sum("cents").cast("long").alias("cents"))
    )
    return theil_sen_micro_grouped(daily, "event_type").select(
        "event_type", "n_points", "n_pairs", "slope_micro"
    )


# --------------------------------------------------------------------------
# q212 — drift-trio audit (A/STR-support family): did each event type's
# value distribution move between the first and second half of the
# calendar? ALL THREE drift legs — PSI (sensitive, smoothing-dependent),
# JS (bounded, smoothing-free), KS (distribution-free max CDF gap) — from
# ONE histogram: the batch twin of `drift_trio_monitor_batch_fn`, built
# from the SAME `operators/drift.py` cell functions and graded here
# against a full SQL oracle (the streaming monitor's math is therefore
# oracle-checked, not just unit-tested).
# Operators: one conditional map-side-combined rollup to |types|×10 fixed
# value bins (corpus volume touches only this scan; the calendar midpoint
# attaches as a broadcast 1-row scalar — the adjudicated scalar-attach
# class), then the three metric computations run on the checkpointed cell
# table. PSI/JS follow the ln-sum round(4) contract (q95/q197 precedent:
# cross-engine libm last-ulp noise cannot surface); KS is exact integer
# floor-micro.
# Oracle: identical cells; identical smoothing (+0.5/cell, +5 total),
# identical JS halves, identical cumulative floor-div walk.
# --------------------------------------------------------------------------


@register(
    "q212_drift_trio_audit",
    """
    WITH e AS (
      SELECT event_type,
             CAST(least(9, greatest(0, CAST(floor(value / 50.0) AS BIGINT))) AS BIGINT) AS bin,
             CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS d
      FROM events
    ), mm AS (
      SELECT (min(d) + max(d)) // 2 AS mid FROM e
    ), cells AS (
      SELECT event_type, bin,
             CAST(sum(CASE WHEN d <= mid THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
             CAST(sum(CASE WHEN d > mid THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
      FROM e CROSS JOIN mm GROUP BY event_type, bin
    ), tot AS (
      SELECT event_type,
             CAST(sum(n_ref) AS BIGINT) AS t_ref,
             CAST(sum(n_cur) AS BIGINT) AS t_cur
      FROM cells GROUP BY event_type
    ), psi AS (
      SELECT c.event_type,
             round(sum(
               ((c.n_ref + 0.5) / (t.t_ref + 5.0) - (c.n_cur + 0.5) / (t.t_cur + 5.0))
               * ln(((c.n_ref + 0.5) / (t.t_ref + 5.0))
                    / ((c.n_cur + 0.5) / (t.t_cur + 5.0)))), 4) AS psi
      FROM cells c JOIN tot t USING (event_type)
      GROUP BY c.event_type
    ), js AS (
      SELECT c.event_type,
             round(sum(
               CASE WHEN c.n_cur > 0 THEN
                 (c.n_cur / CAST(t.t_cur AS DOUBLE))
                 * ln((c.n_cur / CAST(t.t_cur AS DOUBLE))
                      / ((c.n_cur / CAST(t.t_cur AS DOUBLE)
                          + c.n_ref / CAST(t.t_ref AS DOUBLE)) / 2)) / 2
               ELSE 0 END
               +
               CASE WHEN c.n_ref > 0 THEN
                 (c.n_ref / CAST(t.t_ref AS DOUBLE))
                 * ln((c.n_ref / CAST(t.t_ref AS DOUBLE))
                      / ((c.n_cur / CAST(t.t_cur AS DOUBLE)
                          + c.n_ref / CAST(t.t_ref AS DOUBLE)) / 2)) / 2
               ELSE 0 END), 4) AS js_nats
      FROM cells c JOIN tot t USING (event_type)
      GROUP BY c.event_type
    ), cum AS (
      SELECT event_type,
             CAST(sum(n_ref) OVER (PARTITION BY event_type ORDER BY bin) AS BIGINT) AS cr,
             CAST(sum(n_cur) OVER (PARTITION BY event_type ORDER BY bin) AS BIGINT) AS cc
      FROM cells
    ), ks AS (
      SELECT c.event_type,
             CAST(max(abs((1000000 * c.cc) // t.t_cur
                          - (1000000 * c.cr) // t.t_ref)) AS BIGINT) AS ks_micro
      FROM cum c JOIN tot t USING (event_type)
      WHERE t.t_ref > 0 AND t.t_cur > 0
      GROUP BY c.event_type
    )
    SELECT p.event_type, t.t_ref AS n_ref, t.t_cur AS n_cur,
           p.psi, j.js_nats, k.ks_micro
    FROM psi p
    JOIN js j USING (event_type)
    JOIN ks k USING (event_type)
    JOIN tot t USING (event_type)
    WHERE t.t_ref > 0 AND t.t_cur > 0
    """,
    "drift-trio audit: PSI + JS + KS between the first and second calendar half of each event type's value distribution, all three legs from ONE |types|x10-cell histogram — the oracled batch twin of the streaming drift-trio monitor (A-family)",
)
def q212(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Did the value mix move mid-corpus, and would all three monitors have
    agreed? One conditional rollup buckets every event into (type, bin,
    ref/cur half) cells — the corpus is scanned once; the midpoint day is
    a broadcast 1-row scalar — and PSI, JS, and KS all derive from the
    checkpointed |types|×10 cell table via the same drift.py functions the
    streaming trio monitor composes. Types with an empty half are dropped
    on both engines (two-sample statistics need two samples)."""
    from universal_aws_data_pipeline_spark.operators.drift import (
        js_from_ref_cells,
        ks_from_cells,
        psi_from_cells,
    )

    e = _t(spark, sf_dir, "events").select(
        "event_type",
        F.least(F.lit(9), F.greatest(F.lit(0), F.floor(F.col("value") / 50.0)))
        .cast("long")
        .alias("bin"),
        F.unix_date(F.col("ts").cast("date")).cast("long").alias("d"),
    )
    mm = e.agg(F.expr("(min(d) + max(d)) div 2").alias("mid"))
    cells = (
        e.crossJoin(F.broadcast(mm))
        .groupBy("event_type", "bin")
        .agg(
            F.sum(F.when(F.col("d") <= F.col("mid"), 1).otherwise(0))
            .cast("long")
            .alias("n_ref"),
            F.sum(F.when(F.col("d") > F.col("mid"), 1).otherwise(0))
            .cast("long")
            .alias("n_cur"),
        )
        .localCheckpoint(eager=True)  # |types| x 10 rows — tiny
    )
    psi = psi_from_cells(cells, "event_type", bins=10)
    js = js_from_ref_cells(cells, "event_type").select("event_type", "js_nats")
    ks = ks_from_cells(cells, "event_type").select("event_type", "ks_micro")
    return (
        psi.join(F.broadcast(js), "event_type")
        .join(F.broadcast(ks), "event_type")
        .select("event_type", "n_ref", "n_cur", "psi", "js_nats", "ks_micro")
    )
