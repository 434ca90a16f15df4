"""Catalog chunk: q175–q184 (round-7 additions — customer analytics,
concentration/trend statistics, split governance).

Families added this round: RFM segmentation + cohort retention (the two
canonical mart rollups), Gini/HHI concentration audits, per-group OLS
slope / Fano burstiness / MASE forecastability (the series-triage trio),
binary-segmentation changepoint (CUSUM's target-free complement),
exact co-occurrence Jaccard (the q119 theta estimates' exact twin), and
the deterministic train/val/test split manifest. Every query keeps the
integer-micro-unit discipline (floor ``div`` ↔ DuckDB ``//``, both
truncate toward zero) so the oracle replays values bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from universal_aws_data_pipeline_spark.plans._shared import (
    _hex_int_sql,
    _t,
    register,
)

# --------------------------------------------------------------------------
# q175 — RFM customer segmentation (segmentation family). Operators:
# operators/segmentation.py::rfm_scores — recency/frequency/monetary
# quintiles via ntile with the customer key as the final ORDER BY tiebreak
# (both engines share the SQL-standard ntile fill rule, so boundaries are
# identical).
# Scale: one grouped rollup to |customers| rows; the three global ntile
# windows are single-partition BY DESIGN on a dimension-sized table (the
# q48 percentile adjudication class) — at corpus scale swap ntile for
# q159's histogram-sketch cuts + a broadcast range join (docstring note).
# --------------------------------------------------------------------------
@register(
    "q175_rfm_segmentation",
    """
    WITH base AS (
      SELECT o_custkey,
             max(o_orderdate) AS last_order_date,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
      FROM orders GROUP BY o_custkey
    ), scored AS (
      SELECT o_custkey, last_order_date, n_orders, total_cents,
             CAST(6 - ntile(5) OVER (ORDER BY last_order_date DESC, o_custkey) AS BIGINT) AS r_score,
             CAST(6 - ntile(5) OVER (ORDER BY n_orders DESC, o_custkey) AS BIGINT) AS f_score,
             CAST(6 - ntile(5) OVER (ORDER BY total_cents DESC, o_custkey) AS BIGINT) AS m_score
      FROM base
    )
    SELECT *, CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) || CAST(m_score AS VARCHAR) AS rfm
    FROM scored
    """,
    "RFM quintile segmentation: per-customer recency/frequency/monetary scores 1-5 with deterministic ntile boundaries (custkey tiebreak) — the canonical marketing mart rollup (segmentation family)",
)
def q175(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer RFM quintiles over orders.
    operators/segmentation.py::rfm_scores."""
    from universal_aws_data_pipeline_spark.operators.segmentation import rfm_scores

    return rfm_scores(_t(spark, sf_dir, "orders"))


# --------------------------------------------------------------------------
# q176 — daily cohort retention matrix (segmentation family). Operators:
# operators/segmentation.py::cohort_retention over an integer period index
# (epoch-day here; the operator serves any cadence). Exact distinct counts
# and one floor div — hash-gradable.
# Scale: one distinct (user, day) projection is the only corpus-sized
# shuffle; everything after is |users|- then |cohorts x offsets|-bounded.
# --------------------------------------------------------------------------
@register(
    "q176_cohort_retention",
    """
    WITH um AS (
      SELECT DISTINCT user_id AS u, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS m
      FROM events
    ), first AS (
      SELECT u, min(m) AS m0 FROM um GROUP BY u
    ), matrix AS (
      SELECT m0, um.m - m0 AS period_offset, CAST(count(*) AS BIGINT) AS n_active
      FROM um JOIN first USING (u) GROUP BY m0, um.m - m0
    ), sz AS (
      SELECT m0, CAST(count(*) AS BIGINT) AS cohort_size FROM first GROUP BY m0
    )
    SELECT m0 AS cohort_period, CAST(period_offset AS BIGINT) AS period_offset,
           n_active, cohort_size,
           CAST((1000000 * n_active) // cohort_size AS BIGINT) AS retention_micro
    FROM matrix JOIN sz USING (m0)
    """,
    "cohort retention matrix: users bucketed by first active day, exact distinct-user counts per (cohort, day-offset) cell with floor-div retention ratios (segmentation family)",
)
def q176(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-granularity cohort retention over the event stream.
    operators/segmentation.py::cohort_retention."""
    from universal_aws_data_pipeline_spark.operators.segmentation import (
        cohort_retention,
    )

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("period"),
    )
    return cohort_retention(ev)


# --------------------------------------------------------------------------
# q177 — revenue Gini coefficient per nation (econ family). Operators:
# operators/econ.py::gini_micro — ranked-sum Gini in exact micro-units;
# ranks come from a row_number window PARTITIONED by nation, so parallelism
# is the nation count and equal values contribute tie-order-invariantly.
# Values are WHOLE DOLLARS (not cents) to keep n²·max(x)·1e6 inside int64
# through sf1 (documented magnitude contract).
# Scale: customer revenue rollup (map-side combined) + a broadcast-sized
# nation join + per-nation windows; output is |nations| rows.
# --------------------------------------------------------------------------
@register(
    "q177_revenue_gini",
    """
    WITH rev AS (
      SELECT o_custkey, CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS dollars
      FROM orders GROUP BY o_custkey
    ), j AS (
      SELECT n_name, dollars FROM rev
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
    ), r AS (
      SELECT n_name, dollars AS x,
             CAST(row_number() OVER (PARTITION BY n_name ORDER BY dollars) AS BIGINT) AS i
      FROM j
    )
    SELECT n_name, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS total,
           CAST((1000000 * (2 * sum(i * x) - (count(*) + 1) * sum(x)))
                // (count(*) * sum(x)) AS BIGINT) AS gini_micro
    FROM r GROUP BY n_name
    """,
    "per-nation Gini coefficient of customer revenue in exact micro-units: the inequality/concentration audit for market rollups, ranked-sum form with partitioned windows (econ family)",
)
def q177(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How concentrated is customer spend within each nation?
    operators/econ.py::gini_micro."""
    from universal_aws_data_pipeline_spark.operators.econ import gini_micro

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.round("o_totalprice").cast("long")).cast("long").alias("dollars")
    )
    j = (
        rev.join(c, rev["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .select("n_name", "dollars")
    )
    return gini_micro(j, "n_name", "dollars")


# --------------------------------------------------------------------------
# q178 — per-brand shipment-volume OLS trend (trend family). Operators:
# operators/trend.py::ols_slope_micro — exact least-squares slope over the
# per-brand DAILY SHIPMENT COUNT series (counts, not cents: the documented
# int64 contract 1e6·n·Σxy < 2^63 with day index rebased to 1995-01-01).
# The per-group LS twin of q174's single-series robust Theil–Sen.
# Scale: one map-side-combinable rollup to |brands × days| rows, then one
# 5-sum aggregate per brand; output |brands| rows.
# --------------------------------------------------------------------------
@register(
    "q178_brand_volume_trend",
    """
    WITH daily AS (
      SELECT p_brand, CAST(datediff('day', DATE '1995-01-01', l_shipdate) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS y
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand, datediff('day', DATE '1995-01-01', l_shipdate)
    ), agg AS (
      SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
             sum(d) AS sx, sum(y) AS sy, sum(d * y) AS sxy, sum(d * d) AS sxx
      FROM daily GROUP BY p_brand
    )
    SELECT p_brand, n AS n_points,
           CAST((1000000 * (n * sxy - sx * sy)) // (n * sxx - sx * sx) AS BIGINT) AS slope_micro
    FROM agg WHERE n * sxx - sx * sx <> 0
    """,
    "per-brand OLS slope of daily shipment volume in exact micro-units: thousands of least-squares fits in one grouped pass — the per-group twin of the single-series Theil-Sen (trend family)",
)
def q178(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which part brands are trending up or down in shipment volume?
    operators/trend.py::ols_slope_micro."""
    from universal_aws_data_pipeline_spark.operators.trend import ols_slope_micro

    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    daily = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy(
            "p_brand",
            F.datediff(F.col("l_shipdate"), F.lit("1995-01-01").cast("date"))
            .cast("long")
            .alias("d"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    return ols_slope_micro(daily, "p_brand", "d", "y")


# --------------------------------------------------------------------------
# q179 — supplier-concentration HHI per part (econ family). Operators:
# operators/econ.py::hhi_micro — Herfindahl index of supplier quantity
# shares, micro-unit floor-of-share before squaring (pinned contract,
# < |members| ppm bias). The supply-chain-risk audit: 1e6 = sole-sourced.
# Scale: two grouped aggregates + one |parts|-row join; output |parts| rows.
# --------------------------------------------------------------------------
@register(
    "q179_supplier_hhi",
    """
    WITH per AS (
      SELECT l_partkey, l_suppkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS v
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), tot AS (
      SELECT l_partkey, sum(v) AS t FROM per GROUP BY l_partkey
    ), shares AS (
      SELECT per.l_partkey, (1000000 * v) // t AS s FROM per JOIN tot USING (l_partkey)
    )
    SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_members,
           CAST(sum(s * s) // 1000000 AS BIGINT) AS hhi_micro
    FROM shares GROUP BY l_partkey
    """,
    "per-part Herfindahl index of supplier quantity shares in micro-units: the sole-sourcing / supply-concentration risk audit (econ family)",
)
def q179(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How concentrated is each part's supply across suppliers?
    operators/econ.py::hhi_micro."""
    from universal_aws_data_pipeline_spark.operators.econ import hhi_micro

    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", F.col("l_quantity").cast("long").alias("qty")
    )
    return hhi_micro(li, "l_partkey", "l_suppkey", "qty")


# --------------------------------------------------------------------------
# q180 — event burstiness via the Fano factor (trend family). Operators:
# operators/trend.py::fano_micro — variance-to-mean of daily counts as the
# pinned two-floor expression (≤2 μ from exact); 1e6 = Poisson, above =
# bursty. Dispersion triage the CUSUM/EWMA level detectors don't cover.
# Scale: daily rollup (map-side combined) to |types × days| rows, then one
# grouped 3-sum pass; |types|-row output.
# --------------------------------------------------------------------------
@register(
    "q180_event_burstiness",
    """
    WITH daily AS (
      SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY event_type, floor(epoch(ts) / 86400)
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(c) AS BIGINT) AS total,
           CAST((1000000 * sum(c * c)) // sum(c)
                - (1000000 * sum(c)) // count(*) AS BIGINT) AS fano_micro
    FROM daily GROUP BY event_type HAVING sum(c) > 0
    """,
    "Fano-factor burstiness of daily event counts per type (variance-to-mean, micro-units, 1e6 = Poisson): the over/under-dispersion triage complementing the CUSUM/EWMA level detectors (trend family)",
)
def q180(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which event types arrive bursty vs metronomic?
    operators/trend.py::fano_micro."""
    from universal_aws_data_pipeline_spark.operators.trend import fano_micro

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("d"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    return fano_micro(daily, "event_type", "c")


# --------------------------------------------------------------------------
# q181 — weekly-seasonality forecastability via MASE (trend family).
# Operators: operators/trend.py::mase_micro — seasonal-naive error over
# one-step-naive error on a DENSIFIED daily axis (spine = types × full day
# range, zero-filled: lags are positional). < 1e6 means the weekly pattern
# beats persistence.
# Scale: daily rollup + a |types × days| spine join + lag windows
# partitioned by type; |types|-row output. The global (min, max) day pair
# is a 1-row broadcast (adjudicated scalar-attach class).
# --------------------------------------------------------------------------
@register(
    "q181_weekly_mase",
    """
    WITH daily AS (
      SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY event_type, floor(epoch(ts) / 86400)
    ), bounds AS (
      SELECT min(d) AS lo, max(d) AS hi FROM daily
    ), spine AS (
      SELECT t.event_type, gs.d
      FROM (SELECT DISTINCT event_type FROM daily) t
      CROSS JOIN (SELECT unnest(range(lo, hi + 1)) AS d FROM bounds) gs
    ), dense AS (
      SELECT spine.event_type, spine.d, coalesce(daily.c, 0) AS v
      FROM spine LEFT JOIN daily USING (event_type, d)
    ), lagged AS (
      SELECT event_type, v,
             lag(v, 1) OVER (PARTITION BY event_type ORDER BY d) AS v1,
             lag(v, 7) OVER (PARTITION BY event_type ORDER BY d) AS vs
      FROM dense
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_scored,
           CAST((1000000 * sum(abs(v - vs))) // sum(abs(v - v1)) AS BIGINT) AS mase_micro
    FROM lagged WHERE vs IS NOT NULL
    GROUP BY event_type HAVING sum(abs(v - v1)) > 0
    """,
    "MASE of the seasonal-naive weekly forecast per event type (micro-units over a zero-filled daily spine): <1e6 means the weekly pattern predicts better than persistence (trend family)",
)
def q181(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does each event type's volume follow a weekly pattern worth
    modeling? operators/trend.py::mase_micro on a densified axis."""
    from universal_aws_data_pipeline_spark.operators.trend import mase_micro

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("d"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    bounds = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = (
        daily.select("event_type")
        .distinct()
        .join(
            bounds.select(
                F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("d")
            )
        )
    )
    dense = spine.join(daily, ["event_type", "d"], "left").select(
        "event_type", "d", F.coalesce("c", F.lit(0)).cast("long").alias("v")
    )
    return mase_micro(dense, "event_type", "d", "v")


# --------------------------------------------------------------------------
# q182 — train/val/test split manifest (sampling family). Operators:
# operators/sampling.py::split_manifest — md5-bucket membership (the q45
# portable-hash contract, %100 cuts train<80/val<90/test) with per-stratum
# realized shares in micro-units: the reproducibility artifact published
# next to a training dataset so any engine re-derives membership.
# Scale: one map expression + one grouped count to |strata × 3| rows.
# --------------------------------------------------------------------------
@register(
    "q182_split_manifest",
    f"""
    WITH assigned AS (
      SELECT lang AS stratum,
             CASE WHEN {_hex_int_sql("CAST(doc_id AS VARCHAR)", 4)} % 100 < 80 THEN 'train'
                  WHEN {_hex_int_sql("CAST(doc_id AS VARCHAR)", 4)} % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ), per AS (
      SELECT stratum, split, CAST(count(*) AS BIGINT) AS n_rows
      FROM assigned GROUP BY stratum, split
    ), tot AS (
      SELECT stratum, sum(n_rows) AS t FROM per GROUP BY stratum
    )
    SELECT per.stratum, split, n_rows,
           CAST((1000000 * n_rows) // t AS BIGINT) AS share_micro
    FROM per JOIN tot USING (stratum)
    """,
    "deterministic train/val/test split manifest: md5-bucket membership with per-language realized shares in micro-units — the reproducibility artifact any engine can re-derive (sampling family)",
)
def q182(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Publish the split manifest for the document corpus.
    operators/sampling.py::split_manifest."""
    from universal_aws_data_pipeline_spark.operators.sampling import split_manifest

    return split_manifest(_t(spark, sf_dir, "documents"), "doc_id", "lang")


# --------------------------------------------------------------------------
# q183 — exact event-type co-occurrence Jaccard (itemset family).
# Operators: operators/itemsets.py::cooccurrence_jaccard — the EXACT twin
# of q119's theta-sketch audience overlap: viable because the item
# vocabulary (event types) is dimension-sized, so the pair matrix is
# |types|² tiny even though the basket table is corpus-sized.
# Scale: one distinct (user, type) shuffle; the pair join is bounded by
# per-basket type counts (≤ |types| per user).
# --------------------------------------------------------------------------
@register(
    "q183_type_cooccurrence",
    """
    WITH bi AS (
      SELECT DISTINCT user_id AS b, event_type AS it FROM events
    ), per AS (
      SELECT it, CAST(count(*) AS BIGINT) AS n FROM bi GROUP BY it
    ), pairs AS (
      SELECT x.it AS item_a, y.it AS item_b, CAST(count(*) AS BIGINT) AS n_both
      FROM bi x JOIN bi y USING (b) WHERE x.it < y.it
      GROUP BY x.it, y.it
    )
    SELECT item_a, item_b, n_both,
           CAST(na.n + nb.n - n_both AS BIGINT) AS n_either,
           CAST((1000000 * n_both) // (na.n + nb.n - n_both) AS BIGINT) AS jaccard_micro
    FROM pairs
    JOIN per na ON na.it = item_a
    JOIN per nb ON nb.it = item_b
    """,
    "exact pairwise event-type co-occurrence Jaccard over user baskets in micro-units: the exact twin of the theta-sketch audience overlap, viable at dimension-sized vocabularies (itemset family)",
)
def q183(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which event types share audiences, exactly?
    operators/itemsets.py::cooccurrence_jaccard."""
    from universal_aws_data_pipeline_spark.operators.itemsets import (
        cooccurrence_jaccard,
    )

    return cooccurrence_jaccard(_t(spark, sf_dir, "events"), "user_id", "event_type")


# --------------------------------------------------------------------------
# q184 — single changepoint by binary segmentation (stats family).
# Operators: operators/robust.py::binseg_changepoint_milli — per type, the
# split maximizing |left mean − right mean| of daily value (exact
# milli-unit means, smallest-t tiebreak): the target-free complement of
# q151's CUSUM. First step of the classic binseg recursion.
# Scale: two prefix windows partitioned by type over the |types × days|
# daily table + a per-type top-1; never touches raw events twice.
# --------------------------------------------------------------------------
@register(
    "q184_binseg_changepoint",
    """
    WITH d AS (
      SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS t,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
      FROM events GROUP BY event_type, floor(epoch(ts) / 86400)
    ), p AS (
      SELECT event_type, t,
             sum(v) OVER (PARTITION BY event_type ORDER BY t) AS L,
             CAST(row_number() OVER (PARTITION BY event_type ORDER BY t) AS BIGINT) AS i
      FROM d
    ), tot AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n, sum(v) AS S
      FROM d GROUP BY event_type
    ), sc AS (
      SELECT p.event_type, t,
             CAST((1000 * L) // i AS BIGINT) AS lm,
             CAST((1000 * (S - L)) // (n - i) AS BIGINT) AS rm
      FROM p JOIN tot USING (event_type)
      WHERE i >= 2 AND i <= n - 2
    ), ranked AS (
      SELECT event_type, t, lm, rm, abs(lm - rm) AS gap,
             row_number() OVER (
               PARTITION BY event_type ORDER BY abs(lm - rm) DESC, t
             ) AS rn
      FROM sc
    )
    SELECT event_type, t AS split_day, lm AS left_mean_milli,
           rm AS right_mean_milli, CAST(gap AS BIGINT) AS gap_milli
    FROM ranked WHERE rn = 1
    """,
    "per-type single changepoint by binary segmentation: the split day maximizing the gap between exact milli-unit segment means (smallest-day tiebreak) — CUSUM's target-free complement (stats family)",
)
def q184(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Where does each event type's daily value level shift?
    operators/robust.py::binseg_changepoint_milli."""
    from universal_aws_data_pipeline_spark.operators.robust import (
        binseg_changepoint_milli,
    )

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("d"),
    ).agg(F.sum(F.round(F.col("value") * 100, 0).cast("long")).cast("long").alias("v"))
    return binseg_changepoint_milli(daily, "event_type", "d", "v")
