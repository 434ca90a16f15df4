"""Catalog chunk: q220–q221 (round-10 continuation, third wave).

Completing the privacy family's decision tooling: q220 draws the
privacy–utility curve for the exponential-mechanism median (which ε can a
release afford?), and q221 audits t-closeness — the skewness-attack
complement of q214's k-anonymity/l-diversity audit (a class can be
k-anonymous and l-diverse and still leak the sensitive attribute when its
value distribution diverges from the table's).
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
# q220 — DP median privacy–utility curve (privacy family). Four candidate
# ε values, each an INDEPENDENT deterministic draw (md5 keyed on the
# candidate's index — float formatting is not engine-portable, the index
# is), selected over ONE shared cents-grid histogram; the error column
# compares each release against the exact lower median (internal audit —
# the exact value informs the ε choice, only one release ships).
# Operators: the cents-grid rollup once (the only corpus-volume pass), a
# |ε|-row literal cross-join onto the grid (the adjudicated
# literals-times-sketch class), cumulative-weight walks PARTITIONED by ε
# (parallel across candidates), a |ε|-row rollup, and the 1-row exact-
# median attach.
# Oracle: identical walk per candidate; ε CAST to DOUBLE (DuckDB decimal
# literal trap); weights exp(ε/2·u) underflow to exactly 0.0 identically.
# --------------------------------------------------------------------------

_CURVE_EPS = [0.05, 0.2, 1.0, 5.0]
_CURVE_SALT = "r10"
_CURVE_KEY_SQL = f"'dpu:{_CURVE_SALT}:' || CAST(i AS VARCHAR)"
_CURVE_U_SQL = f"(({_hex_int_sql(_CURVE_KEY_SQL, 8)}) + 0.5) / 4294967296.0"
_CURVE_VALUES = ", ".join(
    f"({i}, CAST({e} AS DOUBLE))" for i, e in enumerate(_CURVE_EPS)
)


@register(
    "q220_dp_median_curve",
    f"""
    WITH h AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS t FROM h
    ), cumh AS (
      SELECT v, n, t,
             CAST(sum(n) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumn
      FROM h CROSS JOIN tot
    ), exact AS (
      SELECT min(v) AS ex FROM cumh WHERE 2 * cumn >= t
    ), eps AS (
      SELECT * FROM (VALUES {_CURVE_VALUES}) AS t(i, epsilon)
    ), wt AS (
      SELECT e.i, e.epsilon, c.v,
             exp((e.epsilon / 2) * (-abs(2 * (c.cumn - c.n) + c.n - c.t))) AS wgt
      FROM cumh c CROSS JOIN eps e
    ), cum AS (
      SELECT i, epsilon, v,
             sum(wgt) OVER (PARTITION BY i ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumw
      FROM wt
    ), cw AS (
      -- totw = max over the ordered running sum per candidate: one
      -- accumulation order shared with cumw on both engines (r10 ADVICE)
      SELECT i, epsilon, v, cumw, max(cumw) OVER (PARTITION BY i) AS totw FROM cum
    ), picked AS (
      SELECT i, epsilon, CAST(min(v) AS BIGINT) AS dp_median_cents
      FROM cw
      WHERE cumw >= ({_CURVE_U_SQL}) * totw
      GROUP BY i, epsilon
    )
    SELECT epsilon, dp_median_cents,
           CAST(abs(dp_median_cents - exact.ex) AS BIGINT) AS err_cents
    FROM picked CROSS JOIN exact
    """,
    "DP median privacy-utility curve: the exponential mechanism's release at four candidate epsilons (independent deterministic draws, one shared cents-grid histogram) with each release's error vs the exact lower median - the choose-epsilon audit (privacy family)",
)
def q220(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which ε can the median release afford? One cents-grid histogram
    serves all four candidate ε selections (windows partitioned by
    candidate — parallel), and the error column quantifies the utility
    cost of each privacy level. operators/privacy.py::dp_median_curve."""
    from universal_aws_data_pipeline_spark.operators.privacy import dp_median_curve

    e = _t(spark, sf_dir, "events").select(
        F.round(F.col("value") * 100, 0).cast("long").alias("cents")
    )
    return dp_median_curve(e, "cents", _CURVE_EPS, _CURVE_SALT)


# --------------------------------------------------------------------------
# q221 — t-closeness audit (privacy family): per-class total variation
# distance between the class's market-segment distribution and the
# table-wide one, banded close / drifted / skewed. The skewness-attack
# complement of q214 (same quasi-identifiers): a (nation, balance-band)
# class can hold ≥ k diverse rows and still reveal "this class is
# overwhelmingly MACHINERY".
# Operators: one (quasi, sensitive) map-side-combined rollup (the only
# corpus-volume pass), a |segments|-row broadcast global-distribution
# attach + the adjudicated 1-row total attach, a keyed per-class rollup
# using the algebraic absent-mass fold (never the zero-filled
# |classes|×|values| grid), and a ≤3-row band rollup.
# Oracle: identical identity TVD = 0.5·(1 + Σ_present(|p−q| − q)); the
# round(4) contract absorbs division noise.
# --------------------------------------------------------------------------

_TC_TIGHT = 0.2
_TC_LOOSE = 0.5


@register(
    "q221_t_closeness_audit",
    f"""
    WITH cells AS (
      SELECT c_nationkey AS nk,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_kilo,
             c_mktsegment AS seg,
             CAST(count(*) AS BIGINT) AS c
      FROM customer GROUP BY 1, 2, 3
    ), ct AS (
      SELECT nk, bal_kilo, CAST(sum(c) AS BIGINT) AS ctot
      FROM cells GROUP BY 1, 2
    ), g AS (
      SELECT seg, CAST(sum(c) AS BIGINT) AS gc FROM cells GROUP BY 1
    ), n AS (
      SELECT CAST(sum(c) AS BIGINT) AS nt FROM cells
    ), classes AS (
      SELECT cells.nk, cells.bal_kilo,
             round(0.5 * (1 + sum(abs(cells.c / CAST(ct.ctot AS DOUBLE)
                                      - g.gc / CAST(n.nt AS DOUBLE))
                              - g.gc / CAST(n.nt AS DOUBLE))), 4) AS tvd,
             CAST(max(ct.ctot) AS BIGINT) AS class_size
      FROM cells
      JOIN ct USING (nk, bal_kilo)
      JOIN g USING (seg)
      CROSS JOIN n
      GROUP BY cells.nk, cells.bal_kilo
    )
    SELECT CASE WHEN tvd <= {_TC_TIGHT} THEN 'close'
                WHEN tvd <= {_TC_LOOSE} THEN 'drifted'
                ELSE 'skewed' END AS closeness_band,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(class_size) AS BIGINT) AS n_rows,
           max(tvd) AS max_tvd
    FROM classes GROUP BY 1
    """,
    "t-closeness audit: per-class total variation distance between the class's sensitive-value (market segment) distribution and the table-wide one over (nation, balance-band) quasi-identifiers, banded close/drifted/skewed - the skewness-attack complement of the q214 audit (privacy family)",
)
def q221(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which k-anonymous classes still leak the sensitive attribute by
    distribution skew? TVD per class via the absent-mass fold (no
    zero-filled grid), rolled into three closeness bands.
    operators/privacy.py::t_closeness_audit."""
    from universal_aws_data_pipeline_spark.operators.privacy import t_closeness_audit

    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk"),
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_kilo"),
        F.col("c_mktsegment").alias("seg"),
    )
    return t_closeness_audit(
        c, quasi_cols=["nk", "bal_kilo"], sensitive_col="seg",
        tight=_TC_TIGHT, loose=_TC_LOOSE,
    )
