"""Catalog chunk: q223 (round-10 continuation, DP trio completion).

q213 releases counts, q219/q220 release a quantile; q223 releases the
third canonical DP aggregate — clipped SUMS (weekly revenue per event
type under ε-DP). Together the three cover the release surface a
privacy-reviewed telemetry pipeline actually ships.
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
# q223 — ε-DP weekly value release (privacy family): per-user weekly value
# totals CLIPPED to [0, 500] cents (the sensitivity; the clip bites at
# this fixture's ~675-cent average per-user cell total, so the bounding is
# exercised, not vestigial), Laplace(clip/ε) per cell via the md5 device
# on the disjoint ``dps:`` seed prefix (independent of q213's count
# release on the same cells). No suppression threshold here — q213
# demonstrates thresholded release; this one shows the full released
# surface.
# Operators: one (user, type, week) hash agg — the only corpus-volume
# pass, map-side combinable — then the |types×weeks| rollup + one scalar
# noise expression per cell. The raw sum never leaves.
# Oracle: identical clipping and seed; the single ln() rides the round(4)
# contract.
# --------------------------------------------------------------------------

_DPS_CLIP = 500
_DPS_EPS = 1.0
_DPS_SALT = "r10"

_DPS_B = float(_DPS_CLIP) / _DPS_EPS
_DPS_KEY_SQL = f"'dps:{_DPS_SALT}:' || event_type || ':' || CAST(wk AS VARCHAR)"
_DPS_U_SQL = f"(({_hex_int_sql(_DPS_KEY_SQL, 8)}) + 0.5) / 4294967296.0"


# module constant so the q224 budget-ledger oracle can replay this release
# verbatim — one spelling, zero drift
_Q223_ORACLE = f"""
    WITH per_user AS (
      SELECT event_type,
             datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS wk,
             user_id,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s
      FROM events GROUP BY 1, 2, 3
    ), bounded AS (
      SELECT event_type, wk, least(greatest(s, 0), {_DPS_CLIP}) AS b FROM per_user
    ), sums AS (
      SELECT event_type, CAST(wk AS BIGINT) AS wk, CAST(sum(b) AS BIGINT) AS t
      FROM bounded GROUP BY 1, 2
    )
    SELECT event_type, wk,
           round(t + (-{_DPS_B} * sign(u - 0.5) * ln(1 - 2 * abs(u - 0.5))), 4)
             AS noisy_sum
    FROM (SELECT *, {_DPS_U_SQL} AS u FROM sums)
    """


@register(
    "q223_dp_value_release",
    _Q223_ORACLE,
    "epsilon-DP weekly value release: per-user weekly cent totals clipped to [0, 500] (the sensitivity - the clip bites at this corpus's per-user averages) -> seeded Laplace(clip/eps) per cell on the disjoint dps: seed prefix; the raw sum never leaves - the bounded-sum member of the DP release trio (privacy family)",
)
def q223(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release weekly revenue per event type under ε-DP: each user's
    weekly contribution clips to the sensitivity bound, each cell gets an
    independent deterministic Laplace draw. With q213 (counts) and
    q219/q220 (quantiles) this completes the canonical DP release trio.
    operators/privacy.py::dp_group_sums."""
    from universal_aws_data_pipeline_spark.operators.privacy import dp_group_sums

    e = _t(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        F.expr("unix_date(cast(ts as date)) div 7").cast("long").alias("wk"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    return dp_group_sums(
        e,
        group_cols=["event_type", "wk"],
        user_col="user_id",
        value_col="cents",
        epsilon=_DPS_EPS,
        clip=_DPS_CLIP,
        salt=_DPS_SALT,
    ).select("event_type", "wk", "noisy_sum")
