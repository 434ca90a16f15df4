"""Distribution-drift monitoring (PSI) — batch and streaming.

The reference's monitoring surface is scalar threshold alarms on
record/error counts (`/root/reference/src/config/sources/sample_source.yaml:100-107`);
this module is the statistical upgrade: Population Stability Index between a
reference window and the current data, per group, over fixed value bins.

Scale shape: histograms are one conditional/grouped aggregate over the fact
scan; everything after (smoothing, log-ratios, the PSI sum) runs on the
|groups|x|bins| cell table — tiny at any corpus size. The streaming monitor
is a ``foreachBatch`` step: per micro-batch histogram, broadcast join against
the static reference histogram, alert rows appended to a parquet log.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def value_histogram(
    df: DataFrame,
    group_col: str,
    value_col: str,
    bins: int = 10,
    width: float = 50.0,
    count_col: str = "n",
) -> DataFrame:
    """Fixed-bin histogram per group: bin = clamp(floor(value/width), 0,
    bins-1). Fixed (not quantile) bins on purpose: the reference and
    current histograms must share edges, and fixed edges need no
    corpus-wide quantile pass."""
    b = F.least(
        F.lit(bins - 1), F.greatest(F.lit(0), F.floor(F.col(value_col) / width).cast("long"))
    )
    return df.groupBy(F.col(group_col), b.alias("bin")).agg(F.count(F.lit(1)).alias(count_col))


def psi_from_cells(cells: DataFrame, group_col: str, bins: int) -> DataFrame:
    """PSI per group from a (group, bin, n_ref, n_cur) cell table:
    ``sum((p - q) * ln(p / q))`` with Laplace(+0.5) smoothing so empty bins
    stay finite. Runs entirely on the aggregated cells; ln() never touches
    row-level data, and callers round the result, so cross-engine libm
    last-ulp noise cannot surface."""
    tot = cells.groupBy(group_col).agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    sm = 0.5 * bins
    p = (F.col("n_ref") + 0.5) / (F.col("t_ref") + sm)
    q = (F.col("n_cur") + 0.5) / (F.col("t_cur") + sm)
    return (
        cells.join(tot, group_col)
        .groupBy(group_col)
        .agg(
            F.round(F.sum((p - q) * F.log(p / q)), 4).alias("psi"),
            F.max("t_ref").cast("long").alias("n_ref"),
            F.max("t_cur").cast("long").alias("n_cur"),
        )
    )


def drift_monitor_batch_fn(
    ref_hist: DataFrame,
    out_path: str,
    group_col: str = "event_type",
    value_col: str = "value",
    bins: int = 10,
    width: float = 50.0,
    threshold: float = 0.1,
) -> Callable[[DataFrame, int], Any]:
    """Build a ``foreachBatch`` function that PSI-compares every micro-batch
    against a static reference histogram (``value_histogram`` output with
    count col ``n_ref``) and appends alert rows (group, psi, n_ref, n_cur,
    batch_id) to ``out_path`` whenever psi exceeds ``threshold``.

    The reference histogram is |groups|x|bins| — always broadcast. Alerts
    append via the same at-least-once foreachBatch contract as any sink;
    downstream consumers dedup on (group, batch_id) if exactly-once
    reading matters (cf. ``idempotent_batch_writer``).
    """

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        cur = value_histogram(batch_df, group_col, value_col, bins, width, count_col="n_cur")
        cells = (
            F.broadcast(ref_hist.withColumnRenamed("n", "n_ref"))
            .join(cur, [group_col, "bin"], "full_outer")
            .fillna(0, subset=["n_ref", "n_cur"])
        )
        alerts = (
            psi_from_cells(cells, group_col, bins)
            .filter(F.col("psi") > threshold)
            .withColumn("batch_id", F.lit(batch_id))
        )
        alerts.write.mode("append").parquet(out_path)

    return fn
