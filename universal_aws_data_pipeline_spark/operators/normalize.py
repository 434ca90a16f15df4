"""Score normalization across heterogeneous groups — histogram-based exact
quantile normalization without a per-group global sort.

Quality scores are not comparable across corpus domains (web text scores
low on the same heuristics that books ace); mixing pipelines therefore
normalize per-domain before thresholding or temperature-sampling. The
exact normalizer is percent_rank within the domain — but the naive window
spelling (``percent_rank() OVER (PARTITION BY domain ORDER BY score)``)
hash-partitions by domain and SORTS EACH DOMAIN IN ONE TASK: with a
handful of domains at 100 TB that is a few single-task sorts over
terabytes — the classic window-function scale trap (same reason
``sampling.pack_into_shards`` two-phases its prefix sums).

The device here: scores with fixed decimal precision have a BOUNDED value
domain (a 4-dp score in [0,1] takes ≤ 10,001 values). So aggregate to a
(domain, value) histogram — map-side combinable, |domains|·|values| rows —
compute exclusive prefix sums on that tiny table, and broadcast-join the
ranks back. Exact percent_rank (ties share the min rank, identical to the
window definition), zero large sorts, one corpus aggregate + one
broadcast join.

Reference parity: none — driver-mandated LLM-pipeline extension
(SURVEY §2.11 family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Append exact within-group percent_rank (``pct_rank``, 6dp) and its
    equal-width bucket (``bucket`` in [0, n_buckets)) for every row.

    percent_rank follows the SQL window definition — (rank−1)/(n−1) with
    ties sharing the minimum rank, 0.0 for single-row groups — but is
    computed from a (group, value) histogram: exclusive prefix sums over
    the (small, bounded by value precision) histogram give each distinct
    value its rank, broadcast-joined back to the rows. Requires
    ``value_col`` to have bounded precision (round scores first); raw
    doubles would make the histogram as big as the data.
    """
    hist = df.groupBy(group_col, value_col).agg(F.count(F.lit(1)).alias("_c"))
    w = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wg = Window.partitionBy(group_col)
    ranks = hist.select(
        group_col,
        value_col,
        F.coalesce(F.sum("_c").over(w), F.lit(0)).alias("_lower"),
        F.sum("_c").over(wg).alias("_n"),
    )
    pct = F.when(F.col("_n") == 1, F.lit(0.0)).otherwise(
        F.col("_lower").cast("double") / (F.col("_n") - 1).cast("double")
    )
    bucketed = ranks.select(
        group_col,
        value_col,
        F.round(pct, 6).alias("pct_rank"),
        F.least(F.lit(n_buckets - 1), F.floor(pct * n_buckets)).cast("long").alias("bucket"),
    )
    return df.join(F.broadcast(bucketed), [group_col, value_col])
