"""Skew-handling join strategies: salting + bucketed co-located joins.

The two levers the 100 TB design leans on when a shuffle key is pathological
(AQE's skew-join splitting covers most cases automatically — these are for
when you know the skew ahead of time or need shuffle-free repetition):

- ``salted_join``: split each hot left-side key across S salt buckets and
  replicate the right side S times (explode over the salt range). The join
  key becomes (key, salt) — a hot key's rows spread over S tasks instead of
  one straggler. Right-side replication cost: S× the (small) right side.
- ``write_bucketed`` / co-located joins: persist both sides bucketed+sorted
  by the join key (``bucketBy().sortBy().saveAsTable``); subsequent joins on
  that key read co-located buckets and skip the shuffle entirely — the
  Redshift DISTKEY story done Spark-native, worth it for dimension tables
  joined every run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Inner/left join on ``on`` with salt-spread left keys.

    left gets salt = crc32(monotonic row pos) % S — any per-row value works,
    uniformity matters, determinism doesn't (the salt never escapes the join).
    right is replicated S× via posexplode of the salt range.
    """
    # per-row monotonic id (NOT a hash of the key — that would land a hot key
    # in one salt bucket again) spreads consecutive rows of the same hot key
    # across all S buckets
    l_s = left.withColumn("_salt", (F.monotonically_increasing_id() % salt_buckets).cast("int"))
    r_s = right.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))))
    out = l_s.join(r_s, [on, "_salt"], how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
    path: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) table. Joins and
    aggregations on ``bucket_col`` between tables bucketed the same way skip
    the shuffle (check the plan: no Exchange above the scans). With ``path``
    the table is external — the data lives under an artifact dir the caller
    controls (build-once/probe-many layout caching) instead of the session
    warehouse."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    if path:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | None,
    how: str = "inner",
    left_on: str | None = None,
    right_on: str | None = None,
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys — shuffle-free.
    Pass ``on`` when both sides share the column name, or
    ``left_on``/``right_on`` when the bucket columns are named differently
    (each side must be bucketed on its own join key with the same bucket
    count for the Exchange-free plan)."""
    left, right = spark.table(left_table), spark.table(right_table)
    if on is not None:
        return left.join(right, on, how)
    return left.join(right, left[left_on] == right[right_on], how)
