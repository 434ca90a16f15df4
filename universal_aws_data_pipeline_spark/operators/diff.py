"""Snapshot diff: CDC-style compare of two versions of a table.

The incremental-ingest primitive the reference's full-reload pipeline lacks
(``transform_data.py`` rereads the whole prefix every run): given yesterday's
and today's snapshot, emit exactly the added / removed / changed keys so
downstream loads can be incremental.

Plan shape: each side reduces row-locally to (key, 60-bit md5 digest of the
non-key columns) — the digest is computed in the map stage, so the equi-join
on the key ships 16 bytes/row instead of the full row width however wide the
table is. One shuffle join, a CASE projection, and the unchanged majority is
filtered out before anything else sees it. Changed rows carry both digests so
callers can route to re-fetch. md5 keeps the digest portable (a DuckDB/other-
engine consumer replays it bit-for-bit — the repo-wide portable-hash rule).

Reference parity: no diff surface in the reference; extends the ingestion
family (S-ops) the way SCD2 (operators/scd.py) extends the warehouse sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _digest(df: DataFrame, key_cols: list[str]) -> DataFrame:
    value_cols = [c for c in df.columns if c not in key_cols]
    if not value_cols:
        raise ValueError("snapshot_diff needs at least one non-key column")
    payload = F.concat_ws(
        "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in sorted(value_cols)]
    )
    return df.select(
        *key_cols,
        F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("long").alias("_digest"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """(key_cols..., change, old_digest, new_digest) for every key whose row
    was added, removed, or changed between the snapshots; unchanged keys are
    filtered before the projection. ``change`` ∈ {'added','removed','changed'}.

    Column order inside the digest is sorted by name, so schema column
    REORDERING between snapshots does not report phantom changes (a new or
    dropped column does — by design: that IS a change)."""
    o = _digest(old, key_cols).withColumnRenamed("_digest", "old_digest")
    n = _digest(new, key_cols).withColumnRenamed("_digest", "new_digest")
    joined = o.join(n, key_cols, "full_outer")
    change = (
        F.when(F.col("old_digest").isNull(), F.lit("added"))
        .when(F.col("new_digest").isNull(), F.lit("removed"))
        .when(F.col("old_digest") != F.col("new_digest"), F.lit("changed"))
    )
    return (
        joined.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(*key_cols, "change", "old_digest", "new_digest")
    )
