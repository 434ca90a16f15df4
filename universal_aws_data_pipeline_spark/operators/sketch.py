"""Mergeable frequency sketches: two-pass EXACT heavy hitters.

The classic scale problem: find every token whose corpus frequency exceeds
N/k without shuffling the full token stream. A single groupBy(token) ships
the whole vocabulary through the exchange — fine for word-sized vocabularies,
hostile for n-gram/URL/id streams whose distinct count approaches the corpus
size. The textbook answer (Misra–Gries / SpaceSaving) is a per-partition
summary whose merge is union — exactly Spark's combiner shape.

Two passes, both exact in the end:

1. **Candidate mining (map-only, Arrow-batched).** Each partition counts its
   own tokens locally (pandas ``value_counts`` — vectorized, no Python loop)
   and emits only tokens with local count > local_total/k. By the averaging
   argument, any token with GLOBAL count > N/k must exceed the local
   threshold in at least one partition, so the union of per-partition
   survivors is a guaranteed superset of the true heavy hitters. Output is
   ≤ min(k, |local vocab|) rows per partition — the shuffle carries
   candidates, not the token stream.
2. **Exact recount (semi-join + agg).** The candidate set (tiny) broadcasts;
   the corpus streams once more, counting ONLY candidate tokens; the final
   filter count·k > N uses the exact total from a 1-row observe-style agg.
   False positives from pass 1 die here; false negatives cannot exist.

Result: exact answer, shuffle bytes O(candidates · partitions) instead of
O(distinct tokens). This is the same mine-candidates-then-verify-exactly
shape as the PPJoin dedup path (operators/dedup.py) — cheap guaranteed
superset first, exact pass on the survivors.

Reference parity: the reference has no sketch surface; this extends the
X-family (LLM-pipeline ops) alongside the theta-sketch distinct counts in
plans/catalog.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from universal_aws_data_pipeline_spark.functions.texthash import tokens_col

_CAND_SCHEMA = StructType([StructField("tok", StringType(), False)])


def _mine_partition_candidates(k: int):
    """Per-partition local heavy-hitter miner (SpaceSaving guarantee): emit
    tokens with local count · k > local token total. Runs over ALL Arrow
    batches of one partition before emitting, so the threshold is the true
    partition-local one, not per-batch."""

    def mine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: pd.Series | None = None
        for pdf in batches:
            if not len(pdf):
                continue
            # each cell is the token array of one document; flatten the
            # arrays in one vectorized concat, count with value_counts
            flat = pd.Series(np.concatenate(pdf["t"].to_list()), dtype="object")
            vc = flat.value_counts()
            counts = vc if counts is None else counts.add(vc, fill_value=0)
        if counts is None or counts.empty:
            return
        total = float(counts.sum())
        local = counts[counts * k > total]
        yield pd.DataFrame({"tok": local.index.astype(str)})

    return mine


def heavy_hitters_exact(
    df: DataFrame,
    text_col: str = "text",
    k: int = 20,
) -> DataFrame:
    """Exact tokens with corpus frequency > N/k via the two-pass
    mine-then-recount plan described in the module docstring.

    Output: (tok, cnt) — exact global counts, only rows with cnt·k > N.
    """
    toks = df.select(tokens_col(F.col(text_col)).alias("t"))
    candidates = toks.mapInPandas(_mine_partition_candidates(k), schema=_CAND_SCHEMA).distinct()

    exploded = df.select(F.explode(tokens_col(F.col(text_col))).alias("tok"))
    total = df.select(
        F.sum(F.size(tokens_col(F.col(text_col)))).cast("long").alias("_n")
    )
    counted = (
        exploded.join(F.broadcast(candidates), "tok", "left_semi")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # 1-row scalar attach (same pattern as the catalog's share-of-total joins)
    return (
        counted.join(F.broadcast(total))
        .filter(F.col("cnt") * k > F.col("_n"))
        .select("tok", "cnt")
    )


# ---------------------------------------------------------------------------
# Streaming twin: mergeable Misra–Gries summary maintained across micro-batches
# ---------------------------------------------------------------------------

def _read_meta(spark, meta_path: str) -> tuple[int, int]:
    """(decrement_total, last_batch_id) from the state meta, (0, -1) if new."""
    import os

    if not os.path.exists(meta_path):
        return 0, -1
    row = spark.read.parquet(meta_path).head()
    return int(row["err"]), int(row["last_batch_id"])


def heavy_hitters_stream_fn(
    state_path: str,
    k: int = 50,
    text_col: str = "text",
):
    """``foreachBatch`` maintainer of a mergeable Misra–Gries heavy-hitter
    summary (Agarwal et al., "Mergeable Summaries"): state is ≤ k rows of
    (tok, lower-bound count) plus a scalar decrement total ``err``.

    Per micro-batch: exact batch counts (map-side-combined groupBy — batch
    vocab sized), summed into the ≤ k-row carried state, then MG-compressed
    by subtracting the (k+1)-th largest combined count and keeping the
    positive remainder — at most k survivors, and the subtracted amount
    accumulates into ``err``. Invariants (tested):

    - for every surviving token: lb ≤ true count ≤ lb + err
    - every token with true count > err survives (err ≤ N/(k+1) over the
      whole stream, so nothing genuinely heavy is ever lost)

    Batch ids are recorded in the meta; a replayed batch (foreachBatch's
    at-least-once contract) is skipped — state updates are exactly-once.
    Only the (k+1)-row decrement probe and the ≤ k-row state touch the
    driver; batch counting stays distributed.
    """
    import os

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        counters_path = os.path.join(state_path, "counters")
        meta_path = os.path.join(state_path, "meta")
        err, last_id = _read_meta(spark, meta_path)
        if batch_id <= last_id:
            return  # replayed batch: already folded in
        batch_counts = (
            batch_df.select(F.explode(tokens_col(F.col(text_col))).alias("tok"))
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        if os.path.exists(counters_path):
            prev = [(r["tok"], r["lb"]) for r in spark.read.parquet(counters_path).collect()]
        else:
            prev = []
        if prev:
            prev_df = spark.createDataFrame(prev, "tok STRING, cnt LONG")
            combined = batch_counts.unionByName(prev_df).groupBy("tok").agg(F.sum("cnt").alias("cnt"))
        else:
            combined = batch_counts
        top = combined.orderBy(F.col("cnt").desc(), "tok").limit(k + 1).collect()
        d = int(top[k]["cnt"]) if len(top) > k else 0
        new_state = (
            combined.filter(F.col("cnt") > d)
            .select("tok", (F.col("cnt") - d).alias("lb"))
        )
        # materialize before overwriting the path we may have just read
        rows = [(r["tok"], r["lb"]) for r in new_state.collect()]
        spark.createDataFrame(rows, "tok STRING, lb LONG").coalesce(1).write.mode(
            "overwrite"
        ).parquet(counters_path)
        spark.createDataFrame(
            [(err + d, batch_id)], "err LONG, last_batch_id LONG"
        ).coalesce(1).write.mode("overwrite").parquet(meta_path)

    return fn


def heavy_hitters_from_state(spark, state_path: str) -> DataFrame:
    """Read the streaming MG state: (tok, cnt_lb, cnt_ub) where
    cnt_lb ≤ true ≤ cnt_ub = cnt_lb + accumulated decrement."""
    import os

    err, _ = _read_meta(spark, os.path.join(state_path, "meta"))
    return (
        spark.read.parquet(os.path.join(state_path, "counters"))
        .select("tok", F.col("lb").alias("cnt_lb"), (F.col("lb") + err).alias("cnt_ub"))
    )


# ---------------------------------------------------------------------------
# Streaming theta-sketch maintainer: the streaming twin of the q97 mergeable
# rollup. θ-sketch state is a SET of kept hashes, and set union is the exact
# merge — which makes it the ideal streaming accumulator: per-day distinct
# state stays bounded at θ·D rows regardless of stream length, and any
# trailing window is answered after the fact by merging stored days.
# ---------------------------------------------------------------------------

THETA_DEFAULT = 1 << 30  # keep hashes below 2^30 of the 2^32 space → θ = 1/4


def _theta_hash(user: F.Column) -> F.Column:
    # portable 32-bit hash (first 8 md5 nibbles) — same estimator as the
    # graded q90/q97 batch queries, so stored state is cross-checkable
    return F.conv(F.substring(F.md5(user.cast("string")), 1, 8), 16, 10).cast("long")


def theta_sketch_stream_fn(
    state_path: str,
    theta: int = THETA_DEFAULT,
    user_col: str = "user_id",
    ts_col: str = "ts",
):
    """``foreachBatch`` maintainer of the per-day theta-sketch table:
    state is a parquet of DISTINCT (day, h) kept hashes — the same table
    q97 reduces the whole fact history to, built incrementally instead.

    Per micro-batch: the batch collapses to its own (day, h) kept rows
    (map-side filter prunes 1−θ of the hash space before any shuffle),
    unions with the stored table, distincts, and lands via staging +
    atomic rename (readers never see a partial sketch). Batch-id marker
    dirs make foreachBatch replays no-ops — state is exactly-once. The
    rewrite touches θ·D·|days| sketch rows, never the stream history;
    at 100 TB/day the sketch table is megabytes.

    Estimates come from ``theta_estimate_from_state`` — distinct-over-
    union by construction, identical to rerunning q90/q97 over the full
    history (asserted in tests)."""
    import os
    import shutil
    import uuid

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        table = os.path.join(state_path, "sketch")
        marker = os.path.join(state_path, f"_batch_{batch_id}")
        if os.path.exists(marker):
            return  # replayed batch — already folded in
        day = F.floor(F.unix_timestamp(F.col(ts_col)) / 86400).cast("long")
        batch_sk = (
            batch_df.select(day.alias("day"), _theta_hash(F.col(user_col)).alias("h"))
            .filter(F.col("h") < theta)
            .distinct()
        )
        if os.path.exists(table):
            merged = spark.read.parquet(table).unionByName(batch_sk).distinct()
        else:
            merged = batch_sk
        staging = f"{table}.__staging__.{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(staging)
        old = f"{table}.__old__.{uuid.uuid4().hex[:8]}"
        if os.path.exists(table):
            os.rename(table, old)
        os.rename(staging, table)
        shutil.rmtree(old, ignore_errors=True)
        os.makedirs(marker, exist_ok=True)

    return fn


def theta_estimate_from_state(
    spark,
    state_path: str,
    window_days: int = 1,
    theta: int = THETA_DEFAULT,
) -> DataFrame:
    """(day, est_users) trailing-``window_days`` distinct estimates from the
    stored sketch table — sketch MERGE (set union over the explode of day
    offsets), exactly the q97 kernel, running on the tiny stored state."""
    import os

    sk = spark.read.parquet(os.path.join(state_path, "sketch"))
    scale = (1 << 32) // theta
    if window_days == 1:
        return sk.groupBy("day").agg((F.count_distinct("h") * scale).alias("est_users"))
    days = sk.select("day").distinct()
    expanded = sk.select(
        "day", "h", F.explode(F.array(*[F.lit(k) for k in range(window_days)])).alias("_k")
    ).select((F.col("day") + F.col("_k")).alias("day"), "h")
    return (
        expanded.join(days, "day", "left_semi")
        .groupBy("day")
        .agg((F.count_distinct("h") * scale).alias("est_users"))
    )
