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
