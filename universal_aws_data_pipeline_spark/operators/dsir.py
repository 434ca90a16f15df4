"""DSIR-style importance weighting for training-data selection (extension X6
family — Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling").

The published recipe: hash token n-grams into B buckets, fit two bag-of-
buckets multinomials — one on a TARGET sample (the domain you want more of),
one on the RAW pool — and score every raw document by its log importance
weight  sum_tokens[ ln p_target(b) − ln p_raw(b) ]  with add-1 smoothing.
High-weight docs look like the target; selection keeps them.

Scale shape: the "model" IS a B-row table (B=256 here — the paper uses 10^4;
either way, vocabulary-independent and tiny). Training = one conditional
aggregation over the exploded token stream (map-side combinable); scoring =
one broadcast join of that B-row table back onto the token stream + a
per-doc integer sum. Two shuffles total over one corpus read, no UDFs, no
iteration.

Oracle portability: the per-bucket log-ratio is QUANTIZED to integer
micro-nats on the B-row table (one ln per side per bucket, then
round(·×10^6) → BIGINT). Per-doc scores are then exact integer sums —
order-independent, so floating summation order can't flip a hash grade; the
only cross-engine float surface is 2B well-separated ln calls."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from universal_aws_data_pipeline_spark.functions.texthash import tokens_col


def hashed_bucket(tok: Column, buckets: int = 256) -> Column:
    """Portable token→bucket hash: first 4 hex digits of md5, mod B.
    md5 (not xxhash64) so the bucketing replays bit-identically in SQL
    engines — the whole feature space is oracle-checkable."""
    return F.conv(F.substring(F.md5(tok), 1, 4), 16, 10).cast("long") % buckets


def dsir_bucket_weights(
    df: DataFrame,
    is_target: Column,
    text_col: str = "text",
    buckets: int = 256,
) -> DataFrame:
    """The fitted importance model: (bucket, lw_micro) — per-bucket log ratio
    ln((ct+1)/(Nt+B)) − ln((cr+1)/(Nr+B)) in integer micro-nats. One
    conditional aggregation over the exploded token stream; totals ride the
    same B-row table (window over B rows, not over tokens)."""
    toks = df.select(
        is_target.alias("_tgt"),
        F.explode(tokens_col(F.col(text_col))).alias("_tok"),
    ).select("_tgt", hashed_bucket(F.col("_tok"), buckets).alias("bucket"))
    counts = toks.groupBy("bucket").agg(
        F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).alias("ct"),
        F.sum(F.when(F.col("_tgt"), 0).otherwise(1)).alias("cr"),
    )
    from pyspark.sql.window import Window

    b = F.lit(float(buckets))
    whole = Window.partitionBy()  # global totals — over the B-row aggregate only
    w = counts.select(
        "bucket",
        "ct",
        "cr",
        F.sum("ct").over(whole).alias("nt"),
        F.sum("cr").over(whole).alias("nr"),
    ).select(
        "bucket",
        F.round(
            (
                F.log((F.col("ct") + F.lit(1.0)) / (F.col("nt") + b))
                - F.log((F.col("cr") + F.lit(1.0)) / (F.col("nr") + b))
            )
            * F.lit(1_000_000.0),
            0,
        )
        .cast("long")
        .alias("lw_micro"),
    )
    return w


def dsir_scores(
    df: DataFrame,
    is_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 256,
) -> DataFrame:
    """Per-document DSIR report: (id, n_tokens, weight_micro) for EVERY doc
    (target docs score high by construction — a useful sanity signal).
    weight_micro is an exact BIGINT sum of the quantized bucket weights.
    The B-row model broadcasts; the corpus pays one explode + one sum."""
    weights = dsir_bucket_weights(df, is_target, text_col=text_col, buckets=buckets)
    toks = df.select(
        F.col(id_col),
        F.explode(tokens_col(F.col(text_col))).alias("_tok"),
    ).select(id_col, hashed_bucket(F.col("_tok"), buckets).alias("bucket"))
    return (
        toks.join(F.broadcast(weights.select("bucket", "lw_micro")), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("lw_micro").alias("weight_micro"),
        )
    )
