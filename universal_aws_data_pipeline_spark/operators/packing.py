"""Sequence packing: concat-and-chunk documents into fixed-length training
sequences.

Causal-LM training consumes fixed-length token sequences (e.g. 2048/4096
tokens), not documents. The standard prep step concatenates documents in a
deterministic order and slices the token stream every ``seq_len`` tokens —
documents cross sequence boundaries; nothing is padded or dropped. This
operator computes, for every document, WHERE it lands in that stream:
its token offset and the first/last sequence indices it touches. That
mapping is what shard writers, curriculum schedulers, and provenance
audits (which sequence did doc X contribute to?) all need.

Reference parity: none — the reference pipeline
(`/root/reference/src/glue/transformation/transform_data.py`) stops at
row-level transforms; packing is a driver-mandated LLM-pipeline extension
(SURVEY §2.11 family, alongside ``sampling.pack_into_shards``which packs
whole docs into file-sized shards; this operator chunks the CONCATENATED
token stream so sequences are exactly ``seq_len`` long).

Scale shape: the corpus is split into ``n_shards`` independent md5-bucket
shards, each packed separately (real pipelines pack per-file or per-worker
streams for exactly this reason — a single global token order would
serialize the corpus through one task). Within a shard the exclusive
prefix sum is one window over the shard's rows; shards are data-parallel,
so the whole plan is ONE hash shuffle on the shard key + parallel
windows. Raise ``n_shards`` with corpus size; sequences are numbered
per-shard so no cross-shard coordination ever happens.

Portable determinism: the shard key is the repo-standard md5 bucket
(``sampling.hash_bucket``), the in-shard order is the document id, and
all arithmetic is integer — any engine with md5 replays the exact
packing, which is how the DuckDB oracle grades it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from universal_aws_data_pipeline_spark.operators.sampling import hash_bucket


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    seq_len: int,
    n_shards: int = 64,
) -> DataFrame:
    """Map each document to its span in the concat-and-chunk token stream.

    Within each shard (md5 bucket of ``id_col`` mod ``n_shards``), documents
    are concatenated in ``id_col`` order; the stream is cut every
    ``seq_len`` tokens. For a doc at exclusive-prefix-sum offset ``o`` with
    ``n`` tokens (empty docs are dropped — they occupy no stream space):

    - ``first_seq = o // seq_len``, ``last_seq = (o + n - 1) // seq_len``
    - ``n_seqs`` it touches = ``last_seq - first_seq + 1``

    Returns (shard, id, n_tokens, tok_offset, first_seq, last_seq, n_seqs).

    One shuffle (hash partition on shard) + a per-shard window; integer
    arithmetic end-to-end so the result is engine-portable.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    shard = (hash_bucket(F.col(id_col)) % n_shards).alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    n = F.col(tokens_col).cast("long")
    base = (
        df.filter(F.col(tokens_col) > 0)
        .select(shard, F.col(id_col), n.alias("n_tokens"))
        .withColumn("tok_offset", offset)
    )
    # integer div (not float /): offsets reach 1e13+ at corpus scale and
    # must never round through a double
    first_seq = F.expr(f"tok_offset div {seq_len}")
    last_seq = F.expr(f"(tok_offset + n_tokens - 1) div {seq_len}")
    return base.select(
        "shard",
        id_col,
        "n_tokens",
        "tok_offset",
        first_seq.alias("first_seq"),
        last_seq.alias("last_seq"),
        (last_seq - first_seq + 1).alias("n_seqs"),
    )


def packing_audit(
    packed: DataFrame,
    seq_len: int,
) -> DataFrame:
    """Per-shard efficiency audit of a ``pack_sequences`` layout — the
    report a training-data pipeline publishes next to the packed corpus:
    how full the fixed-length sequences are (padding waste concentrates in
    each shard's final partial sequence) and how many documents fragment
    across a sequence boundary (a fragmented doc loses attention context
    at the cut).

    Returns per shard: (shard, n_docs, total_tokens, n_seqs,
    waste_tokens = n_seqs·seq_len − total_tokens,
    fill_micro = floor(1e6·total_tokens / (n_seqs·seq_len)),
    frag_docs = docs spanning > 1 sequence).

    Scale: one map-side-combinable grouped agg over the packing table to
    |shards| rows — the packing's own prefix-sum shuffle is the only
    corpus-sized exchange, and it is already paid by ``pack_sequences``.
    """
    return (
        packed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            (F.max("last_seq") + 1).cast("long").alias("n_seqs"),
            F.sum(F.when(F.col("n_seqs") > 1, 1).otherwise(0)).cast("long").alias("frag_docs"),
        )
        .select(
            "shard",
            "n_docs",
            "total_tokens",
            "n_seqs",
            (F.col("n_seqs") * seq_len - F.col("total_tokens")).alias("waste_tokens"),
            F.expr(f"(1000000 * total_tokens) div (n_seqs * {seq_len})").alias("fill_micro"),
            "frag_docs",
        )
    )
