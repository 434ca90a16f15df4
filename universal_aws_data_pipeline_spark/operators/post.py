"""Declarative post-transform stages: the LLM-pipeline operators as config
steps.

The reference is config-driven end to end (YAML → transform chain:
`/root/reference/src/config/sources/sample_source.yaml` drives
`transform_data.py`'s schema mapping); the dedup/sampling/PII
operators deserve the same door, not just a Python API.
``apply_post_transforms`` dispatches a list of spec dicts (from
``SourceConfig.post_transforms``) onto the operator modules:

- ``{op: exact_dedup, keys: [...], order_by: col}``
- ``{op: neardup_filter, id: col, column: text_col, threshold: 0.6}``
  (batch-only: cross-row state; rejected on streaming DataFrames)
- ``{op: hash_sample, key: col, fraction: 0.1, strata?: col,
  fractions?: {stratum: rate}}``
- ``{op: redact_pii, column: text_col}``
- ``{op: repetition_filter, column: text_col, max_dup_word_frac: 0.8}``
- ``{op: span_dedup_filter, id: col, column: text_col, span_n: 8,
  max_dup_span_frac: 0.5}`` (batch-only: cross-row span ownership)
- ``{op: quality_calibration_filter, id: col, column: text_col,
  group: lang_col, drop_fraction: 0.3}`` (batch-only: learned cutoff)
- ``{op: temperature_rebalance, group: lang_col, key: id_col,
  fraction: 0.25}`` (batch-only: group counts)
- ``{op: gopher_filter, column: text_col, min_words: 50,
  max_words: 100000}`` (row-local: streaming-safe)
- ``{op: span_surgery, id: col, column: text_col, span_n: 8}``
  (batch-only: cross-doc span ownership; REWRITES the text column with
  duplicated spans excised instead of dropping documents)
- ``{op: bloom_dedup, column: text_col, index_path: dir,
  corpus_path: parquet_dir}`` (probes a STORED corpus bloom built by
  ``bloom.build_bloom``+``save_bloom``; map-side probe + confirm join
  against the corpus parquet — batch-only for the join)
- ``{op: domain_cap, domain: source_col, doc_cap?: N, token_cap?: T,
  quality?: quality_col, id: id_col, tokens?: token_col}`` (batch-only:
  per-domain rank window; the C4/RefinedWeb per-source ceiling — at
  least one cap required, token_cap requires tokens; the live-stream
  twin is ``sampling.domain_cap_stream_fn``)

Row-local ops (sample / redact / repetition) are streaming-safe and pass
through unchanged on streams; cross-row ops raise on a streaming frame with
a pointer at the batch API instead of failing later inside an action.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CROSS_ROW_OPS = {
    "domain_cap",
    "exact_dedup",
    "neardup_filter",
    "span_dedup_filter",
    "quality_calibration_filter",
    "temperature_rebalance",
    "bloom_dedup",
    "span_surgery",
}


def apply_post_transforms(df: DataFrame, specs: list[dict[str, Any]]) -> DataFrame:
    for spec in specs:
        op = spec.get("op")
        if df.isStreaming and op in _CROSS_ROW_OPS:
            raise ValueError(
                f"post_transform {op!r} needs cross-row state and cannot run on a stream; "
                "dedup streams with streaming.ops.dedup_within_watermark or run batch"
            )
        if op == "exact_dedup":
            from universal_aws_data_pipeline_spark.operators.dedup import exact_dedup

            df = exact_dedup(df, list(spec["keys"]), spec["order_by"])
        elif op == "neardup_filter":
            from universal_aws_data_pipeline_spark.operators.dedup import neardup_pairs_jaccard

            id_col, text_col = spec.get("id", "doc_id"), spec.get("column", "text")
            pairs = neardup_pairs_jaccard(
                df,
                id_col=id_col,
                text_col=text_col,
                threshold=float(spec.get("threshold", 0.6)),
                shingle_n=int(spec.get("shingle_n", 3)),
            )
            # drop the larger id of each surviving pair (keep-first)
            df = df.join(
                pairs.select(F.col("id_b").alias(id_col)).distinct(), id_col, "left_anti"
            )
        elif op == "hash_sample":
            from universal_aws_data_pipeline_spark.operators.sampling import hash_sample

            df = hash_sample(
                df,
                spec["key"],
                float(spec.get("fraction", 1.0)),
                strata_col=spec.get("strata"),
                fractions={k: float(v) for k, v in spec.get("fractions", {}).items()} or None,
            )
        elif op == "redact_pii":
            from universal_aws_data_pipeline_spark.operators.text import redact_pii

            col = spec.get("column", "text")
            df = df.withColumn(col, redact_pii(F.col(col)))
        elif op == "repetition_filter":
            from universal_aws_data_pipeline_spark.functions.texthash import tokens_col

            col = spec.get("column", "text")
            cap = float(spec.get("max_dup_word_frac", 0.8))
            toks = tokens_col(F.col(col))
            dup_frac = F.lit(1.0) - F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
            df = df.filter(dup_frac < cap)
        elif op == "span_dedup_filter":
            from universal_aws_data_pipeline_spark.operators.dedup import span_overlap_profile

            id_col, text_col = spec.get("id", "doc_id"), spec.get("column", "text")
            cap = float(spec.get("max_dup_span_frac", 0.5))
            profile = span_overlap_profile(
                df.select(id_col, text_col),
                id_col=id_col,
                text_col=text_col,
                span_n=int(spec.get("span_n", 8)),
                dup_threshold=cap,
            )
            dropped = profile.filter(F.col("is_span_dup")).select(id_col)
            df = df.join(dropped, id_col, "left_anti")
        elif op == "quality_calibration_filter":
            from universal_aws_data_pipeline_spark.operators.sampling import quantile_cutoff_by_group
            from universal_aws_data_pipeline_spark.operators.text import quality_score

            id_col = spec.get("id", "doc_id")
            text_col = spec.get("column", "text")
            group = spec.get("group", "lang")
            frac = float(spec.get("drop_fraction", 0.3))
            scored = df.withColumn("_q", quality_score(F.col(text_col)))
            cuts = quantile_cutoff_by_group(scored, group, "_q", frac)
            df = (
                scored.join(F.broadcast(cuts), group)
                .filter(F.col("_q") >= F.col("qcut"))
                .drop("_q", "qcut")
            )
        elif op == "span_surgery":
            from universal_aws_data_pipeline_spark.operators.dedup import remove_duplicated_spans

            id_col, text_col = spec.get("id", "doc_id"), spec.get("column", "text")
            cleaned = remove_duplicated_spans(
                df.select(id_col, text_col),
                id_col=id_col,
                text_col=text_col,
                span_n=int(spec.get("span_n", 8)),
            ).select(id_col, F.col("cleaned_text"))
            df = (
                df.drop(text_col)
                .join(cleaned, id_col)
                .withColumnRenamed("cleaned_text", text_col)
            )
        elif op == "domain_cap":
            from universal_aws_data_pipeline_spark.operators.sampling import cap_per_domain

            order = (
                [F.col(spec["quality"]).desc()] if spec.get("quality") else None
            )
            before = set(df.columns)
            df = cap_per_domain(
                df,
                spec.get("domain", "source"),
                doc_cap=int(spec["doc_cap"]) if "doc_cap" in spec else None,
                token_cap=int(spec["token_cap"]) if "token_cap" in spec else None,
                order_by=order,
                id_col=spec.get("id", "doc_id"),
                token_col=spec.get("tokens"),
            )
            # drop ONLY the governance columns the operator ADDED — a
            # pre-existing user column named cum_tokens (doc-cap-only runs,
            # where the operator never creates it) must pass through
            df = df.drop(*[c for c in ("domain_rank", "cum_tokens") if c not in before])
        elif op == "gopher_filter":
            from universal_aws_data_pipeline_spark.operators.text import gopher_pass

            col = spec.get("column", "text")
            df = df.filter(
                gopher_pass(
                    F.col(col),
                    min_words=int(spec.get("min_words", 50)),
                    max_words=int(spec.get("max_words", 100_000)),
                )
            )
        elif op == "bloom_dedup":
            from universal_aws_data_pipeline_spark.operators.bloom import bloom_dedup_filter, load_bloom

            col = spec.get("column", "text")
            corpus = df.sparkSession.read.parquet(spec["corpus_path"]).select(col)
            # lineage barrier: the batch feeds BOTH union legs of the fast
            # path (miss leg + confirm join), so a complex upstream stage
            # (e.g. span_surgery's join-derived text) would otherwise be
            # recomputed per leg — and Spark 4.1's interpreted-projection
            # subexpression elimination chokes on such expressions inside
            # the probe UDF's hash args (expressionproxy internal error).
            # Lazy local checkpoint materializes the batch once; the batch
            # is the small side of ingest dedup by construction.
            df = bloom_dedup_filter(df.localCheckpoint(eager=False), corpus, col, load_bloom(spec["index_path"]))
        elif op == "temperature_rebalance":
            from universal_aws_data_pipeline_spark.operators.sampling import temperature_rebalance

            group = spec.get("group", "lang")
            key = spec.get("key", "doc_id")
            kept = temperature_rebalance(df, group, key, float(spec.get("fraction", 0.25)))
            df = df.join(kept.select(key), key, "left_semi")
        else:
            raise ValueError(f"unknown post_transform op {op!r}")
    return df
