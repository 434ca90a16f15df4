"""Text retrieval: BM25 relevance scoring over a document corpus.

The reference pipeline has no search surface (its transforms stop at
column mapping — `/root/reference/src/glue/transformation/transform_data.py`);
this is part of the LLM-pipeline extension surface: scoring a corpus
against a query is how training-data pipelines mine topical subsets and
build retrieval-augmented eval sets.

Scale shape (deliberately NOT the explode→inverted-index textbook plan):
for a FIXED query of q terms, per-document term frequencies are row-local
array expressions (``size(filter(tokens, = term))``) — no explode, no
shuffle, whole-stage codegen. Corpus statistics (N, avgdl, per-term df)
reduce to ONE aggregate row, broadcast back over the scoring pass. Total
cost: two map passes over the corpus + a q-column 1-row aggregate +
TakeOrderedAndProject for the top-k — the same I/O as a filter, however
large the corpus. An inverted index only pays off once queries are many
and the corpus static; that amortized posture is covered by the persisted
index operators (IVF, LSH band tables) elsewhere in the repo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from universal_aws_data_pipeline_spark.functions.texthash import tokens_col


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 15,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents by Okapi BM25 score for ``query_terms``.

    idf uses the Lucene-style non-negative form ``ln(1 + (N - df + .5)/(df
    + .5))``. Only documents containing at least one query term are
    candidates. Returns (id_col, bm25) with bm25 rounded to 4 decimals;
    ordering ties break on ascending id so the top-k set is deterministic.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    toks = tokens_col(F.col(text_col))

    def _match(term: str):
        # single-arg lambda: F.filter treats a 2-arg callable as the
        # (element, index) form, which would shadow a default-bound term
        return lambda x: x == F.lit(term)

    tf_cols = [
        F.size(F.filter(toks, _match(t))).cast("double").alias(f"_tf{i}")
        for i, t in enumerate(query_terms)
    ]
    base = docs.select(F.col(id_col), F.size(toks).cast("double").alias("_dl"), *tf_cols)

    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.avg("_dl").alias("_avgdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("long")).cast("double").alias(f"_df{i}")
            for i in range(len(query_terms))
        ],
    )

    scored = base.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    any_tf = F.lit(0.0)
    for i in range(len(query_terms)):
        tf, df = F.col(f"_tf{i}"), F.col(f"_df{i}")
        idf = F.log(F.lit(1.0) + (F.col("_n") - df + 0.5) / (df + 0.5))
        norm = tf + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl"))
        score = score + idf * tf * (k1 + 1.0) / norm
        any_tf = any_tf + tf
    return (
        scored.filter(any_tf > 0)
        .select(F.col(id_col), F.round(score, 4).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col(id_col))
        .limit(k)
    )


def rrf_fuse(
    legs: list[tuple[DataFrame, str]],
    id_col: str = "id",
    const: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of N ranked candidate lists (the standard
    hybrid-retrieval combiner: Cormack et al., RRF):

        rrf(d) = Σ_legs 1 / (const + rank_leg(d)),   absent ⇒ leg contributes 0

    ``legs`` is a list of (DataFrame, score_col); each frame is a top-k
    CANDIDATE LIST (tens of rows — the expensive corpus scans already
    happened inside the rankers), so the global row_number windows and the
    full-outer joins here touch k-row inputs only; driver-trivial at any
    corpus size. Ranks derive from (rounded score desc, id) so they are
    deterministic cross-engine; rank arithmetic is integer → the fused
    score is bit-identical wherever 1/(c+r) is.

    Returns (id_col, rrf, n_legs) — top-k by fused score, ties on id.
    """
    from pyspark.sql.window import Window

    fused: DataFrame | None = None
    rank_cols = []
    for i, (df, score_col) in enumerate(legs):
        w = Window.orderBy(F.col(score_col).desc(), F.col(id_col))
        r = df.select(F.col(id_col), F.row_number().over(w).alias(f"_r{i}"))
        rank_cols.append(f"_r{i}")
        fused = r if fused is None else fused.join(r, id_col, "full_outer")
    assert fused is not None, "rrf_fuse needs at least one leg"
    score = None
    for rc in rank_cols:
        term = F.when(F.col(rc).isNotNull(), 1.0 / (F.lit(float(const)) + F.col(rc))).otherwise(0.0)
        score = term if score is None else score + term
    n_legs = None
    for rc in rank_cols:
        present = F.col(rc).isNotNull().cast("int")
        n_legs = present if n_legs is None else n_legs + present
    return (
        fused.select(
            F.col(id_col),
            F.round(score, 6).alias("rrf"),
            n_legs.alias("n_legs"),
        )
        .orderBy(F.col("rrf").desc(), F.col(id_col))
        .limit(k)
    )
