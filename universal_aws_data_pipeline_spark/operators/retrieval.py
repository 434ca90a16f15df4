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

import re

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


# ---------------------------------------------------------------------------
# Digest-based decontamination + multi-term boolean search (round 5).
#
# q57 is the boolean decontamination flag (3-gram shingle STRINGS, broadcast
# benchmark side). The operators below are its scale-path quantitative twin:
# both sides reduce to 60-bit md5 shingle digests, so the join ships 8 bytes
# per shingle instead of n-gram text, nothing requires the eval side to fit
# in a broadcast, and the report carries the excision-decision numbers
# (how MANY shingles hit, out of how many, against how many eval docs)
# instead of a flag.
# ---------------------------------------------------------------------------


def _shingle_digests(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, digest): distinct 60-bit md5 digests of word-n-gram shingles —
    row-local shingling (array transform; the explode emits digests, never
    n-gram text, so the shuffle payload is 8 bytes/shingle)."""
    from universal_aws_data_pipeline_spark.functions.texthash import word_shingles

    return (
        df.select(
            F.col(id_col),
            F.explode(word_shingles(F.col(text_col), n)).alias("_sh"),
        )
        .select(
            F.col(id_col),
            F.conv(F.substring(F.md5(F.col("_sh")), 1, 15), 16, 10)
            .cast("long")
            .alias("digest"),
        )
        .distinct()
    )


def decontaminate(
    train: DataFrame,
    eval_set: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 8,
    min_overlap: int = 1,
) -> DataFrame:
    """Per-training-document contamination report against an eval set — the
    GPT-3-style n-gram decontamination pass (published recipes use 8-13-gram
    overlap) with the numbers an excision decision needs.

    Returns (id_col, n_hit_shingles, n_shingles, n_eval_docs) for every
    training document whose distinct ``shingle_n``-gram set intersects the
    eval set's in at least ``min_overlap`` shingles.

    Plan shape: both sides reduce to DISTINCT (id, digest); a LEFT join on
    the digest marks overlaps (a digest collision is a ~2^-60 event) and
    ONE aggregation produces totals, hit counts, and eval-doc counts
    together — the corpus is tokenized and digested exactly once (a
    separate totals subtree would recompute the whole digest pass). A
    benchmark-sized eval side broadcasts under AQE automatically; a giant
    one degrades to a plain shuffled equi-join, not a failure.
    """
    t = _shingle_digests(train, id_col, text_col, shingle_n)
    e = _shingle_digests(eval_set, id_col, text_col, shingle_n).select(
        F.col("digest"), F.col(id_col).alias("_eval_id")
    )
    # left join can fan a train digest out over several eval docs; the
    # count_distincts below are immune to that inflation by construction
    return (
        t.join(e, "digest", "left")
        .groupBy(id_col)
        .agg(
            F.count_distinct("digest").alias("n_shingles"),
            F.count_distinct(
                F.when(F.col("_eval_id").isNotNull(), F.col("digest"))
            ).alias("n_hit_shingles"),
            F.count_distinct("_eval_id").alias("n_eval_docs"),
        )
        .filter(F.col("n_hit_shingles") >= min_overlap)
        .select(id_col, "n_hit_shingles", "n_shingles", "n_eval_docs")
    )


def boolean_search(
    df: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "and",
) -> DataFrame:
    """Document ids matching ALL (``mode='and'``) or ANY (``'or'``) of the
    normalized terms. One explode over the DEDUPLICATED token array, a
    pre-shuffle ``isin`` filter so only matching tokens ever enter the
    exchange, and one count aggregate — match count equals the term count
    for AND. No join: the term list is a plan literal (callers with
    unbounded term tables should use ``decontaminate``'s join shape
    instead); complements ``bm25_topk``'s row-local scoring with the
    set-semantics door.

    Terms go through the SAME normalization as document tokens (the Python
    mirror of ``texthash.normalize_text``, parity-pinned by
    ``test_boolean_search_term_normalization``) — a term with punctuation
    or casing that normalization strips would otherwise silently never
    match any document. A term that normalizes to several tokens or to
    nothing is rejected: this is set membership, not phrase search."""
    if not terms:
        raise ValueError("terms must be non-empty")
    norm_terms = set()
    for t in terms:
        # Python mirror of functions/texthash.py::normalize_text
        toks = re.sub(r"[^a-z0-9]+", " ", t.lower()).strip().split()
        if len(toks) != 1:
            raise ValueError(
                f"term {t!r} normalizes to {len(toks)} tokens "
                f"({toks!r}); boolean_search matches single normalized "
                "tokens — split phrases into separate terms"
            )
        norm_terms.add(toks[0])
    toks = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens_col(F.col(text_col)))).alias("tok"),
    ).filter(F.col("tok").isin(sorted(norm_terms)))
    matched = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_matched"))
    if mode == "and":
        return matched.filter(F.col("n_matched") == len(norm_terms)).select(id_col)
    if mode == "or":
        return matched.select(id_col)
    raise ValueError(f"mode must be 'and' or 'or', got {mode!r}")


def corpus_overlap_matrix(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    shingle_n: int = 8,
) -> DataFrame:
    """Pairwise n-gram overlap between corpus groups (sources, snapshots,
    datasets): for every group pair that shares at least one distinct
    ``shingle_n``-gram, the shared-shingle count and Jaccard — the
    mixing-time diagnostic for "how redundant are these corpora with each
    other" (feeds dedup-before-mix and mixture-weight decisions).

    Plan shape: per-DOC shingles (never concatenated across docs — no
    phantom boundary n-grams) reduce to DISTINCT (group, digest); ONE
    hash aggregation per digest collects the ≤|groups| owning set,
    row-locally expands its i<j pairs, and a |groups|²-bounded count
    aggregate finishes. The digest SELF-JOIN a naive spelling would run
    (quadratic in owners per digest, shuffled twice) never happens —
    owner sets are bounded by |groups|, so the pair expansion is a
    map-side array op. Group sizes ride on the same digest table.

    Returns (src_a, src_b, n_overlap, n_a, n_b, jaccard) with
    src_a < src_b; zero-overlap pairs are absent by construction.
    """
    from universal_aws_data_pipeline_spark.functions.texthash import word_shingles

    sh = df.select(
        F.col(group_col),
        F.explode(word_shingles(F.col(text_col), shingle_n)).alias("_sh"),
    ).select(
        F.col(group_col).alias("_g"),
        F.conv(F.substring(F.md5(F.col("_sh")), 1, 15), 16, 10)
        .cast("long")
        .alias("digest"),
    )
    # NO pre-distinct: collect_set dedups (group, digest) repeats inside the
    # partial aggregates, so the corpus crosses exactly ONE shuffle (a
    # distinct first would shuffle it twice for the same result)
    owners_all = sh.groupBy("digest").agg(F.array_sort(F.collect_set("_g")).alias("_ss"))
    owners = owners_all.filter(F.size("_ss") >= 2)
    pair_arr = F.flatten(
        F.transform(
            F.col("_ss"),
            lambda x, i: F.transform(
                F.slice(F.col("_ss"), i + 2, F.size(F.col("_ss"))),
                lambda y: F.struct(x.alias("src_a"), y.alias("src_b")),
            ),
        )
    )
    pairs = (
        owners.select(F.explode(pair_arr).alias("_p"))
        .groupBy(F.col("_p.src_a").alias("src_a"), F.col("_p.src_b").alias("src_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlap"))
    )
    # per-group distinct-digest sizes from the SAME owner table: explode is
    # ≤|groups| per digest and the count combines map-side to |groups| rows
    # per partition — a |groups|-key shuffle of partial counts, not data
    sizes = (
        owners_all.select(F.explode("_ss").alias("_g"))
        .groupBy("_g")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return (
        pairs.join(sizes.select(F.col("_g").alias("src_a"), F.col("n").alias("n_a")), "src_a")
        .join(sizes.select(F.col("_g").alias("src_b"), F.col("n").alias("n_b")), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_overlap",
            "n_a",
            "n_b",
            F.round(
                F.col("n_overlap").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_overlap")),
                6,
            ).alias("jaccard"),
        )
    )
