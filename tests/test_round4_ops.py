"""Unit tests for the round-4 operators: span-overlap dedup, two-pass exact
heavy hitters, bigram-LM quality scoring, int8-quantized ANN."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from universal_aws_data_pipeline_spark.operators.dedup import span_overlap_profile
from universal_aws_data_pipeline_spark.operators.similarity import cosine_topk, quantized_cosine_topk
from universal_aws_data_pipeline_spark.operators.sketch import heavy_hitters_exact
from universal_aws_data_pipeline_spark.operators.text import bigram_lm_scores, doc_bigrams


# ----------------------------------------------------------------- span dedup
def test_span_overlap_copy_is_fully_duplicated(spark):
    orig = "a b c d e f g h i j k l"  # 12 tokens -> 5 distinct 8-grams
    fresh = "z y x w v u t s r q p o"
    df = spark.createDataFrame(
        [(1, orig), (2, orig), (3, fresh)], "doc_id LONG, text STRING"
    )
    rows = {r["doc_id"]: r for r in span_overlap_profile(df, span_n=8).collect()}
    assert rows[1]["dup_span_frac"] == 0.0 and not rows[1]["is_span_dup"]
    assert rows[2]["dup_span_frac"] == 1.0 and rows[2]["is_span_dup"]
    assert rows[3]["dup_span_frac"] == 0.0
    assert rows[1]["n_spans"] == 5


def test_span_overlap_partial_and_short_doc(spark):
    a = "a b c d e f g h i j"  # 3 distinct 8-grams
    # shares exactly the first 8-gram of a (a..h), plus 2 novel spans
    b = "a b c d e f g h x y"
    short = "tiny doc"  # < 8 tokens -> whole normalized text is the span
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, short), (4, short)], "doc_id LONG, text STRING"
    )
    rows = {r["doc_id"]: r for r in span_overlap_profile(df, span_n=8).collect()}
    assert rows[2]["n_spans"] == 3
    assert rows[2]["dup_span_frac"] == round(1 / 3, 4)
    assert rows[3]["dup_span_frac"] == 0.0
    assert rows[4]["dup_span_frac"] == 1.0 and rows[4]["is_span_dup"]


# ------------------------------------------------------------- heavy hitters
def test_heavy_hitters_exact_small(spark):
    # 20 tokens total: "hot" x 8, "warm" x 2, 10 singletons.
    # k=5 -> threshold cnt*5 > 20 ie cnt > 4: only "hot" qualifies.
    docs = [("hot " * 8 + "warm warm"), " ".join(f"u{i}" for i in range(10))]
    df = spark.createDataFrame([(t,) for t in docs], "text STRING")
    got = {(r["tok"], r["cnt"]) for r in heavy_hitters_exact(df, k=5).collect()}
    assert got == {("hot", 8)}


def test_heavy_hitters_invariant_under_partitioning(spark, sf_dir):
    """The two-pass answer is EXACT: repartitioning (which changes pass-1
    local candidate sets) must not change the final result."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text")
    a = {(r["tok"], r["cnt"]) for r in heavy_hitters_exact(d.repartition(2), k=30).collect()}
    b = {(r["tok"], r["cnt"]) for r in heavy_hitters_exact(d.repartition(13), k=30).collect()}
    assert a == b and len(a) > 0
    # every reported hitter really exceeds N/k
    n = d.select(F.sum(F.size(F.split(F.trim(F.regexp_replace(F.lower("text"), "[^a-z0-9]+", " ")), " ")))).head()[0]
    assert all(cnt * 30 > n for _, cnt in a)


# ------------------------------------------------------------------ bigram LM
def test_doc_bigrams_single_token_doc_dropped(spark):
    df = spark.createDataFrame([(1, "solo"), (2, "two tokens")], "doc_id LONG, text STRING")
    rows = doc_bigrams(df).collect()
    assert {(r["doc_id"], r["w1"], r["w2"]) for r in rows} == {(2, "two", "tokens")}


def test_bigram_lm_scores_hand_computed(spark):
    # corpus: doc1 = "a b a b", doc2 = "a b"
    # unigrams: a:3 b:3  V=2 ; bigrams: (a,b):3 (b,a):1
    df = spark.createDataFrame([(1, "a b a b"), (2, "a b")], "doc_id LONG, text STRING")
    out = {r["doc_id"]: r for r in bigram_lm_scores(df, alpha=0.5).collect()}
    nll_ab = -math.log((3 + 0.5) / (3 + 0.5 * 2))
    nll_ba = -math.log((1 + 0.5) / (3 + 0.5 * 2))
    assert out[1]["n_bigrams"] == 3
    assert out[1]["avg_nll"] == round((2 * nll_ab + nll_ba) / 3, 4)
    assert out[2]["n_bigrams"] == 1
    assert out[2]["avg_nll"] == round(nll_ab, 4)


def test_bigram_lm_rare_doc_scores_higher(spark):
    common = [(i, "the quick brown fox jumps over the lazy dog") for i in range(10)]
    rare = [(99, "zxq qqz xqz zzx qzx xzz")]
    df = spark.createDataFrame(common + rare, "doc_id LONG, text STRING")
    rows = {r["doc_id"]: r["avg_nll"] for r in bigram_lm_scores(df).collect()}
    assert rows[99] > rows[0]


# -------------------------------------------------------------- quantized ANN
def test_quantized_ann_recall_vs_exact(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qrows = e.filter(F.col("vec_id") % 101 == 0).select("vec_id", "embedding").collect()
    queries = [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in qrows]
    approx = quantized_cosine_topk(e, queries, k=10, shortlist=30).collect()
    by_q: dict[int, set[int]] = {}
    for r in approx:
        by_q.setdefault(r["q_id"], set()).add(r["id"])
    for qid, qv in queries:
        exact_ids = {r["vec_id"] for r in cosine_topk(e, qv, k=10).collect()}
        recall = len(by_q[qid] & exact_ids) / 10
        assert recall >= 0.8, f"query {qid}: recall {recall}"
        # the query vector itself must be its own nearest neighbor
        assert qid in by_q[qid]


def test_quantized_ann_self_similarity_is_one(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    out = quantized_cosine_topk(e, [(0, [float(x) for x in q])], k=3, shortlist=10).collect()
    top = max(out, key=lambda r: r["cos_sim"])
    assert top["id"] == 0 and top["cos_sim"] == 1.0
