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


# ------------------------------------------------------ streaming MG summary
def test_streaming_mg_invariants_and_replay(spark, tmp_path):
    """Mergeable MG across 3 micro-batches: every surviving token's true
    count is within [lb, lb+err]; every token with true count > err
    survives; a replayed batch_id is a no-op (exactly-once state)."""
    from collections import Counter

    from universal_aws_data_pipeline_spark.operators.sketch import (
        heavy_hitters_from_state,
        heavy_hitters_stream_fn,
    )

    state = str(tmp_path / "hh_state")
    k = 4
    batches = [
        ["hot hot hot warm cool", "hot warm mild"],
        ["hot hot warm warm x y z", "hot q r s"],
        ["hot hot hot hot t u v w", "warm warm"],
    ]
    fn = heavy_hitters_stream_fn(state, k=k, text_col="text")
    truth: Counter = Counter()
    for bid, docs in enumerate(batches):
        for t in docs:
            truth.update(t.split())
        fn(spark.createDataFrame([(t,) for t in docs], "text STRING"), bid)

    # replay the last batch: state must not change
    before = sorted(heavy_hitters_from_state(spark, state).collect())
    fn(spark.createDataFrame([(t,) for t in batches[-1]], "text STRING"), 2)
    after = sorted(heavy_hitters_from_state(spark, state).collect())
    assert before == after

    rows = {r["tok"]: r for r in after}
    assert len(rows) <= k
    err = next(iter(rows.values()))["cnt_ub"] - next(iter(rows.values()))["cnt_lb"]
    n = sum(truth.values())
    assert err <= n / (k + 1)
    for tok, r in rows.items():
        assert r["cnt_lb"] <= truth[tok] <= r["cnt_ub"], tok
    for tok, true_cnt in truth.items():
        if true_cnt > err:
            assert tok in rows, f"heavy token {tok} (cnt {true_cnt}) lost"
    # "hot" dominates the stream — must survive with a tight bound
    assert "hot" in rows


def test_streaming_mg_through_real_stream(spark, tmp_path):
    """Same maintainer driven by an actual file-source stream via
    foreachBatch — the deployment shape."""
    import json as _json

    from universal_aws_data_pipeline_spark.operators.sketch import (
        heavy_hitters_from_state,
        heavy_hitters_stream_fn,
    )
    from universal_aws_data_pipeline_spark.streaming.ops import (
        read_stream_source,
        write_stream_sink,
    )

    d = tmp_path / "docs_in"
    d.mkdir()
    for i, text in enumerate(["hot hot hot cool", "hot hot warm warm warm"]):
        with open(d / f"b{i}.json", "w") as fh:
            fh.write(_json.dumps({"doc_id": i, "text": text}) + "\n")
    state = str(tmp_path / "hh_state2")
    stream = read_stream_source(
        spark,
        {"type": "file", "path": str(d), "format": "json", "max_files_per_trigger": 1},
        "doc_id long, text string",
    )
    q = write_stream_sink(
        stream,
        {
            "type": "foreach_batch",
            "fn": heavy_hitters_stream_fn(state, k=3),
            "checkpoint": str(tmp_path / "ckpt"),
            "trigger": {"availableNow": True},
        },
    )
    q.awaitTermination(120)
    rows = {r["tok"]: r for r in heavy_hitters_from_state(spark, state).collect()}
    assert "hot" in rows and rows["hot"]["cnt_lb"] >= 1
    assert rows["hot"]["cnt_ub"] >= 5  # true count 5 within the upper bound


def test_quantized_index_probe_matches_inmemory(spark, sf_dir, tmp_path):
    """The persisted int8 index probe is bit-identical to the in-memory
    quantized pipeline (same arithmetic) — so it inherits q104's oracle."""
    from universal_aws_data_pipeline_spark.operators.similarity import (
        build_quantized_index,
        quantized_index_topk,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qrows = e.filter(F.col("vec_id") % 101 == 0).select("vec_id", "embedding").collect()
    queries = [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in qrows]
    path = str(tmp_path / "qidx")
    build_quantized_index(e, path)
    stored = sorted(
        (r["q_id"], r["id"], r["cos_sim"])
        for r in quantized_index_topk(spark, path, queries, k=10, shortlist=30).collect()
    )
    mem = sorted(
        (r["q_id"], r["id"], r["cos_sim"])
        for r in quantized_cosine_topk(e, queries, k=10, shortlist=30).collect()
    )
    assert stored == mem and len(stored) > 0


def test_quantized_index_shortlist_prunes_float_column(spark, sf_dir, tmp_path):
    """The shortlist scan must read only (id, scale, q) — pruning the float
    vectors is the 4x I/O win of persisting the quantized form."""
    import re

    from universal_aws_data_pipeline_spark.operators.similarity import (
        build_quantized_index,
        quantized_index_topk,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = [float(x) for x in e.filter(F.col("vec_id") == 0).head()["embedding"]]
    path = str(tmp_path / "qidx2")
    build_quantized_index(e, path)
    out = quantized_index_topk(spark, path, [(0, q)], k=5, shortlist=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    schemas = re.findall(r"ReadSchema: (\S+)", plan)
    assert len(schemas) >= 2
    shortlist_scans = [s for s in schemas if '"q"' in s or "q:" in s]
    assert any("vec" not in s for s in shortlist_scans), schemas


# ------------------------------------------------- streaming ingestion dedup
def test_neardup_stream_fn_cross_batch_and_replay(spark, tmp_path):
    """Streaming ingestion dedup: batch docs near-dup of the CORPUS are
    filtered; survivors are appended to the index so a LATER batch's
    near-dup of an earlier batch's doc is also filtered; replaying a batch
    id is a no-op (no double-write, no double-append)."""
    from universal_aws_data_pipeline_spark.operators.dedup import (
        build_neardup_index,
        neardup_stream_fn,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    novel1 = "one two three four five six seven eight nine ten"
    novel2 = "red orange yellow green blue indigo violet mauve teal cyan"
    corpus = spark.createDataFrame([(1, base)], "doc_id LONG, text STRING")
    idx_path = str(tmp_path / "ndidx")
    out_path = str(tmp_path / "survivors")
    build_neardup_index(corpus, idx_path)

    fn = neardup_stream_fn(idx_path, out_path, threshold=0.6)
    # batch 0: exact duplicate of corpus doc 1 (identical band keys, so the
    # probe hit is deterministic - J<1 pairs collide only probabilistically
    # at 8 hashes / 2 bands) + a novel doc
    fn(
        spark.createDataFrame(
            [(10, base), (11, novel1)], "doc_id LONG, text STRING"
        ),
        0,
    )
    # batch 1: exact duplicate of batch-0 survivor 11 + another novel doc
    fn(
        spark.createDataFrame(
            [(12, novel1), (13, novel2)], "doc_id LONG, text STRING"
        ),
        1,
    )
    got = {r["doc_id"] for r in spark.read.parquet(out_path).collect()}
    assert got == {11, 13}

    # replay batch 1: output must not grow
    n_before = spark.read.parquet(out_path).count()
    fn(
        spark.createDataFrame(
            [(12, novel1), (13, novel2)], "doc_id LONG, text STRING"
        ),
        1,
    )
    assert spark.read.parquet(out_path).count() == n_before


# --------------------------------------------------- quantile cutoff by group
def test_quantile_cutoff_by_group_hand_computed(spark):
    from universal_aws_data_pipeline_spark.operators.sampling import quantile_cutoff_by_group

    rows = [("en", v) for v in [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0]]
    rows += [("de", v) for v in [0.5, 0.5, 0.7]]
    df = spark.createDataFrame(rows, "lang STRING, quality DOUBLE")
    cuts = {r["lang"]: r["qcut"] for r in quantile_cutoff_by_group(df, "lang", "quality", 0.3).collect()}
    # en: n=10, rank ceil(3.0)=3 -> 0.3 ; de: n=3, rank ceil(0.9)=1 -> 0.5
    assert cuts == {"en": 0.3, "de": 0.5}


def test_q105_kept_fraction_at_least_70pct(spark, sf_dir):
    from universal_aws_data_pipeline_spark.plans.catalog import QUERIES

    out = QUERIES["q105_quality_calibration"].fn(spark, sf_dir)
    agg = out.groupBy("lang").agg(
        F.avg(F.col("kept").cast("double")).alias("frac"), F.count(F.lit(1)).alias("n")
    )
    for r in agg.collect():
        # ties at the cutoff can only push the kept share ABOVE the target
        assert r["frac"] >= 0.7 - 1.0 / r["n"], r


# ------------------------------------------------------ temperature rebalance
def test_temperature_rebalance_flattens_shares(spark):
    """Kept counts must track sqrt(n_g): the head/tail kept-share ratio
    shrinks vs the natural ratio, and the overall kept fraction is near the
    target."""
    from universal_aws_data_pipeline_spark.operators.sampling import temperature_rebalance

    rows = [(i, "head") for i in range(2000)] + [(10_000 + i, "tail") for i in range(125)]
    df = spark.createDataFrame(rows, "doc_id LONG, lang STRING")
    out = temperature_rebalance(df, "lang", "doc_id", fraction=0.25).collect()
    kept = {"head": 0, "tail": 0}
    for r in out:
        kept[r["lang"]] += 1
    # natural head:tail is 16:1; sqrt-flattened target is 4:1
    ratio = kept["head"] / max(kept["tail"], 1)
    assert 2.0 < ratio < 8.0, kept
    total_frac = (kept["head"] + kept["tail"]) / len(rows)
    assert 0.15 < total_frac < 0.35, kept


def test_temperature_rebalance_is_deterministic_and_layout_invariant(spark):
    from universal_aws_data_pipeline_spark.operators.sampling import temperature_rebalance

    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id LONG, lang STRING")
    a = {r["doc_id"] for r in temperature_rebalance(df, "lang", "doc_id").collect()}
    b = {r["doc_id"] for r in temperature_rebalance(df.repartition(7), "lang", "doc_id").collect()}
    assert a == b and len(a) > 0


# ----------------------------------------------------------------- RRF fusion
def test_rrf_fuse_hand_computed(spark):
    from universal_aws_data_pipeline_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame([(1, 9.0), (2, 5.0), (3, 1.0)], "id LONG, s1 DOUBLE")
    dense = spark.createDataFrame([(2, 0.9), (4, 0.8)], "id LONG, s2 DOUBLE")
    rows = {r["id"]: r for r in rrf_fuse([(lex, "s1"), (dense, "s2")], k=10).collect()}
    assert rows[2]["rrf"] == round(1 / 62 + 1 / 61, 6) and rows[2]["n_legs"] == 2
    assert rows[1]["rrf"] == round(1 / 61, 6) and rows[1]["n_legs"] == 1
    assert rows[4]["rrf"] == round(1 / 62, 6) and rows[4]["n_legs"] == 1
    # doc in both legs outranks single-leg docs with better single ranks
    order = sorted(rows.values(), key=lambda r: (-r["rrf"], r["id"]))
    assert order[0]["id"] == 2


# ------------------------------------------------------- containment dedup
def test_containment_catches_excerpt_that_jaccard_misses(spark):
    from universal_aws_data_pipeline_spark.operators.dedup import (
        containment_pairs_prefix_filter,
        jaccard_pairs_prefix_filter,
    )

    long = " ".join(f"w{i}" for i in range(60))       # 58 3-gram shingles
    excerpt = " ".join(f"w{i}" for i in range(10))    # 8 shingles, all in long
    other = " ".join(f"z{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, long), (2, excerpt), (3, other)], "doc_id LONG, text STRING"
    )
    cont = {(r["id_a"], r["id_b"]): r["containment"]
            for r in containment_pairs_prefix_filter(df, threshold=0.8).collect()}
    # the excerpt is fully contained in the long doc - ordered pair (2, 1)
    assert cont == {(2, 1): 1.0}
    # symmetric Jaccard at the same threshold sees nothing (J = 8/58)
    assert jaccard_pairs_prefix_filter(df, threshold=0.8).count() == 0


def test_containment_threshold_and_direction(spark):
    from universal_aws_data_pipeline_spark.operators.dedup import containment_pairs_prefix_filter

    a = "a b c d e f g h i j"        # 8 shingles
    # shares the first 7 shingles of a (tokens a..i), adds 10 novel ones
    b = "a b c d e f g h i " + " ".join(f"n{k}" for k in range(10))
    df = spark.createDataFrame([(1, a), (2, b)], "doc_id LONG, text STRING")
    got = {(r["id_a"], r["id_b"]): r["containment"]
           for r in containment_pairs_prefix_filter(df, threshold=0.8).collect()}
    # 7/8 = 0.875 >= 0.8 for doc 1 contained in doc 2; the reverse is 7/17
    assert got == {(1, 2): 0.875}


def test_incremental_containment_filter_indexed(spark, tmp_path):
    """Batch docs that are excerpts of INDEXED corpus docs are dropped even
    though their Jaccard vs the container is far below any band-collision
    regime; novel docs and partial overlaps below threshold survive."""
    from universal_aws_data_pipeline_spark.operators.dedup import (
        build_neardup_index,
        incremental_containment_filter_indexed,
        load_neardup_index,
    )

    long = " ".join(f"w{i}" for i in range(60))
    corpus = spark.createDataFrame([(1, long)], "doc_id LONG, text STRING")
    idx_path = str(tmp_path / "cidx")
    build_neardup_index(corpus, idx_path)
    index = load_neardup_index(spark, idx_path)

    excerpt = " ".join(f"w{i}" for i in range(12))   # fully contained
    half = " ".join(f"w{i}" for i in range(5)) + " " + " ".join(f"u{k}" for k in range(6))
    novel = " ".join(f"z{k}" for k in range(20))
    batch = spark.createDataFrame(
        [(10, excerpt), (11, half), (12, novel)], "doc_id LONG, text STRING"
    )
    kept = {r["doc_id"] for r in
            incremental_containment_filter_indexed(batch, index, threshold=0.8).collect()}
    assert kept == {11, 12}
