"""Round-5 operator tests: Gopher rule battery, bloom-filter dedup fast path,
DSIR importance weighting, table maintenance."""

from __future__ import annotations

from pyspark.sql import functions as F

from universal_aws_data_pipeline_spark.operators.text import gopher_profile


GOOD = (
    "the quick brown fox jumps over the lazy dog and then runs back to the "
    "barn with a bone that it found by the river while the farmer was busy "
    "in the field and the sun was high over the hills so the day felt warm "
    "and long to everyone who came out to watch the animals play in the "
    "open yard near the old wooden gate"
)  # 67 words, stopword-rich, alphabetic


def _profile(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = gopher_profile(df)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_gopher_good_doc_passes(spark):
    p = _profile(spark, [(1, GOOD)])[1]
    assert p["kept"] is True
    assert p["n_words"] == 67
    assert 3.0 <= p["mean_word_len"] <= 10.0
    assert p["alpha_word_frac"] == 1.0
    assert p["n_stop_hits"] >= 2


def test_gopher_each_rule_rejects(spark):
    rows = [
        (1, GOOD),
        (2, "too short to pass the word count gate"),  # < 50 words
        (3, GOOD + " " + " ".join(["####"] * 20)),  # symbol ratio > 0.1
        (4, "\n".join(["- bullet line item"] * 10)),  # 100% bullet lines (also short)
        (5, " ".join(["wordlike"] * 60)),  # no required stopwords
        (6, " ".join(["12345"] * 60)),  # no alphabetic words
        (7, " ".join(["extraordinarily"] * 28) + " the of and to be that"),  # mean word len > 10
    ]
    p = _profile(spark, rows)
    assert p[1]["kept"] is True
    for bad in (2, 3, 4, 5, 6, 7):
        assert p[bad]["kept"] is False, bad
    # rule-specific signals fired for the right reasons
    assert p[2]["n_words"] < 50
    assert p[3]["symbol_ratio"] > 0.1
    assert p[5]["n_stop_hits"] < 2
    assert p[6]["alpha_word_frac"] == 0.0
    assert p[7]["mean_word_len"] > 10.0


def test_gopher_is_map_only(spark):
    df = spark.createDataFrame([(1, GOOD)], ["doc_id", "text"])
    plan = gopher_profile(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------- bloom dedup
def _bloom_fixture(spark):
    corpus = spark.createDataFrame(
        [(i, f"doc body number {i} with shared words") for i in range(200)], ["doc_id", "text"]
    )
    # batch: 50 exact dupes of corpus docs (new ids) + 150 novel docs
    batch = spark.createDataFrame(
        [(1000 + i, f"doc body number {i} with shared words") for i in range(50)]
        + [(2000 + i, f"entirely novel content {i}") for i in range(150)],
        ["doc_id", "text"],
    )
    return corpus, batch


def test_bloom_dedup_exact_equivalence(spark):
    from universal_aws_data_pipeline_spark.operators.bloom import bloom_dedup_filter, build_bloom

    corpus, batch = _bloom_fixture(spark)
    bloom = build_bloom(corpus, "text")
    got = sorted(r["doc_id"] for r in bloom_dedup_filter(batch, corpus, "text", bloom).collect())
    want = sorted(r["doc_id"] for r in batch.join(corpus.select("text"), "text", "left_anti").collect())
    assert got == want
    assert got == [2000 + i for i in range(150)]


def test_bloom_no_false_negatives_and_low_fp(spark):
    from universal_aws_data_pipeline_spark.operators.bloom import bloom_might_contain, build_bloom

    corpus, batch = _bloom_fixture(spark)
    bloom = build_bloom(corpus, "text")
    probed = {r["doc_id"]: r["_bloom_hit"] for r in bloom_might_contain(batch, "text", bloom).collect()}
    # every true duplicate MUST hit (zero false negatives — the exactness guarantee)
    assert all(probed[1000 + i] for i in range(50))
    # novel docs rarely hit: k=7, 10 bits/key → <1% expected; allow slack
    fp = sum(probed[2000 + i] for i in range(150))
    assert fp <= 5, f"implausible FP count {fp}"
    assert bloom.fp_rate(200) < 0.01


def test_bloom_degenerate_sizing_still_exact(spark):
    """A pathologically small filter (everything collides) must still give
    the exact answer — sizing moves cost, never results."""
    from universal_aws_data_pipeline_spark.operators.bloom import BloomFilter, bloom_dedup_filter, build_bloom
    import numpy as np

    corpus, batch = _bloom_fixture(spark)
    tiny = build_bloom(corpus, "text", bits_per_key=1, num_hashes=1)
    got = sorted(r["doc_id"] for r in bloom_dedup_filter(batch, corpus, "text", tiny).collect())
    assert got == [2000 + i for i in range(150)]
    # saturated filter: all-ones bitmap → every probe hits, result still exact
    sat = BloomFilter(bits=np.full(8, 255, dtype=np.uint8), m_bits=64, num_hashes=2)
    got = sorted(r["doc_id"] for r in bloom_dedup_filter(batch, corpus, "text", sat).collect())
    assert got == [2000 + i for i in range(150)]


def test_bloom_save_load_roundtrip(spark, tmp_path):
    from universal_aws_data_pipeline_spark.operators.bloom import (
        bloom_might_contain,
        build_bloom,
        load_bloom,
        save_bloom,
    )

    corpus, batch = _bloom_fixture(spark)
    bloom = build_bloom(corpus, "text")
    save_bloom(bloom, str(tmp_path / "bloom"))
    loaded = load_bloom(str(tmp_path / "bloom"))
    assert loaded.m_bits == bloom.m_bits and loaded.num_hashes == bloom.num_hashes
    a = bloom_might_contain(batch, "text", bloom).collect()
    b = bloom_might_contain(batch, "text", loaded).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_bloom_empty_sides(spark):
    from universal_aws_data_pipeline_spark.operators.bloom import bloom_dedup_filter, build_bloom

    corpus, batch = _bloom_fixture(spark)
    empty = corpus.filter(F.lit(False))
    bloom_empty = build_bloom(empty, "text")
    got = sorted(r["doc_id"] for r in bloom_dedup_filter(batch, empty, "text", bloom_empty).collect())
    assert len(got) == 200  # nothing in corpus → whole batch survives
    bloom = build_bloom(corpus, "text")
    assert bloom_dedup_filter(empty, corpus, "text", bloom).count() == 0


# ---------------------------------------------------------------- DSIR
def test_dsir_target_like_docs_score_higher(spark):
    from universal_aws_data_pipeline_spark.operators.dsir import dsir_scores

    tgt_vocab = "alpha beta gamma delta epsilon"
    raw_vocab = "zork quux blarg wibble fnord"
    rows = (
        [(i, tgt_vocab, "target") for i in range(20)]
        + [(100 + i, raw_vocab, "raw") for i in range(20)]
        # probes: one target-looking raw doc, one raw-looking raw doc
        + [(500, tgt_vocab, "raw"), (501, raw_vocab, "raw")]
    )
    df = spark.createDataFrame(rows, ["doc_id", "text", "side"])
    scores = {r["doc_id"]: r["weight_micro"] for r in dsir_scores(df, F.col("side") == "target").collect()}
    assert scores[500] > 0 > scores[501]
    assert scores[500] > scores[501]


def test_dsir_weight_is_exact_integer_sum(spark):
    """Per-doc weight must equal the sum of its tokens' bucket weights —
    pinned by recomputing from the model table in Python."""
    from universal_aws_data_pipeline_spark.operators.dsir import (
        dsir_bucket_weights,
        dsir_scores,
        hashed_bucket,
    )

    rows = [(1, "alpha beta beta", "t"), (2, "gamma gamma zork", "r"), (3, "alpha zork", "r")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "side"])
    is_tgt = F.col("side") == "t"
    model = {r["bucket"]: r["lw_micro"] for r in dsir_bucket_weights(df, is_tgt).collect()}
    buckets = {
        r["tok"]: r["b"]
        for r in df.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .select("tok", hashed_bucket(F.col("tok")).alias("b"))
        .collect()
    }
    got = {r["doc_id"]: r["weight_micro"] for r in dsir_scores(df, is_tgt).collect()}
    for doc_id, text, _ in rows:
        want = sum(model[buckets[t]] for t in text.split())
        assert got[doc_id] == want, doc_id


# ---------------------------------------------------------------- maintenance
def test_compact_table_reduces_files_and_preserves_data(spark, tmp_path):
    from universal_aws_data_pipeline_spark.operators.maintenance import (
        compact_table,
        compaction_plan,
        file_stats,
    )

    path = str(tmp_path / "frag")
    df = spark.range(10_000).withColumn("v", F.col("id") * 2)
    df.repartition(64).write.parquet(path)  # 64 tiny files
    before = file_stats(spark, path)
    assert before.count() == 64
    want = sorted(r["id"] for r in spark.read.parquet(path).collect())

    result = compact_table(spark, path, target_file_bytes=10 * 1024 * 1024)
    after = file_stats(spark, path)
    assert result["skipped"] is False
    assert after.count() < 64
    got = sorted(r["id"] for r in spark.read.parquet(path).collect())
    assert got == want

    # second run is a no-op (idempotent, schedulable)
    plan = compaction_plan(path, target_file_bytes=10 * 1024 * 1024)
    assert plan["worth_it"] is False
    assert compact_table(spark, path, target_file_bytes=10 * 1024 * 1024)["skipped"] is True


def test_compact_partitioned_table_keeps_partition_dirs(spark, tmp_path):
    from universal_aws_data_pipeline_spark.operators.maintenance import compact_table, file_stats

    path = str(tmp_path / "part")
    df = spark.range(5_000).withColumn("p", (F.col("id") % 3).cast("int"))
    df.repartition(32).write.partitionBy("p").parquet(path)
    assert file_stats(spark, path).count() > 30
    want = sorted((r["id"], r["p"]) for r in spark.read.parquet(path).collect())

    compact_table(spark, path, target_file_bytes=10 * 1024 * 1024, partition_by=["p"])
    stats = file_stats(spark, path).collect()
    dirs = {r["partition_dir"] for r in stats}
    assert dirs == {"p=0", "p=1", "p=2"}  # layout preserved
    assert len(stats) <= 6  # few files per partition now
    got = sorted((r["id"], r["p"]) for r in spark.read.parquet(path).collect())
    assert got == want


# ------------------------------------------------------- streaming theta sketch
def test_theta_sketch_stream_matches_batch_twin_and_replays_noop(spark, tmp_path):
    """Incremental sketch maintenance must equal the one-shot batch estimator
    over the full history (set union IS the exact merge), and replayed batch
    ids must not change state."""
    import datetime as dt

    from universal_aws_data_pipeline_spark.operators.sketch import (
        theta_estimate_from_state,
        theta_sketch_stream_fn,
    )

    def events(rows):
        return spark.createDataFrame(
            [(dt.datetime(2024, 1, 1 + d, 12, 0), u) for d, u in rows],
            "ts: timestamp_ntz, user_id: long",
        )

    b0 = events([(0, u) for u in range(300)] + [(1, u) for u in range(100)])
    b1 = events([(1, u) for u in range(50, 250)] + [(2, u) for u in range(400)])

    state = str(tmp_path / "theta")
    fn = theta_sketch_stream_fn(state)
    fn(b0, 0)
    fn(b1, 1)
    got = {r["day"]: r["est_users"] for r in theta_estimate_from_state(spark, state).collect()}

    # batch twin: same estimator over the full history in one pass
    full = b0.unionByName(b1)
    day = F.floor(F.unix_timestamp("ts") / 86400).cast("long")
    h = F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10).cast("long")
    want = {
        r["day"]: r["est"]
        for r in full.select(day.alias("day"), h.alias("h"))
        .filter(F.col("h") < (1 << 30))
        .groupBy("day")
        .agg((F.count_distinct("h") * 4).alias("est"))
        .collect()
    }
    assert got == want

    # replay of batch 1 is a no-op (exactly-once)
    fn(b1, 1)
    again = {r["day"]: r["est_users"] for r in theta_estimate_from_state(spark, state).collect()}
    assert again == got

    # rolling 7-day merge runs on the stored state and covers all seen days
    rolled = theta_estimate_from_state(spark, state, window_days=7)
    days = {r["day"] for r in rolled.collect()}
    assert days == set(got)


def test_theta_sketch_stream_through_real_stream(spark, tmp_path):
    """End-to-end through foreachBatch on a real file stream."""
    import datetime as dt

    from universal_aws_data_pipeline_spark.operators.sketch import (
        theta_estimate_from_state,
        theta_sketch_stream_fn,
    )

    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 6, 0).isoformat(), u) for u in range(500)],
        "ts: string, user_id: long",
    ).coalesce(1).write.json(str(src / "b0"))

    stream = (
        spark.readStream.schema("ts string, user_id long")
        .option("recursiveFileLookup", "true")
        .json(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    )
    state = str(tmp_path / "theta")
    q = (
        stream.writeStream.foreachBatch(theta_sketch_stream_fn(state))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(90)
    est = theta_estimate_from_state(spark, state).collect()
    assert len(est) == 1
    # θ=1/4 KMV over 500 users: estimate within a loose 2x band
    assert 200 <= est[0]["est_users"] <= 1000


# ---------------------------------------------------------------- span surgery
def test_span_surgery_excises_copied_run_keeps_novel_frame(spark):
    from universal_aws_data_pipeline_spark.operators.dedup import remove_duplicated_spans

    rows = [
        (1, "one two three four five six seven eight nine ten"),
        (2, "zzz one two three four five six seven eight yyy"),  # 8-token copy inside novel frame
        (3, "short doc here"),  # < span_n tokens: untouched
    ]
    out = {
        r["doc_id"]: r
        for r in remove_duplicated_spans(spark.createDataFrame(rows, ["doc_id", "text"])).collect()
    }
    assert out[1]["n_removed"] == 0  # first doc owns its spans
    assert out[1]["cleaned_text"] == rows[0][1]
    assert out[2]["n_removed"] == 8
    assert out[2]["cleaned_text"] == "zzz yyy"
    assert out[3]["n_removed"] == 0 and out[3]["cleaned_text"] == "short doc here"


def test_span_surgery_full_copy_is_emptied_and_intra_doc_repeat_kept(spark):
    from universal_aws_data_pipeline_spark.operators.dedup import remove_duplicated_spans

    body = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, body),
        (2, body),  # verbatim copy → fully excised
        (3, body.upper() + " " + body),  # intra-doc repeat only... but doc1 owns it
        (4, "p1 p2 p3 p4 p5 p6 p7 p8 p1 p2 p3 p4 p5 p6 p7 p8"),  # self-repeat, no earlier owner
    ]
    out = {
        r["doc_id"]: r
        for r in remove_duplicated_spans(spark.createDataFrame(rows, ["doc_id", "text"])).collect()
    }
    assert out[2]["cleaned_text"] == "" and out[2]["n_removed"] == out[2]["n_tokens"]
    # normalization makes doc3 two copies of doc1's body → all removed
    assert out[3]["cleaned_text"] == ""
    # doc4 repeats ITSELF: min owner is doc4, nothing earlier → kept whole
    assert out[4]["n_removed"] == 0


# ---------------------------------------------------------------- IVF rebalance
def test_ivf_rebalance_splits_hot_cell_only(spark, tmp_path):
    """A skewed index (80% of vectors in one cell) gets that cell split into
    sub-cells; cold cells keep their ids and files; probes still find the
    exact neighbors with full nprobe coverage."""
    import os
    import random

    from universal_aws_data_pipeline_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk_indexed,
        load_ivf_index,
        rebalance_ivf_index,
    )

    rng = random.Random(7)
    # two tight blobs far apart: blob A (80 vectors around +10), blob B (20 around -10)
    rows = [(i, [10.0 + rng.uniform(-1, 1), 10.0 + rng.uniform(-1, 1)]) for i in range(80)]
    rows += [(100 + i, [-10.0 + rng.uniform(-1, 1), -10.0 + rng.uniform(-1, 1)]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    path = str(tmp_path / "ivf")
    build_ivf_index(df, path, n_clusters=2)

    before = load_ivf_index(spark, path)
    counts = {
        r["_cell"]: r["n"] for r in before.cells.groupBy("_cell").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    hot_cell = max(counts, key=counts.get)
    cold_cell = min(counts, key=counts.get)
    assert counts[hot_cell] >= 70  # the fixture is genuinely skewed
    cold_dir = os.path.join(path, "cells", f"_cell={cold_cell}")
    cold_mtime = max(os.path.getmtime(os.path.join(cold_dir, f)) for f in os.listdir(cold_dir))

    result = rebalance_ivf_index(spark, path, max_cell_fraction=0.5, n_split=2)
    assert list(result["split"]) == [hot_cell]
    after = load_ivf_index(spark, path)
    # vector count preserved, cell count grew, hot cell shrank
    assert sum(result["counts"].values()) == 100
    assert len(result["counts"]) == 3
    assert max(result["counts"].values()) < counts[hot_cell]
    assert len(after.centroids) == 3
    # cold cell files untouched (no rewrite of unaffected partitions)
    assert max(os.path.getmtime(os.path.join(cold_dir, f)) for f in os.listdir(cold_dir)) == cold_mtime

    # probe with full coverage still returns the exact nearest vector
    got = ivf_topk_indexed(after, [10.0, 10.0], k=1, nprobe=3).collect()
    assert got[0]["vec_id"] < 100  # a blob-A vector


def test_ivf_rebalance_noop_when_balanced(spark, tmp_path):
    from universal_aws_data_pipeline_spark.operators.similarity import build_ivf_index, rebalance_ivf_index

    rows = [(i, [float(i % 7), float((i * 3) % 11)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    path = str(tmp_path / "ivf")
    build_ivf_index(df, path, n_clusters=4)
    result = rebalance_ivf_index(spark, path, max_cell_fraction=0.9)
    assert result["split"] == {}


# ---------------------------------------------------------------------------
# Datasketches HLL rollup + Count-Min point estimates (operators/sketch.py)
# ---------------------------------------------------------------------------


def test_hll_rollup_estimates_match_direct_sketching(spark):
    """Rolling fine-grain sketches up to (day) answers the coarser question
    within sketch error of sketching (day) directly — the property that makes
    the sketch table a substitute for rescanning the fact table. (Not
    bit-exact: singly-built sketches use the stream-order-sensitive HIP
    estimator, unions the composite one — see the module note.)"""
    from universal_aws_data_pipeline_spark.operators.sketch import (
        hll_group_sketches,
        hll_rollup,
    )
    from pyspark.sql import functions as F

    df = spark.range(20_000).select(
        (F.col("id") % 7).alias("day"),
        (F.col("id") % 3).alias("etype"),
        (F.col("id") % 997).alias("user"),
    )
    fine = hll_group_sketches(df, ["day", "etype"], "user").localCheckpoint()
    rolled = {r["day"]: r["distinct_est"] for r in hll_rollup(fine, ["day"]).collect()}
    direct = {
        r["day"]: r["distinct_est"]
        for r in hll_group_sketches(df, ["day"], "user").collect()
    }
    exact = {
        r["day"]: r["n"]
        for r in df.groupBy("day").agg(F.countDistinct("user").alias("n")).collect()
    }
    for day, est in rolled.items():
        assert abs(est - exact[day]) / exact[day] < 0.05  # lgK=12 ⇒ ~1.6% typical
        assert abs(est - direct[day]) <= 0.05 * exact[day]


def test_cms_estimates_bounds_and_merge(spark):
    """CMS guarantees est >= true and (w.h.p.) est <= true + (2/width)*N;
    cell-wise SUM of two stream sketches equals the sketch of the union."""
    from universal_aws_data_pipeline_spark.operators.sketch import (
        cms_estimates,
        count_min_build,
    )
    from pyspark.sql import functions as F

    # skewed stream: token "hot" 10_000 times, 1000 singletons
    hot = spark.range(10_000).select(F.lit("hot").alias("tok"))
    cold = spark.range(1_000).select(
        F.concat(F.lit("t"), F.col("id")).cast("string").alias("tok")
    )
    df = hot.unionByName(cold)
    n, width = 11_000, 1024
    sketch = count_min_build(df, "tok", depth=4, width=width).localCheckpoint()
    probes = spark.createDataFrame([("hot",), ("t5",), ("missing",)], ["tok"])
    est = {
        r["tok"]: r["est_count"]
        for r in cms_estimates(sketch, probes, "tok", depth=4, width=width).collect()
    }
    slack = (2 / width) * n
    assert 10_000 <= est["hot"] <= 10_000 + slack
    assert 1 <= est["t5"] <= 1 + slack
    assert est["missing"] <= slack
    # mergeability: sum of per-stream sketches == sketch of the union
    s1 = count_min_build(hot, "tok", depth=4, width=width)
    s2 = count_min_build(cold, "tok", depth=4, width=width)
    merged = (
        s1.unionByName(s2)
        .groupBy("row", "bucket")
        .agg(F.sum("cell_count").alias("cell_count"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, sketch.collect()))


def test_variant_path_tolerates_malformed_and_missing(spark):
    """The q118 VARIANT recipe degrades per-row: malformed JSON and missing
    paths produce NULLs (counted out of n_with_k), never job failure."""
    from pyspark.sql import functions as F

    rows = [
        ("a", '{"k": 5}'),
        ("a", '{"other": 1}'),     # missing path
        ("a", '{"k": "notint"}'),  # cast failure
        ("a", "not json at all"),  # malformed
        ("b", '{"k": 7}'),
    ]
    df = spark.createDataFrame(rows, ["event_type", "props"])
    v = df.select("event_type", F.try_parse_json("props").alias("v"))
    k = v.select("event_type", F.try_variant_get("v", "$.k", "int").alias("k"))
    out = {
        r["event_type"]: (r["n"], r["nk"], r["s"])
        for r in k.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.count("k").alias("nk"), F.sum("k").alias("s"))
        .collect()
    }
    assert out == {"a": (4, 1, 5), "b": (1, 1, 7)}


def test_cms_stream_matches_batch_twin_and_replays_noop(spark, tmp_path):
    """Incremental CMS maintenance must equal the one-shot batch sketch over
    the full history (cell-wise SUM is the exact merge), point estimates
    must agree, and replayed batch ids must not change state."""
    import os

    from universal_aws_data_pipeline_spark.operators.sketch import (
        cms_estimates,
        cms_stream_fn,
        count_min_build,
    )

    def toks(words):
        return spark.createDataFrame([(w,) for w in words], ["tok"])

    b0 = toks(["hot"] * 300 + [f"a{i}" for i in range(100)])
    b1 = toks(["hot"] * 200 + [f"b{i}" for i in range(150)])

    state = str(tmp_path / "cms")
    fn = cms_stream_fn(state, "tok", depth=4, width=256)
    fn(b0, 0)
    fn(b1, 1)
    cells = spark.read.parquet(os.path.join(state, "cells")).localCheckpoint()
    full_cells = count_min_build(b0.unionByName(b1), "tok", depth=4, width=256)
    assert sorted(map(tuple, cells.collect())) == sorted(map(tuple, full_cells.collect()))

    probes = toks(["hot", "a5", "nope"]).distinct()
    est = {
        r["tok"]: r["est_count"]
        for r in cms_estimates(cells, probes, "tok", depth=4, width=256).collect()
    }
    assert est["hot"] >= 500 and est["a5"] >= 1 and est["nope"] <= (2 / 256) * 750

    # replay of batch 1 is a no-op (exactly-once)
    fn(b1, 1)
    again = spark.read.parquet(os.path.join(state, "cells"))
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, cells.collect()))


# ---------------------------------------------------------------- retrieval r5
def test_decontaminate_reports_partial_overlap_counts(spark):
    """A train doc sharing a run of 8-grams with an eval doc reports exactly
    the window count of the shared run; disjoint docs don't appear."""
    from universal_aws_data_pipeline_spark.operators.retrieval import decontaminate

    shared = " ".join(f"w{i}" for i in range(12))  # 12 tokens -> 5 8-gram windows
    train = spark.createDataFrame(
        [
            (1, shared + " tail one two three"),
            (2, "completely different words " + " ".join(f"z{i}" for i in range(10))),
        ],
        "doc_id: long, text: string",
    )
    ev = spark.createDataFrame([(100, shared)], "doc_id: long, text: string")
    got = {r["doc_id"]: r for r in decontaminate(train, ev, shingle_n=8).collect()}
    assert set(got) == {1}
    assert got[1]["n_hit_shingles"] == 5  # 12 - 8 + 1
    assert got[1]["n_eval_docs"] == 1
    assert got[1]["n_shingles"] == 16 - 8 + 1  # train doc 1 has 16 tokens


def test_decontaminate_min_overlap_threshold(spark):
    from universal_aws_data_pipeline_spark.operators.retrieval import decontaminate

    shared = " ".join(f"w{i}" for i in range(8))  # exactly one 8-gram
    train = spark.createDataFrame([(1, shared + " x y z")], "doc_id: long, text: string")
    ev = spark.createDataFrame([(9, shared)], "doc_id: long, text: string")
    assert decontaminate(train, ev, shingle_n=8, min_overlap=1).count() == 1
    assert decontaminate(train, ev, shingle_n=8, min_overlap=2).count() == 0


def test_boolean_search_and_or_modes(spark):
    from universal_aws_data_pipeline_spark.operators.retrieval import boolean_search

    df = spark.createDataFrame(
        [
            (1, "the JOIN and the filter and the window"),
            (2, "join filter but no w-word"),
            (3, "window only here"),
            (4, "join join join filter filter window"),  # repeats must not double-count
        ],
        "doc_id: long, text: string",
    )
    got_and = {r["doc_id"] for r in boolean_search(df, ["join", "filter", "window"]).collect()}
    assert got_and == {1, 4}
    got_or = {r["doc_id"] for r in boolean_search(df, ["join", "window"], mode="or").collect()}
    assert got_or == {1, 2, 3, 4}

    import pytest

    with pytest.raises(ValueError):
        boolean_search(df, [])
    with pytest.raises(ValueError):
        boolean_search(df, ["x"], mode="xor")


def test_random_projection_preserves_relative_geometry(spark, sf_dir):
    """JL sanity: identical vectors project identically; the projection is a
    fixed linear map (proj(2v) == 2*proj(v) in exact integer micro-units
    when v quantizes without rounding)."""
    from universal_aws_data_pipeline_spark.plans.catalog import QUERIES

    out = QUERIES["q127_random_projection"].fn(spark, sf_dir)
    rows = out.collect()
    assert len(rows) % 16 == 0 and len(rows) > 0
    by_vec = {}
    for r in rows:
        by_vec.setdefault(r["vec_id"], {})[r["out_dim"]] = r["proj_micro"]
    assert all(len(v) == 16 for v in by_vec.values())

    # linearity on a controlled fixture: v and 2v (exactly representable)
    from universal_aws_data_pipeline_spark.plans.catalog import _rp_sign
    import numpy as np

    v = [0.25 * ((j % 5) - 2) for j in range(64)]  # quantizes exactly at 1e-6
    for k in range(16):
        dot = sum(round(x * 1_000_000) * _rp_sign(k, j) for j, x in enumerate(v))
        dot2 = sum(round(2 * x * 1_000_000) * _rp_sign(k, j) for j, x in enumerate(v))
        assert dot2 == 2 * dot


def test_chunk_documents_window_math(spark):
    from universal_aws_data_pipeline_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(150))),  # 3 windows: 64/64/54
            (2, "short doc"),                             # 1 window: 2 tokens
            (3, " ".join(f"u{i}" for i in range(64))),    # exactly one full window
            (4, " ".join(f"v{i}" for i in range(65))),    # 64 + trailing 17
        ],
        "doc_id: long, text: string",
    )
    got = chunk_documents(df, chunk_tokens=64, stride=48).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["n_tokens"]))
    for v in by_doc.values():
        v.sort()
    assert by_doc[1] == [(0, 64), (1, 64), (2, 54)]
    assert by_doc[2] == [(0, 2)]
    assert by_doc[3] == [(0, 64)]
    assert by_doc[4] == [(0, 64), (1, 17)]
    # overlap property: chunk 1 of doc 1 starts at token 48
    c1 = next(r for r in got if r["doc_id"] == 1 and r["chunk_idx"] == 1)
    assert c1["chunk_text"].split(" ")[0] == "t48"


def test_mixture_plan_caps_rates_and_filters_unweighted(spark):
    from universal_aws_data_pipeline_spark.operators.sampling import mixture_plan

    df = spark.createDataFrame(
        [("a", 100)] * 5 + [("b", 100)] * 50 + [("c", 100)] * 10,
        "source: string, n_tokens: long",
    )
    # budget 2000, weights a=0.5 b=0.5: a targets 1000 but has 500 -> rate 1.0;
    # b targets 1000 of 5000 -> rate 0.2; c unweighted -> absent
    got = {r["source"]: r for r in mixture_plan(df, {"a": 0.5, "b": 0.5}, 2000).collect()}
    assert set(got) == {"a", "b"}
    assert got["a"]["rate"] == 1.0 and got["a"]["expected_tokens"] == 500
    assert got["b"]["rate"] == 0.2 and got["b"]["expected_tokens"] == 1000
    assert got["a"]["target_tokens"] == 1000 and got["b"]["target_tokens"] == 1000


def test_snapshot_diff_classifies_and_ignores_column_order(spark):
    from universal_aws_data_pipeline_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame(
        [(1, "x", 10.0), (2, "y", 20.0), (3, "z", 30.0)], "k: long, s: string, v: double"
    )
    new = spark.createDataFrame(
        [(20.0, "y", 2), (31.0, "z", 3), (40.0, "w", 4)], "v: double, s: string, k: long"
    )
    got = {r["k"]: r["change"] for r in snapshot_diff(old, new, ["k"]).collect()}
    # 1 removed, 2 unchanged despite column reordering, 3 changed, 4 added
    assert got == {1: "removed", 3: "changed", 4: "added"}

    import pytest

    with pytest.raises(ValueError, match="non-key"):
        snapshot_diff(old.select("k"), new.select("k"), ["k"])


def test_snapshot_diff_null_vs_empty_string_distinct(spark):
    """The digest separator/null-sentinel must distinguish NULL from ''."""
    from universal_aws_data_pipeline_spark.operators.diff import snapshot_diff

    old = spark.createDataFrame([(1, None), (2, "")], "k: long, s: string")
    new = spark.createDataFrame([(1, ""), (2, None)], "k: long, s: string")
    got = {r["k"]: r["change"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {1: "changed", 2: "changed"}


def test_pack_sequences_spans_and_offsets(spark):
    from universal_aws_data_pipeline_spark.operators.packing import pack_sequences

    # one shard so the in-shard order is fully determined by id
    df = spark.createDataFrame(
        [(1, 10), (2, 250), (3, 0), (4, 300), (5, 6)], "doc_id: long, n: long"
    )
    got = {r["doc_id"]: r for r in pack_sequences(df, "doc_id", "n", 256, n_shards=1).collect()}
    assert 3 not in got  # empty docs occupy no stream space
    assert got[1]["tok_offset"] == 0 and got[1]["first_seq"] == 0 and got[1]["last_seq"] == 0
    # doc 2: offset 10, ends at 259 -> crosses into seq 1
    assert (got[2]["first_seq"], got[2]["last_seq"], got[2]["n_seqs"]) == (0, 1, 2)
    # doc 4: offset 260, ends at 559 -> seqs 1..2
    assert got[4]["tok_offset"] == 260
    assert (got[4]["first_seq"], got[4]["last_seq"]) == (1, 2)
    # doc 5: offset 560 -> seq 2 only
    assert (got[5]["first_seq"], got[5]["last_seq"], got[5]["n_seqs"]) == (2, 2, 1)
    # stream conservation: offsets are the exclusive prefix sum of kept docs
    assert got[5]["tok_offset"] == 10 + 250 + 300

    import pytest

    with pytest.raises(ValueError, match="positive"):
        pack_sequences(df, "doc_id", "n", 0)


def test_pack_sequences_shards_are_independent(spark):
    from universal_aws_data_pipeline_spark.operators.packing import pack_sequences

    df = spark.createDataFrame([(i, 100) for i in range(40)], "doc_id: long, n: long")
    rows = pack_sequences(df, "doc_id", "n", 128, n_shards=4).collect()
    # within each shard offsets restart at 0 and step by exactly 100
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append((r["doc_id"], r["tok_offset"]))
    assert len(by_shard) > 1
    for docs in by_shard.values():
        docs.sort()
        assert [o for _, o in docs] == [i * 100 for i in range(len(docs))]


def test_cdc_signed_rows_and_agg_merge_equal_recompute(spark):
    from universal_aws_data_pipeline_spark.operators.incremental import (
        apply_cdc_to_agg,
        cdc_signed_rows,
    )

    old = spark.createDataFrame(
        [(1, "g1", 10), (2, "g1", 20), (3, "g2", 30), (4, "g3", 40)],
        "k: long, g: string, m: long",
    )
    # 1 unchanged, 2 measure-changed, 3 migrated g2->g1, 4 removed, 5 added
    new = spark.createDataFrame(
        [(1, "g1", 10), (2, "g1", 25), (3, "g1", 30), (5, "g2", 7)],
        "k: long, g: string, m: long",
    )
    signed = cdc_signed_rows(old, new, ["k"])
    rows = [(r["k"], r["_sign"], r["g"], r["m"]) for r in signed.collect()]
    assert (1, 1, "g1", 10) not in rows and (1, -1, "g1", 10) not in rows
    assert (4, -1, "g3", 40) in rows and (5, 1, "g2", 7) in rows
    # migration becomes remove-old + add-new
    assert (3, -1, "g2", 30) in rows and (3, 1, "g1", 30) in rows

    view = old.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("m").cast("long").alias("m"),
    )
    merged = {r["g"]: (r["n_rows"], r["m"]) for r in
              apply_cdc_to_agg(view, signed, ["g"], ["m"]).collect()}
    recompute = {r["g"]: (r["n_rows"], r["m"]) for r in new.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("m").cast("long").alias("m"),
    ).collect()}
    assert merged == recompute
    assert "g3" not in merged  # emptied group retired


def test_bradley_terry_orders_by_true_strength(spark):
    from universal_aws_data_pipeline_spark.operators.preference import bradley_terry_micro

    # round-robin where a beats everyone, b beats c,d, c beats d
    comps = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")] * 3,
        "winner: string, loser: string",
    )
    got = {r["entity"]: r for r in bradley_terry_micro(comps).collect()}
    assert got["a"]["n_wins"] == 9 and got["a"]["n_games"] == 9
    assert got["d"]["n_wins"] == 0 and got["d"]["strength_micro"] == 0
    s = [got[e]["strength_micro"] for e in ("a", "b", "c", "d")]
    assert s[0] > s[1] > s[2] > s[3]


def test_hard_negatives_picks_closest_cross_label(spark):
    from universal_aws_data_pipeline_spark.operators.similarity import hard_negatives

    rows = [
        (1, 0, [1.0, 0.0]),   # anchor, label 0
        (2, 0, [0.99, 0.14]), # same label: must be ignored even though closest
        (3, 1, [0.9, 0.43]),  # cross label, cos ~0.9
        (4, 1, [0.0, 1.0]),   # cross label, cos 0
        (5, 2, [0.9, 0.43]),  # identical direction to 3, different label
    ]
    df = spark.createDataFrame(rows, "vec_id: long, label: int, embedding: array<float>")
    anchors = df.filter("vec_id = 1")
    got = hard_negatives(df, anchors, "vec_id", "label", "embedding").collect()
    assert len(got) == 1
    r = got[0]
    assert r["anchor_id"] == 1 and r["neg_id"] == 3  # tie with 5 broken by lower id
    assert r["neg_label"] == 1 and abs(r["cos_sim"] - 0.9023) < 1e-3


def test_quantile_normalize_matches_window_percent_rank(spark):
    from universal_aws_data_pipeline_spark.operators.normalize import quantile_normalize
    from pyspark.sql import Window

    import random

    rng = random.Random(7)
    rows = [(i, "g%d" % (i % 3), round(rng.random(), 2)) for i in range(300)]
    rows.append((1000, "solo", 0.5))  # single-row group -> pct 0
    df = spark.createDataFrame(rows, "id: long, g: string, v: double")
    got = quantile_normalize(df, "g", "v").collect()
    w = Window.partitionBy("g").orderBy("v")
    want = {
        r["id"]: round(r["pct"], 6)
        for r in df.select("id", F.percent_rank().over(w).alias("pct")).collect()
    }
    for r in got:
        assert r["pct_rank"] == want[r["id"]], (r["id"], r["pct_rank"], want[r["id"]])
        assert 0 <= r["bucket"] <= 9
    solo = next(r for r in got if r["id"] == 1000)
    assert solo["pct_rank"] == 0.0 and solo["bucket"] == 0


def test_agg_view_stream_matches_batch_recompute_and_replays_noop(spark, tmp_path):
    """The streaming view maintainer must equal a full group-by over the
    stream's net content at every commit, handle removals/migrations via
    signed rows, and skip replayed batch ids (delta merge is not
    idempotent)."""
    import os

    from universal_aws_data_pipeline_spark.operators.incremental import (
        agg_view_stream_fn,
    )

    def signed(rows):
        return spark.createDataFrame(rows, "g: string, m: long, _sign: int")

    state = str(tmp_path / "aggview")
    fn = agg_view_stream_fn(state, ["g"], ["m"], count_col="n_rows")
    # batch 0: inserts only
    fn(signed([("g1", 10, 1), ("g1", 20, 1), ("g2", 5, 1)]), 0)
    # batch 1: update g1/10 -> g1/15 (remove+add), remove g2/5 entirely,
    # migrate nothing, insert g3
    fn(signed([("g1", 10, -1), ("g1", 15, 1), ("g2", 5, -1), ("g3", 7, 1)]), 1)

    table = os.path.join(state, "view")
    got = {r["g"]: (r["n_rows"], r["m"]) for r in spark.read.parquet(table).collect()}
    assert got == {"g1": (2, 35), "g3": (1, 7)}  # g2 retired at count 0

    # replay of batch 1 must not double-apply
    fn(signed([("g1", 10, -1), ("g1", 15, 1), ("g2", 5, -1), ("g3", 7, 1)]), 1)
    again = {r["g"]: (r["n_rows"], r["m"]) for r in spark.read.parquet(table).collect()}
    assert again == got


def test_halflife_decay_buckets_and_cap(spark):
    from universal_aws_data_pipeline_spark.operators.temporal import halflife_decay_micro

    df = spark.createDataFrame(
        [(-5,), (0,), (179,), (180,), (360,), (1800,), (100000,)], "age: long"
    )
    got = [
        r["w"]
        for r in df.select(halflife_decay_micro(F.col("age"), 180).alias("w"))
        .orderBy("age")
        .collect()
    ]
    # future rows 0; same-bucket ages share a weight; halves per bucket;
    # ancient rows bottom out at 1e6 // 2^20 = 0 without shift wraparound
    assert got == [0, 1_000_000, 1_000_000, 500_000, 250_000, 976, 0]

    import pytest

    with pytest.raises(ValueError, match="positive"):
        halflife_decay_micro(F.col("age"), 0)


def test_referential_audit_counts_orphans(spark):
    from universal_aws_data_pipeline_spark.operators.quality import referential_audit

    child = spark.createDataFrame([(1,), (1,), (2,), (9,), (None,)], "fk: long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk: long")
    got = referential_audit([("c->p", child, "fk", parent, "pk")]).collect()
    assert len(got) == 1
    r = got[0]
    # 9 has no parent; NULL fk is an orphan by definition
    assert (r["n_children"], r["n_orphans"]) == (5, 2)
    assert r["orphan_pct"] == 0.4

    import pytest

    with pytest.raises(ValueError, match="at least one"):
        referential_audit([])


def test_dedup_repeated_blocks_keeps_first_in_order(spark):
    from universal_aws_data_pipeline_spark.operators.text import dedup_repeated_blocks

    a = "one two three four"          # block A (4 toks -> 1 block at size 4)
    b = "five six seven eight"
    # doc 1: A B A B A -> cleaned A B; doc 2: all unique; doc 3: empty
    rows = [
        (1, " ".join([a, b, a, b, a])),
        (2, " ".join([a, b])),
        (3, "   "),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {r["doc_id"]: r for r in dedup_repeated_blocks(df, block_tokens=4).collect()}
    assert 3 not in got  # empty docs dropped
    assert (got[1]["n_blocks"], got[1]["n_unique_blocks"]) == (5, 2)
    assert got[1]["cleaned_text"] == a + " " + b  # first occurrences, in order
    assert (got[2]["n_blocks"], got[2]["n_unique_blocks"]) == (2, 2)
    assert got[2]["cleaned_text"] == a + " " + b


def test_dedup_repeated_blocks_is_map_only(spark):
    from universal_aws_data_pipeline_spark.operators.text import dedup_repeated_blocks

    df = spark.createDataFrame([(1, "x y z w " * 6)], "doc_id: long, text: string")
    plan = dedup_repeated_blocks(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_agg_view_stream_through_real_stream(spark, tmp_path):
    """End-to-end agg-view maintenance through foreachBatch on a real file
    stream of signed CDC rows: the parquet view must equal a batch group-by
    over the stream's net content."""
    import os

    from universal_aws_data_pipeline_spark.operators.incremental import (
        agg_view_stream_fn,
    )

    src = tmp_path / "src"
    src.mkdir()
    # one file = one logical CDC batch: inserts, then an update + delete
    spark.createDataFrame(
        [("g1", 10, 1), ("g1", 20, 1), ("g2", 5, 1)], "g: string, m: long, _sign: int"
    ).coalesce(1).write.json(str(src / "b0"))
    spark.createDataFrame(
        [("g1", 20, -1), ("g1", 25, 1), ("g2", 5, -1)], "g: string, m: long, _sign: int"
    ).coalesce(1).write.json(str(src / "b1"))

    stream = (
        spark.readStream.schema("g string, m long, _sign int")
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    state = str(tmp_path / "aggview")
    q = (
        stream.writeStream.foreachBatch(agg_view_stream_fn(state, ["g"], ["m"]))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(90)
    got = {
        r["g"]: (r["n_rows"], r["m"])
        for r in spark.read.parquet(os.path.join(state, "view")).collect()
    }
    assert got == {"g1": (2, 35)}  # g2 retired; g1 update applied


def test_corpus_overlap_matrix_counts_and_jaccard(spark):
    from universal_aws_data_pipeline_spark.operators.retrieval import (
        corpus_overlap_matrix,
    )

    s1 = "a b c d e f g h"        # one 8-gram
    s2 = "p q r s t u v w"        # one 8-gram, disjoint
    rows = [
        (1, "A", s1), (2, "A", s2),          # A owns both shingles
        (3, "B", s1),                         # B shares s1 with A
        (4, "C", "x y z"),                    # short doc -> whole-text shingle, alone
    ]
    df = spark.createDataFrame(rows, "doc_id: long, source: string, text: string")
    got = {
        (r["src_a"], r["src_b"]): r
        for r in corpus_overlap_matrix(df, "source", "text", 8).collect()
    }
    assert set(got) == {("A", "B")}  # zero-overlap pairs absent
    r = got[("A", "B")]
    assert (r["n_overlap"], r["n_a"], r["n_b"]) == (1, 2, 1)
    assert r["jaccard"] == 0.5  # 1 / (2 + 1 - 1)


def test_scd2_asof_reconstructs_each_era(spark):
    import datetime as dt

    from universal_aws_data_pipeline_spark.operators.scd import scd2_asof

    rows = [
        # key 1: v1 closed 2024-06-01, v2 open
        (1, 100.0, dt.date(2020, 1, 1), dt.date(2024, 6, 1), False),
        (1, 200.0, dt.date(2024, 6, 1), None, True),
        # key 2: never changed
        (2, 50.0, dt.date(2020, 1, 1), None, True),
        # key 3: born after the early asof
        (3, 9.0, dt.date(2023, 5, 1), None, True),
    ]
    dim = spark.createDataFrame(
        rows, "k: long, v: double, valid_from: date, valid_to: date, is_current: boolean"
    )
    early = {r["k"]: r["v"] for r in scd2_asof(dim, dt.date(2022, 1, 1)).collect()}
    late = {r["k"]: r["v"] for r in scd2_asof(dim, dt.date(2024, 7, 1)).collect()}
    assert early == {1: 100.0, 2: 50.0}  # 3 not yet born
    assert late == {1: 200.0, 2: 50.0, 3: 9.0}
    # exactly AT the close date the NEW version is current (valid_to > asof fails)
    at = {r["k"]: r["v"] for r in scd2_asof(dim, dt.date(2024, 6, 1)).collect()}
    assert at[1] == 200.0


def test_kmeans_vq_separates_two_blobs(spark):
    """Two integer blobs far apart, k=2: every point lands with its blob's
    seed, distances are exact squared integers, centroids are floor-div
    means recomputed from the final assignment."""
    from universal_aws_data_pipeline_spark.operators.cluster import kmeans_vq

    rows = [
        (1, [0, 0]), (2, [2, 0]), (3, [0, 2]),          # blob A near origin
        (10, [100, 100]), (11, [102, 100]), (12, [100, 103]),  # blob B
    ]
    v = spark.createDataFrame(rows, "id: long, qe: array<long>")
    assigned, cent = kmeans_vq(v, dim=2, k=2, assign_rounds=2)
    got = {r["id"]: r["cid"] for r in assigned.collect()}
    assert len({got[1], got[2], got[3]}) == 1
    assert len({got[10], got[11], got[12]}) == 1
    assert got[1] != got[10]
    cv = {r["cid"]: r["cvec"] for r in cent.collect()}
    # blob A centroid: floor-div means of {0,2,0} and {0,0,2} => [0, 0]
    assert cv[got[1]] == [0, 0]
    # blob B centroid: means of {100,102,100}, {100,100,103} => [100, 101]
    assert cv[got[10]] == [100, 101]


def test_kmeans_vq_deterministic_across_partitionings(spark):
    """Integer arithmetic end-to-end: identical assignment and centroids
    whatever the input partitioning (float Lloyd drifts by sum order)."""
    from universal_aws_data_pipeline_spark.operators.cluster import kmeans_vq

    rows = [(i, [(i * 37) % 211 - 100, (i * 53) % 197 - 90]) for i in range(1, 60)]
    a1, c1 = kmeans_vq(spark.createDataFrame(rows, "id: long, qe: array<long>"), dim=2, k=4)
    a2, c2 = kmeans_vq(
        spark.createDataFrame(rows, "id: long, qe: array<long>").repartition(13),
        dim=2, k=4,
    )
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))
    assert sorted((r["cid"], tuple(r["cvec"])) for r in c1.collect()) == sorted(
        (r["cid"], tuple(r["cvec"])) for r in c2.collect()
    )
