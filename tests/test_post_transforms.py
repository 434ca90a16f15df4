"""Declarative post-transform stages (config-driven LLM-pipeline operators)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from universal_aws_data_pipeline_spark.config.model import SourceConfig
from universal_aws_data_pipeline_spark.operators.post import apply_post_transforms
from universal_aws_data_pipeline_spark.runner import PipelineRunner


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id: long, text: string, ts: long")


def test_exact_dedup_spec(spark):
    df = _docs(spark, [(1, "a", 10), (1, "a-late", 20), (2, "b", 5)])
    out = apply_post_transforms(df, [{"op": "exact_dedup", "keys": ["doc_id"], "order_by": "ts"}])
    got = {(r["doc_id"], r["text"]) for r in out.collect()}
    assert got == {(1, "a"), (2, "b")}


def test_neardup_filter_spec_keeps_first(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = _docs(spark, [(1, base, 0), (2, base + " tail", 0), (3, "totally different words here entirely", 0)])
    out = apply_post_transforms(
        df, [{"op": "neardup_filter", "id": "doc_id", "column": "text", "threshold": 0.5}]
    )
    assert {r["doc_id"] for r in out.collect()} == {1, 3}


def test_redact_and_repetition_specs(spark):
    df = _docs(
        spark,
        [
            (1, "mail me at bob@example.com now", 0),
            (2, "spam spam spam spam spam spam spam spam spam ham", 0),
        ],
    )
    out = apply_post_transforms(
        df,
        [
            {"op": "repetition_filter", "column": "text", "max_dup_word_frac": 0.7},
            {"op": "redact_pii", "column": "text"},
        ],
    )
    rows = out.collect()
    assert [r["doc_id"] for r in rows] == [1]
    assert rows[0]["text"] == "mail me at [EMAIL] now"


def test_hash_sample_spec(spark):
    df = spark.range(0, 1000).select(F.col("id").alias("doc_id"), F.lit("t").alias("text"), F.lit(0).alias("ts"))
    out = apply_post_transforms(df, [{"op": "hash_sample", "key": "doc_id", "fraction": 0.25}])
    assert 150 < out.count() < 350


def test_unknown_op_raises(spark):
    with pytest.raises(ValueError, match="unknown post_transform"):
        apply_post_transforms(_docs(spark, [(1, "x", 0)]), [{"op": "nope"}])


def test_cross_row_op_rejected_on_stream(spark, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    (d / "b0.json").write_text(json.dumps({"doc_id": 1, "text": "x", "ts": 1}) + "\n")
    stream = spark.readStream.schema("doc_id LONG, text STRING, ts LONG").json(str(d))
    with pytest.raises(ValueError, match="cannot run on a stream"):
        apply_post_transforms(stream, [{"op": "exact_dedup", "keys": ["doc_id"], "order_by": "ts"}])


def test_runner_config_driven_post_transforms(spark, tmp_path):
    """E2E: a config file with post_transforms runs dedup + PII redaction
    through the PipelineRunner's batch path."""
    raw = tmp_path / "raw"
    raw.mkdir()
    rows = [
        {"id": 1, "text": "contact alice@corp.example please", "ts": 1},
        {"id": 1, "text": "dup of one", "ts": 2},
        {"id": 2, "text": "clean row", "ts": 1},
    ]
    with open(raw / "p0.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    cfg = SourceConfig.from_dict(
        {
            "name": "docs",
            "type": "file",
            "data_format": "json",
            "input_path": str(raw),
            "schema": {
                "mapping": {"doc_id": "id", "text": "text", "ts": "ts"},
                "required": ["doc_id"],
                "transformations": [{"field": "ts", "type": "long"}],
            },
            "post_transforms": [
                {"op": "exact_dedup", "keys": ["doc_id"], "order_by": "ts"},
                {"op": "redact_pii", "column": "text"},
            ],
            "destination": {"path": str(tmp_path / "out"), "partition_by": []},
            "retry": {"attempts": 1, "interval_seconds": 0.0},
        }
    )
    result = PipelineRunner(spark).run(cfg)
    assert result.status == "success", result.error
    out = {r["doc_id"]: r["text"] for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert out[1] == "contact [EMAIL] please"
    assert set(out) == {1, 2}


def test_span_dedup_filter_stage(spark):
    base = "a b c d e f g h i j"
    df = spark.createDataFrame(
        [(1, base, "en"), (2, base, "en"), (3, "k l m n o p q r s t", "en")],
        "doc_id LONG, text STRING, lang STRING",
    )
    out = apply_post_transforms(
        df, [{"op": "span_dedup_filter", "span_n": 8, "max_dup_span_frac": 0.5}]
    )
    assert {r["doc_id"] for r in out.collect()} == {1, 3}


def test_quality_calibration_filter_stage(spark):
    rows = [(i, "the quick brown fox jumps over the lazy dog " * 3, "en") for i in range(8)]
    rows += [(100 + i, "1 2 3 4 5 .. !! ??", "en") for i in range(2)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING")
    # drop_fraction 0.3 -> cutoff = 3rd-smallest quality = the prose value
    # (the two junk docs tie below it; an inclusive >= at their own value
    # would keep them, which is why 0.2 would NOT cut anything here)
    out = apply_post_transforms(
        df, [{"op": "quality_calibration_filter", "drop_fraction": 0.3}]
    )
    kept = {r["doc_id"] for r in out.collect()}
    assert all(i in kept for i in range(8))        # prose survives
    assert not any(100 + i in kept for i in range(2))  # digit soup is cut
    assert set(out.columns) == {"doc_id", "text", "lang"}  # helper cols dropped


def test_temperature_rebalance_stage_and_stream_rejection(spark):
    rows = [(i, "t", "head") for i in range(400)] + [(1000 + i, "t", "tail") for i in range(25)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING")
    out = apply_post_transforms(df, [{"op": "temperature_rebalance", "fraction": 0.3}])
    by_lang = {r["lang"] for r in out.collect()}
    assert by_lang == {"head", "tail"}
    assert set(out.columns) == {"doc_id", "text", "lang"}

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
        .selectExpr("value AS doc_id", "'x' AS text", "'en' AS lang")
    )
    import pytest as _pytest

    for op in ("span_dedup_filter", "quality_calibration_filter", "temperature_rebalance"):
        with _pytest.raises(ValueError, match="cross-row"):
            apply_post_transforms(stream, [{"op": op}])


def test_runner_config_driven_round4_stages(spark, tmp_path):
    """E2E: span dedup + learned quality cutoff + temperature rebalance
    declared in a config file, run through PipelineRunner's batch path."""
    raw = tmp_path / "raw4"
    raw.mkdir()
    prose = "the quick brown fox jumps over the lazy dog again and again"
    rows = (
        [{"id": i, "text": prose + f" extra{i}", "lang": "en"} for i in range(8)]
        + [{"id": 100, "text": prose + " extra0", "lang": "en"}]  # span-dup of id 0
        + [{"id": 200 + i, "text": f"tail doc {i} unique words here friend", "lang": "de"}
           for i in range(4)]
    )
    with open(raw / "p0.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    cfg = SourceConfig.from_dict(
        {
            "name": "docs4",
            "type": "file",
            "data_format": "json",
            "input_path": str(raw),
            "schema": {
                "mapping": {"doc_id": "id", "text": "text", "lang": "lang"},
                "required": ["doc_id"],
                "transformations": [],
            },
            "post_transforms": [
                {"op": "span_dedup_filter", "span_n": 8, "max_dup_span_frac": 0.5},
                {"op": "quality_calibration_filter", "drop_fraction": 0.1},
                {"op": "temperature_rebalance", "fraction": 0.9},
            ],
            "destination": {"path": str(tmp_path / "out4"), "partition_by": []},
            "retry": {"attempts": 1, "interval_seconds": 0.0},
        }
    )
    result = PipelineRunner(spark).run(cfg)
    assert result.status == "success", result.error
    kept = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "out4")).collect()}
    assert 0 in kept                        # the first owner of the prose spans survives
    # every other en doc shares the 12-token prose prefix's 8-gram spans
    # with doc 0 -> all are span-dups under keep-first, including the clone
    assert not (kept & set(range(1, 9))) and 100 not in kept
    assert len(kept & {200, 201, 202, 203}) >= 2  # tail language largely survives


def test_gopher_filter_stage(spark):
    good = (
        "the quick brown fox jumps over the lazy dog and then runs back to the "
        "barn with a bone that it found by the river while the farmer was busy "
        "in the field and the sun was high over the hills so the day felt warm "
        "and long to everyone who came out to watch the animals play in the "
        "open yard near the old wooden gate"
    )
    df = _docs(spark, [(1, good, 0), (2, "too short", 0)])
    out = apply_post_transforms(df, [{"op": "gopher_filter", "column": "text"}])
    assert [r["doc_id"] for r in out.collect()] == [1]
    # custom bounds flip the decision
    out2 = apply_post_transforms(df, [{"op": "gopher_filter", "column": "text", "min_words": 200}])
    assert out2.count() == 0


def test_bloom_dedup_stage_and_stream_rejection(spark, tmp_path):
    from universal_aws_data_pipeline_spark.operators.bloom import build_bloom, save_bloom

    corpus = _docs(spark, [(i, f"corpus doc {i}", 0) for i in range(50)])
    corpus_path = str(tmp_path / "corpus")
    corpus.write.parquet(corpus_path)
    index_path = str(tmp_path / "bloom")
    save_bloom(build_bloom(corpus, "text"), index_path)

    batch = _docs(spark, [(100, "corpus doc 7", 0), (101, "brand new doc", 0)])
    out = apply_post_transforms(
        batch,
        [{"op": "bloom_dedup", "column": "text", "index_path": index_path, "corpus_path": corpus_path}],
    )
    assert [r["doc_id"] for r in out.collect()] == [101]

    stream = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    with pytest.raises(ValueError, match="cannot run on a stream"):
        apply_post_transforms(
            stream.withColumn("text", F.lit("x")),
            [{"op": "bloom_dedup", "column": "text", "index_path": index_path, "corpus_path": corpus_path}],
        )


def test_gopher_filter_runs_on_a_real_stream(spark, tmp_path):
    """Row-local stages must pass through the streaming path unchanged —
    gopher_filter applied to a file stream drops failing docs per micro-batch."""
    good = (
        "the quick brown fox jumps over the lazy dog and then runs back to the "
        "barn with a bone that it found by the river while the farmer was busy "
        "in the field and the sun was high over the hills so the day felt warm "
        "and long to everyone who came out to watch the animals play in the "
        "open yard near the old wooden gate"
    )
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(
        [(1, good), (2, "way too short")], "doc_id: long, text: string"
    ).coalesce(1).write.json(str(src / "batch0"))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("recursiveFileLookup", "true")
        .json(str(src))
    )
    filtered = apply_post_transforms(stream, [{"op": "gopher_filter", "column": "text"}])
    assert filtered.isStreaming
    q = (
        filtered.writeStream.format("memory")
        .queryName("gopher_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = spark.sql("select doc_id from gopher_stream").collect()
    assert [r["doc_id"] for r in rows] == [1]


def test_span_surgery_stage_rewrites_text_in_place(spark):
    rows = [
        (1, "one two three four five six seven eight nine ten", 0),
        (2, "zzz one two three four five six seven eight yyy", 0),
    ]
    df = _docs(spark, rows)
    out = apply_post_transforms(df, [{"op": "span_surgery", "id": "doc_id", "column": "text"}])
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert got[1] == rows[0][1]
    assert got[2] == "zzz yyy"
    assert set(out.columns) == {"doc_id", "text", "ts"}  # other columns carried through


def test_runner_config_driven_round5_stages(spark, tmp_path):
    """E2E: gopher_filter + span_surgery + bloom_dedup as config stages
    through the PipelineRunner's batch path — filter the junk, excise the
    copied span, drop the exact corpus duplicate."""
    from universal_aws_data_pipeline_spark.operators.bloom import build_bloom, save_bloom

    good_a = (
        "the quick brown fox jumps over the lazy dog and then runs back to the "
        "barn with a bone that it found by the river while the farmer was busy "
        "in the field and the sun was high over the hills so the day felt warm "
        "and long to everyone who came out to watch the animals play in the "
        "open yard near the old wooden gate"
    )
    # same length/stopword profile, shares an 8-token run with good_a
    good_b = (
        "every morning the children walk down to the shore and then runs back to the "
        "barn with a bone that they trade for shells while the fishermen tell the "
        "stories of the sea and the wind was strong over the water so the trip felt "
        "short and bright to everyone who came along to help the crews pull in the "
        "heavy nets near the old stone pier"
    )
    corpus = spark.createDataFrame([(900, "already ingested doc body")], ["doc_id", "text"])
    corpus_path = str(tmp_path / "corpus")
    corpus.write.parquet(corpus_path)
    index_path = str(tmp_path / "bloomidx")
    save_bloom(build_bloom(corpus, "text"), index_path)

    raw = tmp_path / "raw"
    raw.mkdir()
    rows = [
        {"id": 1, "text": good_a, "ts": 1},
        {"id": 2, "text": good_b, "ts": 1},
        {"id": 3, "text": "way too short", "ts": 1},  # gopher reject
        {"id": 4, "text": "already ingested doc body", "ts": 1},  # exact corpus dup
    ]
    with open(raw / "p0.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    cfg = SourceConfig.from_dict(
        {
            "name": "docs5",
            "type": "file",
            "data_format": "json",
            "input_path": str(raw),
            "schema": {"mapping": {"doc_id": "id", "text": "text", "ts": "ts"}, "required": ["doc_id"]},
            "post_transforms": [
                {"op": "bloom_dedup", "column": "text", "index_path": index_path, "corpus_path": corpus_path},
                {"op": "gopher_filter", "column": "text"},
                {"op": "span_surgery", "id": "doc_id", "column": "text"},
            ],
            "destination": {"path": str(tmp_path / "out"), "partition_by": []},
            "retry": {"attempts": 1, "interval_seconds": 0.0},
        }
    )
    result = PipelineRunner(spark).run(cfg)
    assert result.status == "success", result.error
    out = {r["doc_id"]: r["text"] for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert set(out) == {1, 2}  # 3 failed gopher, 4 was an exact corpus dup
    assert out[1] == good_a  # first doc owns its spans — untouched
    # doc 2 lost exactly the span it shares with doc 1
    assert "runs back to the barn with a bone" not in out[2]
    assert "every morning the children walk down to the shore" in out[2]


def test_bloom_after_span_surgery_composition(spark, tmp_path):
    """Regression: bloom probing a join-derived text column (span_surgery
    output) used to hit Spark 4.1's interpreted-subexpression proxy internal
    error inside the probe UDF's hash args; the stage's lineage barrier
    prevents it. Also checks the semantics: a doc whose SURGERY RESULT equals
    a corpus doc is dropped."""
    from universal_aws_data_pipeline_spark.operators.bloom import build_bloom, save_bloom

    corpus = spark.createDataFrame([(900, "zzz yyy")], ["doc_id", "text"])
    corpus_path = str(tmp_path / "corpus")
    corpus.write.parquet(corpus_path)
    index_path = str(tmp_path / "bloomidx")
    save_bloom(build_bloom(corpus, "text"), index_path)

    rows = [
        (1, "one two three four five six seven eight nine ten", 0),
        (2, "zzz one two three four five six seven eight yyy", 0),  # surgery → "zzz yyy" → corpus dup
    ]
    out = apply_post_transforms(
        _docs(spark, rows),
        [
            {"op": "span_surgery", "id": "doc_id", "column": "text"},
            {"op": "bloom_dedup", "column": "text", "index_path": index_path, "corpus_path": corpus_path},
        ],
    )
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert set(got) == {1}
    assert got[1] == rows[0][1]


def test_domain_cap_post_transform(spark):
    """The C4/RefinedWeb ceiling as a declarative config step: schema
    passes through unchanged (governance internals dropped), the kept
    set matches the operator, and streaming frames are rejected like
    every cross-row op."""
    from universal_aws_data_pipeline_spark.operators.post import apply_post_transforms

    df = spark.createDataFrame(
        [("a", 1, 0.9, 100), ("a", 2, 0.8, 150), ("a", 3, 0.7, 200),
         ("b", 4, 0.5, 10)],
        "source string, doc_id long, quality double, n_tokens long",
    )
    out = apply_post_transforms(
        df,
        [{"op": "domain_cap", "domain": "source", "doc_cap": 2,
          "token_cap": 300, "quality": "quality", "id": "doc_id",
          "tokens": "n_tokens"}],
    )
    assert out.columns == df.columns
    assert {(r.source, r.doc_id) for r in out.collect()} == {
        ("a", 1), ("a", 2), ("b", 4)
    }
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .selectExpr("CAST(value AS STRING) AS source", "value AS doc_id")
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="cross-row"):
        apply_post_transforms(stream, [{"op": "domain_cap", "doc_cap": 1}])
