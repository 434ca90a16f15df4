"""Round-9 operator tests: ADVICE-fix contracts (NULL semantics, scan
counts), the batched multi-rank quickselect engine, and the size-gated
exact-percentile devices that close the q145/q146/q147 class."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_word_shingles_null_text_stays_null(spark):
    """NULL text must shingle to [NULL] (the DuckDB oracle's `ELSE [norm]`
    branch), never collide with an empty-string document's [\"\"] (round-8
    ADVICE: concat_ws never returns NULL)."""
    from universal_aws_data_pipeline_spark.functions.texthash import word_shingles

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "one two"), (4, "a b c d")], "id long, text string"
    )
    got = {
        r["id"]: r["sh"]
        for r in df.select("id", word_shingles(F.col("text"), 3).alias("sh")).collect()
    }
    assert got[1] == [None]
    assert got[2] == [""]
    assert got[1] != got[2]  # the collision the guard prevents
    assert got[3] == ["one two"]
    assert got[4] == ["a b c", "b c d"]


def test_group_safe_split_keeps_null_group_rows(spark):
    """Rows with a NULL group key are singleton groups keyed by the row key
    (the q199 convention): they appear in exactly one split and the audit's
    n_rows totals the input (round-8 ADVICE: the inner size join used to
    drop them)."""
    from universal_aws_data_pipeline_spark.operators.sampling import group_safe_split

    rows = [(i, "g1" if i < 4 else None) for i in range(10)]
    df = spark.createDataFrame(rows, "k long, g string")
    audit = group_safe_split(df, "k", "g").collect()
    assert sum(r["n_rows"] for r in audit) == 10
    # the 4 g1 rows are dup-group rows; the 6 null-group singletons are not
    assert sum(r["n_dup_rows"] for r in audit) == 4
    assert sum(r["n_groups"] for r in audit) == 7  # g1 + 6 singletons


def test_js_divergence_single_corpus_scan(spark):
    """The corpus is scanned exactly once: cells is checkpointed and gtot /
    per-group totals / N derive from it (round-8 ADVICE: three scans)."""
    from universal_aws_data_pipeline_spark.operators.trend import js_divergence

    calls = {"n": 0}
    base = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x")], "g string, t string"
    )

    def counting_scan(df):
        # mapInPandas side-channel: every executed scan of the input bumps
        # a driver-side accumulator
        acc = spark.sparkContext.accumulator(0)

        def fn(it):
            for pdf in it:
                acc.add(len(pdf))
                yield pdf

        return df.mapInPandas(fn, df.schema), acc

    scanned, acc = counting_scan(base)
    out = js_divergence(scanned, "g", "t").collect()
    assert len(out) == 2
    assert acc.value == 3, f"input rows seen {acc.value}x, expected one scan"
