"""Property-based tests (hypothesis): invariants that hold for ANY input —
normalization idempotence, fingerprint whitespace-invariance, required-filter
postcondition, Jaccard bounds, dedup idempotence."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from universal_aws_data_pipeline_spark.functions.texthash import (
    md5_fingerprint,
    normalize_text,
    rolling_fingerprint,
)
from universal_aws_data_pipeline_spark.operators.dedup import exact_dedup
from universal_aws_data_pipeline_spark.operators.transform import filter_required

TEXTS = st.text(alphabet="abcdefghijklmnop 0123456789.,!?-", min_size=0, max_size=60)


@settings(max_examples=8, deadline=None)
@given(st.lists(TEXTS, min_size=1, max_size=6))
def test_fingerprints_whitespace_invariant(spark, texts):
    """Fingerprints depend only on normalized content: doubling whitespace or
    changing case must not change them."""
    rows = [(i, t, "  " + t.upper().replace(" ", "   ") + " ") for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id LONG, a STRING, b STRING")
    out = df.select(
        (md5_fingerprint(F.col("a")) == md5_fingerprint(F.col("b"))).alias("md5_eq"),
        (rolling_fingerprint(F.col("a")) == rolling_fingerprint(F.col("b"))).alias("roll_eq"),
    ).collect()
    assert all(r["md5_eq"] and r["roll_eq"] for r in out)


@settings(max_examples=8, deadline=None)
@given(st.lists(TEXTS, min_size=1, max_size=6))
def test_normalize_idempotent(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "t STRING")
    out = df.select((normalize_text(normalize_text(F.col("t"))) == normalize_text(F.col("t"))).alias("eq")).collect()
    assert all(r["eq"] for r in out)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 5) | st.none(), st.integers(0, 100)),
        min_size=0,
        max_size=20,
    )
)
def test_filter_required_postcondition(spark, rows):
    """After filter_required, no nulls remain in required columns and every
    fully-non-null input row survives."""
    df = spark.createDataFrame([(k, v) for k, v in rows], "k INT, v INT")
    out = filter_required(df, ["k"]).collect()
    assert all(r["k"] is not None for r in out)
    assert len(out) == sum(1 for k, _ in rows if k is not None)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 1000)), min_size=1, max_size=20))
def test_exact_dedup_idempotent_and_minimal(spark, rows):
    df = spark.createDataFrame(rows, "key INT, seq INT")
    once = exact_dedup(df, ["key"], "seq")
    twice = exact_dedup(once, ["key"], "seq")
    got_once = sorted(map(tuple, once.collect()))
    assert got_once == sorted(map(tuple, twice.collect()))  # idempotent
    # keeps exactly the min seq per key
    expected = {}
    for k, s in rows:
        expected[k] = min(expected.get(k, s), s)
    assert got_once == sorted(expected.items())
