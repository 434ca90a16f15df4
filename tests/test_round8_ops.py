"""Round-8 verdict/advice closures.

1. VERDICT r7 item 1 — rfm_scores is size-gated: the exact global-ntile
   window path (dimension scale) and the quickselect composite-boundary
   path (corpus scale) must assign IDENTICAL quintiles, fill rule and
   custkey tiebreaks included.
2. Exemption audit follow-on — gini_micro's window-rank path and its
   two-phase stratified-prefix-count path must agree (Σ i·x is invariant
   across any rank assignment consistent with the value order).
3. ADVICE r7 — token_entropy must keep emitting a row for NULL text (the
   length-gate predicates both fail on a NULL size without the sentinel).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _rfm_rows(df):
    return sorted(
        (r["o_custkey"], r["r_score"], r["f_score"], r["m_score"], r["rfm"])
        for r in df.collect()
    )


def test_rfm_gated_path_matches_ntile_path(spark):
    from universal_aws_data_pipeline_spark.operators.segmentation import rfm_scores

    # 23 customers (not divisible by 5 — exercises the first-(n mod k)-
    # buckets-get-one-extra fill rule) with heavy ties in every measure:
    # n_orders collides across most customers, several share a last order
    # date, and two pairs share total_cents — so boundary ties are decided
    # by the custkey tiebreak on both paths.
    rows = []
    for c in range(1, 24):
        n_orders = 1 + (c % 3)  # only values 1..3 -> massive tie blocks
        for i in range(n_orders):
            rows.append(
                (
                    c,
                    f"2024-0{1 + (c % 4)}-15",  # 4 distinct dates
                    float(100 * (1 + (c % 5)) + (7 if i == 0 else 0)),
                )
            )
    orders = spark.createDataFrame(
        rows, "o_custkey: long, o_orderdate: string, o_totalprice: double"
    ).withColumn("o_orderdate", F.to_date("o_orderdate"))

    exact = rfm_scores(orders, ntile_max_rows=10**9)
    gated = rfm_scores(orders, ntile_max_rows=0)
    assert _rfm_rows(exact) == _rfm_rows(gated)


def test_rfm_gated_path_matches_on_fixture(spark, sf_dir):
    """Same agreement on the real sf0.001 orders table (1.5k customers,
    real date/value distributions)."""
    from universal_aws_data_pipeline_spark.operators.segmentation import rfm_scores

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exact = rfm_scores(orders, ntile_max_rows=10**9)
    gated = rfm_scores(orders, ntile_max_rows=0)
    assert _rfm_rows(exact) == _rfm_rows(gated)


def test_rfm_ntile_cum_ranks_fill_rule():
    from universal_aws_data_pipeline_spark.operators.segmentation import (
        _ntile_cum_ranks,
    )

    # 23 rows / 5 buckets: sizes 5,5,5,4,4 -> cumulative 5,10,15,19
    assert _ntile_cum_ranks(23, 5) == [5, 10, 15, 19]
    assert _ntile_cum_ranks(20, 5) == [4, 8, 12, 16]
    # n < buckets: first n buckets get one row each
    assert _ntile_cum_ranks(3, 5) == [1, 2, 3, 3]


def test_gini_gated_path_matches_window_path(spark):
    from universal_aws_data_pipeline_spark.operators.econ import gini_micro

    rows = []
    for g in ("a", "b"):
        for i in range(40):
            rows.append((g, (i % 7) * 10))  # tie blocks within each group
    rows.append(("c", 5))  # singleton group (gini 0)
    df = spark.createDataFrame(rows, "grp: string, v: long")

    window = {
        r["grp"]: (r["n"], r["total"], r["gini_micro"])
        for r in gini_micro(df, "grp", "v", window_max_rows=10**9).collect()
    }
    gated = {
        r["grp"]: (r["n"], r["total"], r["gini_micro"])
        for r in gini_micro(df, "grp", "v", window_max_rows=0).collect()
    }
    assert window == gated
    assert gated["c"] == (1, 5, 0)


def test_gini_drops_zero_total_groups(spark):
    from universal_aws_data_pipeline_spark.operators.econ import gini_micro

    df = spark.createDataFrame(
        [("z", 0), ("z", 0), ("a", 3), ("a", 1)], "grp: string, v: long"
    )
    got = {r["grp"] for r in gini_micro(df, "grp", "v").collect()}
    assert got == {"a"}


def test_token_entropy_null_text_emits_row(spark):
    from universal_aws_data_pipeline_spark.operators.text import token_entropy

    df = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, None), (3, "")],
        "doc_id: long, text: string",
    )
    got = {r["doc_id"]: r for r in token_entropy(df).collect()}
    assert set(got) == {1, 2, 3}, "null/empty text rows must not be dropped"
    assert got[2]["n_tokens"] is None and got[2]["entropy_nats"] is None
    assert got[1]["n_tokens"] == 3


# ---------------------------------------------------------------------------
# Round-8 operators: winsorized mean, JS divergence, OOV rate,
# group-safe split, packing audit.
# ---------------------------------------------------------------------------
def test_winsorized_mean_known_values(spark):
    from universal_aws_data_pipeline_spark.operators.robust import (
        winsorized_mean_milli,
    )

    # group a: values 1..10, f=0.1 -> lo = value at rank 1 = 1,
    # hi = value at rank 9 = 9 -> kept 1..9, mean 5 -> 5000 milli
    rows = [("a", v) for v in range(1, 11)]
    got = {
        r["grp"]: r
        for r in winsorized_mean_milli(
            spark.createDataFrame(rows, "grp: string, v: long"), "grp", "v", 0.1
        ).collect()
    }
    a = got["a"]
    assert (a["lo"], a["hi"], a["n_kept"], a["wmean_milli"]) == (1, 9, 9, 5000)


def test_js_divergence_zero_for_global_mix_and_positive_for_skew(spark):
    import math

    from universal_aws_data_pipeline_spark.operators.trend import js_divergence

    # group 1 mirrors the global mix exactly only if it IS the whole corpus;
    # build two groups with identical mixes -> both equal the global mix ->
    # JS = 0 for both; then a disjoint third group must be positive.
    rows = (
        [(1, "x")] * 2 + [(1, "y")] * 2 + [(2, "x")] * 2 + [(2, "y")] * 2
    )
    df = spark.createDataFrame(rows, "g: long, t: string")
    got = {r["g"]: r["js_nats"] for r in js_divergence(df, "g", "t").collect()}
    assert got[1] == 0.0 and got[2] == 0.0

    rows2 = [(1, "x")] * 3 + [(2, "y")] * 1
    df2 = spark.createDataFrame(rows2, "g: long, t: string")
    got2 = {r["g"]: r["js_nats"] for r in js_divergence(df2, "g", "t").collect()}
    # group 2 is pure-y vs global (3/4 x, 1/4 y):
    # term_x = 0 + q ln(q/m)/2 with p=0,q=.75,m=.375 -> .375 ln 2
    # term_y = p ln(p/m)/2 + q ln(q/m)/2 with p=1,q=.25,m=.625
    want = round(
        0.375 * math.log(2)
        + 0.5 * math.log(1 / 0.625)
        + 0.125 * math.log(0.25 / 0.625),
        4,
    )
    assert got2[2] == want
    assert got2[1] > 0


def test_oov_rate_vocab_cutoff_and_ties(spark):
    from universal_aws_data_pipeline_spark.operators.text import oov_rate

    # vocab_size=2: counts a=3, b=2, c=2, d=1 -> vocab {a, b} (b beats c on
    # the token-text tiebreak); lang en: tokens a a b c -> 1 OOV of 4;
    # lang de: tokens a b c d -> 2 OOV of 4
    df = spark.createDataFrame(
        [("en", "a a b c"), ("de", "a b c d")], "lang: string, text: string"
    )
    got = {r["lang"]: r for r in oov_rate(df, vocab_size=2).collect()}
    assert (got["en"]["n_tokens"], got["en"]["n_oov"]) == (4, 1)
    assert (got["de"]["n_tokens"], got["de"]["n_oov"]) == (4, 2)
    assert got["de"]["oov_micro"] == 500_000


def test_group_safe_split_never_straddles_groups(spark):
    from universal_aws_data_pipeline_spark.operators.sampling import (
        group_safe_split,
        hash_bucket,
    )
    from pyspark.sql import functions as F

    # 200 rows in 100 groups of 2 — every row follows its group's bucket
    rows = [(i, i // 2) for i in range(200)]
    df = spark.createDataFrame(rows, "k: long, g: long")
    audit = {r["split"]: r for r in group_safe_split(df, "k", "g").collect()}
    assert sum(r["n_rows"] for r in audit.values()) == 200
    assert sum(r["n_groups"] for r in audit.values()) == 100
    # groups of size 2 -> every row is a dup row
    assert all(r["n_dup_rows"] == r["n_rows"] for r in audit.values())
    # independent check: split-by-group == split-by-row-key for a member row
    b = df.select(
        "k", "g", (hash_bucket(F.col("g").cast("string")) % 100).alias("bkt")
    ).collect()
    by_group: dict[int, set[str]] = {}
    for r in b:
        s = "train" if r["bkt"] < 80 else ("val" if r["bkt"] < 90 else "test")
        by_group.setdefault(r["g"], set()).add(s)
    assert all(len(v) == 1 for v in by_group.values())


def test_packing_audit_waste_and_fragmentation(spark):
    from universal_aws_data_pipeline_spark.operators.packing import (
        pack_sequences,
        packing_audit,
    )

    # one shard (n_shards=1): docs of 3, 4, 2 tokens, seq_len 4 ->
    # stream 9 tokens, seqs 0..2 (3 seqs), waste 12-9=3,
    # doc1 spans seq0 only, doc2 spans 0-1 (frag), doc3 spans 1-2 (frag)
    df = spark.createDataFrame(
        [(1, 3), (2, 4), (3, 2)], "doc_id: long, n_toks: long"
    )
    packed = pack_sequences(df, "doc_id", "n_toks", seq_len=4, n_shards=1)
    a = packing_audit(packed, seq_len=4).collect()[0]
    assert (a["n_docs"], a["total_tokens"], a["n_seqs"]) == (3, 9, 3)
    assert (a["waste_tokens"], a["frag_docs"]) == (3, 2)
    assert a["fill_micro"] == (1_000_000 * 9) // 12


# ---------------------------------------------------------------------------
# Plan-shape assertions for the round-8 queries: the physical properties
# the scale rationale depends on, pinned so a Spark upgrade or refactor
# can't silently change the strategy.
# ---------------------------------------------------------------------------
def _plan(spark, name, sf_dir):
    from universal_aws_data_pipeline_spark.plans.catalog import QUERIES

    df = QUERIES[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q201_window_group_limit_pushdown(spark, sf_dir):
    """The per-item top-3 window must take Spark's WindowGroupLimit
    pushdown (per-partition top-k combine below the exchange) — the plan
    property q201's stress exemption cites."""
    p = _plan(spark, "q201_copurchase_recs", sf_dir)
    assert "WindowGroupLimit" in p


def test_q196_cutoff_joins_are_broadcast(spark, sf_dir):
    """The winsorized-mean cutoff and total tables are per-group scalars —
    every join in the plan must be broadcast (a sort-merge join here would
    mean a corpus-sized shuffle for a 3-row attach)."""
    p = _plan(spark, "q196_winsorized_revenue", sf_dir)
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p
