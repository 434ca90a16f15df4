"""Round-6 regression tests for the round-5 ADVICE findings plus the
operators added this round."""

from __future__ import annotations

import pytest


# ---------------------------------------------------------------------------
# ADVICE: boolean_search terms must go through the same normalization as
# document tokens (punctuation/casing used to make a term silently unmatchable)
# ---------------------------------------------------------------------------
def test_boolean_search_term_normalization(spark):
    from universal_aws_data_pipeline_spark.operators.retrieval import boolean_search

    df = spark.createDataFrame(
        [(1, "The state-store commit protocol"), (2, "nothing relevant")],
        "doc_id: long, text: string",
    )
    # tokens_col normalizes "state-store" -> "state store"; a quoted or
    # punctuated single-token term must still match after normalization
    got = {r["doc_id"] for r in boolean_search(df, ["'Commit'", "PROTOCOL!"]).collect()}
    assert got == {1}
    # a phrase (multi-token after normalization) is set-membership-ambiguous
    with pytest.raises(ValueError, match="3 tokens"):
        boolean_search(df, ["state-store commit"])
    # a term that normalizes away entirely can never match
    with pytest.raises(ValueError, match="0 tokens"):
        boolean_search(df, ["!!!"])


def test_boolean_search_python_normalizer_matches_spark(spark):
    """Parity pin for the Python mirror of texthash.normalize_text used on
    the term list: both normalizers must agree on adversarial inputs."""
    import re

    from pyspark.sql import functions as F

    from universal_aws_data_pipeline_spark.functions.texthash import normalize_text

    samples = [
        "Mixed-CASE", "tabs\tand\nnewlines", "düsseldorf", "a--b", "x9",
        "trailing!  ", "  .lead", "UPPER_lower-42", "no1şé2no",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "raw: string")
    spark_side = [
        r["n"] for r in df.select(normalize_text(F.col("raw")).alias("n")).collect()
    ]
    py_side = [re.sub(r"[^a-z0-9]+", " ", s.lower()).strip() for s in samples]
    assert spark_side == py_side


# ---------------------------------------------------------------------------
# ADVICE: chunk_documents stride validation (stride=0 used to null the DIV
# and silently drop every long document)
# ---------------------------------------------------------------------------
def test_chunk_documents_rejects_bad_stride(spark):
    from universal_aws_data_pipeline_spark.operators.text import chunk_documents

    df = spark.createDataFrame([(1, "a b c")], "doc_id: long, text: string")
    for bad in (0, -3, 65):
        with pytest.raises(ValueError, match="stride"):
            chunk_documents(df, chunk_tokens=64, stride=bad)
    with pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents(df, chunk_tokens=0, stride=1)
    # boundary: stride == chunk_tokens is the non-overlapping tiling
    got = sorted(
        (r["chunk_idx"], r["n_tokens"])
        for r in chunk_documents(df, chunk_tokens=2, stride=2).collect()
    )
    assert got == [(0, 2), (1, 1)]


# ---------------------------------------------------------------------------
# ADVICE: mixture_plan must surface weighted sources with zero corpus rows
# (typo'd names / empty domains used to vanish from the plan)
# ---------------------------------------------------------------------------
def test_mixture_plan_emits_zero_row_sources(spark):
    from universal_aws_data_pipeline_spark.operators.sampling import mixture_plan

    df = spark.createDataFrame(
        [("a", 100)] * 5 + [("b", 100)] * 50,
        "source: string, n_tokens: long",
    )
    got = {
        r["source"]: r
        for r in mixture_plan(df, {"a": 0.4, "b": 0.4, "web_typo": 0.2}, 2000).collect()
    }
    assert set(got) == {"a", "b", "web_typo"}
    missing = got["web_typo"]
    assert missing["n_docs"] == 0 and missing["n_tokens"] == 0
    assert missing["target_tokens"] == 400  # its budget share stays visible
    assert missing["rate"] == 1.0 and missing["expected_tokens"] == 0
    # present sources unchanged by the join rewrite
    assert got["a"]["rate"] == 1.0 and got["a"]["expected_tokens"] == 500
    assert got["b"]["rate"] == pytest.approx(0.16) and got["b"]["expected_tokens"] == 800

    with pytest.raises(ValueError, match="non-empty"):
        mixture_plan(df, {}, 1000)


# ---------------------------------------------------------------------------
# ADVICE: _split_mjpeg must not terminate a frame on an EOI embedded inside
# an APPn payload (EXIF thumbnails are whole JPEGs)
# ---------------------------------------------------------------------------
def _jpeg_with_exif_thumbnail(fill: bytes) -> bytes:
    thumb = b"\xff\xd8" + b"\x11" * 6 + b"\xff\xd9"  # embedded JPEG w/ own EOI
    app1_payload = b"Exif\x00\x00" + thumb
    app1 = b"\xff\xe1" + (len(app1_payload) + 2).to_bytes(2, "big") + app1_payload
    # SOS header (length 2) then entropy-ish data with FF00 stuffing
    sos = b"\xff\xda\x00\x02" + fill.replace(b"\xff", b"\xff\x00")
    return b"\xff\xd8" + app1 + sos + b"\xff\xd9"


def test_split_mjpeg_skips_appn_embedded_eoi():
    from universal_aws_data_pipeline_spark.operators.multimodal import _split_mjpeg

    f1 = _jpeg_with_exif_thumbnail(b"abc\xffdef")
    f2 = _jpeg_with_exif_thumbnail(b"xyz")
    frames = _split_mjpeg(f1 + f2)
    # naive FFD9 scan would cut frame 1 at the thumbnail's EOI
    assert frames == [f1, f2]


def test_split_mjpeg_drops_truncated_tail():
    from universal_aws_data_pipeline_spark.operators.multimodal import _split_mjpeg

    whole = b"\xff\xd8" + b"ok" + b"\xff\xd9"
    truncated = b"\xff\xd8" + b"no eoi here"
    assert _split_mjpeg(whole + truncated) == [whole]


def test_split_mjpeg_plain_concatenation_still_splits():
    from universal_aws_data_pipeline_spark.operators.multimodal import _split_mjpeg

    frames = [b"\xff\xd8" + bytes([i]) * (4 + i) + b"\xff\xd9" for i in range(3)]
    assert _split_mjpeg(b"".join(frames)) == frames


# ---------------------------------------------------------------------------
# round-6 operators
# ---------------------------------------------------------------------------
def test_association_rules_exact_micro_units(spark):
    from universal_aws_data_pipeline_spark.operators.itemsets import association_rules

    baskets = spark.createDataFrame(
        [(1, "A"), (1, "B"), (1, "C"), (2, "A"), (2, "B"), (3, "A"), (3, "B"), (4, "A"), (4, "C")],
        "o: long, p: string",
    )
    pairs = spark.createDataFrame(
        [("A", "B", 3), ("A", "C", 2), ("B", "C", 1)], "a: string, b: string, support: long"
    )
    got = {
        (r["ante"], r["cons"]): (r["support"], r["conf_micro"], r["lift_micro"])
        for r in association_rules(pairs, baskets, basket_col="o", item_col="p").collect()
    }
    # BC support 1 < min_support=2 dropped; n_A=4 n_B=3 n_C=2 N=4
    assert got[("A", "B")] == (3, 750_000, 1_000_000)   # 3/4; 3*4/(4*3)
    assert got[("B", "A")] == (3, 1_000_000, 1_000_000)
    assert got[("A", "C")] == (2, 500_000, 1_000_000)   # 2/4; 2*4/(4*2)
    assert got[("C", "A")] == (2, 1_000_000, 1_000_000)
    assert set(got) == {("A", "B"), ("B", "A"), ("A", "C"), ("C", "A")}


def test_dow_seasonal_index_exact(spark):
    from universal_aws_data_pipeline_spark.operators.seasonal import dow_seasonal_index
    from pyspark.sql import functions as F

    # 2024-01-01 is a Monday. Mondays earn $2, Tuesdays $1, two weeks.
    rows = []
    for week in (0, 1):
        rows.append((f"2024-01-{1 + 7 * week:02d} 10:00:00", 2.0))
        rows.append((f"2024-01-{2 + 7 * week:02d} 10:00:00", 1.0))
    df = spark.createDataFrame(rows, "ts: string, v: double").select(
        F.col("ts").cast("timestamp_ntz").alias("ts"), "v"
    )
    got = {r["weekday"]: r for r in dow_seasonal_index(df, "ts", F.round(F.col("v") * 100, 0).cast("long")).collect()}
    assert set(got) == {1, 2}
    assert got[1]["n_days"] == 2 and got[1]["mean_cents"] == 200
    assert got[2]["mean_cents"] == 100
    # global daily mean = 150 cents -> indexes 1333333 and 666666 (floor div)
    assert got[1]["seasonal_micro"] == (1_000_000 * 200) // 150
    assert got[2]["seasonal_micro"] == (1_000_000 * 100) // 150


def test_token_entropy_known_values(spark):
    import math

    from universal_aws_data_pipeline_spark.operators.text import token_entropy

    df = spark.createDataFrame(
        [(1, "spam spam spam spam"), (2, "all four tokens differ"), (3, "a a b b")],
        "doc_id: long, text: string",
    )
    got = {r["doc_id"]: r for r in token_entropy(df).collect()}
    assert got[1]["entropy_nats"] == 0.0 and got[1]["n_distinct"] == 1
    assert got[2]["entropy_nats"] == round(math.log(4), 4)
    assert got[3]["entropy_nats"] == round(math.log(2), 4)


def test_source_kl_divergence_zero_for_identical_and_positive_for_disjoint(spark):
    from universal_aws_data_pipeline_spark.operators.text import source_kl_divergence

    import math

    df = spark.createDataFrame(
        [("s1", "alpha beta gamma"), ("s2", "alpha beta gamma"), ("s3", "delta")],
        "source: string, text: string",
    )
    got = {r["source"]: r["kl_nats"] for r in source_kl_divergence(df).collect()}
    # global: alpha/beta/gamma 2/7 each, delta 1/7.
    # s1 == s2 (same distribution): KL = ln(7/6); s3 (disjoint singleton):
    # KL = ln(7) — idiosyncratic vocab diverges harder
    assert got["s1"] == got["s2"] == round(math.log(7 / 6), 4)
    assert got["s3"] == round(math.log(7), 4)


def test_histogram_quantiles_track_exact_within_bin_width(spark, sf_dir):
    from pyspark.sql import functions as F

    from universal_aws_data_pipeline_spark.operators.sketch import (
        histogram_quantiles,
        value_histogram,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    hist = value_histogram(li, cents, 0, 100_000, 120)
    got = {r["p_mille"]: r["est_cents"] for r in histogram_quantiles(hist, [500, 900, 990], 0, 100_000).collect()}
    exact = li.select(
        F.expr("percentile(cast(round(l_extendedprice * 100, 0) as bigint), array(0.5, 0.9, 0.99))").alias("p")
    ).head()["p"]
    for p_mille, ex in zip((500, 900, 990), exact):
        assert abs(got[p_mille] - ex) <= 100_000, f"p{p_mille}: {got[p_mille]} vs {ex}"


def test_histogram_merges_by_addition(spark):
    from pyspark.sql import functions as F

    from universal_aws_data_pipeline_spark.operators.sketch import value_histogram

    df = spark.createDataFrame([(float(v),) for v in range(100)], "v: double")
    cents = F.round(F.col("v") * 100, 0).cast("long")
    whole = {r["bin"]: r["c"] for r in value_histogram(df, cents, 0, 1000, 10).collect()}
    h1 = {r["bin"]: r["c"] for r in value_histogram(df.filter("v < 37"), cents, 0, 1000, 10).collect()}
    h2 = {r["bin"]: r["c"] for r in value_histogram(df.filter("v >= 37"), cents, 0, 1000, 10).collect()}
    merged = {b: h1.get(b, 0) + h2.get(b, 0) for b in set(h1) | set(h2)}
    assert merged == whole


def test_link_prediction_star_and_cap(spark):
    from universal_aws_data_pipeline_spark.operators.graph import link_prediction

    # star: c adjacent to x,y,z; plus existing edge (x,y) which must be
    # excluded from predictions
    edges = spark.createDataFrame(
        [(10, 1), (10, 2), (10, 3), (1, 2)], "a: long, b: long"
    )
    got = {
        (r["x"], r["y"]): (r["common"], r["ra_micro"])
        for r in link_prediction(edges, min_common=1, max_center_degree=64).collect()
    }
    # non-adjacent pairs through c (deg 3): (1,3) and (2,3); (1,2) is an edge.
    # x=1 has deg 2, so (2,3) also arises through... no: 1's neighbors are
    # {10, 2} -> wedge (2, 10)? 10 < 2 is false for longs — pair (2,10).
    # (2,10) adjacent -> excluded. Same for (1,10) via center 2.
    assert got[(1, 3)] == (1, 1_000_000 // 3)
    assert got[(2, 3)] == (1, 1_000_000 // 3)
    assert (1, 2) not in got
    # cap: excluding centers with deg > 2 removes c's wedges entirely
    capped = link_prediction(edges, min_common=1, max_center_degree=2).collect()
    assert {(r["x"], r["y"]) for r in capped} == set()


def test_embedding_dim_stats_exact_moments(spark):
    from universal_aws_data_pipeline_spark.operators.similarity import embedding_dim_stats

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 2.0])], "vec_id: long, embedding: array<double>"
    )
    got = {r["dim"]: r for r in embedding_dim_stats(df).collect()}
    assert got[1]["mean"] == 0.5 and got[1]["var"] == 0.25
    assert got[2]["mean"] == 1.0 and got[2]["var"] == 1.0
    assert got[1]["min_q"] == 0 and got[1]["max_q"] == 1_000_000
    assert got[2]["max_q"] == 2_000_000


def test_mutual_nearest_neighbors_kills_asymmetric_hub_matches(spark):
    from universal_aws_data_pipeline_spark.operators.similarity import (
        mutual_nearest_neighbors,
    )

    # one block: a and b are each other's best; hub h is closest to c but
    # c is NOT h's best (h prefers a) -> (c, h) must not pair
    vecs = [
        (1, [1.0, 0.0, 0.0], 0),       # a
        (2, [0.99, 0.1, 0.0], 0),      # b ~ a
        (3, [0.0, 1.0, 0.2], 0),       # c
        (4, [0.5, 0.5, 0.1], 0),       # h (hub): closer to a/b than to c
    ]
    df = spark.createDataFrame(vecs, "vec_id: long, embedding: array<double>, label: int")
    got = {(r["x"], r["y"]) for r in mutual_nearest_neighbors(df).collect()}
    assert (1, 2) in got
    assert all(3 not in pair or 4 not in pair for pair in got)  # no (3,4)
    # blocks never cross: same geometry in two labels yields pairs per block
    df2 = df.unionByName(
        spark.createDataFrame(
            [(11, [1.0, 0.0, 0.0], 1), (12, [0.99, 0.1, 0.0], 1)],
            "vec_id: long, embedding: array<double>, label: int",
        )
    )
    got2 = {(r["x"], r["y"]) for r in mutual_nearest_neighbors(df2).collect()}
    assert (11, 12) in got2 and (1, 11) not in got2


def test_quota_allocation_sums_to_budget_and_orders_remainders(spark):
    from universal_aws_data_pipeline_spark.operators.sampling import quota_allocation

    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 4 + [("c",)] * 2, "source: string"
    )
    # budget 10 over 11 rows: floors = 4, 3, 1 (sum 8); remainders
    # a: 50%11=6, b: 40%11=7, c: 20%11=9 -> c and b get the 2 leftovers
    got = {r["source"]: r["quota"] for r in quota_allocation(df, 10).collect()}
    assert got == {"a": 4, "b": 4, "c": 2}
    assert sum(got.values()) == 10
    import pytest

    with pytest.raises(ValueError, match="budget"):
        quota_allocation(df, 0)


def test_histogram_stream_matches_batch_twin_and_replays_noop(spark, tmp_path):
    from pyspark.sql import functions as F

    from universal_aws_data_pipeline_spark.operators.sketch import (
        histogram_quantiles,
        histogram_stream_fn,
        value_histogram,
    )

    b0 = spark.createDataFrame([(float(v),) for v in range(60)], "price: double")
    b1 = spark.createDataFrame([(float(v),) for v in range(60, 100)], "price: double")
    state = str(tmp_path / "hist")
    fn = histogram_stream_fn(state, "cast(round(price * 100, 0) as bigint)", 0, 1000, 10)
    fn(b0, 0)
    fn(b1, 1)
    fn(b1, 1)  # foreachBatch replay must be a no-op (sum-merge not idempotent)

    import os

    got = {
        r["bin"]: r["c"] for r in spark.read.parquet(os.path.join(state, "bins")).collect()
    }
    whole = value_histogram(
        b0.unionByName(b1), F.expr("cast(round(price * 100, 0) as bigint)"), 0, 1000, 10
    )
    want = {r["bin"]: r["c"] for r in whole.collect()}
    assert got == want
    # estimates off the maintained state == batch estimates over full history
    est_stream = {
        r["p_mille"]: r["est_cents"]
        for r in histogram_quantiles(
            spark.read.parquet(os.path.join(state, "bins")), [500, 900], 0, 1000
        ).collect()
    }
    est_batch = {
        r["p_mille"]: r["est_cents"]
        for r in histogram_quantiles(whole, [500, 900], 0, 1000).collect()
    }
    assert est_stream == est_batch


def test_weighted_sample_favors_heavy_rows_and_is_deterministic(spark):
    from universal_aws_data_pipeline_spark.operators.sampling import weighted_sample_topk

    rows = [(i, 1) for i in range(200)] + [(1000 + i, 1000) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id: long, w: long")
    got = [r["doc_id"] for r in weighted_sample_topk(df, "w", 20).collect()]
    # with 1000x weights, the heavy block dominates the top-20
    assert sum(1 for d in got if d >= 1000) >= 15
    # deterministic: identical selection on rerun and under repartition
    again = [r["doc_id"] for r in weighted_sample_topk(df.repartition(7), "w", 20).collect()]
    assert got == again
    # zero/negative weights are never sampled
    df2 = df.unionByName(spark.createDataFrame([(5000, 0), (5001, -3)], "doc_id: long, w: long"))
    got2 = {r["doc_id"] for r in weighted_sample_topk(df2, "w", 300).collect()}
    assert 5000 not in got2 and 5001 not in got2


def test_km_survival_censoring_and_product(spark):
    from universal_aws_data_pipeline_spark.operators.survival import km_survival

    # day index via epoch seconds; users:
    #  u1: days 0..2  (lifetime 2, death — last day 2 <= 10-7)
    #  u2: days 0..3  (lifetime 3, death)
    #  u3: days 0..9  (lifetime 9, censored — last day 9 > 10-7)
    #  u4: days 0..10 (lifetime 10, censored, defines stream end)
    rows = []
    for u, days in ((1, [0, 2]), (2, [0, 3]), (3, [0, 9]), (4, [0, 10])):
        for d in days:
            rows.append((u, f"2024-01-{d + 1:02d} 12:00:00"))
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "user_id: long, ts: string").select(
        "user_id", F.col("ts").cast("timestamp_ntz").alias("ts")
    )
    got = {r["t_days"]: r for r in km_survival(df, censor_tail_days=7).collect()}
    # death times: 2 (n_risk 4) and 3 (n_risk 3); censored at 9 and 10
    assert set(got) == {2, 3}
    assert got[2]["n_risk"] == 4 and got[2]["n_deaths"] == 1
    assert got[3]["n_risk"] == 3 and got[3]["n_deaths"] == 1
    assert got[2]["survival"] == 0.75            # 3/4
    assert got[3]["survival"] == 0.5             # 3/4 * 2/3
    # naive retention would call u3/u4 churned; KM keeps them at-risk only


def test_hits_separates_hubs_from_authorities(spark):
    from universal_aws_data_pipeline_spark.operators.graph import hits_micro

    # bipartite: buyer 2 links to BOTH suppliers; buyer 4 to one; supplier
    # 11 has both buyers, supplier 13 only one -> hub(2) > hub(4),
    # auth(11) > auth(13); sides never mix scores
    edges = spark.createDataFrame(
        [(2, 11), (2, 13), (4, 11)], "src: long, dst: long"
    )
    got = {r["node"]: (r["hub_micro"], r["auth_micro"]) for r in hits_micro(edges).collect()}
    assert got[2][0] > got[4][0] > 0
    assert got[11][1] > got[13][1] > 0
    assert got[2][1] == 0 and got[11][0] == 0  # pure sides
    # L1 normalization: each side sums to ~total (floor losses only)
    assert abs(got[2][0] + got[4][0] - 1_000_000_000_000) <= 2
    assert abs(got[11][1] + got[13][1] - 1_000_000_000_000) <= 2

    import pytest

    with pytest.raises(ValueError, match="iterations"):
        hits_micro(edges, iterations=0)


def test_hash_features_deterministic_and_sign_cancelling(spark):
    from pyspark.sql import functions as F

    from universal_aws_data_pipeline_spark.operators.features import hash_features

    df = spark.createDataFrame(
        [(1, "click"), (1, "click"), (2, "view")], "user_id: long, event_type: string"
    )
    feats = [F.concat(F.lit("t:"), F.col("event_type"))]
    a = sorted(map(tuple, hash_features(df, "user_id", feats, k=8).collect()))
    b = sorted(map(tuple, hash_features(df.repartition(5), "user_id", feats, k=8).collect()))
    assert a == b and len(a) > 0  # layout-independent
    # same feature twice -> |val| == 2 for user 1's bucket
    u1 = [r for r in a if r[0] == 1]
    assert len(u1) == 1 and abs(u1[0][2]) == 2
    # a feature and itself never cancel; k must be positive
    import pytest

    with pytest.raises(ValueError, match="k must be positive"):
        hash_features(df, "user_id", feats, k=0)


def test_exact_rank_long_matches_percentile_disc(spark):
    """Distributed range-refinement selection must return exactly what
    percentile_disc returns, at every rank — including duplicate-heavy and
    negative-value sets, and through the bucketed refinement path."""
    from pyspark.sql import functions as F

    from universal_aws_data_pipeline_spark.operators.robust import exact_rank_long

    # deterministic spread: wide range (forces >1 refinement round),
    # duplicates, negatives
    vals = [((i * 2654435761) % 1_000_003) * 7_919 - 3_500_000_000 for i in range(5000)]
    vals += vals[:500]  # duplicates
    df = spark.createDataFrame([(v,) for v in vals], "v: long")
    s = sorted(vals)
    for rank in (1, 2, len(vals) // 2, (len(vals) + 1) // 2, len(vals) - 1, len(vals)):
        assert exact_rank_long(df, "v", rank) == s[rank - 1], rank
    import pytest

    with pytest.raises(ValueError, match="rank"):
        exact_rank_long(df, "v", 0)


def test_theil_sen_recovers_known_slope(spark):
    from universal_aws_data_pipeline_spark.operators.robust import theil_sen_micro

    # perfect line y = 250*x + noiseless -> every pairwise slope is 250
    daily = spark.createDataFrame(
        [(x, 250 * x + 10_000) for x in range(50)], "d: long, cents: long"
    )
    n, pairs, slope = theil_sen_micro(daily)
    assert (n, pairs) == (50, 50 * 49 // 2)
    assert slope == 250 * 1_000_000
    # one wild outlier day cannot move the median slope
    daily2 = daily.unionByName(
        spark.createDataFrame([(100, 10_000_000_000)], "d: long, cents: long")
    )
    _, _, slope2 = theil_sen_micro(daily2)
    assert abs(slope2 - 250 * 1_000_000) < 60_000_000  # still ~250/day, not 1e8
