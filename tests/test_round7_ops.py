"""Round-7 regression tests for the round-6 ADVICE findings plus the
operators added this round."""

from __future__ import annotations

import os

import pytest


# ---------------------------------------------------------------------------
# ADVICE: legacy _batch_N markers are parent-scoped — committing one table
# must not destroy a meta-less SIBLING table's replay position. recover()
# now migrates the legacy id into the table's own _meta.json, and commit()
# keeps the markers while any meta-less sibling remains.
# ---------------------------------------------------------------------------
def test_legacy_markers_survive_sibling_commit(spark, tmp_path):
    from universal_aws_data_pipeline_spark.operators import statestore

    state = tmp_path / "shared"
    cells = str(state / "cells")
    bins = str(state / "bins")
    df = spark.range(3).selectExpr("id", "id * 2 AS v")
    df.write.parquet(cells)
    df.write.parquet(bins)
    # legacy shape: both tables meta-less, shared sibling markers say "1"
    os.makedirs(state / "_batch_0")
    os.makedirs(state / "_batch_1")
    assert statestore.last_folded(cells) == 1
    assert statestore.last_folded(bins) == 1

    # cells migrates (recover writes its meta) and commits batch 2 — the
    # markers must SURVIVE because bins still depends on them
    statestore.recover(cells)
    assert statestore.last_folded(cells) == 1  # migrated into cells' meta
    statestore.commit(df, cells, 2)
    assert statestore.last_folded(bins) == 1, "sibling lost its replay position"

    # once bins migrates too, the next commit may clean the markers up
    statestore.recover(bins)
    statestore.commit(df, bins, 2)
    assert not [d for d in os.listdir(state) if d.startswith("_batch_")]
    assert statestore.last_folded(cells) == 2
    assert statestore.last_folded(bins) == 2


def test_recover_migrates_legacy_markers_into_meta(spark, tmp_path):
    from universal_aws_data_pipeline_spark.operators import statestore

    state = tmp_path / "s"
    table = str(state / "cells")
    spark.range(2).write.parquet(table)
    os.makedirs(state / "_batch_7")
    statestore.recover(table)
    assert os.path.exists(os.path.join(table, "_meta.json"))
    # markers are now redundant for THIS table but untouched on disk
    assert os.path.isdir(state / "_batch_7")
    assert statestore.last_folded(table) == 7


# ---------------------------------------------------------------------------
# ADVICE: exact_rank_long's Spark-side `(v - lo) div width` overflows int64
# when the value spread exceeds 2^63 — the guard bisects driver-side first.
# ---------------------------------------------------------------------------
def test_exact_rank_long_survives_int64_spanning_values(spark):
    from universal_aws_data_pipeline_spark.operators.robust import (
        _DIRECT_SORT_CAP,
        exact_rank_long,
    )

    lo64, hi64 = -(2**63), 2**63 - 1
    vals = [lo64, lo64 + 1, -5, 0, 3, hi64 - 1, hi64]
    df = spark.createDataFrame([(v,) for v in vals], "v: long")
    want = sorted(vals)
    # force the histogram path despite the tiny row count, so the
    # overflow-prone bucket expression would actually run without the guard
    import universal_aws_data_pipeline_spark.operators.robust as robust

    orig = robust._DIRECT_SORT_CAP
    robust._DIRECT_SORT_CAP = 0
    try:
        for rank in (1, 3, 4, len(vals)):
            assert exact_rank_long(df, "v", rank) == want[rank - 1]
    finally:
        robust._DIRECT_SORT_CAP = orig
    assert _DIRECT_SORT_CAP == orig


# ---------------------------------------------------------------------------
# ADVICE: mutual_nearest_neighbors' tiebreak negated the id column — string
# vec_ids failed analysis. The (cos DESC, dst ASC) argmax must be portable.
# ---------------------------------------------------------------------------
def test_mutual_nearest_neighbors_string_ids(spark):
    from universal_aws_data_pipeline_spark.operators.similarity import (
        mutual_nearest_neighbors,
    )

    rows = [
        ("blk", "a", [1.0, 0.0]),
        ("blk", "b", [1.0, 0.05]),
        ("blk", "c", [0.0, 1.0]),
        ("blk", "d", [0.05, 1.0]),
    ]
    df = spark.createDataFrame(
        rows, "label: string, vec_id: string, embedding: array<double>"
    )
    got = sorted(
        (r["x"], r["y"]) for r in mutual_nearest_neighbors(df).collect()
    )
    assert got == [("a", "b"), ("c", "d")]


def test_mutual_nearest_neighbors_tie_breaks_to_smallest_partner(spark):
    from universal_aws_data_pipeline_spark.operators.similarity import (
        mutual_nearest_neighbors,
    )

    # b and c are IDENTICAL vectors, both orthogonal to nothing else: a's
    # best match ties between b and c and must resolve to the smaller id b;
    # b's best ties between a and c -> a... b<->c are each other's best too
    rows = [
        ("blk", 1, [1.0, 0.0]),
        ("blk", 2, [0.8, 0.6]),
        ("blk", 3, [0.8, 0.6]),
    ]
    df = spark.createDataFrame(
        rows, "label: string, vec_id: long, embedding: array<double>"
    )
    got = sorted(
        (r["x"], r["y"]) for r in mutual_nearest_neighbors(df).collect()
    )
    # 2 and 3 are identical (cos 1.0): mutual. 1's best is 2 (tie 2 vs 3 ->
    # smaller), and 2's best is 3 (cos 1.0 beats 1's 0.8) -> (1,2) NOT mutual
    assert got == [(2, 3)]


# ---------------------------------------------------------------------------
# ADVICE: hash_features silently dropped NULL features (md5(NULL) -> NULL
# bucket -> NULL sum -> filtered). Missingness now hashes as '<null>'.
# ---------------------------------------------------------------------------
def test_hash_features_null_features_become_sentinel(spark):
    from pyspark.sql import functions as F

    from universal_aws_data_pipeline_spark.operators.features import hash_features

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "x")], "user_id: long, cat: string"
    )
    got = hash_features(df, "user_id", [F.col("cat")], k=8)
    rows = {r["user_id"]: (r["feat_idx"], r["val"]) for r in got.collect()}
    assert set(rows) == {1, 2, 3}, "all-null rows must not vanish"
    # the two null rows hash identically (the sentinel token)
    assert rows[1] == rows[2]
    # and the sentinel bucket is the md5('<null>') bucket, not md5('x')'s
    want = hash_features(
        df.withColumn("cat", F.coalesce("cat", F.lit("<null>"))),
        "user_id",
        [F.col("cat")],
        k=8,
    )
    assert sorted(map(tuple, want.collect())) == sorted(
        (r["user_id"], r["feat_idx"], r["val"]) for r in got.collect()
    )


# ---------------------------------------------------------------------------
# VERDICT r6 item 3: token_entropy's length-gated hybrid — long docs take
# the explode+groupBy path (O(tokens)) instead of the row-local HOF
# (O(distinct x tokens), quadratic in doc length). Both paths must agree.
# ---------------------------------------------------------------------------
def test_token_entropy_hybrid_paths_agree(spark):
    from universal_aws_data_pipeline_spark.operators.text import token_entropy

    # doc 1 short, doc 2 long enough to cross a tiny threshold
    rows = [
        (1, "a b a c a b"),
        (2, " ".join(f"w{i % 37}" for i in range(500))),
        (3, "same same same same"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    hof = {
        r["doc_id"]: r.asDict()
        for r in token_entropy(df, explode_threshold=10_000).collect()
    }
    hyb = {
        r["doc_id"]: r.asDict()
        for r in token_entropy(df, explode_threshold=10).collect()
    }
    assert set(hof) == set(hyb) == {1, 2, 3}
    for d in (1, 2, 3):
        assert hof[d]["n_tokens"] == hyb[d]["n_tokens"]
        assert hof[d]["n_distinct"] == hyb[d]["n_distinct"]
        assert abs(hof[d]["entropy_nats"] - hyb[d]["entropy_nats"]) <= 1e-4


def test_token_entropy_single_token_doc(spark):
    from universal_aws_data_pipeline_spark.operators.text import token_entropy

    df = spark.createDataFrame(
        [(1, "only"), (2, " ".join(["only"] * 50))], "doc_id: long, text: string"
    )
    got = {r["doc_id"]: r["entropy_nats"] for r in token_entropy(
        df, explode_threshold=10
    ).collect()}
    assert got == {1: 0.0, 2: -0.0} or got == {1: 0.0, 2: 0.0} or got == {1: -0.0, 2: 0.0}


# ---------------------------------------------------------------------------
# VERDICT r6 item 4: hits_micro's per-half-round score-table broadcast is
# size-gated — above broadcast_max_nodes the join falls back to the shuffle
# form, and the two paths must produce identical scores.
# ---------------------------------------------------------------------------
def test_hits_shuffle_fallback_matches_broadcast_path(spark):
    from universal_aws_data_pipeline_spark.operators.graph import hits_micro

    edges = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 12), (3, 11), (3, 12), (4, 10)],
        "src: long, dst: long",
    )
    bcast = sorted(map(tuple, hits_micro(edges).collect()))
    shuffle = sorted(
        map(tuple, hits_micro(edges, broadcast_max_nodes=0).collect())
    )
    assert bcast == shuffle
    assert len(bcast) == 7  # 4 hubs + 3 authorities
    # scores are L1-normalized micro-units: each family sums to ~total
    hub_total = sum(r[1] for r in bcast)
    auth_total = sum(r[2] for r in bcast)
    assert abs(hub_total - 1_000_000_000_000) <= 10
    assert abs(auth_total - 1_000_000_000_000) <= 10


# ---------------------------------------------------------------------------
# VERDICT r6 item 5: the sf0.1 IVF recall measurement, promoted into CI —
# the retuned nprobe=6 path must hold the >=0.7 recall@10 contract so a
# clustering-parameter change can't silently regress it (the sf0.01 gates
# run a different n_clusters/corpus shape and would not catch it).
# ---------------------------------------------------------------------------
@pytest.mark.slow
def test_ivf_recall_at_sf01_with_shipping_parameters(spark, tmp_path):
    from pyspark.sql import functions as F

    from universal_aws_data_pipeline_spark.operators.similarity import (
        build_ivf_index,
        cosine_topk,
        ivf_topk_indexed,
        load_ivf_index,
    )

    path = "/root/testdata/sf0.1/embeddings.parquet"
    if not os.path.exists(path):
        pytest.skip("sf0.1 fixture absent")
    e = spark.read.parquet(path)
    ivf_dir = str(tmp_path / "ivf")
    # the exact q28 shipping configuration (plans/catalog.py)
    build_ivf_index(e, ivf_dir, n_clusters=16, seed=42)
    idx = load_ivf_index(spark, ivf_dir)
    recalls = []
    for qid in [0, 7, 23, 101, 404, 997]:
        qv = [
            float(x)
            for x in e.filter(F.col("vec_id") == qid).select("embedding").head()[0]
        ]
        truth = {r["vec_id"] for r in cosine_topk(e, qv, k=10).collect()}
        got = {r["vec_id"] for r in ivf_topk_indexed(idx, qv, k=10, nprobe=6).collect()}
        recalls.append(len(truth & got) / 10.0)
    mean = sum(recalls) / len(recalls)
    assert mean >= 0.7, f"sf0.1 IVF recall@10 regressed below contract: {recalls}"
