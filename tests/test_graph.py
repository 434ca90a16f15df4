"""Connected components / dedup clustering unit tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from universal_aws_data_pipeline_spark.operators.graph import connected_components, dedup_clusters


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a: long, id_b: long")


def test_chain_and_separate_components(spark):
    # chain 1-2-3-4 (diameter 3) plus isolated pair 10-11
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    got = {(r["id"], r["component"]) for r in connected_components(e).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}


def test_edge_direction_irrelevant(spark):
    # same component regardless of which side the smaller id is on
    got = {
        (r["id"], r["component"])
        for r in connected_components(_edges(spark, [(5, 2), (2, 9)])).collect()
    }
    assert got == {(2, 2), (5, 2), (9, 2)}


def test_dedup_clusters_canonical_and_sizes(spark):
    e = _edges(spark, [(1, 2), (2, 3), (7, 8)])
    rows = {r["doc_id"]: r for r in dedup_clusters(e).collect()}
    assert rows[1]["is_canonical"] and rows[7]["is_canonical"]
    assert not rows[2]["is_canonical"] and not rows[3]["is_canonical"] and not rows[8]["is_canonical"]
    assert rows[2]["cluster_id"] == 1 and rows[2]["cluster_size"] == 3
    assert rows[8]["cluster_id"] == 7 and rows[8]["cluster_size"] == 2
    # keep-list (canonical rows) + drop-list partition the clustered nodes
    assert sum(1 for r in rows.values() if r["is_canonical"]) == 2


def test_nonconvergence_raises(spark):
    # a 100-node chain cannot flood min-labels to the far end in 2
    # iterations (4 propagation steps), even with pointer jumping
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(_edges(spark, [(i, i + 1) for i in range(1, 100)]), max_iter=2)


def test_long_chain_converges_fast(spark):
    # pointer jumping: O(log D) rounds — a 500-hop chain finishes well
    # inside the default cap (plain propagation would need 499 rounds)
    out = connected_components(_edges(spark, [(i, i + 1) for i in range(1, 500)]))
    assert out.filter(F.col("component") != 1).count() == 0
