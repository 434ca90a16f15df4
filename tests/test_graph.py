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


def test_pagerank_micro_star_center_dominates(spark):
    """Symmetric star: the hub must outrank every leaf, ranks are exact longs,
    and total mass stays within integer-floor slack of the budget."""
    from universal_aws_data_pipeline_spark.operators.graph import pagerank_micro

    hub_edges = [("h", f"l{i}") for i in range(5)]
    sym = hub_edges + [(b, a) for a, b in hub_edges]
    e = spark.createDataFrame(sym, ["src", "dst"])
    total = 1_000_000_000_000
    rows = {r["node"]: r["rank_micro"] for r in pagerank_micro(e, total_micro=total).collect()}
    assert len(rows) == 6
    leaves = [v for k, v in rows.items() if k != "h"]
    assert all(rows["h"] > v for v in leaves)
    assert len(set(leaves)) == 1  # symmetry ⇒ identical leaf ranks
    # floor division loses < 1 unit per node per operation — mass is conserved
    # up to that slack, never created
    assert total * 0.99 < sum(rows.values()) <= total


def test_pagerank_micro_rejects_dangling(spark):
    from universal_aws_data_pipeline_spark.operators.graph import pagerank_micro
    import pytest as _pytest

    e = spark.createDataFrame([("a", "b")], ["src", "dst"])  # b has no out-edge
    with _pytest.raises(ValueError, match="out-edge"):
        pagerank_micro(e)


def test_pagerank_micro_deterministic_across_partitionings(spark):
    """Integer arithmetic ⇒ bit-identical ranks regardless of layout."""
    from universal_aws_data_pipeline_spark.operators.graph import pagerank_micro

    pairs = [(f"n{i}", f"n{(i * 7 + 3) % 20}") for i in range(40)]
    sym = list({(a, b) for a, b in pairs if a != b})
    sym = sym + [(b, a) for a, b in sym]
    r1 = pagerank_micro(spark.createDataFrame(sym, ["src", "dst"]).repartition(1))
    r2 = pagerank_micro(spark.createDataFrame(sym, ["src", "dst"]).repartition(13))
    assert sorted(map(tuple, r1.collect())) == sorted(map(tuple, r2.collect()))


def test_triangle_counts_known_graph(spark):
    """K4 plus a pendant edge: each K4 node sits in C(3,2)=3 triangles, the
    pendant node in none; direction/duplication/self-loops are ignored."""
    from universal_aws_data_pipeline_spark.operators.graph import triangle_counts

    k4 = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    noisy = k4 + [(b, a) for a, b in k4] + [("a", "a"), ("d", "e"), ("d", "e")]
    got = {r["node"]: r["n_tri"] for r in triangle_counts(
        spark.createDataFrame(noisy, ["a", "b"])).collect()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3, "e": 0}


def test_triangle_counts_triangle_free(spark):
    from universal_aws_data_pipeline_spark.operators.graph import triangle_counts

    # C5 cycle is triangle-free
    cyc = [("v0", "v1"), ("v1", "v2"), ("v2", "v3"), ("v3", "v4"), ("v4", "v0")]
    got = triangle_counts(spark.createDataFrame(cyc, ["a", "b"]))
    assert [r["n_tri"] for r in got.collect()] == [0] * 5
