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


def test_k_core_peels_tail_keeps_clique(spark):
    """4-clique with a pendant chain: 2-core = exactly the clique (chain
    peels off over successive rounds), core degrees = 3 inside it."""
    from universal_aws_data_pipeline_spark.operators.graph import k_core

    clique = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    chain = [(4, 10), (10, 11), (11, 12)]
    e = _edges(spark, clique + chain)
    got = {(r["node"], r["core_deg"]) for r in k_core(e, k=2, rounds=4, src="id_a", dst="id_b").collect()}
    assert got == {(1, 3), (2, 3), (3, 3), (4, 3)}


def test_k_core_rounds_past_fixpoint_are_noops(spark):
    """Once the peel reaches its fixpoint, extra rounds change nothing —
    the bounded-round result is the true k-core whenever depth <= rounds."""
    from universal_aws_data_pipeline_spark.operators.graph import k_core

    e = _edges(spark, [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)])
    r2 = {(r["node"], r["core_deg"]) for r in k_core(e, k=2, rounds=2, src="id_a", dst="id_b").collect()}
    r6 = {(r["node"], r["core_deg"]) for r in k_core(e, k=2, rounds=6, src="id_a", dst="id_b").collect()}
    assert r2 == r6 == {(1, 2), (2, 2), (3, 2)}


def test_k_core_everything_peels(spark):
    from universal_aws_data_pipeline_spark.operators.graph import k_core

    # a path has no 2-core at all
    e = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    assert k_core(e, k=2, rounds=4, src="id_a", dst="id_b").count() == 0


def test_label_propagation_splits_barbell(spark):
    """Two 4-cliques joined by one bridge edge: components would merge them;
    frequency-vote LPA keeps two communities, each labeled by its min id."""
    from universal_aws_data_pipeline_spark.operators.graph import label_propagation

    c1 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    c2 = [(a, b) for a in range(11, 15) for b in range(a + 1, 15)]
    bridge = [(4, 11)]
    e = _edges(spark, c1 + c2 + bridge)
    got = {r["node"]: r["community"] for r in label_propagation(e, rounds=4, src="id_a", dst="id_b").collect()}
    assert set(got) == set(range(1, 5)) | set(range(11, 15))
    assert len({got[n] for n in range(1, 5)}) == 1
    assert len({got[n] for n in range(11, 15)}) == 1
    assert got[1] != got[11]


def test_label_propagation_deterministic_across_partitionings(spark):
    """The smallest-label tie-break makes LPA replayable: identical labels
    regardless of input partitioning (classic LPA is run-order-dependent)."""
    from universal_aws_data_pipeline_spark.operators.graph import label_propagation

    pairs = [(i, (i * 7) % 23 + 30) for i in range(1, 23)] + [(30, 31), (31, 32)]
    e1 = _edges(spark, pairs)
    e2 = _edges(spark, pairs).repartition(7)
    g1 = sorted((r["node"], r["community"]) for r in label_propagation(e1, rounds=3, src="id_a", dst="id_b").collect())
    g2 = sorted((r["node"], r["community"]) for r in label_propagation(e2, rounds=3, src="id_a", dst="id_b").collect())
    assert g1 == g2
