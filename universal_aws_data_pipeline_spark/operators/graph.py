"""Distributed connected components over a pair graph.

The canonical last stage of a dedup pipeline: MinHash-LSH emits near-dup
*pairs*; keeping one representative per duplicate *group* requires the
transitive closure of those pairs (a ~ b, b ~ c ⇒ {a,b,c} are one group).
The reference pipeline stops at pairwise containment checks
(`/root/reference/src/glue/transformation/transform_data.py` drops rows per-file,
never cross-file), so this is part of the driver-mandated LLM-pipeline
extension surface rather than reference parity.

Algorithm: iterative min-label propagation. Every node starts labeled with
its own id; each round every node adopts the minimum label among itself and
its neighbors; at the fixpoint each node carries the minimum node id of its
component. Each round is one shuffle-join plus one hash aggregation — no
driver-side graph state, no collect. Rounds needed = graph diameter, which
for dedup graphs is tiny (duplicate clusters are near-cliques: a group of k
mutual near-dups has diameter 1-2). The O(log n) alternating large-star /
small-star scheme (Kiveris et al., "Connected Components in MapReduce and
Beyond") only pays off on long-chain graphs that dedup workloads don't
produce; plain propagation with a convergence check is both simpler and
fewer shuffles here.

Scale notes:
- `labels` is localCheckpoint()ed every round: iterative plans otherwise
  accumulate lineage (re-executing all prior joins on every action) and the
  convergence-check `count()` would grow quadratically expensive.
- The convergence check aggregates a single count — the only driver-side
  value per round.
- Edges are symmetrized once up front; each round shuffles |E| messages
  hash-partitioned on the node id, the same partitioning every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Label each node of the undirected pair graph with the minimum node id
    reachable from it.

    Returns (id, component) with one row per distinct node appearing in
    ``edges``. Converges in diameter-many rounds; raises if ``max_iter``
    rounds don't reach the fixpoint (a signal the graph is pathological, not
    a dedup pair set).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        # materialize once: the edge set is consumed every round — without
        # this, each iteration re-executes the (possibly expensive) upstream
        # pair-mining plan that produced the edges
        .localCheckpoint(eager=True)
    )
    labels = sym.select(F.col("a").alias("id")).distinct().withColumn("component", F.col("id"))
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iter):
        # neighbor messages: node b hears a's current label
        msgs = sym.join(labels, sym["a"] == labels["id"], "inner").select(
            F.col("b").alias("id"), F.col("component")
        )
        new_labels = (
            labels.unionByName(msgs).groupBy("id").agg(F.min("component").alias("component"))
        ).localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def dedup_clusters(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Duplicate-group view of a near-dup pair set: (doc_id, cluster_id,
    cluster_size, is_canonical), one row per clustered document.

    cluster_id is the minimum doc id in the group; the canonical survivor of
    each group is the id == cluster_id row — the keep-list for a dedup sweep
    is exactly the is_canonical rows, and the drop-list the rest.
    """
    comp = connected_components(pairs, src=src, dst=dst)
    sizes = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return comp.join(sizes, "component").select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        "cluster_size",
        (F.col("id") == F.col("component")).alias("is_canonical"),
    )
