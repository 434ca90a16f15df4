"""Frequent-itemset association rules over a mined co-occurrence pair table.

The classic market-basket trio — support / confidence / lift — computed
from the SAME support>=2 co-purchase edge artifact the graph family
(q116 triangles, q148 k-core, q149 label propagation) analyzes, so the
heaviest mining join in the repo is paid once per dataset for four
consumers. Capability parity: the reference pipeline's declared analytics
surface stops at aggregate reporting (reference
`src/glue/transformation/transform_data.py:140-180` — grouped aggregates
only); rules are part of the extension surface.

Determinism: confidence and lift are emitted in integer micro-units via
floor division (the q115 PageRank device), so both engines produce
bit-identical rows — no float ratio ever crosses an engine boundary.

Scale shape: |pairs| is already support-thresholded (noise edges are 99%
of the raw pair space and are dropped at the artifact); item counts are a
second map-side-combinable aggregate (|items| rows); the rule join is
pairs->items equi-joins where the items side is dimension-sized and
broadcasts under AQE; the scalar basket total rides a 1-row broadcast.
Nothing here rescans the fact table once the artifact exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def association_rules(
    pair_support: DataFrame,
    baskets: DataFrame,
    basket_col: str = "o",
    item_col: str = "p",
    min_support: int = 2,
) -> DataFrame:
    """Directed association rules from an undirected support table.

    ``pair_support``: (a, b, support) with a < b (undirected, pre-mined).
    ``baskets``: DISTINCT (basket, item) membership rows.

    Returns (ante, cons, support, conf_micro, lift_micro): one row per
    DIRECTION of each pair —
        conf(a->b)  = floor(1e6 * s_ab / n_a)
        lift(a->b)  = floor(1e6 * s_ab * N / (n_a * n_b))   (symmetric)
    with n_x = baskets containing x, N = total baskets. Integer ranges:
    1e6 * s * N needs s * N < 9.2e12 — holds to ~1e6 baskets with ~1e6-
    supported pairs, far past any per-partition reality; shard N beyond.
    """
    items = baskets.groupBy(item_col).agg(F.count(F.lit(1)).alias("n_item"))
    total = baskets.select(basket_col).distinct().agg(
        F.count(F.lit(1)).alias("n_baskets")
    )
    edges = pair_support.filter(F.col("support") >= min_support)
    directed = edges.select(
        F.col("a").alias("ante"), F.col("b").alias("cons"), "support"
    ).unionByName(
        edges.select(F.col("b").alias("ante"), F.col("a").alias("cons"), "support")
    )
    na = items.select(F.col(item_col).alias("ante"), F.col("n_item").alias("n_ante"))
    nc = items.select(F.col(item_col).alias("cons"), F.col("n_item").alias("n_cons"))
    return (
        directed.join(F.broadcast(na), "ante")
        .join(F.broadcast(nc), "cons")
        .join(F.broadcast(total))  # 1-row scalar attach
        .select(
            "ante",
            "cons",
            "support",
            F.expr(f"({MICRO} * support) div n_ante").alias("conf_micro"),
            F.expr(f"({MICRO} * support * n_baskets) div (n_ante * n_cons)").alias(
                "lift_micro"
            ),
        )
    )


def cooccurrence_jaccard(
    df: DataFrame,
    basket_col: str,
    item_col: str,
) -> DataFrame:
    """Exact pairwise item co-occurrence as Jaccard over basket sets:
    J(a,b) = |baskets(a) ∩ baskets(b)| / |baskets(a) ∪ baskets(b)| in
    micro-units (floor div of exact distinct counts) — the EXACT twin of
    the q119 theta-sketch overlap estimates, viable whenever the item
    vocabulary is dimension-sized (event types, categories) so the pair
    matrix is |items|² tiny even though the basket table is corpus-sized.

    Returns (item_a, item_b, n_both, n_either, jaccard_micro) for a < b.
    The divisor n_either = na + nb − n_both is structurally ≥ 1: a pair
    row exists only when the items co-occur in ≥ 1 basket, so the
    gini-style zero-divisor divergence (Spark div→NULL vs DuckDB //→error)
    cannot arise here.

    Scale: one distinct (basket, item) projection (the only corpus-sized
    shuffle), per-item basket counts from it, and an |items|²-bounded
    self-join on the basket key with map-side-combinable pair counting.
    """
    bi = df.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("it")
    ).distinct()
    per = bi.groupBy("it").agg(F.count(F.lit(1)).cast("long").alias("n"))
    pairs = (
        bi.alias("x")
        .join(bi.alias("y"), "b")
        .filter(F.col("x.it") < F.col("y.it"))
        .groupBy(F.col("x.it").alias("item_a"), F.col("y.it").alias("item_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    return (
        pairs.join(per.select(F.col("it").alias("item_a"), F.col("n").alias("na")), "item_a")
        .join(per.select(F.col("it").alias("item_b"), F.col("n").alias("nb")), "item_b")
        .select(
            "item_a",
            "item_b",
            "n_both",
            (F.col("na") + F.col("nb") - F.col("n_both")).alias("n_either"),
            F.expr("(1000000 * n_both) div (na + nb - n_both)").alias(
                "jaccard_micro"
            ),
        )
    )
