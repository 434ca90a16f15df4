"""Distributed k-means vector quantization in exact integer arithmetic.

The codebook stage of embedding-scale pipelines: product/vector quantization
for ANN indexes (the IVF coarse quantizer in operators/similarity.py uses a
hash-derived cell today — k-means cells are the quality upgrade), corpus
clustering for diversity-aware sampling, and SemDeDup-style cluster-then-
dedup. The reference pipeline has no vector surface at all (it stops at
row-level transforms — `/root/reference/src/glue/transformation/
transform_data.py`), so this is driver-mandated LLM-pipeline extension
surface.

Why INTEGER k-means: float Lloyd iterations are summation-order-dependent
(centroid means drift by reduction order), so two engines — or two runs on
different partitionings — can assign boundary vectors differently and
diverge. Quantizing input vectors to 1e-6 integer units once (the q127
device) makes every step exact BIGINT arithmetic: distances are integer
sums, centroid updates are floor-div of exact sums, and the whole recurrence
replays bit-identically in any engine (the DuckDB oracle unrolls it as
chained CTEs). Determinism devices: seeds = the k smallest ids; nearest
centroid ties break toward the smaller centroid id.

Scale notes:
- per assignment round: one broadcast cross join (|V| x k — the k-row
  codebook broadcasts; the vector table never shuffles for scoring) + one
  min-struct hash aggregation keyed on the vector id.
- centroid update: ONE map-side-combinable aggregation producing k x dim
  exact sums as dim columns — never a posexplode shuffle of |V| x dim rows.
- fixed round count, no convergence action: rounds chain lazily into one
  job; the quantized vector table is localCheckpoint()ed once so rounds
  re-read it, not the upstream parquet + quantization.
- component sums are BIGINT-exact to ~9e18: 1e-6-quantized unit-norm
  components (<=1e6) over up to ~9e12 cluster members — comfortably past
  any single cluster's realistic membership; production beyond that would
  widen to decimal(38,0) sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kmeans_vq(
    vectors: DataFrame,
    dim: int,
    k: int = 8,
    assign_rounds: int = 2,
    id_col: str = "id",
    vec_col: str = "qe",
) -> tuple[DataFrame, DataFrame]:
    """Fixed-round Lloyd k-means over integer-quantized vectors.

    ``vectors``: (id, qe) with ``qe`` an ``array<long>`` of length ``dim``
    (quantize floats once upstream — e.g. ``round(x * 1e6)``).

    Runs ``assign_rounds`` assignment rounds, recomputing the integer
    centroid after each: seeds are the ``k`` smallest-id vectors;
    ``assignment`` is the FINAL round's (id, cid, dist) with ``dist`` the
    exact squared integer distance; ``centroids`` is (cid, cvec) recomputed
    from that final assignment (floor-div component means). Clusters that
    lose all members mid-run simply drop out — deterministically, since
    every step is replayable.
    """
    v = (
        vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("qe"))
        .localCheckpoint(eager=True)
    )
    # seeds: distributed top-k by id (TakeOrderedAndProject), then a
    # row_number over the k collected rows only — bounded by construction
    cent = (
        v.orderBy("id")
        .limit(k)
        .withColumn("cid", F.row_number().over(Window.orderBy("id")) - 1)
        .select(F.col("cid").cast("long").alias("cid"), F.col("qe").alias("cvec"))
    )
    # Row-local nearest-centroid assignment (round-13 optimization, guide
    # §2.4 — remove shuffles outright): the codebook is k rows by
    # construction, so collapse it to ONE row holding the cid-sorted
    # (cid, cvec) array and fold over it per vector. The old spelling
    # cross-joined every vector with all k centroids and shuffled the
    # |V| × k expansion (full qe payload included) through a groupBy(id)
    # min-struct aggregation — k+1 copies of every vector crossing the
    # exchange per round. Now scoring never shuffles the vector table at
    # all; the only per-round exchange left is the map-side-combinable
    # k × dim centroid-sum aggregation. The fold scans centroids in
    # ascending cid order keeping strictly-smaller distances, which is
    # exactly min(struct(dist, cid)) — smallest distance, ties to the
    # smaller cid — so assignments (and the oracle hash) are unchanged.
    best_fold = F.expr(
        "aggregate("
        "  transform(_cents, c -> struct(c.cid as cid,"
        "    aggregate(zip_with(qe, c.cvec, (a, b) -> (a - b) * (a - b)),"
        "              cast(0 as bigint), (acc, x) -> acc + x) as dist)),"
        "  struct(cast(-1 as bigint) as cid,"
        "         cast(9223372036854775807 as bigint) as dist),"
        "  (acc, s) -> if(s.dist < acc.dist, s, acc))"
    )
    assigned = None
    for _ in range(assign_rounds):
        cent_row = cent.agg(
            F.array_sort(F.collect_list(F.struct("cid", "cvec"))).alias("_cents")
        )
        assigned = (
            v.join(cent_row.hint("shuffle_replicate_nl"))
            .withColumn("_m", best_fold)
            .select("id", "qe", F.col("_m.cid").alias("cid"), F.col("_m.dist").alias("dist"))
        )
        cent = (
            assigned.groupBy("cid")
            .agg(
                *[F.sum(F.col("qe")[j]).alias(f"s{j}") for j in range(dim)],
                F.count(F.lit(1)).alias("n"),
            )
            .select(
                "cid",
                F.array(*[F.expr(f"s{j} div n") for j in range(dim)]).alias("cvec"),
            )
        )
    return assigned.select("id", "cid", "dist"), cent
