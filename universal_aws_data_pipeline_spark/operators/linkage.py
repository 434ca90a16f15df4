"""Entity resolution: blocked fuzzy record matching by edit distance.

The reference pipeline joins nothing across records (its Glue transform is
row-local — `/root/reference/src/glue/transformation/transform_data.py`);
record linkage is part of the LLM-pipeline extension surface: reconciling
dirty ingest batches (OCR noise, manual entry) against a clean master
table is the classic pre-dedup step.

Scale shape: never all-pairs. Candidates come from an equi-join on a
BLOCKING KEY — a feature of the record the corruption model can't touch
(here: a stable suffix; in production: phonetic codes, sorted-neighborhood
windows, zip codes). Edit distance runs only inside blocks, and Spark's
``levenshtein(l, r, threshold)`` short-circuits the DP once the threshold
is exceeded, so cost per candidate is O(threshold * len), not O(len^2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_edit_distance_match(
    clean: DataFrame,
    dirty: DataFrame,
    block_fn,
    id_col: str = "id",
    name_col: str = "name",
    max_distance: int = 1,
) -> DataFrame:
    """Match each record of ``dirty`` against ``clean`` by Levenshtein
    distance, comparing only records whose ``block_fn(name)`` agree.

    Both inputs need (id_col, name_col). Returns (clean_id, dirty_id,
    distance) for every candidate pair within ``max_distance``. Recall is
    exactly the blocking key's: a true match whose block keys differ is
    missed — choose ``block_fn`` from the fields the noise model preserves.
    """
    c = clean.select(
        F.col(id_col).alias("clean_id"),
        F.col(name_col).alias("_cn"),
        block_fn(F.col(name_col)).alias("_blk"),
    )
    d = dirty.select(
        F.col(id_col).alias("dirty_id"),
        F.col(name_col).alias("_dn"),
        block_fn(F.col(name_col)).alias("_blk"),
    )
    dist = F.levenshtein(F.col("_cn"), F.col("_dn"))
    return (
        c.join(d, "_blk")
        .filter(dist <= max_distance)
        .select("clean_id", "dirty_id", dist.cast("int").alias("distance"))
    )
