"""Feature hashing (the hashing trick) for categorical feature vectors.

The standard ML featurization for unbounded categorical vocabularies
(Weinberger et al. 2009): each feature string hashes to one of k buckets
with a +/-1 sign from a second hash bit, so collisions cancel in
expectation and NO vocabulary dictionary exists to build, ship, or keep
consistent across training runs — the property that matters at 100 TB,
where a vocab build is itself a full corpus pass and any dictionary
drift silently misaligns features between dataset versions.

md5-derived buckets/signs (not xxhash/murmur) keep the mapping
engine-portable: any system with md5 reproduces the identical feature
indices — the same portability contract as the module-wide sampling and
sketch hashes.

Scale: feature expansion is a row-local array; one explode + one
map-side-combinable (id, idx) sum aggregate. Output is sparse
(id, feat_idx, val) rows — dense arrays would hash-compare fragilely and
waste space at k >> nonzeros.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(feat: Column, k: int) -> Column:
    return (
        F.conv(F.substring(F.md5(feat), 1, 4), 16, 10).cast("long") % k
    )


def _sign(feat: Column) -> Column:
    # 5th md5 nibble's low bit -> +/-1, independent of the bucket nibbles
    return 1 - 2 * (F.conv(F.substring(F.md5(feat), 5, 1), 16, 10).cast("long") % 2)


def hash_features(
    df: DataFrame,
    id_col: str,
    features: list[Column],
    k: int = 16,
) -> DataFrame:
    """Aggregate signed hashed features per id: every feature string lands
    in bucket md5[0:4] % k with sign from md5[4]; per-id bucket sums are
    the feature vector. Returns sparse (id_col, feat_idx, val) rows,
    zero-sum buckets dropped.

    NULL features hash as the sentinel token ``<null>`` rather than
    vanishing: md5(NULL) is NULL, which would null the bucket and sign, turn
    the per-bucket SUM null, and silently drop the row at the ``val != 0``
    filter — a column of all-null categoricals would disappear from the
    feature vector, masking upstream data problems. With the sentinel,
    missingness is itself a feature (round-6 ADVICE)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    feats = F.array(
        *[F.coalesce(f.cast("string"), F.lit("<null>")) for f in features]
    )
    exploded = df.select(F.col(id_col), F.explode(feats).alias("_f"))
    return (
        exploded.select(
            F.col(id_col),
            _bucket(F.col("_f"), k).alias("feat_idx"),
            _sign(F.col("_f")).alias("_s"),
        )
        .groupBy(id_col, "feat_idx")
        .agg(F.sum("_s").alias("val"))
        .filter(F.col("val") != 0)
    )
