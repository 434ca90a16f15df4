"""Deduplication operators (extensions X1/X2): exact, MinHash-LSH, SimHash,
n-gram Jaccard verification.

Scale design (the whole point of these implementations):

- **No cross-join anywhere.** Candidate pairs come from LSH band collisions —
  an equi-join on (band_index, band_hash), which shuffles each doc B times
  (B = number of bands) instead of comparing N² pairs. At 100 TB / 10^10 docs,
  brute-force pairing is impossible; band-join cardinality is
  sum_buckets C(n_bucket, 2), controlled by band width R.
- **Signatures are row-local array expressions** (no explode for signature
  computation): shingling, minhashing, banding all happen inside whole-stage
  codegen in one map pass over the corpus.
- **Portable hashing** (md5 hex, see functions/texthash.py) so signatures are
  engine-reproducible and oracle-checkable. Swap to xxhash64 for ~2x faster
  signatures when parity doesn't matter.
- Exact-Jaccard verification joins the (few) candidates back to their shingle
  arrays — two broadcast-or-shuffle hash joins on doc_id, then an
  array_intersect per pair.

Reference parity note: the reference has no dedup at all (SURVEY §2.11 — these
are driver-mandated extensions); exact dedup's keep-first semantics follow its
"first record wins" ingestion ordering (min doc_id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from universal_aws_data_pipeline_spark.functions.texthash import seeded_md5, word_shingles


def exact_dedup(df: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """Keep the first row (min order_col) per key — hash-aggregate, not a
    window sort: partial min combines map-side, so the shuffle carries one row
    per key per partition instead of every row."""
    others = [c for c in df.columns if c not in key_cols]
    agg = [F.min(F.struct(order_col, *[c for c in others if c != order_col])).alias("_first")]
    out = df.groupBy(*key_cols).agg(*agg)
    return out.select(*key_cols, "_first.*")


def minhash_signature_cols(text: Column, num_hashes: int = 8, shingle_n: int = 3) -> list[Column]:
    """K minhash values: min over shingles of seeded md5. Row-local.

    NB: the per-seed closure must be single-argument — F.transform inspects
    lambda arity and passes the ARRAY INDEX as a second argument, which would
    silently replace the seed."""
    shingles = word_shingles(text, n=shingle_n)

    def _hasher(k: int):
        return lambda s: seeded_md5(s, k)

    return [F.array_min(F.transform(shingles, _hasher(k))).alias(f"mh{k}") for k in range(num_hashes)]


def minhash_bands(df: DataFrame, text_col: str = "text", num_hashes: int = 8, bands: int = 2) -> DataFrame:
    """Add band-hash columns band_0..band_{B-1}: md5 of the concatenated
    minhash rows in each band. Docs sharing any band hash are candidates."""
    rows_per_band = num_hashes // bands
    sig = minhash_signature_cols(F.col(text_col), num_hashes=num_hashes)
    df = df.select("*", *sig)
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(F.md5(F.concat_ws("|", *parts)).alias(f"band_{b}"))
    return df.select(*df.columns, *band_cols).drop(*[f"mh{k}" for k in range(num_hashes)])


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 2,
) -> DataFrame:
    """Candidate near-duplicate pairs via LSH band collisions (id_a < id_b).

    Plan shape: map (signatures) → explode B bands → shuffle on band hash →
    per-bucket pairing → distinct. No N² anywhere; AQE handles hot buckets
    (boilerplate-heavy corpora) via skew-join splitting.
    """
    banded = minhash_bands(df.select(id_col, text_col), text_col, num_hashes, bands)
    exploded = banded.select(
        F.col(id_col),
        F.explode(
            F.array(*[F.struct(F.lit(b).alias("band_idx"), F.col(f"band_{b}").alias("band_hash")) for b in range(bands)])
        ).alias("band"),
    ).select(id_col, "band.band_idx", "band.band_hash")
    left = exploded.alias("l")
    right = exploded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )


def neardup_pairs_jaccard(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.6,
    num_hashes: int = 8,
    bands: int = 2,
    shingle_n: int = 3,
) -> DataFrame:
    """Near-duplicate pairs: LSH candidates verified by exact n-gram Jaccard.

    Returns (id_a, id_b, jaccard) with jaccard >= threshold, rounded to 4dp.
    """
    cands = lsh_candidate_pairs(df, id_col, text_col, num_hashes, bands)
    shingled = df.select(F.col(id_col), word_shingles(F.col(text_col), n=shingle_n).alias("sh"))
    a = shingled.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = shingled.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    joined = cands.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast("double")
    union = (F.size("sh_a") + F.size("sh_b")).cast("double") - inter
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (
        joined.select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash32(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """32-bit SimHash per document as a bit string (portable across engines).

    bit k = sign of sum over tokens of (2*bit_k(md5(token)[:8]) - 1): documents
    with small Hamming distance are near-duplicates. Computed via explode +
    one hash-aggregate (32 partial sums combine map-side — shuffle carries 32
    ints per doc, not the tokens).

    The hex nibble→bit arithmetic uses only strpos/substring/div/mod so the
    identical formula runs in DuckDB for the oracle.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", " ")), " ")).alias("tok"),
    )
    h8 = F.substring(F.md5(F.col("tok")), 1, 8)
    bit_sums = []
    for p in range(8):  # nibble position (hex char)
        nib = F.instr(F.lit("0123456789abcdef"), F.substring(h8, p + 1, 1)) - 1
        for j in range(4):  # bit within nibble (j=0 is the high bit: 8,4,2,1)
            bit = F.floor(nib / F.lit(2 ** (3 - j))) % 2
            k = p * 4 + j
            bit_sums.append(F.sum(bit * 2 - 1).alias(f"s{k}"))
    agg = toks.groupBy(id_col).agg(*bit_sums)
    bit_chars = [F.when(F.col(f"s{k}") >= 0, F.lit("1")).otherwise(F.lit("0")) for k in range(32)]
    return agg.select(F.col(id_col), F.concat(*bit_chars).alias("simhash"))
