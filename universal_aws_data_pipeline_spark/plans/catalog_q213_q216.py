"""Catalog chunk: q213–q216 (round-10 continuation).

Two new first-class operator families, each graded against a full SQL
oracle:

- **privacy** (`operators/privacy.py`): q213 releases ε-DP noisy weekly
  event counts (per-user contribution bounding → seeded Laplace noise →
  release threshold) and q214 audits a quasi-identifier combination for
  k-anonymity / l-diversity risk — the two operations a 100 TB corpus of
  user data needs before any aggregate leaves the pipeline.
- **tokenizer** (`operators/tokenizer.py`): q215 mines the BPE
  merge-candidate table (adjacent-pair frequencies over the word-
  frequency table) and q216 draws the vocabulary coverage curve that
  sizes a tokenizer's vocab budget. Both factor through the |vocab|-row
  word-frequency rollup, so corpus volume touches exactly one
  map-side-combined pass.

The DP noise is the md5-inverse-CDF device (deterministic per group key +
salt, engine-portable — see `operators/privacy.py` module docstring), so
the release is bit-reproducible and the oracle can recompute it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from universal_aws_data_pipeline_spark.plans._shared import (
    _NORM_SQL,
    _hex_int_sql,
    _t,
    register,
)

# --------------------------------------------------------------------------
# q213 — ε-DP weekly event release (privacy family). Mechanism parameters
# are module constants so the Spark plan, the oracle, and the tests can
# never disagree on the release they describe. cap=4 bites at sf0.01
# (users average ~2.7 rows per cell, tail above 4), ε=1 → Laplace(b=4),
# τ=370 demonstrably suppresses the light cells at graded scale (bounded
# counts span 189–429 there) while scaling out of the way at sf0.1.
# Operators: one (user, type, week) hash agg — the only pass that sees
# corpus volume, map-side combinable — then a rollup to the |types×weeks|
# calendar-bounded cell domain; the noise is a scalar md5 expression per
# CELL (never per row). The raw count is dropped before release.
# Oracle: identical bounding, identical md5-uniform (8 hex nibbles →
# (v+0.5)/2^32 — exact in doubles), identical inverse-CDF Laplace; the
# single ln() rides the repo-wide round(4) cross-engine contract. NULL
# group keys RAISE on the Spark side (dp_group_counts: distinct groups
# must seed distinct draws); the fixture has none, and the device
# contract requires pre-coalesced keys.
# --------------------------------------------------------------------------

_DP_CAP = 4
_DP_EPS = 1.0
_DP_TAU = 370.0
_DP_SALT = "r10"

_DP_B = float(_DP_CAP) / _DP_EPS
_DP_KEY_SQL = f"'dp:{_DP_SALT}:' || event_type || ':' || CAST(wk AS VARCHAR)"
_DP_U_SQL = f"(({_hex_int_sql(_DP_KEY_SQL, 8)}) + 0.5) / 4294967296.0"


# module constant so the q224 budget-ledger oracle can replay this release
# verbatim (a count over this exact text) — one spelling, zero drift
_Q213_ORACLE = f"""
    WITH bounded AS (
      SELECT event_type,
             datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS wk,
             least(count(*), {_DP_CAP}) AS b
      FROM events GROUP BY event_type, wk, user_id
    ), counts AS (
      SELECT event_type, CAST(wk AS BIGINT) AS wk, CAST(sum(b) AS BIGINT) AS c
      FROM bounded GROUP BY event_type, wk
    ), noised AS (
      SELECT event_type, wk,
             round(c + (-{_DP_B} * sign(u - 0.5) * ln(1 - 2 * abs(u - 0.5))), 4)
               AS noisy_count
      FROM (SELECT *, {_DP_U_SQL} AS u FROM counts)
    )
    SELECT event_type, wk, noisy_count FROM noised WHERE noisy_count >= {_DP_TAU}
    """


@register(
    "q213_dp_event_release",
    _Q213_ORACLE,
    "epsilon-DP weekly event-count release: per-user contribution bounding (cap 4) -> seeded Laplace(cap/eps) noise via the deterministic md5 inverse-CDF device -> release threshold; the raw count never leaves (privacy family)",
)
def q213(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release weekly event counts under ε-differential privacy: each
    user's contribution per (type, week) cell is capped at 4 (the
    sensitivity), each cell gets deterministic seeded Laplace(4/ε) noise,
    and cells whose NOISY count misses the threshold are suppressed —
    the standard thresholded bounded-contribution release, computed with
    built-ins only. operators/privacy.py::dp_group_counts."""
    from universal_aws_data_pipeline_spark.operators.privacy import dp_group_counts

    e = _t(spark, sf_dir, "events").select(
        "event_type",
        "user_id",
        F.expr("unix_date(cast(ts as date)) div 7").cast("long").alias("wk"),
    )
    return dp_group_counts(
        e,
        group_cols=["event_type", "wk"],
        user_col="user_id",
        epsilon=_DP_EPS,
        cap=_DP_CAP,
        salt=_DP_SALT,
        release_threshold=_DP_TAU,
    ).select("event_type", "wk", "noisy_count")


# --------------------------------------------------------------------------
# q214 — k-anonymity / l-diversity audit (privacy family). Quasi-
# identifiers: (nation, account-balance kilo-band) — the attributes an
# outside dataset plausibly shares; "sensitive": market segment. Classes
# roll up into three risk bands with the l-diversity=1 attribute-
# disclosure count per band.
# Operators: one hash agg keyed by the quasi columns (output scales with
# the dimension table — shuffle-parallel catalyst shape; the exact
# count_distinct is a second map-side-combinable pass fused by Catalyst),
# then a ≤3-row band rollup.
# Oracle: identical CASE banding; floor() on doubles is IEEE-identical.
# --------------------------------------------------------------------------

_KA_K = 5


@register(
    "q214_k_anonymity_audit",
    f"""
    WITH classes AS (
      SELECT c_nationkey,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_kilo,
             count(*) AS class_size,
             count(DISTINCT coalesce(CAST(c_mktsegment AS VARCHAR), '(null)')) AS l_div
      FROM customer GROUP BY 1, 2
    )
    SELECT CASE WHEN class_size = 1 THEN 'unique'
                WHEN class_size < {_KA_K} THEN 'below_k'
                ELSE 'anonymous' END AS risk_band,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(class_size) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN l_div = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS homogeneous_classes,
           CAST(min(class_size) AS BIGINT) AS min_size,
           CAST(max(class_size) AS BIGINT) AS max_size
    FROM classes GROUP BY 1
    """,
    "k-anonymity/l-diversity audit over (nation, balance-band) quasi-identifiers: equivalence-class sizes banded into unique/below-k/anonymous with the homogeneous-class (attribute-disclosure) count per band (privacy family)",
)
def q214(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Can customers be re-identified from (nation, balance band)? Classes
    of size 1 are outright re-identifiable, classes under k=5 are
    linkable to a small candidate set, and homogeneous classes leak the
    sensitive attribute (market segment) even without re-identification.
    One quasi-key hash agg + a 3-row rollup.
    operators/privacy.py::k_anonymity_audit."""
    from universal_aws_data_pipeline_spark.operators.privacy import k_anonymity_audit

    c = _t(spark, sf_dir, "customer").select(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_kilo"),
        "c_mktsegment",
    )
    return k_anonymity_audit(
        c, quasi_cols=["c_nationkey", "bal_kilo"], sensitive_col="c_mktsegment", k=_KA_K
    )


# --------------------------------------------------------------------------
# q215 — BPE merge-candidate pairs (tokenizer family). The first thing a
# byte-pair tokenizer learns from a corpus is the adjacent-pair frequency
# table; the top pair is merge #1. Computed the way real BPE trainers do
# it: over the WORD-FREQUENCY table, so the explode is Σ(len−1) per
# DISTINCT word — vocabulary-bounded (a language property), never
# corpus-bounded. A 100× corpus changes the counts, not the row set.
# Operators: one corpus scan → |vocab| rollup → array-expression 2-gram
# explode (substring over an index sequence; no UDF) → |pairs| rollup →
# top-40 TakeOrderedAndProject with the pair itself as tiebreak.
# Oracle: identical normalization (_NORM_SQL) and identical substring
# indexing via list_transform(range(...)).
# --------------------------------------------------------------------------


@register(
    "q215_bpe_merge_pairs",
    f"""
    WITH toks AS (
      SELECT unnest(string_split({_NORM_SQL}, ' ')) AS w FROM documents
    ), vocab AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c FROM toks WHERE w <> '' GROUP BY w
    ), pairs AS (
      SELECT unnest(list_transform(range(1, CAST(len(w) AS INTEGER)),
                                   i -> substring(w, CAST(i AS INTEGER), 2))) AS pair,
             w, c
      FROM vocab WHERE len(w) >= 2
    )
    SELECT pair,
           CAST(sum(c) AS BIGINT) AS pair_count,
           CAST(count(DISTINCT w) AS BIGINT) AS n_words
    FROM pairs GROUP BY pair
    ORDER BY pair_count DESC, pair
    LIMIT 40
    """,
    "BPE merge-candidate mining: adjacent character-pair frequencies weighted by word occurrence, computed over the vocabulary-bounded word-frequency table (one corpus pass) - the first-merge table a byte-pair tokenizer trains from (tokenizer family)",
)
def q215(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which adjacent symbol pair would BPE merge first? Pair counts
    weighted by word frequency plus the distinct-word spread of each pair
    (a merge spanning many word types beats a one-word wonder). The
    corpus is scanned once into the |vocab| table; everything after is
    vocabulary-sized. operators/tokenizer.py::bpe_pair_counts."""
    from universal_aws_data_pipeline_spark.operators.tokenizer import bpe_pair_counts

    d = _t(spark, sf_dir, "documents")
    return (
        bpe_pair_counts(d, "text")
        .orderBy(F.col("pair_count").desc(), "pair")
        .limit(40)
    )


# --------------------------------------------------------------------------
# q216 — vocabulary coverage curve (tokenizer family): for each candidate
# vocab budget V, the share of all token occurrences the top-V word types
# cover — the curve whose knee sizes the tokenizer vocabulary (uncovered
# mass is what falls to subword/UNK handling).
# Operators: the |vocab| word-frequency rollup (the only corpus-volume
# pass), then a ranking + running-sum window over the |vocab|-row table —
# single-partition BY DESIGN over a language-bounded domain (the q159/
# q209 sketch-sized adjudication class) — and a |budgets|-row broadcast
# equi-join (budgets clamp to the type count before the join).
# Oracle: identical (count desc, word asc) total order, identical clamp.
# --------------------------------------------------------------------------

_VOCAB_BUDGETS = [1, 2, 4, 8, 16, 32]


@register(
    "q216_vocab_coverage",
    f"""
    WITH toks AS (
      SELECT unnest(string_split({_NORM_SQL}, ' ')) AS w FROM documents
    ), vocab AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c FROM toks WHERE w <> '' GROUP BY w
    ), cum AS (
      SELECT CAST(row_number() OVER (ORDER BY c DESC, w) AS INTEGER) AS rn,
             CAST(sum(c) OVER (ORDER BY c DESC, w ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_tokens
      FROM vocab
    ), tot AS (
      SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS total_tokens,
             CAST(count(*) AS BIGINT) AS n_types
      FROM vocab
    ), b AS (
      SELECT CAST(unnest({_VOCAB_BUDGETS}) AS INTEGER) AS vocab_budget
    )
    -- LEFT JOIN + greatest(.., 1) floor: the operator's empty-corpus
    -- contract (budget rows degrade to zeros, never vanish) mirrored
    SELECT b.vocab_budget,
           CAST(coalesce(c.cum_tokens, 0) AS BIGINT) AS tokens_covered,
           coalesce(round(c.cum_tokens / CAST(t.total_tokens AS DOUBLE), 4), 0.0)
             AS coverage,
           t.n_types, t.total_tokens
    FROM b CROSS JOIN tot t
    LEFT JOIN cum c
      ON c.rn = greatest(least(b.vocab_budget, CAST(t.n_types AS INTEGER)), 1)
    """,
    "vocabulary coverage curve: share of all token occurrences covered by the top-V word types at candidate vocab budgets V - the tokenizer vocab-sizing curve, windowed over the language-bounded |vocab| table (tokenizer family)",
)
def q216(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How big does the vocab need to be? Coverage of total token mass by
    the top-V types at each candidate budget; budgets beyond the type
    count clamp to full coverage. The ranking window runs over the
    |vocab|-row table, never the corpus.
    operators/tokenizer.py::vocab_coverage."""
    from universal_aws_data_pipeline_spark.operators.tokenizer import vocab_coverage

    d = _t(spark, sf_dir, "documents")
    return vocab_coverage(d, _VOCAB_BUDGETS, "text")
