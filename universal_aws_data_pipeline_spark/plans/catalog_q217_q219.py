"""Catalog chunk: q217–q219 (round-10 continuation, second wave).

Depth for the two new families: q217 ENFORCES k-anonymity (generalization
ladder — the release-side counterpart of q214's audit), q218 runs the
actual BPE training loop (three greedy merge rounds, not just q215's
round-1 candidate table), and q219 releases an ε-DP median via the
exponential mechanism over the cents grid (the standard DP quantile,
composing the q208/q209 grid-bounded histogram device with the md5
selection draw).
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
# q217 — k-anonymization by generalization ladder (privacy family). The
# ladder: (nation, balance-kilo) → (nation, balance-5-kilo) → nation →
# fully generalized. Each customer gets the FINEST rung whose equivalence
# class reaches k=5 (global recoding); the output is the per-rung census —
# how much generalization the release actually pays.
# Operators: per rung, class sizes from groupBy(rung_cols).count()
# (map-side combinable, bounded by the rung's quasi DOMAIN) broadcast-
# joined back with null-safe key equality — NOT a count window partitioned
# by the rung key: the coarse nationkey rung has 25 classes, so a window
# would buffer 1/25 of the table per task at any scale (the q105/q135
# no-per-group-window convention; round-10 verdict item 1). The fully-
# generalized rung is the adjudicated 1-row scalar attach; then a
# ≤|rungs|-row rollup with a per-rung distinct-class count.
# Oracle: count windows (DuckDB's frame, row-count-equivalent to the
# groupBy size attach; count(*) OVER () serves the last rung).
# --------------------------------------------------------------------------

_LADDER_K = 5


@register(
    "q217_k_anonymize_ladder",
    f"""
    WITH base AS (
      SELECT c_nationkey AS n,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS b1,
             CAST(floor(c_acctbal / 5000) AS BIGINT) AS b5
      FROM customer
    ), sized AS (
      SELECT n, b1, b5,
             count(*) OVER (PARTITION BY n, b1) AS s0,
             count(*) OVER (PARTITION BY n, b5) AS s1,
             count(*) OVER (PARTITION BY n) AS s2,
             count(*) OVER () AS s3
      FROM base
    ), lvl AS (
      SELECT n, b1, b5,
             CASE WHEN s0 >= {_LADDER_K} THEN 0
                  WHEN s1 >= {_LADDER_K} THEN 1
                  WHEN s2 >= {_LADDER_K} THEN 2
                  WHEN s3 >= {_LADDER_K} THEN 3
                  ELSE 4 END AS anon_level
      FROM sized
    )
    SELECT CAST(anon_level AS INTEGER) AS anon_level,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT CASE anon_level
                  WHEN 0 THEN CAST(n AS VARCHAR) || '|' || CAST(b1 AS VARCHAR)
                  WHEN 1 THEN CAST(n AS VARCHAR) || '|' || CAST(b5 AS VARCHAR)
                  WHEN 2 THEN CAST(n AS VARCHAR)
                  ELSE '*' END) AS BIGINT) AS n_classes
    FROM lvl GROUP BY anon_level
    """,
    "k-anonymization by global generalization ladder: every customer assigned the finest (nation, balance-band) rung whose equivalence class reaches k=5, rolled up to the per-rung census - the enforcement counterpart of the q214 audit (privacy family)",
)
def q217(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much generalization does a k=5 release cost? Each row takes the
    finest ladder rung whose class holds >= k rows; the census shows the
    rows stuck at coarser rungs (information loss) and how many classes
    each rung exposes. operators/privacy.py::k_anonymize_ladder."""
    from universal_aws_data_pipeline_spark.operators.privacy import k_anonymize_ladder

    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("n"),
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("b1"),
        F.floor(F.col("c_acctbal") / 5000).cast("long").alias("b5"),
    )
    ladder = k_anonymize_ladder(
        c, levels=[["n", "b1"], ["n", "b5"], ["n"], []], k=_LADDER_K
    )
    key = (
        F.when(
            F.col("anon_level") == 0,
            F.concat_ws("|", F.col("n").cast("string"), F.col("b1").cast("string")),
        )
        .when(
            F.col("anon_level") == 1,
            F.concat_ws("|", F.col("n").cast("string"), F.col("b5").cast("string")),
        )
        .when(F.col("anon_level") == 2, F.col("n").cast("string"))
        .otherwise(F.lit("*"))
    )
    return (
        ladder.select("anon_level", key.alias("_key"))
        .groupBy("anon_level")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct("_key").cast("long").alias("n_classes"),
        )
    )


# --------------------------------------------------------------------------
# q218 — BPE merge learning, three greedy rounds (tokenizer family). The
# actual training loop: pair counts over the symbol-segmented vocabulary,
# top pair merged everywhere, repeat. All post-scan work is over the
# |vocab| table (language-bounded); each round's top-pair pick is a 1-row
# driver collect (bounded by construction). Merge application is the
# FIXED 3-pass leftmost non-overlapping replacement on sentinel-wrapped
# symbol strings — fixed so the oracle composes the identical expression;
# replace() semantics verified engine-identical (see bpe_learn_merges
# docstring for the exact contract: non-self pairs and self-runs ≤ 4 are
# exactly greedy BPE; self-pair runs ≥ 5 under-merge on both engines).
# Oracle: the same three rounds as chained CTEs; the top-pair scalar
# attaches via CROSS JOIN on the 1-row LIMIT 1 table.
# --------------------------------------------------------------------------

_BPE_ROUNDS = 3


def _bpe_seg_ctes(rounds: int, corpus_stats: bool = False) -> list[str]:
    """The shared CTE chain replaying ``rounds`` greedy BPE merge rounds
    (toks → vocab → seg0 → per-round pair mining p{r} / top-pair t{r} /
    re-segmentation seg{r} / symbol census s{r}). ``_bpe_oracle`` (q218/
    q222) selects the per-round merge rows from it; the q226 apply-merges
    oracle reads the final ``seg{rounds}`` table — one CTE text, so the
    train and apply oracles can never diverge on the merge contract."""
    split = "string_split(seg, ' ')"
    pair_list = (
        f"list_transform(range(1, CAST(len({split}) AS INTEGER)),"
        f" i -> {split}[i] || ' ' || {split}[i + 1])"
    )
    ctes = [
        f"toks AS (SELECT unnest(string_split({_NORM_SQL}, ' ')) AS w FROM documents)",
        "vocab AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM toks WHERE w <> '' GROUP BY w)",
        r"seg0 AS (SELECT trim(regexp_replace(w, '(.)', '\1 ', 'g')) AS seg, c FROM vocab)",
    ]
    if corpus_stats:
        ctes.append(
            "b0 AS (SELECT CAST(sum(c * len(w)) AS BIGINT) AS bs FROM vocab)"
        )
    for r in range(1, rounds + 1):
        prev = f"seg{r - 1}"
        ctes.append(
            f"p{r} AS (SELECT unnest({pair_list}) AS pair, c FROM {prev})"
        )
        ctes.append(
            f"t{r} AS (SELECT pair, CAST(sum(c) AS BIGINT) AS pc FROM p{r}"
            f" GROUP BY pair ORDER BY pc DESC, pair LIMIT 1)"
        )
        # the fixed 3-pass replace composition (tokenizer._MERGE_PASSES):
        # one pass under-merges consecutive occurrences of the pair
        merged_expr = "' ' || seg || ' '"
        for _ in range(3):
            merged_expr = (
                f"replace({merged_expr}, ' ' || t{r}.pair || ' ',"
                f" ' ' || replace(t{r}.pair, ' ', '') || ' ')"
            )
        # LEFT JOIN ON TRUE, not CROSS JOIN: when round r learns NO merge
        # (every word already fused — t{r} is empty, the engine loop's
        # early break), the seg chain must CARRY the previous segmentation
        # forward instead of collapsing to zero rows, or the q226/q227
        # seg-table consumers would diverge from apply_merges on a
        # merge-exhausted corpus. q218/q222 are unaffected either way —
        # their per-round rows select FROM t{r}, which is empty exactly
        # when the engine emitted no round-r row.
        ctes.append(
            f"seg{r} AS (SELECT CASE WHEN t{r}.pair IS NULL THEN seg"
            f" ELSE trim({merged_expr}) END AS seg, c"
            f" FROM {prev} LEFT JOIN t{r} ON TRUE)"
        )
        ctes.append(
            f"s{r} AS (SELECT CAST(count(DISTINCT sym) AS BIGINT) AS ns FROM"
            f" (SELECT unnest(string_split(seg, ' ')) AS sym FROM seg{r}))"
        )
        if corpus_stats:
            ctes.append(
                f"cs{r} AS (SELECT CAST(sum(c * len(string_split(seg, ' '))) AS BIGINT)"
                f" AS cs FROM seg{r})"
            )
    return ctes


def _bpe_oracle(rounds: int, corpus_stats: bool = False) -> str:
    """Chained-CTE oracle for ``rounds`` greedy BPE merge rounds; with
    ``corpus_stats`` each round's row carries the post-merge corpus
    symbol total and its compression vs the round-0 character baseline
    (the q222 twin of ``bpe_learn_merges(corpus_stats=True)``)."""
    ctes = _bpe_seg_ctes(rounds, corpus_stats)
    selects = []
    for r in range(1, rounds + 1):
        if corpus_stats:
            selects.append(
                f"SELECT CAST({r} AS INTEGER) AS round, t{r}.pair AS pair,"
                f" t{r}.pc AS pair_count, s{r}.ns AS n_symbols,"
                f" cs{r}.cs AS corpus_symbols,"
                f" round(cs{r}.cs / CAST(b0.bs AS DOUBLE), 4) AS compression"
                f" FROM t{r} CROSS JOIN s{r} CROSS JOIN cs{r} CROSS JOIN b0"
            )
        else:
            selects.append(
                f"SELECT CAST({r} AS INTEGER) AS round, t{r}.pair AS pair,"
                f" t{r}.pc AS pair_count, s{r}.ns AS n_symbols FROM t{r} CROSS JOIN s{r}"
            )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(selects)


@register(
    "q218_bpe_learn_merges",
    _bpe_oracle(_BPE_ROUNDS),
    "BPE tokenizer training, three greedy merge rounds: pair counts over the symbol-segmented |vocab| table -> top pair (count desc, pair asc) -> merge everywhere -> repeat; output is the learned merge list with post-merge symbol-inventory sizes (tokenizer family)",
)
def q218(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first three merges a BPE tokenizer learns from this corpus,
    with the pair frequency that won each round and the symbol-inventory
    size after applying it. One corpus scan builds the word-frequency
    table; the loop is vocabulary-sized Spark jobs plus a 1-row collect
    per round. operators/tokenizer.py::bpe_learn_merges."""
    from universal_aws_data_pipeline_spark.operators.tokenizer import bpe_learn_merges

    d = _t(spark, sf_dir, "documents")
    return bpe_learn_merges(d, rounds=_BPE_ROUNDS, text_col="text")


# --------------------------------------------------------------------------
# q219 — ε-DP median via the exponential mechanism (privacy family),
# composing two proven devices: the q208/q209 cents-grid histogram (the
# selection runs over |grid| cells, never rows) and the md5 deterministic
# draw (the q213 seeding contract). Utility u(x) = −|#below − #above| is
# integer; weights exp(ε·u/2) underflow to exactly 0.0 identically in
# both engines far from the median; the cumulative-weight walk accumulates
# in grid order on both engines, so the discrete pick is engine-stable.
# Operators: one map-side-combined rollup to the cents grid, a 1-row total
# attach (adjudicated scalar-attach), grid-sized cumulative windows
# (adjudicated single-partition — sketch-sized by the device
# precondition), then a 1-row release.
# Oracle: identical walk; ε/2 spelled 0.2/2 on both sides (exact halving,
# bit-identical weights' inputs); epsilon CAST to DOUBLE (DuckDB decimal
# literal trap).
# --------------------------------------------------------------------------

_DPM_EPS = 0.2
_DPM_SALT = "r10"
_DPM_KEY_SQL = f"'dpq:{_DPM_SALT}:' || 'median'"
_DPM_U_SQL = f"(({_hex_int_sql(_DPM_KEY_SQL, 8)}) + 0.5) / 4294967296.0"


# module constant so the q224 budget-ledger oracle can replay this release
# verbatim — one spelling, zero drift
_Q219_ORACLE = f"""
    WITH h AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS t FROM h
    ), sc AS (
      SELECT v, n, t,
             coalesce(sum(n) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS below
      FROM h CROSS JOIN tot
    ), wt AS (
      SELECT v, exp((CAST({_DPM_EPS} AS DOUBLE) / 2) * (-abs(2 * below + n - t)))
               AS wgt FROM sc
    ), cum AS (
      SELECT v, sum(wgt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumw
      FROM wt
    ), cw AS (
      -- totw = max over the ORDERED running sum, the same accumulation
      -- order Spark uses (an unordered sum() OVER () has unspecified
      -- float addition order and could diverge by an ulp)
      SELECT v, cumw, max(cumw) OVER () AS totw FROM cum
    )
    SELECT CAST(v AS BIGINT) AS dp_median_cents,
           CAST({_DPM_EPS} AS DOUBLE) AS epsilon
    FROM cw
    WHERE cumw >= ({_DPM_U_SQL}) * totw
    ORDER BY v LIMIT 1
    """


@register(
    "q219_dp_median",
    _Q219_ORACLE,
    "epsilon-DP median of event values via the exponential mechanism over the cents grid: integer utility -|#below - #above| per grid cell, exp(eps*u/2) weights, deterministic md5 selection draw - the standard DP quantile release, grid-bounded (privacy family)",
)
def q219(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release the median event value under ε-DP: the exponential
    mechanism samples a cents-grid cell with probability ∝ exp(ε·u/2),
    u = −|#below − #above| — near-median cells dominate, and the draw is
    the deterministic seeded uniform, so the release is reproducible and
    oracle-checkable. The histogram rollup is the only corpus-volume
    pass. operators/privacy.py::dp_median_grid."""
    from universal_aws_data_pipeline_spark.operators.privacy import dp_median_grid

    e = _t(spark, sf_dir, "events").select(
        F.round(F.col("value") * 100, 0).cast("long").alias("cents")
    )
    return dp_median_grid(e, "cents", epsilon=_DPM_EPS, salt=_DPM_SALT)
