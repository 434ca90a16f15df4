"""Bradley–Terry preference strength from pairwise comparisons — exact
integer micro-unit MM iterations, engine-portable.

RLHF and eval pipelines reduce to the same primitive: given millions of
pairwise outcomes (completion A beat completion B, product A outsold B,
team A beat B), estimate a per-entity strength such that
P(i beats j) = p_i / (p_i + p_j). The standard estimator is the MM
algorithm (Hunter 2004): iterate

    p_i ← W_i / Σ_j n_ij / (p_i + p_j)

where W_i is i's total wins and n_ij the number of comparisons between i
and j. Like ``graph.pagerank_micro``, a float spelling is not
hash-gradable (summation order changes low bits), so every quantity here
is BIGINT in micro-units with floor division — any engine replays the
recurrence bit-exactly, which is how the DuckDB oracle (unrolled CTE
rounds) grades it.

Recurrence (all integer, SCALE = 10^12):
    p0[i]    = 1_000_000                      (micro 1.0)
    term_ij  = n_ij * SCALE div max(p_i + p_j, 1)
    p'[i]    = W_i * SCALE div Σ_j term_ij    (0 if W_i = 0)

Fixed iteration count, no convergence action: like pagerank_micro the
rounds chain lazily into one job. Precision window: term keeps ~6
significant digits below the true ratio's scale; W_i * SCALE needs
W_i < ~9·10^6 to stay in int64 — shard or subsample comparison logs
beyond that (documented, not silently truncated).

Scale shape: comparisons aggregate ONCE to |distinct pairs| rows
(map-side combinable — the raw log is never re-shuffled per round); each
round is one shuffle join (pair counts × strengths) + one hash
aggregation, both keyed on the entity — the same per-round cost envelope
as distributed PageRank. Skewed entities (a champion compared against
everyone) are absorbed by map-side partial aggregation of the
associative denominator sum.

Reference parity: none — driver-mandated LLM-pipeline extension
(SURVEY §2.11 family); the reference has no iterative/preference surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = 1_000_000_000_000  # 10^12: micro-units out, ~6 guard digits in terms
_P0 = 1_000_000  # initial strength, micro 1.0


def bradley_terry_micro(
    comparisons: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
    iterations: int = 3,
) -> DataFrame:
    """Estimate Bradley–Terry strengths from a (winner, loser) comparison
    log. Returns (entity, n_wins, n_games, strength_micro) — strengths in
    integer micro-units after ``iterations`` exact MM rounds.

    Entities with zero wins get strength 0 (the MLE sends them to the
    boundary; the integer recurrence reaches it in one round and keeps it
    — deterministic, and a useful signal in itself).
    """
    pairs = comparisons.select(
        F.col(winner_col).alias("w"), F.col(loser_col).alias("l")
    )
    # one aggregation over the raw log: directed win counts per (i, j)
    directed = pairs.groupBy("w", "l").agg(F.count(F.lit(1)).alias("n")).localCheckpoint(
        eager=True
    )
    # symmetrize: n_ij rows under BOTH orientations so each round is a plain
    # equi-join on the "me" side
    und = (
        directed.select(F.col("w").alias("me"), F.col("l").alias("opp"), "n")
        .unionByName(directed.select(F.col("l").alias("me"), F.col("w").alias("opp"), "n"))
        .groupBy("me", "opp")
        .agg(F.sum("n").alias("n_games"))
        .localCheckpoint(eager=True)
    )
    wins = directed.groupBy("w").agg(F.sum("n").alias("n_wins")).withColumnRenamed("w", "me")
    entities = (
        und.groupBy("me")
        .agg(F.sum("n_games").cast("long").alias("n_games"))
        .join(wins, "me", "left")
        .select(
            "me",
            F.coalesce(F.col("n_wins"), F.lit(0)).cast("long").alias("n_wins"),
            "n_games",
        )
        .localCheckpoint(eager=True)
    )

    p = entities.select("me", F.lit(_P0).cast("long").alias("p"))
    for _ in range(iterations):
        denom = (
            und.join(p, "me")
            .join(p.select(F.col("me").alias("opp"), F.col("p").alias("p_opp")), "opp")
            .select(
                "me",
                F.expr(f"n_games * cast({_SCALE} as bigint) div greatest(p + p_opp, 1)").alias(
                    "term"
                ),
            )
            .groupBy("me")
            .agg(F.sum("term").alias("denom"))
        )
        p = entities.join(denom, "me", "left").select(
            "me",
            F.when(
                (F.col("n_wins") > 0) & (F.col("denom") > 0),
                F.expr(f"n_wins * cast({_SCALE} as bigint) div denom"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("p"),
        # checkpoint each round's strengths (|entities| rows — tiny): every
        # round consumes p TWICE (me + opp join sides), so an unbroken
        # lineage doubles the executed join tree per iteration (2^rounds
        # recomputations of round 1 by round N). The round-12 q133 creep
        # adjudication (PERF.md) measured the flattened plan ~12% faster at
        # 3 iterations on sf0.1 and, more importantly, linear — not
        # geometric — in the iteration count.
        ).localCheckpoint(eager=True)

    return entities.join(p, "me").select(
        F.col("me").alias("entity"),
        "n_wins",
        "n_games",
        F.col("p").alias("strength_micro"),
    )
