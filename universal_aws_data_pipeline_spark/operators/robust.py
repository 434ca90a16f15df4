"""Robust statistics over large value sets: distributed exact selection.

`percentile_disc` / `percentile` aggregate by buffering RAW values per
partition and merging every buffer into one final task — exact, but the
single merge task holds the whole value set (q174's 2.9M Theil-Sen slopes
cost ~9 s that way at sf0.1, and a 50M-slope set would put gigabytes
through one task). Exact selection doesn't need that: this module's
median is iterative RANGE REFINEMENT (distributed quickselect):

    1. one 1-row agg collects (n, min, max);
    2. each round buckets values into <= 4096 equal integer-width ranges
       (one map-side-combinable count agg), the driver walks the <= 4096-row
       histogram to find the bucket holding the target rank, and the range
       narrows to that bucket;
    3. when the surviving range holds few enough rows, the exact
       order-statistic comes from a TakeOrderedAndProject over the small
       remainder.

Every pass is a full-parallel scan + tiny agg; driver state is bounded at
4096 rows/round; convergence is geometric (range shrinks 4096x per round,
so 3 rounds cover any int64 spread). All arithmetic is integer (widths
via ceil-div), so the selected value is bit-exact — the same value
DuckDB's percentile_disc returns — just never buffered in one place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_BUCKETS = 4096
_DIRECT_SORT_CAP = 100_000  # small enough for one TakeOrdered heap


def exact_rank_long(df: DataFrame, col: str, rank: int) -> int:
    """Value at 1-based ascending ``rank`` of integer column ``col`` —
    ``percentile_disc`` semantics without the single-task value buffer.
    The input plan is localCheckpoint()ed once so refinement rounds rescan
    materialized rows, not the producing query."""
    d = df.select(F.col(col).alias("v")).localCheckpoint(eager=True)
    stats = d.agg(
        F.count(F.lit(1)).alias("n"), F.min("v").alias("lo"), F.max("v").alias("hi")
    ).collect()[0]
    n, lo, hi = stats["n"], stats["lo"], stats["hi"]
    if not 1 <= rank <= n:
        raise ValueError(f"rank {rank} outside [1, {n}]")
    below = 0  # values < lo, already accounted for
    in_range = n  # values inside [lo, hi]
    while True:
        span = hi - lo + 1
        if span > 2**63:
            # `(v - lo)` would overflow int64 inside Spark (silent under
            # non-ANSI mode — wrong buckets, wrong answer). Python span math
            # is exact, so bisect once driver-side with comparisons only:
            # one extra counting pass, and span drops to <= 2^63 (round-6
            # ADVICE). mid stays inside [lo, hi], so it fits in int64.
            mid = lo + (hi - lo) // 2
            c_left = d.filter((F.col("v") >= lo) & (F.col("v") <= mid)).count()
            if below + c_left >= rank:
                hi, in_range = mid, c_left
            else:
                below, lo, in_range = below + c_left, mid + 1, in_range - c_left
            continue
        remaining = d.filter((F.col("v") >= lo) & (F.col("v") <= hi))
        if span <= _BUCKETS or in_range <= _DIRECT_SORT_CAP:
            k = rank - below
            row = (
                remaining.orderBy("v")
                .limit(k)
                .orderBy(F.col("v").desc())
                .limit(1)
                .collect()
            )
            return row[0]["v"]
        width = -(-span // _BUCKETS)  # ceil div: every value maps to a bucket
        hist = (
            remaining.groupBy(F.expr(f"(v - {lo}) div {width}").alias("b"))
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy("b")
            .collect()
        )
        cum = below
        for r in hist:
            if cum + r["c"] >= rank:
                lo, hi = lo + r["b"] * width, min(hi, lo + (r["b"] + 1) * width - 1)
                below, in_range = cum, r["c"]
                break
            cum += r["c"]


def theil_sen_micro(
    daily: DataFrame,
    x_col: str = "d",
    y_col: str = "cents",
) -> tuple[int, int, int]:
    """Theil-Sen slope estimate over a (x, y) series: the exact lower
    median of all pairwise integer slopes floor(1e6 * dy / dx), x strictly
    increasing pairs. Returns (n_points, n_pairs, slope_micro).

    The pair stage is |points|^2 — for calendar-indexed series that is
    bounded by the observation span, never by corpus volume — and the
    median runs through :func:`exact_rank_long`, so no task ever buffers
    the slope set.
    """
    a = daily.select(F.col(x_col).alias("xa"), F.col(y_col).alias("ya"))
    b = daily.select(F.col(x_col).alias("xb"), F.col(y_col).alias("yb"))
    slopes = a.join(b, F.col("xa") < F.col("xb")).select(
        F.expr("(1000000 * (yb - ya)) div (xb - xa)").alias("s")
    )
    n_points = daily.count()
    n_pairs = n_points * (n_points - 1) // 2
    rank = (n_pairs + 1) // 2  # percentile_disc(0.5): value at ceil(n/2)
    return n_points, n_pairs, exact_rank_long(slopes, "s", rank)


def winsorized_mean_milli(
    df: DataFrame,
    group_col: str,
    value_col: str,
    fraction: float = 0.1,
) -> DataFrame:
    """Per-group winsorized-by-cutoff mean of an integer measure: drop the
    values strictly OUTSIDE [lo, hi] where lo/hi are the exact order
    statistics at ascending ranks ceil(f·n) and ceil((1−f)·n), then report
    the exact milli-unit mean of what remains. Tie-INCLUSIVE by contract:
    every row equal to a cutoff value stays (a rank-exact trim would need a
    per-row total order; the value-cutoff form is the one both engines
    replay bit-identically).

    Returns (group_col, n, lo, hi, n_kept, wmean_milli) with
    wmean_milli = floor(1000·Σkept / n_kept). int64-exact while
    1000·Σkept < 2^63 — ~9e15 in value units, e.g. 6e9 rows of $150k
    cents measures.

    Scale: two runs of the q135-stressed per-group histogram-cutoff device
    (``sampling.quantile_cutoff_by_group`` — map-side-combined (group,
    value) histogram, cumulative window over the histogram, never the raw
    rows) + one broadcast-sized cutoff join + one grouped agg. No
    per-group row window anywhere.

    DEVICE PRECONDITION (the round-8 exemption-audit vocabulary): the
    histogram's row count is |distinct values| per group, so the device
    is only domain-bounded when the measure lives on a bounded grid —
    quantized scores (q135's round(4) quality), integer cents of a
    bounded price domain (q196: ~1e7 ceiling from quantity × retail
    price). For an unbounded continuous measure the per-group cumulative
    window becomes a single-task sort that scales with data — use
    ``exact_rank_long`` per group instead when groups are few, or bucket
    the measure first.
    """
    from .sampling import quantile_cutoff_by_group

    d = df.select(F.col(group_col), F.col(value_col).alias("_x")).localCheckpoint(
        eager=True
    )
    lo = quantile_cutoff_by_group(d, group_col, "_x", fraction).withColumnRenamed(
        "qcut", "lo"
    )
    hi = quantile_cutoff_by_group(d, group_col, "_x", 1.0 - fraction).withColumnRenamed(
        "qcut", "hi"
    )
    cuts = F.broadcast(lo.join(hi, group_col))
    tot = d.groupBy(group_col).agg(F.count(F.lit(1)).cast("long").alias("n"))
    kept = (
        d.join(cuts, group_col)
        .filter((F.col("_x") >= F.col("lo")) & (F.col("_x") <= F.col("hi")))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.sum("_x").cast("long").alias("_s"),
            F.min("lo").alias("lo"),
            F.min("hi").alias("hi"),
        )
    )
    return (
        kept.join(F.broadcast(tot), group_col)
        .select(
            group_col,
            "n",
            F.col("lo").cast("long"),
            F.col("hi").cast("long"),
            "n_kept",
            F.expr("(1000 * _s) div n_kept").alias("wmean_milli"),
        )
    )


def binseg_changepoint_milli(
    daily: DataFrame,
    group_col: str,
    day_col: str = "d",
    value_col: str = "v",
    min_seg: int = 2,
) -> DataFrame:
    """Per-group single changepoint by binary segmentation: the split t
    maximizing |mean(v[1..t]) − mean(v[t+1..n])| with both segment means in
    exact MILLI-units (floor div) — the first step of the classic binary
    segmentation recursion, the complement of q151's CUSUM (which needs a
    target mean; this finds the split with none).

    Determinism: the score is |floor(1e3·L/t) − floor(1e3·(S−L)/(n−t))| —
    a pure integer expression — and ties break to the SMALLEST t, so both
    engines pick the same split. Returns
    (group_col, split_day, left_mean_milli, right_mean_milli, gap_milli).

    Scale: two prefix windows partitioned by group over the |groups × days|
    daily table, then a per-group top-1 (max_by) — never touches raw rows;
    candidate splits honor ``min_seg`` on both sides.
    """
    w = Window.partitionBy(group_col).orderBy(day_col)
    pre = daily.select(
        F.col(group_col),
        F.col(day_col).alias("t"),
        F.sum(F.col(value_col).cast("long")).over(w).alias("L"),
        F.row_number().over(w).alias("i"),
    )
    tot = daily.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(value_col).cast("long")).alias("S"),
    )
    scored = (
        pre.join(tot, group_col)
        .filter((F.col("i") >= min_seg) & (F.col("i") <= F.col("n") - min_seg))
        .select(
            group_col,
            "t",
            F.expr("(1000 * L) div i").alias("lm"),
            F.expr("(1000 * (S - L)) div (n - i)").alias("rm"),
        )
        .withColumn("gap", F.abs(F.col("lm") - F.col("rm")))
    )
    return (
        scored.groupBy(group_col)
        .agg(
            F.min_by(
                F.struct("t", "lm", "rm", "gap"),
                F.struct((-F.col("gap")).alias("ng"), F.col("t")),
            ).alias("b")
        )
        .select(
            group_col,
            F.col("b.t").alias("split_day"),
            F.col("b.lm").alias("left_mean_milli"),
            F.col("b.rm").alias("right_mean_milli"),
            F.col("b.gap").alias("gap_milli"),
        )
    )
