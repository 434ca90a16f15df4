"""Round-9 operator tests: ADVICE-fix contracts (NULL semantics, scan
counts), the batched multi-rank quickselect engine, and the size-gated
exact-percentile devices that close the q145/q146/q147 class."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_word_shingles_null_text_stays_null(spark):
    """NULL text must shingle to [NULL] (the DuckDB oracle's `ELSE [norm]`
    branch), never collide with an empty-string document's [\"\"] (round-8
    ADVICE: concat_ws never returns NULL)."""
    from universal_aws_data_pipeline_spark.functions.texthash import word_shingles

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "one two"), (4, "a b c d")], "id long, text string"
    )
    got = {
        r["id"]: r["sh"]
        for r in df.select("id", word_shingles(F.col("text"), 3).alias("sh")).collect()
    }
    assert got[1] == [None]
    assert got[2] == [""]
    assert got[1] != got[2]  # the collision the guard prevents
    assert got[3] == ["one two"]
    assert got[4] == ["a b c", "b c d"]


def test_group_safe_split_keeps_null_group_rows(spark):
    """Rows with a NULL group key are singleton groups keyed by the row key
    (the q199 convention): they appear in exactly one split and the audit's
    n_rows totals the input (round-8 ADVICE: the inner size join used to
    drop them)."""
    from universal_aws_data_pipeline_spark.operators.sampling import group_safe_split

    rows = [(i, "g1" if i < 4 else None) for i in range(10)]
    df = spark.createDataFrame(rows, "k long, g string")
    audit = group_safe_split(df, "k", "g").collect()
    assert sum(r["n_rows"] for r in audit) == 10
    # the 4 g1 rows are dup-group rows; the 6 null-group singletons are not
    assert sum(r["n_dup_rows"] for r in audit) == 4
    assert sum(r["n_groups"] for r in audit) == 7  # g1 + 6 singletons


def test_js_divergence_single_corpus_scan(spark):
    """The corpus is scanned exactly once: cells is checkpointed and gtot /
    per-group totals / N derive from it (round-8 ADVICE: three scans)."""
    from universal_aws_data_pipeline_spark.operators.trend import js_divergence

    calls = {"n": 0}
    base = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "x")], "g string, t string"
    )

    def counting_scan(df):
        # mapInPandas side-channel: every executed scan of the input bumps
        # a driver-side accumulator
        acc = spark.sparkContext.accumulator(0)

        def fn(it):
            for pdf in it:
                acc.add(len(pdf))
                yield pdf

        return df.mapInPandas(fn, df.schema), acc

    scanned, acc = counting_scan(base)
    out = js_divergence(scanned, "g", "t").collect()
    assert len(out) == 2
    assert acc.value == 3, f"input rows seen {acc.value}x, expected one scan"


def test_exact_ranks_multi_matches_brute_force(spark):
    """The batched engine returns percentile_disc-exact values for every
    (predicate, column, rank) target — across groups, tie-heavy measures,
    and sub-bucket spans — in one shared refinement loop."""
    import random

    from universal_aws_data_pipeline_spark.operators.robust import exact_ranks_multi

    random.seed(9)
    rows = [
        (
            "g%d" % (i % 3),
            random.randint(-(10**9), 10**9),  # wide spread
            random.randint(1, 7),  # heavily tied small-span measure
        )
        for i in range(5000)
    ]
    df = spark.createDataFrame(rows, "g string, a long, b long").localCheckpoint()
    by_g_a = {g: sorted(v for gg, v, _ in rows if gg == g) for g in ("g0", "g1", "g2")}
    by_g_b = {g: sorted(v for gg, _, v in rows if gg == g) for g in ("g0", "g1", "g2")}
    all_a = sorted(v for _, v, _ in rows)

    targets, expect = [], []
    for g in ("g0", "g1", "g2"):
        for rk in (1, 7, len(by_g_a[g]) // 2, len(by_g_a[g])):
            targets.append((F.col("g") == g, "a", rk))
            expect.append(by_g_a[g][rk - 1])
            targets.append((F.col("g") == g, "b", rk))
            expect.append(by_g_b[g][rk - 1])
    targets.append((None, "a", 2500))
    expect.append(all_a[2499])
    # tiny direct_cap forces histogram refinement; tiny buckets force rounds
    got = exact_ranks_multi(df, targets, buckets=16, direct_cap=50)
    assert got == expect
    # and with production knobs
    got2 = exact_ranks_multi(df, targets)
    assert got2 == expect


def test_exact_ranks_multi_overflow_span_mid_split(spark):
    """A surviving range wider than int64 bucket arithmetic refines by
    comparison-only bisection (same guard as exact_rank_long)."""
    from universal_aws_data_pipeline_spark.operators.robust import exact_ranks_multi

    lo, hi = -(2**62) - 7, 2**62 + 11
    vals = [lo, -5, 0, 3, hi, 42, lo + 1, hi - 1]
    df = spark.createDataFrame([(v,) for v in vals], "v long").localCheckpoint()
    s = sorted(vals)
    got = exact_ranks_multi(df, [(None, "v", k) for k in (1, 4, 8)], direct_cap=2)
    assert got == [s[0], s[3], s[7]]


def test_exact_rank_long_tied_measure_no_rank_sized_sort(spark):
    """A small-span heavily-tied column (order counts) resolves via width-1
    histogram walk: the rank can exceed _DIRECT_SORT_CAP without a
    rank-sized TakeOrdered (the round-9 funnel fix)."""
    from universal_aws_data_pipeline_spark.operators import robust

    df = spark.range(0, 300_000).select((F.col("id") % 5 + 1).alias("v"))
    # rank 200k of 300k rows over values 1..5 -> value 4
    assert robust.exact_rank_long(df, "v", 200_000) == 4


def test_percentile_cont_long_both_paths_match_aggregate(spark):
    """Small path IS the aggregate; the large (gated) path reproduces the
    aggregate's interpolated doubles bit-for-bit, grouped and global."""
    import random

    from universal_aws_data_pipeline_spark.operators.robust import percentile_cont_long

    random.seed(91)
    rows = [
        ("t%d" % (i % 4), random.randint(0, 10**12) if i % 11 else None)
        for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "t string, us long")
    percs = {"p50": 0.5, "p90": 0.9, "p95": 0.95, "p99": 0.99}
    agg = {
        r["t"]: r
        for r in df.groupBy("t")
        .agg(*[F.expr(f"percentile(us, {p!r})").alias(nm) for nm, p in percs.items()])
        .collect()
    }
    small = {r["t"]: r for r in percentile_cont_long(df, "t", "us", percs).collect()}
    forced = {
        r["t"]: r
        for r in percentile_cont_long(df, "t", "us", percs, gate_rows=10).collect()
    }
    assert set(agg) == set(small) == set(forced)
    for t in agg:
        for nm in percs:
            assert small[t][nm] == agg[t][nm], (t, nm)
            assert forced[t][nm] == agg[t][nm], (t, nm)
    # global (group_col=None)
    gagg = df.agg(
        *[F.expr(f"percentile(us, {p!r})").alias(nm) for nm, p in percs.items()]
    ).collect()[0]
    gforced = percentile_cont_long(df, None, "us", percs, gate_rows=10).collect()[0]
    for nm in percs:
        assert gforced[nm] == gagg[nm], nm


def _rows_set(df):
    return sorted(tuple(r) for r in df.collect())


def test_q145_q146_q147_gated_paths_match(spark, sf_dir, monkeypatch):
    """The exact-percentile trio answers identically with the gate forced
    to zero (batched-quickselect path) and at the default gate (plain
    percentile aggregate) — the round-9 closure of the round-8 verdict's
    exact-percentile-over-continuous-measure class."""
    from universal_aws_data_pipeline_spark.plans import catalog_q101_q150 as chunk

    for qname in ("q145_mad_outliers", "q146_disorder_audit", "q147_conversion_latency"):
        fn = chunk.QUERIES[qname].fn
        monkeypatch.setattr(chunk, "_PCTL_GATE", 10_000_000)
        small = _rows_set(fn(spark, sf_dir))
        monkeypatch.setattr(chunk, "_PCTL_GATE", -1)
        forced = _rows_set(fn(spark, sf_dir))
        assert small == forced, qname
        assert len(small) > 0, qname


def test_q208_ks_matches_brute_force(spark, sf_dir):
    """Independent math check (not the DuckDB mirror): the grid-histogram
    KS equals the classic sorted-sample two-sample D computed in Python,
    at the same floor-micro discipline."""
    from universal_aws_data_pipeline_spark.plans.catalog import QUERIES

    rows = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    ).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r["cents"])
    all_vals = sorted(v for vs in by_type.values() for v in vs)
    grid = sorted(set(all_vals))
    got = {
        r["event_type"]: (r["n_type"], r["n_rest"], r["ks_micro"])
        for r in QUERIES["q208_ks_type_drift"].fn(spark, sf_dir).collect()
    }
    import bisect

    n_all = len(all_vals)
    for t, vs in by_type.items():
        vs_sorted = sorted(vs)
        n_t = len(vs)
        n_r = n_all - n_t
        d = 0
        for v in grid:
            ct = bisect.bisect_right(vs_sorted, v)
            cg = bisect.bisect_right(all_vals, v)
            d = max(d, abs((1_000_000 * ct) // n_t - (1_000_000 * (cg - ct)) // n_r))
        assert got[t] == (n_t, n_r, d), t


def test_q209_mann_whitney_matches_brute_force_pairs(spark, sf_dir):
    """Independent math check: the histogram-walk doubled-U equals the
    literal pair count 2·(#(view<purchase) + ½·#ties), and identical
    multisets give AUC exactly 500000."""
    from universal_aws_data_pipeline_spark.plans.catalog import QUERIES

    rows = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    ).collect()
    views = sorted(r["cents"] for r in rows if r["event_type"] == "view")
    purch = sorted(r["cents"] for r in rows if r["event_type"] == "purchase")
    import bisect

    u2 = 0
    for p in purch:
        below = bisect.bisect_left(views, p)
        ties = bisect.bisect_right(views, p) - below
        u2 += 2 * below + ties
    r = QUERIES["q209_mann_whitney"].fn(spark, sf_dir).collect()[0]
    assert (r["n_view"], r["n_purchase"], r["u_doubled"]) == (
        len(views),
        len(purch),
        u2,
    )
    assert r["auc_micro"] == (1_000_000 * u2) // (2 * len(views) * len(purch))
    # self-comparison sanity: identical per-cell counts give exactly 1/2
    # (2U = sum n(2C+n) over the grid telescopes to n_tot^2)
    n = {}
    for v in views:
        n[v] = n.get(v, 0) + 1
    cvb, u2_self = 0, 0
    for v in sorted(n):
        u2_self += n[v] * (2 * cvb + n[v])
        cvb += n[v]
    assert (1_000_000 * u2_self) // (2 * len(views) * len(views)) == 500_000


def test_js_drift_ref_count_column_contract(spark):
    """The monitor accepts n_ref / n / count (a bare .count()) as the
    reference count column and rejects anything else at wiring time
    (round-9 review: the docstring promised .count() but the code
    required 'n')."""
    import pytest

    from universal_aws_data_pipeline_spark.operators.drift import (
        js_drift_monitor_batch_fn,
    )

    df = spark.createDataFrame([("a", "x"), ("a", "y")], "g string, c string")
    for ref in (
        df.groupBy("g", "c").count(),
        df.groupBy("g", "c").agg(F.count(F.lit(1)).alias("n")),
        df.groupBy("g", "c").agg(F.count(F.lit(1)).alias("n_ref")),
    ):
        assert callable(
            js_drift_monitor_batch_fn(ref, "/tmp/x", group_col="g", cat_col="c")
        )
    with pytest.raises(ValueError, match="count column"):
        js_drift_monitor_batch_fn(
            df.groupBy("g", "c").agg(F.count(F.lit(1)).alias("weird")),
            "/tmp/x",
            group_col="g",
            cat_col="c",
        )
