"""Round-10 tests: ADVICE-fix contracts (median lint regex, q209 degenerate
corpus, NULL-group percentile gate), the cumulative-drift bench gate, the
grouped-histogram percentile engine, and the combined drift-trio monitor."""

from __future__ import annotations

import importlib.util
import json
import os

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# --------------------------------------------------------------------------
# lint: the exact-percentile rule must match `median(` in the plan TEXT, not
# rely on Spark lowering median() to percentile (round-9 ADVICE)
# --------------------------------------------------------------------------


def test_lint_flags_literal_median_plan_text(spark, monkeypatch):
    from universal_aws_data_pipeline_spark.plans import lint

    df = spark.range(1)
    monkeypatch.setattr(
        lint,
        "_plan_string",
        lambda _df: "HashAggregate(keys=[g], functions=[median(v)])",
    )
    assert "exact-percentile-agg" in {f.rule for f in lint.lint_plan(df)}


def test_lint_median_regex_quiet_on_lookalikes(spark, monkeypatch):
    """`group_median(` / `approx_percentile(` must NOT fire the rule — the
    lookbehind guards prefixed identifiers and approx sketches are bounded
    state by design."""
    from universal_aws_data_pipeline_spark.plans import lint

    df = spark.range(1)
    monkeypatch.setattr(
        lint,
        "_plan_string",
        lambda _df: "HashAggregate(functions=[group_median(v), approx_percentile(v, 0.5)])",
    )
    assert "exact-percentile-agg" not in {f.rule for f in lint.lint_plan(df)}


# --------------------------------------------------------------------------
# q209: a one-sided corpus (zero views or zero purchases) must produce ZERO
# rows on BOTH engines, never NULL-vs-error divergence (round-9 ADVICE)
# --------------------------------------------------------------------------


def test_q209_one_sided_corpus_zero_rows_both_engines(spark, sf_dir, tmp_path):
    import duckdb

    from tests.oracle import TABLES, compare
    from universal_aws_data_pipeline_spark.plans.catalog import QUERIES

    fixture = tmp_path / "one_sided"
    fixture.mkdir()
    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        if t == "events":
            duckdb.connect().execute(
                f"COPY (SELECT * FROM read_parquet('{src}') "
                f"WHERE event_type <> 'purchase') TO "
                f"'{fixture}/events.parquet' (FORMAT PARQUET)"
            )
        else:
            os.symlink(src, fixture / f"{t}.parquet")
    spec = QUERIES["q209_mann_whitney"]
    assert spec.fn(spark, str(fixture)).count() == 0
    ok, msg = compare(spark, str(fixture), spec.fn, spec.oracle)
    assert ok, msg


# --------------------------------------------------------------------------
# bench_compare: the cumulative-drift gate (VERDICT r9 item 1) — diffuse
# per-query drag under the 1.5x bar must still flag when the common-subset
# TOTAL exceeds any reference by >10%, and must clear when the retry series
# shows the drift does not reproduce.
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def bench_compare_mod():
    spec = importlib.util.spec_from_file_location(
        "bench_compare", os.path.join(REPO, "scripts", "bench_compare.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_ref(tmp_path, name: str, warm: dict) -> str:
    p = tmp_path / name
    p.write_text(json.dumps({"warm": warm}))
    return str(p)


def test_cumulative_drift_flags_diffuse_drag(bench_compare_mod, tmp_path, capsys):
    ref = {f"q{i}": 1.0 for i in range(20)}
    ref_path = _write_ref(tmp_path, "ref.json", ref)
    # every query +12%: under the per-query bar (1.12x < 1.5x) but the
    # common total is 22.4s vs 20.0s = +12% > the 10% drift bound
    cur = {f"q{i}": 1.12 for i in range(20)}
    flagged, _cleared = bench_compare_mod.compare(cur, ref_path, None)
    assert flagged is True
    out = capsys.readouterr().out
    assert "CUMULATIVE DRIFT" in out
    assert "REGRESSED" not in out


def test_cumulative_drift_quiet_within_bound(bench_compare_mod, tmp_path, capsys):
    ref_path = _write_ref(tmp_path, "ref.json", {f"q{i}": 1.0 for i in range(20)})
    cur = {f"q{i}": 1.05 for i in range(20)}
    flagged, _cleared = bench_compare_mod.compare(cur, ref_path, None)
    assert flagged is False
    assert "CUMULATIVE DRIFT" not in capsys.readouterr().out


def test_cumulative_drift_cleared_by_quiet_retry(bench_compare_mod, tmp_path, capsys):
    """Reproduce-to-flag extends to the total: the better of the two series
    is gated, so one draggy session can't flag when its twin is clean."""
    ref_path = _write_ref(tmp_path, "ref.json", {f"q{i}": 1.0 for i in range(20)})
    cur = {f"q{i}": 1.12 for i in range(20)}
    retry = {f"q{i}": 1.01 for i in range(20)}
    flagged, _cleared = bench_compare_mod.compare(cur, ref_path, retry)
    assert flagged is False
    assert "CUMULATIVE DRIFT" not in capsys.readouterr().out


# --------------------------------------------------------------------------
# exact_ranks_grouped: the grouped-histogram selection engine (VERDICT r9
# item 2) — one literal-map round per refinement step, scan cost flat in
# |groups|, percentile_disc-exact per (group, rank) target
# --------------------------------------------------------------------------


def test_exact_ranks_grouped_matches_brute_force(spark):
    """percentile_disc-exact values for every (group, rank) target — across
    string groups, tie-heavy measures, negative values, and sub-bucket
    spans — with knobs forced small enough that refinement rounds and the
    batched direct finish both execute."""
    import random

    from universal_aws_data_pipeline_spark.operators.robust import exact_ranks_grouped

    random.seed(10)
    rows = (
        [("ga", random.randint(-(10**9), 10**9)) for _ in range(300)]  # wide
        + [("gb", random.choice([3, 7])) for _ in range(200)]  # tie-heavy
        + [("gc", random.randint(0, 5)) for _ in range(150)]  # sub-bucket span
    )
    df = spark.createDataFrame(rows, "g string, v long").localCheckpoint()
    by_g: dict[str, list[int]] = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g in by_g:
        by_g[g].sort()
    targets = []
    for g, vs in by_g.items():
        n = len(vs)
        targets += [(g, 1), (g, n), (g, (n + 1) // 2), (g, max(1, n // 4))]
    got = exact_ranks_grouped(df, "g", "v", targets, buckets=16, direct_cap=50)
    assert got == [by_g[g][rk - 1] for g, rk in targets]
    # default knobs agree
    got2 = exact_ranks_grouped(df, "g", "v", targets)
    assert got2 == got


def test_exact_ranks_grouped_accepts_precomputed_stats(spark):
    """Callers that already grouped-scan for counts fold min/max into that
    pass and hand the engine its stats — one grouped scan on the large
    path, identical answers."""
    from universal_aws_data_pipeline_spark.operators.robust import exact_ranks_grouped

    rows = [("a", v) for v in (5, -3, 9, 9, 0)] + [("b", v) for v in (100, 42)]
    df = spark.createDataFrame(rows, "g string, v long").localCheckpoint()
    targets = [("a", 1), ("a", 3), ("a", 5), ("b", 2)]
    want = exact_ranks_grouped(df, "g", "v", targets, buckets=4, direct_cap=1)
    stats = {"a": (5, -3, 9), "b": (2, 42, 100)}
    got = exact_ranks_grouped(
        df, "g", "v", targets, buckets=4, direct_cap=1, stats=stats
    )
    assert got == want == [-3, 5, 9, 100]


def test_exact_ranks_grouped_integral_group_column(spark):
    """Integral group columns round-trip through the CAST(… AS STRING) map
    key exactly."""
    from universal_aws_data_pipeline_spark.operators.robust import exact_ranks_grouped

    rows = [(k, v) for k in (1, 2, 30) for v in range(10 * k, 10 * k + 7)]
    df = spark.createDataFrame(rows, "g long, v long").localCheckpoint()
    got = exact_ranks_grouped(
        df, "g", "v", [("1", 1), ("2", 7), ("30", 4)], buckets=4, direct_cap=2
    )
    assert got == [10, 26, 303]


def test_exact_ranks_grouped_overflow_span_mid_split(spark):
    """A group spanning nearly the whole int64 range routes through the
    comparison-only mid split (the exact_ranks_multi guard)."""
    from universal_aws_data_pipeline_spark.operators.robust import exact_ranks_grouped

    lo, hi = -(2**62) - 7, 2**62 + 11
    vals = [lo, -5, 0, 3, hi]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "g string, v long"
    ).localCheckpoint()
    got = exact_ranks_grouped(
        df, "g", "v", [("g", k) for k in (1, 3, 5)], direct_cap=1
    )
    assert got == [lo, 0, hi]


def test_exact_ranks_grouped_bad_rank_raises(spark):
    from universal_aws_data_pipeline_spark.operators.robust import exact_ranks_grouped

    df = spark.createDataFrame([("g", 1)], "g string, v long").localCheckpoint()
    with pytest.raises(ValueError, match="outside"):
        exact_ranks_grouped(df, "g", "v", [("g", 2)])
    with pytest.raises(ValueError, match="outside"):
        exact_ranks_grouped(df, "g", "v", [("missing", 1)])


# --------------------------------------------------------------------------
# percentile_cont_long: the large grouped path now ENFORCES non-null group
# keys instead of silently diverging from the under-gate aggregate
# (round-9 ADVICE), and routes through the grouped engine
# --------------------------------------------------------------------------


def test_percentile_cont_long_null_group_raises_on_large_path(spark):
    from universal_aws_data_pipeline_spark.operators.robust import percentile_cont_long

    rows = [("a", i) for i in range(40)] + [(None, i) for i in range(40)]
    df = spark.createDataFrame(rows, "g string, us long")
    # under the gate: the aggregate keeps NULL as a group — 2 output rows
    small = percentile_cont_long(df, "g", "us", {"p50": 0.5})
    assert small.count() == 2
    # above the gate (forced): loud failure, never a silent drop
    with pytest.raises(ValueError, match="NULL group key"):
        percentile_cont_long(df, "g", "us", {"p50": 0.5}, gate_rows=10)


def test_percentile_cont_long_grouped_large_path_one_scan_per_round(spark):
    """The grouped large path must call the GROUPED engine (flat scans), not
    build per-(group,rank) equality predicates through exact_ranks_multi."""
    from universal_aws_data_pipeline_spark.operators import robust

    calls = {"grouped": 0, "multi": 0}
    orig_g, orig_m = robust.exact_ranks_grouped, robust.exact_ranks_multi

    def spy_g(*a, **k):
        calls["grouped"] += 1
        return orig_g(*a, **k)

    def spy_m(*a, **k):
        calls["multi"] += 1
        return orig_m(*a, **k)

    robust.exact_ranks_grouped, robust.exact_ranks_multi = spy_g, spy_m
    try:
        rows = [(t, i * 7 % 101) for t in ("a", "b", "c") for i in range(50)]
        df = spark.createDataFrame(rows, "g string, us long")
        out = robust.percentile_cont_long(
            df, "g", "us", {"p50": 0.5, "p90": 0.9}, gate_rows=10
        )
        want = {
            r["g"]: r
            for r in robust.percentile_cont_long(
                df, "g", "us", {"p50": 0.5, "p90": 0.9}
            ).collect()
        }
        for r in out.collect():
            assert r["p50"] == want[r["g"]]["p50"]
            assert r["p90"] == want[r["g"]]["p90"]
    finally:
        robust.exact_ranks_grouped, robust.exact_ranks_multi = orig_g, orig_m
    assert calls["grouped"] == 1
    assert calls["multi"] == 0


def test_theil_sen_micro_grouped_known_slopes(spark):
    """Per-group medians recover exact known slopes from one shared loop;
    single-point groups are absent; NULL groups raise."""
    from universal_aws_data_pipeline_spark.operators.robust import (
        theil_sen_micro_grouped,
    )

    rows = (
        [("up", x, 250 * x + 10_000) for x in range(20)]
        + [("down", x, -40 * x + 5_000) for x in range(15)]
        + [("lonely", 3, 777)]
    )
    daily = spark.createDataFrame(rows, "g string, d long, cents long")
    out = {r["g"]: r for r in theil_sen_micro_grouped(daily, "g").collect()}
    assert set(out) == {"up", "down"}
    assert out["up"]["slope_micro"] == 250 * 1_000_000
    assert out["up"]["n_points"] == 20 and out["up"]["n_pairs"] == 190
    assert out["down"]["slope_micro"] == -40 * 1_000_000
    assert out["down"]["n_points"] == 15 and out["down"]["n_pairs"] == 105
    with pytest.raises(ValueError, match="NULL group key"):
        theil_sen_micro_grouped(
            spark.createDataFrame(
                [(None, 1, 10), (None, 2, 20)], "g string, d long, cents long"
            ),
            "g",
        )


# --------------------------------------------------------------------------
# drift trio monitor: one batch scan serves all three legs (VERDICT r9
# item 4), and leg blind spots compose (novel groups alert via PSI/JS, KS
# stays NULL)
# --------------------------------------------------------------------------


def test_drift_trio_monitor_single_batch_scan(spark, tmp_path):
    """The micro-batch is scanned exactly once however many legs run: the
    combined cells are checkpointed and PSI/JS/KS all derive from that
    (the js_divergence scan-count assertion style)."""
    from universal_aws_data_pipeline_spark.operators.drift import (
        drift_trio_monitor_batch_fn,
        value_histogram,
    )

    ref_df = spark.createDataFrame(
        [("click", float(v)) for v in [10, 60, 110, 160, 210] * 8],
        "event_type string, value double",
    )
    ref_hist = value_histogram(ref_df, "event_type", "value")
    batch = spark.createDataFrame(
        [("click", float(v) + 300.0) for v in [10, 60, 110, 160, 210] * 8],
        "event_type string, value double",
    )
    acc = spark.sparkContext.accumulator(0)

    def bump(it):
        for pdf in it:
            acc.add(len(pdf))
            yield pdf

    counted = batch.mapInPandas(bump, batch.schema)
    out = str(tmp_path / "trio_alerts")
    drift_trio_monitor_batch_fn(ref_hist, out)(counted, 7)
    assert acc.value == 40, f"batch rows seen {acc.value}x, expected one scan"
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["batch_id"] == 7
    # the +300 shift moves every value out of the reference bins: all legs
    assert r["psi_alert"] and r["js_alert"] and r["ks_alert"]
    assert r["ks_micro"] == 1_000_000
    assert 0.0 < r["js_nats"] <= 0.6932  # ln 2 bound
    assert r["psi"] > 0.1


def test_drift_trio_monitor_novel_group_alerts_without_ks(spark, tmp_path):
    """A group absent from the reference must still alert (PSI smoothing +
    the JS ln2/2 novelty score) while the KS leg stays NULL/quiet — the
    composed coverage the single-KS docstring points at."""
    from universal_aws_data_pipeline_spark.operators.drift import (
        drift_trio_monitor_batch_fn,
        value_histogram,
    )

    ref_df = spark.createDataFrame(
        [("click", float(v)) for v in [10, 60, 110, 160, 210] * 8],
        "event_type string, value double",
    )
    ref_hist = value_histogram(ref_df, "event_type", "value")
    batch = spark.createDataFrame(
        # click replays the reference (quiet); 'promo' is brand-new
        [("click", float(v)) for v in [10, 60, 110, 160, 210] * 8]
        + [("promo", 480.0)] * 20,
        "event_type string, value double",
    )
    out = str(tmp_path / "trio_novel")
    drift_trio_monitor_batch_fn(ref_hist, out)(batch, 1)
    rows = {r["event_type"]: r for r in spark.read.parquet(out).collect()}
    assert list(rows) == ["promo"]  # click is quiet on every leg
    novel = rows["promo"]
    assert novel["psi_alert"] and novel["js_alert"]
    assert novel["ks_micro"] is None and not novel["ks_alert"]
    # all mass is reference-absent: JS = ln2/2
    assert abs(novel["js_nats"] - 0.3466) < 1e-3


def test_default_refs_carry_two_recent_rounds(bench_compare_mod):
    """The default gate set is r3 + the TWO most recent round references —
    the older of the pair exists to catch two-round compounding drift."""
    refs = [os.path.basename(p) for p in bench_compare_mod.default_refs()]
    assert refs[0] == "r3_warm_reference.json"
    rounds = [int(r.split("_")[0][1:]) for r in refs[1:]]
    assert len(rounds) == 2 and rounds == sorted(rounds)
