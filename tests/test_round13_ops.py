"""Round-13 operators: trained quality classifier (q232–q234) and
viral-span excision (q235)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from universal_aws_data_pipeline_spark.operators.classifier import (
    MICRO,
    doc_bucket_features,
    linear_probe_curve,
    linear_probe_score,
    linear_probe_train,
)
from universal_aws_data_pipeline_spark.operators.dedup import (
    excise_viral_spans,
    remove_duplicated_spans,
)


def _sep_corpus(spark):
    """A linearly separable toy corpus: target docs share one vocabulary,
    non-target docs another (disjoint), three of each. NOTE: 5-token docs
    are the documented degenerate case (||x||^2 ~ 0.36) — tests train with
    lr=2; the natural-text default lr=256 would diverge here, and ANSI mode
    surfaces that as a loud ARITHMETIC_OVERFLOW rather than silent junk."""
    rows = []
    for i in range(3):
        rows.append((i, "alpha beta gamma alpha beta", True))
        rows.append((10 + i, "omega psi chi omega psi", False))
    return spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")


def test_features_are_micro_frequencies(spark):
    df = spark.createDataFrame(
        [(1, "a a b", True), (2, "", False), (3, None, False)],
        "doc_id long, text string, tgt boolean",
    )
    feat = doc_bucket_features(df, F.col("tgt")).collect()
    # empty/NULL-text docs contribute no feature rows (documented contract)
    assert {r.doc_id for r in feat} == {1}
    by_f = sorted(r.f_micro for r in feat)
    # 'a' twice, 'b' once over 3 tokens: (1e6*2) div 3 and (1e6*1) div 3
    assert by_f == [333333, 666666]
    assert all(r.y_micro == MICRO and r.n_tokens == 3 for r in feat)


def test_train_validation_errors(spark):
    df = _sep_corpus(spark)
    with pytest.raises(ValueError, match="rounds"):
        linear_probe_train(df, F.col("tgt"), rounds=0).collect()
    with pytest.raises(ValueError, match="lr"):
        linear_probe_train(df, F.col("tgt"), lr=0).collect()


def test_train_separable_corpus_classifies_perfectly(spark):
    """Disjoint vocabularies must be fully separated by the trained model,
    and scoring under the persisted-model columns must reproduce it."""
    df = _sep_corpus(spark)
    model = linear_probe_train(df, F.col("tgt"), rounds=5, buckets=64, lr=2)
    rows = model.collect()
    assert len(rows) == 64  # full spine, absent buckets carry w=0, m=0
    assert set(model.columns) == {"bucket", "w_micro", "m_micro"}
    scored = linear_probe_score(df, model, F.col("tgt")).collect()
    assert len(scored) == 6
    for r in scored:
        assert r.pred_target == r.is_target, scored


def test_train_is_deterministic(spark):
    df = _sep_corpus(spark)
    a = sorted(linear_probe_train(df, F.col("tgt"), lr=2).collect())
    b = sorted(linear_probe_train(df, F.col("tgt"), lr=2).collect())
    assert a == b


def test_curve_matches_trainer_final_model(spark):
    """Trainer and curve consume the one shared generator: the curve's
    final-round w_l1 must equal the trained model's L1 mass."""
    df = _sep_corpus(spark)
    curve = {r.round: r for r in linear_probe_curve(df, F.col("tgt"), rounds=4, lr=2).collect()}
    assert sorted(curve) == [1, 2, 3, 4]
    model = linear_probe_train(df, F.col("tgt"), rounds=4, lr=2)
    l1 = model.agg(F.sum(F.abs("w_micro"))).collect()[0][0]
    assert curve[4].w_l1_micro == l1
    # round 1 scores under w0 = 0: every |residual| is exactly 1e6
    assert curve[1].mean_abs_resid_micro == MICRO
    # the objective must improve on a separable corpus
    assert curve[4].mean_abs_resid_micro < curve[1].mean_abs_resid_micro
    assert curve[4].n_correct == 6


def _span_corpus(spark):
    """Docs 1-3 share one 8-token span (viral at min_docs=3); docs 1 and 5
    share another (cross-doc but only 2 carriers); doc 6 is short."""
    shared3 = "one two three four five six seven eight"
    shared2 = "red orange yellow green blue indigo violet ultra"
    return spark.createDataFrame(
        [
            (1, f"{shared3} unique1 tail {shared2}"),
            (2, f"lead2 {shared3} unique2"),
            (3, f"{shared3}"),
            (5, f"{shared2} solo5"),
            (6, "tiny doc"),
        ],
        "doc_id long, text string",
    )


def test_viral_excision_threshold_and_carrier(spark):
    out = {r.doc_id: r for r in excise_viral_spans(
        _span_corpus(spark), span_n=8, min_docs=3
    ).collect()}
    assert len(out) == 5
    # doc 1 owns the 3-doc span (min doc id) — keeps everything
    assert out[1].n_removed == 0
    assert out[1].cleaned_text.startswith("one two three")
    # docs 2 and 3 lose exactly the 8 viral tokens
    assert out[2].n_removed == 8
    assert out[2].cleaned_text == "lead2 unique2"
    assert out[3].n_removed == 8
    assert out[3].cleaned_text == ""
    # the 2-doc span survives a min_docs=3 threshold on BOTH carriers
    assert out[5].n_removed == 0
    # sub-span_n docs pass untouched
    assert out[6].n_removed == 0 and out[6].cleaned_text == "tiny doc"


def test_viral_excision_min_docs_2_matches_span_surgery(spark):
    """min_docs=2 distinct carriers is exactly remove_duplicated_spans'
    cross-doc owner rule — the two operators must agree row-for-row."""
    df = _span_corpus(spark)
    a = sorted(excise_viral_spans(df, span_n=8, min_docs=2).collect())
    b = sorted(remove_duplicated_spans(df, span_n=8).collect())
    assert a == b


def test_viral_excision_overlapping_occurrences(spark):
    """A doc repeating the viral span twice loses both occurrences; the
    carrier keeps both of its own."""
    span = "a1 a2 a3 a4 a5 a6 a7 a8"
    df = spark.createDataFrame(
        [(1, f"{span} mid {span}"), (2, f"x {span} y {span} z"), (3, span)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in excise_viral_spans(df, span_n=8, min_docs=3).collect()}
    assert out[1].n_removed == 0  # carrier
    assert out[2].cleaned_text == "x y z"
    assert out[2].n_removed == 16
    assert out[3].cleaned_text == ""


# --------------------------------------------------------------------------
# bench_compare writer hardening (VERDICT r12 item 4): fold earlier clean
# same-round series, refuse hot-start ships
# --------------------------------------------------------------------------

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def bench_compare_mod():
    spec = importlib.util.spec_from_file_location(
        "bench_compare_r13", os.path.join(REPO, "scripts", "bench_compare.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _ship_args(tmp_path, detail, retry_queries, ref_warm, extra):
    detail.setdefault("load", {"0": [0.2, 6.0, 4.0]})  # cool start
    ref_path = tmp_path / "r0_ref.json"
    ref_path.write_text(json.dumps({"warm": ref_warm}))
    detail_path = tmp_path / "detail.json"
    detail_path.write_text(json.dumps(detail))
    retry_path = tmp_path / "retry.json"
    retry_path.write_text(json.dumps({"queries": retry_queries}))
    out_path = tmp_path / "shipped.json"
    argv = ["bench_compare.py", "--no-count-gate", "--retry", str(retry_path),
            "--write-reference", str(out_path), *extra,
            str(detail_path), str(ref_path)]
    return argv, out_path


def test_fold_clean_ships_per_query_min(bench_compare_mod, tmp_path, monkeypatch):
    """An earlier clean series' faster values fold into the shipped
    reference per-query; queries it lacks (post-append) keep the pair's
    value; its slower values are ignored."""
    detail = {"queries": {"qa": 2.0, "qb": 3.0, "qnew": 1.0}}
    fold_path = tmp_path / "pair1_detail.json"
    # qa faster earlier (folds), qb slower earlier (ignored), qnew absent
    fold_path.write_text(json.dumps({"queries": {"qa": 1.5, "qb": 9.0}}))
    argv, out_path = _ship_args(
        tmp_path, detail, {"qa": 2.1, "qb": 3.1, "qnew": 1.1},
        {"qa": 2.0, "qb": 3.0}, ["--fold-clean", str(fold_path)],
    )
    monkeypatch.setattr("sys.argv", argv)
    assert bench_compare_mod.main() == 0
    shipped = json.loads(out_path.read_text())
    assert shipped["warm"] == {"qa": 1.5, "qb": 3.0, "qnew": 1.0}
    assert shipped["folded"] == ["qa"]
    assert shipped["folded_from"] == ["pair1_detail.json"]


def test_hot_start_refuses_ship_unless_allowed(bench_compare_mod, tmp_path, monkeypatch):
    """A series that started under external load must not ship a reference
    (the r12 ~10% leniency crack); --allow-hot overrides after a PERF.md
    adjudication."""
    detail = {
        "queries": {"qa": 2.0},
        "sessions": {"qa": 0},
        "session_size": 50,
        "load": {"0": [6.5, 8.0, 7.0]},
    }
    argv, out_path = _ship_args(
        tmp_path, detail, {"qa": 2.0}, {"qa": 2.0}, [],
    )
    monkeypatch.setattr("sys.argv", argv)
    assert bench_compare_mod.main() == 1
    assert not out_path.exists()
    monkeypatch.setattr("sys.argv", argv + ["--allow-hot"])
    assert bench_compare_mod.main() == 0
    assert out_path.exists()


def test_adjudicate_ships_named_reproduced_flag_only(
    bench_compare_mod, tmp_path, monkeypatch
):
    """--adjudicate (round-13 optimization round, the q57 case): a
    REPRODUCED regression refuses the ship unless the query is explicitly
    named after a PERF.md adjudication; the adjudicated query ships
    min(run, retry) and the doc records it. An unnamed reproduced flag
    still refuses."""
    # qa reproduces a 2x regression vs the reference in both series; the
    # filler queries keep the common-subset total under the +10% drift
    # gate so ONLY the per-query flag is in play
    filler = {f"qf{i}": 1.0 for i in range(12)}
    detail = {"queries": {"qa": 2.0, "qb": 1.0, **filler}}
    retry = {"qa": 1.8, "qb": 1.0, **filler}
    ref = {"qa": 1.0, "qb": 1.0, **filler}
    argv, out_path = _ship_args(tmp_path, dict(detail), retry, ref, [])
    monkeypatch.setattr("sys.argv", argv)
    assert bench_compare_mod.main() == 1
    assert not out_path.exists()
    argv, out_path = _ship_args(
        tmp_path, dict(detail), retry, ref, ["--adjudicate", "qa"],
    )
    monkeypatch.setattr("sys.argv", argv)
    assert bench_compare_mod.main() == 0
    shipped = json.loads(out_path.read_text())
    assert shipped["warm"]["qa"] == 1.8  # min(run, retry), not run-1
    assert shipped["adjudicated"] == ["qa"]
    assert "qa" not in shipped["jitter_cleared"]


def test_fold_clean_requires_write_reference(bench_compare_mod, tmp_path, monkeypatch):
    detail_path = tmp_path / "detail.json"
    detail_path.write_text(json.dumps({"queries": {"qa": 1.0}}))
    fold_path = tmp_path / "fold.json"
    fold_path.write_text(json.dumps({"queries": {"qa": 0.5}}))
    monkeypatch.setattr(
        "sys.argv",
        ["bench_compare.py", "--no-count-gate",
         "--fold-clean", str(fold_path), str(detail_path)],
    )
    assert bench_compare_mod.main() == 1


def test_unigram_segment_flags_uncovered_alphabet(spark):
    """round-12 ADVICE: applying a trained unigram model to words with
    characters outside the model's char inventory must flag the rows
    (covered=false, sentinel-bearing cost) instead of pricing them
    silently."""
    from universal_aws_data_pipeline_spark.operators.tokenizer import (
        _UNI_BIG,
        unigram_train,
        unigram_viterbi_segment,
    )

    train = spark.createDataFrame(
        [(1, "abc abc ab"), (2, "abc bc")], "doc_id long, text string"
    )
    model = unigram_train(train, rounds=1, keep_multi=4)
    vocab = spark.createDataFrame(
        [("abc", 1), ("zzz", 1), ("az", 1)], "w string, c long"
    )
    rows = {r.w: r for r in unigram_viterbi_segment(vocab, model).collect()}
    assert rows["abc"].covered and rows["abc"].cost < _UNI_BIG
    # fully-unseen and partially-unseen words both carry the sentinel
    assert not rows["zzz"].covered and rows["zzz"].cost >= _UNI_BIG
    assert not rows["az"].covered


def test_selection_curve_exact_counts(spark):
    from universal_aws_data_pipeline_spark.operators.classifier import (
        selection_curve,
    )

    scored = spark.createDataFrame(
        [(1, 100, True), (2, 50, True), (3, 0, False), (4, -100, False)],
        "doc_id long, s_micro long, is_target boolean",
    )
    out = {r.threshold_micro: r for r in selection_curve(
        scored, [-200, 0, 60, 200]
    ).collect()}
    # t=-200 keeps all 4 (2 targets): precision 500000, recall 1000000
    assert (out[-200].n_kept, out[-200].n_target_kept) == (4, 2)
    assert out[-200].precision_micro == 500_000
    assert out[-200].recall_micro == 1_000_000
    # t=0 keeps 3 (2 targets): precision (2e6) div 3 = 666666
    assert (out[0].n_kept, out[0].precision_micro) == (3, 666_666)
    # t=60 keeps only doc 1
    assert (out[60].n_kept, out[60].n_target_kept) == (1, 1)
    assert out[60].recall_micro == 500_000
    # t=200 keeps nothing: ratios are 0 by the empty-slice rule
    assert (out[200].n_kept, out[200].precision_micro, out[200].recall_micro) == (0, 0, 0)
    with pytest.raises(ValueError, match="thresholds"):
        selection_curve(scored, [])
    with pytest.raises(ValueError, match="duplicate"):
        selection_curve(scored, [0, 0])


# --------------------------------------------------------------------------
# STR9: streaming quality filter under the frozen trained model
# --------------------------------------------------------------------------


def test_quality_filter_stream_fn_matches_batch_and_replays(spark, tmp_path):
    from universal_aws_data_pipeline_spark.operators.classifier import (
        quality_filter_stream_fn,
    )

    train = _sep_corpus(spark)
    model_path = str(tmp_path / "model")
    linear_probe_train(train, F.col("tgt"), rounds=5, lr=2).write.parquet(model_path)
    out = str(tmp_path / "scored_log")
    fn = quality_filter_stream_fn(out, model_path, keep_threshold_micro=0)

    batch = spark.createDataFrame(
        [(100, "alpha beta gamma"), (101, "omega psi chi"), (102, "")],
        "doc_id long, text string",
    )
    fn(batch, 0)
    rows = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert len(rows) == 3
    # the separable corpus: target-vocab doc kept, other rejected
    assert rows[100].kept and rows[100].s_micro >= 0
    assert not rows[101].kept and rows[101].s_micro < 0
    # zero-token doc surfaces as an explicit NULL-score rejection
    assert rows[102].s_micro is None and not rows[102].kept
    # batch-path and offline scoring share one contract
    model = spark.read.parquet(model_path)
    offline = {
        r.doc_id: r.s_micro
        for r in linear_probe_score(
            batch.filter(F.col("text") != ""), model, F.lit(False)
        ).collect()
    }
    assert offline == {100: rows[100].s_micro, 101: rows[101].s_micro}
    # replay determinism: re-running the same batch appends byte-identical
    # rows — dedup on (doc_id, batch_id) is lossless
    fn(batch, 0)
    dedup = spark.read.parquet(out).distinct()
    assert dedup.count() == 3


def test_streaming_quality_filter_maintainer(spark, tmp_path):
    """STR9 through a REAL stream: two file micro-batches scored under the
    frozen model; the decision log equals sequential batch scoring."""
    import json as _json

    from universal_aws_data_pipeline_spark.operators.classifier import (
        quality_filter_stream_fn,
    )
    from universal_aws_data_pipeline_spark.streaming.ops import (
        read_stream_source,
        write_stream_sink,
    )

    train = _sep_corpus(spark)
    model_path = str(tmp_path / "model")
    linear_probe_train(train, F.col("tgt"), rounds=5, lr=2).write.parquet(model_path)

    d = tmp_path / "docs_in"
    d.mkdir()
    rows = [
        (1, "alpha beta alpha"), (2, "omega psi"), (3, "alpha omega"),
        (4, "beta gamma beta"), (5, "chi psi omega"), (6, "gamma"),
    ]
    for part, chunk in enumerate((rows[:3], rows[3:])):
        with open(d / f"b{part}.json", "w") as fh:
            for doc_id, text in chunk:
                fh.write(_json.dumps({"doc_id": doc_id, "text": text}) + "\n")

    out = str(tmp_path / "stream_log")
    stream = read_stream_source(
        spark,
        {"type": "file", "path": str(d), "format": "json",
         "max_files_per_trigger": 1},
        "doc_id long, text string",
    )
    q = write_stream_sink(
        stream,
        {"type": "foreach_batch",
         "fn": quality_filter_stream_fn(out, model_path),
         "checkpoint": str(tmp_path / "ckpt_qf"),
         "trigger": {"availableNow": True}},
    )
    q.awaitTermination(120)
    log = spark.read.parquet(out)
    assert log.count() == 6
    assert log.select("batch_id").distinct().count() == 2
    kept = {r.doc_id for r in log.filter("kept").collect()}
    # pure target-vocab docs keep; pure other-vocab docs reject
    assert {1, 4} <= kept
    assert not ({2, 5} & kept)


def test_ship_refuses_without_load_telemetry(bench_compare_mod, tmp_path, monkeypatch):
    """A series with no session-0 load telemetry cannot ship (the
    hot-start check would be silently bypassed)."""
    detail = {"queries": {"qa": 2.0}, "load": None}
    argv, out_path = _ship_args(tmp_path, detail, {"qa": 2.0}, {"qa": 2.0}, [])
    monkeypatch.setattr("sys.argv", argv)
    assert bench_compare_mod.main() == 1
    assert not out_path.exists()


def test_fold_clean_refuses_implausible_fold(bench_compare_mod, tmp_path, monkeypatch):
    """A fold value >2x faster than the pair's evidence is a different
    plan/round, not a quieter window — the ship refuses."""
    detail = {"queries": {"qa": 2.0, "qb": 3.0}}
    fold_path = tmp_path / "stale_detail.json"
    fold_path.write_text(json.dumps({"queries": {"qa": 0.6, "qb": 2.9}}))
    argv, out_path = _ship_args(
        tmp_path, detail, {"qa": 2.1, "qb": 3.1}, {"qa": 2.0, "qb": 3.0},
        ["--fold-clean", str(fold_path)],
    )
    monkeypatch.setattr("sys.argv", argv)
    assert bench_compare_mod.main() == 1
    assert not out_path.exists()


def test_fold_clean_refuses_disjoint_series(bench_compare_mod, tmp_path, monkeypatch):
    detail = {"queries": {"qa": 2.0, "qb": 3.0, "qc": 1.0}}
    fold_path = tmp_path / "foreign_detail.json"
    fold_path.write_text(json.dumps({"queries": {"qz": 1.0}}))
    argv, out_path = _ship_args(
        tmp_path, detail, {"qa": 2.0, "qb": 3.0, "qc": 1.0},
        {"qa": 2.0, "qb": 3.0}, ["--fold-clean", str(fold_path)],
    )
    monkeypatch.setattr("sys.argv", argv)
    assert bench_compare_mod.main() == 1
    assert not out_path.exists()
