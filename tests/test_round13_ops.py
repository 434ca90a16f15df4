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
