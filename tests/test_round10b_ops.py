"""Round-10 continuation tests: the privacy family (seeded-DP release,
k-anonymity audit), tokenizer-training statistics (BPE pair mining, vocab
coverage), and the streaming weighted-reservoir maintainer."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from universal_aws_data_pipeline_spark.operators.privacy import (
    dp_group_counts,
    k_anonymity_audit,
)
from universal_aws_data_pipeline_spark.operators.tokenizer import (
    bpe_pair_counts,
    vocab_coverage,
)


def _py_laplace(key: str, salt: str, scale: float) -> float:
    """Independent Python re-derivation of the md5 inverse-CDF noise."""
    v = int(hashlib.md5(f"dp:{salt}:{key}".encode()).hexdigest()[:8], 16)
    u = (v + 0.5) / float(1 << 32)
    d = u - 0.5
    return -scale * math.copysign(1.0, d) * math.log(1.0 - 2.0 * abs(d))


# --------------------------------------------------------------------------
# dp_group_counts
# --------------------------------------------------------------------------


def test_dp_counts_bounding_and_noise_match_hand_math(spark):
    # user 1 has 10 rows in group 'a' (capped to 2), user 2 has 1 row in
    # 'a' and 3 in 'b' (capped to 2): bounded counts a=3, b=2.
    rows = [("a", 1)] * 10 + [("a", 2)] + [("b", 2)] * 3
    df = spark.createDataFrame(rows, ["g", "u"])
    out = {
        r["g"]: r["noisy_count"]
        for r in dp_group_counts(
            df, ["g"], "u", epsilon=1.0, cap=2, salt="t", release_threshold=-1e9
        ).collect()
    }
    for g, bounded in [("a", 3), ("b", 2)]:
        expected = bounded + _py_laplace(g, "t", 2.0 / 1.0)
        assert abs(out[g] - expected) <= 5e-5, (g, out[g], expected)


def test_dp_counts_deterministic_per_salt_and_fresh_across_salts(spark):
    df = spark.createDataFrame([("a", i) for i in range(20)], ["g", "u"])
    one = dp_group_counts(df, ["g"], "u", 1.0, 1, "s1", -1e9).collect()[0]["noisy_count"]
    two = dp_group_counts(df, ["g"], "u", 1.0, 1, "s1", -1e9).collect()[0]["noisy_count"]
    other = dp_group_counts(df, ["g"], "u", 1.0, 1, "s2", -1e9).collect()[0]["noisy_count"]
    assert one == two  # same salt -> bit-identical release
    assert one != other  # fresh salt -> fresh draw


def test_dp_counts_threshold_suppresses_and_drops_raw_count(spark):
    df = spark.createDataFrame(
        [("big", i) for i in range(50)] + [("small", 0)], ["g", "u"]
    )
    out = dp_group_counts(df, ["g"], "u", 1.0, 1, "t", release_threshold=25.0)
    assert out.columns == ["g", "noisy_count"]  # raw count never released
    rows = out.collect()
    assert [r["g"] for r in rows] == ["big"]  # small (1 + noise) suppressed


def test_dp_counts_parameter_validation(spark):
    df = spark.createDataFrame([("a", 1)], ["g", "u"])
    with pytest.raises(ValueError, match="cap"):
        dp_group_counts(df, ["g"], "u", 1.0, 0, "t")
    with pytest.raises(ValueError, match="epsilon"):
        dp_group_counts(df, ["g"], "u", 0.0, 1, "t")


# --------------------------------------------------------------------------
# k_anonymity_audit
# --------------------------------------------------------------------------


def test_k_anonymity_bands_and_homogeneity(spark):
    # class (1,1): 6 rows, 2 sensitive values -> anonymous, diverse
    # class (2,2): 3 rows, 1 sensitive value  -> below_k, homogeneous
    # class (3,3): 1 row                      -> unique, homogeneous
    rows = (
        [(1, 1, "x")] * 4
        + [(1, 1, "y")] * 2
        + [(2, 2, "x")] * 3
        + [(3, 3, "y")]
    )
    df = spark.createDataFrame(rows, ["q1", "q2", "s"])
    out = {
        r["risk_band"]: r
        for r in k_anonymity_audit(df, ["q1", "q2"], "s", k=5).collect()
    }
    assert out["anonymous"]["n_classes"] == 1
    assert out["anonymous"]["n_rows"] == 6
    assert out["anonymous"]["homogeneous_classes"] == 0
    assert out["below_k"]["n_rows"] == 3
    assert out["below_k"]["homogeneous_classes"] == 1
    assert out["unique"]["n_classes"] == 1
    assert out["unique"]["min_size"] == 1 and out["unique"]["max_size"] == 1
    with pytest.raises(ValueError, match="k must be"):
        k_anonymity_audit(df, ["q1"], "s", k=1)


# --------------------------------------------------------------------------
# tokenizer statistics
# --------------------------------------------------------------------------


def test_bpe_pair_counts_weights_and_positions(spark):
    # 'ab' x2 + 'ba' x1 + 'aaa' x1; single-char word 'a' contributes none.
    df = spark.createDataFrame(
        [("ab ab ba aaa a",)], ["text"]
    )
    out = {r["pair"]: (r["pair_count"], r["n_words"]) for r in bpe_pair_counts(df).collect()}
    # 'aa' occurs at TWO positions inside 'aaa' (BPE counts positions)
    assert out["aa"] == (2, 1)
    assert out["ab"] == (2, 1)
    assert out["ba"] == (1, 1)
    assert set(out) == {"aa", "ab", "ba"}


def test_vocab_coverage_curve_and_clamp(spark):
    df = spark.createDataFrame([("a a a b b c",)], ["text"])
    out = {r["vocab_budget"]: r for r in vocab_coverage(df, [1, 2, 8]).collect()}
    assert out[1]["tokens_covered"] == 3 and out[1]["coverage"] == 0.5
    assert out[2]["tokens_covered"] == 5 and out[2]["coverage"] == 0.8333
    # budget beyond the vocabulary clamps to full coverage, row kept
    assert out[8]["tokens_covered"] == 6 and out[8]["coverage"] == 1.0
    assert out[8]["n_types"] == 3 and out[8]["total_tokens"] == 6
    with pytest.raises(ValueError, match="budgets"):
        vocab_coverage(df, [])
    with pytest.raises(ValueError, match="budgets"):
        vocab_coverage(df, [0, 4])


def test_vocab_coverage_tie_break_is_total_order(spark):
    # b and c tie at 2 occurrences: rank order must be (a, b, c) by
    # (count desc, word asc) on any engine/layout
    df = spark.createDataFrame([("a a a b b c c",)], ["text"])
    out = {r["vocab_budget"]: r["tokens_covered"] for r in vocab_coverage(df, [2]).collect()}
    assert out[2] == 5  # a(3) + b(2), never a(3) + c(2) ambiguity


# --------------------------------------------------------------------------
# weighted reservoir maintainer
# --------------------------------------------------------------------------


def test_weighted_reservoir_stream_fn_matches_batch_topk(spark, tmp_path):
    from universal_aws_data_pipeline_spark.operators.sampling import (
        weighted_reservoir_stream_fn,
        weighted_sample_topk,
    )

    b1 = spark.createDataFrame([(i, float(1 + i % 7)) for i in range(40)], ["doc_id", "w"])
    b2 = spark.createDataFrame([(i, float(1 + i % 7)) for i in range(40, 90)], ["doc_id", "w"])
    state = str(tmp_path / "res")
    fn = weighted_reservoir_stream_fn(state, "w", k=10, key_col="doc_id")
    fn(b1, 0)
    fn(b2, 1)
    got = sorted(
        r["doc_id"] for r in spark.read.parquet(f"{state}/sample").collect()
    )
    want = sorted(
        r["doc_id"] for r in weighted_sample_topk(b1.unionByName(b2), "w", 10, "doc_id").collect()
    )
    # merge-associativity: streaming top-k over batches == batch top-k over all
    assert got == want

    # replayed batch is a committed no-op
    fn(b2, 1)
    again = sorted(r["doc_id"] for r in spark.read.parquet(f"{state}/sample").collect())
    assert again == got


def test_weighted_reservoir_k_validation():
    from universal_aws_data_pipeline_spark.operators.sampling import (
        weighted_reservoir_stream_fn,
    )

    with pytest.raises(ValueError, match="k must be"):
        weighted_reservoir_stream_fn("/tmp/x", "w", k=0)


# --------------------------------------------------------------------------
# k_anonymize_ladder
# --------------------------------------------------------------------------


def test_k_anonymize_ladder_assigns_finest_satisfying_rung(spark):
    from universal_aws_data_pipeline_spark.operators.privacy import k_anonymize_ladder

    # (1,1) x5 -> rung 0; (2,1)/(2,2) x2 each -> rung 1 (a=2 has 4 rows);
    # (3,9) x1 -> rung 2 (the [] total rung, 10 rows >= 3)
    rows = [(1, 1)] * 5 + [(2, 1)] * 2 + [(2, 2)] * 2 + [(3, 9)]
    df = spark.createDataFrame(rows, ["a", "b"])
    out = k_anonymize_ladder(df, levels=[["a", "b"], ["a"], []], k=3)
    got = {(r["a"], r["b"], r["anon_level"]) for r in out.collect()}
    assert (1, 1, 0) in got
    assert (2, 1, 1) in got and (2, 2, 1) in got
    assert (3, 9, 2) in got
    assert out.filter(F.col("anon_level") == 3).count() == 0  # nothing suppressed

    with pytest.raises(ValueError, match="k must be"):
        k_anonymize_ladder(df, [["a"]], k=1)
    with pytest.raises(ValueError, match="levels"):
        k_anonymize_ladder(df, [], k=3)


def test_k_anonymize_ladder_suppresses_when_no_rung_reaches_k(spark):
    from universal_aws_data_pipeline_spark.operators.privacy import k_anonymize_ladder

    df = spark.createDataFrame([(1, 1), (2, 2)], ["a", "b"])
    out = k_anonymize_ladder(df, levels=[["a", "b"], ["a"]], k=3)
    # no [] rung in the ladder and every class is below k -> suppress level
    assert {r["anon_level"] for r in out.collect()} == {2}


# --------------------------------------------------------------------------
# dp_median_grid
# --------------------------------------------------------------------------


def _py_dp_median(values, epsilon, salt):
    """Independent Python recomputation of the exponential mechanism."""
    from collections import Counter

    hist = sorted(Counter(values).items())
    n = len(values)
    below = 0
    cells = []
    for v, c in hist:
        u = -abs(2 * below + c - n)
        cells.append((v, math.exp(epsilon / 2.0 * u)))
        below += c
    totw = sum(w for _, w in cells)
    hv = int(hashlib.md5(f"dpq:{salt}:median".encode()).hexdigest()[:8], 16)
    draw = (hv + 0.5) / float(1 << 32)
    cum = 0.0
    for v, w in cells:
        cum += w
        if cum >= draw * totw:
            return v
    return cells[-1][0]


def test_dp_median_grid_matches_python_mechanism(spark):
    from universal_aws_data_pipeline_spark.operators.privacy import dp_median_grid

    values = [100, 100, 200, 250, 250, 250, 300, 900, 900, 1500]
    df = spark.createDataFrame([(v,) for v in values], ["cents"])
    for eps, salt in [(0.2, "a"), (2.0, "a"), (0.2, "b"), (5.0, "zz")]:
        got = dp_median_grid(df, "cents", eps, salt).collect()
        assert len(got) == 1
        assert got[0]["dp_median_cents"] == _py_dp_median(values, eps, salt)
        assert got[0]["epsilon"] == eps
    with pytest.raises(ValueError, match="epsilon"):
        dp_median_grid(df, "cents", 0.0, "a")


def test_dp_median_grid_is_reproducible_and_grid_valued(spark):
    from universal_aws_data_pipeline_spark.operators.privacy import dp_median_grid

    df = spark.createDataFrame([(v,) for v in range(0, 500, 7)], ["cents"])
    one = dp_median_grid(df, "cents", 1.0, "s").collect()[0]["dp_median_cents"]
    two = dp_median_grid(df, "cents", 1.0, "s").collect()[0]["dp_median_cents"]
    assert one == two  # same salt -> same release
    assert one % 7 == 0 and 0 <= one < 500  # always an actual grid value


# --------------------------------------------------------------------------
# bpe_learn_merges
# --------------------------------------------------------------------------


def test_bpe_learn_merges_hand_computed_rounds(spark):
    from universal_aws_data_pipeline_spark.operators.tokenizer import bpe_learn_merges

    # vocab: abab x2, cd x3. Round 1: 'a b' wins (2 positions x weight 2 = 4);
    # round 2: 'c d' (3); round 3: 'ab ab' (2). Symbol inventory shrinks
    # 4 -> {ab,c,d} -> {ab,cd} -> {abab,cd}.
    df = spark.createDataFrame([("abab abab cd cd cd",)], ["text"])
    got = [tuple(r) for r in bpe_learn_merges(df, rounds=3).collect()]
    assert got == [(1, "a b", 4, 3), (2, "c d", 3, 2), (3, "ab ab", 2, 2)]


def test_bpe_learn_merges_stops_when_fully_fused(spark):
    from universal_aws_data_pipeline_spark.operators.tokenizer import bpe_learn_merges

    df = spark.createDataFrame([("a b a",)], ["text"])  # single-char words only
    assert bpe_learn_merges(df, rounds=4).count() == 0
    with pytest.raises(ValueError, match="rounds"):
        bpe_learn_merges(df, rounds=0)


# --------------------------------------------------------------------------
# dp_median_curve + t_closeness_audit
# --------------------------------------------------------------------------


def test_dp_median_curve_matches_python_per_candidate(spark):
    from universal_aws_data_pipeline_spark.operators.privacy import dp_median_curve

    values = [100, 100, 200, 250, 250, 250, 300, 900, 900, 1500]
    df = spark.createDataFrame([(v,) for v in values], ["cents"])
    eps = [0.05, 0.2, 1.0, 5.0]
    got = {r["epsilon"]: r for r in dp_median_curve(df, "cents", eps, "s").collect()}
    exact = 250  # lower median of the 10 values
    assert set(got) == set(eps)
    for i, e in enumerate(eps):
        # independent python recomputation with the index-keyed draw
        from collections import Counter

        hist = sorted(Counter(values).items())
        n = len(values)
        below, cells = 0, []
        for v, c in hist:
            cells.append((v, math.exp(e / 2.0 * (-abs(2 * below + c - n)))))
            below += c
        totw = sum(w for _, w in cells)
        hv = int(hashlib.md5(f"dpu:s:{i}".encode()).hexdigest()[:8], 16)
        draw = (hv + 0.5) / float(1 << 32)
        cum, pick = 0.0, cells[-1][0]
        for v, w in cells:
            cum += w
            if cum >= draw * totw:
                pick = v
                break
        assert got[e]["dp_median_cents"] == pick
        assert got[e]["err_cents"] == abs(pick - exact)
    with pytest.raises(ValueError, match="epsilons"):
        dp_median_curve(df, "cents", [], "s")
    with pytest.raises(ValueError, match="epsilons"):
        dp_median_curve(df, "cents", [0.5, -1.0], "s")


def test_t_closeness_bands_hand_math(spark):
    from universal_aws_data_pipeline_spark.operators.privacy import t_closeness_audit

    # global: x 8/12, y 4/12. class A (8 rows, 4x/4y): TVD = |.5-8/12| = 1/6
    # -> close. class B (4 rows, all x): TVD = 1 - 8/12 = 1/3 -> drifted.
    rows = [("A", "x")] * 4 + [("A", "y")] * 4 + [("B", "x")] * 4
    df = spark.createDataFrame(rows, ["q", "s"])
    out = {r["closeness_band"]: r for r in t_closeness_audit(df, ["q"], "s").collect()}
    assert out["close"]["n_classes"] == 1 and out["close"]["n_rows"] == 8
    assert out["close"]["max_tvd"] <= 0.2
    assert out["drifted"]["n_classes"] == 1 and out["drifted"]["n_rows"] == 4
    # B: p(x)=1 vs q(x)=8/12 -> TVD = 1 - 8/12 = 0.3333
    assert out["drifted"]["max_tvd"] == 0.3333
    with pytest.raises(ValueError, match="tight"):
        t_closeness_audit(df, ["q"], "s", tight=0.5, loose=0.2)


def test_dp_release_stream_fn_per_batch_and_replay_identical(spark, tmp_path):
    from universal_aws_data_pipeline_spark.operators.privacy import (
        dp_group_counts,
        dp_release_stream_fn,
    )

    out = str(tmp_path / "dp_releases")
    fn = dp_release_stream_fn(out, ["g"], "u", epsilon=1.0, cap=2, salt="s")
    b0 = spark.createDataFrame([("a", 1)] * 5 + [("b", 2)] * 3, ["g", "u"])
    b1 = spark.createDataFrame([("a", 3)] * 4, ["g", "u"])
    fn(b0, 0)
    fn(b1, 1)
    got = {
        (r["g"], r["batch_id"]): r["noisy_count"]
        for r in spark.read.parquet(out).collect()
    }
    # each batch's release equals the batch operator with the batch-salted key
    for bid, bdf in [(0, b0), (1, b1)]:
        want = dp_group_counts(bdf, ["g"], "u", 1.0, 2, f"s:b{bid}", 0.0)
        for r in want.collect():
            assert got[(r["g"], bid)] == r["noisy_count"]
    # replay appends byte-identical rows: the deduped multiset is unchanged
    n_before = spark.read.parquet(out).count()
    fn(b1, 1)
    after = spark.read.parquet(out)
    assert after.count() == n_before + 1  # at-least-once append
    assert after.distinct().count() == n_before  # dedup restores exactly


def test_dp_counts_null_group_key_raises(spark):
    """concat_ws SKIPS nulls, so (NULL,'x') and ('x',NULL) would share a
    noise draw — the release must refuse NULL keys loudly (self-review
    finding; the percentile NULL-group convention: enforced, not
    documented)."""
    df = spark.createDataFrame(
        [("a", "x", 1), (None, "x", 2)], ["g1", "g2", "u"]
    )
    with pytest.raises(Exception, match="NULL group key"):
        dp_group_counts(df, ["g1", "g2"], "u", 1.0, 1, "t", -1e9).collect()


def test_bpe_merge_contract_self_run_boundaries(spark):
    from universal_aws_data_pipeline_spark.operators.tokenizer import bpe_learn_merges

    # run of 4: exactly greedy (2 symbols of 'aa' inside the word)
    got4 = bpe_learn_merges(spark.createDataFrame([("aaaa",)], ["text"]), 1).collect()
    assert got4[0]["pair"] == "a a" and got4[0]["n_symbols"] == 1  # {'aa'} only
    # run of 6: the DOCUMENTED under-merge — 'aa a aa a' keeps the single
    # 'a' (2 distinct symbols), where textbook greedy would give {'aa'}
    got6 = bpe_learn_merges(spark.createDataFrame([("aaaaaa",)], ["text"]), 1).collect()
    assert got6[0]["pair"] == "a a" and got6[0]["n_symbols"] == 2
    # non-self pair, consecutive occurrences: exactly greedy by pass 2
    gotab = bpe_learn_merges(spark.createDataFrame([("ababab",)], ["text"]), 1).collect()
    assert gotab[0]["pair"] == "a b" and gotab[0]["n_symbols"] == 1  # {'ab'}


def test_bpe_corpus_stats_compression_hand_math(spark):
    from universal_aws_data_pipeline_spark.operators.tokenizer import bpe_learn_merges

    # vocab: 'abab' x2 (4 chars), 'cd' x3 (2 chars) -> baseline 2*4+3*2 = 14
    # round 1 merges 'a b' -> 'ab ab' (2 syms) & 'c d' (2): 2*2+3*2 = 10
    # round 2 merges 'c d' -> 'cd' (1): 2*2+3*1 = 7
    df = spark.createDataFrame([("abab abab cd cd cd",)], ["text"])
    got = [tuple(r) for r in bpe_learn_merges(df, 2, corpus_stats=True).collect()]
    assert got[0] == (1, "a b", 4, 3, 10, round(10 / 14, 4))
    assert got[1] == (2, "c d", 3, 2, 7, round(7 / 14, 4))
    # default mode keeps the original 4-column schema
    assert len(bpe_learn_merges(df, 1).columns) == 4


# --------------------------------------------------------------------------
# second self-review pass regressions
# --------------------------------------------------------------------------


def test_t_closeness_keeps_null_classes_and_categories(spark):
    """NULL quasi values and NULL sensitive cells are real classes /
    categories: equality joins would silently drop them (NULL != NULL)
    and the audit would understate leakage. Hand math: both classes have
    TVD exactly 0.25 -> 'drifted'."""
    from universal_aws_data_pipeline_spark.operators.privacy import t_closeness_audit

    rows = [("A", "x")] * 2 + [("A", None)] * 2 + [(None, "x")] * 4
    df = spark.createDataFrame(rows, "q string, s string")
    out = {r["closeness_band"]: r for r in t_closeness_audit(df, ["q"], "s").collect()}
    assert set(out) == {"drifted"}
    assert out["drifted"]["n_classes"] == 2  # NULL-quasi class counted
    assert out["drifted"]["n_rows"] == 8  # NULL sensitive cells counted
    assert out["drifted"]["max_tvd"] == 0.25


def test_dp_release_stream_fn_null_key_does_not_poison(spark, tmp_path):
    """A NULL group key must NOT wedge the stream (the batch raise would
    replay forever from the checkpoint): the maintainer coalesces NULLs
    to the explicit '(null)' category, which gets its own draw."""
    from universal_aws_data_pipeline_spark.operators.privacy import dp_release_stream_fn

    out = str(tmp_path / "rel")
    fn = dp_release_stream_fn(out, ["g"], "u", 1.0, 1, "s", release_threshold=-1e9)
    fn(spark.createDataFrame([("a", 1), (None, 2), (None, 3)], "g string, u long"), 0)
    got = {r["g"]: r["noisy_count"] for r in spark.read.parquet(out).collect()}
    assert set(got) == {"a", "(null)"}


def test_dp_counts_empty_group_cols_is_global_release(spark):
    """group_cols=[] is the degenerate global count release — the NULL
    guard must not break it (F.when(None, ...) regression)."""
    df = spark.createDataFrame([("u%d" % (i % 3),) for i in range(5)], ["u"])
    out = dp_group_counts(df, [], "u", 1.0, 1, "s", -1e9).collect()
    assert len(out) == 1
    expected = 3 + _py_laplace("", "s", 1.0)  # 3 users, cap 1, '' seed
    assert abs(out[0]["noisy_count"] - expected) <= 5e-5


def test_bpe_corpus_stats_empty_corpus_graceful(spark):
    from universal_aws_data_pipeline_spark.operators.tokenizer import bpe_learn_merges

    df = spark.createDataFrame([("   ",)], ["text"])
    out = bpe_learn_merges(df, 2, corpus_stats=True)
    assert out.count() == 0
    assert len(out.columns) == 6  # schema stable even when empty


# --------------------------------------------------------------------------
# dp_group_sums (the bounded-sum release)
# --------------------------------------------------------------------------


def _py_laplace_sum(key: str, salt: str, scale: float) -> float:
    v = int(hashlib.md5(f"dps:{salt}:{key}".encode()).hexdigest()[:8], 16)
    u = (v + 0.5) / float(1 << 32)
    d = u - 0.5
    return -scale * math.copysign(1.0, d) * math.log(1.0 - 2.0 * abs(d))


def test_dp_sums_clipping_and_noise_match_hand_math(spark):
    from universal_aws_data_pipeline_spark.operators.privacy import dp_group_sums

    # user 1 contributes 150 to 'a' (clips to 100); user 2 contributes 40
    # to 'a' and -30 to 'b' (negative clips to 0): bounded a=140, b=0.
    rows = [("a", 1, 150), ("a", 2, 40), ("b", 2, -30)]
    df = spark.createDataFrame(rows, "g string, u long, v long")
    out = {
        r["g"]: r["noisy_sum"]
        for r in dp_group_sums(df, ["g"], "u", "v", 1.0, 100, "t").collect()
    }
    for g, bounded in [("a", 140), ("b", 0)]:
        expected = bounded + _py_laplace_sum(g, "t", 100.0)
        assert abs(out[g] - expected) <= 5e-5, (g, out[g], expected)


def test_dp_sums_clip_invariance_and_validation(spark):
    from universal_aws_data_pipeline_spark.operators.privacy import dp_group_sums

    base = spark.createDataFrame([("a", 1, 100), ("a", 2, 100)], "g string, u long, v long")
    # inflating user 1's contribution far past the clip cannot move the release
    inflated = spark.createDataFrame(
        [("a", 1, 100_000), ("a", 2, 100)], "g string, u long, v long"
    )
    one = dp_group_sums(base, ["g"], "u", "v", 1.0, 50, "s").collect()[0]["noisy_sum"]
    two = dp_group_sums(inflated, ["g"], "u", "v", 1.0, 50, "s").collect()[0]["noisy_sum"]
    assert one == two
    with pytest.raises(ValueError, match="clip"):
        dp_group_sums(base, ["g"], "u", "v", 1.0, 0, "s")
    with pytest.raises(ValueError, match="epsilon"):
        dp_group_sums(base, ["g"], "u", "v", 0.0, 50, "s")
    with pytest.raises(Exception, match="NULL group key"):
        dp_group_sums(
            spark.createDataFrame([(None, 1, 5)], "g string, u long, v long"),
            ["g"], "u", "v", 1.0, 50, "s",
        ).collect()


# --------------------------------------------------------------------------
# round-11 ADVICE regressions
# --------------------------------------------------------------------------


def test_k_anonymity_null_sensitive_is_a_category(spark):
    """NULL sensitive values are observable categories (the t-closeness
    convention): a {value, NULL} class is DIVERSE (l_div 2), an all-NULL
    class is HOMOGENEOUS (l_div 1) — bare count_distinct got both wrong
    (round-10 ADVICE)."""
    rows = [(1, "x"), (1, None), (2, None), (2, None)]
    df = spark.createDataFrame(rows, ["q", "s"])
    out = {
        r["risk_band"]: r for r in k_anonymity_audit(df, ["q"], "s", k=2).collect()
    }
    # both classes have 2 rows -> anonymous band; only the all-NULL one is
    # homogeneous
    assert out["anonymous"]["n_classes"] == 2
    assert out["anonymous"]["homogeneous_classes"] == 1


def test_vocab_coverage_empty_corpus_emits_zero_rows_not_nothing(spark):
    df = spark.createDataFrame([], "text string")
    rows = {r["vocab_budget"]: r for r in vocab_coverage(df, [1, 8]).collect()}
    assert set(rows) == {1, 8}
    for r in rows.values():
        assert r["tokens_covered"] == 0
        assert r["coverage"] == 0.0
        assert r["n_types"] == 0
        assert r["total_tokens"] == 0


def test_weighted_reservoir_recurring_key_occupies_one_slot(spark, tmp_path):
    from universal_aws_data_pipeline_spark.operators.sampling import (
        weighted_reservoir_stream_fn,
    )

    # doc 0 has a huge weight and recurs in batch 1 (not a replay): the
    # merged sample must hold it ONCE, not in two of the k slots
    b1 = spark.createDataFrame([(i, 100.0 if i == 0 else 1.0) for i in range(10)], ["doc_id", "w"])
    b2 = spark.createDataFrame([(0, 100.0), (11, 1.0), (12, 1.0)], ["doc_id", "w"])
    state = str(tmp_path / "res")
    fn = weighted_reservoir_stream_fn(state, "w", k=5, key_col="doc_id")
    fn(b1, 0)
    fn(b2, 1)
    got = [r["doc_id"] for r in spark.read.parquet(f"{state}/sample").collect()]
    assert len(got) == 5
    assert len(set(got)) == 5  # no key occupies two slots
    assert got.count(0) == 1


def test_dp_median_totw_is_final_cumulative_weight(spark):
    """totw must be max over the ORDERED running sum (one accumulation
    order shared with cumw), and the release on a known grid is the value
    hand-math picks (round-10 ADVICE on float addition order)."""
    import hashlib as _h
    import math as _m

    from universal_aws_data_pipeline_spark.operators.privacy import dp_median_grid

    rows = [(v,) for v in [100] * 3 + [200] * 5 + [300] * 3]
    df = spark.createDataFrame(rows, "cents long")
    got = dp_median_grid(df, "cents", epsilon=2.0, salt="tw").collect()[0][
        "dp_median_cents"
    ]
    # hand walk: utilities u(100)=-abs(0+3-11)=-8, u(200)=-abs(6+5-11)=0,
    # u(300)=-abs(16+3-11)=-8; weights exp(eps/2*u) in grid order
    ws = [_m.exp(1.0 * u) for u in (-8, 0, -8)]
    cum, cums = 0.0, []
    for w in ws:
        cum += w
        cums.append(cum)
    tot = max(cums)
    v = int(_h.md5(b"dpq:tw:median").hexdigest()[:8], 16)
    u_draw = (v + 0.5) / float(1 << 32)
    want = [100, 200, 300][min(i for i, c in enumerate(cums) if c >= u_draw * tot)]
    assert got == want
