"""Round-12 additions.

- bench_compare's mechanical reference-shipping rule (VERDICT r11 item 1):
  jitter-cleared queries ship min(run, retry), nothing else changes, and a
  flagged series refuses to ship at all.
- host-load telemetry surfaces in the bench artifact (VERDICT r11 item 2).
- per-domain cap + unigram-LM operators are tested alongside their graded
  queries further down.
"""

from __future__ import annotations

import importlib.util
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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


def test_compare_returns_cleared_queries(bench_compare_mod, tmp_path):
    """A query over the bar in the run but not in the retry is reported as
    jitter-cleared — the input to the shipping rule."""
    ref_path = _write_ref(tmp_path, "ref.json", {"qa": 1.0, "qb": 1.0})
    cur = {"qa": 5.0, "qb": 1.02}
    retry = {"qa": 1.1, "qb": 1.0}
    flagged, cleared = bench_compare_mod.compare(cur, ref_path, retry)
    assert flagged is False
    assert cleared == {"qa"}


def test_build_reference_ships_min_for_cleared_only(bench_compare_mod):
    """The r11 failure mode, mechanically closed: q132-shaped values the
    gate dismissed as jitter ship min(run, retry); everything else ships
    the run value even when its retry happened to be faster."""
    cur = {"q132": 6.513, "q133": 7.145, "q75": 6.36}
    retry = {"q132": 1.737, "q133": 5.025, "q75": 5.90}
    ref = bench_compare_mod.build_reference(cur, retry, {"q132", "q133"})
    assert ref == {"q132": 1.737, "q133": 5.025, "q75": 6.36}


def test_build_reference_without_retry_is_identity(bench_compare_mod):
    cur = {"qa": 1.0, "qb": 2.0}
    assert bench_compare_mod.build_reference(cur, None, {"qa"}) == cur


def test_write_reference_end_to_end(bench_compare_mod, tmp_path, monkeypatch, capsys):
    """main() with --retry --write-reference writes the rule's output and
    records which queries were jitter-cleared; a run-1-only hiccup must
    not ship its polluted value."""
    ref_path = _write_ref(tmp_path, "r0_ref.json", {"qa": 1.0, "qb": 1.0})
    detail = {
        "queries": {"qa": 4.0, "qb": 1.01},
        "sessions": {"qa": 0, "qb": 0},
        "session_size": 50,
        "load": {"0": [0.1, 8.2, 6.0]},
    }
    detail_path = tmp_path / "detail.json"
    detail_path.write_text(json.dumps(detail))
    retry_path = tmp_path / "retry.json"
    retry_path.write_text(json.dumps({"queries": {"qa": 1.05, "qb": 1.0}}))
    out_path = tmp_path / "shipped.json"
    monkeypatch.setattr(
        "sys.argv",
        ["bench_compare.py", "--no-count-gate", "--retry", str(retry_path),
         "--write-reference", str(out_path), str(detail_path), ref_path],
    )
    assert bench_compare_mod.main() == 0
    out = capsys.readouterr().out
    assert "loadavg" in out  # telemetry surfaces in the gate output
    shipped = json.loads(out_path.read_text())
    assert shipped["warm"] == {"qa": 1.05, "qb": 1.01}
    assert shipped["jitter_cleared"] == ["qa"]


# --------------------------------------------------------------------------
# cap_per_domain: the C4/RefinedWeb per-source ceiling (VERDICT r11 item 5)
# --------------------------------------------------------------------------


def _cap_fixture(spark):
    from pyspark.sql import functions as F  # noqa: F401

    rows = [
        # domain a: quality-ordered d1(0.9,100) d2(0.8,150) d3(0.7,200) d4(0.6,50)
        ("a", 1, 0.9, 100),
        ("a", 2, 0.8, 150),
        ("a", 3, 0.7, 200),
        ("a", 4, 0.6, 50),
        # domain b: two docs, tiny
        ("b", 5, 0.5, 10),
        ("b", 6, 0.5, 20),  # quality tie -> doc_id 5 ranks first
    ]
    return spark.createDataFrame(
        rows, "source string, doc_id long, quality double, n_tokens long"
    )


def test_cap_per_domain_doc_cap(spark):
    from pyspark.sql import functions as F

    from universal_aws_data_pipeline_spark.operators.sampling import cap_per_domain

    kept = cap_per_domain(
        _cap_fixture(spark), "source", doc_cap=2,
        order_by=[F.col("quality").desc()],
    )
    got = {(r.source, r.doc_id, r.domain_rank) for r in kept.collect()}
    assert got == {("a", 1, 1), ("a", 2, 2), ("b", 5, 1), ("b", 6, 2)}


def test_cap_per_domain_token_cap_running_total(spark):
    """A doc is kept iff the running token total THROUGH it stays within
    the cap: domain a keeps d1(100)+d2(150)=250, d3 would reach 450 > 300
    and is cut — and the later, smaller d4 does NOT sneak in (rank order
    is the contract, not best-fit packing)."""
    from pyspark.sql import functions as F

    from universal_aws_data_pipeline_spark.operators.sampling import cap_per_domain

    kept = cap_per_domain(
        _cap_fixture(spark), "source", token_cap=300,
        order_by=[F.col("quality").desc()], token_col="n_tokens",
    )
    got = {(r.source, r.doc_id, r.cum_tokens) for r in kept.collect()}
    assert got == {("a", 1, 100), ("a", 2, 250), ("b", 5, 10), ("b", 6, 30)}


def test_cap_per_domain_both_caps_and_validation(spark):
    from pyspark.sql import functions as F

    from universal_aws_data_pipeline_spark.operators.sampling import cap_per_domain

    kept = cap_per_domain(
        _cap_fixture(spark), "source", doc_cap=1, token_cap=300,
        order_by=[F.col("quality").desc()], token_col="n_tokens",
    )
    assert {(r.source, r.doc_id) for r in kept.collect()} == {("a", 1), ("b", 5)}
    with pytest.raises(ValueError, match="at least one"):
        cap_per_domain(_cap_fixture(spark), "source")
    with pytest.raises(ValueError, match="token_col"):
        cap_per_domain(_cap_fixture(spark), "source", token_cap=10)
    with pytest.raises(ValueError, match=">= 1"):
        cap_per_domain(_cap_fixture(spark), "source", doc_cap=0)


def test_cap_per_domain_default_order_is_hash_rank(spark):
    """No quality signal -> the q91 device: smallest (md5-bucket, id) per
    domain, a deterministic uniform sample."""
    from universal_aws_data_pipeline_spark.operators.sampling import (
        cap_per_domain,
        hash_bucket,
    )
    from pyspark.sql import functions as F

    df = _cap_fixture(spark)
    kept = cap_per_domain(df, "source", doc_cap=1)
    buckets = {
        r.doc_id: r.b
        for r in df.select("doc_id", hash_bucket(F.col("doc_id")).alias("b")).collect()
    }
    want_a = min((buckets[i], i) for i in (1, 2, 3, 4))[1]
    want_b = min((buckets[i], i) for i in (5, 6))[1]
    assert {(r.source, r.doc_id) for r in kept.collect()} == {("a", want_a), ("b", want_b)}


def test_q228_plan_has_window_group_limit(spark):
    """The rank filter must take the WindowGroupLimit shape so map
    partitions pre-prune to their local top-k before the exchange —
    the 100 TB posture the q91 adjudication established."""
    from universal_aws_data_pipeline_spark.plans.catalog import QUERIES

    df = QUERIES["q228_domain_cap"].fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_write_reference_refuses_flagged_series(bench_compare_mod, tmp_path, monkeypatch):
    """A regression that reproduces in the retry must block the ship."""
    ref_path = _write_ref(tmp_path, "r0_ref.json", {"qa": 1.0})
    detail_path = tmp_path / "detail.json"
    detail_path.write_text(json.dumps({"queries": {"qa": 4.0}}))
    retry_path = tmp_path / "retry.json"
    retry_path.write_text(json.dumps({"queries": {"qa": 3.9}}))
    out_path = tmp_path / "shipped.json"
    monkeypatch.setattr(
        "sys.argv",
        ["bench_compare.py", "--no-count-gate", "--retry", str(retry_path),
         "--write-reference", str(out_path), str(detail_path), ref_path],
    )
    assert bench_compare_mod.main() == 1
    assert not out_path.exists()


# --------------------------------------------------------------------------
# unigram-LM tokenizer (VERDICT r11 item 3): exact-DP contract tests —
# the catalog oracle mirror grades q229/q230 end-to-end; these pin the
# operator-level invariants the oracle replay relies on.
# --------------------------------------------------------------------------


def _ref_viterbi(w: str, costs: dict, max_piece: int = 3):
    """Reference DP with the engine's exact contract: BIGINT min-plus,
    tie key = cost*4 + (3 - piece_len) (longer final piece wins ties)."""
    big = 10**12
    best = {0: (0, "")}
    for i in range(1, len(w) + 1):
        cands = []
        for j in range(1, min(max_piece, i) + 1):
            piece = w[i - j:i]
            b = best[i - j][0] + costs.get(piece, big)
            cands.append((b * 4 + (3 - j), b, best[i - j][1] + " " + piece))
        k, b, s = min(cands)
        best[i] = (b, s)
    return best[len(w)][0], best[len(w)][1].strip()


def test_unigram_viterbi_matches_bruteforce(spark):
    """Randomized words + randomized piece costs: the fold must reproduce
    the reference DP exactly — total cost AND segmentation (tie rule
    included)."""
    import random

    from universal_aws_data_pipeline_spark.operators.tokenizer import (
        unigram_viterbi_segment,
    )

    random.seed(12)
    alphabet = "abc"  # small alphabet -> dense pieces, frequent ties
    words = sorted(
        {"".join(random.choice(alphabet) for _ in range(random.randint(1, 12)))
         for _ in range(60)}
    )
    pieces = sorted({w[i:i + L] for w in words for L in (1, 2, 3)
                     for i in range(len(w) - L + 1)})
    # costs: random micro-nat-ish ints; drop ~30% of multi-char pieces to
    # exercise the "unavailable transition" branch
    costs = {}
    for p in pieces:
        if len(p) > 1 and random.random() < 0.3:
            continue
        costs[p] = random.randint(10**5, 5 * 10**6)
    vocab = spark.createDataFrame([(w, 1) for w in words], "w string, c long")
    model = spark.createDataFrame(
        [(p, c) for p, c in costs.items()], "piece string, cost long"
    )
    got = {
        r.w: (r.cost, r.seg)
        for r in unigram_viterbi_segment(vocab, model).collect()
    }
    assert set(got) == set(words)
    for w in words:
        assert got[w] == _ref_viterbi(w, costs), w


def test_unigram_segmentation_preserves_characters(spark):
    """Deleting spaces from any segmentation recovers the word — the
    invariant the q230 oracle's word-recovery join relies on."""
    from pyspark.sql import functions as F

    from universal_aws_data_pipeline_spark.operators.tokenizer import (
        _uni_vocab,
        unigram_train,
        unigram_viterbi_segment,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    model = unigram_train(df, rounds=2, keep_multi=8)
    seg = unigram_viterbi_segment(_uni_vocab(df), model)
    bad = seg.filter(F.regexp_replace("seg", " ", "") != F.col("w")).count()
    assert bad == 0


def test_unigram_single_chars_never_pruned(spark):
    """The final model must contain EVERY character of the (length-
    filtered) vocabulary — the coverage rule that keeps all words
    segmentable — even with an aggressive multi-piece budget."""
    from pyspark.sql import functions as F

    from universal_aws_data_pipeline_spark.operators.tokenizer import (
        _uni_vocab,
        unigram_train,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    model = unigram_train(df, rounds=1, keep_multi=1)
    chars_in_model = {
        r.piece for r in model.filter(F.length("piece") == 1).collect()
    }
    vocab_chars = {
        ch for r in _uni_vocab(df).select("w").collect() for ch in r.w
    }
    assert vocab_chars <= chars_in_model
    assert model.filter(F.length("piece") >= 2).count() == 1  # prune binds


def test_unigram_train_validation_and_word_cap(spark):
    from universal_aws_data_pipeline_spark.operators.tokenizer import (
        _UNI_MAX_WORD,
        _uni_vocab,
        unigram_train,
    )

    df = spark.createDataFrame(
        [("short words only",), ("a" * (_UNI_MAX_WORD + 1) + " ok",)],
        "text string",
    )
    vocab_words = {r.w for r in _uni_vocab(df).collect()}
    assert "a" * (_UNI_MAX_WORD + 1) not in vocab_words
    assert "ok" in vocab_words
    with pytest.raises(ValueError, match="rounds"):
        unigram_train(df, rounds=0, keep_multi=4)
    with pytest.raises(ValueError, match="keep_multi"):
        unigram_train(df, rounds=1, keep_multi=0)


def test_unigram_smoothing_keeps_unused_chars(spark):
    """A char that appears in NO Viterbi segmentation (always swallowed by
    a multi-char piece) must survive the M-step with count 1 — drop it
    and a later prune could strand words unsegmentable."""
    from pyspark.sql import functions as F

    from universal_aws_data_pipeline_spark.operators.tokenizer import unigram_train

    # corpus = one word "ab" repeated: seed heavily favors piece "ab", so
    # round-1 segmentation is ["ab"] and chars a/b are never USED
    df = spark.createDataFrame([("ab ab ab",)], "text string")
    model = unigram_train(df, rounds=1, keep_multi=4)
    rows = {r.piece: r.cnt for r in model.collect()}
    assert rows["a"] == 1 and rows["b"] == 1  # smoothing floor
    assert rows["ab"] == 3  # one use per corpus occurrence


def test_hot_start_warns_before_ship(bench_compare_mod, tmp_path, monkeypatch, capsys):
    """A series whose FIRST session began under external load must say so
    next to the gate output (the r11 pollution signature, now
    self-evident from the artifact)."""
    ref_path = _write_ref(tmp_path, "r0_ref.json", {"qa": 1.0})
    detail_path = tmp_path / "detail.json"
    detail_path.write_text(json.dumps({
        "queries": {"qa": 1.0},
        "sessions": {"qa": 0},
        "load": {"0": [9.3, 30.1, 22.0]},
    }))
    monkeypatch.setattr(
        "sys.argv",
        ["bench_compare.py", "--no-count-gate", str(detail_path), ref_path],
    )
    assert bench_compare_mod.main() == 0
    out = capsys.readouterr().out
    assert "WARNING: series started under external load" in out


# --------------------------------------------------------------------------
# domain_cap_stream_fn (STR8): streaming per-domain admission quota — the
# governance family's streaming twin
# --------------------------------------------------------------------------


def test_domain_cap_stream_fn_quota_and_replay(spark, tmp_path):
    from pyspark.sql import functions as F  # noqa: F401

    from universal_aws_data_pipeline_spark.operators.sampling import (
        domain_cap_stream_fn,
    )

    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    fn = domain_cap_stream_fn(state, out, "source", doc_cap=3,
                              quality_col="q", id_col="doc_id")
    # batch 0: domain a offers 4 (cap 3 -> best 3 admitted); b offers 1
    b0 = spark.createDataFrame(
        [("a", 1, 0.9), ("a", 2, 0.5), ("a", 3, 0.8), ("a", 4, 0.7), ("b", 5, 0.1)],
        "source string, doc_id long, q double",
    )
    fn(b0, 0)
    got0 = {(r.source, r.doc_id, r.admit_rank) for r in spark.read.parquet(out).collect()}
    assert got0 == {("a", 1, 1), ("a", 3, 2), ("a", 4, 3), ("b", 5, 1)}
    # batch 1: a's quota is burned -> even a perfect doc is rejected;
    # b admits 2 more (remaining = 2)
    b1 = spark.createDataFrame(
        [("a", 6, 1.0), ("b", 7, 0.3), ("b", 8, 0.2), ("b", 9, 0.9)],
        "source string, doc_id long, q double",
    )
    fn(b1, 1)
    rows = spark.read.parquet(out).collect()
    admitted = {(r.source, r.doc_id) for r in rows}
    assert ("a", 6) not in admitted
    assert {("b", 9), ("b", 7)} <= admitted and ("b", 8) not in admitted
    assert len(rows) == 6
    # replayed batch id: skipped outright — no new rows, state unchanged
    fn(b1, 1)
    assert spark.read.parquet(out).count() == 6
    st = {r.source: r.n_admitted for r in spark.read.parquet(f"{state}/admitted").collect()}
    assert st == {"a": 3, "b": 3}


def test_domain_cap_stream_fn_default_hash_order_and_validation(spark, tmp_path):
    """Without a quality column the q91 hash device ranks — deterministic
    across reruns; doc_cap must validate."""
    from pyspark.sql import functions as F

    from universal_aws_data_pipeline_spark.operators.sampling import (
        domain_cap_stream_fn,
        hash_bucket,
    )

    with pytest.raises(ValueError, match=">= 1"):
        domain_cap_stream_fn("s", "o", "source", doc_cap=0)
    state = str(tmp_path / "state2")
    out = str(tmp_path / "out2")
    fn = domain_cap_stream_fn(state, out, "source", doc_cap=1, id_col="doc_id")
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3)], "source string, doc_id long"
    )
    fn(df, 0)
    buckets = {
        r.doc_id: r.b
        for r in df.select("doc_id", hash_bucket(F.col("doc_id")).alias("b")).collect()
    }
    want = min((buckets[i], i) for i in (1, 2, 3))[1]
    assert [r.doc_id for r in spark.read.parquet(out).collect()] == [want]


def test_unigram_em_curve_shape_and_degradation(spark):
    """Two rows for two rounds; on the fixture corpus the E-step objective
    improves round over round (deterministic for THIS corpus — not a
    general EM guarantee under the +1 smoothing); an empty corpus
    degrades to zero rows-per-round, not an empty frame."""
    from universal_aws_data_pipeline_spark.operators.tokenizer import (
        unigram_em_curve,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = {r.round: r for r in unigram_em_curve(df, rounds=2).collect()}
    assert set(rows) == {1, 2}
    assert rows[2].corpus_cost_micro < rows[1].corpus_cost_micro
    assert rows[1].n_pieces > 0 and rows[1].corpus_symbols > 0
    with pytest.raises(ValueError, match="rounds"):
        unigram_em_curve(df, rounds=0)
    empty = spark.createDataFrame([], "text string")
    erows = {r.round: r for r in unigram_em_curve(empty, rounds=2).collect()}
    assert set(erows) == {1, 2}
    assert all(
        (r.corpus_cost_micro, r.corpus_symbols, r.n_pieces) == (0, 0, 0)
        for r in erows.values()
    )


def test_domain_cap_stream_fn_precommit_crash_replay_is_byte_identical(spark, tmp_path):
    """The documented crash window: admitted rows appended, crash BEFORE
    the state commit. The replay then runs against the UNCHANGED state
    and must append byte-identical rows — dedup on (doc_id, batch_id)
    recovers the exact admitted set (the determinism contract the
    append-before-commit ordering relies on)."""
    import shutil

    from universal_aws_data_pipeline_spark.operators.sampling import (
        domain_cap_stream_fn,
    )

    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    fn = domain_cap_stream_fn(state, out, "source", doc_cap=2,
                              quality_col="q", id_col="doc_id")
    batch = spark.createDataFrame(
        [("a", 1, 0.9), ("a", 2, 0.5), ("a", 3, 0.8)],
        "source string, doc_id long, q double",
    )
    fn(batch, 0)
    first = sorted(map(tuple, spark.read.parquet(out).collect()))
    # simulate the pre-commit crash: the append survived, the state fold
    # did not — wipe the committed state so batch 0 reads as un-folded
    shutil.rmtree(state)
    fn(batch, 0)  # replay against the unchanged (empty) state
    rows = [tuple(r) for r in spark.read.parquet(out).collect()]
    assert len(rows) == 2 * len(first)
    # every appended row appears exactly twice, byte-identical
    from collections import Counter

    assert all(n == 2 for n in Counter(rows).values())
    # downstream dedup on (doc_id, batch_id) recovers the exact set
    dedup = sorted(set(rows))
    assert dedup == first


def test_write_reference_new_queries_ship_min(bench_compare_mod, tmp_path, monkeypatch):
    """A query in NO reference can neither flag nor clear — it ships
    min(run, retry) so a first-round hiccup can't loosen next round's
    gate (round-12 review finding)."""
    ref_path = _write_ref(tmp_path, "r0_ref.json", {"qa": 1.0})
    detail_path = tmp_path / "detail.json"
    detail_path.write_text(json.dumps({
        "queries": {"qa": 1.0, "qnew": 5.0},
        "load": {"0": [0.2, 6.0, 4.0]},
    }))
    retry_path = tmp_path / "retry.json"
    retry_path.write_text(json.dumps({"queries": {"qa": 1.0, "qnew": 1.2}}))
    out_path = tmp_path / "shipped.json"
    monkeypatch.setattr(
        "sys.argv",
        ["bench_compare.py", "--no-count-gate", "--retry", str(retry_path),
         "--write-reference", str(out_path), str(detail_path), ref_path],
    )
    assert bench_compare_mod.main() == 0
    shipped = json.loads(out_path.read_text())
    assert shipped["warm"] == {"qa": 1.0, "qnew": 1.2}
    assert shipped["new_min"] == ["qnew"]


def test_domain_cap_stream_fn_null_domain_quota(spark, tmp_path):
    """NULL domains are a real category with a real lifetime quota: the
    state lookup is null-safe, so batch 2 must NOT hand the unlabeled
    slice a fresh cap (round-12 review finding)."""
    from universal_aws_data_pipeline_spark.operators.sampling import (
        domain_cap_stream_fn,
    )

    state = str(tmp_path / "state")
    out = str(tmp_path / "out")
    fn = domain_cap_stream_fn(state, out, "source", doc_cap=2,
                              quality_col="q", id_col="doc_id")
    b0 = spark.createDataFrame(
        [(None, 1, 0.9), (None, 2, 0.8), (None, 3, 0.7), ("a", 4, 0.5)],
        "source string, doc_id long, q double",
    )
    fn(b0, 0)
    assert spark.read.parquet(out).count() == 3  # 2 NULL-domain + 1 'a'
    b1 = spark.createDataFrame(
        [(None, 5, 1.0), (None, 6, 0.9), ("a", 7, 0.4)],
        "source string, doc_id long, q double",
    )
    fn(b1, 1)
    rows = spark.read.parquet(out).collect()
    null_admits = [r.doc_id for r in rows if r.source is None]
    assert sorted(null_admits) == [1, 2]  # quota burned in batch 0, stays burned
    assert {r.doc_id for r in rows if r.source == "a"} == {4, 7}


def test_cap_per_domain_output_column_collision_raises(spark):
    from pyspark.sql import functions as F

    from universal_aws_data_pipeline_spark.operators.sampling import cap_per_domain

    df = _cap_fixture(spark).withColumn("domain_rank", F.lit(1))
    with pytest.raises(ValueError, match="domain_rank"):
        cap_per_domain(df, "source", doc_cap=1)
    df2 = _cap_fixture(spark).withColumn("cum_tokens", F.lit(7))
    with pytest.raises(ValueError, match="cum_tokens"):
        cap_per_domain(df2, "source", token_cap=100, token_col="n_tokens")
    # doc-cap-only: a pre-existing cum_tokens is NOT the operator's output
    # and must survive untouched
    kept = cap_per_domain(df2, "source", doc_cap=1)
    assert "cum_tokens" in kept.columns
    assert all(r.cum_tokens == 7 for r in kept.collect())


def test_domain_cap_post_transform_preserves_user_cum_tokens(spark):
    """Doc-cap-only config step: the op never creates cum_tokens, so a
    user's same-named data column must pass through (round-12 review)."""
    from pyspark.sql import functions as F

    from universal_aws_data_pipeline_spark.operators.post import apply_post_transforms

    df = _cap_fixture(spark).withColumn("cum_tokens", F.lit(42))
    out = apply_post_transforms(
        df, [{"op": "domain_cap", "domain": "source", "doc_cap": 1,
              "quality": "quality", "id": "doc_id"}],
    )
    assert "cum_tokens" in out.columns and "domain_rank" not in out.columns
    assert all(r.cum_tokens == 42 for r in out.collect())


def test_write_reference_refuses_incomplete_retry(bench_compare_mod, tmp_path, monkeypatch):
    """A query that errored out of the RETRY series leaves min(run, retry)
    unverifiable — the pair is broken and must not ship (round-12 review,
    second pass)."""
    ref_path = _write_ref(tmp_path, "r0_ref.json", {"qa": 1.0})
    detail_path = tmp_path / "detail.json"
    detail_path.write_text(json.dumps({
        "queries": {"qa": 1.0, "qnew": 5.0},
        "load": {"0": [0.2, 6.0, 4.0]},
    }))
    retry_path = tmp_path / "retry.json"
    retry_path.write_text(json.dumps({"queries": {"qa": 1.0}}))  # qnew errored
    out_path = tmp_path / "shipped.json"
    monkeypatch.setattr(
        "sys.argv",
        ["bench_compare.py", "--no-count-gate", "--retry", str(retry_path),
         "--write-reference", str(out_path), str(detail_path), ref_path],
    )
    assert bench_compare_mod.main() == 1
    assert not out_path.exists()
