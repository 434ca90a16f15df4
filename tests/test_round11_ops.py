"""Round-11 tests: the ε-budget composition ledger (seed-collision guard,
per-unit composition), the shared NULL-group pre-coalesce, and the BPE
apply-merges operator (train/apply segmentation agreement)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from universal_aws_data_pipeline_spark.operators.privacy import (
    DpRelease,
    coalesce_group_keys,
    epsilon_ledger,
)
from universal_aws_data_pipeline_spark.operators.tokenizer import (
    apply_merges,
    bpe_learn_merges,
)


# --------------------------------------------------------------------------
# epsilon_ledger
# --------------------------------------------------------------------------


def _rel(name="r1", mech="count", unit="t/user", eps=1.0, sens=2.0, prefix="dp:a:"):
    return DpRelease(name, mech, unit, eps, sens, prefix)


def test_epsilon_ledger_composes_per_unit(spark):
    out = {
        r["release"]: r
        for r in epsilon_ledger(
            spark,
            [
                _rel("counts", "count", "t/user", 1.0, 4.0, "dp:x:"),
                _rel("sums", "sum", "t/user", 0.5, 500.0, "dps:x:"),
                _rel("median", "median", "t/row", 0.2, 1.0, "dpq:x:"),
            ],
        ).collect()
    }
    # basic sequential composition adds per unit, not globally
    assert out["counts"]["eps_unit_total"] == 1.5
    assert out["sums"]["eps_unit_total"] == 1.5
    assert out["median"]["eps_unit_total"] == 0.2
    assert out["sums"]["sensitivity"] == 500.0


def test_epsilon_ledger_rejects_seed_namespace_collision(spark):
    # exact duplicate: two releases drawing from one namespace would share
    # noise — differencing their outputs cancels it (the deterministic
    # device makes this a genuine leak, hence a machine guard)
    with pytest.raises(ValueError, match="seed-namespace collision"):
        epsilon_ledger(
            spark,
            [_rel("a", prefix="dp:x:"), _rel("b", mech="sum", prefix="dp:x:")],
        )
    # proper string prefix: composed keys can alias across the namespaces
    with pytest.raises(ValueError, match="seed-namespace collision"):
        epsilon_ledger(
            spark,
            [_rel("a", prefix="dp:x:"), _rel("b", mech="sum", prefix="dp:x:b")],
        )


def test_epsilon_ledger_validation(spark):
    with pytest.raises(ValueError, match="at least one"):
        epsilon_ledger(spark, [])
    with pytest.raises(ValueError, match="duplicate release names"):
        epsilon_ledger(spark, [_rel("a"), _rel("a", prefix="dps:y:")])
    with pytest.raises(ValueError, match="unknown mechanism"):
        epsilon_ledger(spark, [_rel(mech="gauss")])
    with pytest.raises(ValueError, match="epsilon must be"):
        epsilon_ledger(spark, [_rel(eps=0.0)])
    with pytest.raises(ValueError, match="sensitivity must be"):
        epsilon_ledger(spark, [_rel(sens=-1.0)])


# --------------------------------------------------------------------------
# coalesce_group_keys
# --------------------------------------------------------------------------


def test_coalesce_group_keys_null_becomes_category(spark):
    df = spark.createDataFrame([("a", 1), (None, 2), (None, 3)], ["g", "u"])
    out = coalesce_group_keys(df, ["g"])
    vals = sorted(r["g"] for r in out.select("g").distinct().collect())
    assert vals == ["(null)", "a"]
    assert dict(out.dtypes)["g"] == "string"


def test_coalesce_group_keys_casts_nonstring_keys(spark):
    df = spark.createDataFrame([(7, 1), (None, 2)], "g int, u int")
    out = coalesce_group_keys(df, ["g"])
    assert sorted(r["g"] for r in out.select("g").distinct().collect()) == [
        "(null)",
        "7",
    ]


# --------------------------------------------------------------------------
# apply_merges
# --------------------------------------------------------------------------


def test_apply_merges_validates_pair_format(spark):
    df = spark.createDataFrame([("ab",)], ["text"])
    for bad in ["ab", "a b c", " b", "a "]:
        with pytest.raises(ValueError, match="symbol pairs"):
            apply_merges(df, [bad])


def test_apply_merges_segmentation_preserves_characters(spark):
    df = spark.createDataFrame(
        [("the cat sat on the mat",), ("the thin cat",)], ["text"]
    )
    out = apply_merges(df, ["t h", "th e"]).collect()
    assert out  # vocabulary is non-empty
    for r in out:
        # removing segmentation spaces reconstructs the word exactly
        assert r["seg"].replace(" ", "") == r["w"]
    segs = {r["w"]: r["seg"] for r in out}
    assert segs["the"] == "the"  # t+h merged, then th+e
    assert segs["thin"] == "th i n"  # first merge applies, second doesn't


def test_apply_merges_agrees_with_training_segmentation(spark):
    """Applying the learned merge list reproduces the training loop's final
    symbol inventory — the train/apply shared-contract guarantee."""
    df = spark.createDataFrame(
        [("banana bandana",), ("an analog banana",), ("a banal canal",)],
        ["text"],
    )
    learned = bpe_learn_merges(df, rounds=3).collect()
    merges = [r["pair"] for r in sorted(learned, key=lambda r: r["round"])]
    seg_tbl = apply_merges(df, merges)
    n_symbols = (
        seg_tbl.select(F.explode(F.split("seg", " ")).alias("s"))
        .distinct()
        .count()
    )
    assert n_symbols == learned[-1]["n_symbols"]


def test_apply_merges_empty_merge_list_is_character_baseline(spark):
    df = spark.createDataFrame([("ab ba",)], ["text"])
    segs = {r["w"]: r["seg"] for r in apply_merges(df, []).collect()}
    assert segs == {"ab": "a b", "ba": "b a"}


# --------------------------------------------------------------------------
# round-11 review regressions
# --------------------------------------------------------------------------


def test_q226_oracle_matches_engine_when_training_exhausts(spark, tmp_path, monkeypatch):
    """When greedy training runs out of merges before the fixed round
    count (every word fused), the oracle's seg chain must CARRY the last
    segmentation forward (LEFT JOIN ON TRUE), not collapse to zero rows —
    the engine's apply_merges output stays non-empty."""
    import duckdb

    from universal_aws_data_pipeline_spark.plans.catalog import QUERIES
    from universal_aws_data_pipeline_spark.plans.catalog_q224_q227 import (
        _Q226_ORACLE,
    )

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path / "idx"))
    sdir = str(tmp_path)
    spark.createDataFrame([("ab",), ("ab",)], ["text"]).write.parquet(
        f"{sdir}/documents.parquet"
    )
    s_rows = sorted(
        tuple(r) for r in QUERIES["q226_bpe_apply_merges"].fn(spark, sdir).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sdir}/documents.parquet/*.parquet')"
    )
    d_rows = sorted(tuple(r) for r in con.execute(_Q226_ORACLE).fetchall())
    assert s_rows == [("ab", 2, 1)]  # one fused symbol, non-empty
    assert d_rows == s_rows


def test_weighted_reservoir_first_batch_dedups_within_batch(spark, tmp_path):
    """A key duplicated WITHIN batch 0 must hold one slot, same as a key
    recurring across batches — the one-slot invariant applies on every
    commit path, not just the state merge."""
    from universal_aws_data_pipeline_spark.operators.sampling import (
        weighted_reservoir_stream_fn,
    )

    b0 = spark.createDataFrame(
        [(0, 100.0), (0, 100.0)] + [(i, 1.0) for i in range(1, 8)],
        ["doc_id", "w"],
    )
    state = str(tmp_path / "res")
    fn = weighted_reservoir_stream_fn(state, "w", k=5, key_col="doc_id")
    fn(b0, 0)
    got = [r["doc_id"] for r in spark.read.parquet(f"{state}/sample").collect()]
    assert len(got) == 5 and len(set(got)) == 5
    assert got.count(0) == 1


# --------------------------------------------------------------------------
# token_cost_stream_fn
# --------------------------------------------------------------------------


def test_token_cost_stream_fn_matches_batch_math_and_replays_identically(
    spark, tmp_path
):
    from universal_aws_data_pipeline_spark.operators.tokenizer import (
        token_cost_stream_fn,
    )

    out = str(tmp_path / "cost_log")
    fn = token_cost_stream_fn(out, ["t h", "th e"], group_col="lang")
    b0 = spark.createDataFrame(
        [("the the cat", "en"), ("the thin", "en"), ("le chat", None)],
        ["text", "lang"],
    )
    fn(b0, 0)
    rows = {r["lang"]: r for r in spark.read.parquet(out).collect()}
    # en: words the(x3), cat, thin -> ws 5; symbols: the->1 each (3),
    # cat->3, thin->3 ("th i n") -> 9; chars 3*3+3+4 = 16
    assert rows["en"]["ws_tokens"] == 5
    assert rows["en"]["bpe_symbols"] == 3 * 1 + 3 + 3
    assert rows["en"]["chars"] == 16
    # NULL lang is a kept category
    assert rows["(null)"]["ws_tokens"] == 2
    assert rows["(null)"]["bpe_symbols"] == 2 + 4  # 'le', 'chat' unmerged chars
    # replay: same batch id -> byte-identical appended rows (dedup on
    # (lang, batch_id) is lossless)
    fn(b0, 0)
    again = spark.read.parquet(out).collect()
    assert len(again) == 4
    dedup = {(r["lang"], r["batch_id"], r["ws_tokens"], r["bpe_symbols"], r["chars"]) for r in again}
    assert len(dedup) == 2


def test_token_cost_stream_real_stream_is_additive(spark, tmp_path):
    """Real stream: per-batch raw counts must sum to the whole corpus's
    counts (the mergeable-telemetry contract), whatever the file->batch
    assignment."""
    import json as _json

    from universal_aws_data_pipeline_spark.operators.tokenizer import (
        token_cost_stream_fn,
    )
    from universal_aws_data_pipeline_spark.streaming.ops import (
        read_stream_source,
        write_stream_sink,
    )

    d = tmp_path / "cost_in"
    d.mkdir()
    texts = [f"the cat {i} sat on the mat" for i in range(20)]
    for part, chunk in enumerate((texts[:10], texts[10:])):
        with open(d / f"b{part}.json", "w") as fh:
            for t in chunk:
                fh.write(_json.dumps({"text": t}) + "\n")

    out = str(tmp_path / "cost_log")
    stream = read_stream_source(
        spark,
        {"type": "file", "path": str(d), "format": "json",
         "max_files_per_trigger": 1},
        "text string",
    )
    q = write_stream_sink(
        stream,
        {"type": "foreach_batch",
         "fn": token_cost_stream_fn(out, ["t h", "th e"]),
         "checkpoint": str(tmp_path / "ckpt_cost"),
         "trigger": {"availableNow": True}},
    )
    q.awaitTermination(120)

    log = spark.read.parquet(out).collect()
    assert {r["batch_id"] for r in log} == {0, 1}
    total_ws = sum(r["ws_tokens"] for r in log)
    total_sym = sum(r["bpe_symbols"] for r in log)
    # whole corpus: 7 words per doc x 20 docs
    assert total_ws == 140
    # per doc: the(1)+cat(3)+digit(>=1)+sat(3)+on(2)+the(1)+mat(3)
    digits_syms = sum(len(str(i)) for i in range(20))
    assert total_sym == 20 * (1 + 3 + 3 + 2 + 1 + 3) + digits_syms
