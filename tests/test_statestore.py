"""Crash-injection tests for the foreachBatch state commit protocol.

The two holes being regression-tested (round-4 ADVICE):
1. a crash between the table->old and staging->table renames used to leave
   the state table MISSING (next batch silently rebuilt from scratch);
2. the replay marker used to be created after the swap, so a replay after
   a crash in that window re-folded the batch (double-counting CMS cells).

Both are closed by committing the folded batch id inside the staged table:
the directory swap is the single commit point, and recovery promotes a
complete staging (which already carries the fold + its batch id).
"""

from __future__ import annotations

import json
import os

import pytest

from universal_aws_data_pipeline_spark.operators import statestore


def _toks(spark, words):
    return spark.createDataFrame([(w,) for w in words], ["tok"])


def _cells(spark, state):
    return sorted(map(tuple, spark.read.parquet(os.path.join(state, "cells")).collect()))


def _crash_on_rename(monkeypatch, n_renames_then_crash: int):
    """Make statestore's os.rename raise after allowing n successful calls."""
    real = os.rename
    calls = {"n": 0}

    def boom(src, dst):
        if calls["n"] >= n_renames_then_crash:
            raise OSError("injected crash")
        calls["n"] += 1
        real(src, dst)

    monkeypatch.setattr(statestore.os, "rename", boom)
    return lambda: monkeypatch.setattr(statestore.os, "rename", real)


def test_crash_between_renames_recovers_staging_and_replay_is_noop(
    spark, tmp_path, monkeypatch
):
    """Kill the process between table->old and staging->table: the old code
    lost ALL state; now recover() promotes the complete staging and the
    foreachBatch replay of the crashed batch is skipped (no double-count)."""
    from universal_aws_data_pipeline_spark.operators.sketch import (
        cms_stream_fn,
        count_min_build,
    )

    b0 = _toks(spark, ["hot"] * 100 + [f"a{i}" for i in range(50)])
    b1 = _toks(spark, ["hot"] * 60 + [f"b{i}" for i in range(30)])
    state = str(tmp_path / "cms")
    fn = cms_stream_fn(state, "tok", depth=4, width=128)
    fn(b0, 0)

    # batch 1: allow the table->old rename, crash before staging->table
    restore = _crash_on_rename(monkeypatch, 1)
    with pytest.raises(OSError, match="injected crash"):
        fn(b1, 1)
    table = os.path.join(state, "cells")
    assert not os.path.exists(table)  # the crash window the old code died in
    restore()

    # Structured Streaming replays batch 1 after restart: recover() must
    # restore the complete staging (already containing batch 1's fold) and
    # the meta check must skip the re-fold.
    fn(b1, 1)
    want = count_min_build(b0.unionByName(b1), "tok", depth=4, width=128)
    assert _cells(spark, state) == sorted(map(tuple, want.collect()))
    # exactly one durable dir left, carrying the committed batch id
    assert statestore.last_folded(table) == 1
    assert not [d for d in os.listdir(state) if "__staging__" in d or "__old__" in d]


def test_crash_during_staging_write_keeps_old_state(spark, tmp_path, monkeypatch):
    """A partial staging (no _meta sentinel) must never be promoted: the old
    state stays, and the batch re-folds cleanly on replay."""
    from universal_aws_data_pipeline_spark.operators.sketch import (
        cms_stream_fn,
        count_min_build,
    )

    b0 = _toks(spark, ["x"] * 40)
    b1 = _toks(spark, ["x"] * 25)
    state = str(tmp_path / "cms")
    fn = cms_stream_fn(state, "tok", depth=2, width=64)
    fn(b0, 0)
    before = _cells(spark, state)

    # crash before ANY rename: staging written but _meta.json never lands
    def no_meta_commit(merged, table, batch_id):
        staging = f"{table}.__staging__.partial"
        merged.write.mode("overwrite").parquet(staging)
        raise OSError("injected crash mid-staging")

    monkeypatch.setattr(statestore, "commit", no_meta_commit)
    with pytest.raises(OSError, match="mid-staging"):
        fn(b1, 1)
    monkeypatch.undo()

    assert _cells(spark, state) == before  # old state intact
    fn(b1, 1)  # replay folds batch 1 exactly once
    want = count_min_build(b0.unionByName(b1), "tok", depth=2, width=64)
    assert _cells(spark, state) == sorted(map(tuple, want.collect()))


def test_crash_with_no_prior_state_rolls_back_to_nothing(spark, tmp_path, monkeypatch):
    """First-ever batch crashes mid-write: recover() leaves no table and the
    replay builds it from scratch."""
    from universal_aws_data_pipeline_spark.operators.sketch import (
        theta_estimate_from_state,
        theta_sketch_stream_fn,
    )
    import datetime as dt

    b0 = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 12, 0), u) for u in range(200)],
        "ts: timestamp_ntz, user_id: long",
    )
    state = str(tmp_path / "theta")
    fn = theta_sketch_stream_fn(state)

    restore = _crash_on_rename(monkeypatch, 0)  # crash on the very first rename
    with pytest.raises(OSError, match="injected crash"):
        fn(b0, 0)
    restore()

    fn(b0, 0)  # replay succeeds
    est = theta_estimate_from_state(spark, state).collect()
    assert len(est) == 1 and est[0]["est_users"] > 0


def test_recover_prefers_newest_complete_staging(tmp_path):
    """Unit check of the promotion order: complete staging beats __old__."""
    table = str(tmp_path / "t")
    old = f"{table}.__old__.aaaa"
    os.makedirs(old)
    stale = f"{table}.__staging__.bbbb"  # partial: no meta
    os.makedirs(stale)
    good = f"{table}.__staging__.cccc"
    os.makedirs(good)
    with open(os.path.join(good, "_meta.json"), "w") as f:
        json.dump({"last_batch_id": 7}, f)

    statestore.recover(table)
    assert os.path.exists(table)
    assert statestore.last_folded(table) == 7
    assert not os.path.exists(old) and not os.path.exists(stale)
