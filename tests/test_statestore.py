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


def test_legacy_marker_dirs_migrate_without_double_fold(spark, tmp_path):
    """Upgrade path (round-5 ADVICE): a state dir written by the old
    marker-dir protocol (sibling _batch_N dirs, no _meta.json) must report
    the legacy max batch id — so a foreachBatch replay of the last
    committed batch is a no-op, not a double-fold of sum-merged CMS cells —
    and the stale markers must vanish at the first new-protocol commit."""
    from universal_aws_data_pipeline_spark.operators.sketch import (
        cms_stream_fn,
        count_min_build,
    )

    b0 = _toks(spark, ["hot"] * 30 + ["a", "b"])
    b1 = _toks(spark, ["hot"] * 20 + ["c"])
    b2 = _toks(spark, ["hot"] * 10 + ["d"])
    state = str(tmp_path / "cms")
    fn = cms_stream_fn(state, "tok", depth=2, width=64)
    fn(b0, 0)
    fn(b1, 1)
    table = os.path.join(state, "cells")

    # rewrite the dir into its legacy shape: no _meta.json, sibling markers
    os.remove(os.path.join(table, "_meta.json"))
    os.makedirs(os.path.join(state, "_batch_0"))
    os.makedirs(os.path.join(state, "_batch_1"))
    assert statestore.last_folded(table) == 1  # legacy fallback

    after_b1 = _cells(spark, state)
    fn(b1, 1)  # restart replay of the last legacy-committed batch
    assert _cells(spark, state) == after_b1  # no double-count

    fn(b2, 2)  # first new-protocol commit
    want = count_min_build(
        b0.unionByName(b1).unionByName(b2), "tok", depth=2, width=64
    )
    assert _cells(spark, state) == sorted(map(tuple, want.collect()))
    assert statestore.last_folded(table) == 2
    # superseded legacy markers are gone
    assert not [d for d in os.listdir(state) if d.startswith("_batch_")]


def test_legacy_markers_without_table_are_ignored(tmp_path):
    """Markers whose table was lost (legacy crash hole #1) must not claim
    batches as folded — the rebuilt-empty state needs every batch."""
    state = tmp_path / "s"
    os.makedirs(state / "_batch_5")
    assert statestore.last_folded(str(state / "cells")) == -1


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


# ---------------------------------------------------------------------------
# IVF rebalance crash consistency (operators/similarity.py txn protocol)
# ---------------------------------------------------------------------------
def _build_skewed_ivf(spark, tmp_path):
    import random

    from universal_aws_data_pipeline_spark.operators.similarity import build_ivf_index

    rng = random.Random(7)
    rows = [(i, [10.0 + rng.uniform(-1, 1), 10.0 + rng.uniform(-1, 1)]) for i in range(80)]
    rows += [
        (100 + i, [-10.0 + rng.uniform(-1, 1), -10.0 + rng.uniform(-1, 1)])
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    path = str(tmp_path / "ivf")
    build_ivf_index(df, path, n_clusters=2)
    return path


def test_rebalance_crash_mid_moves_heals_on_next_load(spark, tmp_path, monkeypatch):
    """Kill the rebalance after the txn marker lands but before any cell dir
    moves: the next load_ivf_index must replay the transaction — every
    vector present exactly once, every cell id resolvable in meta."""
    from universal_aws_data_pipeline_spark.operators import similarity

    path = _build_skewed_ivf(spark, tmp_path)

    # crash INSIDE the transaction: marker written, moves not yet applied
    def boom(cells_dir, staged, cell_ids, drop_ids):
        raise OSError("injected crash before cell moves")

    monkeypatch.setattr(similarity, "_apply_cell_txn", boom)
    with pytest.raises(OSError, match="injected crash"):
        similarity.rebalance_ivf_index(spark, path, max_cell_fraction=0.5, n_split=2)
    monkeypatch.undo()

    # meta was committed BEFORE the crash — extra centroids are legal (0-row
    # cells), and recovery must land all 100 vectors exactly once
    idx = similarity.load_ivf_index(spark, path)
    ids = [r["vec_id"] for r in idx.cells.select("vec_id").collect()]
    assert sorted(ids) == sorted(set(ids)) and len(ids) == 100
    # every on-disk cell id has a centroid (the corruption the old code left)
    on_disk = {r["_cell"] for r in idx.cells.select("_cell").distinct().collect()}
    assert on_disk <= set(range(len(idx.centroids)))
    # txn replayed to completion: no markers or staging dirs remain
    import glob
    import os

    assert not glob.glob(os.path.join(path, "cells", "_txn_*.json"))
    assert not glob.glob(os.path.join(path, "cells.__rebal__.*"))
    # probes work on the healed index
    got = similarity.ivf_topk_indexed(idx, [10.0, 10.0], k=1, nprobe=len(idx.centroids)).collect()
    assert got[0]["vec_id"] < 100


def test_rebalance_meta_write_is_atomic(tmp_path, monkeypatch):
    """A crash mid-meta-write must never leave a torn meta.json."""
    from universal_aws_data_pipeline_spark.operators import similarity

    path = str(tmp_path / "ivf")
    os.makedirs(path)
    similarity._write_meta_atomic(
        path, {"id_col": "a", "vec_col": "b", "n_clusters": 1, "centroids": [[0.0]]}
    )
    before = open(os.path.join(path, "meta.json")).read()

    real_replace = os.replace

    def no_replace(src, dst):
        raise OSError("injected crash before replace")

    monkeypatch.setattr(similarity.__dict__.setdefault("os", os), "replace", no_replace)
    try:
        with pytest.raises(OSError):
            similarity._write_meta_atomic(path, {"id_col": "x", "vec_col": "y", "n_clusters": 2, "centroids": []})
    finally:
        monkeypatch.setattr(os, "replace", real_replace)
    assert open(os.path.join(path, "meta.json")).read() == before


# ---------------------------------------------------------------------------
# compaction on non-local paths must error, not silently no-op
# ---------------------------------------------------------------------------
def test_compaction_rejects_object_store_uris(spark):
    from universal_aws_data_pipeline_spark.operators.maintenance import (
        compact_table,
        compaction_plan,
    )

    with pytest.raises(ValueError, match="local filesystem"):
        compaction_plan("s3://bucket/table")
    with pytest.raises(ValueError, match="local filesystem"):
        compact_table(spark, "hdfs://nn/table")


def test_compaction_rejects_missing_dir(tmp_path):
    from universal_aws_data_pipeline_spark.operators.maintenance import compaction_plan

    with pytest.raises(ValueError, match="not a directory"):
        compaction_plan(str(tmp_path / "nope"))
