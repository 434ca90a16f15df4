"""Sink tests: partitioned layout, warehouse staging swap, tolerant load,
compaction."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from universal_aws_data_pipeline_spark.config.model import DestinationConfig
from universal_aws_data_pipeline_spark.sinks.tables import (
    TolerantLoadError,
    compact_table,
    write_partitioned,
    write_warehouse_table,
)


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [(i, f"u{i}", i % 3, 2024, 1 + i % 2) for i in range(30)],
        "id LONG, name STRING, bucket INT, year INT, month INT",
    )


def test_partitioned_write_layout(spark, df, tmp_path):
    out = str(tmp_path / "t")
    write_partitioned(df, out, partition_by=["year", "month"])
    assert os.path.isdir(os.path.join(out, "year=2024", "month=1"))
    assert os.path.isdir(os.path.join(out, "year=2024", "month=2"))
    back = spark.read.parquet(out)
    assert back.count() == 30
    # partition pruning: only month=2 files are read
    pruned = back.filter(F.col("month") == 2)
    assert "month=1" not in pruned._jdf.queryExecution().executedPlan().toString() or pruned.count() == 15


def test_warehouse_swap_replaces_atomically(spark, df, tmp_path):
    dest = DestinationConfig(path=str(tmp_path / "wh"), dist_key="bucket", sort_keys=["id"])
    n = write_warehouse_table(df, dest)
    assert n == 30
    # second load fully replaces (staging swap, not append)
    n2 = write_warehouse_table(df.filter(F.col("id") < 10), dest)
    assert n2 == 10
    assert spark.read.parquet(dest.path).count() == 10
    # no staging/old remnants
    leftovers = [d for d in os.listdir(tmp_path) if "__staging__" in d or "__old__" in d]
    assert leftovers == []


def test_tolerant_load_cap(spark, tmp_path):
    # PERMISSIVE json read: corrupt rows carry _corrupt_record
    raw = tmp_path / "raw"
    raw.mkdir()
    with open(raw / "data.json", "w") as f:
        f.write('{"id": 1, "v": "a"}\n')
        f.write("THIS IS NOT JSON\n")
        f.write('{"id": 2, "v": "b"}\n')
    from universal_aws_data_pipeline_spark.sources.files import read_source

    df = read_source(spark, str(raw), "json", tolerant=True)
    dest_ok = DestinationConfig(path=str(tmp_path / "ok"), max_errors=1)
    counts: dict[str, int] = {}
    n = write_warehouse_table(df, dest_ok, counts)
    assert n == 2 and counts["error_count"] == 1  # bad row filtered, within cap

    dest_strict = DestinationConfig(path=str(tmp_path / "strict"), max_errors=0)
    with pytest.raises(TolerantLoadError):
        write_warehouse_table(df, dest_strict)
    assert not os.path.exists(dest_strict.path)  # failed load leaves no table


def test_compact_table(spark, df, tmp_path):
    path = str(tmp_path / "frag")
    df.repartition(16).write.parquet(path)
    n_before = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_before >= 8
    compact_table(spark.read.parquet(path), path, target_file_mb=256)
    n_after = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    assert n_after == 1  # tiny table → one file
    assert spark.read.parquet(path).count() == 30


def test_write_warehouse_jdbc_staging_swap(spark, tmp_path):
    """JDBC warehouse load (redshift_loader/handler.py:76-183 semantics over a
    live connection): staging table + RENAME swap, old data readable until the
    swap, second load replaces the first atomically."""
    from universal_aws_data_pipeline_spark.config.model import DestinationConfig
    from universal_aws_data_pipeline_spark.sinks.tables import write_warehouse_table

    url = f"jdbc:derby:{tmp_path}/wh_db;create=true"
    dest = DestinationConfig(path="events_tbl", jdbc_url=url, dist_key="user_id", sort_keys=["seq"])

    df1 = spark.createDataFrame([(1, 10, "a"), (2, 20, "b")], "user_id int, seq int, payload string")
    n = write_warehouse_table(df1, dest)
    assert n == 2
    back = spark.read.jdbc(url, "events_tbl")
    assert back.count() == 2

    # reload with different data: swap replaces, no residue staging/old tables
    df2 = spark.createDataFrame([(3, 30, "c")], "user_id int, seq int, payload string")
    counts: dict[str, int] = {}
    n2 = write_warehouse_table(df2, dest, counts)
    assert n2 == 1 and counts["record_count"] == 1
    back2 = spark.read.jdbc(url, "events_tbl")
    assert [r["payload"] for r in back2.collect()] == ["c"]
    for residue in ("events_tbl__staging", "events_tbl__old"):
        try:
            spark.read.jdbc(url, residue).count()
            assert False, f"{residue} left behind"
        except Exception:
            pass


def test_write_warehouse_jdbc_maxerror(spark, tmp_path):
    """Corrupt rows past max_errors abort the JDBC load BEFORE the swap — the
    previous table version survives."""
    from universal_aws_data_pipeline_spark.config.model import DestinationConfig
    from universal_aws_data_pipeline_spark.sinks.tables import TolerantLoadError, write_warehouse_table

    url = f"jdbc:derby:{tmp_path}/wh_db2;create=true"
    dest = DestinationConfig(path="tol_tbl", jdbc_url=url, max_errors=0)

    good = spark.createDataFrame([(1, None)], "id int, _corrupt_record string")
    assert write_warehouse_table(good, dest) == 1

    bad = spark.createDataFrame([(2, None), (None, "junk line")], "id int, _corrupt_record string")
    import pytest

    with pytest.raises(TolerantLoadError):
        write_warehouse_table(bad, dest)
    # old version intact
    assert [r["id"] for r in spark.read.jdbc(url, "tol_tbl").collect()] == [1]


def test_sortkey_write_produces_skippable_row_groups(spark, tmp_path):
    """SORTKEY's whole point at scale is parquet row-group min/max pruning:
    after sortWithinPartitions, each file's row groups must cover disjoint
    (ordered) sortkey ranges, so a point/range predicate skips all but the
    matching groups. Asserted on the actual parquet footers — a regression
    to unsorted writes (overlapping stats) would make every row group match
    every predicate."""
    import pyarrow.parquet as pq

    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    prev_block = hconf.get("parquet.block.size")
    hconf.setInt("parquet.block.size", 64 * 1024)  # tiny row groups for the fixture
    try:
        rows = [(i, f"u{i}", i % 5) for i in range(200_000)]
        big = spark.createDataFrame(rows, "id LONG, name STRING, bucket INT").repartition(2)
        dest = DestinationConfig(path=str(tmp_path / "wh"), dist_key="bucket", sort_keys=["id"])
        write_warehouse_table(big, dest)
    finally:
        if prev_block is None:
            hconf.unset("parquet.block.size")
        else:
            hconf.set("parquet.block.size", prev_block)

    checked_files = 0
    for root, _dirs, files in os.walk(dest.path):
        for fname in files:
            if not fname.endswith(".parquet"):
                continue
            meta = pq.ParquetFile(os.path.join(root, fname)).metadata
            if meta.num_row_groups < 2:
                continue  # single-group files are trivially skippable
            checked_files += 1
            idx = [c for c in range(meta.row_group(0).num_columns)
                   if meta.row_group(0).column(c).path_in_schema == "id"][0]
            prev_max = None
            for g in range(meta.num_row_groups):
                st = meta.row_group(g).column(idx).statistics
                assert st is not None and st.has_min_max
                if prev_max is not None:
                    assert st.min >= prev_max  # disjoint, ordered ranges
                prev_max = st.max
    assert checked_files >= 1, "fixture too small: no multi-row-group file to check"


# ---------------------------------------------------------------------------
# Manifest-commit protocol: object-store-atomic swap (round-4 verdict item 2)
# ---------------------------------------------------------------------------
def test_manifest_commit_roundtrip_and_version_gc(spark, df, tmp_path):
    from universal_aws_data_pipeline_spark.sinks.tables import (
        read_manifest_table,
        write_table_manifest_commit,
    )

    path = str(tmp_path / "mt")
    m0 = write_table_manifest_commit(df, path)
    assert m0["version"] == 0
    assert read_manifest_table(spark, path).count() == 30

    m1 = write_table_manifest_commit(df.filter("id < 10"), path)
    assert m1["version"] == 1 and m1["previous"] == [m0["current"]]
    assert read_manifest_table(spark, path).count() == 10

    # third commit GCs version 0 (keep_versions=2) but keeps version 1
    m2 = write_table_manifest_commit(df.filter("id < 5"), path)
    vdirs = sorted(d for d in os.listdir(path) if d.startswith("v_"))
    assert vdirs == sorted([m2["current"], m1["current"]])
    assert read_manifest_table(spark, path).count() == 5


def test_manifest_crash_between_data_write_and_commit_keeps_old_table(
    spark, df, tmp_path, monkeypatch
):
    """Kill the writer AFTER the new version's data files land but BEFORE
    _manifest.json is replaced — the window where a directory-rename swap on
    an object store leaves a torn table. Readers must keep seeing the old
    version, and the next successful commit must still work and GC the
    orphan."""
    from universal_aws_data_pipeline_spark.sinks import tables

    path = str(tmp_path / "mt")
    tables.write_table_manifest_commit(df, path)
    before = sorted(r["id"] for r in tables.read_manifest_table(spark, path).collect())

    def boom(*a, **k):
        raise OSError("injected crash before manifest commit")

    monkeypatch.setattr(tables, "_commit_manifest", boom)
    with pytest.raises(OSError, match="injected crash"):
        tables.write_table_manifest_commit(df.filter("id < 3"), path)
    monkeypatch.undo()

    # old table fully readable; the orphan version dir is invisible to readers
    after = sorted(r["id"] for r in tables.read_manifest_table(spark, path).collect())
    assert after == before

    # next commit succeeds and garbage-collects the orphan
    m = tables.write_table_manifest_commit(df.filter("id >= 25"), path)
    live = {m["current"], *m["previous"]}
    assert {d for d in os.listdir(path) if d.startswith("v_")} == live
    assert tables.read_manifest_table(spark, path).count() == 5


def test_warehouse_table_manifest_mode_swaps_and_gates_maxerror(spark, df, tmp_path):
    """dest.commit='manifest' end-to-end: load, overwrite, and a failed
    MAXERROR load that must leave the previous version current."""
    from universal_aws_data_pipeline_spark.sinks.tables import read_manifest_table

    path = str(tmp_path / "wt")
    dest = DestinationConfig(path=path, commit="manifest")
    n = write_warehouse_table(df, dest)
    assert n == 30
    assert read_manifest_table(spark, path).count() == 30

    n2 = write_warehouse_table(df.filter("id < 7"), dest)
    assert n2 == 7
    assert read_manifest_table(spark, path).count() == 7

    # corrupt load beyond the cap (PERMISSIVE json read, same shape as
    # test_tolerant_load_cap): raises, manifest still points at the 7-row v1
    raw = tmp_path / "raw"
    raw.mkdir()
    with open(raw / "data.json", "w") as f:
        f.write('{"id": 1}\nNOT JSON\n')
    from universal_aws_data_pipeline_spark.sources.files import read_source

    bad = read_source(spark, str(raw), "json", tolerant=True)
    with pytest.raises(TolerantLoadError):
        write_warehouse_table(bad, DestinationConfig(path=path, commit="manifest", max_errors=0))
    assert read_manifest_table(spark, path).count() == 7


def test_manifest_commit_e2e_sf01_crash_and_retry_converge(spark, tmp_path, monkeypatch):
    """Bench-scale manifest-commit e2e (VERDICT r5, item 8): write the
    sf0.1 lineitem table through dest.commit='manifest', kill the writer
    BETWEEN the version-dir data write and the manifest PUT — the exact
    window where an object store has a complete-but-unreferenced version —
    then prove (a) readers never see anything but the last committed
    version and (b) a plain retry of the same load converges, garbage-
    collecting the orphan. Commit overhead at this scale is recorded in
    PERF.md (the manifest PUT is one small-object replace; data files are
    written once, never renamed)."""
    from universal_aws_data_pipeline_spark.sinks import tables
    from universal_aws_data_pipeline_spark.sinks.tables import read_manifest_table

    li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_returnflag"
    )
    n_all = li.count()
    path = str(tmp_path / "wt_sf01")
    dest = DestinationConfig(path=path, commit="manifest", partition_by=["l_returnflag"])

    assert write_warehouse_table(li, dest) == n_all
    assert read_manifest_table(spark, path).count() == n_all
    v0 = tables._read_manifest(path)["current"]

    # crash in the window: version dir fully written, manifest never moved
    real_commit = tables._commit_manifest

    def boom(*a, **k):
        raise OSError("injected crash before manifest PUT")

    monkeypatch.setattr(tables, "_commit_manifest", boom)
    update = li.filter(F.col("l_returnflag") != "R")
    n_update = update.count()
    with pytest.raises(OSError, match="injected crash"):
        write_warehouse_table(update, dest)
    monkeypatch.setattr(tables, "_commit_manifest", real_commit)

    # reader stability: still the full v0 table, orphan invisible
    m = tables._read_manifest(path)
    assert m["current"] == v0
    assert read_manifest_table(spark, path).count() == n_all
    orphans = {d for d in os.listdir(path) if d.startswith("v_")} - {v0}
    assert orphans, "crash should have left a complete orphan version dir"

    # plain retry converges and GCs the orphan
    assert write_warehouse_table(update, dest) == n_update
    m2 = tables._read_manifest(path)
    assert read_manifest_table(spark, path).count() == n_update
    live = {m2["current"], *m2["previous"]}
    assert {d for d in os.listdir(path) if d.startswith("v_")} == live
    assert not (set(orphans) & live)
