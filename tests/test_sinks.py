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
