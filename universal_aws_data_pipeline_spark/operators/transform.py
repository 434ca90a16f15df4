"""Declarative transform chain — parity with the reference's Glue job.

Reference behavior re-implemented Spark-first (one ``select``-centric lazy
plan; Catalyst fuses the whole chain into a single whole-stage-codegen span
over the scan, so filters/casts push down to the Parquet/CSV reader):

- ``apply_schema_mapping``   ⇔ transform_data.py:36-53  (flat rename + dot-path
  extraction; nested-target structs FIXED — the reference crashes on them, §1.4)
- ``apply_transformations``  ⇔ transform_data.py:55-90  (datetime/cast/trim/
  regexp_replace chain)
- ``filter_required``        ⇔ transform_data.py:92-103 (required-field null drop)
- ``add_metadata_columns``   ⇔ transform_data.py:105-111 (source_name +
  processed_timestamp; clock is injectable — the reference's wall-clock call at
  transform_data.py:111 makes results irreproducible)
- ``derive_partition_columns`` ⇔ transform_data.py:113-150 (year/month/day; the
  reference picks "first column whose name contains 'date'" and silently falls
  back to datetime.now() — we take an explicit column and an injectable clock)

Scale notes: every step is a narrow, shuffle-free projection/filter. At 100 TB
this chain runs as map-only tasks over the scan with predicate pushdown and
column pruning intact (verify via .explain(): PushedFilters + ReadSchema).
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from universal_aws_data_pipeline_spark.config.model import SchemaConfig, SourceConfig, TransformationSpec

CORRUPT_COL = "_corrupt_record"


def _dot_path_col(path: str) -> Column:
    """Resolve ``a.b.c`` as nested struct field access (transform_data.py:43-48)."""
    parts = path.split(".")
    c = F.col(parts[0])
    for p in parts[1:]:
        c = c.getField(p)
    return c


def apply_schema_mapping(df: DataFrame, mapping: dict[str, Any]) -> DataFrame:
    """Rename/extract columns per ``{target: source}``; dict values build structs.

    Single ``select`` (not N ``withColumn`` calls) so the analyzer sees one
    projection — cheaper on wide schemas and keeps column pruning exact: only
    mapped source columns are read from the scan.
    """
    if not mapping:
        return df
    cols: list[Column] = []
    for target, source in mapping.items():
        if isinstance(source, dict):
            # nested target: build a struct column from sub-mappings
            # (the reference's declared-but-broken form, sample_source.yaml:39-43)
            cols.append(
                F.struct(*[_dot_path_col(sub_src).alias(sub_tgt) for sub_tgt, sub_src in source.items()]).alias(target)
            )
        else:
            cols.append(_dot_path_col(source).alias(target))
    # A tolerant (PERMISSIVE) read carries the corrupt-record side channel;
    # the mapping must not drop it or MAXERROR accounting downstream sees
    # corrupt rows as clean all-null rows (they'd load or be silently dropped).
    if CORRUPT_COL in df.columns and CORRUPT_COL not in mapping:
        cols.append(F.col(CORRUPT_COL))
    return df.select(*cols)


def _apply_one(col: Column, spec: TransformationSpec) -> Column:
    t = spec.type
    if t == "datetime":
        return F.to_timestamp(col, spec.format) if spec.format else F.to_timestamp(col)
    if t == "date":
        return F.to_date(col, spec.format) if spec.format else F.to_date(col)
    if t == "string":
        return col.cast("string")
    if t == "integer":
        return col.cast("int")
    if t == "long":
        return col.cast("long")
    if t == "double":
        return col.cast("double")
    if t == "trim":
        return F.trim(col)
    if t == "regexp_replace":
        return F.regexp_replace(col, spec.pattern, spec.replacement or "")
    if t == "lower":
        return F.lower(col)
    if t == "upper":
        return F.upper(col)
    raise ValueError(f"unknown transformation type {t!r}")  # pre-validated in config


def apply_transformations(df: DataFrame, specs: list[TransformationSpec]) -> DataFrame:
    """Ordered per-field scalar transforms (transform_data.py:55-90).

    Multiple specs on the same field compose in declaration order, as in the
    reference. All built-in functions → stays inside whole-stage codegen.
    """
    exprs: dict[str, Column] = {name: F.col(name) for name in df.columns}
    for spec in specs:
        if spec.field not in exprs:
            raise ValueError(f"transformation targets unknown field {spec.field!r}")
        exprs[spec.field] = _apply_one(exprs[spec.field], spec)
    return df.select(*[c.alias(name) for name, c in exprs.items()])


def filter_required(df: DataFrame, required: list[str]) -> DataFrame:
    """Drop rows with nulls in any required column (transform_data.py:92-103).

    ``na.drop(subset=...)`` compiles to IsNotNull conjunctions that Catalyst
    pushes into the scan.
    """
    if not required:
        return df
    missing = [c for c in required if c not in df.columns]
    if missing:
        raise ValueError(f"required columns not in dataframe: {missing}")
    if CORRUPT_COL in df.columns:
        # Corrupt rows are all-null in mapped columns; keep them so the
        # warehouse sink's MAXERROR accounting can count (then drop) them.
        cond = F.lit(True)
        for c in required:
            cond = cond & F.col(c).isNotNull()
        return df.filter(cond | F.col(CORRUPT_COL).isNotNull())
    return df.na.drop(subset=required)


def add_metadata_columns(
    df: DataFrame,
    source_name: str,
    processed_at: _dt.datetime | None = None,
) -> DataFrame:
    """Add ``source_name`` + ``processed_timestamp`` (transform_data.py:105-111).

    ``processed_at=None`` ⇒ wall clock (reference behavior); tests inject a
    fixed instant for hash-reproducibility.

    The injected value becomes a TIMESTAMP_NTZ literal: a naive ``datetime``
    through ``F.lit`` is converted with the *driver's* local tz but rendered
    with the *session* tz, so downstream formatting would shift whenever the
    two disagree. NTZ is wall-clock on both ends.
    """
    if processed_at is not None:
        ts = F.lit(processed_at.strftime("%Y-%m-%d %H:%M:%S")).cast("timestamp_ntz")
    else:
        ts = F.current_timestamp()
    return df.withColumn("source_name", F.lit(source_name)).withColumn("processed_timestamp", ts)


def add_provenance_column(df: DataFrame, column: str = "_input_file") -> DataFrame:
    """Record-level lineage: the source file each row came from
    (``input_file_name()`` — filled by the scan, empty string for non-file
    sources). At 100 TB this is the column that turns "3 bad rows" into
    "re-ingest exactly these two objects": filter on it, distinct it, and
    the blast radius of a poisoned upload is a file list, not a full-table
    diff. Zero-cost at read (no extra IO; the scan already knows the path);
    add it BEFORE any join/aggregate — lineage doesn't survive a shuffle
    that merges rows."""
    return df.withColumn(column, F.input_file_name())


def derive_partition_columns(
    df: DataFrame,
    date_column: str | None,
    fallback_date: _dt.date | None = None,
) -> DataFrame:
    """Add year/month/day partition columns (transform_data.py:113-150).

    The reference scans for the first column containing 'date' and falls back
    to the wall clock; here the column is explicit and the fallback is an
    injected date (None ⇒ current_date, documented nondeterminism).
    """
    if date_column is not None:
        if date_column not in df.columns:
            raise ValueError(f"partition date column {date_column!r} not in dataframe")
        src = F.col(date_column)
    else:
        src = F.lit(fallback_date).cast("date") if fallback_date is not None else F.current_date()
    return (
        df.withColumn("year", F.year(src))
        .withColumn("month", F.month(src))
        .withColumn("day", F.dayofmonth(src))
    )


def transform_chain(
    df: DataFrame,
    cfg: SourceConfig | SchemaConfig,
    source_name: str | None = None,
    processed_at: _dt.datetime | None = None,
    partition_date_column: str | None = None,
    fallback_date: _dt.date | None = None,
    with_partitions: bool = True,
) -> DataFrame:
    """The full reference transform pipeline (transform_data.py:206-212) as one
    lazy plan: mapping → transforms → required-filter → metadata → partitions."""
    if isinstance(cfg, SourceConfig):
        schema = cfg.schema
        source_name = source_name or cfg.name
        partition_date_column = partition_date_column or cfg.partition_source_column
    else:
        schema = cfg
    out = apply_schema_mapping(df, schema.mapping)
    out = apply_transformations(out, schema.transformations)
    out = filter_required(out, schema.required)
    if source_name is not None:
        out = add_metadata_columns(out, source_name, processed_at)
    if with_partitions:
        out = derive_partition_columns(out, partition_date_column, fallback_date)
    return out
