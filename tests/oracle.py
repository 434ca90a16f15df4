"""Local stand-in for the driver's DuckDB-oracle comparison.

Runs a catalog query through Spark AND its oracle SQL through DuckDB over the
same parquet tables, then compares row count, column names, and an
order-insensitive multiset of stringified rows (columns sorted by name —
mirroring the driver's described hashing)."""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # cells are pre-rounded by the queries; normalize -0.0 and repr noise
        return f"{v + 0.0:.6g}"
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return repr(v)


def _row_multiset(cols: list[str], rows: list[tuple]) -> Counter:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter("|".join(_norm_cell(r[i]) for i in order) for r in rows)


def compare(spark, sf_dir: str, spark_fn, oracle_sql: str) -> tuple[bool, str]:
    sdf = spark_fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    con = duckdb_conn(sf_dir)
    res = con.execute(oracle_sql)
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()
    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    sm, dm = _row_multiset(s_cols, s_rows), _row_multiset(d_cols, d_rows)
    if sm != dm:
        only_s = list((sm - dm).items())[:3]
        only_d = list((dm - sm).items())[:3]
        return False, f"value mismatch: only_spark={only_s} only_duckdb={only_d}"
    return True, "ok"
