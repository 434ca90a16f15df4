"""Vector math over ``array<float|double>`` columns — pure built-in functions.

All JVM-side (``zip_with``/``aggregate`` run inside codegen): no Python UDF
serialization in the hot path. Inputs are cast to double first so the fold is
IEEE-double left-to-right — deterministic and bit-identical to a sequential
C/SQL loop (which is what lets the DuckDB oracle match exactly).

At 100 TB these expressions vectorize per-row with no shuffle; for top-k ANN
see operators/similarity.py (brute-force baseline vs LSH-bucketed scale path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Dot product of two numeric array columns (double fold, left-to-right)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(a: Column, b: Column) -> Column:
    """cos = dot(a,b) / (||a|| * ||b||); NULL when either norm is zero."""
    d = dot(a, b)
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0.0, d / denom)
