"""Data-quality check engine.

The reference *declares* quality checks in config (``sample_source.yaml:85-95``:
not_null / unique / regex, plus metric thresholds at ``:98-107``) but no code
ever consumes them. This module makes them real.

Design for scale: all checks for a dataset are evaluated in ONE aggregation
job (a single ``agg`` with one expression per check) rather than one action
per check — at 100 TB the data is scanned once, partial aggregates combine
map-side, and the result is a single tiny row on the driver. ``unique`` checks
need a distinct count, which we compute in the same pass via
``count(*) - approx/exact distinct``; exact mode uses ``count_distinct``
(adds a shuffle per distinct-key set, unavoidable for exactness).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from universal_aws_data_pipeline_spark.config.model import MetricThreshold, QualityCheck


@dataclass
class CheckResult:
    check: str  # e.g. "not_null(email)"
    passed: bool
    violations: int


def quality_check_df(df: DataFrame, checks: list[QualityCheck]) -> DataFrame:
    """Return a DataFrame (check, violations, passed) — fully declarative, so it
    can itself be a query target or written to a quality-audit sink."""
    aggs = []
    names: list[str] = []
    for chk in checks:
        for col in chk.columns:
            if chk.type == "not_null":
                name = f"not_null({col})"
                aggs.append(F.sum(F.col(col).isNull().cast("long")).alias(name))
            elif chk.type == "regex":
                name = f"regex({col})"
                aggs.append(
                    F.sum((~F.coalesce(F.col(col).cast("string").rlike(chk.pattern), F.lit(False))).cast("long")).alias(name)
                )
            elif chk.type == "unique":
                name = f"unique({col})"
                aggs.append((F.count(F.col(col)) - F.count_distinct(F.col(col))).alias(name))
            else:  # pragma: no cover - validated in config
                raise ValueError(chk.type)
            names.append(name)
    if not aggs:
        raise ValueError("no checks given")
    row = df.agg(*aggs)
    # unpivot the single aggregate row into (check, violations, passed)
    stack_expr = ", ".join(f"'{n}', `{n}`" for n in names)
    return row.selectExpr(f"stack({len(names)}, {stack_expr}) as (check, violations)").withColumn(
        "passed", F.col("violations") == 0
    )


def run_quality_checks(df: DataFrame, checks: list[QualityCheck]) -> list[CheckResult]:
    rows = quality_check_df(df, checks).collect()
    return [CheckResult(check=r["check"], passed=bool(r["passed"]), violations=int(r["violations"])) for r in rows]


class QualityCheckError(ValueError):
    """Raised by ``enforce_quality_checks`` when any check fails; carries the
    full result list so callers can report per-check violations."""

    def __init__(self, results: list[CheckResult]):
        self.results = results
        failed = [r for r in results if not r.passed]
        super().__init__(
            "quality checks failed: " + ", ".join(f"{r.check} ({r.violations} violations)" for r in failed)
        )


def enforce_quality_checks(df: DataFrame, checks: list[QualityCheck]) -> list[CheckResult]:
    """Gate variant: run all checks in one pass, raise if any fail."""
    results = run_quality_checks(df, checks)
    if any(not r.passed for r in results):
        raise QualityCheckError(results)
    return results


def check_metric_thresholds(metrics: dict[str, float], thresholds: list[MetricThreshold]) -> list[CheckResult]:
    """Driver-side comparison of observed metrics vs declared thresholds
    (sample_source.yaml:99-107). Metrics come from ``df.observe`` accumulators,
    not extra count() actions (fixes the double-count bug, transform_data.py:234-238)."""
    ops = {
        "gt": lambda v, t: v > t,
        "ge": lambda v, t: v >= t,
        "lt": lambda v, t: v < t,
        "le": lambda v, t: v <= t,
        "eq": lambda v, t: v == t,
    }
    out = []
    for th in thresholds:
        value = metrics.get(th.metric)
        passed = value is not None and ops[th.comparison](value, th.threshold)
        out.append(
            CheckResult(
                check=f"{th.metric} {th.comparison} {th.threshold}",
                passed=bool(passed),
                violations=0 if passed else 1,
            )
        )
    return out
