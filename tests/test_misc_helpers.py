"""Coverage for remaining helpers: load_tables view registration, metric
threshold evaluation, corrupt-record column handling."""

from __future__ import annotations

from universal_aws_data_pipeline_spark.config.model import MetricThreshold
from universal_aws_data_pipeline_spark.operators.quality import check_metric_thresholds
from universal_aws_data_pipeline_spark.sources.files import load_tables


def test_load_tables_registers_views(spark, sf_dir):
    tables = load_tables(spark, sf_dir, names=["region", "nation"])
    assert set(tables) == {"region", "nation"}
    # temp views queryable through the SQL door
    n = spark.sql("SELECT count(*) AS n FROM region").collect()[0]["n"]
    assert n == 5
    joined = spark.sql(
        "SELECT r.r_name, count(*) AS n FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey GROUP BY r.r_name"
    )
    assert joined.count() == 5


def test_check_metric_thresholds_alarm_when_true():
    # CloudWatch semantics: comparison IS the alarm condition.
    thresholds = [
        MetricThreshold(metric="record_count", threshold=10, comparison="gt"),
        MetricThreshold(metric="error_count", threshold=0, comparison="GreaterThan"),  # alias normalizes
        MetricThreshold(metric="missing_metric", threshold=1, comparison="ge"),
    ]
    results = check_metric_thresholds({"record_count": 42, "error_count": 0}, thresholds)
    by_check = {r.check: r.passed for r in results}
    assert by_check["record_count gt 10"] is False  # 42 > 10 -> alarm trips
    assert by_check["error_count gt 0"] is True  # clean run: no alarm
    assert by_check["missing_metric ge 1"] is True  # missing data: not breaching

    # errors present -> the reference's error_count alarm trips
    results2 = check_metric_thresholds({"error_count": 3}, thresholds[1:2])
    assert results2[0].passed is False and results2[0].violations == 1


def test_quality_checks_empty_input_passes(spark):
    """F.sum over zero rows is NULL; coalesce keeps empty inputs a clean pass."""
    from universal_aws_data_pipeline_spark.config.model import QualityCheck
    from universal_aws_data_pipeline_spark.operators.quality import run_quality_checks

    df = spark.createDataFrame([], "a string, b long")
    results = run_quality_checks(
        df,
        [QualityCheck(type="not_null", columns=["a"]),
         QualityCheck(type="regex", columns=["a"], pattern="^x"),
         QualityCheck(type="unique", columns=["b"])],
    )
    assert all(r.passed and r.violations == 0 for r in results)


def test_quality_checks_duplicate_names_disambiguated(spark):
    """Two not_null checks on the same column must not collide in stack()."""
    from universal_aws_data_pipeline_spark.config.model import QualityCheck
    from universal_aws_data_pipeline_spark.operators.quality import run_quality_checks

    df = spark.createDataFrame([("x",), (None,)], "a string")
    results = run_quality_checks(
        df, [QualityCheck(type="not_null", columns=["a"]), QualityCheck(type="not_null", columns=["a"])]
    )
    assert [r.check for r in results] == ["not_null(a)", "not_null(a)#2"]
    assert all(r.violations == 1 for r in results)
