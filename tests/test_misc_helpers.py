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


def test_check_metric_thresholds_pass_fail():
    thresholds = [
        MetricThreshold(metric="record_count", threshold=10, comparison="gt"),
        MetricThreshold(metric="error_count", threshold=0, comparison="eq"),
        MetricThreshold(metric="missing_metric", threshold=1, comparison="ge"),
    ]
    results = check_metric_thresholds({"record_count": 42, "error_count": 3}, thresholds)
    by_check = {r.check: r.passed for r in results}
    assert by_check["record_count gt 10"] is True
    assert by_check["error_count eq 0"] is False
    assert by_check["missing_metric ge 1"] is False  # absent metric fails closed
