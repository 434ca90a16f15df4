from universal_aws_data_pipeline_spark.plans.catalog import QUERIES, QuerySpec  # noqa: F401
