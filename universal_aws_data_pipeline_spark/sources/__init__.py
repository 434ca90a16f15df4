from universal_aws_data_pipeline_spark.sources.files import read_source  # noqa: F401
