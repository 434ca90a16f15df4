from universal_aws_data_pipeline_spark.operators.transform import (  # noqa: F401
    add_metadata_columns,
    apply_schema_mapping,
    apply_transformations,
    derive_partition_columns,
    filter_required,
    transform_chain,
)
