from universal_aws_data_pipeline_spark.config.model import (  # noqa: F401
    DestinationConfig,
    QualityCheck,
    SchemaConfig,
    SourceConfig,
    TransformationSpec,
    load_source_config,
    resolve_templates,
)
