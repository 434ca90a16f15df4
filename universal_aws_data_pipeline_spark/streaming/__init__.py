from universal_aws_data_pipeline_spark.streaming.stateful import running_totals  # noqa: F401
from universal_aws_data_pipeline_spark.streaming.ops import (  # noqa: F401
    dedup_within_watermark,
    read_stream_source,
    session_windowed_agg,
    windowed_agg,
    write_stream_sink,
)
