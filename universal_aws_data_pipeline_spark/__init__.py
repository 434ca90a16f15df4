"""universal_aws_data_pipeline_spark — a PySpark-native analytics/ETL engine.

A brand-new engine with the query and data-processing capabilities of the
reference repo ``nishant21n/universal-aws-data-pipeline`` (a config-driven
AWS Glue/Lambda ETL scaffold), re-expressed Spark-first:

- declarative config-driven transform chains (schema mapping, casts, cleanup,
  required-field filtering, metadata, partition derivation) — parity with
  the reference's Glue job (``src/glue/transformation/transform_data.py``)
- sources: files (json/csv/parquet), REST APIs with 3 pagination modes,
  email attachments, streams (Structured Streaming)
- sinks: partitioned parquet, warehouse-style managed tables with atomic
  staging swap, distkey/sortkey layout
- data-quality engine (not_null / unique / regex / metric thresholds)
- LLM-data-pipeline extensions: exact & near-duplicate dedup (MinHash-LSH,
  SimHash, n-gram Jaccard), embedding similarity search, text analysis,
  multimodal column plumbing

Everything is declarative DataFrame/SQL so Catalyst/Tungsten/AQE do the
physical planning; designed for 100 TB-scale clusters, tested on local mode.
"""

__version__ = "0.1.0"

from universal_aws_data_pipeline_spark.session import get_spark  # noqa: F401
