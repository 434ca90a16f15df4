"""Multimodal column plumbing (extension X5): image/audio/video as opaque
binary columns with typed metadata, processed via Arrow-batched Pandas UDFs.

The Spark-side contract is fully real and tested:
- binary payload column + metadata struct (modality, mime, width/height/...)
- ``mapInPandas`` feature extraction with explicit output schema — Arrow
  batches stream through Python without per-row pickling
- partition sizing notes: binary payloads blow past
  ``spark.sql.files.maxPartitionBytes`` quickly; at 100 TB keep payloads in
  their own table keyed by content hash, join metadata-side, and set
  ``maxRecordsPerBatch`` so Arrow batches stay under a few hundred MB.

The actual media decode (PIL/ffmpeg/torchaudio) is NOT in this container, so
``decode_image_features`` uses a deterministic byte-level fake behind the same
signature — marked loudly; swap the body for a real decoder in production.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build the multimodal column shape from the documents fixture: payload =
    utf-8 bytes of text (stand-in for image/audio bytes), metadata struct."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("image").alias("modality"),
            F.lit("application/octet-stream").alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image_features(df: DataFrame, n_features: int = 4) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas (Arrow batches).

    STUB DECODER: real image decoding libraries are not available in this
    environment. The feature vector is a deterministic byte-statistics fake
    (mean/min/max/len of the payload bytes) so the distributed plumbing —
    schema, batching, partitioning — is fully exercised and reproducible.
    Replace the body of ``_extract`` with PIL/torchvision in production.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            feats = []
            for raw in payloads:
                b = bytes(raw)
                if len(b) == 0:
                    feats.append([0.0] * n_features)
                    continue
                feats.append(
                    [
                        float(sum(b)) / len(b),  # mean byte
                        float(min(b)),
                        float(max(b)),
                        float(len(b)),
                    ][:n_features]
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": [m["modality"] for m in pdf["meta"]],
                    "n_bytes": [len(bytes(p)) for p in payloads],
                    "features": feats,
                }
            )

    return df.mapInPandas(_extract, schema=FEATURE_SCHEMA)
