from universal_aws_data_pipeline_spark.functions.vector import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
)
from universal_aws_data_pipeline_spark.functions.texthash import (  # noqa: F401
    md5_fingerprint,
    normalize_text,
    tokens_col,
    word_shingles,
)
