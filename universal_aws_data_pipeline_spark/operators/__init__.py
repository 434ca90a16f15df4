from universal_aws_data_pipeline_spark.operators.dedup import (  # noqa: F401
    exact_dedup,
    excise_viral_spans,
    incremental_neardup_filter,
    lsh_candidate_pairs,
    minhash_signatures,
    neardup_pairs_jaccard,
    remove_duplicated_spans,
    simhash32,
)
from universal_aws_data_pipeline_spark.operators.multimodal import (  # noqa: F401
    attach_binary_payload,
    decode_image_features,
)
from universal_aws_data_pipeline_spark.operators.linkage import (  # noqa: F401
    blocked_edit_distance_match,
)
from universal_aws_data_pipeline_spark.operators.quality import (  # noqa: F401
    enforce_quality_checks,
    quality_check_df,
    run_quality_checks,
)
from universal_aws_data_pipeline_spark.operators.similarity import (  # noqa: F401
    cosine_pairs_blocked,
    cosine_topk,
    ivf_index,
    ivf_topk,
    lsh_topk,
)
from universal_aws_data_pipeline_spark.operators.retrieval import bm25_topk  # noqa: F401
from universal_aws_data_pipeline_spark.operators.skew import (  # noqa: F401
    colocated_join,
    salted_join,
    write_bucketed,
)
from universal_aws_data_pipeline_spark.operators.text import (  # noqa: F401
    lang_id,
    profile_documents,
    quality_score,
    token_count,
)
from universal_aws_data_pipeline_spark.operators.transform import transform_chain  # noqa: F401
from universal_aws_data_pipeline_spark.operators.classifier import (  # noqa: F401
    linear_probe_score,
    linear_probe_train,
    quality_filter_stream_fn,
    selection_curve,
)
