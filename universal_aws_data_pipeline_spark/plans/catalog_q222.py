"""Catalog chunk: q222 (round-10 continuation, tokenizer capstone).

q218 learns the merges; q222 answers the question the training exists
for: what does each merge BUY on the corpus? Five greedy rounds with the
post-merge corpus symbol total and its compression ratio against the
round-0 character baseline — the curve a tokenizer team reads to decide
how many merges are worth training.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from universal_aws_data_pipeline_spark.plans._shared import _t, register
from universal_aws_data_pipeline_spark.plans.catalog_q217_q219 import _bpe_oracle

# --------------------------------------------------------------------------
# q222 — BPE compression curve (tokenizer family). Same engine as q218
# (`bpe_learn_merges`, corpus_stats=True): each round adds ONE extra
# |vocab|-sized aggregate (Σ count·|segmentation|) against the round-0
# character baseline. Five rounds instead of three — the curve's shape
# (diminishing returns per merge) is the payload. All post-scan work
# stays vocabulary-bounded; the corpus is scanned exactly once.
# Oracle: the q218 chained-CTE twin extended with per-round corpus-symbol
# CTEs and the baseline; compression follows the round(4) contract.
# --------------------------------------------------------------------------

_CURVE_ROUNDS = 5


@register(
    "q222_bpe_compression_curve",
    _bpe_oracle(_CURVE_ROUNDS, corpus_stats=True),
    "BPE compression curve: five greedy merge rounds with each round's post-merge corpus symbol total and compression ratio vs the character baseline - the diminishing-returns curve that decides how many merges are worth training (tokenizer family)",
)
def q222(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much does each BPE merge compress the corpus? The q218
    training loop with per-round corpus accounting: symbol totals fall
    as merges land, and the ratio against the character baseline shows
    the diminishing return per merge.
    operators/tokenizer.py::bpe_learn_merges(corpus_stats=True)."""
    from universal_aws_data_pipeline_spark.operators.tokenizer import bpe_learn_merges

    d = _t(spark, sf_dir, "documents")
    return bpe_learn_merges(d, rounds=_CURVE_ROUNDS, text_col="text", corpus_stats=True)
