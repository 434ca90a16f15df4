"""Round-6 regression tests for the round-5 ADVICE findings plus the
operators added this round."""

from __future__ import annotations

import pytest


# ---------------------------------------------------------------------------
# ADVICE: boolean_search terms must go through the same normalization as
# document tokens (punctuation/casing used to make a term silently unmatchable)
# ---------------------------------------------------------------------------
def test_boolean_search_term_normalization(spark):
    from universal_aws_data_pipeline_spark.operators.retrieval import boolean_search

    df = spark.createDataFrame(
        [(1, "The state-store commit protocol"), (2, "nothing relevant")],
        "doc_id: long, text: string",
    )
    # tokens_col normalizes "state-store" -> "state store"; a quoted or
    # punctuated single-token term must still match after normalization
    got = {r["doc_id"] for r in boolean_search(df, ["'Commit'", "PROTOCOL!"]).collect()}
    assert got == {1}
    # a phrase (multi-token after normalization) is set-membership-ambiguous
    with pytest.raises(ValueError, match="3 tokens"):
        boolean_search(df, ["state-store commit"])
    # a term that normalizes away entirely can never match
    with pytest.raises(ValueError, match="0 tokens"):
        boolean_search(df, ["!!!"])


def test_boolean_search_python_normalizer_matches_spark(spark):
    """Parity pin for the Python mirror of texthash.normalize_text used on
    the term list: both normalizers must agree on adversarial inputs."""
    import re

    from pyspark.sql import functions as F

    from universal_aws_data_pipeline_spark.functions.texthash import normalize_text

    samples = [
        "Mixed-CASE", "tabs\tand\nnewlines", "düsseldorf", "a--b", "x9",
        "trailing!  ", "  .lead", "UPPER_lower-42", "no1şé2no",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "raw: string")
    spark_side = [
        r["n"] for r in df.select(normalize_text(F.col("raw")).alias("n")).collect()
    ]
    py_side = [re.sub(r"[^a-z0-9]+", " ", s.lower()).strip() for s in samples]
    assert spark_side == py_side


# ---------------------------------------------------------------------------
# ADVICE: chunk_documents stride validation (stride=0 used to null the DIV
# and silently drop every long document)
# ---------------------------------------------------------------------------
def test_chunk_documents_rejects_bad_stride(spark):
    from universal_aws_data_pipeline_spark.operators.text import chunk_documents

    df = spark.createDataFrame([(1, "a b c")], "doc_id: long, text: string")
    for bad in (0, -3, 65):
        with pytest.raises(ValueError, match="stride"):
            chunk_documents(df, chunk_tokens=64, stride=bad)
    with pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents(df, chunk_tokens=0, stride=1)
    # boundary: stride == chunk_tokens is the non-overlapping tiling
    got = sorted(
        (r["chunk_idx"], r["n_tokens"])
        for r in chunk_documents(df, chunk_tokens=2, stride=2).collect()
    )
    assert got == [(0, 2), (1, 1)]


# ---------------------------------------------------------------------------
# ADVICE: mixture_plan must surface weighted sources with zero corpus rows
# (typo'd names / empty domains used to vanish from the plan)
# ---------------------------------------------------------------------------
def test_mixture_plan_emits_zero_row_sources(spark):
    from universal_aws_data_pipeline_spark.operators.sampling import mixture_plan

    df = spark.createDataFrame(
        [("a", 100)] * 5 + [("b", 100)] * 50,
        "source: string, n_tokens: long",
    )
    got = {
        r["source"]: r
        for r in mixture_plan(df, {"a": 0.4, "b": 0.4, "web_typo": 0.2}, 2000).collect()
    }
    assert set(got) == {"a", "b", "web_typo"}
    missing = got["web_typo"]
    assert missing["n_docs"] == 0 and missing["n_tokens"] == 0
    assert missing["target_tokens"] == 400  # its budget share stays visible
    assert missing["rate"] == 1.0 and missing["expected_tokens"] == 0
    # present sources unchanged by the join rewrite
    assert got["a"]["rate"] == 1.0 and got["a"]["expected_tokens"] == 500
    assert got["b"]["rate"] == pytest.approx(0.16) and got["b"]["expected_tokens"] == 800

    with pytest.raises(ValueError, match="non-empty"):
        mixture_plan(df, {}, 1000)


# ---------------------------------------------------------------------------
# ADVICE: _split_mjpeg must not terminate a frame on an EOI embedded inside
# an APPn payload (EXIF thumbnails are whole JPEGs)
# ---------------------------------------------------------------------------
def _jpeg_with_exif_thumbnail(fill: bytes) -> bytes:
    thumb = b"\xff\xd8" + b"\x11" * 6 + b"\xff\xd9"  # embedded JPEG w/ own EOI
    app1_payload = b"Exif\x00\x00" + thumb
    app1 = b"\xff\xe1" + (len(app1_payload) + 2).to_bytes(2, "big") + app1_payload
    # SOS header (length 2) then entropy-ish data with FF00 stuffing
    sos = b"\xff\xda\x00\x02" + fill.replace(b"\xff", b"\xff\x00")
    return b"\xff\xd8" + app1 + sos + b"\xff\xd9"


def test_split_mjpeg_skips_appn_embedded_eoi():
    from universal_aws_data_pipeline_spark.operators.multimodal import _split_mjpeg

    f1 = _jpeg_with_exif_thumbnail(b"abc\xffdef")
    f2 = _jpeg_with_exif_thumbnail(b"xyz")
    frames = _split_mjpeg(f1 + f2)
    # naive FFD9 scan would cut frame 1 at the thumbnail's EOI
    assert frames == [f1, f2]


def test_split_mjpeg_drops_truncated_tail():
    from universal_aws_data_pipeline_spark.operators.multimodal import _split_mjpeg

    whole = b"\xff\xd8" + b"ok" + b"\xff\xd9"
    truncated = b"\xff\xd8" + b"no eoi here"
    assert _split_mjpeg(whole + truncated) == [whole]


def test_split_mjpeg_plain_concatenation_still_splits():
    from universal_aws_data_pipeline_spark.operators.multimodal import _split_mjpeg

    frames = [b"\xff\xd8" + bytes([i]) * (4 + i) + b"\xff\xd9" for i in range(3)]
    assert _split_mjpeg(b"".join(frames)) == frames
