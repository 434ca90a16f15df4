"""Multimodal plumbing: payload/metadata shape, feature extraction, resize,
frame sampling — all through real Arrow-batched mapInPandas."""

from __future__ import annotations

from universal_aws_data_pipeline_spark.operators.multimodal import (
    attach_binary_payload,
    decode_image_features,
    resize_images,
    sample_frames,
)


def _docs(spark):
    return spark.createDataFrame(
        [(1, "abcdefgh" * 100), (2, "z"), (3, "")],
        "doc_id LONG, text STRING",
    )


def test_attach_binary_payload_shape(spark):
    out = attach_binary_payload(_docs(spark))
    rows = {r["doc_id"]: r for r in out.collect()}
    assert bytes(rows[1]["payload"]) == b"abcdefgh" * 100
    assert rows[1]["meta"]["modality"] == "image"
    assert rows[1]["meta"]["n_bytes"] == 800
    assert rows[3]["meta"]["n_bytes"] == 0


def test_decode_image_features_deterministic(spark):
    feats = decode_image_features(attach_binary_payload(_docs(spark)))
    rows = {r["doc_id"]: r for r in feats.collect()}
    assert rows[2]["features"] == [float(ord("z"))] * 3 + [1.0]  # mean=min=max, len=1
    assert rows[3]["features"] == [0.0, 0.0, 0.0, 0.0]  # empty payload guard
    assert rows[1]["n_bytes"] == 800


def test_resize_images_shapes(spark):
    out = resize_images(attach_binary_payload(_docs(spark)), width=8, height=4)
    rows = {r["doc_id"]: r for r in out.collect()}
    for doc_id in (1, 2, 3):
        assert len(bytes(rows[doc_id]["payload"])) == 32  # always width*height
    assert rows[1]["width"] == 8 and rows[1]["height"] == 4
    # downsample keeps first byte; upsample tiles the short payload
    assert bytes(rows[1]["payload"])[0:1] == b"a"
    assert bytes(rows[2]["payload"]) == b"z" * 32


def test_sample_frames_expands_rows(spark):
    frames = sample_frames(attach_binary_payload(_docs(spark)), n_frames=4, frame_bytes=16)
    rows = frames.collect()
    assert len(rows) == 3 * 4  # one payload row -> n_frames rows
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert [r["frame_idx"] for r in sorted(by_doc[1], key=lambda r: r["frame_idx"])] == [0, 1, 2, 3]
    assert all(len(bytes(r["frame"])) <= 16 for r in rows)
    # deterministic: same input -> same frames
    again = {(r["doc_id"], r["frame_idx"]): bytes(r["frame"]) for r in frames.collect()}
    assert all(again[(r["doc_id"], r["frame_idx"])] == bytes(r["frame"]) for r in rows)
