from __future__ import annotations

import hashlib

import pytest

from batch_processing_etl_orchestration_spark.multimodal import (
    attach_binary_payload,
    decode_media,
    extract_features,
)
from batch_processing_etl_orchestration_spark.multimodal.binary import FEAT_DIM


def test_payload_and_metadata(spark):
    docs = spark.createDataFrame([(1, "hello world")], "doc_id LONG, text STRING")
    row = attach_binary_payload(docs).collect()[0]
    assert bytes(row["payload"]) == b"hello world"
    assert row["meta"]["n_bytes"] == 11
    assert row["meta"]["sha256"] == hashlib.sha256(b"hello world").hexdigest()


def test_feature_extraction_batch_shape(spark):
    docs = spark.createDataFrame(
        [(i, "word " * (i + 1)) for i in range(5)], "doc_id LONG, text STRING"
    )
    feats = extract_features(attach_binary_payload(docs)).collect()
    assert len(feats) == 5
    for r in feats:
        assert len(r["features"]) == FEAT_DIM
        # histogram sums to payload byte count
        assert sum(r["features"]) == 5 * (r["doc_id"] + 1)


def test_decode_media_is_explicit_stub(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id LONG, text STRING")
    with pytest.raises(NotImplementedError):
        decode_media(attach_binary_payload(docs))


def test_sample_frames_geometry(spark):
    from batch_processing_etl_orchestration_spark.multimodal.binary import (
        FRAME_BYTES,
        sample_frames,
    )

    # 1 byte (sub-frame), exactly 1 frame, 1 frame + 1 byte, 10 frames
    docs = spark.createDataFrame(
        [
            (1, "x"),
            (2, "a" * FRAME_BYTES),
            (3, "b" * (FRAME_BYTES + 1)),
            (4, "c" * (10 * FRAME_BYTES)),
        ],
        "doc_id LONG, text STRING",
    )
    rows = sample_frames(attach_binary_payload(docs), every_k=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert [r["frame_idx"] for r in sorted(by_doc[1], key=lambda r: r["frame_idx"])] == [0]
    assert by_doc[1][0]["frame_n_bytes"] == 1
    assert [r["frame_idx"] for r in sorted(by_doc[2], key=lambda r: r["frame_idx"])] == [0]
    assert by_doc[2][0]["frame_n_bytes"] == FRAME_BYTES
    f3 = sorted(by_doc[3], key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in f3] == [0]  # frame 1 exists but isn't sampled (k=3)
    f4 = sorted(by_doc[4], key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in f4] == [0, 3, 6, 9]
    assert all(r["frame_n_bytes"] == FRAME_BYTES for r in f4)
    assert all(r["frame_ms"] == r["frame_idx"] * 40 for r in rows)
