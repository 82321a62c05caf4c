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
