from __future__ import annotations

import hashlib

import pytest

from batch_processing_etl_orchestration_spark.multimodal import (
    attach_binary_payload,
    decode_media,
    extract_features,
)
from batch_processing_etl_orchestration_spark.multimodal.binary import FEAT_DIM
from pyspark.sql import functions as F


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


def test_decode_media_wav_round_trip(spark):
    """A hand-built PCM16 WAV must decode back to its exact samples'
    stats — the decoder parses the RIFF container, not the formula."""
    import io
    import struct
    import wave

    samples = [-32768, -1, 0, 1, 32767, 1234]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    df = spark.createDataFrame([(7, buf.getvalue())], "doc_id LONG, payload BINARY")
    row = decode_media(df).collect()[0]
    assert (row["media_kind"], row["n_channels"], row["sample_rate"]) == ("wav", 1, 8000)
    assert row["n_samples"] == len(samples)
    assert row["amp_sum"] == sum(samples)
    assert (row["amp_min"], row["amp_max"]) == (min(samples), max(samples))
    assert row["width"] is None and row["height"] is None


def test_decode_media_ppm_with_comment(spark):
    """P6 parser must handle header comments and multi-digit dims."""
    body = bytes(range(3 * 12 * 2))
    raw = b"P6\n# a comment line\n12 2\n255\n" + body
    df = spark.createDataFrame([(3, raw)], "doc_id LONG, payload BINARY")
    row = decode_media(df).collect()[0]
    assert (row["media_kind"], row["n_channels"]) == ("ppm", 3)
    assert (row["width"], row["height"], row["n_samples"]) == (12, 2, 24)
    assert row["amp_sum"] == sum(body)
    assert (row["amp_min"], row["amp_max"]) == (0, len(body) - 1)
    assert row["sample_rate"] is None


def test_decode_media_rejects_unknown_magic(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import PythonException

    df = spark.createDataFrame([(1, b"GIF89a....")], "doc_id LONG, payload BINARY")
    with pytest.raises((PythonException, Py4JJavaError)):
        decode_media(df).collect()


def test_synthesize_media_builds_real_containers(spark):
    """Even ids → RIFF WAV, odd ids → P6 PPM; payloads must carry the
    genuine container magic bytes (decode dispatches on them)."""
    from batch_processing_etl_orchestration_spark.multimodal.binary import (
        synthesize_media,
    )

    df = spark.createDataFrame([(0,), (1,)], "doc_id LONG")
    payloads = {r["doc_id"]: bytes(r["payload"]) for r in synthesize_media(df).collect()}
    assert payloads[0][:4] == b"RIFF" and payloads[0][8:12] == b"WAVE"
    assert payloads[1][:2] == b"P6"


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


def test_decode_media_rejects_wide_ppm_maxval(spark):
    """P6 with maxval > 255 stores 2 bytes/sample — must raise, not
    silently return truncated stats."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import PythonException

    body = bytes(12)  # 2x1 image at 2 bytes/sample would need 12 bytes
    raw = b"P6\n2 1\n65535\n" + body
    df = spark.createDataFrame([(9, raw)], "doc_id LONG, payload BINARY")
    with pytest.raises((PythonException, Py4JJavaError)):
        decode_media(df).collect()


def test_binaryfile_pointer_path_bit_equals_payload_path(spark, tmp_path):
    """write_media_files (executor-side) + binaryFile scan + decode
    must bit-equal the in-query synthesize→decode path: same stats,
    recovered doc_ids, real bytes on disk."""
    import os

    from batch_processing_etl_orchestration_spark.multimodal.binary import (
        read_media_binaryfile,
        synthesize_media,
        write_media_files,
    )

    docs = spark.createDataFrame([(i,) for i in range(40)], "doc_id LONG")
    media_dir = str(tmp_path / "media")
    n = write_media_files(docs, media_dir)
    assert n == 40
    files = sorted(os.listdir(media_dir))
    assert len(files) == 40
    assert files[0] == "00000000.wav" and files[1] == "00000001.ppm"

    ptr = read_media_binaryfile(spark, media_dir)
    got = {tuple(r) for r in decode_media(ptr).collect()}
    expected = {tuple(r) for r in decode_media(synthesize_media(docs)).collect()}
    assert got == expected

    # a length predicate prunes at the file listing: nothing larger
    # than the smallest file should reach Python
    raw = spark.read.format("binaryFile").load(media_dir)
    small = raw.where(F.col("length") < 100)
    assert small.count() == len([f for f in files if os.path.getsize(os.path.join(media_dir, f)) < 100])


def test_image_resize_nearest_neighbor_exact(spark):
    """Resize a 2x2 P6 image to 4x4: nearest-neighbor must replicate
    each source pixel into a 2x2 block — checked per-byte, not just
    stats."""
    import numpy as np

    from batch_processing_etl_orchestration_spark.multimodal.binary import (
        image_resize_stats,
    )

    # 2x2 RGB: pixels (r,g,b) = 10..21
    body = bytes(range(10, 22))
    raw = b"P6\n2 2\n255\n" + body
    df = spark.createDataFrame([(1, raw)], "doc_id LONG, payload BINARY")
    row = image_resize_stats(df, out_w=4, out_h=4).first()
    img = np.frombuffer(body, dtype=np.uint8).reshape(2, 2, 3)
    ys = (np.arange(4) * 2) // 4
    xs = (np.arange(4) * 2) // 4
    thumb = img[ys][:, xs, :].astype(int)
    assert row["thumb_sum"] == int(thumb.sum())
    assert row["thumb_min"] == 10 and row["thumb_max"] == 21
    # 4x4 from 2x2 doubles every pixel: sum is exactly 4x the source
    assert row["thumb_sum"] == 4 * sum(range(10, 22))
