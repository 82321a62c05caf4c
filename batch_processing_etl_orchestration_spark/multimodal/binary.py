"""Multimodal column plumbing (SURVEY §2.10): opaque binary payloads
with typed metadata, processed by Arrow-batched Pandas functions via
mapInPandas.

Design for 100 TB: payloads are BinaryType columns (or, pointer-style,
a path column + spark.read.format('binaryFile') lazily); metadata is a
typed struct so filters on size/mime/hash prune *before* any byte
touches Python. The Python boundary is Arrow batches (mapInPandas) —
never row-at-a-time UDFs.

The actual image/audio decode libraries are not in this container, so
``decode_media`` is an explicit NotImplementedError stub, while
``extract_features`` runs a deterministic byte-histogram "decoder"
that exercises the real plumbing: binary Arrow transfer, batch shapes,
fixed-dim array<double> output schema.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

FEAT_DIM = 16


def attach_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Turn a text column into an opaque binary payload + metadata
    struct — the shape an image/audio table would have: (payload
    BINARY, meta STRUCT<n_bytes, sha256, mime>)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.withColumn("payload", payload).withColumn(
        "meta",
        F.struct(
            F.octet_length(payload).alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
            F.lit("text/plain").alias("mime"),
        ),
    )


def decode_media(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """STUB — real media decode (image resize, audio resample, video
    frame-sample) requires codecs not present in this container.
    The Spark-side contract is identical to extract_features:
    mapInPandas over (id, payload) → fixed-schema feature batches."""
    raise NotImplementedError(
        "media codecs unavailable in this environment; see extract_features "
        "for the exercised mapInPandas plumbing with a deterministic decoder"
    )


def extract_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Deterministic fake 'decode': per-payload byte histogram folded
    to FEAT_DIM buckets (bucket b sums bytes ≡ b mod FEAT_DIM). Real
    Arrow-batched Python, real binary columns, real fixed-dim output —
    only the kernel is fake. Histogram sums to n_bytes, which the
    oracle verifies independently (q_multimodal_features)."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            feats = []
            for buf in pdf[payload_col]:
                arr = np.frombuffer(bytes(buf), dtype=np.uint8)
                hist = np.bincount(arr % FEAT_DIM, minlength=FEAT_DIM).astype("float64")
                feats.append(hist)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": [f.tolist() for f in feats],
                }
            )

    out_schema = f"{id_col} LONG, features ARRAY<DOUBLE>"
    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


FRAME_BYTES = 64  # fake "frame" stride over the payload
FRAME_MS = 40  # 25 fps


def sample_frames(
    df: DataFrame,
    every_k: int = 3,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Video frame-sampling plumbing: treat the payload as a stream of
    FRAME_BYTES-byte frames at 25 fps and emit every k-th frame's
    (index, timestamp, actual slice length). The byte slicing runs on
    the real binary column inside Arrow batches — only the notion that
    64 bytes == one frame is fake (no codecs in this container; a real
    deployment swaps the slicer for an av/ffmpeg call with the same
    mapInPandas signature and one-row-per-frame output shape).

    Scale: fan-out is rows × sampled-frames; frames inherit the
    input's partitioning, so a downstream per-frame feature extractor
    chains onto the same scan with no shuffle."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids, idxs, mss, sizes = [], [], [], []
            for i, buf in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(buf)
                n_frames = (len(raw) + FRAME_BYTES - 1) // FRAME_BYTES
                for fi in range(0, n_frames, every_k):
                    ids.append(i)
                    idxs.append(fi)
                    mss.append(fi * FRAME_MS)
                    sizes.append(len(raw[fi * FRAME_BYTES : (fi + 1) * FRAME_BYTES]))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_ms": pd.Series(mss, dtype="int64"),
                    "frame_n_bytes": pd.Series(sizes, dtype="int64"),
                }
            )

    out_schema = f"{id_col} LONG, frame_idx LONG, frame_ms LONG, frame_n_bytes LONG"
    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)
