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
