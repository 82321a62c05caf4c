"""Multimodal column plumbing (SURVEY §2.10): opaque binary payloads
with typed metadata, processed by Arrow-batched Pandas functions via
mapInPandas.

Design for 100 TB: payloads are BinaryType columns (or, pointer-style,
a path column + spark.read.format('binaryFile') lazily); metadata is a
typed struct so filters on size/mime/hash prune *before* any byte
touches Python. The Python boundary is Arrow batches (mapInPandas) —
never row-at-a-time UDFs.

Third-party image/audio codecs are not in this container, so
``decode_media`` decodes the two formats the standard library can
handle end-to-end — PCM WAV (via ``wave``) and binary PPM (hand-rolled
P6 parser) — by genuinely parsing payload bytes (RIFF/P6 magic,
headers, sample frames). ``synthesize_media`` builds real payloads of
both formats from closed-form sample formulas, so a SQL oracle can
recompute the decoded stats independently (q_multimodal_decode): a
hash match proves the decode path, not just the plumbing.
``extract_features`` keeps the format-agnostic byte-histogram
featurizer for arbitrary binary columns.
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


# Deterministic synthesis formulas (mirrored by the q_multimodal_decode
# DuckDB oracle via generate_series — keep the two in lockstep):
#   even doc_id → mono 16 kHz PCM16 WAV, n = 100 + id%50 samples,
#                 sample_i = ((id·31 + i·17) mod 65536) − 32768, i=1..n
#   odd  doc_id → P6 PPM, w = 4 + id%5, h = 3 + id%4, maxval 255,
#                 byte_j = (id·7 + j·13) mod 256, j=0..3wh−1
WAV_RATE = 16000

DECODE_SCHEMA = (
    "doc_id LONG, media_kind STRING, n_channels LONG, sample_rate LONG, "
    "width LONG, height LONG, n_samples LONG, "
    "amp_sum LONG, amp_min LONG, amp_max LONG"
)


def _synth_payload(doc_id: int) -> bytes:
    import io
    import struct
    import wave

    if doc_id % 2 == 0:
        n = 100 + doc_id % 50
        samples = [((doc_id * 31 + i * 17) % 65536) - 32768 for i in range(1, n + 1)]
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(WAV_RATE)
            w.writeframes(struct.pack(f"<{n}h", *samples))
        return buf.getvalue()
    wdt, hgt = 4 + doc_id % 5, 3 + doc_id % 4
    body = bytes((doc_id * 7 + j * 13) % 256 for j in range(3 * wdt * hgt))
    return f"P6\n{wdt} {hgt}\n255\n".encode() + body


def synthesize_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a real WAV (even ids) or PPM (odd ids) payload built from
    the closed-form formulas above — actual RIFF containers and P6
    images, not fakes, so decode_media exercises true byte parsing."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload": [_synth_payload(int(i)) for i in pdf[id_col]],
                }
            )

    return df.select(id_col).mapInPandas(run, schema=f"{id_col} LONG, payload BINARY")


def _parse_ppm(raw: bytes) -> tuple[int, int, int, bytes]:
    """Binary-PPM (P6) header parser: magic, whitespace/comment-
    separated width/height/maxval, one whitespace byte, raw RGB."""
    pos = 2  # past b"P6"
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(raw) and raw[pos : pos + 1].isspace():
            pos += 1
        if raw[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(raw) and raw[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(raw) and not raw[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(raw[start:pos]))
    pos += 1  # exactly one whitespace byte before pixel data
    w, h, maxval = fields
    if maxval != 255:
        # a maxval > 255 P6 stores 2 bytes per sample — silently
        # truncated stats otherwise; only 1-byte samples are supported
        raise ValueError(f"unsupported PPM maxval {maxval} (only 255)")
    body = raw[pos : pos + 3 * w * h]
    if len(body) != 3 * w * h:
        raise ValueError(f"truncated PPM: want {3 * w * h} bytes, got {len(body)}")
    return w, h, maxval, body


def decode_media(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Decode binary media payloads with the standard library: PCM WAV
    via ``wave`` (RIFF magic) and binary PPM via a hand-rolled P6
    parser. Emits one typed stats row per payload (channels, rate,
    dimensions, amplitude sum/min/max) — the decode analog of
    extract_features, same mapInPandas Arrow-batch contract; unknown
    magics raise rather than passing silently.

    Scale: decode is per-row Python work on Arrow batches with no
    shuffle; at 100 TB the payload column (or a binaryFile path
    column) streams through executors and the tiny stats rows are all
    that ever move downstream."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io
        import struct
        import wave

        import pandas as pd

        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(buf)
                if raw[:4] == b"RIFF":
                    with wave.open(io.BytesIO(raw), "rb") as wf:
                        nch = wf.getnchannels()
                        rate = wf.getframerate()
                        nf = wf.getnframes()
                        if wf.getsampwidth() != 2:
                            raise ValueError("only PCM16 WAV supported")
                        samples = struct.unpack(
                            f"<{nf * nch}h", wf.readframes(nf)
                        )
                    rows.append(
                        (int(i), "wav", nch, rate, None, None, nf,
                         sum(samples), min(samples), max(samples))
                    )
                elif raw[:2] == b"P6":
                    w, h, _maxval, body = _parse_ppm(raw)
                    rows.append(
                        (int(i), "ppm", 3, None, w, h, w * h,
                         sum(body), min(body), max(body))
                    )
                else:
                    raise ValueError(f"unknown media magic {raw[:4]!r}")
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "media_kind", "n_channels", "sample_rate",
                    "width", "height", "n_samples",
                    "amp_sum", "amp_min", "amp_max",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=DECODE_SCHEMA)


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


AUDIO_SCHEMA = (
    "doc_id LONG, n_samples BIGINT, energy_sum BIGINT, "
    "zero_crossings BIGINT, peak BIGINT"
)


def audio_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Audio feature extraction over decoded PCM16 WAV payloads: total
    energy (sum of squared samples), zero-crossing count (adjacent
    sign flips, zero counted as non-negative), and peak amplitude —
    the front half of any audio quality/VAD filter. Integer-exact by
    construction (Python bigints in the kernel, BIGINT out), so a SQL
    oracle can reproduce every value; derived floats (RMS) are left to
    the caller's engine. Non-WAV payloads are skipped, same batch
    contract as decode_media."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io
        import struct
        import wave

        import pandas as pd

        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(buf)
                if raw[:4] != b"RIFF":
                    continue
                with wave.open(io.BytesIO(raw), "rb") as wf:
                    nf = wf.getnframes()
                    samples = struct.unpack(
                        f"<{nf * wf.getnchannels()}h", wf.readframes(nf)
                    )
                energy = sum(x * x for x in samples)
                zc = sum(
                    1
                    for a, b in zip(samples, samples[1:])
                    if (a >= 0) != (b >= 0)
                )
                rows.append(
                    (int(i), len(samples), energy, zc, max(abs(x) for x in samples))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "n_samples", "energy_sum", "zero_crossings", "peak",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=AUDIO_SCHEMA)


IMAGE_SCHEMA = (
    "doc_id LONG, width BIGINT, height BIGINT, channel BIGINT, "
    "ch_sum BIGINT, ch_min BIGINT, ch_max BIGINT"
)


def image_channel_stats(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Per-channel image statistics over binary-PPM payloads: one row
    per (image, RGB channel) with integer sum/min/max of that
    channel's bytes — the normalization-constant pass (channel means)
    an image training pipeline computes corpus-wide. Integer-exact,
    same skip-non-matching-magic batch contract as audio_features."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(buf)
                if raw[:2] != b"P6":
                    continue
                w, h, _maxval, body = _parse_ppm(raw)
                for ch in range(3):
                    vals = body[ch::3]
                    rows.append(
                        (int(i), w, h, ch, sum(vals), min(vals), max(vals))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "width", "height", "channel",
                    "ch_sum", "ch_min", "ch_max",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=IMAGE_SCHEMA)


# ---------------------------------------------------------------------------
# Pointer-style media: payloads live as FILES; Spark carries only paths
# until decode. This is the 100 TB posture the payload-column functions
# above simulate — media bytes never enter a shuffle, the scan is
# spark.read.format("binaryFile"), and metadata predicates (path glob,
# length) prune before any byte reaches Python.
# ---------------------------------------------------------------------------


def write_media_files(docs: DataFrame, out_dir: str, id_col: str = "doc_id") -> int:
    """Materialize each doc's synthesized payload as an individual
    media file ``{doc_id:08d}.wav|.ppm`` under ``out_dir`` — written
    EXECUTOR-side (mapInPandas), the way a 1000-executor ingest would
    land object-store media, not a driver loop. Returns files written.
    Idempotent: same formulas, same bytes, same names."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            written = []
            for i in pdf[id_col]:
                did = int(i)
                raw = _synth_payload(did)
                ext = "wav" if did % 2 == 0 else "ppm"
                path = os.path.join(out_dir, f"{did:08d}.{ext}")
                tmp = f"{path}.tmp{os.getpid()}"
                with open(tmp, "wb") as f:
                    f.write(raw)
                os.replace(tmp, path)  # atomic publish, safe on rerun
                written.append((did, path, len(raw)))
            yield pd.DataFrame(written, columns=[id_col, "path", "n_bytes"])

    out = docs.select(id_col).mapInPandas(
        run, schema=f"{id_col} LONG, path STRING, n_bytes LONG"
    )
    return out.count()


def read_media_binaryfile(spark, media_dir: str, id_col: str = "doc_id") -> DataFrame:
    """Lazy pointer-path scan: ``binaryFile`` yields (path,
    modificationTime, length, content) with one split per file and
    pushes path-glob/length predicates into the file listing. The
    doc id is recovered from the file name; content feeds the same
    decode_media kernel as the payload-column path, so both paths are
    bit-comparable."""
    df = spark.read.format("binaryFile").load(media_dir)
    return df.select(
        F.regexp_extract(
            F.element_at(F.split(F.col("path"), "/"), -1), r"^(\d+)\.", 1
        )
        .cast("long")
        .alias(id_col),
        F.col("content").alias("payload"),
        F.col("length").alias("n_bytes"),
    )


RESIZE_SCHEMA = (
    "doc_id LONG, out_w LONG, out_h LONG, "
    "thumb_sum LONG, thumb_min LONG, thumb_max LONG"
)


def image_resize_stats(
    df: DataFrame,
    out_w: int = 8,
    out_h: int = 8,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Nearest-neighbor image resize — the real kernel, not a stub:
    decode the P6 payload, index the RGB grid at
    src = floor(dst · src_dim / dst_dim) per axis (one vectorized
    numpy gather per image), and emit thumbnail channel stats. The
    mapping is closed-form, so a SQL oracle can recompute the exact
    thumbnail bytes from the generating formula — resize correctness
    is hash-checked, not eyeballed.

    Same Arrow mapInPandas contract as decode_media: per-row Python
    work, no shuffle, only the tiny stats rows move downstream. A
    production path swaps the gather for cv2/PIL interpolation behind
    the identical (payload in, stats/bytes out) signature."""
    import numpy as np

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(buf)
                if raw[:2] != b"P6":
                    raise ValueError(f"not a P6 PPM: magic {raw[:2]!r}")
                w, h, _maxval, body = _parse_ppm(raw)
                img = np.frombuffer(body, dtype=np.uint8).reshape(h, w, 3)
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                thumb = img[ys][:, xs, :].astype(np.int64)
                rows.append(
                    (int(i), out_w, out_h,
                     int(thumb.sum()), int(thumb.min()), int(thumb.max()))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "out_w", "out_h",
                    "thumb_sum", "thumb_min", "thumb_max",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=RESIZE_SCHEMA)


AHASH_SCHEMA = "doc_id BIGINT, width INT, height INT, ahash BIGINT"


def image_ahash(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Perceptual average-hash per image: integer grayscale per pixel
    ((r+g+b)//3), one bit per pixel (gray·n ≥ Σgray — the mean
    compare cross-multiplied so no float ever appears), packed
    little-endian into a ≤48-bit integer (fixture images are ≤8×6).
    Two visually-similar images differ in few bits; Hamming distance
    over these fingerprints is the image twin of SimHash over text.
    Integer-exact end to end, so an SQL oracle can regenerate every
    fingerprint from the synthesis formula."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(buf)
                if raw[:2] != b"P6":
                    continue
                w, h, _maxval, body = _parse_ppm(raw)
                n = w * h
                grays = [
                    (body[3 * p] + body[3 * p + 1] + body[3 * p + 2]) // 3
                    for p in range(n)
                ]
                total = sum(grays)
                fp = 0
                for p, g in enumerate(grays):
                    if g * n >= total:
                        fp |= 1 << p
                rows.append((int(i), w, h, fp))
            yield pd.DataFrame(
                rows, columns=[id_col, "width", "height", "ahash"]
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=AHASH_SCHEMA)


AFP_SCHEMA = "doc_id BIGINT, n_samples INT, afp BIGINT"


def audio_fingerprint(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Acoustic fingerprint per WAV payload, chromaprint's shape in
    miniature: samples split into 16 equal-index blocks, block energy
    = Σ|sample| (integer), one bit per ADJACENT-BLOCK comparison
    (energy_b ≥ energy_{b+1}) → a 15-bit envelope fingerprint robust
    to uniform gain. Parses the real RIFF container (wave module) —
    the honest-decode contract of the other payload functions —
    and every quantity is integer, so an SQL oracle regenerates the
    fingerprints from the synthesis formula."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import io
        import struct
        import wave as wave_mod

        import pandas as pd

        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(buf)
                if raw[:4] != b"RIFF":
                    continue
                with wave_mod.open(io.BytesIO(raw), "rb") as w:
                    n = w.getnframes()
                    samples = struct.unpack(f"<{n}h", w.readframes(n))
                energy = [0] * 16
                for p, s in enumerate(samples):
                    energy[p * 16 // n] += abs(s)
                fp = 0
                for b in range(15):
                    if energy[b] >= energy[b + 1]:
                        fp |= 1 << b
                rows.append((int(i), n, fp))
            yield pd.DataFrame(rows, columns=[id_col, "n_samples", "afp"])

    return df.select(id_col, payload_col).mapInPandas(run, schema=AFP_SCHEMA)
