"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery (schemas, Arrow-batched mapInPandas transforms,
partition sizing) is real and tested everywhere. The codec step itself
is IMPORT-GATED: ``decode_media``/``resize_images`` run real Pillow
decodes and ``sample_frames`` real PyAV demuxing when those libraries
are installed, and raise ``NotImplementedError`` fast where they are
not (this container has neither) — ``fake_decode_media`` /
``fake_sample_frames`` are the deterministic stand-ins that exercise
the identical batch shapes and schema contracts without codecs, and
test_media_codecs.py holds the gated integration tests that activate
when the libraries appear.

Design for 100 TB:
- media bytes travel in their own column so column pruning keeps them
  out of every query that doesn't touch them (Parquet reads are
  per-column);
- decode/feature steps are mapInPandas (Arrow batches, zero-copy into
  pandas), sized by ``spark.sql.execution.arrow.maxRecordsPerBatch``;
- outputs are plain typed columns (width/height/format/features), so
  everything downstream is ordinary SQL again.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical media-asset schema: opaque payload + typed metadata.
MEDIA_ASSET = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), False),
        StructField("format", StringType(), True),  # e.g. png, wav, mp4
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("features", ArrayType(FloatType()), True),
    ]
)


def decode_media(df: DataFrame, feature_dim: int = 8) -> DataFrame:
    """Real image decode via PIL (import-gated: raises
    NotImplementedError where Pillow is absent, so environments
    without codecs fail fast instead of at the first batch). Same
    mapInPandas contract as ``fake_decode_media``: features for image
    rows are the grayscale thumbnail scaled to [0,1); non-image or
    undecodable payloads yield NULL features, never a crashed task."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "media codecs not installed (pip install Pillow); use "
            "fake_decode_media for the deterministic test path — the "
            "Spark plumbing is the same"
        ) from e

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        from PIL import Image

        for pdf in it:
            feats = []
            for mt, payload in zip(pdf["media_type"], pdf["payload"]):
                raw = bytes(payload)
                if mt != "image" or not raw:
                    feats.append(None)
                    continue
                try:
                    img = (
                        Image.open(io.BytesIO(raw))
                        .convert("L")
                        .resize((feature_dim, 1))
                    )
                    feats.append([p / 256.0 for p in img.getdata()])
                except Exception:  # undecodable bytes -> NULL, not a crash
                    feats.append(None)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(lambda b: len(bytes(b))),
                    "features": feats,
                }
            )

    return df.mapInPandas(batches, DECODED_SCHEMA)


def fake_decode_media(df: DataFrame, feature_dim: int = 8) -> DataFrame:
    """Deterministic decode stand-in: features[i] = byte (i*stride) of
    the payload scaled to [0,1). Exercises the exact batch shape a real
    decoder uses (Arrow in, pandas per-batch, Arrow out)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for payload in pdf["payload"]:
                raw = bytes(payload)
                if len(raw) == 0:
                    feats.append(None)
                    continue
                stride = max(1, len(raw) // feature_dim)
                feats.append(
                    [float(raw[min(i * stride, len(raw) - 1)]) / 256.0 for i in range(feature_dim)]
                )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(lambda b: len(bytes(b))),
                    "features": feats,
                }
            )

    return df.mapInPandas(batches, DECODED_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("format", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Real image resize via PIL (import-gated like
    :func:`decode_media`): re-encodes each image payload as PNG at the
    target size. Undecodable payloads yield a NULL payload row (same
    crash-isolation contract as decode)."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image codecs not installed in this container "
            "(pip install Pillow)"
        ) from e

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        from PIL import Image

        for pdf in it:
            out = {"asset_id": [], "payload": [], "format": [],
                   "width": [], "height": []}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                out["asset_id"].append(aid)
                try:
                    img = Image.open(io.BytesIO(bytes(payload)))
                    buf = io.BytesIO()
                    img.resize((width, height)).save(buf, format="PNG")
                    out["payload"].append(buf.getvalue())
                    out["format"].append("png")
                    out["width"].append(width)
                    out["height"].append(height)
                except Exception:
                    out["payload"].append(None)
                    out["format"].append(None)
                    out["width"].append(None)
                    out["height"].append(None)
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, RESIZED_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Real video frame sampling via PyAV (import-gated): explodes one
    video row into N frame rows — the first frame at or after each
    ``every_ms`` boundary, re-encoded as PNG — inside mapInPandas
    (output batches larger than input, Arrow both ways), frames
    inheriting the asset id for downstream joins. Undecodable
    payloads produce no frames. ``fake_sample_frames`` exercises the
    identical 1->N contract deterministically without codecs."""
    try:
        import av  # noqa: F401
        from PIL import Image  # noqa: F401 - av's to_image needs PIL
    except ImportError as e:
        raise NotImplementedError(
            "video codecs not installed in this container "
            "(pip install av Pillow)"
        ) from e

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        import av

        for pdf in it:
            out = {"asset_id": [], "frame_idx": [], "ts_ms": [],
                   "frame_payload": []}
            for aid, mt, payload in zip(
                pdf["asset_id"], pdf["media_type"], pdf["payload"]
            ):
                # only video rows: ffmpeg's image demuxers happily
                # open a PNG as a one-frame video stream, which would
                # emit spurious frames for image assets (the fake
                # emits none — contracts must match)
                if mt != "video":
                    continue
                container = None
                try:
                    container = av.open(io.BytesIO(bytes(payload)))
                    stream = container.streams.video[0]
                    tb = float(stream.time_base or 0) * 1000.0
                    next_ts, idx = 0, 0
                    for frame in container.decode(stream):
                        t_ms = int((frame.pts or 0) * tb)
                        if t_ms < next_ts:
                            continue
                        buf = io.BytesIO()
                        frame.to_image().save(buf, format="PNG")
                        out["asset_id"].append(aid)
                        out["frame_idx"].append(idx)
                        out["ts_ms"].append(t_ms)
                        out["frame_payload"].append(buf.getvalue())
                        idx += 1
                        # realign to the NEXT boundary after this
                        # frame — a bare += every_ms would emit a
                        # burst of consecutive frames after any
                        # timestamp gap (dropped frames, low-fps
                        # segment) instead of one per period
                        next_ts = (t_ms // every_ms + 1) * every_ms
                except Exception:
                    continue
                finally:
                    if container is not None:
                        container.close()
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, FRAME_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("ts_ms", LongType(), False),
        StructField("frame_payload", BinaryType(), False),
    ]
)


def fake_sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Deterministic frame-sampling stand-in: one 'frame' every
    ``every_ms`` of duration, payload = a byte slice at the frame's
    proportional offset. Exercises the real sampler's contract — a
    mapInPandas that EXPLODES one video row into N frame rows (output
    batches larger than input batches, Arrow both ways), with frames
    inheriting the asset id for downstream joins.

    Rows with NULL/zero duration produce no frames (mirrors a decoder
    skipping corrupt containers); non-video rows produce none either
    (same guard as the real sampler — ffmpeg would otherwise demux an
    image payload as a one-frame video)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"asset_id": [], "frame_idx": [], "ts_ms": [], "frame_payload": []}
            for _, row in pdf.iterrows():
                dur = row["duration_ms"]
                if row["media_type"] != "video":
                    continue
                if dur is None or pd.isna(dur) or dur <= 0:
                    continue
                raw = bytes(row["payload"])
                if not raw:
                    continue
                n_frames = int(dur) // every_ms + 1
                for i in range(n_frames):
                    ts = i * every_ms
                    off = min(int(len(raw) * ts / max(int(dur), 1)), len(raw) - 1)
                    out["asset_id"].append(row["asset_id"])
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(ts)
                    out["frame_payload"].append(raw[off : off + 16])
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, FRAME_SCHEMA)


def chunk_media_time(
    df: DataFrame,
    window_ms: int = 30_000,
    stride_ms: int | None = None,
) -> DataFrame:
    """Fixed-time-window segmentation of audio/video assets — the unit
    of distribution for transcription / captioning at scale (a 3-hour
    recording becomes ~360 independent 30s work items instead of one
    straggler task). Emits (asset_id, chunk_idx, start_ms, end_ms),
    tail-covering with the same windowing convention as
    corpus.chunk_tokens; ``stride_ms`` < ``window_ms`` overlaps chunks
    (ASR context carry-over). Pure metadata math — explode(sequence)
    in codegen; the payload column is untouched (column pruning keeps
    the bytes unread) until a codec worker slices each chunk's range.
    NULL/zero durations emit nothing (corrupt-container skip)."""
    stride = window_ms if stride_ms is None else stride_ms
    if window_ms < 1 or stride < 1:
        raise ValueError("window_ms and stride_ms must be >= 1")
    if stride > window_ms:
        # stride past the window would both leave gaps in coverage and
        # mint inverted [start > end] tail chunks
        raise ValueError("stride_ms must be <= window_ms (gapless cover)")
    n_chunks = (
        F.floor(
            (F.greatest(F.col("duration_ms") - window_ms, F.lit(0)) + (stride - 1))
            / stride
        )
        + 1
    )
    e = df.filter(F.col("duration_ms").isNotNull() & (F.col("duration_ms") > 0))
    return e.select(
        "asset_id",
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias(
            "chunk_idx"
        ),
        "duration_ms",
    ).select(
        "asset_id",
        "chunk_idx",
        (F.col("chunk_idx").cast("long") * stride).alias("start_ms"),
        F.least(
            F.col("chunk_idx").cast("long") * stride + window_ms,
            F.col("duration_ms"),
        ).alias("end_ms"),
    )


def patch_grid(df: DataFrame, patch: int = 16) -> DataFrame:
    """ViT-style patch tiling of image assets: one row per (patch_row,
    patch_col) cell of the ceil(h/P) x ceil(w/P) grid with its pixel
    bounding box (edge patches clipped). This is the plumbing half of
    patch embedding — the grid rows are what a vision encoder's Arrow
    batches iterate; the pixel decode itself stays behind the codec
    seam. Pure double explode in codegen; payload untouched. Assets
    with NULL/non-positive dimensions emit nothing."""
    if patch < 1:
        raise ValueError("patch must be >= 1")
    e = df.filter(
        F.col("width").isNotNull()
        & F.col("height").isNotNull()
        & (F.col("width") > 0)
        & (F.col("height") > 0)
    )
    n_rows = F.ceil(F.col("height") / patch).cast("int")
    n_cols = F.ceil(F.col("width") / patch).cast("int")
    return (
        e.select(
            "asset_id",
            "width",
            "height",
            F.explode(F.sequence(F.lit(0), n_rows - 1)).alias("patch_row"),
            n_cols.alias("_nc"),
        )
        .select(
            "asset_id",
            "width",
            "height",
            "patch_row",
            F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias("patch_col"),
        )
        .select(
            "asset_id",
            "patch_row",
            "patch_col",
            (F.col("patch_col") * patch).alias("x0"),
            (F.col("patch_row") * patch).alias("y0"),
            F.least(F.col("patch_col") * patch + patch, F.col("width")).alias("x1"),
            F.least(F.col("patch_row") * patch + patch, F.col("height")).alias("y1"),
        )
    )


def media_dedup_groups(df: DataFrame) -> DataFrame:
    """Exact media dedup: group identical payloads by md5 digest —
    (digest, n_assets, keep_id). Same shuffle shape as text
    exact-dedup: one groupBy on a uniform 16-byte key, skew-free; the
    payload column itself never shuffles (only its digest does), which
    is what makes this viable when payloads are megabytes."""
    return (
        df.select(F.col("asset_id"), F.md5(F.col("payload")).alias("digest"))
        .groupBy("digest")
        .agg(F.count(F.lit(1)).alias("n_assets"), F.min("asset_id").alias("keep_id"))
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Pure-SQL metadata profile (no decode): per media_type count,
    payload bytes, avg dimensions — the query a catalog runs constantly;
    must never read payload bytes more than the length (column pruning
    keeps the payload column unread when only length(payload) appears
    in a pre-computed stat; here we read it once)."""
    return df.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.round(F.avg("width"), 2).alias("avg_width"),
        F.round(F.avg("height"), 2).alias("avg_height"),
    )
