"""Real media-codec integration tests — gated on Pillow / PyAV.

These skip cleanly in the shipped container (no image/video libraries)
and run automatically if the environment gains the packages — the same
pattern as the pika-gated AMQP broker test. The deterministic fakes in
operators/multimodal.py cover the Spark plumbing either way; these
tests cover the codec step itself.
"""

from __future__ import annotations

import io

import pytest

from pyspark.sql import functions as F


def _png_bytes(Image, width: int, height: int, color=(200, 10, 10)):
    buf = io.BytesIO()
    Image.new("RGB", (width, height), color).save(buf, format="PNG")
    return buf.getvalue()


def test_decode_media_real_png(spark):
    Image = pytest.importorskip("PIL.Image")
    from balboa_spark.operators import multimodal

    rows = [
        (0, "image", _png_bytes(Image, 32, 16), "png", 32, 16, None),
        (1, "image", b"not a png", "png", 1, 1, None),
        (2, "audio", b"\x00" * 64, "wav", None, None, 1000),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_ASSET)
    got = {r["asset_id"]: r for r in multimodal.decode_media(df).collect()}
    # a solid-color image decodes to constant features in [0, 1)
    feats = got[0]["features"]
    assert len(feats) == 8 and all(abs(f - feats[0]) < 1e-6 for f in feats)
    assert 0.0 <= feats[0] < 1.0
    # undecodable image bytes and non-image rows -> NULL features
    assert got[1]["features"] is None
    assert got[2]["features"] is None
    assert got[2]["n_bytes"] == 64


def test_resize_images_real_roundtrip(spark):
    Image = pytest.importorskip("PIL.Image")
    from balboa_spark.operators import multimodal

    rows = [
        (0, "image", _png_bytes(Image, 64, 48), "png", 64, 48, None),
        (1, "image", b"garbage", "png", 1, 1, None),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_ASSET)
    got = {
        r["asset_id"]: r
        for r in multimodal.resize_images(df, 16, 12).collect()
    }
    assert (got[0]["width"], got[0]["height"]) == (16, 12)
    img = Image.open(io.BytesIO(bytes(got[0]["payload"])))
    assert img.size == (16, 12)
    assert got[1]["payload"] is None and got[1]["width"] is None


def _mp4_bytes(av, Image, n_frames: int = 12, fps: int = 4) -> bytes:
    buf = io.BytesIO()
    container = av.open(buf, mode="w", format="mp4")
    stream = container.add_stream("mpeg4", rate=fps)
    stream.width, stream.height = 32, 32
    stream.pix_fmt = "yuv420p"
    for i in range(n_frames):
        img = Image.new("RGB", (32, 32), (i * 20 % 256, 0, 0))
        frame = av.VideoFrame.from_image(img)
        for packet in stream.encode(frame):
            container.mux(packet)
    for packet in stream.encode():
        container.mux(packet)
    container.close()
    return buf.getvalue()


def test_sample_frames_real_video(spark):
    av = pytest.importorskip("av")
    Image = pytest.importorskip("PIL.Image")
    from balboa_spark.operators import multimodal

    payload = _mp4_bytes(av, Image, n_frames=12, fps=4)  # 3 s of video
    rows = [
        (0, "video", payload, "mp4", 32, 32, 3000),
        (1, "video", b"not a video", "mp4", None, None, 1000),
        # ffmpeg's image demuxers open a PNG as a 1-frame video; the
        # media_type guard must keep image assets frame-free (the
        # fake's contract)
        (2, "image", _png_bytes(Image, 8, 8), "png", 8, 8, None),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_ASSET)
    frames = multimodal.sample_frames(df, every_ms=1000).collect()
    by_asset = {}
    for r in frames:
        by_asset.setdefault(r["asset_id"], []).append(r)
    # ~1 frame per second of a 3 s clip; monotone frame_idx/ts_ms
    got = sorted(by_asset.get(0, []), key=lambda r: r["frame_idx"])
    assert 2 <= len(got) <= 4
    assert [r["frame_idx"] for r in got] == list(range(len(got)))
    assert all(
        a["ts_ms"] < b["ts_ms"] for a, b in zip(got, got[1:])
    )
    # frames are valid PNGs at the stream size
    img = Image.open(io.BytesIO(bytes(got[0]["frame_payload"])))
    assert img.size == (32, 32)
    # undecodable payload contributes zero frames, no crash; image
    # assets are guarded out entirely
    assert 1 not in by_asset and 2 not in by_asset
