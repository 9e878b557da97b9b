from __future__ import annotations

import hashlib

import pytest

from movie_data_pipeline_spark.multimodal import (
    blob_features,
    decode_image,
    make_blob_table,
    sample_frames,
)


@pytest.fixture(scope="module")
def blobs(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "aaaa")], "doc_id LONG, text STRING"
    )
    return make_blob_table(docs)


def test_blob_table_schema_and_bytes(blobs):
    rows = {r.blob_id: r for r in blobs.collect()}
    assert bytes(rows[1].content) == b"hello world"
    assert rows[1].n_bytes == 11 and rows[2].n_bytes == 0
    assert rows[1].modality == "text"


def test_blob_features_deterministic(blobs):
    feats = {r.blob_id: r for r in blob_features(blobs).collect()}
    assert feats[1].digest == hashlib.md5(b"hello world").hexdigest()
    assert feats[3].byte_mean == float(ord("a"))
    assert feats[3].byte_entropy == 0.0  # single symbol → zero entropy
    assert feats[2].n_bytes == 0 and feats[2].byte_mean == 0.0
    assert feats[1].byte_entropy > 2.0  # varied symbols


def test_stubs_raise_with_integration_pointer(blobs):
    with pytest.raises(NotImplementedError, match="mapInPandas"):
        decode_image(blobs)
    with pytest.raises(NotImplementedError, match="frame sampler"):
        sample_frames(blobs)


def _fake_decoder(payload: bytes, target_size):
    """Deterministic stand-in for an image codec: bytes → fixed-size
    grayscale 'pixels' by tiling the payload, normalized to [0,1]."""
    h, w = 4, 4  # tiny fixed target for tests
    n = h * w
    src = payload if payload else b"\x00"
    tiled = (src * (n // len(src) + 1))[:n]
    return h, w, [b / 255.0 for b in tiled]


def _fake_sampler(payload: bytes, every_n_seconds: float):
    """Deterministic stand-in for a frame sampler: one 'frame' per
    4-byte chunk, timestamped every_n_seconds apart."""
    for i in range(0, len(payload), 4):
        yield i // 4, (i // 4) * every_n_seconds, payload[i : i + 4]


def test_decode_image_plumbing_with_injected_codec(blobs):
    out = {r.blob_id: r for r in decode_image(blobs, decoder=_fake_decoder).collect()}
    assert set(out) == {1, 2, 3}
    r = out[1]
    assert (r.height, r.width) == (4, 4)
    assert len(r.pixels) == 16
    # first pixel of blob 1 is 'h' / 255 (float32 round-trip tolerance)
    assert abs(r.pixels[0] - ord("h") / 255.0) < 1e-6
    # empty payload still decodes to the full target raster
    assert len(out[2].pixels) == 16 and out[2].pixels[0] == 0.0


def test_sample_frames_plumbing_with_injected_sampler(blobs):
    rows = sample_frames(blobs, every_n_seconds=0.5, sampler=_fake_sampler).collect()
    by_blob = {}
    for r in rows:
        by_blob.setdefault(r.blob_id, []).append(r)
    # 11-byte payload → 3 frames; empty → 0; 4-byte → 1
    assert len(by_blob[1]) == 3 and len(by_blob[3]) == 1 and 2 not in by_blob
    f = sorted(by_blob[1], key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in f] == [0, 1, 2]
    assert [r.frame_ts for r in f] == [0.0, 0.5, 1.0]
    assert bytes(f[0].frame) == b"hell"


def _png(w, h):
    return (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big") + b"IHDR"
        + w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + b"\x08\x02\x00\x00\x00" + b"\x00" * 4
    )


def _gif(w, h):
    return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00" * 6


def _bmp(w, h):
    # BITMAPINFOHEADER: DIB size (40) at offset 14, dims at 18/22
    return (
        b"BM" + b"\x00" * 12
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + b"\x00" * 10
    )


def _jpeg(w, h):
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
        + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + b"\x03" + b"\x00" * 9
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def test_image_dimensions_all_formats(spark):
    """Real header parsing with zero image libraries: PNG/GIF/BMP via
    JVM hex-slice expressions, JPEG via the pure-stdlib SOF walk; junk
    stays null."""
    from movie_data_pipeline_spark.multimodal import image_dimensions

    rows = [
        (1, _png(640, 480)),
        (2, _gif(320, 200)),
        (3, _bmp(1024, 768)),
        (4, _bmp(800, -600)),  # top-down DIB: negative stored height
        (5, _jpeg(1920, 1080)),
        (6, b"not an image at all"),
    ]
    blobs = spark.createDataFrame(rows, "blob_id LONG, content BINARY")
    got = {
        r.blob_id: (r.img_format, r.width, r.height)
        for r in image_dimensions(blobs).collect()
    }
    assert got == {
        1: ("png", 640, 480),
        2: ("gif", 320, 200),
        3: ("bmp", 1024, 768),
        4: ("bmp", 800, 600),
        5: ("jpeg", 1920, 1080),
        6: (None, None, None),
    }


def test_image_header_expr_is_jvm_only(spark):
    """The fixed-offset path must stay inside codegen — no Python
    worker stage (BatchEvalPython/MapInPandas) in its plan."""
    from movie_data_pipeline_spark.multimodal import image_header_expr
    from pyspark.sql import functions as F

    blobs = spark.createDataFrame(
        [(1, _png(8, 9))], "blob_id LONG, content BINARY"
    )
    df = blobs.select("blob_id", image_header_expr(F.col("content")).alias("h"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    r = df.collect()[0]
    assert (r.h.img_format, r.h.width, r.h.height) == ("png", 8, 9)


def _wav(channels, rate, bits, data_bytes):
    import struct as _s

    body = b"\x00" * data_bytes
    fmt = _s.pack("<HHIIHH", 1, channels, rate,
                  rate * channels * bits // 8, channels * bits // 8, bits)
    return (
        b"RIFF" + _s.pack("<I", 36 + data_bytes) + b"WAVE"
        + b"fmt " + _s.pack("<I", 16) + fmt
        + b"data" + _s.pack("<I", data_bytes) + body
    )


def test_wav_header_expr(spark):
    from movie_data_pipeline_spark.multimodal.binary import wav_header_expr
    from pyspark.sql import functions as F

    rows = [
        (1, _wav(2, 44100, 16, 44100 * 2 * 2)),  # 1.0s stereo 16-bit
        (2, _wav(1, 16000, 8, 8000)),  # 0.5s mono 8-bit
        (3, b"RIFFxxxxNOPE" + b"\x00" * 40),
        (4, b"junk"),
    ]
    blobs = spark.createDataFrame(rows, "blob_id LONG, content BINARY")
    df = blobs.select("blob_id", wav_header_expr(F.col("content")).alias("h"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan
    got = {
        r.blob_id: (
            r.h.audio_format, r.h.n_channels, r.h.sample_rate,
            r.h.bits_per_sample, r.h.duration_sec,
        )
        for r in df.collect()
    }
    assert got[1] == ("wav-pcm", 2, 44100, 16, 1.0)
    assert got[2] == ("wav-pcm", 1, 16000, 8, 0.5)
    assert got[3][0] is None and got[4][0] is None


def test_image_dimensions_rejects_weak_bmp_and_skips_python_for_nonjpeg(spark):
    """BITMAPCOREHEADER (DIB size 12) and 'BM'-prefixed junk must yield
    nulls, not garbage dims; and non-JPEG unknowns must resolve
    JVM-side (only SOI-magic rows reach the Python walker)."""
    import struct as _s

    from movie_data_pipeline_spark.multimodal import image_dimensions

    core_bmp = b"BM" + b"\x00" * 12 + _s.pack("<IHHHH", 12, 100, 50, 1, 24)
    rows = [
        (1, core_bmp),  # OS/2 core header: unsupported → nulls
        (2, b"BMjunkjunkjunkjunkjunkjunkjunk"),  # weak magic → nulls
        (3, _bmp(640, 480)),  # real BITMAPINFOHEADER still parses
        (4, b"\x00" * 50_000),  # big non-image blob: JVM-side null
    ]
    blobs = spark.createDataFrame(rows, "blob_id LONG, content BINARY")
    got = {
        r.blob_id: (r.img_format, r.width, r.height)
        for r in image_dimensions(blobs).collect()
    }
    assert got[1] == (None, None, None)
    assert got[2] == (None, None, None)
    assert got[3] == ("bmp", 640, 480)
    assert got[4] == (None, None, None)


def test_wav_duration_clamped_to_payload(spark):
    """A placeholder/overstated data size (streaming writers, truncated
    downloads) must not produce absurd durations — duration derives
    from min(header claim, actual payload bytes)."""
    import struct as _s

    from movie_data_pipeline_spark.multimodal.binary import wav_header_expr
    from pyspark.sql import functions as F

    # header CLAIMS 0xFFFFFFF0 data bytes but carries only 16000
    # (1.0s at 16kHz mono 8-bit)
    lying = (
        b"RIFF" + _s.pack("<I", 36) + b"WAVE"
        + b"fmt " + _s.pack("<I", 16)
        + _s.pack("<HHIIHH", 1, 1, 16000, 16000, 1, 8)
        + b"data" + _s.pack("<I", 0xFFFFFFF0) + b"\x00" * 16000
    )
    blobs = spark.createDataFrame([(1, lying)], "blob_id LONG, content BINARY")
    r = blobs.select(wav_header_expr(F.col("content")).alias("h")).collect()[0]
    assert r.h.audio_format == "wav-pcm" and r.h.duration_sec == 1.0
