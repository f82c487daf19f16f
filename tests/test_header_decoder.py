"""HeaderDecoder (operators/multimodal): REAL BMP + WAV decoding from
byte-exact synthetic files in the actual formats — width/height/
channels come from the headers, features from the samples. Closes the
decoder seam for uncompressed formats without any media library.
"""

from __future__ import annotations

import math
import struct

import pytest

from bio_lakehouse_spark.operators.multimodal import (
    FakeDecoder,
    HeaderDecoder,
    attach_binary,
    decode_batches,
)


def make_bmp(width: int, height: int, pixel: int = 200) -> bytes:
    """Minimal 24-bit uncompressed BMP (BITMAPINFOHEADER), rows padded
    to 4 bytes as the spec requires."""
    row = bytes([pixel, pixel, pixel]) * width
    row += b"\x00" * ((4 - len(row) % 4) % 4)
    px = row * height
    header_size = 14 + 40
    file_size = header_size + len(px)
    bmp = b"BM" + struct.pack("<IHHI", file_size, 0, 0, header_size)
    bmp += struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(px), 2835, 2835, 0, 0
    )
    return bmp + px


def make_wav(
    n_frames: int, channels: int = 1, rate: int = 8000, amp: int = 1000
) -> bytes:
    """Minimal PCM16 WAV: RIFF/WAVE with fmt_ and data chunks; the
    signal is a constant-amplitude square wave (RMS == amp)."""
    sig = []
    for i in range(n_frames * channels):
        sig.append(amp if i % 2 == 0 else -amp)
    data = struct.pack(f"<{len(sig)}h", *sig)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16
    )
    body = b"WAVE"
    body += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_bmp_header_and_pixels():
    dec = HeaderDecoder()
    w, h, c, feats = dec.decode(make_bmp(5, 3, pixel=255), "image/bmp")
    assert (w, h, c) == (5, 3, 3)
    assert len(feats) == 8
    # all-255 pixels (padding zeros dilute the RMS slightly below 1)
    assert all(0.8 < f <= 1.0 for f in feats[:-1])


def test_bmp_width_not_multiple_of_4():
    w, h, c, _ = HeaderDecoder().decode(make_bmp(7, 2), "image/bmp")
    assert (w, h, c) == (7, 2, 3)


def test_wav_frames_channels_rms():
    dec = HeaderDecoder()
    w, h, c, feats = dec.decode(
        make_wav(400, channels=2, amp=16384), "audio/wav"
    )
    assert (w, h, c) == (400, 1, 2)
    # square wave amplitude 16384 → RMS = 16384/32768 = 0.5 per band
    assert len(feats) == 8
    for f in feats:
        assert math.isclose(f, 0.5, rel_tol=1e-3)


def test_unknown_type_falls_back_deterministically():
    dec = HeaderDecoder()
    fake = FakeDecoder()
    blob = b"\x00\x01\x02not-a-known-format"
    assert dec.decode(blob, "video/mp4") == fake.decode(blob, "video/mp4")


def test_header_decoder_through_spark_plumbing(spark):
    """The real decoder rides the same mapInPandas stage as the fake:
    binary column in, decoded schema out, values matching the local
    decode."""
    rows = [
        (1, bytearray(make_bmp(4, 4, pixel=128)), "image/bmp"),
        (2, bytearray(make_wav(64, channels=1, amp=8192)), "audio/wav"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary, mt string")
    from pyspark.sql import functions as F

    wrapped = df.select(
        "doc_id",
        "content",
        F.col("mt").alias("media_type"),
        F.octet_length("content").cast("long").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
    )
    got = {
        r["doc_id"]: r
        for r in decode_batches(wrapped, decoder=HeaderDecoder()).collect()
    }
    assert (got[1]["width"], got[1]["height"], got[1]["n_channels"]) == (4, 4, 3)
    assert (got[2]["width"], got[2]["height"], got[2]["n_channels"]) == (64, 1, 1)
    assert all(abs(f - 0.25) < 1e-3 for f in got[2]["feature_vec"])
