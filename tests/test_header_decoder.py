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


def make_g711_wav(
    payload: bytes, fmt: int, channels: int = 1, rate: int = 8000
) -> bytes:
    """WAV wrapper for 8-bit companded G.711 payloads (fmt 6 = A-law,
    7 = mu-law)."""
    fmtc = struct.pack(
        "<HHIIHH", fmt, channels, rate, rate * channels, channels, 8
    )
    body = b"WAVE"
    body += b"fmt " + struct.pack("<I", len(fmtc)) + fmtc
    body += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", len(body)) + body


def mu_law_compress(x: int) -> int:
    """Reference G.711 mu-law compressor (spec formula) for test
    vectors."""
    sign = 0x80 if x < 0 else 0
    mag = min(abs(x), 32635) + 0x84
    exp = 7
    mask = 0x4000
    while exp > 0 and not (mag & mask):
        exp -= 1
        mask >>= 1
    mant = (mag >> (exp + 3)) & 0x0F
    return ~(sign | (exp << 4) | mant) & 0xFF


def test_wav_mu_law_roundtrip():
    """Compress known amplitudes with the reference compressor; the
    decoder's expansion must recover them within mu-law quantization
    error (<= 3% of full scale at these levels)."""
    amps = [0, 128, 1024, 8192, 30000, -30000, -1024]
    payload = bytes(mu_law_compress(a) for a in amps) * 64
    blob = make_g711_wav(payload, fmt=7)
    w, h, c, feats = HeaderDecoder().decode(blob, "audio/wav")
    assert (w, h, c) == (len(amps) * 64, 1, 1)
    import numpy as np

    expect_rms = float(
        np.sqrt(np.mean(np.array(amps, dtype="float64") ** 2))
    ) / 32768.0
    got_rms = float(np.sqrt(np.mean(np.array(feats) ** 2)))
    assert abs(got_rms - expect_rms) < 0.03


def test_wav_a_law_expansion_known_values():
    """A-law spec vectors (ITU-T G.711 / audioop.alaw2lin): byte 0x55
    (a=0 after XOR, sign bit CLEAR) is the smallest NEGATIVE step -8;
    0xD5 (sign bit set) its positive +8. The pre-r9 table had the
    convention inverted."""
    dec = HeaderDecoder()
    tbl = dec._G711_A
    assert tbl[0x55] == -8 and tbl[0xD5] == 8
    # mu-law: byte 0xFF is +0 (silence), 0x7F is -0
    assert dec._G711_MU[0xFF] == 0 and dec._G711_MU[0x7F] == 0

    blob = make_g711_wav(bytes([0x55, 0xD5]) * 100, fmt=6)
    w, h, c, feats = dec.decode(blob, "audio/wav")
    assert (w, h, c) == (200, 1, 1)
    # features are rounded to 6 decimals by _octile_stats
    assert all(abs(f - 8.0 / 32768.0) < 1e-6 for f in feats)
