"""HeaderDecoder PNG path: REAL PNG decoding (stdlib zlib inflate +
all five scanline filters) verified against byte-exact synthetic PNGs
whose raw pixels are known — the test encodes with every filter type
and asserts the decoder's octile features equal those computed from
the ground-truth pixels. No media library anywhere.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from bio_lakehouse_spark.operators.multimodal import (
    FakeDecoder,
    HeaderDecoder,
)

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(cid: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + cid
        + body
        + struct.pack(">I", zlib.crc32(cid + body))
    )


def _filter_row(
    ftype: int, row: np.ndarray, prev: np.ndarray, bpp: int
) -> bytes:
    """Forward PNG filter (spec §9) — the encoder side, so the test's
    expectation is independent of the decoder's un-filter code."""
    r = row.astype(np.int64)
    p = prev.astype(np.int64)
    out = np.zeros(len(r), dtype=np.int64)
    for x in range(len(r)):
        a = int(r[x - bpp]) if x >= bpp else 0
        up = int(p[x])
        c = int(p[x - bpp]) if x >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (a + up) // 2
        else:  # Paeth
            q = a + up - c
            pa, pb, pc = abs(q - a), abs(q - up), abs(q - c)
            pred = a if pa <= pb and pa <= pc else (up if pb <= pc else c)
        out[x] = (int(r[x]) - pred) & 0xFF
    return bytes(out.astype(np.uint8))


def make_png(
    pixels: np.ndarray,
    ctype: int,
    filters: list[int] | None = None,
    palette: np.ndarray | None = None,
    interlace: int = 0,
) -> bytes:
    """Encode (height, width*channels) uint8 pixels as a real PNG."""
    height, stride = pixels.shape
    n_ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    width = stride // n_ch
    filters = filters if filters is not None else [0] * height
    prev = np.zeros(stride, dtype=np.uint8)
    scan = bytearray()
    for y in range(height):
        scan.append(filters[y])
        scan += _filter_row(filters[y], pixels[y], prev, n_ch)
        prev = pixels[y]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, interlace)
    out = PNG_SIG + _chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    out += _chunk(b"IDAT", zlib.compress(bytes(scan)))
    return out + _chunk(b"IEND", b"")


def _octiles(flat: np.ndarray) -> list[float]:
    chunks = np.array_split(flat.astype("float64"), 8)
    return [
        round(float(np.sqrt(np.mean(c * c)) / 255.0), 6) if c.size else 0.0
        for c in chunks
    ]


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_every_filter_type_roundtrips(ftype):
    rng = np.random.default_rng(ftype + 7)
    pixels = rng.integers(0, 256, size=(6, 5 * 3), dtype=np.uint8)
    blob = make_png(pixels, ctype=2, filters=[ftype] * 6)
    w, h, c, feats = HeaderDecoder().decode(blob, "image/png")
    assert (w, h, c) == (5, 6, 3)
    assert feats == _octiles(pixels.reshape(-1))


def test_png_mixed_filters_and_gray():
    rng = np.random.default_rng(42)
    pixels = rng.integers(0, 256, size=(10, 8), dtype=np.uint8)
    blob = make_png(pixels, ctype=0, filters=[0, 1, 2, 3, 4, 4, 3, 2, 1, 0])
    w, h, c, feats = HeaderDecoder().decode(blob, "image/png")
    assert (w, h, c) == (8, 10, 1)
    assert feats == _octiles(pixels.reshape(-1))


@pytest.mark.parametrize("ctype,n_ch", [(4, 2), (6, 4)])
def test_png_alpha_color_types(ctype, n_ch):
    rng = np.random.default_rng(ctype)
    pixels = rng.integers(0, 256, size=(4, 3 * n_ch), dtype=np.uint8)
    blob = make_png(pixels, ctype=ctype, filters=[4] * 4)
    w, h, c, feats = HeaderDecoder().decode(blob, "image/png")
    assert (w, h, c) == (3, 4, n_ch)
    assert feats == _octiles(pixels.reshape(-1))


def test_png_palette_expands_to_rgb():
    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]], dtype=np.uint8
    )
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], dtype=np.uint8)
    blob = make_png(idx, ctype=3, filters=[1, 2], palette=palette)
    w, h, c, feats = HeaderDecoder().decode(blob, "image/png")
    assert (w, h, c) == (4, 2, 3)
    assert feats == _octiles(palette[idx.reshape(-1)].reshape(-1))


def test_png_multi_idat_chunks():
    """IDAT may be split arbitrarily; the decoder must concatenate."""
    pixels = np.arange(4 * 6, dtype=np.uint8).reshape(4, 6)
    comp = zlib.compress(
        b"".join(b"\x00" + pixels[y].tobytes() for y in range(4))
    )
    blob = (
        PNG_SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 4, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", comp[:7])
        + _chunk(b"IDAT", comp[7:])
        + _chunk(b"IEND", b"")
    )
    w, h, c, feats = HeaderDecoder().decode(blob, "image/png")
    assert (w, h, c) == (2, 4, 3)
    assert feats == _octiles(pixels.reshape(-1))


def test_png_unsupported_profile_falls_back():
    """Adam7-interlaced → deterministic fallback, not a crash."""
    pixels = np.zeros((2, 2), dtype=np.uint8)
    blob = make_png(pixels, ctype=0, interlace=1)
    dec = HeaderDecoder()
    assert dec.decode(blob, "image/png") == FakeDecoder().decode(
        blob, "image/png"
    )


def test_png_through_spark_plumbing(spark):
    """The PNG path rides the same mapInPandas stage as BMP/WAV."""
    from pyspark.sql import functions as F

    from bio_lakehouse_spark.operators.multimodal import decode_batches

    rng = np.random.default_rng(3)
    pixels = rng.integers(0, 256, size=(9, 7 * 4), dtype=np.uint8)
    blob = make_png(pixels, ctype=6, filters=[1, 4, 2, 3, 0, 4, 1, 2, 3])
    df = spark.createDataFrame(
        [(1, bytearray(blob), "image/png")],
        "doc_id long, content binary, mt string",
    )
    wrapped = df.select(
        "doc_id",
        "content",
        F.col("mt").alias("media_type"),
        F.octet_length("content").cast("long").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
    )
    row = decode_batches(wrapped, decoder=HeaderDecoder()).collect()[0]
    assert (row["width"], row["height"], row["n_channels"]) == (7, 9, 4)
    expect = _octiles(pixels.reshape(-1))
    assert all(
        abs(a - b) < 1e-6 for a, b in zip(row["feature_vec"], expect)
    )
