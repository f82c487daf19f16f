"""HeaderDecoder GIF path: REAL GIF-variant LZW decompression
(LSB-first variable-width codes, clear/end codes) verified against
synthetic GIFs produced by an independent test-side LZW encoder —
ground-truth pixel indices are known, so the decoder's features must
equal octile stats of the palette-expanded truth. No media library.
"""

from __future__ import annotations

import random
import struct

import numpy as np

from bio_lakehouse_spark.operators.multimodal import (
    FakeDecoder,
    HeaderDecoder,
)


def lzw_encode(min_code: int, indices: list[int]) -> bytes:
    """Spec-conforming GIF LZW encoder. Code width mirrors the
    decoder's table state: the decoder appends an entry while
    processing every data code after the first (affecting the width
    of the NEXT read), so the encoder bumps width on that schedule."""
    clear, end = 1 << min_code, (1 << min_code) + 1
    table: dict[tuple, int] = {(i,): i for i in range(clear)}
    next_code = end + 1
    dec_len = end + 1  # decoder's table size
    width = min_code + 1
    out_bits: list[tuple[int, int]] = [(clear, width)]
    emitted = 0

    def emit(v: int) -> None:
        nonlocal emitted, dec_len, width
        out_bits.append((v, width))
        emitted += 1
        if emitted >= 2:  # decoder appends while processing this code
            dec_len += 1
            if dec_len == (1 << width) and width < 12:
                width += 1

    w: tuple = ()
    for k in indices:
        wk = w + (k,)
        if wk in table:
            w = wk
        else:
            emit(table[w])
            table[wk] = next_code
            next_code += 1
            w = (k,)
    if w:
        emit(table[w])
    out_bits.append((end, width))
    # pack LSB-first
    buf = bytearray()
    acc = nbits = 0
    for v, wd in out_bits:
        acc |= v << nbits
        nbits += wd
        while nbits >= 8:
            buf.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        buf.append(acc & 0xFF)
    return bytes(buf)


def make_gif(
    indices: np.ndarray,
    palette: np.ndarray,
    min_code: int,
    interlace: bool = False,
    local_table: bool = False,
    with_extension: bool = False,
) -> bytes:
    """Minimal single-frame GIF89a around the LZW-packed indices."""
    height, width = indices.shape
    bits = max(1, (len(palette) - 1).bit_length())
    pal = np.zeros((2 ** bits, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    out = bytearray(b"GIF89a")
    gct_flag = 0 if local_table else 0x80
    out += struct.pack(
        "<HHBBB", width, height, gct_flag | (bits - 1), 0, 0
    )
    if not local_table:
        out += pal.tobytes()
    if with_extension:  # graphic control extension, should be skipped
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    ipacked = (0x80 | (bits - 1) if local_table else 0) | (
        0x40 if interlace else 0
    )
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, ipacked)
    if local_table:
        out += pal.tobytes()
    out += bytes([min_code])
    data = lzw_encode(min_code, indices.reshape(-1).tolist())
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def _octiles(flat: np.ndarray) -> list[float]:
    chunks = np.array_split(flat.astype("float64"), 8)
    return [
        round(float(np.sqrt(np.mean(c * c)) / 255.0), 6) if c.size else 0.0
        for c in chunks
    ]


PALETTE4 = np.array(
    [[0, 0, 0], [255, 0, 0], [0, 255, 0], [40, 80, 120]], dtype=np.uint8
)


def test_gif_roundtrip_simple():
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0], [1, 1, 2, 2]], dtype=np.int64)
    blob = make_gif(idx, PALETTE4, min_code=2)
    w, h, c, feats = HeaderDecoder().decode(blob, "image/gif")
    assert (w, h, c) == (4, 3, 3)
    assert feats == _octiles(PALETTE4[idx.reshape(-1)].reshape(-1))


def test_gif_repetitive_image_exercises_lzw_table():
    """Long runs build deep LZW strings including the KwKwK case."""
    rng = np.random.default_rng(2)
    idx = np.repeat(rng.integers(0, 4, size=40 * 8), 8).reshape(40, 64)
    blob = make_gif(idx, PALETTE4, min_code=2)
    w, h, c, feats = HeaderDecoder().decode(blob, "image/gif")
    assert (w, h, c) == (64, 40, 3)
    assert feats == _octiles(PALETTE4[idx.reshape(-1)].reshape(-1))


def test_gif_random_image_grows_code_width():
    """Random 16-color noise forces code width past its start."""
    rng = np.random.default_rng(7)
    pal16 = rng.integers(0, 256, size=(16, 3)).astype(np.uint8)
    idx = rng.integers(0, 16, size=(30, 50)).astype(np.int64)
    blob = make_gif(idx, pal16, min_code=4)
    w, h, c, feats = HeaderDecoder().decode(blob, "image/gif")
    assert (w, h, c) == (50, 30, 3)
    assert feats == _octiles(pal16[idx.reshape(-1)].reshape(-1))


def test_gif_local_color_table_and_extension_skip():
    idx = np.array([[1, 0], [0, 1]], dtype=np.int64)
    blob = make_gif(
        idx, PALETTE4, min_code=2, local_table=True, with_extension=True
    )
    w, h, c, feats = HeaderDecoder().decode(blob, "image/gif")
    assert (w, h, c) == (2, 2, 3)
    assert feats == _octiles(PALETTE4[idx.reshape(-1)].reshape(-1))


def test_gif_interlaced_falls_back():
    idx = np.zeros((4, 4), dtype=np.int64)
    blob = make_gif(idx, PALETTE4, min_code=2, interlace=True)
    dec = HeaderDecoder()
    assert dec.decode(blob, "image/gif") == FakeDecoder().decode(
        blob, "image/gif"
    )


def test_lzw_micro_known_answer():
    """Hand-checkable stream: clear, literals 0 1 0, end at
    min_code=2 → indices [0, 1, 0]."""
    # widths: all 3 bits here (table never reaches 8)
    # codes: clear=4, 0, 1, 0, end=5  → bits LSB-first
    vals = [(4, 3), (0, 3), (1, 3), (0, 3), (5, 3)]
    acc = nbits = 0
    buf = bytearray()
    for v, wd in vals:
        acc |= v << nbits
        nbits += wd
        while nbits >= 8:
            buf.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        buf.append(acc & 0xFF)
    got = HeaderDecoder._lzw(2, bytes(buf), 3)
    assert got == [0, 1, 0]
