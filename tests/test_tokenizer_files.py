"""Tokenizer file-format loaders (operators/tokenizer_files): the
tests WRITE byte-exact synthetic files in the real formats — a
SentencePiece ModelProto in protobuf wire format, a .tiktoken base64
rank table — and verify loading + counting end to end. No Spark, no
external packages.
"""

from __future__ import annotations

import base64
import math
import struct

import pandas as pd

from bio_lakehouse_spark.operators.tokenizer_files import (
    byte_bpe_encode_len,
    load_sentencepiece_model,
    load_tiktoken_bpe,
    sentencepiece_token_counter,
    tiktoken_token_counter,
)


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _sp_piece(piece: str, score: float, ptype: int = 1) -> bytes:
    body = bytearray()
    pb = piece.encode("utf-8")
    body += _varint((1 << 3) | 2) + _varint(len(pb)) + pb  # piece=1
    body += _varint((2 << 3) | 5) + struct.pack("<f", score)  # score=2
    body += _varint((3 << 3) | 0) + _varint(ptype)  # type=3
    return _varint((1 << 3) | 2) + _varint(len(body)) + bytes(body)


def _write_sp_model(path, pieces):
    with open(path, "wb") as fh:
        # an unknown leading field the parser must skip (field 2 =
        # trainer_spec, length-delimited)
        junk = b"\x08\x01"
        fh.write(_varint((2 << 3) | 2) + _varint(len(junk)) + junk)
        for piece, score, ptype in pieces:
            fh.write(_sp_piece(piece, score, ptype))


def test_sentencepiece_wire_roundtrip(tmp_path):
    p = tmp_path / "toy.model"
    _write_sp_model(
        p,
        [
            ("<unk>", 0.0, 2),       # UNKNOWN type — skipped
            ("▁the", -1.5, 1),
            ("a", -4.25, 1),
            ("b", -4.5, 1),
            ("ab", -2.0, 1),
        ],
    )
    got = load_sentencepiece_model(str(p))
    assert got == [("▁the", -1.5), ("a", -4.25), ("b", -4.5), ("ab", -2.0)]


def test_sentencepiece_counter_viterbi(tmp_path):
    p = tmp_path / "toy.model"
    _write_sp_model(
        p,
        [
            ("a", -4.25, 1),
            ("b", -4.5, 1),
            ("ab", -2.0, 1),
            ("c", -5.0, 1),
        ],
    )
    counter = sentencepiece_token_counter(str(p))
    out = counter(pd.Series(["ab", "abc", "ab ab", "ba"]))
    # 'ab' one piece (cheaper than a+b); 'abc' = ab+c; 'ba' = b+a
    assert list(out) == [1, 2, 2, 2]


def test_sentencepiece_boundary_marker_collision(tmp_path):
    """'▁x' and 'x' collide after marker stripping — the cheaper
    (higher-score) cost must win."""
    p = tmp_path / "toy.model"
    _write_sp_model(p, [("▁x", -1.0, 1), ("x", -9.0, 1)])
    counter = sentencepiece_token_counter(str(p))
    # both become 'x'; cost should be the −1.0 one (≈1443 millibits),
    # which only matters for ties — count is 1 either way
    assert list(counter(pd.Series(["x"]))) == [1]


def test_tiktoken_load_and_merge_order(tmp_path):
    p = tmp_path / "toy.tiktoken"
    vocab = {b"a": 0, b"b": 1, b"c": 2, b"ab": 3, b"bc": 4, b"abc": 5}
    with open(p, "wb") as fh:
        for tok, rank in vocab.items():
            fh.write(base64.b64encode(tok) + b" " + str(rank).encode() + b"\n")
    ranks = load_tiktoken_bpe(str(p))
    assert ranks == vocab
    # 'abc': pairs ab(3) vs bc(4) → merge ab first → [ab, c]; then
    # ab+c = b'abc' rank 5 → one token
    assert byte_bpe_encode_len(ranks, b"abc") == 1
    # 'abcb': ab, then abc? [ab,c,b]: ab+c=5, c+b none → merge abc →
    # [abc, b]; abc+b not in table → 2 tokens
    assert byte_bpe_encode_len(ranks, b"abcb") == 2
    # unknown bytes fall through as singles
    assert byte_bpe_encode_len(ranks, b"zz") == 2


def test_tiktoken_counter_series(tmp_path):
    p = tmp_path / "toy.tiktoken"
    vocab = {b"h": 0, b"i": 1, b"hi": 2}
    with open(p, "wb") as fh:
        for tok, rank in vocab.items():
            fh.write(base64.b64encode(tok) + b" " + str(rank).encode() + b"\n")
    counter = tiktoken_token_counter(str(p))
    out = counter(pd.Series(["hi", "HI hi", "hih"]))
    assert list(out) == [1, 2, 2]


def test_counters_plug_into_textops_seam(tmp_path, spark):
    """Both loaders satisfy the TokenCounterFn contract end to end:
    textops.token_counter wraps them into an Arrow-batched Column."""
    from bio_lakehouse_spark.operators.textops import token_counter

    p = tmp_path / "toy.tiktoken"
    with open(p, "wb") as fh:
        for tok, rank in {b"a": 0, b"b": 1, b"ab": 2}.items():
            fh.write(base64.b64encode(tok) + b" " + str(rank).encode() + b"\n")
    col_fn = token_counter(tiktoken_token_counter(str(p)))
    df = spark.createDataFrame([("ab ba",), ("aaa",)], ["text"])
    got = [r["n"] for r in df.select(col_fn("text").alias("n")).collect()]
    # 'ab'=1, 'ba'=2 → 3; 'aaa': a,a,a no 'aa' merge → 3
    assert got == [3, 3]


# ------------------------------------------------------- tiktoken writer


def test_tiktoken_write_load_roundtrip(tmp_path):
    from bio_lakehouse_spark.operators.tokenizer_files import (
        load_tiktoken_bpe,
        write_tiktoken_bpe,
    )

    ranks = {b"a": 0, b"b": 1, b"ab": 2, b"abb": 3}
    p = str(tmp_path / "t.tiktoken")
    write_tiktoken_bpe(p, ranks)
    assert load_tiktoken_bpe(p) == ranks


def test_merges_ranks_inverse():
    """merges → ranks → merges is the identity for any real BPE
    training output (prefix-closed merge lists)."""
    from bio_lakehouse_spark.operators.bpe import PRETRAINED_MERGES_V1
    from bio_lakehouse_spark.operators.tokenizer_files import (
        merges_from_tiktoken,
        tiktoken_ranks_from_merges,
    )

    ranks = tiktoken_ranks_from_merges(PRETRAINED_MERGES_V1)
    assert merges_from_tiktoken(ranks) == list(PRETRAINED_MERGES_V1)


def test_merges_ranks_inverse_random(spark):
    """Train tiny BPE merge lists on synthetic word tables and check
    the conversion inverts for each."""
    from bio_lakehouse_spark.operators.bpe import bpe_train
    from bio_lakehouse_spark.operators.tokenizer_files import (
        merges_from_tiktoken,
        tiktoken_ranks_from_merges,
    )

    rows = [("banana", 5), ("bandana", 3), ("cabana", 2), ("nab", 7)]
    wf = spark.createDataFrame(rows, "word string, count long")
    merges = bpe_train(wf, num_merges=6)
    assert merges  # trained something
    ranks = tiktoken_ranks_from_merges(merges)
    assert merges_from_tiktoken(ranks) == merges


def test_merges_from_tiktoken_rejects_non_merge_table():
    from bio_lakehouse_spark.operators.tokenizer_files import (
        merges_from_tiktoken,
    )

    # 'abc' cannot be built from two lower-rank parts ('bc'/'ab' absent)
    ranks = {b"a": 0, b"b": 1, b"c": 2, b"abc": 3}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        merges_from_tiktoken(ranks)


def test_parts_vs_len_consistency():
    from bio_lakehouse_spark.operators.tokenizer_files import (
        byte_bpe_encode_len,
        byte_bpe_encode_parts,
        tiktoken_ranks_from_merges,
    )
    from bio_lakehouse_spark.operators.bpe import PRETRAINED_MERGES_V1

    ranks = tiktoken_ranks_from_merges(PRETRAINED_MERGES_V1)
    for w in (b"erer", b"cancan", b"partner", b"atone", b"q"):
        parts = byte_bpe_encode_parts(ranks, w)
        assert b"".join(parts) == w
        assert len(parts) == byte_bpe_encode_len(ranks, w)
