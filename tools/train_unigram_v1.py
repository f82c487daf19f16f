"""Regenerate operators/unigram_lm.PRETRAINED_UNIGRAM_V1: train the
unigram-LM tokenizer on the sf0.001 documents corpus with the default
hyperparameters and print the frozen (piece, millibits) list.
Deterministic — integer millibit costs, pinned tie-breaks, no RNG —
so re-running against unchanged testdata reproduces the constant.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bio_lakehouse_spark.operators.bpe import word_freq_table
from bio_lakehouse_spark.operators.unigram_lm import train_unigram
from bio_lakehouse_spark.session import get_spark
from bio_lakehouse_spark.suite.registry import load


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark()
    docs = load(spark, sf_dir, "documents")
    wf = word_freq_table(docs, "text").filter(F_len_gt0())
    vocab = train_unigram(wf)
    print("PRETRAINED_UNIGRAM_V1: list[tuple[str, int]] = [")
    for i in range(0, len(vocab), 3):
        row = ", ".join(f"({p!r}, {b})" for p, b in vocab[i : i + 3])
        print(f"    {row},")
    print("]")


def F_len_gt0():
    from pyspark.sql import functions as F

    return F.length("word") > 0


if __name__ == "__main__":
    main()
