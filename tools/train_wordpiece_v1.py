"""Regenerate operators/wordpiece.PRETRAINED_WORDPIECE_V1: train the
WordPiece vocabulary on the sf0.001 documents corpus with the default
hyperparameters and print the frozen piece list. Deterministic —
Fraction-exact likelihood scores, pinned tie-breaks, no RNG — so
re-running against unchanged testdata reproduces the constant.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bio_lakehouse_spark.operators.bpe import word_freq_table
from bio_lakehouse_spark.operators.wordpiece import wordpiece_train
from bio_lakehouse_spark.session import get_spark
from bio_lakehouse_spark.suite.registry import load


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark()
    docs = load(spark, sf_dir, "documents")
    wf = word_freq_table(docs, "text")
    vocab = wordpiece_train(wf)
    print("PRETRAINED_WORDPIECE_V1: list[str] = [")
    for i in range(0, len(vocab), 6):
        row = ", ".join(repr(p) for p in vocab[i : i + 6])
        print(f"    {row},")
    print("]")


if __name__ == "__main__":
    main()
