#!/usr/bin/env python
"""Word-length / dictionary-size scale measurement for the learned
tokenizers (BASELINE.md r12 rows): times one unigram hard-EM round and
a batched BPE run over synthetic dictionaries of ~100k distinct words
at max word length 8 / 16 / 32, on the bench session settings.

Run from the repo root: python scripts/measure_tokenizer_scale.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from clickhouse_segments_tutorial_spark.operators.synth import synth_dictionary
from clickhouse_segments_tutorial_spark.session import get_spark


def main() -> None:
    spark = get_spark("tokscale", shuffle_partitions=32)
    from clickhouse_segments_tutorial_spark.operators.bpe import bpe_train
    from clickhouse_segments_tutorial_spark.operators.unigram import unigram_train

    print("maxlen | n_words | unigram 1 round (s) | bpe 48 merges b16 (s)")
    for max_len in (8, 16, 32):
        words = synth_dictionary(spark, 100_000, max_len)
        n = words.count()
        t0 = time.time()
        _, seg = unigram_train(words, rounds=1)
        seg.count()
        t_uni = time.time() - t0
        t0 = time.time()
        _, trained = bpe_train(words, n_merges=48, round_batch=16)
        trained.count()
        t_bpe = time.time() - t0
        print(f"{max_len:6d} | {n:7d} | {t_uni:19.1f} | {t_bpe:21.1f}")


if __name__ == "__main__":
    main()
