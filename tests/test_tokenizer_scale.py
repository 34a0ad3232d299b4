"""Realistic-dictionary end-to-end proof for the learned tokenizers
(r11 verdict item 1): ~100k distinct synthetic words up to 32 chars —
the scale regime the old 8-char cap rejected — trained through BOTH
train loops with segmentation invariants checked corpus-wide."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_segments_tutorial_spark.operators.synth import synth_dictionary


def test_unigram_trains_realistic_dictionary(spark):
    """~94k distinct words (100k ids minus short-word collisions),
    lengths 1..32: unigram hard-EM trains end-to-end under the raised
    cap, every word's segmentation concatenates back to the word, and
    the vocabulary stays seed-sized (alphabet + UNI_VOCAB_EXTRA)."""
    from clickhouse_segments_tutorial_spark.operators.unigram import (
        UNI_VOCAB_EXTRA,
        unigram_train,
    )

    words = synth_dictionary(spark, 100_000, 32)
    stats = words.agg(
        F.count(F.lit(1)).alias("n"), F.max(F.length("word")).alias("mx")
    ).collect()[0]
    assert stats["n"] >= 90_000 and stats["mx"] == 32
    vocab, seg = unigram_train(words, rounds=2)
    assert seg.filter(F.concat_ws("", "pieces") != F.col("word")).count() == 0
    assert seg.count() == stats["n"]
    assert vocab.count() == 26 + UNI_VOCAB_EXTRA
    # long words actually segment into multi-char pieces (the vocabulary
    # is used, not fallen back to chars)
    long_multi = seg.filter(
        (F.length("word") == 32) & (F.size("pieces") < 32)
    ).count()
    assert long_multi > 0


def test_bpe_trains_realistic_dictionary(spark):
    """The same dictionary through batched BPE (round_batch=16 — the
    vocab-axis scale path): 48 merges land, every trained symbol array
    concatenates back to its word."""
    from clickhouse_segments_tutorial_spark.operators.bpe import bpe_train

    words = synth_dictionary(spark, 100_000, 32)
    merges, trained = bpe_train(words, n_merges=48, round_batch=16)
    assert len(merges) == 48
    assert trained.filter(F.concat_ws("", "syms") != F.col("word")).count() == 0
    # ranks are dense and 1-based; merged symbols are consistent
    assert [m.rank for m in merges] == list(range(1, 49))
    assert all(m.merged == m.lhs + m.rhs for m in merges)
