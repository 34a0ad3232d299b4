"""Unigram-LM tokenizer (operators/unigram.py + plans/unigram_queries.py):
the fold-based Viterbi + hard-EM loop must equal a reference driver-side
implementation, the learned table must be partitioning-invariant, and
the guards must fail loudly."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from clickhouse_segments_tutorial_spark.operators.unigram import (
    UNI_MAX_PIECE_LEN,
    UNI_VOCAB_EXTRA,
    unigram_token_counts,
    unigram_train,
)


def _ref_train(freqs: dict[str, int], rounds: int,
               L: int = UNI_MAX_PIECE_LEN, V: int = UNI_VOCAB_EXTRA):
    """Reference driver-side hard-EM (the documented algorithm)."""
    seed: dict[str, int] = {}
    for w, f in freqs.items():
        for p in range(len(w)):
            for l in range(1, min(L, len(w) - p) + 1):
                seed[w[p:p + l]] = seed.get(w[p:p + l], 0) + f
    vocab = {p: c for p, c in seed.items() if len(p) == 1}
    vocab.update(dict(sorted(
        ((p, c) for p, c in seed.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[:V]))
    C = sum(vocab.values())
    lp = {p: round(math.log(c) - math.log(C), 12) for p, c in vocab.items()}
    seg: dict[str, list[str]] = {}
    cnt: dict[str, int] = {}
    for _ in range(rounds):
        seg = {}
        for w in freqs:
            n = len(w)
            best = [0.0] + [None] * n
            back = [0] * (n + 1)
            for i in range(1, n + 1):
                cands = {
                    j: best[i - j] + lp[w[i - j:i]]
                    for j in range(1, min(L, i) + 1)
                    if w[i - j:i] in lp and best[i - j] is not None
                }
                b = max(cands.values())
                best[i] = b
                back[i] = max(j for j, s in cands.items() if s == b)
            pieces, pos = [], n
            while pos > 0:
                pieces.append(w[pos - back[pos]:pos])
                pos -= back[pos]
            seg[w] = list(reversed(pieces))
        cnt = {p: 0 for p in vocab}
        for w, f in freqs.items():
            for piece in seg[w]:
                cnt[piece] += f
        Cs = sum(cnt[p] + 1 for p in vocab)
        lp = {p: round(math.log(cnt[p] + 1) - math.log(Cs), 12) for p in vocab}
    return cnt, lp, seg


def _wf(spark, rows):
    return spark.createDataFrame(rows, "word string, freq long")


def test_train_matches_reference(spark):
    rows = [("lowering", 40), ("lowest", 11), ("lower", 25), ("low", 60),
            ("newest", 9), ("newer", 17), ("new", 31), ("a", 5)]
    freqs = dict(rows)
    cnt_ref, lp_ref, seg_ref = _ref_train(freqs, rounds=3)
    vocab, seg = unigram_train(_wf(spark, rows), rounds=3)
    got_vocab = {r["piece"]: (r["cnt"], r["lp"]) for r in vocab.collect()}
    got_seg = {r["word"]: list(r["pieces"]) for r in seg.collect()}
    assert got_vocab == {p: (cnt_ref[p], lp_ref[p]) for p in lp_ref}
    assert got_seg == seg_ref


def test_train_partitioning_invariant(spark):
    rows = [(f"w{i}xyz"[: 3 + i % 5], 10 + 7 * i) for i in range(40)]
    rows = list({w: f for w, f in rows}.items())
    outs = []
    for parts in (1, 3, 8):
        vocab, _ = unigram_train(_wf(spark, rows).repartition(parts), rounds=2)
        outs.append(sorted(map(tuple, vocab.collect())))
    assert outs[0] == outs[1] == outs[2]


def test_local_trainer_equals_distributed(spark):
    """The scale-adaptive gate (UNI_LOCAL_DICT_MAX): the driver-side
    hard-EM replay over the collected dictionary must be BIT-identical
    (counts, round-12 log-probs, segmentations) to the distributed
    loop, for both the fixed-vocabulary and the pruning trainer.
    local_dict_max=0 forces the distributed path."""
    from clickhouse_segments_tutorial_spark.operators.unigram import (
        unigram_train_pruned,
    )

    rows = [("lowering", 40), ("lowest", 11), ("lower", 25), ("low", 60),
            ("newest", 9), ("newer", 17), ("new", 31), ("a", 5)]
    vl, sl = unigram_train(_wf(spark, rows), rounds=3)
    vd, sd = unigram_train(_wf(spark, rows), rounds=3, local_dict_max=0)
    assert sorted(map(tuple, vl.collect())) == sorted(map(tuple, vd.collect()))
    assert {r["word"]: (r["freq"], list(r["pieces"])) for r in sl.collect()} == {
        r["word"]: (r["freq"], list(r["pieces"])) for r in sd.collect()
    }
    pl, ql = unigram_train_pruned(_wf(spark, rows), target_extra=8, start_extra=16)
    pd_, qd = unigram_train_pruned(
        _wf(spark, rows), target_extra=8, start_extra=16, local_dict_max=0
    )
    assert sorted(map(tuple, pl.collect())) == sorted(map(tuple, pd_.collect()))
    assert {r["word"]: list(r["pieces"]) for r in ql.collect()} == {
        r["word"]: list(r["pieces"]) for r in qd.collect()
    }


def test_word_longer_than_cap_fails_loudly(spark):
    """The raised ceiling (r11 verdict item 1): 9-char words — beyond
    the old 8-char cap — now train (the DP sizes itself to the
    dictionary); only words past UNI_MAX_WORD_LEN=32 raise, and a
    TIGHTER per-call cap still raises for oracle-locked callers."""
    vocab, seg = unigram_train(_wf(spark, [("abcdefghi", 2), ("ab", 1)]))
    got = {r.word: list(r.pieces) for r in seg.collect()}
    assert "".join(got["abcdefghi"]) == "abcdefghi"
    with pytest.raises(ValueError, match="exceeds max_word_len"):
        unigram_train(_wf(spark, [("a" * 33, 1)]))  # 33 > UNI_MAX_WORD_LEN
    with pytest.raises(ValueError, match="exceeds max_word_len"):
        unigram_train(_wf(spark, [("abcdefghi", 1)]), max_word_len=8)


def test_token_counts_keep_empty_docs(spark):
    docs = spark.createDataFrame(
        [(1, "low low new"), (2, "   "), (3, "lower")],
        "doc_id long, text string",
    )
    from clickhouse_segments_tutorial_spark.operators.bpe import word_frequencies

    _, seg = unigram_train(word_frequencies(docs), rounds=1)
    rows = {r["doc_id"]: r for r in unigram_token_counts(docs, seg).collect()}
    assert rows[2]["n_ws_tokens"] == 0 and rows[2]["n_unigram_tokens"] == 0
    assert rows[1]["n_ws_tokens"] == 3
    assert rows[1]["n_unigram_tokens"] >= 3


def test_unigram_train_pruned_reaches_target_budget(spark):
    """Vocabulary pruning (Kudo 2018 size control, hard-EM variant):
    the final vocabulary is alphabet + target_extra when the seed holds
    more; the schedule is static arithmetic; every word still
    segments (single chars are never pruned)."""
    from clickhouse_segments_tutorial_spark.operators.unigram import (
        prune_schedule,
        unigram_train_pruned,
    )

    assert prune_schedule(256, 64) == [128, 64]
    assert prune_schedule(64, 64) == []
    assert prune_schedule(100, 30, shrink=0.5) == [50, 30]

    rows = list(
        {f"w{i % 7}x{(i * 3) % 11}ab": 1 + i % 5 for i in range(60)}.items()
    )
    words = _wf(spark, rows)
    vocab, seg = unigram_train_pruned(
        words, target_extra=16, start_extra=64
    )
    multi = vocab.filter(F.length("piece") > 1).count()
    assert multi == 16
    assert seg.filter(F.concat_ws("", "pieces") != F.col("word")).count() == 0
    # pruning is real: unpruned training at the same seed keeps more
    from clickhouse_segments_tutorial_spark.operators.unigram import unigram_train

    full, _ = unigram_train(words, vocab_extra=64, rounds=1)
    assert full.filter(F.length("piece") > 1).count() > 16
