"""Unigram-LM subword tokenizer (SentencePiece-style) trained by
Viterbi hard-EM as a distributed operator — the second of the two
standard subword algorithms (Kudo 2018, "Subword Regularization";
Kudo & Richardson 2018, SentencePiece), joining the corpus-trained BPE
operator (operators/bpe.py).

Algorithm (the deterministic hard-EM variant):

1. **Seed**: every substring of length 1..UNI_MAX_PIECE_LEN of every
   dictionary word, weighted by word frequency (one occurrence per
   position). The vocabulary keeps ALL single characters (so every word
   stays segmentable) plus the top UNI_VOCAB_EXTRA multi-char pieces by
   (count desc, piece asc). Initial piece log-probs
   lp = round(ln(cnt) - ln(C), 12) over the kept pieces' count total.
2. **E-step (Viterbi)**: each dictionary word's single best
   segmentation under the current lp table — DP over character
   positions, ties broken toward the LONGER last piece (deterministic).
3. **M-step**: piece counts re-estimated from the Viterbi segmentations
   weighted by word frequency, add-one smoothed over the FULL vocabulary
   (so unused pieces stay finite and the table never degenerates), and
   re-logged with the same round-12 rule. UNI_ROUNDS such rounds.

This is hard-EM, not SentencePiece's soft-EM + vocabulary pruning —
the deterministic, integer-count variant that fits the engine's oracle
discipline (soft-EM's fractional expected counts are corpus-order-
dependent float sums no cross-engine replay can pin down). Documented
simplification; the seed/Viterbi/re-estimate skeleton and the unigram
scoring model are the paper's.

Engine portability: counts are exact integers; log-probs are
ulp-stripped (round(ln, 12) — the bigram-LM/NB rule); the Viterbi DP
adds the SAME rounded doubles in the SAME left-to-right order in both
engines, so scores are bit-identical and the argmax (with the
j-descending tie-break) replays exactly. The DuckDB oracle retrains
from scratch: seeding, round loop, and the unrolled forward/backtrack
DP (plans/unigram_queries.py).

Scale design (100 TB corpus): identical to BPE's — ONE corpus-sized
explode + hash-agg builds the word-frequency dictionary; everything
after (seeding, per-round Viterbi + recount) is dictionary-sized
(Heaps' law). The lp table reaches the DP by JOIN (explode each word's
substring slots, join the vocab, fold back to a per-word slot map), so
the vocabulary is NEVER driver-held — a real 100k-piece vocab
broadcasts or shuffles at AQE's discretion. The Viterbi DP itself is
two PURE CATALYST runtime folds (``F.aggregate`` over the position
sequence — no Python UDF; see viterbi_segmented's plan-shape note for
why folds and not unrolled per-position columns), so the per-round
cost is one dictionary-sized join + map + hash-agg and the driver
never collects anything. Corpus tokenization never re-runs Viterbi per
occurrence: the trained dictionary's segmentations ARE the per-word
answer, applied by join (the BPE module's rule).
"""

from __future__ import annotations

import math
import os
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame, functions as F

from .text import tokens

# Dictionary-size threshold for the scale-adaptive LOCAL trainer — the
# operators/bpe.py BPE_LOCAL_DICT_MAX design: when the (word, freq)
# dictionary is a bounded small relation, every EM round's
# dictionary-sized join + fold + hash-agg is pure orchestration
# overhead (measured ~7 s at sf0.1 over a 31-row dictionary), and the
# driver replays the identical seeding/Viterbi/recount math from ONE
# bounded collect. Past the threshold the distributed loop is
# unchanged (a real 1e8-word dictionary never collects).
UNI_LOCAL_DICT_MAX = 262_144

UNI_MAX_PIECE_LEN = 4
# COST ceiling on supported word length, guarded LOUDLY in unigram_train.
# The DP itself is sized to the dictionary's ACTUAL max word length (one
# collected scalar — r11 verdict item 1), so this cap no longer prices
# every corpus at its worst case: it only rejects pathological "words"
# (a 10k-char unbroken blob would cost a 10k-iteration fold per row).
# 32 covers realistic natural-language dictionaries, including
# byte-encoded pre-tokens (operators/pretokenize.py) where one char is
# one UTF-8 byte. Registered queries pass a TIGHTER per-call cap matched
# to their DuckDB oracle's unroll depth (plans/unigram_queries.py) so a
# corpus outgrowing the oracle still fails loudly, never silently.
UNI_MAX_WORD_LEN = 32
UNI_VOCAB_EXTRA = 256  # multi-char piece budget on top of the alphabet
UNI_ROUNDS = 3


def seed_vocab(words: DataFrame, *, max_piece_len: int = UNI_MAX_PIECE_LEN,
               vocab_extra: int = UNI_VOCAB_EXTRA) -> DataFrame:
    """(piece, cnt) seed vocabulary from a (word, freq) dictionary:
    every substring occurrence weighted by word frequency; ALL single
    chars kept + top ``vocab_extra`` multi-char pieces by
    (cnt desc, piece asc). Deterministic; the multi-char top-K is a
    bounded TakeOrderedAndProject (vocab-sized driver footprint)."""
    w = F.col("word")
    pieces = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length(w)),
            lambda p: F.transform(
                F.sequence(
                    F.lit(1), F.least(F.lit(max_piece_len), F.length(w) - p + 1)
                ),
                lambda l: w.substr(p, l),
            ),
        )
    )
    counts = (
        words.select("freq", F.explode(pieces).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
    )
    chars = counts.filter(F.length("piece") == 1)
    multi = (
        counts.filter(F.length("piece") > 1)
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(vocab_extra)
    )
    return chars.unionByName(multi)


def _logged(vocab: DataFrame) -> DataFrame:
    """(piece, cnt, lp): ulp-stripped unigram log-probs over the table's
    count total — lp = round(ln(cnt) - ln(C), 12), the bigram-LM rule."""
    c = vocab.agg(F.sum("cnt").alias("_c"))
    return vocab.crossJoin(F.broadcast(c)).select(
        "piece",
        "cnt",
        F.round(F.log("cnt") - F.log("_c"), 12).alias("lp"),
    )


def _word_lp_lookup(
    words: DataFrame,
    vocab: DataFrame,
    *,
    max_word_len: int,
    max_piece_len: int,
) -> DataFrame:
    """(word, freq, _lpm): per-word map from substring slot
    ``(start-1) * max_piece_len + len`` to that substring's piece
    log-prob — built by EXPLODE + JOIN + map_from_entries, never a
    driver-held vocabulary: the lp table stays distributed (at a real
    32k+ vocab it broadcasts or shuffles by AQE's choice), which is the
    whole-corpus-scale substitute for inlining a map literal. Substrings
    absent from the vocabulary are simply missing keys (NULL lookups in
    the DP)."""
    w = F.col("word")
    slots = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length(w)),
            lambda p: F.transform(
                F.sequence(
                    F.lit(1), F.least(F.lit(max_piece_len), F.length(w) - p + 1)
                ),
                lambda l: F.struct(
                    ((p - 1) * max_piece_len + l).alias("slot"),
                    w.substr(p, l).alias("piece"),
                ),
            ),
        )
    )
    sub = words.select("word", "freq", F.explode(slots).alias("sl")).select(
        "word", "freq", F.col("sl.slot").alias("slot"), F.col("sl.piece").alias("piece")
    )
    hit = sub.join(vocab.select("piece", "lp"), "piece")
    return (
        sub.select("word", "freq").distinct()
        .join(
            hit.groupBy("word").agg(
                F.map_from_entries(
                    F.collect_list(F.struct("slot", "lp"))
                ).alias("_lpm")
            ),
            "word",
        )
    )


def viterbi_segmented(
    words: DataFrame,
    vocab: DataFrame,
    *,
    max_word_len: int = UNI_MAX_WORD_LEN,
    max_piece_len: int = UNI_MAX_PIECE_LEN,
    dp_len: int | None = None,
) -> DataFrame:
    """(word, freq, pieces): each dictionary word's best unigram
    segmentation under the (piece, lp) ``vocab`` table — pure Catalyst,
    no UDF: piece log-probs reach the DP through a per-word slot map
    built by join (:func:`_word_lp_lookup`), so the vocabulary is never
    driver-held, and both DP passes are RUNTIME FOLDS
    (``F.aggregate`` over a position sequence — the bpe.apply_merge
    expression style).

    Position i's best score is greatest over piece lengths
    j = 1..min(max_piece_len, i) of best[i-j] + lp(word[i-j+1 .. i]);
    the chosen j is recovered by probing candidates in DESCENDING j
    order against the max (the longer-last-piece tie-break, identical
    in the SQL oracle). Single characters are always in the vocabulary
    (seed_vocab), so every position within the word is reachable and
    the backtrack always terminates at position 0.

    Plan-shape note — why folds and not unrolled per-position columns:
    an unrolled DP (one withColumn per cell) gets collapsed by Catalyst
    into a single projection that COPIES each referenced cell's subtree;
    the backtrack references its previous position three times per
    step, so the inlined chain re-expands ~3^max_word_len times
    (measured: 150 s codegen at max_word_len=8, analysis OOM beyond).
    A fold's lambda is ONE constant-size expression iterated at
    runtime — the plan stays a few hundred nodes at any word length.

    ``dp_len`` — the fold ITERATION count, defaulting to
    ``max_word_len``. Positions past a word's end contribute nothing
    (NULL-guarded), so any ``dp_len`` >= the longest word is exact;
    ``unigram_train`` passes the dictionary's collected actual max so
    short-word corpora never pay the ceiling's iterations."""
    steps = max_word_len if dp_len is None else dp_len
    df = _word_lp_lookup(
        words, vocab, max_word_len=max_word_len, max_piece_len=max_piece_len
    )
    w, n = F.col("word"), F.length("word")
    L = max_piece_len
    lpm = F.col("_lpm")

    # forward fold: acc.ss[p+1] = best score at position p (NULL past the
    # word end), acc.js[p] = chosen piece length at position p
    def fwd_step(acc, i):
        cands = {
            j: F.when(
                i >= j,
                F.try_element_at(acc["ss"], (i - j + 1).cast("int"))
                + F.try_element_at(lpm, ((i - j) * L + j).cast("int")),
            )
            for j in range(1, L + 1)
        }
        best = F.greatest(*cands.values())
        jb = None
        for j in sorted(cands, reverse=True):  # longer piece wins ties
            cond = cands[j] == best
            jb = F.when(cond, F.lit(j)) if jb is None else jb.when(cond, F.lit(j))
        return F.struct(
            F.concat(acc["ss"], F.array(F.when(i <= n, best))).alias("ss"),
            F.concat(acc["js"], F.array(F.when(i <= n, jb).cast("int"))).alias("js"),
        )

    # The backtrack lives in the forward fold's FINISH lambda, where
    # acc["js"] is a BOUND accumulator value (O(1) field access per
    # backtrack step). Referencing the forward fold as an outer
    # expression instead — `chosen = fwd["js"]` in a second fold — makes
    # interpreted HOF evaluation re-run the ENTIRE forward fold once per
    # backtrack iteration: O(dp_len^2) fold work per word, measured 66 s
    # vs 3.2 s for one pass over 9.6k words at dp_len=32 (r12; both
    # forms value-identical). CASE branches evaluate lazily, so
    # element_at never sees position 0.
    def finish(acc):
        chosen = acc["js"]

        def bt_step(a, _):
            j = F.element_at(chosen, a["pos"])
            return F.when(
                a["pos"] > 0,
                F.struct(
                    (a["pos"] - j).cast("int").alias("pos"),
                    F.concat(
                        a["ps"], F.array(w.substr(a["pos"] - j + 1, j))
                    ).alias("ps"),
                ),
            ).otherwise(a)

        bt = F.aggregate(
            F.sequence(F.lit(1), F.lit(steps)),
            F.struct(
                n.cast("int").alias("pos"),
                F.array().cast("array<string>").alias("ps"),
            ),
            bt_step,
        )
        return F.reverse(bt["ps"])

    seg = F.aggregate(
        F.sequence(F.lit(1), F.lit(steps)),
        F.struct(
            F.array(F.lit(0.0)).alias("ss"),
            F.array().cast("array<int>").alias("js"),
        ),
        fwd_step,
        finish,
    )
    return df.select("word", "freq", seg.alias("pieces"))


def _round12(x: float) -> float:
    """Spark's ``F.round(double, 12)``: BigDecimal.valueOf (= the
    double's shortest decimal repr, Python ``repr``) quantized HALF_UP.
    Python's builtin round() is half-EVEN — it would silently diverge on
    exact .5 boundaries."""
    return float(Decimal(repr(x)).quantize(Decimal("1e-12"), rounding=ROUND_HALF_UP))


def _seed_local(
    words: list[tuple[str, int]], *, max_piece_len: int, vocab_extra: int
) -> dict[str, int]:
    """seed_vocab on the driver: every substring occurrence of length
    1..max_piece_len weighted by word freq; ALL single chars + top
    ``vocab_extra`` multi-char pieces by (cnt desc, piece asc) in UTF-8
    BYTE order (Spark's binary string collation — Python str comparison
    is codepoint order, hence the .encode() keys)."""
    cnt: dict[str, int] = {}
    for w, f in words:
        n = len(w)
        for p in range(n):
            for length in range(1, min(max_piece_len, n - p) + 1):
                piece = w[p : p + length]
                cnt[piece] = cnt.get(piece, 0) + f
    kept = {p: c for p, c in cnt.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in cnt.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0].encode()),
    )[:vocab_extra]
    kept.update(dict(multi))
    return kept


def _viterbi_local(
    word: str, lp: dict[str, float], *, max_piece_len: int
) -> list[str]:
    """The viterbi_segmented fold on the driver — identical IEEE double
    additions in the same left-to-right order, identical max, identical
    longer-last-piece (descending j, first equal) tie-break."""
    n = len(word)
    ss: list[float | None] = [0.0] + [None] * n
    js: list[int | None] = [None] * (n + 1)
    for i in range(1, n + 1):
        cands: dict[int, float] = {}
        for j in range(1, min(max_piece_len, i) + 1):
            prev = ss[i - j]
            lpv = lp.get(word[i - j : i])
            if prev is not None and lpv is not None:
                cands[j] = prev + lpv
        best = max(cands.values())
        ss[i] = best
        for j in sorted(cands, reverse=True):
            if cands[j] == best:
                js[i] = j
                break
    ps: list[str] = []
    pos = n
    while pos > 0:
        j = js[pos]
        ps.append(word[pos - j : pos])
        pos -= j
    ps.reverse()
    return ps


def _unigram_train_local(
    rows: list,
    *,
    schedule: list[int | None],
    max_piece_len: int,
    vocab_extra: int,
) -> tuple[list[tuple], list[tuple]]:
    """Driver-side replay of the hard-EM loop over a collected
    (word, freq) dictionary: seed, then one E-step + recount (+ optional
    prune) + add-one smooth + round-12 relog per ``schedule`` entry —
    the _em_round math verbatim. ln comes from the SAME C libm the
    DuckDB oracle uses; every lp is ulp-stripped to 12 decimals the
    instant it is taken, exactly like the Spark expressions, so the
    learned table is bit-identical across all three engines.

    Tolerance note (r17 ADVICE): the distributed path's ln is JVM
    Math.log, which may differ from C libm by 1 ulp; a raw value
    landing within that ulp of a round-12 HALF_UP boundary would make
    the two paths' lp differ by 1e-12. No such value exists in any
    registered corpus (the local==distributed pin would catch one), and
    when one does appear it is the DISTRIBUTED path that diverges from
    the DuckDB oracle — this local path shares the oracle's libm, so
    oracle parity (the binding contract) is unaffected. A per-value
    boundary-distance fallback was considered and rejected: at a safe
    detection tolerance (~4 ulp) essentially every large dictionary
    trips it, silently disabling the local path. Returns
    (vocab rows (piece, cnt, lp), segmented rows (word, freq, pieces))
    under the unigram_train contract (cnt = last round's raw count; seg
    = last E-step)."""
    words = [(r["word"], int(r["freq"])) for r in rows]
    counted = _seed_local(words, max_piece_len=max_piece_len, vocab_extra=vocab_extra)
    total = sum(counted.values())
    lp = {p: _round12(math.log(c) - math.log(total)) for p, c in counted.items()}
    seg: dict[str, list[str]] = {}
    for keep in schedule:
        seg = {
            w: _viterbi_local(w, lp, max_piece_len=max_piece_len) for w, _ in words
        }
        raw: dict[str, int] = {}
        for w, f in words:
            for piece in seg[w]:
                raw[piece] = raw.get(piece, 0) + f
        counted = {p: raw.get(p, 0) for p in counted}
        if keep is not None:
            kept = {p: c for p, c in counted.items() if len(p) == 1}
            multi = sorted(
                ((p, c) for p, c in counted.items() if len(p) > 1),
                key=lambda pc: (-pc[1], pc[0].encode()),
            )[:keep]
            kept.update(dict(multi))
            counted = kept
        total = sum(c + 1 for c in counted.values())
        lp = {
            p: _round12(math.log(c + 1) - math.log(total))
            for p, c in counted.items()
        }
    vocab_rows = [(p, c, lp[p]) for p, c in counted.items()]
    seg_rows = [(w, f, seg[w]) for w, f in words]
    return vocab_rows, seg_rows


_VOCAB_SCHEMA = "piece string, cnt bigint, lp double"
_SEG_SCHEMA = "word string, freq bigint, pieces array<string>"


def _local_gate(words: DataFrame, local_dict_max: int | None):
    """Materialize the dictionary once (both paths reuse it — the
    distributed loop otherwise re-runs the corpus-sized aggregation
    underneath ``words`` on every round's action) and decide the path:
    returns (checkpointed words, collected rows | None)."""
    words = words.localCheckpoint(eager=True)
    if local_dict_max is None:
        try:
            local_dict_max = int(
                os.environ.get("SPARK_GRAFT_UNI_LOCAL_DICT_MAX", "")
            )
        except ValueError:
            # a non-numeric env value must not crash training — fall
            # back to the constant (components.py gate rule)
            local_dict_max = UNI_LOCAL_DICT_MAX
    n_words = words.count()  # cheap: counts the materialized checkpoint
    if n_words <= local_dict_max:
        return words, words.collect()  # bounded by the gate
    return words, None


def unigram_train(
    words: DataFrame,
    *,
    rounds: int = UNI_ROUNDS,
    max_piece_len: int = UNI_MAX_PIECE_LEN,
    max_word_len: int = UNI_MAX_WORD_LEN,
    vocab_extra: int = UNI_VOCAB_EXTRA,
    local_dict_max: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Train the unigram LM on a (word, freq) dictionary. Returns
    (vocab, segmented):

    - ``vocab``: (piece, cnt, lp) after ``rounds`` hard-EM rounds —
      cnt is the LAST round's raw Viterbi count (0 for unused pieces),
      lp its add-one-smoothed log-prob;
    - ``segmented``: (word, freq, pieces) — each dictionary word's
      LAST E-step segmentation: the round-R Viterbi pass under the
      round-(R-1) table, from which the returned vocab's counts were
      re-estimated. Re-segmenting under the returned table itself could
      differ; the DuckDB oracle replays the same order (seg{R} from
      lp{R-1}), so both engines agree on this contract. It is the
      corpus-wide tokenization lookup (join, never per-occurrence DP).

    Fully distributed: the vocabulary is never collected (the DP reads
    it through a join-built per-word slot map); the only driver scalar
    is the max-word-length guard. Per round: one dictionary-sized join
    + map + hash-agg, with the DP barrier checkpoint in between."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    words, rows = _local_gate(words, local_dict_max)
    if rows is not None:
        _check_word_len_local(rows, max_word_len)
        vocab_rows, seg_rows = _unigram_train_local(
            rows, schedule=[None] * rounds,
            max_piece_len=max_piece_len, vocab_extra=vocab_extra,
        )
        spark = words.sparkSession
        return (
            spark.createDataFrame(vocab_rows, _VOCAB_SCHEMA),
            spark.createDataFrame(seg_rows, _SEG_SCHEMA),
        )
    dp = _guarded_dp(words, max_word_len)
    vocab = _logged(seed_vocab(
        words, max_piece_len=max_piece_len, vocab_extra=vocab_extra
    ))
    seg = None
    for _ in range(rounds):
        vocab, seg = _em_round(
            words, vocab,
            dp=dp, max_word_len=max_word_len, max_piece_len=max_piece_len,
        )
    # dictionary-sized: consumer queries join this repeatedly
    return vocab, seg.localCheckpoint(eager=True)


def _check_word_len_local(rows: list, max_word_len: int) -> None:
    """The _guarded_dp length guard over already-collected rows — same
    loud error, no extra Spark job."""
    too_long = max((len(r["word"]) for r in rows), default=None)
    if too_long is not None and too_long > max_word_len:
        raise ValueError(
            f"dictionary word of length {too_long} exceeds "
            f"max_word_len={max_word_len}; raise it (the DP cost grows "
            f"linearly; a paired DuckDB oracle must unroll at least as "
            f"many CTE steps)"
        )


def _guarded_dp(words: DataFrame, max_word_len: int) -> int:
    """Collect the dictionary's max word length (one bounded scalar),
    raise past the cap, and return the adaptive DP length: a
    6-char-word corpus runs 6-iteration folds regardless of the 32-char
    ceiling (positions past a word's end are NULL no-ops, so any dp_len
    >= the max is exact). Shared by both trainers."""
    too_long = words.agg(F.max(F.length("word")).alias("m")).collect()[0]["m"]
    if too_long is not None and too_long > max_word_len:
        raise ValueError(
            f"dictionary word of length {too_long} exceeds "
            f"max_word_len={max_word_len}; raise it (the DP cost grows "
            f"linearly; a paired DuckDB oracle must unroll at least as "
            f"many CTE steps)"
        )
    return max(1, min(int(too_long or 1), max_word_len))


def _em_round(
    words: DataFrame,
    vocab: DataFrame,
    *,
    dp: int,
    max_word_len: int,
    max_piece_len: int,
    keep: int | None = None,
):
    """ONE hard-EM round — the definition site BOTH trainers share (a
    drifted copy would silently desynchronize the fixed-vocabulary and
    pruning trainers from their common oracle math — r12 review finding
    2): E-step Viterbi under ``vocab``, recount over its pieces,
    optional prune (all single chars + top-``keep`` multi by (cnt desc,
    piece asc)), add-one smooth + round-12 relog, round-boundary
    localCheckpoint (the bpe_train rule: without it the next round's
    lookup join re-analyzes this round's backtrack plan). Returns
    (next vocab, this round's segmentation)."""
    seg = viterbi_segmented(
        words, vocab,
        max_word_len=max_word_len, max_piece_len=max_piece_len, dp_len=dp,
    )
    raw = (
        seg.select("freq", F.explode("pieces").alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").alias("raw"))
    )
    counted = vocab.select("piece").join(raw, "piece", "left").select(
        "piece",
        F.coalesce("raw", F.lit(0)).alias("cnt"),
    )
    if keep is not None:
        chars = counted.filter(F.length("piece") == 1)
        multi = (
            counted.filter(F.length("piece") > 1)
            .orderBy(F.desc("cnt"), F.asc("piece"))
            .limit(keep)
        )
        counted = chars.unionByName(multi)
    smoothed = counted.withColumn("_c1", F.col("cnt") + 1)
    c = smoothed.agg(F.sum("_c1").alias("_ct"))
    nxt = (
        smoothed.crossJoin(F.broadcast(c))
        .select(
            "piece",
            "cnt",
            F.round(F.log("_c1") - F.log("_ct"), 12).alias("lp"),
        )
        .localCheckpoint(eager=True)
    )
    return nxt, seg


def prune_schedule(
    start_extra: int, target_extra: int, shrink: float = 0.5
) -> list[int]:
    """The deterministic multi-char-piece budgets of the pruning stages:
    start_extra shrunk geometrically and floored at target_extra —
    STATIC arithmetic (no data dependence), so the DuckDB oracle embeds
    the same literals. [] when start <= target (nothing to prune)."""
    import math

    if not 0 < shrink < 1:
        raise ValueError("shrink must be in (0, 1)")
    out: list[int] = []
    k = start_extra
    while k > target_extra:
        # min(k - 1, ...) guarantees strict decrease: ceil(k * shrink)
        # equals k whenever shrink >= (k - 1) / k (e.g. shrink=0.9 stalls
        # at k=9), which would loop forever (r12 review finding 1)
        k = max(target_extra, min(k - 1, math.ceil(k * shrink)))
        out.append(k)
    return out


def unigram_train_pruned(
    words: DataFrame,
    *,
    target_extra: int = UNI_VOCAB_EXTRA,
    start_extra: int | None = None,
    shrink: float = 0.5,
    max_piece_len: int = UNI_MAX_PIECE_LEN,
    max_word_len: int = UNI_MAX_WORD_LEN,
    local_dict_max: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Hard-EM unigram training WITH SentencePiece-style vocabulary
    pruning (Kudo 2018 §3.2's size control, in the deterministic
    variant): seed LARGE (``start_extra`` multi-char pieces, default
    4 x target), then alternate one EM round with one pruning step —
    keep all single characters plus the top ``schedule[i]`` multi-char
    pieces by the round's raw Viterbi usage count (cnt desc, piece asc)
    — until the budget reaches ``target_extra``, then one final EM
    round at the target size. Usage-count ranking is the hard-EM
    analogue of the paper's likelihood-loss ranking: with hard counts a
    piece's removal loss is monotone in its Viterbi usage.

    Returns (vocab, segmented) with the unigram_train contract: vocab
    is the final round's smoothed table over the PRUNED set; segmented
    is the last E-step's segmentation. Deterministic end to end
    (integer counts, static prune schedule — :func:`prune_schedule`),
    so the DuckDB oracle retrains the whole shrinking chain
    (plans/unigram_queries.py's pruned rounds).

    Scale: each stage costs exactly one unigram_train round (the prune
    is a vocab-sized TakeOrderedAndProject); the seed pass is the same
    one substring explode regardless of start_extra."""
    if start_extra is None:
        start_extra = 4 * target_extra
    if start_extra < target_extra:
        raise ValueError("start_extra must be >= target_extra")
    schedule = prune_schedule(start_extra, target_extra, shrink) + [None]
    words, rows = _local_gate(words, local_dict_max)
    if rows is not None:
        _check_word_len_local(rows, max_word_len)
        vocab_rows, seg_rows = _unigram_train_local(
            rows, schedule=schedule,
            max_piece_len=max_piece_len, vocab_extra=start_extra,
        )
        spark = words.sparkSession
        return (
            spark.createDataFrame(vocab_rows, _VOCAB_SCHEMA),
            spark.createDataFrame(seg_rows, _SEG_SCHEMA),
        )
    dp = _guarded_dp(words, max_word_len)
    vocab = _logged(seed_vocab(
        words, max_piece_len=max_piece_len, vocab_extra=start_extra
    ))
    seg = None
    for keep in schedule:
        vocab, seg = _em_round(
            words, vocab,
            dp=dp, max_word_len=max_word_len, max_piece_len=max_piece_len,
            keep=keep,
        )
    return vocab, seg.localCheckpoint(eager=True)


def unigram_token_counts(
    docs: DataFrame,
    segmented: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document (n_ws_tokens, n_unigram_tokens) via the trained
    dictionary join — the bpe_token_counts shape: explode corpus words,
    join each word's final segmentation length, sum per doc; docs with
    no tokens keep a zero row. Unseen words fail loudly (train on this
    corpus — the dictionary covers it by construction)."""
    dict_df = segmented.select("word", F.size("pieces").alias("_n_sub"))
    toks = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("word"))
    joined = toks.join(dict_df, "word", "left").withColumn(
        "_n_sub",
        F.when(F.col("_n_sub").isNotNull(), F.col("_n_sub")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("word not in unigram dictionary: "), F.col("word")
                )
            )
        ),
    )
    per_doc = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("_n_ws"),
        F.sum("_n_sub").cast("int").alias("_n_uni"),
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("_n_ws", F.lit(0)).alias("n_ws_tokens"),
            F.coalesce("_n_uni", F.lit(0)).alias("n_unigram_tokens"),
        )
    )
