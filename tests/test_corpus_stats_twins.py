"""Unit tests for the TF-IDF / bigram-NLL incremental trainers
(plans/corpus_stats_twins.py) — the wave-state twins closing the
batch/incremental/streaming triangle for the last count-model signals
(r11 verdict item 2). Mirrors the IncrementalNBTrainer test contract:
batch-equality under ANY split, and replay/compact safety."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_segments_tutorial_spark.operators.corpus_stats import (
    bigram_nll,
    tfidf_top_terms,
)
from clickhouse_segments_tutorial_spark.plans.corpus_stats_twins import (
    IncrementalBigramNLLTrainer,
    IncrementalTfidfTrainer,
)
from clickhouse_segments_tutorial_spark.sources.catalog import load_table


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_tfidf_incremental_equals_batch_any_split(spark, tmp_path):
    """(term, df) deltas + the doc count are a sufficient statistic:
    any disjoint wave split reproduces the batch top-k bit-for-bit
    (the scorer is the shared tfidf_from_stats)."""
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    batch = _rows(tfidf_top_terms(docs, k=5))
    tr = IncrementalTfidfTrainer(spark, str(tmp_path / "tfidf"))
    tr.reset()
    # interleaved split — no wave-order contract
    for k in range(3):
        tr.ingest(docs.filter(F.col("doc_id") % 3 == k))
    assert _rows(tr.score(docs, k=5)) == batch
    tr.drop_state()


def test_bigram_incremental_equals_batch_any_split(spark, tmp_path):
    """Bigram counts never span documents and |vocab| is the set union
    of per-wave term presences, so any disjoint split reproduces the
    batch NLL bit-for-bit (shared bigram_nll_from_counts scorer)."""
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    batch = _rows(bigram_nll(docs))
    tr = IncrementalBigramNLLTrainer(spark, str(tmp_path / "bigram"))
    tr.reset()
    for k in range(3):
        tr.ingest(docs.filter(F.col("doc_id") % 3 == k))
    assert _rows(tr.score(docs)) == batch
    tr.drop_state()


def test_tfidf_replay_and_compact_safe(spark, tmp_path):
    """The WaveCountState crash contract: a wave re-ingested under its
    original wave_id (crash replay) appends duplicate wave-tagged rows
    the max()-collapse read must ignore, including after compact()."""
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").filter(
        F.col("doc_id") < 200
    )
    batch = _rows(tfidf_top_terms(docs, k=5))
    tr = IncrementalTfidfTrainer(spark, str(tmp_path / "tfidf"))
    tr.reset()
    w1 = docs.filter(F.col("doc_id") % 2 == 0)
    w2 = docs.filter(F.col("doc_id") % 2 == 1)
    tr.ingest(w1, wave_id=1)
    tr.ingest(w2, wave_id=2)
    tr.ingest(w2, wave_id=2)  # crash-replay of wave 2
    assert _rows(tr.score(docs, k=5)) == batch
    tr.compact()
    assert _rows(tr.score(docs, k=5)) == batch
    tr.ingest(w1, wave_id=1)  # replay of an already-compacted wave
    assert _rows(tr.score(docs, k=5)) == batch
    tr.drop_state()


def test_bigram_replay_and_compact_safe(spark, tmp_path):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").filter(
        F.col("doc_id") < 200
    )
    batch = _rows(bigram_nll(docs))
    tr = IncrementalBigramNLLTrainer(spark, str(tmp_path / "bigram"))
    tr.reset()
    w1 = docs.filter(F.col("doc_id") % 2 == 0)
    w2 = docs.filter(F.col("doc_id") % 2 == 1)
    tr.ingest(w1, wave_id=1)
    tr.ingest(w2, wave_id=2)
    tr.ingest(w2, wave_id=2)
    assert _rows(tr.score(docs)) == batch
    tr.compact()
    assert _rows(tr.score(docs)) == batch
    tr.ingest(w1, wave_id=1)
    assert _rows(tr.score(docs)) == batch
    tr.drop_state()


def test_bigram_state_key_cannot_alias(spark, tmp_path):
    """The single state table mixes bigram keys ("w1 w2") with bare-term
    presence keys; kept terms are pure alnum so the space separator
    cannot alias — pinned by scoring a corpus whose raw text TRIES to
    collide (a token containing a space is impossible post-tokenization,
    and punctuation-bearing tokens normalize or drop)."""
    docs = spark.createDataFrame(
        [(1, "ab cd ab"), (2, "ab-cd ef!"), (3, "x")],
        "doc_id long, text string",
    )
    batch = _rows(bigram_nll(docs))
    tr = IncrementalBigramNLLTrainer(spark, str(tmp_path / "bg"))
    tr.reset()
    tr.ingest(docs.filter(F.col("doc_id") <= 1))
    tr.ingest(docs.filter(F.col("doc_id") > 1))
    assert _rows(tr.score(docs)) == batch
    big_c, vocab = tr.model()
    # kept terms: ab, cd, ef, x ("ab-cd" drops on interior punctuation,
    # "ef!" normalizes to ef) — |vocab| = 4, bigrams only from doc 1
    assert vocab.collect()[0][0] == 4
    assert {(r.w1, r.w2) for r in big_c.collect()} == {("ab", "cd"), ("cd", "ab")}
    tr.drop_state()


def test_scoring_out_of_corpus_docs_is_smoothed_not_dropped(spark, tmp_path):
    """The from-stats scorers' nightly-refresh contract (r12 review
    finding 3): a NEW doc scored against an accumulated model must keep
    its unseen terms/transitions under the formulas' own smoothing —
    df = 0 in the idf, (0+1)/(0+V) for an unseen bigram — not silently
    drop them through an inner join."""
    import math

    train = spark.createDataFrame(
        [(1, "ab cd ab"), (2, "ab ef")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(9, "zz qq zz")], "doc_id long, text string"
    )

    tf_tr = IncrementalTfidfTrainer(spark, str(tmp_path / "t"))
    tf_tr.reset()
    tf_tr.ingest(train)
    got = {r.term: r for r in tf_tr.score(new, k=5).collect()}
    # both unseen terms survive with df = 0 and the smoothed idf
    assert set(got) == {"zz", "qq"}
    assert got["zz"].df == 0 and got["zz"].tf == 2
    assert got["zz"].tfidf == round(2 * (math.log(3.0 / 1.0) + 1.0), 6)
    tf_tr.drop_state()

    bg_tr = IncrementalBigramNLLTrainer(spark, str(tmp_path / "b"))
    bg_tr.reset()
    bg_tr.ingest(train)
    row = bg_tr.score(new).filter(F.col("doc_id") == 9).collect()[0]
    # two transitions, both unseen: p = (0+1)/(0+V), V = 3 (ab, cd, ef)
    assert row.n_bigrams == 2
    assert row.avg_nll == round(-round(math.log(1.0 / 3.0), 12), 6)
    bg_tr.drop_state()


def test_kmv_vocab_incremental_split_invariant_and_replay_safe(spark, tmp_path):
    """IncrementalKmvVocab: the rebuilt per-language sketch estimate is
    IDENTICAL under any disjoint wave split (merge-closure made
    operational — one wave, two median waves, two mod-2 waves all
    rebuild the same bottom-k), and the WaveCountState crash contract
    holds: replayed waves (including after compact) change nothing.
    Batch equality itself is the shared driver oracle
    (vocab_kmv_per_lang / _incremental / _streaming all hash against
    the same SQL)."""
    from clickhouse_segments_tutorial_spark.operators.kmv import (
        IncrementalKmvVocab,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").filter(
        F.col("doc_id") < 200
    )

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    one = IncrementalKmvVocab(spark, str(tmp_path / "one"), k=64)
    one.reset()
    one.ingest(docs, wave_id=1)
    expected = rows(one.score())
    assert expected  # non-empty: every language stratum present

    tr = IncrementalKmvVocab(spark, str(tmp_path / "mod2"), k=64)
    tr.reset()
    w1 = docs.filter(F.col("doc_id") % 2 == 0)
    w2 = docs.filter(F.col("doc_id") % 2 == 1)
    tr.ingest(w1, wave_id=1)
    tr.ingest(w2, wave_id=2)
    assert rows(tr.score()) == expected
    tr.ingest(w2, wave_id=2)  # crash replay
    assert rows(tr.score()) == expected
    tr.compact()
    assert rows(tr.score()) == expected
    tr.ingest(w1, wave_id=1)  # replay of an already-compacted wave
    assert rows(tr.score()) == expected


def test_qhist_incremental_split_invariant_and_replay_safe(spark, tmp_path):
    """IncrementalQuantileHist: the rebuilt merged quantile estimates
    are IDENTICAL under any disjoint wave split (histogram counts are
    associative — one wave, mod-2 waves, mod-3 waves all rebuild the
    same dense arrays), the rebuilt per-group sketches equal the batch
    hist_sketch arrays exactly, and the WaveCountState crash contract
    holds: replayed waves (including after compact) change nothing.
    Batch equality itself is the shared driver oracle
    (order_value_quantiles_merged / order_quantiles_{incremental,
    streaming} all hash against the same SQL)."""
    from clickhouse_segments_tutorial_spark.operators.quantile_sketch import (
        IncrementalQuantileHist,
        hist_sketch,
    )

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    lo, hi, bins = 0.0, 600_000.0, 240

    def mk(path):
        return IncrementalQuantileHist(
            spark, str(tmp_path / path), group_col="o_orderpriority",
            value_col="o_totalprice", lo=lo, hi=hi, bins=bins,
        )

    one = mk("one")
    one.reset()
    one.ingest(orders, wave_id=1)
    expected = _rows(one.score())
    assert expected and expected[0][0] > 0

    # rebuilt per-group sketches == batch hist_sketch arrays, exactly
    batch_sk = {
        r["o_orderpriority"]: r["sketch"]
        for r in hist_sketch(
            orders, ["o_orderpriority"], "o_totalprice",
            lo=lo, hi=hi, bins=bins,
        ).collect()
    }
    incr_sk = {
        r["o_orderpriority"]: r["sketch"] for r in one.sketches().collect()
    }
    assert incr_sk == batch_sk

    tr = mk("mod3")
    tr.reset()
    waves = [orders.filter(F.col("o_orderkey") % 3 == k) for k in range(3)]
    for i, w in enumerate(waves):
        tr.ingest(w, wave_id=i + 1)
    assert _rows(tr.score()) == expected
    tr.ingest(waves[1], wave_id=2)  # crash replay
    assert _rows(tr.score()) == expected
    tr.compact()
    assert _rows(tr.score()) == expected
    tr.ingest(waves[0], wave_id=1)  # replay of an already-compacted wave
    assert _rows(tr.score()) == expected


def test_qhist_retraction_is_exact_inverse(spark, tmp_path):
    """retract() folds negative deltas: after retracting a subset the
    rebuilt per-group sketches equal the batch hist_sketch over the
    surviving rows EXACTLY (count state is invertible); retracting
    everything ingested leaves all-zero sketches whose estimates are
    NULL; the retraction survives compact()."""
    from clickhouse_segments_tutorial_spark.operators.quantile_sketch import (
        IncrementalQuantileHist,
        hist_sketch,
    )

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    lo, hi, bins = 0.0, 600_000.0, 240
    tr = IncrementalQuantileHist(
        spark, str(tmp_path / "ret"), group_col="o_orderpriority",
        value_col="o_totalprice", lo=lo, hi=hi, bins=bins,
    )
    tr.reset()
    tr.ingest(orders, wave_id=1)
    gone = orders.filter(F.col("o_orderkey") % 7 == 3)
    tr.retract(gone, wave_id=2)

    surviving = orders.filter(F.col("o_orderkey") % 7 != 3)
    batch_sk = {
        r["o_orderpriority"]: r["sketch"]
        for r in hist_sketch(
            surviving, ["o_orderpriority"], "o_totalprice",
            lo=lo, hi=hi, bins=bins,
        ).collect()
    }
    got = {r["o_orderpriority"]: r["sketch"] for r in tr.sketches().collect()}
    assert got == batch_sk
    expected = _rows(tr.score())

    tr.compact()
    assert _rows(tr.score()) == expected

    tr.retract(surviving, wave_id=3)  # retract the rest -> empty state
    row = tr.score().collect()[0]
    assert row.n_orders == 0
    assert row.p50 is None and row.p99 is None


def test_cms_incremental_split_invariant_replay_and_retraction(spark, tmp_path):
    """IncrementalCms: the rebuilt counter table equals the batch
    cms_sketch under any disjoint wave split (cell deltas are
    associative); the WaveCountState crash contract holds (replayed
    waves, including after compact, change nothing); retraction is an
    exact inverse (rebuilt counters equal the batch sketch of the
    surviving rows, and retracting everything empties the sparse
    table)."""
    from clickhouse_segments_tutorial_spark.operators.cms import (
        IncrementalCms,
        cms_sketch,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id", "ts"
    )

    def counters(df):
        return {(r.row, r.col): r.c for r in df.collect()}

    batch = counters(cms_sketch(ev, "user_id", d=4, w=512))

    tr = IncrementalCms(spark, str(tmp_path / "cms"), d=4, w=512)
    tr.reset()
    waves = [ev.filter(F.col("user_id") % 3 == k) for k in range(3)]
    for i, wv in enumerate(waves):
        tr.ingest(wv, wave_id=i + 1)
    assert counters(tr.sketch()) == batch
    tr.ingest(waves[1], wave_id=2)  # crash replay
    assert counters(tr.sketch()) == batch
    tr.compact()
    assert counters(tr.sketch()) == batch

    gone = ev.filter(F.col("user_id") % 5 == 2)
    tr.retract(gone, wave_id=4)
    surviving = ev.filter(F.col("user_id") % 5 != 2)
    assert counters(tr.sketch()) == counters(
        cms_sketch(surviving, "user_id", d=4, w=512)
    )
    tr.retract(surviving, wave_id=5)
    assert tr.sketch().count() == 0  # sparse table fully zeroed out


def test_qhist_key_separator_guard_fails_loud(spark, tmp_path):
    """A group value containing the state-key separator ':' must fail
    the ingest loudly (a silent concat would alias two groups' bins
    into one state row)."""
    from clickhouse_segments_tutorial_spark.operators.quantile_sketch import (
        IncrementalQuantileHist,
    )

    import pytest

    tr = IncrementalQuantileHist(
        spark, str(tmp_path / "guard"), group_col="g", value_col="v",
        lo=0.0, hi=10.0, bins=4,
    )
    tr.reset()
    bad = spark.createDataFrame([("a:b", 1.0)], "g string, v double")
    with pytest.raises(Exception, match="key separator"):
        tr.ingest(bad, wave_id=1)


def test_incremental_map_agg_waves_compaction_and_takedown(spark, tmp_path):
    """IncrementalMapAgg (operators/map_agg.py, the sumMap-family wave
    trainer): (a) two disjoint waves rebuild exactly the batch
    (group, key) aggregation; (b) compaction preserves the merged maps;
    (c) whole-group retraction drops the group entirely (the supported
    takedown — the non-invertible max never surfaces); (d) a replayed
    wave (same wave_id, byte-identical delta) cannot double-count."""
    from pyspark.sql import functions as F

    from clickhouse_segments_tutorial_spark.operators.map_agg import (
        IncrementalMapAgg,
    )

    rows = [
        (1, "view", 10), (1, "view", 11), (1, "click", 12),
        (2, "view", 20), (2, "purchase", 21), (2, "purchase", 22),
        (3, "click", 30),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, event_id long"
    )
    want = sorted(
        (r.user_id, r.event_type, r.c, r.m)
        for r in ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"), F.max("event_id").alias("m"))
        .collect()
    )

    tr = IncrementalMapAgg(spark, str(tmp_path / "st"))
    tr.reset()
    tr.ingest(ev.filter(F.col("event_id") < 20), wave_id=1)
    tr.ingest(ev.filter(F.col("event_id") >= 20), wave_id=2)

    def got():
        return sorted(
            (r.user_id, r.event_type, r.c, r.m) for r in tr.merged().collect()
        )

    assert got() == want

    # replayed wave: byte-identical append under the same tag, no change
    tr._st.append(
        ev.filter(F.col("event_id") >= 20)
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("_c"), F.max("event_id").alias("_m"))
        .select(
            F.concat(
                F.col("user_id").cast("string"), F.lit(":"),
                F.col("event_type"),
            ).alias("key"),
            F.col("_c").cast("long").alias("cnt"),
            F.col("_m").cast("long").alias("mx"),
        ),
        2,
    )
    assert got() == want

    tr.compact(2)
    assert got() == want

    # whole-group takedown: user 2 vanishes, others untouched
    tr.retract(ev.filter(F.col("user_id") == 2), wave_id=3)
    assert got() == [t for t in want if t[0] != 2]
