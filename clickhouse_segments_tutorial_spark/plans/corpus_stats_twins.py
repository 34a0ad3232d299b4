"""Incremental + streaming twins for the last count-model operators —
TF-IDF and the bigram-LM NLL (r11 verdict item 2) — closing the
batch / incremental / streaming triangle for EVERY learned signal in
quality_signals_docs (novelty, semantic dedup, curation, quota, NB,
BPE, DSIR, MinHash already have theirs).

Both models' corpus-level inputs are associative integer counts, so the
shared operators.wave_counts.WaveCountState chassis applies directly
(storage, replay collapse, compaction, crash healing, resume
numbering), the accumulated state reproduces the batch statistics
EXACTLY under ANY disjoint wave split, and the rebuilt models score
bit-identically to the batch operators — so all four twins SHARE the
batch queries' DuckDB retraining oracles (plans/llm.py):

- **TF-IDF**: the corpus model is (term -> document frequency) plus the
  total document count N. Waves partition the corpus, so per-wave df
  deltas sum to the exact corpus df. Per-doc tf is NOT state — it is
  recomputed from the docs being scored (operators.corpus_stats.
  tfidf_from_stats, the one definition site of the scoring math).
- **Bigram NLL**: the model is C(w1, w2) plus |vocab|. Bigrams never
  span documents, so per-wave bigram counts are associative; C(w1, .)
  folds out of the accumulated bigram counts exactly as in batch.
  |vocab| is a distinct-count (NOT a sum), so state also carries one
  presence row per distinct term per wave — distinctness across waves
  is a set union, which the rebuild's count(DISTINCT key) computes
  exactly. Both statistics share ONE state table: bigram rows under
  key "w1 w2" (terms are pure alnum, so the space separator cannot
  alias) and term-presence rows under the bare term key.

100 TB design: state is vocabulary-sized x waves (Heaps' law — the
bigram table is the largest at O(distinct bigrams), still orders of
magnitude under the corpus); each wave pays one wave-sized explode +
hash-agg; model rebuild reads ONLY the state. The nightly-refresh
pattern: yesterday's corpus is never re-read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.corpus_stats import (
    bigram_nll_from_counts,
    doc_bigrams,
    doc_terms,
    tfidf_from_stats,
)
from ..sources.catalog import load_table
from .registry import QuerySpec


class IncrementalTfidfTrainer:
    """Wave-state twin of ``tfidf_top_terms``: state accumulates
    (term, df) deltas plus a sentinel doc-count row; scoring rebuilds
    the (df, N) model and reuses the batch scorer. The sentinel key is
    the empty string — kept terms match ^[a-z0-9]+$, so no real term
    can collide with it."""

    def __init__(self, spark: SparkSession, workdir: str, *, state_buckets: int = 32):
        from ..operators.wave_counts import WaveCountState

        self.spark = spark
        self._st = WaveCountState(
            spark,
            workdir,
            name="tfidfstate",
            key_col="term",
            key_type="string",
            value_cols=["df", "nd"],
            state_buckets=state_buckets,
        )

    def ingest(self, docs: DataFrame, *, wave_id: int | None = None) -> DataFrame:
        """Fold one wave's df deltas + doc count into state; returns the
        wave's audit row (wave, n_terms, n_docs), pinned under the
        workdir."""
        wave = self._st.resolve_wave(wave_id)
        per_term = (
            doc_terms(docs)
            .select("doc_id", "term")
            .distinct()
            .groupBy("term")
            .agg(
                F.count(F.lit(1)).cast("long").alias("df"),
                F.lit(0).cast("long").alias("nd"),
            )
        )
        doc_row = docs.agg(
            F.lit("").alias("term"),
            F.lit(0).cast("long").alias("df"),
            F.count(F.lit(1)).cast("long").alias("nd"),
        )
        delta = per_term.unionByName(doc_row).persist()
        try:
            audit = delta.groupBy().agg(
                F.lit(wave).alias("wave"),
                F.sum(F.when(F.col("term") != "", 1).otherwise(0)).alias("n_terms"),
                F.sum("nd").alias("n_docs"),
            )
            # pin the audit BEFORE the state append (read-your-writes rule)
            pinned = self._st.pin_audit(audit, wave)
            self._st.append(delta, wave)
        finally:
            delta.unpersist()
        return pinned

    def model(self) -> tuple[DataFrame, DataFrame]:
        """(df_table, n_docs) rebuilt from state — identical to the
        batch statistics over the concatenation of every wave."""
        s = self._st.read()
        df_table = (
            s.filter(F.col("term") != "")
            .groupBy("term")
            .agg(F.sum("df").alias("df"))
        )
        n_docs = s.agg(F.sum("nd").alias("_n"))
        return df_table, n_docs

    def score(self, docs: DataFrame, *, k: int = 5) -> DataFrame:
        df_table, n_docs = self.model()
        return tfidf_from_stats(docs, df_table, n_docs, k=k)

    def compact(self) -> None:
        self._st.compact(self._st._wave)

    def reset(self) -> None:
        self._st.reset()

    def drop_state(self) -> None:
        self._st.drop()


class IncrementalBigramNLLTrainer:
    """Wave-state twin of ``bigram_nll``: one state table holds both
    statistics — bigram rows keyed "w1 w2" with the wave's c12 delta,
    and zero-count term-presence rows keyed by the bare term (class
    docstring). Scoring rebuilds (C(w1,w2), |vocab|) and reuses the
    batch scorer."""

    def __init__(self, spark: SparkSession, workdir: str, *, state_buckets: int = 32):
        from ..operators.wave_counts import WaveCountState

        self.spark = spark
        self._st = WaveCountState(
            spark,
            workdir,
            name="bigramstate",
            key_col="gram",
            key_type="string",
            value_cols=["c12"],
            state_buckets=state_buckets,
        )

    def ingest(self, docs: DataFrame, *, wave_id: int | None = None) -> DataFrame:
        """Fold one wave's bigram counts + term presences into state;
        returns the wave's audit row (wave, n_bigrams, n_terms)."""
        wave = self._st.resolve_wave(wave_id)
        big = doc_bigrams(docs).groupBy(
            F.concat_ws(" ", "w1", "w2").alias("gram")
        ).agg(F.count(F.lit(1)).cast("long").alias("c12"))
        pres = (
            doc_terms(docs)
            .select(F.col("term").alias("gram"))
            .distinct()
            .withColumn("c12", F.lit(0).cast("long"))
        )
        delta = big.unionByName(pres).persist()
        try:
            audit = delta.groupBy().agg(
                F.lit(wave).alias("wave"),
                F.sum("c12").alias("n_bigrams"),
                F.sum(F.when(F.col("c12") == 0, 1).otherwise(0)).alias("n_terms"),
            )
            pinned = self._st.pin_audit(audit, wave)
            self._st.append(delta, wave)
        finally:
            delta.unpersist()
        return pinned

    def model(self) -> tuple[DataFrame, DataFrame]:
        """(big_c, vocab) rebuilt from state. Bigram keys split back on
        the single space; |vocab| counts DISTINCT bare-term keys (the
        set-union across waves)."""
        s = self._st.read()
        grams = s.groupBy("gram").agg(F.sum("c12").alias("c12"))
        is_bigram = F.col("gram").contains(" ")
        big_c = grams.filter(is_bigram).select(
            F.split_part("gram", F.lit(" "), F.lit(1)).alias("w1"),
            F.split_part("gram", F.lit(" "), F.lit(2)).alias("w2"),
            "c12",
        )
        vocab = grams.filter(~is_bigram).agg(
            F.count(F.lit(1)).alias("_v")
        )
        return big_c, vocab

    def score(self, docs: DataFrame) -> DataFrame:
        big_c, vocab = self.model()
        return bigram_nll_from_counts(docs, big_c, vocab)

    def compact(self) -> None:
        self._st.compact(self._st._wave)

    def reset(self) -> None:
        self._st.reset()

    def drop_state(self) -> None:
        self._st.drop()


def _two_waves(spark: SparkSession, sf_dir: str, trainer) -> DataFrame:
    """Reset, ingest `documents` as two doc_id-median waves, score the
    full corpus — the shared incremental-query choreography (no
    wave-order contract: counts are associative)."""
    docs = load_table(spark, sf_dir, "documents")
    mid = docs.agg(F.expr("percentile_approx(doc_id, 0.5)")).collect()[0][0]
    trainer.reset()
    trainer.ingest(docs.filter(F.col("doc_id") < mid))
    trainer.ingest(docs.filter(F.col("doc_id") >= mid))
    return trainer.score(docs)


def _streamed(spark: SparkSession, sf_dir: str, trainer, workdir: str) -> DataFrame:
    """The trainer driven by the generic streaming wave gate
    (streaming/stream_curation.py) — checkpointed file stream, two wave
    files, foreachBatch ingest — then the rebuilt model scores the
    corpus. Shares the batch retraining oracle."""
    from ..streaming.stream_curation import StreamingWaveGate

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    mid = docs.agg(F.expr("percentile_approx(doc_id, 0.5)")).collect()[0][0]
    gate = StreamingWaveGate(spark, workdir, schema=docs.schema, ingestor=trainer)
    gate.reset_state()
    docs.filter(F.col("doc_id") < mid).coalesce(1).write.mode("append").parquet(
        gate.in_dir
    )
    gate.run_available_now()
    docs.filter(F.col("doc_id") >= mid).coalesce(1).write.mode("append").parquet(
        gate.in_dir
    )
    gate.run_available_now()
    return trainer.score(load_table(spark, sf_dir, "documents"))


def tfidf_top_terms_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF's TWO wave-state lanes in ONE registered query (the r15
    verdict item 3 consolidation shape — the former _incremental /
    _streaming twins share one trainer, IncrementalTfidfTrainer):

    - lane 'incremental': two doc_id-median waves folded as bucketed
      (term, df) state deltas; the rebuilt (df, N) model scores the
      full corpus bit-identically to batch;
    - lane 'streaming': the same trainer behind the actual Structured
      Streaming wave gate.

    The oracle UNION ALLs one batch retraining replay per lane, so the
    hash match proves each maintenance mode reproduces the batch model
    exactly on real data, per round."""
    from .curation import _stream_scratch

    incr = _two_waves(
        spark, sf_dir, IncrementalTfidfTrainer(spark, _stream_scratch("tfidf_incr"))
    )
    workdir = _stream_scratch("tfidf_streaming")
    stream = _streamed(
        spark, sf_dir,
        IncrementalTfidfTrainer(spark, f"{workdir}/state"), workdir,
    )
    return incr.select(F.lit("incremental").alias("lane"), "*").unionByName(
        stream.select(F.lit("streaming").alias("lane"), "*")
    )


def bigram_lm_nll_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM NLL's incremental + streaming lanes in one registered
    query — the tfidf_top_terms_lifecycle pattern over
    IncrementalBigramNLLTrainer (bucketed bigram-count state; shares
    bigram_lm_nll_docs' retraining oracle, one replay per lane)."""
    from .curation import _stream_scratch

    incr = _two_waves(
        spark, sf_dir,
        IncrementalBigramNLLTrainer(spark, _stream_scratch("bigram_incr")),
    )
    workdir = _stream_scratch("bigram_streaming")
    stream = _streamed(
        spark, sf_dir,
        IncrementalBigramNLLTrainer(spark, f"{workdir}/state"), workdir,
    )
    return incr.select(F.lit("incremental").alias("lane"), "*").unionByName(
        stream.select(F.lit("streaming").alias("lane"), "*")
    )


def _oracles():
    from .llm import _BIGRAM_NLL_ORACLE, _TFIDF_ORACLE

    return _TFIDF_ORACLE, _BIGRAM_NLL_ORACLE


_TFIDF_ORACLE, _BIGRAM_NLL_ORACLE = _oracles()


def _lifecycle_oracle(base: str) -> str:
    return (
        f"SELECT 'incremental' AS lane, * FROM ({base}) "
        f"UNION ALL SELECT 'streaming' AS lane, * FROM ({base})"
    )


QUERIES = [
    QuerySpec(
        "tfidf_top_terms_lifecycle",
        tfidf_top_terms_lifecycle,
        _lifecycle_oracle(_TFIDF_ORACLE),
    ),
    QuerySpec(
        "bigram_lm_nll_lifecycle",
        bigram_lm_nll_lifecycle,
        _lifecycle_oracle(_BIGRAM_NLL_ORACLE),
    ),
]


def _kmv_trainer(spark: SparkSession, workdir: str):
    from ..operators.kmv import IncrementalKmvVocab

    return IncrementalKmvVocab(spark, workdir, k=128)


def vocab_kmv_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-language vocab KMV sketch maintained INCREMENTALLY over
    two doc_id-median waves (operators/kmv.IncrementalKmvVocab on the
    shared wave chassis): per-wave bottom-k hash rows + source-presence
    rows fold to exactly the batch sketch (merge-closure), so this
    shares vocab_kmv_per_lang's oracle — the hash match proves the
    incremental fold equals the batch bottom-k on real data."""
    from .curation import _stream_scratch

    docs = load_table(spark, sf_dir, "documents")
    mid = docs.agg(F.expr("percentile_approx(doc_id, 0.5)")).collect()[0][0]
    trainer = _kmv_trainer(spark, _stream_scratch("kmv_incr"))
    trainer.reset()
    trainer.ingest(docs.filter(F.col("doc_id") < mid))
    trainer.ingest(docs.filter(F.col("doc_id") >= mid))
    return trainer.score()


def vocab_kmv_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vocab KMV trainer behind the streaming wave gate — the
    batch/incremental/streaming triangle closed for the sketch family;
    shares the batch oracle."""
    from ..streaming.stream_curation import StreamingWaveGate
    from .curation import _stream_scratch

    workdir = _stream_scratch("kmv_streaming")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    mid = docs.agg(F.expr("percentile_approx(doc_id, 0.5)")).collect()[0][0]
    trainer = _kmv_trainer(spark, f"{workdir}/state")
    gate = StreamingWaveGate(
        spark, workdir, schema=docs.schema, ingestor=trainer
    )
    gate.reset_state()
    docs.filter(F.col("doc_id") < mid).coalesce(1).write.mode(
        "append"
    ).parquet(gate.in_dir)
    gate.run_available_now()
    docs.filter(F.col("doc_id") >= mid).coalesce(1).write.mode(
        "append"
    ).parquet(gate.in_dir)
    gate.run_available_now()
    return trainer.score()


def _kmv_oracle():
    from .relational import _KMV_VOCAB_ORACLE

    return _KMV_VOCAB_ORACLE


QUERIES.extend(
    [
        QuerySpec("vocab_kmv_incremental", vocab_kmv_incremental, _kmv_oracle()),
        QuerySpec("vocab_kmv_streaming", vocab_kmv_streaming, _kmv_oracle()),
    ]
)


def _qhist_trainer(spark: SparkSession, workdir: str):
    from ..operators.quantile_sketch import IncrementalQuantileHist
    from .relational import _QBINS, _QHI, _QLO

    return IncrementalQuantileHist(
        spark, workdir, group_col="o_orderpriority",
        value_col="o_totalprice", lo=_QLO, hi=_QHI, bins=_QBINS,
    )


def order_quantiles_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The order-value quantile sketch maintained INCREMENTALLY over
    two o_orderkey-median waves (operators/quantile_sketch.
    IncrementalQuantileHist on the shared wave chassis): per-wave
    (priority, bin) count deltas sum to exactly the batch histogram, so
    this shares order_value_quantiles_merged's oracle — the hash match
    proves the incremental fold equals the batch sketch on real data.
    Yesterday's orders are never re-read to answer today's p99."""
    from .curation import _stream_scratch

    orders = load_table(spark, sf_dir, "orders")
    mid = orders.agg(F.expr("percentile_approx(o_orderkey, 0.5)")).collect()[0][0]
    trainer = _qhist_trainer(spark, _stream_scratch("qhist_incr"))
    trainer.reset()
    trainer.ingest(orders.filter(F.col("o_orderkey") < mid))
    trainer.ingest(orders.filter(F.col("o_orderkey") >= mid))
    return trainer.score()


def order_quantiles_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quantile-sketch trainer behind the streaming wave gate — the
    batch/incremental/streaming triangle closed for the quantileState
    family; shares the batch oracle."""
    from ..streaming.stream_curation import StreamingWaveGate
    from .curation import _stream_scratch

    workdir = _stream_scratch("qhist_streaming")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    mid = orders.agg(F.expr("percentile_approx(o_orderkey, 0.5)")).collect()[0][0]
    trainer = _qhist_trainer(spark, f"{workdir}/state")
    gate = StreamingWaveGate(
        spark, workdir, schema=orders.schema, ingestor=trainer
    )
    gate.reset_state()
    orders.filter(F.col("o_orderkey") < mid).coalesce(1).write.mode(
        "append"
    ).parquet(gate.in_dir)
    gate.run_available_now()
    orders.filter(F.col("o_orderkey") >= mid).coalesce(1).write.mode(
        "append"
    ).parquet(gate.in_dir)
    gate.run_available_now()
    return trainer.score()


def order_quantiles_deleted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quantile sketch's TAKEDOWN lane (the deleted-twin shape of
    novelty_ngram_deleted / semantic_dedup_deleted / minhash_near_dup_
    deleted, closed for the count-state family): ingest the full
    corpus, then RETRACT every o_orderkey % 7 == 3 as a wave of
    negative deltas — count state is exactly invertible, so the
    rebuilt estimates equal the batch sketch over the surviving rows
    bit-for-bit, proven by an oracle that computes the histogram
    directly over the FILTERED corpus. No reset, no re-ingest of
    history (contrast the bottom-k sketch, where takedown is
    rebuild-on-delete by design)."""
    from .curation import _stream_scratch

    orders = load_table(spark, sf_dir, "orders")
    trainer = _qhist_trainer(spark, _stream_scratch("qhist_deleted"))
    trainer.reset()
    trainer.ingest(orders, wave_id=1)
    trainer.retract(orders.filter(F.col("o_orderkey") % 7 == 3), wave_id=2)
    return trainer.score()


def _qhist_oracle():
    from .relational import _QSKETCH_MERGED_ORACLE

    return _QSKETCH_MERGED_ORACLE


def _qhist_deleted_oracle():
    from .relational import _qsketch_merged_oracle

    return _qsketch_merged_oracle("NOT (o_orderkey % 7 = 3)")


QUERIES.extend(
    [
        QuerySpec(
            "order_quantiles_incremental",
            order_quantiles_incremental,
            _qhist_oracle(),
        ),
        QuerySpec(
            "order_quantiles_streaming",
            order_quantiles_streaming,
            _qhist_oracle(),
        ),
        QuerySpec(
            "order_quantiles_deleted",
            order_quantiles_deleted,
            _qhist_deleted_oracle(),
        ),
    ]
)


def _cms_trainer(spark: SparkSession, workdir: str):
    from ..operators.cms import IncrementalCms

    return IncrementalCms(spark, workdir, d=4, w=512)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def heavy_user_counts_cms_lifecycle(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The CMS's THREE wave-state lanes in ONE registered query (r15
    verdict item 3: the five near-duplicate cms lanes consolidated so
    registry rotation depth stays bounded — this absorbs the former
    _incremental / _streaming / _deleted twins; the lanes share one
    operator, operators/cms.IncrementalCms on the wave chassis):

    - lane 'incremental': two ts-median waves folded as cell deltas —
      per-wave deltas sum to exactly the batch counters;
    - lane 'streaming': the same trainer behind the actual Structured
      Streaming wave gate (StreamingWaveGate), closing the
      batch/incremental/streaming triangle;
    - lane 'deleted': the TAKEDOWN path — ingest everything, then
      retract every user_id % 5 == 2 user's events as negative deltas
      (counters are exactly invertible), scored over the survivors.

    Output (lane, user_id, n_events, cms_est). The oracle UNION ALLs
    one batch replay per lane — full corpus for the first two,
    filtered corpus for the takedown — so the hash match proves each
    maintenance mode reproduces its batch sketch bit-for-bit on real
    data, per round."""
    from ..streaming.stream_curation import StreamingWaveGate
    from .curation import _stream_scratch

    ev = _events(spark, sf_dir)
    mid = ev.agg(
        F.expr("percentile_approx(unix_timestamp(ts), 0.5)")
    ).collect()[0][0]
    early = ev.filter(F.unix_timestamp("ts") < mid)
    late = ev.filter(F.unix_timestamp("ts") >= mid)

    incr = _cms_trainer(spark, _stream_scratch("cms_incr"))
    incr.reset()
    incr.ingest(early)
    incr.ingest(late)

    stream_dir = _stream_scratch("cms_streaming")
    ev_slim = ev.select("user_id", "ts")
    streaming = _cms_trainer(spark, f"{stream_dir}/state")
    gate = StreamingWaveGate(
        spark, stream_dir, schema=ev_slim.schema, ingestor=streaming
    )
    gate.reset_state()
    for wave in (
        ev_slim.filter(F.unix_timestamp("ts") < mid),
        ev_slim.filter(F.unix_timestamp("ts") >= mid),
    ):
        wave.coalesce(1).write.mode("append").parquet(gate.in_dir)
        gate.run_available_now()

    deleted = _cms_trainer(spark, _stream_scratch("cms_deleted"))
    deleted.reset()
    deleted.ingest(ev, wave_id=1)
    deleted.retract(ev.filter(F.col("user_id") % 5 == 2), wave_id=2)

    return (
        incr.score(ev)
        .select(F.lit("incremental").alias("lane"), "*")
        .unionByName(
            streaming.score(ev).select(F.lit("streaming").alias("lane"), "*")
        )
        .unionByName(
            deleted.score(ev.filter(F.col("user_id") % 5 != 2)).select(
                F.lit("deleted").alias("lane"), "*"
            )
        )
    )


def _cms_lifecycle_oracle():
    from .relational import _cms_oracle

    return (
        f"SELECT * FROM ({_cms_oracle(lane='incremental')}) "
        f"UNION ALL SELECT * FROM ({_cms_oracle(lane='streaming')}) "
        f"UNION ALL SELECT * FROM ("
        f"{_cms_oracle('NOT (user_id % 5 = 2)', lane='deleted')})"
    )


QUERIES.extend(
    [
        QuerySpec(
            "heavy_user_counts_cms_lifecycle",
            heavy_user_counts_cms_lifecycle,
            _cms_lifecycle_oracle(),
        ),
    ]
)


def _mapagg_trainer(spark: SparkSession, workdir: str):
    from ..operators.map_agg import IncrementalMapAgg

    return IncrementalMapAgg(spark, workdir)


def user_event_type_maps_lifecycle(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The sumMap-family aggregate's THREE wave-state lanes in ONE
    registered query (r16 verdict item 7 — agg_maps is associative per
    (group, key), so it slots onto the wave chassis exactly like the
    CMS and quantile-histogram trainers; operator:
    operators/map_agg.IncrementalMapAgg):

    - lane 'incremental': two ts-median waves of events folded as
      (user, type) partials — deltas sum to exactly the batch maps;
    - lane 'streaming': the same trainer behind the actual Structured
      Streaming wave gate (StreamingWaveGate);
    - lane 'deleted': the takedown path — ingest everything, then
      retract every user_id % 5 == 2 user's events ENTIRELY (count
      deltas invert exactly; whole-group erasure is the supported
      takedown for the non-invertible max map — see the operator doc).

    Output (lane, user_id, count_map, max_map) in the batch query's
    canonical sorted rendering; the oracle UNION ALLs one batch replay
    per lane (full corpus twice, survivors for the takedown), so each
    maintenance mode is hash-proven to reproduce the batch maps."""
    from ..streaming.stream_curation import StreamingWaveGate
    from .curation import _stream_scratch
    from .relational import _render_kv

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", "ts"
    )
    mid = ev.agg(
        F.expr("percentile_approx(unix_timestamp(ts), 0.5)")
    ).collect()[0][0]

    incr = _mapagg_trainer(spark, _stream_scratch("mapagg_incr"))
    incr.reset()
    incr.ingest(ev.filter(F.unix_timestamp("ts") < mid))
    incr.ingest(ev.filter(F.unix_timestamp("ts") >= mid))

    stream_dir = _stream_scratch("mapagg_streaming")
    ev_slim = ev.select("user_id", "event_type", "event_id", "ts")
    streaming = _mapagg_trainer(spark, f"{stream_dir}/state")
    gate = StreamingWaveGate(
        spark, stream_dir, schema=ev_slim.schema, ingestor=streaming
    )
    gate.reset_state()
    for wave in (
        ev_slim.filter(F.unix_timestamp("ts") < mid),
        ev_slim.filter(F.unix_timestamp("ts") >= mid),
    ):
        wave.coalesce(1).write.mode("append").parquet(gate.in_dir)
        gate.run_available_now()

    deleted = _mapagg_trainer(spark, _stream_scratch("mapagg_deleted"))
    deleted.reset()
    deleted.ingest(ev, wave_id=1)
    deleted.retract(ev.filter(F.col("user_id") % 5 == 2), wave_id=2)

    def render(trainer):
        m = trainer.merged()
        from ..operators.map_agg import agg_maps

        arrs = agg_maps(
            m, ["user_id"], "event_type",
            {"_counts": ("c", "sum"), "_maxes": ("m", "max")},
        )
        return arrs.select(
            "user_id",
            _render_kv(F.col("map_keys"), F.col("_counts")).alias("count_map"),
            _render_kv(F.col("map_keys"), F.col("_maxes")).alias("max_map"),
        )

    return (
        render(incr)
        .select(F.lit("incremental").alias("lane"), "*")
        .unionByName(
            render(streaming).select(F.lit("streaming").alias("lane"), "*")
        )
        .unionByName(
            render(deleted).select(F.lit("deleted").alias("lane"), "*")
        )
    )


def _mapagg_lifecycle_oracle():
    from .relational import _map_agg_oracle

    return (
        f"SELECT * FROM ({_map_agg_oracle(lane='incremental')}) "
        f"UNION ALL SELECT * FROM ({_map_agg_oracle(lane='streaming')}) "
        f"UNION ALL SELECT * FROM ("
        f"{_map_agg_oracle('NOT (user_id % 5 = 2)', lane='deleted')})"
    )


QUERIES.extend(
    [
        QuerySpec(
            "user_event_type_maps_lifecycle",
            user_event_type_maps_lifecycle,
            _mapagg_lifecycle_oracle(),
        ),
    ]
)
