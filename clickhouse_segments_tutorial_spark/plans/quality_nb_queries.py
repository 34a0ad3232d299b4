"""Registered queries for the hashed n-gram Naive Bayes quality
classifier (operators/quality_nb.py, r10 verdict item 6).

Weak supervision: the heuristic quality gate (``quality_score >= 0.5``,
the C4/Gopher-style rule the engine already oracles) labels the seed
set; the NB model then scores every document from hashed-unigram
statistics — the CCNet/fastText-style learned signal whose keep set
diverges from the labeler on documents whose VOCABULARY resembles the
other class.

Oracle strategy: the whole train-then-score chain is exact integer
counts + ulp-stripped logs (round(ln, 12), the bigram-LM rule) +
DECIMAL(28,14) order-independent sums, so the DuckDB oracle RETRAINS
from scratch — one shared CTE chain (:func:`_nb_sql`) spliced over the
raw ``documents`` table for the standalone scorer and over the
pipeline's ``clean`` stage for the NB-gated corpus build
(pipeline._corpus_pipeline_ctes' ``filt_sql`` seam).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.quality_nb import (
    DEFAULT_BUCKETS,
    hash_bucket,
    nb_model_from_counts,
    nb_score,
    nb_train,
)
from ..operators.text import quality_score, token_count, tokens
from ..sources.catalog import load_table
from .pipeline import _corpus_pipeline_ctes, _toks, _WS, corpus_pipeline_stages
from .registry import QuerySpec

# Seed-label threshold: the heuristic gate's own keep bar. ONE
# definition site for Spark and the oracle f-strings.
NB_LABEL_MIN_QUALITY = 0.5


def _quality_sql(t: str, text: str) -> str:
    """The quality_score heuristic over a token-array column ``t`` and a
    text column ``text`` — textually identical to the pipeline oracle's
    stage-7 expression."""
    return f"""round((least(CAST(len({t}) AS DOUBLE) / 50.0, 1.0)
         + (1.0 - least((CASE WHEN length({text}) = 0 THEN 0.0
                ELSE CAST(length({text}) - length(regexp_replace({text}, '[^\\w{_WS[1:]}', '', 'g')) AS DOUBLE)
                     / length({text}) END) * 5, 1.0))
         + least((CASE WHEN len({t}) = 0 THEN 0.0
                ELSE CAST(len(list_filter({t}, x -> lower(x) IN
                       ('the','and','of','to','is','you','that','it'))) AS DOUBLE)
                     / len({t}) END) * 4, 1.0)) / 3.0, 6)"""


def _nb_sql(src: str, n_buckets: int = DEFAULT_BUCKETS) -> str:
    """The NB retraining chain over a CTE/table ``src`` exposing
    (doc_id, lang, text): weak labels, hashed-bucket class counts,
    Laplace log-odds model densified over all buckets, per-doc scores.
    Ends with ``nb_scores(doc_id, n_tokens, nb_llr)``."""
    return f"""
nb_src AS (SELECT doc_id, lang, text, {_toks("text")} AS t FROM {src}),
nb_lbl AS (
  SELECT *, {_quality_sql("t", "text")} >= {NB_LABEL_MIN_QUALITY} AS y
  FROM nb_src
),
nb_tok AS (
  SELECT doc_id, y,
         ('0x' || substr(md5(word), 1, 15))::BIGINT % {n_buckets} AS bucket
  FROM (SELECT doc_id, y, unnest(t) AS word FROM nb_lbl)
),
nb_cnt AS (
  SELECT bucket, count(*) FILTER (y) AS n1, count(*) FILTER (NOT y) AS n0
  FROM nb_tok GROUP BY bucket
),
nb_tot AS (
  SELECT count(*) FILTER (y) AS t1, count(*) FILTER (NOT y) AS t0 FROM nb_tok
),
nb_doc AS (
  SELECT count(*) FILTER (y) AS nd1, count(*) FILTER (NOT y) AS nd0 FROM nb_lbl
),
nb_model AS (
  SELECT r.range AS bucket,
         round(ln((coalesce(c.n1, 0) + 1.0) / (t.t1 + {n_buckets})), 12)
       - round(ln((coalesce(c.n0, 0) + 1.0) / (t.t0 + {n_buckets})), 12) AS llr
  FROM range(0, {n_buckets}) r LEFT JOIN nb_cnt c ON r.range = c.bucket, nb_tot t
),
nb_prior AS (SELECT round(ln((nd1 + 1.0) / (nd0 + 1.0)), 12) AS p FROM nb_doc),
nb_sum AS (
  SELECT doc_id, CAST(count(*) AS INT) AS nt,
         CAST(sum(CAST(m.llr AS DECIMAL(28,14))) AS DOUBLE) AS s
  FROM nb_tok k JOIN nb_model m USING (bucket) GROUP BY doc_id
),
nb_scores AS (
  SELECT l.doc_id,
         CAST(coalesce(u.nt, 0) AS INT) AS n_tokens,
         round(p.p + coalesce(u.s, 0.0), 6) AS nb_llr
  FROM nb_lbl l LEFT JOIN nb_sum u USING (doc_id), nb_prior p
)"""


def quality_nb_scores_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train NB on the whole corpus under heuristic weak labels, score
    every document: (doc_id, n_tokens, nb_llr, nb_keep). Two corpus
    passes (one training hash-agg, one scoring hash-agg over a broadcast
    model), zero Python row paths."""
    docs = load_table(spark, sf_dir, "documents")
    labeled = docs.withColumn(
        "_y", quality_score("text") >= NB_LABEL_MIN_QUALITY
    )
    model, prior = nb_train(labeled, label_col="_y")
    return nb_score(docs, model, prior)


_NB_SCORES_ORACLE = f"""
WITH {_nb_sql("documents")}
SELECT doc_id, n_tokens, nb_llr, nb_llr >= 0 AS nb_keep FROM nb_scores
"""


def _nb_gate(clean: DataFrame) -> DataFrame:
    """The pipeline's alternative stage-7 gate: retrain NB on the
    decontaminated train docs (heuristic labels), keep nb_llr >= 0
    within the usual length bounds."""
    labeled = clean.withColumn(
        "_y", quality_score("text") >= NB_LABEL_MIN_QUALITY
    )
    model, prior = nb_train(labeled, label_col="_y")
    keep = nb_score(clean, model, prior).filter("nb_keep").select("doc_id")
    return clean.join(keep, "doc_id", "left_semi").filter(
        token_count("text").between(10, 5000)
    )


def corpus_pipeline_nb_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full corpus build with the LEARNED quality gate composed in
    place of the heuristic (pipeline stage 7): identical dedup /
    decontamination / mixture / packing chain, but the quality decision
    is the NB log-odds sign. The oracle replays the entire pipeline AND
    the NB retraining through the shared filt_sql seam."""
    from .llm import _MIX_WEIGHTS

    return corpus_pipeline_stages(
        load_table(spark, sf_dir, "documents"),
        mix_weights=_MIX_WEIGHTS,
        quality_gate=_nb_gate,
    )["packed"]


_NB_FILT_SQL = f"""
-- stage 7 (alternative): learned NB quality gate, retrained on `clean`
{_nb_sql("clean").lstrip()},
filt AS MATERIALIZED (
  SELECT l.doc_id, l.lang, l.t, len(l.t) AS n_tokens
  FROM nb_lbl l JOIN nb_scores s USING (doc_id)
  WHERE s.nb_llr >= 0 AND len(l.t) BETWEEN 10 AND 5000
)"""


def _pipeline_nb_oracle() -> str:
    from .llm import _MIX_WEIGHTS

    return _corpus_pipeline_ctes(_MIX_WEIGHTS, filt_sql=_NB_FILT_SQL) + """
SELECT doc_id, epoch, chunk_idx, n_chunk_tokens, shard,
       CAST(seq_id AS INTEGER) AS seq_id
FROM pack
"""


class IncrementalNBTrainer:
    """Wave-state twin of ``nb_train`` — the batch / incremental /
    streaming triangle (novelty, sem-dedup, curation, quota) closed for
    the learned quality classifier.

    The hashed-count model makes this the EASY leg: per-bucket class
    counts plus four scalar totals are a sufficient statistic, and
    counts are associative — so a wave contributes O(wave tokens) of
    delta rows, the accumulated state reproduces the batch counts
    EXACTLY (integer sums in any order), and the rebuilt model is
    bit-identical to retraining from scratch
    (``nb_model_from_counts`` is the one definition site of the llr
    math). Unlike the novelty/curation twins, NO wave-order contract is
    needed: ingest waves in any split, the final scores match batch.

    State = ONE bucketed table of wave-tagged rows
    ``(_b, _w, n1, n0, nd1, nd0)`` managed by the shared
    operators.wave_counts.WaveCountState chassis (storage, replay
    collapse, compaction, healing, resume numbering — see that module's
    docstring for the crash/replay contract): real buckets carry token
    counts, one sentinel row per wave (``_b = -1``) carries the wave's
    class DOC counts — a single atomic append per wave. Class token
    totals are derived (sum over buckets), never stored.

    100 TB design: training state is ``n_buckets x n_waves`` rows
    REGARDLESS of corpus size (the hashing trick), the per-wave pass is
    one hash-agg over the wave, and model rebuild + scoring reuse the
    batch operator's broadcast-join plan. Nightly-model-refresh without
    re-reading a byte of historical text is exactly this pattern."""

    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        *,
        n_buckets: int = DEFAULT_BUCKETS,
        state_buckets: int = 32,
    ):
        from ..operators.wave_counts import WaveCountState

        self.spark, self.workdir = spark, workdir
        self.n_buckets = n_buckets
        self._st = WaveCountState(
            spark,
            workdir,
            name="nbstate",
            key_col="_b",
            key_type="long",
            value_cols=["n1", "n0", "nd1", "nd0"],
            state_buckets=state_buckets,
        )

    def ingest(self, docs: DataFrame, *, wave_id: int | None = None) -> DataFrame:
        """Fold one wave's counts into state; returns the wave's audit
        row (wave, nd1, nd0, wt1, wt0 — class doc/token counts of THIS
        wave), pinned under the workdir. The model itself is rebuilt on
        demand (:meth:`model` / :meth:`score`)."""
        wave = self._st.resolve_wave(wave_id)
        lbl = docs.withColumn("_y", quality_score("text") >= NB_LABEL_MIN_QUALITY)
        tok = lbl.select(
            "_y", F.explode(tokens("text")).alias("word")
        ).select("_y", hash_bucket("word", self.n_buckets).alias("_b"))
        bucket_rows = tok.groupBy("_b").agg(
            F.sum(F.when(F.col("_y"), 1).otherwise(0)).alias("n1"),
            F.sum(F.when(~F.col("_y"), 1).otherwise(0)).alias("n0"),
            F.lit(0).cast("long").alias("nd1"),
            F.lit(0).cast("long").alias("nd0"),
        )
        doc_row = lbl.agg(
            F.lit(-1).cast("long").alias("_b"),
            F.lit(0).cast("long").alias("n1"),
            F.lit(0).cast("long").alias("n0"),
            F.sum(F.when(F.col("_y"), 1).otherwise(0)).cast("long").alias("nd1"),
            F.sum(F.when(~F.col("_y"), 1).otherwise(0)).cast("long").alias("nd0"),
        )
        # The wave delta feeds TWO writes (audit pin, state append);
        # persist it for their duration so the wave-sized tokenize+agg
        # runs once, not twice per micro-batch (r11 review finding 3).
        delta = (
            bucket_rows.select("_b", "n1", "n0", "nd1", "nd0")
            .unionByName(doc_row)
            .na.fill(0)
        ).persist()
        try:
            audit = delta.groupBy().agg(
                F.lit(wave).alias("wave"),
                F.sum("nd1").alias("nd1"),
                F.sum("nd0").alias("nd0"),
                F.sum(F.when(F.col("_b") >= 0, F.col("n1")).otherwise(0)).alias("wt1"),
                F.sum(F.when(F.col("_b") >= 0, F.col("n0")).otherwise(0)).alias("wt0"),
            )
            # pin the audit BEFORE the state append (read-your-writes rule)
            pinned = self._st.pin_audit(audit, wave)
            self._st.append(delta, wave)
        finally:
            delta.unpersist()
        return pinned

    def model(self) -> tuple[DataFrame, float]:
        """(model, prior_llr) from the accumulated counts — bit-identical
        to ``nb_train`` over the concatenation of every ingested wave."""
        s = self._st.read()
        tot = s.agg(
            F.sum(F.when(F.col("_b") >= 0, F.col("n1")).otherwise(0)).alias("t1"),
            F.sum(F.when(F.col("_b") >= 0, F.col("n0")).otherwise(0)).alias("t0"),
            F.sum("nd1").alias("nd1"),
            F.sum("nd0").alias("nd0"),
        ).collect()[0]  # bounded: exactly 4 scalars
        counts = (
            s.filter(F.col("_b") >= 0)
            .groupBy(F.col("_b").alias("bucket"))
            .agg(F.sum("n1").alias("n1"), F.sum("n0").alias("n0"))
        )
        return nb_model_from_counts(
            self.spark,
            counts,
            t1=int(tot["t1"] or 0),
            t0=int(tot["t0"] or 0),
            nd1=int(tot["nd1"] or 0),
            nd0=int(tot["nd0"] or 0),
            n_buckets=self.n_buckets,
        )

    def score(self, docs: DataFrame) -> DataFrame:
        model, prior = self.model()
        return nb_score(docs, model, prior, n_buckets=self.n_buckets)

    def compact(self) -> None:
        """Fold appended files to one per bucket, PRESERVING wave tags
        (one row per (_b, _w)) so replays of already-compacted waves
        still collapse instead of double-counting."""
        self._st.compact(self._st._wave)

    def reset(self) -> None:
        self._st.reset()

    def drop_state(self) -> None:
        self._st.drop()


def quality_nb_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NB trainer run INCREMENTALLY over two waves with bucketed
    count-state between them; the accumulated sufficient statistic
    rebuilds the batch model exactly, so the final scores over the full
    corpus SHARE quality_nb_scores_docs' retraining oracle. No wave-order
    contract: counts are associative."""
    from .curation import _stream_scratch

    docs = load_table(spark, sf_dir, "documents")
    mid = docs.agg(F.expr("percentile_approx(doc_id, 0.5)")).collect()[0][0]
    tr = IncrementalNBTrainer(spark, _stream_scratch("nb_incremental"))
    tr.reset()
    tr.ingest(docs.filter(F.col("doc_id") < mid))
    tr.ingest(docs.filter(F.col("doc_id") >= mid))
    return tr.score(docs)


def quality_nb_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NB trainer driven by the generic streaming wave gate
    (streaming/stream_curation.py): a checkpointed file stream drains
    wave files into IncrementalNBTrainer via foreachBatch (per-batch
    audit rows in results/), then the final model — rebuilt from the
    gate-accumulated count state — scores the full corpus. Shares the
    batch retraining oracle."""
    from ..streaming.stream_curation import StreamingWaveGate
    from .curation import _stream_scratch

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    mid = docs.agg(F.expr("percentile_approx(doc_id, 0.5)")).collect()[0][0]
    workdir = _stream_scratch("nb_streaming")
    tr = IncrementalNBTrainer(spark, f"{workdir}/state")
    gate = StreamingWaveGate(spark, workdir, schema=docs.schema, ingestor=tr)
    gate.reset_state()
    docs.filter(F.col("doc_id") < mid).coalesce(1).write.mode("append").parquet(
        gate.in_dir
    )
    gate.run_available_now()
    docs.filter(F.col("doc_id") >= mid).coalesce(1).write.mode("append").parquet(
        gate.in_dir
    )
    gate.run_available_now()
    return tr.score(docs)


QUERIES = [
    QuerySpec("quality_nb_scores_docs", quality_nb_scores_docs, _NB_SCORES_ORACLE),
    QuerySpec("corpus_pipeline_nb_docs", corpus_pipeline_nb_docs, _pipeline_nb_oracle()),
    QuerySpec("quality_nb_incremental", quality_nb_incremental, _NB_SCORES_ORACLE),
    QuerySpec("quality_nb_streaming", quality_nb_streaming, _NB_SCORES_ORACLE),
]
