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

from ..operators.quality_nb import DEFAULT_BUCKETS, nb_score, nb_train
from ..operators.text import quality_score, token_count
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


QUERIES = [
    QuerySpec("quality_nb_scores_docs", quality_nb_scores_docs, _NB_SCORES_ORACLE),
    QuerySpec("corpus_pipeline_nb_docs", corpus_pipeline_nb_docs, _pipeline_nb_oracle()),
]
