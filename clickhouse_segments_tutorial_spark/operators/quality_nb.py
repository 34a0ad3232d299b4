"""Hashed n-gram Naive Bayes quality classifier — the learned
statistical text-quality signal (CCNet / fastText-style) next to the
heuristic ``quality_score`` and the corpus bigram-LM NLL.

A weak-supervision seed set (any boolean label column — the registered
query uses the heuristic quality gate as labeler) trains class-
conditional hashed-unigram counts; scoring is a broadcast log-odds join.
Reference parity note: the reference stack delegates text quality to
ClickHouse-side heuristics; this operator is part of the extended
LLM-pipeline surface the build mandates, not a reference port.

Scale design (100 TB corpus):

- **Training is ONE corpus-sized pass**: explode tokens, hash each into
  one of ``n_buckets`` md5-derived buckets, and hash-agg conditional
  counts per bucket (map-side partial combine; the shuffle carries at
  most ``n_buckets`` rows per map task). Class totals ride the same
  aggregation as a 1-row grand total — the only driver materialization
  is 4 scalars + the bucket table.
- **The model IS broadcast-sized by construction**: exactly
  ``n_buckets`` rows (unseen buckets densified with the Laplace prior),
  independent of corpus size — the hashing trick's point. Scoring joins
  exploded corpus tokens to the model with an explicit broadcast and
  per-doc hash-aggs the log-odds sum: no corpus-wide shuffle beyond the
  per-doc grouping, no Python in any row path.
- **Exact integer / pinned-log arithmetic**: all counts are exact
  integer aggregates; every logarithm is ulp-stripped to 12 decimals
  the instant it is taken (the corpus_stats bigram-LM rule — ln() is
  libm-dependent in the last ulp), and the per-doc sum runs in
  DECIMAL(28,14), exact and order/partitioning-independent. A DuckDB
  oracle retrains from scratch and matches bit-for-bit.

Determinism: the bucket hash is the first 15 hex chars of md5 (60-bit
positive bigint — dedup.py's engine-portable hash), so bucket
assignment, counts, and scores are partitioning-invariant and identical
across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import tokens

DEFAULT_BUCKETS = 1024


def hash_bucket(col: Column | str, n_buckets: int = DEFAULT_BUCKETS) -> Column:
    """md5-derived feature bucket in [0, n_buckets): engine-portable
    (DuckDB: ``('0x' || substr(md5(x), 1, 15))::BIGINT % n``)."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(n_buckets))


def nb_train(
    docs: DataFrame,
    *,
    label_col: str,
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> tuple[DataFrame, float]:
    """Train the classifier: returns (model, prior_llr).

    ``model``: exactly ``n_buckets`` rows (bucket, llr) — the Laplace-
    smoothed per-bucket log-likelihood ratio
    ``round(ln((n1+1)/(T1+B)), 12) - round(ln((n0+1)/(T0+B)), 12)``
    where n1/n0 are the bucket's token counts in the positive/negative
    class and T1/T0 the class token totals. ``prior_llr`` is
    ``round(ln((N1+1)/(N0+1)), 12)`` over class DOC counts.

    ``label_col`` must be boolean-valued (the weak-supervision seed
    labels). ONE aggregation over the exploded corpus: its result — the
    sufficient statistic — is at most ``n_buckets`` rows (the hashing
    trick's point), so it is collected and the class token totals summed
    driver-side rather than re-running the corpus-sized explode for them
    (r11 review finding 2) or leaking a persist the caller can't reach.
    The class DOC totals are a label-only scan, no tokenization."""
    lbl = F.col(label_col)
    tok = docs.select(
        lbl.alias("_y"), F.explode(tokens(text_col)).alias("word")
    ).select("_y", hash_bucket("word", n_buckets).alias("bucket"))
    counts = tok.groupBy("bucket").agg(
        F.sum(F.when(F.col("_y"), 1).otherwise(0)).alias("n1"),
        F.sum(F.when(~F.col("_y"), 1).otherwise(0)).alias("n0"),
    )
    rows = counts.collect()  # bounded: <= n_buckets rows, the model's size
    t1 = sum(int(r["n1"] or 0) for r in rows)
    t0 = sum(int(r["n0"] or 0) for r in rows)
    nd = docs.select(
        F.sum(F.when(lbl, 1).otherwise(0)).alias("nd1"),
        F.sum(F.when(~lbl, 1).otherwise(0)).alias("nd0"),
    ).collect()[0]  # bounded: 2 scalars, no explode in the lineage
    return nb_model_from_counts(
        docs.sparkSession,
        docs.sparkSession.createDataFrame(rows, counts.schema),
        t1=t1,
        t0=t0,
        nd1=int(nd["nd1"] or 0),
        nd0=int(nd["nd0"] or 0),
        n_buckets=n_buckets,
    )


def nb_model_from_counts(
    spark,
    counts: DataFrame,
    *,
    t1: int,
    t0: int,
    nd1: int,
    nd0: int,
    n_buckets: int = DEFAULT_BUCKETS,
) -> tuple[DataFrame, float]:
    """Build (model, prior_llr) from the sufficient statistic: per-bucket
    class counts ``(bucket, n1, n0)`` plus the four scalar totals. The
    ONE definition site of the Laplace log-odds math — ``nb_train``
    (single pass) and the incremental wave trainer (accumulated
    wave-tagged counts, plans/quality_nb_queries.py) both delegate here,
    so their models are bit-identical by construction: identical integer
    counts in, identical doubles out."""
    import math

    prior_llr = round(math.log((nd1 + 1.0) / (nd0 + 1.0)), 12)
    dense = (
        spark.range(n_buckets)
        .select(F.col("id").cast("long").alias("bucket"))
        .join(counts, "bucket", "left")
        .select(
            "bucket",
            (
                F.round(
                    F.log(
                        (F.coalesce(F.col("n1"), F.lit(0)) + F.lit(1.0))
                        / F.lit(float(t1 + n_buckets))
                    ),
                    12,
                )
                - F.round(
                    F.log(
                        (F.coalesce(F.col("n0"), F.lit(0)) + F.lit(1.0))
                        / F.lit(float(t0 + n_buckets))
                    ),
                    12,
                )
            ).alias("llr"),
        )
    )
    return dense, prior_llr


def nb_score(
    docs: DataFrame,
    model: DataFrame,
    prior_llr: float,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Per-doc log-odds of the positive class: (id, n_tokens, nb_llr,
    nb_keep). Empty docs score the prior alone (kept via the doc-spine
    left join); ``nb_keep`` is the sign gate ``nb_llr >= 0``. The model
    join is an explicit broadcast (n_buckets rows by construction)."""
    tok = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("word")
    ).select(id_col, hash_bucket("word", n_buckets).alias("bucket"))
    per_doc = (
        tok.join(F.broadcast(model), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("_nt"),
            F.sum(F.col("llr").cast("decimal(28,14)")).alias("_s"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("_nt", F.lit(0)).alias("n_tokens"),
            F.round(
                F.lit(prior_llr) + F.coalesce(F.col("_s").cast("double"), F.lit(0.0)),
                6,
            ).alias("nb_llr"),
        )
        .withColumn("nb_keep", F.col("nb_llr") >= 0)
    )
