"""DSIR-style data selection: hashed n-gram importance resampling.

Data Selection with Importance Resampling (Xie et al., 2023 — public
method, widely used for LLM pre-training corpus selection) picks raw
documents that RESEMBLE a target distribution: fit two bag-of-hashed-
n-gram generative models — one on the target set, one on the raw pool —
score every raw document with its log importance weight
``log p_target(doc) - log p_raw(doc)``, and resample proportionally to
the weights. Where the Naive Bayes classifier (operators/quality_nb.py)
answers "which class is this doc" discriminatively, DSIR answers "how
much more likely is this doc under the target corpus distribution" and
turns that into a principled sampling rate — the standard tool for
"make the mixture look like Wikipedia+books" style selection.

Reference parity note: the reference stack (dittofeed/clickhouse-
segments-tutorial) has no data-selection surface; this operator extends
the engine per the driver's training-data-pipeline mandate.

Feature space: hashed unigrams AND word bigrams (the paper's space) —
each token and each adjacent token pair hashes into one of
``n_buckets`` md5-derived buckets (operators/quality_nb.hash_bucket,
engine-portable). Per-bucket importance log-ratio under add-one
smoothing:

    lam_b = round(ln((t_b + 1)/(T + B)), 12)
          - round(ln((r_b + 1)/(R + B)), 12)

with t_b/r_b the bucket's feature counts in the target/raw sets and
T/R their totals. A document's log weight is the sum of ``lam`` over
its feature INSTANCES (multiplicity included — the doc's log-likelihood
ratio under the two unigram-over-features models), accumulated in
DECIMAL(28,14) so the sum is exact and partitioning-independent, then
rounded to 6 decimals. Every ln is ulp-stripped to 12 decimals the
instant it is taken (the engine's bigram-LM rule), so a DuckDB oracle
retraining from scratch matches bit-for-bit.

Resampling is DETERMINISTIC Bernoulli in log space: document i is
accepted iff

    round(ln(u_i), 12) <= lw_i - tau,      u_i = (h_i + 1) / 2^60

where h_i is the first 15 hex chars of md5('dsir:' || doc_id) (the
engine's portable 60-bit hash, SALTED so the draw is independent of
every other md5(doc_id) consumer — see DSIR_ACCEPT_SALT) — i.e.
acceptance probability min(1, exp(lw_i - tau)). No RNG state, no order
dependence: the draw is a pure column expression, reproducible across
engines and partitionings, the same design as deterministic_shuffle /
sample_stratified.

Scale design (100 TB):

- **Training is ONE corpus-sized pass**: explode features, hash-agg
  per-bucket (raw, target) counts with map-side partial combine; the
  shuffle carries at most ``n_buckets`` rows per map task. The
  sufficient statistic is <= n_buckets rows and is collected (the
  hashing trick makes the model broadcast-sized by construction).
- **Scoring is one explode + broadcast join + per-doc hash-agg** — no
  corpus-wide shuffle beyond the per-doc grouping, no Python row paths.
- **Resampling is map-only**: a filter on two column expressions, zero
  shuffles, embarrassingly parallel — the selection step costs one scan
  at any corpus size.
- Counts are associative, so the incremental/streaming twins
  (plans/dsir_queries.py) accumulate (bucket, raw, tgt) deltas on the
  shared WaveCountState chassis and rebuild the batch model exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .quality_nb import DEFAULT_BUCKETS, hash_bucket
from .text import spread, tokens

# Acceptance threshold tau in log space: accept probability is
# min(1, exp(lw - tau)). 0.0 keeps every doc at least as target-like as
# raw (lw >= 0) and thins the rest proportionally to their importance
# weight — the pure importance-resampling rule.
DSIR_TAU = 0.0

# 2^60: the engine's md5-prefix hash is 60 bits; (h+1)/2^60 is an exact
# dyadic rational in (0, 1], identical as a double in every engine.
_TWO60 = float(1 << 60)


def dsir_features(t: Column) -> Column:
    """Unigram + adjacent-bigram feature strings from a MATERIALIZED
    token-array column, as one array (bigrams joined with a single
    space). Empty/one-token docs contribute their unigrams only.

    ``t`` MUST be a named column holding the token array (stage it with
    ``withColumn("_t", tokens(text))``), never an inline
    ``tokens(text)`` expression: inlined, the bigram transform re-runs
    the regex tokenization per array ELEMENT — the Gopher-gate
    O(tokens^2) lesson (measured 7.6 s vs <1 s for the sf0.1 feature
    explode). :func:`_staged_features` is the shared staging helper.

    The bigram strings come from text.ngrams_from_tokens — the ONE
    definition site of the space-joined adjacent-n-gram format the SQL
    oracles replicate (r11 second-review finding 2)."""
    from .text import ngrams_from_tokens

    return F.concat(t, ngrams_from_tokens(t, 2))


def _staged_features(
    docs: DataFrame, text_col: str, keep: list[Column]
) -> DataFrame:
    """(*keep, _f): the exploded feature stream with the token array
    computed ONCE per row (materialized as a named column so Catalyst's
    project-collapse cannot inline the tokenization into every array
    element)."""
    return (
        # spread first: tokenize + bigram-build + bucket-hash are per-row
        # CPU over the raw scan's few partitions (the text_stats rule)
        spread(docs)
        .withColumn("_dsir_t", tokens(text_col))
        .select(*keep, F.explode(dsir_features(F.col("_dsir_t"))).alias("_f"))
    )


def dsir_train(
    docs: DataFrame,
    *,
    target_col: str,
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Fit the per-bucket importance log-ratios: returns the model —
    at most ``n_buckets`` rows (bucket, lam).

    ``target_col`` must be boolean (True = the doc belongs to the
    target set); the raw distribution is ALL docs. ONE corpus-sized
    explode + hash-agg; the
    <= n_buckets sufficient statistic is collected and rebuilt as a
    local frame (the nb_train rule: never re-run the corpus lineage for
    totals, never leak an unreachable persist)."""
    feats = _staged_features(
        docs, text_col, [F.col(target_col).alias("_y")]
    ).select("_y", hash_bucket("_f", n_buckets).alias("bucket"))
    counts = feats.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("raw_n"),
        F.sum(F.when(F.col("_y"), 1).otherwise(0)).alias("tgt_n"),
    )
    rows = counts.collect()  # bounded: <= n_buckets rows, the model's size
    return dsir_model_from_counts(
        docs.sparkSession,
        docs.sparkSession.createDataFrame(rows, counts.schema),
        n_buckets=n_buckets,
    )


def dsir_train_score(
    docs: DataFrame,
    *,
    target_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
) -> tuple[DataFrame, DataFrame]:
    """Fit the model AND score every document from ONE tokenize pass.

    ``dsir_train(docs) ; dsir_score(docs, model)`` tokenizes, bigram-
    builds and md5-hashes the whole corpus TWICE — and that per-row CPU
    is the operator's dominant cost (the shuffle is n_buckets-bounded
    either way). Here the (doc_id, _y, bucket) feature stream is staged
    once and persisted (guide §5: reused twice, corpus-sized to
    recompute; MEMORY_AND_DISK spills rather than OOMs at scale), the
    <= n_buckets sufficient statistic folds off it, and scoring joins
    the SAME stream — expressions identical to the two-pass form, so
    (model, scores) are bit-identical to dsir_train + dsir_score.
    Returns (model, scored)."""
    from pyspark import StorageLevel

    feats = (
        _staged_features(
            docs, text_col, [F.col(id_col).alias("doc_id"), F.col(target_col).alias("_y")]
        )
        .select("doc_id", "_y", hash_bucket("_f", n_buckets).alias("bucket"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = feats.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("raw_n"),
        F.sum(F.when(F.col("_y"), 1).otherwise(0)).alias("tgt_n"),
    )
    rows = counts.collect()  # bounded: <= n_buckets rows; materializes feats
    spark = docs.sparkSession
    model = dsir_model_from_counts(
        spark, spark.createDataFrame(rows, counts.schema), n_buckets=n_buckets
    )
    scored = dsir_score(
        docs, model,
        text_col=text_col, id_col=id_col, n_buckets=n_buckets,
        feats=feats.select("doc_id", "bucket"),
    )
    return model, scored


def dsir_model_from_counts(
    spark,
    counts: DataFrame,
    *,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """(bucket, lam) from the sufficient statistic (bucket, raw_n,
    tgt_n). The ONE definition site of the smoothed log-ratio math —
    the batch trainer and the incremental wave trainer
    (plans/dsir_queries.py) both delegate here, so their models are
    bit-identical for identical integer counts. Totals are summed from
    ``counts`` itself (exact integers, at most n_buckets summands).

    The model is DENSIFIED to exactly ``n_buckets`` rows (the NB-model
    rule): buckets unseen in training get the pure-smoothing lam, so
    scoring an out-of-training-vocabulary document still counts every
    feature instead of silently dropping unseen buckets at the join."""
    tot = counts.agg(
        F.coalesce(F.sum("raw_n"), F.lit(0)).cast("long").alias("r"),
        F.coalesce(F.sum("tgt_n"), F.lit(0)).cast("long").alias("t"),
    ).collect()[0]  # bounded: 2 scalars over a <= n_buckets-row local frame
    return (
        spark.range(n_buckets)
        .select(F.col("id").cast("long").alias("bucket"))
        # counts is <= n_buckets local rows: without the hint the planner
        # sort-merge-joins two 4096-row sides (2 Exchanges + 2 Sorts of
        # pure job overhead in the model path, observed in the
        # dsir_weights_docs plan); broadcasting the bounded side is
        # always safe here (guide §3.1)
        .join(F.broadcast(counts), "bucket", "left")
        .select(
            "bucket",
            (
                F.round(
                    F.log(
                        (F.coalesce(F.col("tgt_n"), F.lit(0)) + F.lit(1.0))
                        / F.lit(float(int(tot["t"]) + n_buckets))
                    ),
                    12,
                )
                - F.round(
                    F.log(
                        (F.coalesce(F.col("raw_n"), F.lit(0)) + F.lit(1.0))
                        / F.lit(float(int(tot["r"]) + n_buckets))
                    ),
                    12,
                )
            ).alias("lam"),
        )
    )


def dsir_score(
    docs: DataFrame,
    model: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
    feats: DataFrame | None = None,
) -> DataFrame:
    """Per-document importance log-weights: (doc_id, n_feats, dsir_lw).

    Explode features, broadcast-join the <= n_buckets-row model,
    DECIMAL-exact per-doc sum of the 12-decimal lams, round to 6.
    Feature-less (empty) docs score 0.0 with n_feats = 0 — neutral
    weight, so resampling keeps them at the tau = 0 base rate rather
    than silently dropping them.

    ``feats``: optional precomputed (doc_id, bucket) feature stream —
    a caller that also folds the SAME wave's counts (the online
    retrain-then-admit ingestor) passes one persisted frame to both so
    the wave is tokenized once, not twice."""
    if feats is None:
        feats = _staged_features(
            docs, text_col, [F.col(id_col).alias("doc_id")]
        ).select("doc_id", hash_bucket("_f", n_buckets).alias("bucket"))
    summed = (
        feats.join(F.broadcast(model), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col("lam").cast("decimal(28,14)")).cast("double").alias("_s"),
        )
    )
    return docs.select(F.col(id_col).alias("doc_id")).join(
        summed, "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce(F.col("_n"), F.lit(0)).cast("int").alias("n_feats"),
        F.round(F.coalesce(F.col("_s"), F.lit(0.0)), 6).alias("dsir_lw"),
    )


# Salt for the acceptance draw's hash key. The draw MUST NOT hash the
# bare doc_id: other deterministic samplers consume md5(doc_id) prefixes
# (train_test_split's hash_draw), so on a frame they already filtered —
# e.g. the pipeline's train side — the bare draw is CONDITIONED (every
# surviving doc has u >= eval_fraction, so sub-unity acceptance rates
# are systematically under-kept and the low-weight tail can never be
# accepted; r11 second-review finding 1). Salting decorrelates the two
# draws — the deterministic_shuffle rule.
DSIR_ACCEPT_SALT = "dsir"


def dsir_accept(id_col: str | Column = "doc_id", *, tau: float = DSIR_TAU) -> Column:
    """Deterministic Bernoulli acceptance predicate over a scored frame
    carrying ``dsir_lw``: accept iff round(ln(u), 12) <= dsir_lw - tau
    with u the doc's SALTED md5-derived uniform draw in (0, 1] —
    acceptance probability min(1, exp(dsir_lw - tau)), reproducible
    across engines and partitionings (module docstring), independent of
    every other md5(key) consumer (DSIR_ACCEPT_SALT note)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    key = F.concat_ws(":", F.lit(DSIR_ACCEPT_SALT), c.cast("string"))
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(_TWO60)
    return F.round(F.log(u), 12) <= F.col("dsir_lw") - F.lit(tau)
