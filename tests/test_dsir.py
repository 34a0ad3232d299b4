"""DSIR importance resampling (operators/dsir.py): feature space,
model/score semantics on hand-crafted fixtures, deterministic
resampling, incremental == batch bit-identity, replay safety.
Corpus-level retraining-oracle parity lives in test_oracle_parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_segments_tutorial_spark.operators.dsir import (
    dsir_accept,
    dsir_features,
    dsir_score,
    dsir_train,
)


def _seed(spark):
    # target class speaks one vocabulary, the raw remainder another
    rows = [(i, "alpha beta gamma delta", True) for i in range(1, 7)]
    rows += [(i, "xerox yankee zulu", False) for i in range(7, 12)]
    return spark.createDataFrame(rows, "doc_id long, text string, y boolean")


def test_features_are_unigrams_plus_adjacent_bigrams(spark):
    from clickhouse_segments_tutorial_spark.operators.text import tokens

    got = (
        spark.createDataFrame(
            [(1, "a b c"), (2, "solo"), (3, "  "), (4, "x\ty")],
            "doc_id long, text string",
        )
        .withColumn("_t", tokens("text"))
        .select("doc_id", dsir_features(F.col("_t")).alias("f"))
        .collect()
    )
    by_id = {r["doc_id"]: r["f"] for r in got}
    assert by_id[1] == ["a", "b", "c", "a b", "b c"]
    assert by_id[2] == ["solo"]  # one token: no bigrams
    assert by_id[3] == []  # whitespace-only: no features
    assert by_id[4] == ["x", "y", "x y"]  # any whitespace splits


def test_weights_separate_target_from_raw(spark):
    docs = _seed(spark)
    model = dsir_train(docs, target_col="y")
    scored = {r["doc_id"]: r for r in dsir_score(docs, model).collect()}
    # target-vocabulary docs must carry strictly higher weights
    assert min(scored[i]["dsir_lw"] for i in range(1, 7)) > max(
        scored[i]["dsir_lw"] for i in range(7, 12)
    )
    # 4 unigrams + 3 bigrams
    assert scored[1]["n_feats"] == 7
    # an unseen-vocabulary doc scores all-zero-count buckets: lam sums
    # of smoothing-only terms — still defined, no NULLs
    extra = spark.createDataFrame([(99, "quux corge")], "doc_id long, text string")
    row = dsir_score(extra, model).collect()[0]
    assert row["n_feats"] == 3 and row["dsir_lw"] is not None


def test_empty_doc_scores_neutral_zero(spark):
    docs = _seed(spark)
    model = dsir_train(docs, target_col="y")
    row = dsir_score(
        spark.createDataFrame([(50, "")], "doc_id long, text string"), model
    ).collect()[0]
    assert (row["n_feats"], row["dsir_lw"]) == (0, 0.0)


def test_resample_is_a_deterministic_weighted_subset(spark):
    docs = _seed(spark)
    model = dsir_train(docs, target_col="y")
    scored = dsir_score(docs, model)
    kept1 = sorted(r["doc_id"] for r in scored.filter(dsir_accept("doc_id")).collect())
    kept2 = sorted(r["doc_id"] for r in scored.filter(dsir_accept("doc_id")).collect())
    assert kept1 == kept2  # pure column expression: no RNG state
    # every target-like doc has lw > 0 => accept probability 1
    assert set(range(1, 7)) <= set(kept1)
    # partitioning cannot change the draw
    kept3 = sorted(
        r["doc_id"]
        for r in dsir_score(docs.repartition(7), model)
        .filter(dsir_accept("doc_id"))
        .collect()
    )
    assert kept3 == kept1


def test_incremental_matches_batch_bitwise_any_split(spark, tmp_path):
    from clickhouse_segments_tutorial_spark.operators.text import quality_score
    from clickhouse_segments_tutorial_spark.plans.dsir_queries import (
        NB_LABEL_MIN_QUALITY,
        IncrementalDSIRTrainer,
    )

    docs = _seed(spark).select("doc_id", "text")
    # the trainer labels via the shared heuristic; batch must too
    labeled = docs.withColumn("_y", quality_score("text") >= NB_LABEL_MIN_QUALITY)
    batch = sorted(
        map(tuple, dsir_score(docs, dsir_train(labeled, target_col="_y")).collect())
    )
    tr = IncrementalDSIRTrainer(spark, str(tmp_path / "dsir"))
    tr.reset()
    try:
        # three waves, ingested out of doc_id order: counts are associative
        tr.ingest(docs.filter(F.col("doc_id") >= 9), wave_id=1)
        tr.ingest(docs.filter(F.col("doc_id") < 4), wave_id=2)
        tr.ingest(docs.filter((F.col("doc_id") >= 4) & (F.col("doc_id") < 9)), wave_id=3)
        inc = sorted(map(tuple, tr.score(docs).collect()))
        assert inc == batch
        # crash-replay of a wave re-appends byte-identical rows: collapsed
        tr.ingest(docs.filter(F.col("doc_id") < 4), wave_id=2)
        assert sorted(map(tuple, tr.score(docs).collect())) == batch
        # compaction preserves the accumulated statistic
        tr.compact()
        assert sorted(map(tuple, tr.score(docs).collect())) == batch
    finally:
        tr.drop_state()


def test_ingest_audit_reports_wave_totals(spark, tmp_path):
    from clickhouse_segments_tutorial_spark.plans.dsir_queries import (
        IncrementalDSIRTrainer,
    )

    docs = _seed(spark).select("doc_id", "text")
    tr = IncrementalDSIRTrainer(spark, str(tmp_path / "dsir"))
    tr.reset()
    try:
        audit = tr.ingest(docs.filter(F.col("doc_id") <= 2), wave_id=1).collect()
        assert len(audit) == 1
        # 2 docs x (4 unigrams + 3 bigrams); the trainer labels via the
        # shared heuristic, so the target total matches it exactly
        from clickhouse_segments_tutorial_spark.operators.text import quality_score
        from clickhouse_segments_tutorial_spark.plans.dsir_queries import (
            NB_LABEL_MIN_QUALITY,
        )

        n_tgt_docs = (
            docs.filter(F.col("doc_id") <= 2)
            .filter(quality_score("text") >= NB_LABEL_MIN_QUALITY)
            .count()
        )
        assert (audit[0]["n_raw"], audit[0]["n_tgt"]) == (14, 7 * n_tgt_docs)
        with pytest.raises(ValueError):
            tr.ingest(docs, wave_id=0)  # 0 is the resume sentinel
    finally:
        tr.drop_state()


def test_accept_draw_is_independent_of_other_md5_consumers(spark):
    """r11 second-review finding 1: the acceptance draw must be SALTED.
    Unsalted, it reads a prefix of the same md5(doc_id) that
    train_test_split's hash_draw consumes, so on the split's train side
    every doc has u >= test_fraction and a doc with
    dsir_lw < ln(test_fraction) can NEVER be accepted — the composed
    pipeline gate zeroes out the whole low-weight tail."""
    import math

    from clickhouse_segments_tutorial_spark.operators.sampling import hash_draw

    lw = round(math.log(0.05), 6)  # intended keep probability 5%
    ids = spark.range(20000).select(
        F.col("id").alias("doc_id"), F.lit(lw).alias("dsir_lw")
    )
    # the pipeline's train side: hash_draw(doc_id) >= 0.1 (test_fraction)
    train = ids.filter(hash_draw(F.col("doc_id")) >= F.lit("19999999"))
    kept = train.filter(dsir_accept("doc_id")).count()
    n = train.count()
    # unsalted draw keeps EXACTLY ZERO (ln u >= ln 0.1 > lw for all);
    # the salted draw keeps ~5% — accept a wide band around it
    assert n > 15000
    assert 0.02 * n < kept < 0.10 * n, (kept, n)
