"""Hashed n-gram Naive Bayes quality classifier (operators/quality_nb.py):
semantics on hand-crafted fixtures, partitioning invariance, plan shape.
Corpus-level oracle parity lives in test_oracle_parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_segments_tutorial_spark.operators.quality_nb import (
    DEFAULT_BUCKETS,
    hash_bucket,
    nb_score,
    nb_train,
)


def _seed(spark):
    # distinct vocabularies: positive class speaks a/b/c, negative x/y/z
    rows = [(i, "alpha beta gamma delta", True) for i in range(1, 7)]
    rows += [(i, "xerox yankee zulu", False) for i in range(7, 12)]
    return spark.createDataFrame(rows, "doc_id long, text string, y boolean")


def test_model_is_dense_and_bucket_hash_is_bounded(spark):
    docs = _seed(spark)
    model, prior = nb_train(docs, label_col="y")
    assert model.count() == DEFAULT_BUCKETS
    b = docs.select(hash_bucket("text").alias("b")).agg(
        F.min("b").alias("lo"), F.max("b").alias("hi")
    ).collect()[0]
    assert 0 <= b["lo"] and b["hi"] < DEFAULT_BUCKETS
    assert isinstance(prior, float)


def test_scores_separate_the_classes(spark):
    docs = _seed(spark)
    model, prior = nb_train(docs, label_col="y")
    test = spark.createDataFrame(
        [(100, "alpha gamma beta"), (101, "zulu xerox xerox"), (102, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in nb_score(test, model, prior).collect()}
    assert out[100]["nb_llr"] > 0 and out[100]["nb_keep"]
    assert out[101]["nb_llr"] < 0 and not out[101]["nb_keep"]
    # empty doc: kept row, prior-only score, zero tokens
    assert out[102]["n_tokens"] == 0
    assert abs(out[102]["nb_llr"] - round(prior, 6)) < 1e-9


def test_scores_partitioning_invariant(spark):
    docs = _seed(spark)
    m1, p1 = nb_train(docs, label_col="y")
    m2, p2 = nb_train(docs.repartition(7), label_col="y")
    assert p1 == p2
    a = sorted(map(tuple, nb_score(docs, m1, p1).collect()))
    b = sorted(map(tuple, nb_score(docs.repartition(5), m2, p2).collect()))
    assert a == b


def test_score_plan_broadcasts_model_no_python(spark):
    docs = _seed(spark)
    model, prior = nb_train(docs, label_col="y")
    plan = nb_score(docs, model, prior)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan


def test_pipeline_nb_gate_swaps_only_stage7(spark):
    """The quality_gate seam: NB-gated stages equal the default chain up
    through `decontaminated`, and the NB `quality_filtered` is exactly
    the gate applied to it."""
    from clickhouse_segments_tutorial_spark.plans.llm import _MIX_WEIGHTS
    from clickhouse_segments_tutorial_spark.plans.pipeline import (
        corpus_pipeline_stages,
    )
    from clickhouse_segments_tutorial_spark.plans.quality_nb_queries import _nb_gate
    from clickhouse_segments_tutorial_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(120)
    base = corpus_pipeline_stages(docs, mix_weights=_MIX_WEIGHTS)
    nb = corpus_pipeline_stages(docs, mix_weights=_MIX_WEIGHTS, quality_gate=_nb_gate)
    same = lambda a, b: sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    assert same(base["decontaminated"], nb["decontaminated"])
    assert same(nb["quality_filtered"], _nb_gate(base["decontaminated"]))


def test_incremental_trainer_equals_batch_any_split(spark, tmp_path):
    """The wave trainer's accumulated counts are a sufficient statistic,
    so ANY split of the corpus — including one that violates the other
    twins' ascending-id wave contract — must reproduce the batch scores
    bit-for-bit (counts are associative integers, the llr math is the
    shared nb_model_from_counts)."""
    from clickhouse_segments_tutorial_spark.operators.text import quality_score
    from clickhouse_segments_tutorial_spark.plans.quality_nb_queries import (
        NB_LABEL_MIN_QUALITY,
        IncrementalNBTrainer,
    )
    from clickhouse_segments_tutorial_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    labeled = docs.withColumn("_y", quality_score("text") >= NB_LABEL_MIN_QUALITY)
    model, prior = nb_train(labeled, label_col="_y")
    batch = sorted(map(tuple, nb_score(docs, model, prior).collect()))

    tr = IncrementalNBTrainer(spark, str(tmp_path / "nb"))
    tr.reset()
    # deliberately interleaved split: doc_id % 3, not contiguous ranges
    for k in range(3):
        tr.ingest(docs.filter(F.col("doc_id") % 3 == k))
    inc = sorted(map(tuple, tr.score(docs).collect()))
    assert inc == batch
    tr.drop_state()


def test_incremental_trainer_replay_and_compact_safe(spark, tmp_path):
    """Replay safety (the StreamingWaveGate crash contract): re-ingesting
    a wave under its original wave_id appends duplicate wave-tagged rows
    that the max()-collapse read must ignore — including AFTER compact()
    folded the state (wave tags survive compaction). Scores stay equal
    to batch throughout."""
    from clickhouse_segments_tutorial_spark.operators.text import quality_score
    from clickhouse_segments_tutorial_spark.plans.quality_nb_queries import (
        NB_LABEL_MIN_QUALITY,
        IncrementalNBTrainer,
    )
    from clickhouse_segments_tutorial_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(200)
    labeled = docs.withColumn("_y", quality_score("text") >= NB_LABEL_MIN_QUALITY)
    model, prior = nb_train(labeled, label_col="_y")
    batch = sorted(map(tuple, nb_score(docs, model, prior).collect()))

    tr = IncrementalNBTrainer(spark, str(tmp_path / "nb"))
    tr.reset()
    w1 = docs.filter(F.col("doc_id") % 2 == 0)
    w2 = docs.filter(F.col("doc_id") % 2 == 1)
    tr.ingest(w1, wave_id=1)
    tr.ingest(w2, wave_id=2)
    tr.ingest(w2, wave_id=2)  # crash-replay of wave 2
    assert sorted(map(tuple, tr.score(docs).collect())) == batch
    tr.compact()
    assert sorted(map(tuple, tr.score(docs).collect())) == batch
    tr.ingest(w1, wave_id=1)  # replay of an already-compacted wave
    assert sorted(map(tuple, tr.score(docs).collect())) == batch
    tr.drop_state()
