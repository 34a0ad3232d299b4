"""Semantics tests for the curation operators (plans/curation.py surface):
ngram novelty, per-group quota, deterministic shuffle, semantic dedup.
Hand-crafted fixtures; corpus-level parity lives in test_oracle_parity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_segments_tutorial_spark.operators.corpus_stats import ngram_novelty
from clickhouse_segments_tutorial_spark.operators.sampling import (
    deterministic_shuffle,
    quota_by_group,
    temperature_weights,
)
from clickhouse_segments_tutorial_spark.operators.similarity import semantic_dedup


# --- ngram_novelty ------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_novelty_first_doc_is_fully_novel_and_dup_is_zero(spark):
    df = _docs(
        spark,
        [
            (1, "a b c d e"),
            (2, "a b c d e"),  # exact dup -> every gram first seen in doc 1
            (3, "x y z a b"),  # grams: "x y z","y z a","z a b" all new
        ],
    )
    out = {r["doc_id"]: r for r in ngram_novelty(df, n=3).collect()}
    assert out[1]["novelty"] == 1.0 and out[1]["n_grams"] == 3
    assert out[2]["novelty"] == 0.0 and out[2]["n_novel"] == 0
    assert out[3]["novelty"] == 1.0


def test_novelty_short_and_empty_docs(spark):
    df = _docs(
        spark,
        [
            (1, "a b"),  # < n tokens -> one whole-doc gram "a b"
            (2, "a b"),  # same whole-doc gram -> novelty 0
            (3, "   "),  # whitespace-only -> no grams -> absent
        ],
    )
    rows = {r["doc_id"]: r for r in ngram_novelty(df, n=3).collect()}
    assert rows[1]["n_grams"] == 1 and rows[1]["novelty"] == 1.0
    assert rows[2]["n_grams"] == 1 and rows[2]["novelty"] == 0.0
    assert 3 not in rows


def test_novelty_counts_distinct_grams_once(spark):
    # "a b a b a" has grams: "a b a", "b a b", "a b a" -> 2 DISTINCT
    df = _docs(spark, [(1, "a b a b a")])
    row = ngram_novelty(df, n=3).collect()[0]
    assert row["n_grams"] == 2 and row["n_novel"] == 2


# --- quota_by_group -----------------------------------------------------------


def test_quota_inclusive_boundary_and_cutoff(spark):
    df = spark.createDataFrame(
        [
            ("s1", 1, 300),
            ("s1", 2, 500),  # cum 800 == budget -> kept (inclusive)
            ("s1", 3, 1),  # cum 801 -> dropped, and everything after
            ("s1", 4, 1),
            ("s2", 5, 100),  # group under budget -> fully kept
        ],
        "source string, doc_id long, n_tokens int",
    )
    out = quota_by_group(
        df, group_col="source", order_col="doc_id", weight_col="n_tokens", budget=800
    )
    kept = {(r["source"], r["doc_id"]): r["cum_weight"] for r in out.collect()}
    assert set(kept) == {("s1", 1), ("s1", 2), ("s2", 5)}
    assert kept[("s1", 2)] == 800


def test_quota_zero_weight_rows_survive_at_boundary(spark):
    # a 0-token doc after the budget is exactly met still fits (cum unchanged)
    df = spark.createDataFrame(
        [("s", 1, 800), ("s", 2, 0), ("s", 3, 5)],
        "source string, doc_id long, n_tokens int",
    )
    out = quota_by_group(
        df, group_col="source", order_col="doc_id", weight_col="n_tokens", budget=800
    )
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 2]


# --- deterministic_shuffle ----------------------------------------------------


def test_shuffle_is_a_permutation_with_dense_pos(spark):
    df = spark.range(0, 500).select(F.col("id").alias("k"))
    out = deterministic_shuffle(df, key_cols=["k"], n_buckets=8).collect()
    assert sorted(r["k"] for r in out) == list(range(500))
    by_bucket: dict[int, list[int]] = {}
    for r in out:
        assert 0 <= r["bucket"] < 8
        by_bucket.setdefault(r["bucket"], []).append(r["pos"])
    for bucket, ps in by_bucket.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), f"bucket {bucket} pos not dense"


def test_shuffle_partitioning_invariant_and_salt_sensitive(spark):
    df = spark.range(0, 300).select(F.col("id").alias("k"))
    a = sorted(map(tuple, deterministic_shuffle(df, key_cols=["k"]).collect()))
    b = sorted(
        map(tuple, deterministic_shuffle(df.repartition(13), key_cols=["k"]).collect())
    )
    assert a == b
    c = sorted(
        map(tuple, deterministic_shuffle(df, key_cols=["k"], salt="other").collect())
    )
    assert a != c  # a different salt is a different permutation


def test_shuffle_actually_permutes(spark):
    # the bucket-order read is not the input order (overwhelmingly likely
    # for 100 rows; deterministic given the fixed salt, so not flaky)
    df = spark.range(0, 100).select(F.col("id").alias("k"))
    out = deterministic_shuffle(df, key_cols=["k"], n_buckets=4)
    read_order = [
        r["k"] for r in out.orderBy("bucket", "pos").collect()
    ]
    assert read_order != list(range(100))


# --- semantic_dedup -----------------------------------------------------------


def test_semantic_dedup_keeps_min_id_of_identical_vectors(spark):
    v = [1.0, 0.0, 0.0, 0.0]
    w = [0.0, 1.0, 0.0, 0.0]  # orthogonal to v
    df = spark.createDataFrame(
        [(1, v, 10), (2, v, 20), (3, v, 30), (4, w, 40)],
        "vec_id long, embedding array<float>, label int",
    )
    out = semantic_dedup(df, threshold=0.8)
    assert sorted(r["vec_id"] for r in out.collect()) == [1, 4]
    assert "embedding" not in out.columns


def test_semantic_dedup_pairwise_rule_not_closure(spark):
    # A~B and B~C but A!~C: the pairwise rule drops B and C (both appear
    # as the larger id of a qualifying pair); only A survives. A doc
    # similar ONLY to a dropped doc is still dropped — greedy keep-first,
    # matching the operator docstring.
    import math

    def vec(deg):
        v = [0.0] * 8
        v[0] = math.cos(math.radians(deg))
        v[1] = math.sin(math.radians(deg))
        return v

    df = spark.createDataFrame(
        [(1, vec(0), 0), (2, vec(15), 0), (3, vec(30), 0)],
        "vec_id long, embedding array<float>, label int",
    )
    # cos(15°)≈0.966 >= 0.9 for (1,2),(2,3); cos(30°)≈0.866 < 0.9 for (1,3).
    # The 15° spacing sits inside the SRP near-dup regime, so banding
    # recall is deterministic-complete here (verified: all three pairs
    # surface at threshold 0.0 with the fixed md5 planes).
    out = sorted(r["vec_id"] for r in semantic_dedup(df, threshold=0.9).collect())
    assert out == [1]


# --- StreamingQuotaGate -------------------------------------------------------


def test_streaming_quota_carries_state_across_runs(spark, tmp_path):
    from clickhouse_segments_tutorial_spark.streaming.stream_quota import (
        StreamingQuotaGate,
    )

    schema = "source string, doc_id long, text string"
    gate = StreamingQuotaGate(
        spark, str(tmp_path), schema=spark.createDataFrame([], schema).schema,
        budget=5,
    )
    # wave 1: s1 admits docs 1 (2 tokens) and 2 (cum 4); s2 admits doc 3
    w1 = spark.createDataFrame(
        [("s1", 1, "a b"), ("s1", 2, "c d"), ("s2", 3, "e f g")], schema
    )
    w1.coalesce(1).write.mode("append").parquet(gate.docs_dir)
    gate.run_available_now()
    # wave 2: s1 doc 4 (2 tokens -> cum 6 > 5, rejected; its weight still
    # counts) then doc 5 (1 token -> cum 7, rejected — the prefix rule);
    # s2 doc 6 (2 tokens -> cum 5 == budget, admitted inclusive)
    w2 = spark.createDataFrame(
        [("s1", 4, "x y"), ("s1", 5, "z"), ("s2", 6, "h i")], schema
    )
    w2.coalesce(1).write.mode("append").parquet(gate.docs_dir)
    gate.run_available_now()
    got = {
        (r["source"], r["doc_id"]): r["cum_tokens"]
        for r in gate.accepted().collect()
    }
    assert got == {("s1", 1): 2, ("s1", 2): 4, ("s2", 3): 3, ("s2", 6): 5}


def test_streaming_quota_matches_batch_operator(spark, tmp_path):
    """Cross-batch streaming admission == the batch window operator when
    waves are split on the order column (the documented contract)."""
    from clickhouse_segments_tutorial_spark.operators.text import token_count
    from clickhouse_segments_tutorial_spark.streaming.stream_quota import (
        StreamingQuotaGate,
    )

    schema = "source string, doc_id long, text string"
    rows = [
        (f"s{i % 3}", i, " ".join(f"w{j}" for j in range(1 + i % 4)))
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, schema)
    batch = quota_by_group(
        docs.select("source", "doc_id", token_count("text").alias("n_tokens")),
        group_col="source",
        order_col="doc_id",
        weight_col="n_tokens",
        budget=20,
    ).select("source", "doc_id", "n_tokens", F.col("cum_weight").alias("cum_tokens"))

    gate = StreamingQuotaGate(
        spark, str(tmp_path), schema=docs.schema, budget=20
    )
    for lo, hi in ((0, 20), (20, 45), (45, 60)):
        docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).coalesce(
            1
        ).write.mode("append").parquet(gate.docs_dir)
        gate.run_available_now()
    a = sorted(map(tuple, batch.collect()))
    b = sorted(map(tuple, gate.accepted().collect()))
    assert a == b


# --- CSV ingest ---------------------------------------------------------------


def test_csv_roundtrip_quoted_fields(spark):
    from clickhouse_segments_tutorial_spark.sources.csv_ingest import (
        csv_line,
        parse_csv_lines,
        read_csv_rows,
    )

    schema = 'id bigint, payload string, v double'
    df = spark.createDataFrame(
        [
            (1, '{"k": 1, "s": "a,b"}', 1.5),
            (2, 'plain', 0.25),
            (3, 'quote " inside, and, commas', -3.75),
        ],
        schema,
    )
    back = parse_csv_lines(csv_line(df), schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    # driver-side convenience path
    lines = [r["csv"] for r in csv_line(df).collect()]
    back2 = read_csv_rows(spark, lines, schema)
    assert sorted(map(tuple, back2.collect())) == sorted(map(tuple, df.collect()))


def test_csv_ingest_failfast_on_malformed(spark):
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from clickhouse_segments_tutorial_spark.sources.csv_ingest import read_csv_rows

    bad = read_csv_rows(spark, ["1,ok", "not_a_number,boom"], "id bigint, s string")
    # FAILFAST surfaces as a JVM-side SparkException through py4j — pin the
    # exception type so an unrelated Python failure can't green this test
    # (r9 ADVICE).
    with _pytest.raises(Py4JJavaError):
        bad.collect()


# --- temperature_weights ------------------------------------------------------


def test_temperature_weights_flatten_distribution(spark):
    df = spark.createDataFrame(
        [(i, "en" if i < 80 else "fr") for i in range(100)],
        "doc_id long, lang string",
    )
    w = temperature_weights(df, strata_col="lang", alpha=0.5)
    # sqrt flattening: en's weight share (~0.67) sits between its natural
    # share (0.8) and uniform (0.5)
    share_en = w["en"] / (w["en"] + w["fr"])
    assert 0.5 < share_en < 0.8
    # integer-quantized, exact: sqrt(0.8)*1e9 and sqrt(0.2)*1e9 rounded
    import math

    assert w["en"] == int(math.floor(math.sqrt(0.8) * 1e9 + 0.5))
    assert w["fr"] == int(math.floor(math.sqrt(0.2) * 1e9 + 0.5))


def test_temperature_mix_upsamples_low_resource(spark):
    from clickhouse_segments_tutorial_spark.operators.sampling import mix_corpus

    df = spark.createDataFrame(
        [(i, "en" if i < 90 else "fr") for i in range(100)],
        "doc_id long, lang string",
    )
    w = temperature_weights(df, strata_col="lang", alpha=0.5)
    out = mix_corpus(df, w, strata_col="lang", key_col="doc_id")
    n = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # fr (10% natural) must be upsampled above its 10 rows, en below 90
    assert n["fr"] > 10 and n["en"] < 90
    # total stays ~100 (the mixture preserves corpus size in expectation)
    assert 80 <= n["fr"] + n["en"] <= 120


# --- IncrementalNoveltyScorer -------------------------------------------------


def test_incremental_novelty_multiwave_equals_batch(spark, tmp_path):
    """4 uneven waves (one empty) over the wave contract == the batch
    operator on the concatenated corpus."""
    from clickhouse_segments_tutorial_spark.plans.curation import (
        IncrementalNoveltyScorer,
    )

    rows = [
        (1, "a b c d e f"),
        (2, "a b c d e f"),      # dup of 1
        (3, "x y z"),
        (10, "c d e x y z new gram here"),  # mix of seen + new
        (11, "a b"),             # short: whole-doc gram, unseen ("a b" != any trigram)
        (20, "new gram here a b c"),
    ]
    docs = _docs(spark, rows)
    batch = sorted(map(tuple, __import__(
        "clickhouse_segments_tutorial_spark.operators.corpus_stats",
        fromlist=["ngram_novelty"],
    ).ngram_novelty(docs, n=3).collect()))

    scorer = IncrementalNoveltyScorer(spark, str(tmp_path / "nov"))
    outs = []
    for lo, hi in ((0, 4), (4, 4), (4, 12), (12, 99)):  # wave 2 is empty
        wave = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        outs.append(scorer.ingest(wave))
    inc = sorted(map(tuple, [r for df in outs for r in df.collect()]))
    assert inc == batch
    scorer.drop_state()


def test_incremental_novelty_state_join_colocates(spark, tmp_path):
    """The wave-vs-state first-seen join must shuffle ONLY the wave: the
    gram state is a bucketed catalog table, so its scan side carries no
    Exchange (the incremental curator's physical design, r8 verdict
    item 1, applied to novelty state)."""
    from clickhouse_segments_tutorial_spark.plans.curation import (
        IncrementalNoveltyScorer,
    )

    scorer = IncrementalNoveltyScorer(spark, str(tmp_path / "nov"))
    scorer.ingest(_docs(spark, [(1, "the quick brown fox jumps over it")]))
    wave = spark.range(100).select(
        F.md5(F.col("id").cast("string")).alias("_g"),
        F.col("id").alias("_wf"),
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = wave.join(scorer._state(), "_g", "left")
        plan = joined._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "Bucketed: true" in plan
        # the state side: scan -> (bucket-local sort/agg) -> join with NO
        # Exchange; the only Exchange in the plan is the wave side's
        assert plan.count("(1) Scan parquet") or True  # formatted variant guard
        import re

        n_exchange = len(re.findall(r"\n\s*\(\d+\) Exchange", plan))
        assert n_exchange == 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    scorer.drop_state()


def test_novelty_delete_transfers_ownership_and_compact_reaps(spark, tmp_path):
    """Tombstone retraction (r13 verdict item 1): grams owned by a
    deleted doc leave the state, so the next wave that re-sees them
    becomes their new first (novelty 1.0 where it would have been 0.0);
    compact() physically reaps the tombstoned rows and clears the
    tombstone dir; a retried delete is a no-op."""
    import os as _os

    from clickhouse_segments_tutorial_spark.plans.curation import (
        IncrementalNoveltyScorer,
    )

    scorer = IncrementalNoveltyScorer(spark, str(tmp_path / "nov"))
    scorer.ingest(_docs(spark, [(1, "alpha beta gamma delta epsilon")]))
    dead = spark.createDataFrame([(1,)], "doc_id long")
    scorer.delete(dead)
    scorer.delete(dead)  # retried delete: tombstones are a set
    out2 = scorer.ingest(_docs(spark, [(10, "alpha beta gamma delta epsilon")]))
    row = out2.collect()[0]
    assert row.novelty == 1.0, "ownership must transfer to the re-seeing wave"
    # compact physically reaps: the raw table keeps only doc 10's grams
    scorer.compact()
    assert not _os.path.isdir(str(tmp_path / "nov" / "tombstones"))
    raw = spark.table(scorer._tbl)
    assert raw.filter(F.col("_first") == 1).count() == 0
    assert raw.filter(F.col("_first") == 10).count() > 0
    # post-compact ingest still sees doc 10 as the owner
    out3 = scorer.ingest(_docs(spark, [(20, "alpha beta gamma delta epsilon")]))
    assert out3.collect()[0].novelty == 0.0
    scorer.drop_state()


def test_semantic_delete_admits_future_dup_not_retroactive(spark, tmp_path):
    """Deleting a vector re-opens its slot for FUTURE content (a wave-2
    near-dup of only-deleted vectors is admitted) without revoking past
    verdicts (a wave-1 doc the deleted vector rejected stays rejected);
    compact() reaps the deleted rows from both state tables."""
    import math

    from clickhouse_segments_tutorial_spark.plans.curation import (
        IncrementalSemanticDeduper,
    )

    def vec(deg):
        v = [0.0] * 8
        v[0] = math.cos(math.radians(deg))
        v[1] = math.sin(math.radians(deg))
        return v

    emb = spark.createDataFrame(
        [(1, vec(0), 0), (2, vec(5), 0), (10, vec(0), 1)],
        "vec_id long, embedding array<float>, label int",
    )
    ded = IncrementalSemanticDeduper(spark, str(tmp_path / "sem"), threshold=0.9)
    out1 = ded.ingest(emb.filter(F.col("vec_id") < 10))
    assert sorted(r.vec_id for r in out1.collect()) == [1]  # 2 dropped by 1
    ded.delete(spark.createDataFrame([(1,)], "vec_id long"))
    # wave 2: vec 10 is a near-dup ONLY of deleted 1 (2 is at 5 deg:
    # cos(5) ~ .996 >= .9 too — so delete 2 as well to isolate)
    ded.delete(spark.createDataFrame([(2,)], "vec_id long"))
    out2 = ded.ingest(emb.filter(F.col("vec_id") == 10))
    assert [r.vec_id for r in out2.collect()] == [10], (
        "near-dup of only-deleted content must be admitted"
    )
    # non-retroactive: wave-1 result unchanged (2 stays dropped)
    assert sorted(r.vec_id for r in out1.collect()) == [1]
    ded.compact()
    assert spark.table(ded._tbl("sem_vecs")).filter(
        F.col("_id").isin([1, 2])
    ).count() == 0
    assert spark.table(ded._tbl("sem_bands")).filter(
        F.col("_id").isin([1, 2])
    ).count() == 0
    assert spark.table(ded._tbl("sem_vecs")).filter(F.col("_id") == 10).count() == 1
    ded.drop_state()


def test_minhash_delete_suppresses_future_pairs_and_reaps(spark, tmp_path):
    """Tombstone lane on the MinHash index: after deleting a wave-1
    doc, a wave-2 near-identical doc reports NO pair against it (its
    band keys and shingles left the index) while pairs against
    surviving docs still report; compact() physically reaps the rows."""
    from clickhouse_segments_tutorial_spark.plans.curation import (
        IncrementalMinHashDeduper,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = _docs(spark, [(1, base), (2, "totally different words here now")])
    ded = IncrementalMinHashDeduper(spark, str(tmp_path / "mh"))
    out1 = ded.ingest(docs)
    assert out1.count() == 0
    ded.delete(spark.createDataFrame([(1,)], "doc_id long"))
    # wave 2: doc 10 duplicates ONLY the deleted doc 1 -> no pair
    out2 = ded.ingest(_docs(spark, [(10, base)]))
    assert out2.count() == 0
    # but a doc duplicating the SURVIVING doc 10 still pairs
    out3 = ded.ingest(_docs(spark, [(20, base)]))
    pairs = {(r.id_a, r.id_b) for r in out3.collect()}
    assert (10, 20) in pairs and (1, 20) not in pairs
    ded.compact()
    assert spark.table(ded._tbl("mh_shingles")).filter(
        F.col("_id") == 1
    ).count() == 0
    ded.drop_state()


def test_state_delete_empty_and_crash_safe_reads(spark, tmp_path):
    """r14 review finding: an empty delete (or a crash leaving a
    tombstones dir with no readable part files) must not poison later
    state reads — the schema-pinned read treats it as zero rows."""
    import os as _os

    from clickhouse_segments_tutorial_spark.plans.curation import (
        IncrementalNoveltyScorer,
    )

    scorer = IncrementalNoveltyScorer(spark, str(tmp_path / "nov"))
    scorer.ingest(_docs(spark, [(1, "one two three four five")]))
    # empty delete: append writes nothing readable
    scorer.delete(spark.createDataFrame([], "doc_id long"))
    # crash simulation: a bare tombstones dir with no files at all
    _os.makedirs(_os.path.join(str(tmp_path / "nov"), "tombstones"), exist_ok=True)
    out = scorer.ingest(_docs(spark, [(10, "one two three four five")]))
    assert out.collect()[0].novelty == 0.0  # state intact, filter a no-op
    scorer.compact()  # reaps nothing, clears the dir, stays readable
    out2 = scorer.ingest(_docs(spark, [(20, "six seven eight nine ten")]))
    assert out2.collect()[0].novelty == 1.0
    scorer.drop_state()


# --- perplexity_buckets -------------------------------------------------------


def test_perplexity_buckets_order_and_exclusions(spark):
    from clickhouse_segments_tutorial_spark.operators.corpus_stats import (
        perplexity_buckets,
    )

    # doc 1: repeated common bigram -> lowest NLL (head); doc 3: all
    # unique transitions -> highest; doc 4: one kept term -> no bigrams,
    # excluded (CCNet drops undefined perplexity)
    df = _docs(
        spark,
        [
            (1, "the cat the cat the cat the cat"),
            (2, "the cat sat on a mat"),
            (3, "aa bb cc dd ee ff gg"),
            (4, "zz"),
        ],
    )
    out = {r["doc_id"]: r["ppl_bucket"] for r in perplexity_buckets(df).collect()}
    assert 4 not in out
    assert out[1] == "head" and out[3] == "tail"


def test_perplexity_buckets_approx_mode_flip_tolerance(spark):
    """The r9-requested approx mode: at GSQuantile accuracy a, the rank
    error per cut is <= n/a, so at most 2n/a docs may flip bucket vs the
    exact cuts. Pin that bound on a corpus with many distinct scores —
    and at the default accuracy (1e4 >> n) pin ZERO flips, including the
    doc sitting exactly ON a cut order statistic."""
    import pytest as _pytest

    from clickhouse_segments_tutorial_spark.operators.corpus_stats import (
        perplexity_buckets,
    )

    # 90 docs with graded repetition -> a spread of distinct NLL scores
    rows = [
        (i, " ".join(["rep rep"] * (1 + i % 9) + [f"u{i}a u{i}b u{i}c"]))
        for i in range(90)
    ]
    df = _docs(spark, rows)
    exact = {r["doc_id"]: r["ppl_bucket"] for r in perplexity_buckets(df).collect()}
    approx = {
        r["doc_id"]: r["ppl_bucket"]
        for r in perplexity_buckets(df, mode="approx").collect()
    }
    assert set(exact) == set(approx)
    flips = sum(1 for d in exact if exact[d] != approx[d])
    assert flips == 0  # accuracy 1e4 on 90 docs: rank error < 1
    # a deliberately coarse sketch stays within the documented bound
    coarse = {
        r["doc_id"]: r["ppl_bucket"]
        for r in perplexity_buckets(df, mode="approx", approx_accuracy=10).collect()
    }
    coarse_flips = sum(1 for d in exact if exact[d] != coarse[d])
    assert coarse_flips <= 2 * len(exact) // 10

    with _pytest.raises(ValueError):
        perplexity_buckets(df, mode="bogus")


# --- IncrementalSemanticDeduper -----------------------------------------------


def test_incremental_semantic_dedup_multiwave_equals_batch(spark, tmp_path):
    """3 waves; the A~B (cross-wave), B~C (cross-wave), A!~C chain pins
    the all-seen-enter-state rule: C is dropped by the already-dropped B,
    which survivor-only state would miss."""
    import math

    from clickhouse_segments_tutorial_spark.plans.curation import (
        IncrementalSemanticDeduper,
    )

    def vec(deg):
        v = [0.0] * 8
        v[0] = math.cos(math.radians(deg))
        v[1] = math.sin(math.radians(deg))
        return v

    rows = [
        (1, vec(0), 0),
        (2, vec(15), 0),    # ~1 (cos .966) -> dropped
        (3, vec(30), 0),    # ~2 (cos .966), !~1 (cos .866) -> dropped via dropped 2
        (4, vec(90), 0),    # orthogonal -> survives
        (5, vec(90), 1),    # identical dir to 4 -> dropped
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    batch = sorted(
        map(tuple, semantic_dedup(emb, threshold=0.9).collect())
    )
    ded = IncrementalSemanticDeduper(spark, str(tmp_path / "sem"), threshold=0.9)
    outs = []
    for lo, hi in ((1, 2), (2, 4), (4, 99)):
        outs.append(
            ded.ingest(emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)))
        )
    inc = sorted(map(tuple, [r for df in outs for r in df.collect()]))
    assert inc == batch == [(1, 0), (4, 0)]
    ded.drop_state()


def test_incremental_semantic_state_join_colocates(spark, tmp_path):
    from clickhouse_segments_tutorial_spark.plans.curation import (
        IncrementalSemanticDeduper,
    )

    ded = IncrementalSemanticDeduper(spark, str(tmp_path / "sem"), threshold=0.9)
    ded.ingest(
        spark.createDataFrame(
            [(1, [1.0, 0.0, 0.0, 0.0], 0)],
            "vec_id long, embedding array<float>, label int",
        )
    )
    wave = spark.range(100).select(
        (F.col("id") % 8).cast("int").alias("chunk"),
        (F.col("id") % 64).alias("key"),
        F.col("id").alias("_id"),
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = wave.join(ded._state("sem_bands", "chunk int, key bigint, _id bigint"),
                           ["chunk", "key"])
        plan = joined._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert "Bucketed: true" in plan
        import re

        assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    ded.drop_state()


def test_streaming_quota_survives_restart(spark, tmp_path):
    """A NEW gate object over the same workdir resumes from the
    checkpointed per-source state (the stream_dedup restart contract)."""
    from clickhouse_segments_tutorial_spark.streaming.stream_quota import (
        StreamingQuotaGate,
    )

    schema = "source string, doc_id long, text string"
    st = spark.createDataFrame([], schema).schema
    g1 = StreamingQuotaGate(spark, str(tmp_path), schema=st, budget=4)
    spark.createDataFrame([("s", 1, "a b c")], schema).coalesce(1).write.mode(
        "append"
    ).parquet(g1.docs_dir)
    g1.run_available_now()
    # "restart": fresh object, same dirs
    g2 = StreamingQuotaGate(spark, str(tmp_path), schema=st, budget=4)
    spark.createDataFrame(
        [("s", 2, "d"), ("s", 3, "e f")], schema  # cum 4 kept, cum 6 dropped
    ).coalesce(1).write.mode("append").parquet(g2.docs_dir)
    g2.run_available_now()
    got = sorted(r["doc_id"] for r in g2.accepted().collect())
    assert got == [1, 2]


def test_incremental_state_compaction_preserves_results(spark, tmp_path):
    """compact() between waves must not change any score/verdict, for
    both bucketed-state incremental operators."""
    import math

    from clickhouse_segments_tutorial_spark.operators.corpus_stats import (
        ngram_novelty,
    )
    from clickhouse_segments_tutorial_spark.plans.curation import (
        IncrementalNoveltyScorer,
        IncrementalSemanticDeduper,
    )

    docs = _docs(
        spark,
        [(1, "a b c d e"), (2, "a b c d e"), (5, "c d e f g"), (9, "x y z w v")],
    )
    batch = sorted(map(tuple, ngram_novelty(docs, n=3).collect()))
    nov = IncrementalNoveltyScorer(spark, str(tmp_path / "nov"))
    o1 = nov.ingest(docs.filter(F.col("doc_id") < 4))
    nov.compact()
    o2 = nov.ingest(docs.filter((F.col("doc_id") >= 4) & (F.col("doc_id") < 8)))
    nov.compact()
    o3 = nov.ingest(docs.filter(F.col("doc_id") >= 8))
    inc = sorted(map(tuple, [r for df in (o1, o2, o3) for r in df.collect()]))
    assert inc == batch
    nov.drop_state()

    def vec(deg):
        v = [0.0] * 8
        v[0] = math.cos(math.radians(deg))
        v[1] = math.sin(math.radians(deg))
        return v

    emb = spark.createDataFrame(
        [(1, vec(0), 0), (2, vec(15), 0), (3, vec(30), 0), (4, vec(90), 0)],
        "vec_id long, embedding array<float>, label int",
    )
    batch_sem = sorted(
        map(tuple, semantic_dedup(emb, threshold=0.9).collect())
    )
    ded = IncrementalSemanticDeduper(spark, str(tmp_path / "sem"), threshold=0.9)
    s1 = ded.ingest(emb.filter(F.col("vec_id") <= 2))
    ded.compact()
    s2 = ded.ingest(emb.filter(F.col("vec_id") > 2))
    inc_sem = sorted(map(tuple, [r for df in (s1, s2) for r in df.collect()]))
    assert inc_sem == batch_sem
    ded.drop_state()


# --- StreamingWaveGate (novelty / semantic dedup ingest gates) -----------------


def _novelty_gate(spark, workdir):
    from clickhouse_segments_tutorial_spark.plans.curation import (
        IncrementalNoveltyScorer,
    )
    from clickhouse_segments_tutorial_spark.streaming.stream_curation import (
        StreamingWaveGate,
    )

    schema = spark.createDataFrame([], "doc_id long, text string").schema
    return StreamingWaveGate(
        spark,
        workdir,
        schema=schema,
        ingestor=IncrementalNoveltyScorer(spark, f"{workdir}/state"),
    )


def test_streaming_novelty_matches_batch_operator(spark, tmp_path):
    """Union of per-batch gate outputs == the batch novelty operator when
    wave files respect ascending doc_id (the documented contract)."""
    rows = [(i, f"w{i % 7} w{(i + 1) % 5} w{i % 3} common common") for i in range(30)]
    docs = _docs(spark, rows)
    gate = _novelty_gate(spark, str(tmp_path))
    gate.reset_state()
    try:
        for lo, hi in ((0, 12), (12, 22), (22, 30)):
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).coalesce(
                1
            ).write.mode("append").parquet(gate.in_dir)
            gate.run_available_now()
        a = sorted(map(tuple, ngram_novelty(docs, n=3).collect()))
        b = sorted(map(tuple, gate.results().collect()))
        assert a == b
    finally:
        gate.ingestor.drop_state()


def test_streaming_novelty_single_run_splits_files_into_batches(spark, tmp_path):
    """ONE availableNow run over two pre-written wave files: with
    maxFilesPerTrigger=1 each file becomes its own micro-batch, in
    order, so the result still equals the batch operator."""
    docs = _docs(spark, [(i, f"a{i % 4} b{i % 3} c common") for i in range(20)])
    gate = _novelty_gate(spark, str(tmp_path))
    gate.reset_state()
    try:
        docs.filter(F.col("doc_id") < 10).coalesce(1).write.mode("append").parquet(
            gate.in_dir
        )
        docs.filter(F.col("doc_id") >= 10).coalesce(1).write.mode("append").parquet(
            gate.in_dir
        )
        gate.run_available_now()
        import os

        n_batches = len(
            [d for d in os.listdir(gate.results_dir) if d.startswith("batch_")]
        )
        assert n_batches == 2  # one micro-batch per file
        a = sorted(map(tuple, ngram_novelty(docs, n=3).collect()))
        assert sorted(map(tuple, gate.results().collect())) == a
    finally:
        gate.ingestor.drop_state()


def test_streaming_novelty_restart_resumes_from_checkpoint(spark, tmp_path):
    """A FRESH gate over the same workdir (the restart) must skip the
    already-processed wave via checkpointed offsets, reuse the persisted
    gram state, and still reproduce the batch semantics."""
    docs = _docs(spark, [(i, f"x{i % 5} y{i % 2} z shared") for i in range(24)])
    g1 = _novelty_gate(spark, str(tmp_path))
    g1.reset_state()
    try:
        docs.filter(F.col("doc_id") < 12).coalesce(1).write.mode("append").parquet(
            g1.in_dir
        )
        g1.run_available_now()

        g2 = _novelty_gate(spark, str(tmp_path))  # restart: NO reset_state
        docs.filter(F.col("doc_id") >= 12).coalesce(1).write.mode("append").parquet(
            g2.in_dir
        )
        g2.run_available_now()
        # wave 1 was not reprocessed: its batch output is intact and the
        # restarted run produced exactly one new batch dir
        import os

        dirs = sorted(
            d for d in os.listdir(g2.results_dir) if d.startswith("batch_")
        )
        assert len(dirs) == 2
        a = sorted(map(tuple, ngram_novelty(docs, n=3).collect()))
        assert sorted(map(tuple, g2.results().collect())) == a
    finally:
        g1.ingestor.drop_state()


def test_streaming_semantic_dedup_matches_batch(spark, tmp_path):
    """Gate-admitted survivors across two vec_id-ordered waves == the
    batch semantic_dedup keep set."""
    import math

    from clickhouse_segments_tutorial_spark.plans.curation import (
        IncrementalSemanticDeduper,
    )
    from clickhouse_segments_tutorial_spark.streaming.stream_curation import (
        StreamingWaveGate,
    )

    def vec(deg):
        v = [0.0] * 16
        v[0] = math.cos(math.radians(deg))
        v[1] = math.sin(math.radians(deg))
        return v

    emb = spark.createDataFrame(
        [(i, vec(12 * i), i % 2) for i in range(1, 13)],
        "vec_id long, embedding array<float>, label int",
    )
    batch = sorted(map(tuple, semantic_dedup(emb, threshold=0.9).collect()))

    gate = StreamingWaveGate(
        spark,
        str(tmp_path),
        schema=emb.schema,
        ingestor=IncrementalSemanticDeduper(
            spark, f"{tmp_path}/state", threshold=0.9
        ),
    )
    gate.reset_state()
    try:
        # THREE waves: the stale-relation-cache regression (a clone-session
        # state append invisible to the outer session) only bites when a
        # wave reads state written two waves earlier
        for lo, hi in ((1, 4), (5, 8), (9, 12)):
            emb.filter(
                (F.col("vec_id") >= lo) & (F.col("vec_id") <= hi)
            ).coalesce(1).write.mode("append").parquet(gate.in_dir)
            gate.run_available_now()
        assert sorted(map(tuple, gate.results().collect())) == batch
    finally:
        gate.ingestor.drop_state()


def test_shuffle_buckets_for_scaling():
    from clickhouse_segments_tutorial_spark.operators.sampling import (
        shuffle_buckets_for,
    )

    assert shuffle_buckets_for(0) == 64
    assert shuffle_buckets_for(1_000_000) == 64  # floor
    assert shuffle_buckets_for(4_000_000 * 100) == 128
    assert shuffle_buckets_for(100_000_000_000) == 32768  # 1e11 chunks
    # power-of-two rounding
    assert shuffle_buckets_for(4_000_000 * 300) == 512


def test_streaming_gate_auto_compaction(spark, tmp_path):
    """compact_every folds the bucketed gram state back to one file per
    bucket mid-stream without changing any result (the BASELINE r10
    cadence, wired into the gate)."""
    import glob
    import os

    from clickhouse_segments_tutorial_spark.plans.curation import (
        IncrementalNoveltyScorer,
    )
    from clickhouse_segments_tutorial_spark.streaming.stream_curation import (
        StreamingWaveGate,
    )

    docs = _docs(spark, [(i, f"t{i % 6} u{i % 4} v shared") for i in range(32)])
    scorer = IncrementalNoveltyScorer(spark, f"{tmp_path}/state", state_buckets=8)
    gate = StreamingWaveGate(
        spark,
        str(tmp_path),
        schema=docs.schema,
        ingestor=scorer,
        compact_every=2,
    )
    gate.reset_state()
    try:
        # four wave files, ONE availableNow run -> four micro-batches;
        # compaction fires after batches 2 and 4
        for lo, hi in ((0, 8), (8, 16), (16, 24), (24, 32)):
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).coalesce(
                1
            ).write.mode("append").parquet(gate.in_dir)
        gate.run_available_now()
        a = sorted(map(tuple, ngram_novelty(docs, n=3).collect()))
        assert sorted(map(tuple, gate.results().collect())) == a
        loc = next(
            r["data_type"]
            for r in spark.sql(f"DESCRIBE FORMATTED {scorer._tbl}").collect()
            if r["col_name"].strip() == "Location"
        ).removeprefix("file:")
        n_files = len(glob.glob(os.path.join(loc, "*.parquet")))
        # 4 waves x 8 buckets can reach 32 files uncompacted; the
        # final-batch compaction folds to AT MOST one file per bucket
        # (a bucket no gram hashes into stays file-less under align)
        assert n_files <= 8, n_files
    finally:
        scorer.drop_state()


def test_semantic_dedup_replayed_wave_is_idempotent(spark, tmp_path):
    """r10 second-review finding 1: a crash-replayed wave finds its own
    band keys in state; the cross-join's id_a < id_b filter must reduce
    those to intra-wave pairs so the replay reproduces the original
    survivors (previously every vector self-matched and the replay
    emitted an empty set)."""
    import math

    from clickhouse_segments_tutorial_spark.plans.curation import (
        IncrementalSemanticDeduper,
    )

    def vec(deg):
        v = [0.0] * 16
        v[0] = math.cos(math.radians(deg))
        v[1] = math.sin(math.radians(deg))
        return v

    emb = spark.createDataFrame(
        [(i, vec(12 * i), i % 2) for i in range(1, 13)],
        "vec_id long, embedding array<float>, label int",
    )
    ded = IncrementalSemanticDeduper(spark, str(tmp_path), threshold=0.9)
    ded.reset()
    try:
        w1 = emb.filter(F.col("vec_id") <= 6)
        w2 = emb.filter(F.col("vec_id") > 6)
        ded.ingest(w1, wave_id=1)
        out2 = sorted(map(tuple, ded.ingest(w2, wave_id=2).collect()))
        assert out2  # non-empty originally
        replay = sorted(map(tuple, ded.ingest(w2, wave_id=2).collect()))
        assert replay == out2
    finally:
        ded.drop_state()


def test_novelty_heals_state_after_crashed_compaction(spark, tmp_path):
    """r10 second-review finding 3: drop the state table with the
    compact pin still on disk (the crash-mid-compact shape) — the next
    read must restore from the pin and produce batch-identical results,
    and reset() must NOT resurrect."""
    from clickhouse_segments_tutorial_spark.plans.curation import (
        IncrementalNoveltyScorer,
    )

    docs = _docs(spark, [(i, f"h{i % 5} k{i % 3} m common") for i in range(24)])
    sc = IncrementalNoveltyScorer(spark, str(tmp_path), state_buckets=4)
    sc.reset()
    try:
        sc.ingest(docs.filter(F.col("doc_id") < 8), wave_id=1)
        # simulated crash mid-compact: the pin landed (committed), then
        # the table overwrite died after the drop — pin survives, table
        # gone. (A COMPLETED compact prunes its pins, so the old
        # compact-then-drop simulation no longer models any real state.)
        sc._state().write.parquet(str(tmp_path / "tmp" / "compact_w1"))
        spark.sql(f"DROP TABLE {sc._tbl}")
        out2 = sc.ingest(docs.filter((F.col("doc_id") >= 8) & (F.col("doc_id") < 16)), wave_id=2)
        out3 = sc.ingest(docs.filter(F.col("doc_id") >= 16), wave_id=3)
        got = sorted(
            map(tuple, sc.ingest(docs.limit(0), wave_id=4).unionByName(out2)
                .unionByName(out3).collect())
        )
        # wave 2+3 against healed wave-1 state == batch operator minus wave 1
        batch = {r["doc_id"]: tuple(r) for r in ngram_novelty(docs, n=3).collect()}
        for row in got:
            assert row == batch[row[0]], row
        # reset clears pins: a fresh start must NOT resurrect old state
        sc.reset()
        fresh = sc.ingest(docs.filter(F.col("doc_id") >= 16), wave_id=1)
        row = {r["doc_id"]: r for r in fresh.collect()}
        assert row[16]["novelty"] == 1.0  # nothing seen before
    finally:
        sc.drop_state()


def test_heal_prefers_newest_valid_pin_over_higher_wave_number(spark, tmp_path):
    """r10 third-review findings 1/3: pin recency must be the _SUCCESS
    commit mtime, not the wave number embedded in the name — a
    re-attached process's wave counter restarts, so its (current) pins
    carry LOWER numbers than an earlier process's stale ones. Also: a
    pin without _SUCCESS (crashed mid-pin-write) must never be restored."""
    import os
    import time

    from clickhouse_segments_tutorial_spark.plans.curation import (
        IncrementalNoveltyScorer,
    )

    docs = _docs(spark, [(i, f"a{i} b{i} c{i} d{i}") for i in range(8)])
    sc = IncrementalNoveltyScorer(spark, str(tmp_path), state_buckets=4)
    sc.reset()
    try:
        sc.ingest(docs.filter(F.col("doc_id") < 4), wave_id=1)
        # stale pin from an "earlier process", wave number 9 — only doc 0's
        # grams. Written FIRST so its _SUCCESS mtime is oldest.
        sc._state().filter(F.col("_first") == 0).write.parquet(
            str(tmp_path / "tmp" / "compact_w9")
        )
        time.sleep(1.1)
        # current full pin, lower wave number, newer commit
        sc._state().write.parquet(str(tmp_path / "tmp" / "compact_w2"))
        # an even newer but UNCOMMITTED pin (no _SUCCESS): must be skipped
        time.sleep(1.1)
        part = tmp_path / "tmp" / "compact_w3"
        sc._state().write.parquet(str(part))
        os.remove(part / "_SUCCESS")
        spark.sql(f"DROP TABLE {sc._tbl}")
        healed = {r["_g"]: r["_first"] for r in sc._state().collect()}
        full = 4 * 2  # 4 docs x 2 distinct 3-grams each, all distinct
        assert len(healed) == full, "heal restored the stale or partial pin"
    finally:
        sc.drop_state()


def test_successful_compaction_prunes_pins(spark, tmp_path):
    """r10 third-review finding 6: once the compacted table is committed
    the pins are dead weight (heal reads only the newest; tmp would grow
    one full state copy per compaction forever) and stale copies feed
    the recency-selection bugs. Scorer, deduper, and curator all prune."""
    import glob

    from clickhouse_segments_tutorial_spark.plans.curation import (
        IncrementalNoveltyScorer,
        IncrementalSemanticDeduper,
    )

    docs = _docs(spark, [(i, f"a{i} b c d") for i in range(6)])
    sc = IncrementalNoveltyScorer(spark, str(tmp_path / "nov"), state_buckets=4)
    sc.reset()
    try:
        sc.ingest(docs, wave_id=1)
        sc.compact()
        assert glob.glob(str(tmp_path / "nov" / "tmp" / "compact_w*")) == []
        # and the state is intact post-prune
        assert sc._state().count() > 0
    finally:
        sc.drop_state()

    emb = spark.createDataFrame(
        [(i, "k", [float(i), 1.0, 0.0, 0.5]) for i in range(4)],
        "vec_id long, label string, embedding array<float>",
    )
    ded = IncrementalSemanticDeduper(spark, str(tmp_path / "sem"), threshold=0.95)
    ded.reset()
    try:
        ded.ingest(emb, wave_id=1)
        ded.compact()
        assert glob.glob(str(tmp_path / "sem" / "tmp" / "compact_*_w*")) == []
        assert ded._state("sem_vecs", "_id bigint, embedding array<float>").count() == 4
    finally:
        ded.drop_state()


def test_scorer_and_deduper_resume_wave_numbering_on_reattach(spark, tmp_path):
    """r10 third-review finding 1 (resume half): a NEW instance on an
    existing workdir must continue default wave numbering from the
    persisted wave results, not restart at 1 and overwrite wave_1."""
    from clickhouse_segments_tutorial_spark.plans.curation import (
        IncrementalNoveltyScorer,
    )

    docs = _docs(spark, [(i, f"q{i} r s t") for i in range(9)])
    first = IncrementalNoveltyScorer(spark, str(tmp_path), state_buckets=4)
    first.reset()
    try:
        first.ingest(docs.filter(F.col("doc_id") < 3))   # default wave 1
        first.ingest(docs.filter((F.col("doc_id") >= 3) & (F.col("doc_id") < 6)))  # 2
        w1 = sorted(r["doc_id"] for r in spark.read.parquet(str(tmp_path / "wave_1")).collect())

        again = IncrementalNoveltyScorer(spark, str(tmp_path), state_buckets=4)
        again.ingest(docs.filter(F.col("doc_id") >= 6))  # must become wave 3
        assert (tmp_path / "wave_3").exists()
        assert sorted(
            r["doc_id"] for r in spark.read.parquet(str(tmp_path / "wave_1")).collect()
        ) == w1, "re-attach overwrote wave_1's historical result"
    finally:
        first.drop_state()


def test_results_skips_uncommitted_batch_dir(spark, tmp_path):
    """r10 ADVICE item 2: a crash between task-commit and job-commit
    leaves a batch_* dir without _SUCCESS; results() must not surface
    its rows (the gate re-run would overwrite it, but a direct read
    must already be safe)."""
    import os

    docs = _docs(spark, [(i, f"n{i} m{i} o p") for i in range(8)])
    gate = _novelty_gate(spark, str(tmp_path))
    gate.reset_state()
    try:
        docs.coalesce(1).write.mode("append").parquet(gate.in_dir)
        gate.run_available_now()
        committed = sorted(map(tuple, gate.results().collect()))
        # simulate the torn job-commit: a partial dir with data, no marker
        torn = os.path.join(gate.results_dir, "batch_99")
        gate.results().limit(2).write.parquet(torn)
        os.remove(os.path.join(torn, "_SUCCESS"))
        assert sorted(map(tuple, gate.results().collect())) == committed
    finally:
        gate.ingestor.drop_state()


def test_streaming_gate_wave_ids_are_one_based(spark, tmp_path):
    """r10 ADVICE item 3: batch ids start at 0 but wave 0 is the
    universal no-completed-wave resume sentinel, so the gate passes
    batch_id + 1 — the first batch's state/results are tagged wave 1
    and explicit wave_id=0 is rejected outright."""
    import os

    from clickhouse_segments_tutorial_spark.plans.curation import (
        IncrementalNoveltyScorer,
        IncrementalSemanticDeduper,
    )
    from clickhouse_segments_tutorial_spark.plans.incremental import (
        IncrementalCorpusCurator,
    )

    docs = _docs(spark, [(i, f"u{i} v{i} w x") for i in range(6)])
    gate = _novelty_gate(spark, str(tmp_path))
    gate.reset_state()
    try:
        docs.coalesce(1).write.mode("append").parquet(gate.in_dir)
        gate.run_available_now()
        # gate state is tagged wave >= 1, never 0
        assert gate.ingestor._wave == 1
        # a default-numbering re-attach onto the gate's workdir resumes
        # at the completed wave instead of tripping the orphaned-state
        # guard (the w0-ambiguity ADVICE scenario)
        sc2 = IncrementalNoveltyScorer(spark, f"{tmp_path}/state")
        out = sc2.ingest(docs.limit(0))
        assert sc2._wave == 2 and out.count() == 0
        # explicit wave_id 0 (or negative) is rejected at every ingest
        import pytest as _pytest

        emb = spark.createDataFrame(
            [], "vec_id long, embedding array<float>, label int"
        )
        from clickhouse_segments_tutorial_spark.plans.incremental import (
            eval_grams_from_docs,
        )

        for ing, wave in (
            (IncrementalNoveltyScorer(spark, f"{tmp_path}/s2"), docs.limit(0)),
            (
                IncrementalSemanticDeduper(spark, f"{tmp_path}/s3", threshold=0.9),
                emb,
            ),
            (
                IncrementalCorpusCurator(
                    spark, f"{tmp_path}/s4", eval_grams_from_docs(docs.limit(1))
                ),
                docs.limit(0).withColumn("lang", F.lit("en")),
            ),
        ):
            with _pytest.raises(ValueError, match="wave_id"):
                ing.ingest(wave, wave_id=0)
    finally:
        gate.ingestor.drop_state()


# --- IncrementalMinHashDeduper ------------------------------------------------


def test_incremental_minhash_pairs_equal_batch_any_split(spark, tmp_path):
    """The union of per-wave pair sets must equal the batch MinHash-LSH
    pair set from ANY disjoint split — a pair is discovered when its
    later member arrives, and banded signatures depend only on the doc.
    Interleaved doc_id % 3 waves deliberately break ascending-id order."""
    from clickhouse_segments_tutorial_spark.operators.dedup import minhash_lsh_pairs
    from clickhouse_segments_tutorial_spark.plans.curation import (
        IncrementalMinHashDeduper,
    )
    from clickhouse_segments_tutorial_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    batch = sorted(
        map(tuple, minhash_lsh_pairs(docs, n=3, k=64, bands=32, threshold=0.8).collect())
    )
    ded = IncrementalMinHashDeduper(spark, str(tmp_path / "mh"))
    ded.reset()
    outs = [ded.ingest(docs.filter(F.col("doc_id") % 3 == k)) for k in range(3)]
    inc = sorted(
        tuple(r) for out in outs for r in out.collect()
    )
    assert inc == batch
    assert len(batch) > 0  # the corpus must actually contain near-dups
    ded.drop_state()


def test_incremental_minhash_replay_and_compact_safe(spark, tmp_path):
    """A crash-replayed LATEST wave (the gate's actual crash window)
    re-emits its original pairs byte-identically — its own state rows
    reduce to intra-wave pairs under the id_a < id_b normalization —
    including after compaction. Replaying an OLDER wave is outside the
    contract: it re-reports (but never invents) cross-wave pairs later
    waves already emitted."""
    from clickhouse_segments_tutorial_spark.plans.curation import (
        IncrementalMinHashDeduper,
    )
    from clickhouse_segments_tutorial_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    ded = IncrementalMinHashDeduper(spark, str(tmp_path / "mh"))
    ded.reset()
    w1 = docs.filter(F.col("doc_id") % 2 == 0)
    w2 = docs.filter(F.col("doc_id") % 2 == 1)
    out1 = sorted(map(tuple, ded.ingest(w1, wave_id=1).collect()))
    out2 = sorted(map(tuple, ded.ingest(w2, wave_id=2).collect()))
    replay2 = sorted(map(tuple, ded.ingest(w2, wave_id=2).collect()))
    assert replay2 == out2
    ded.compact()
    replay2b = sorted(map(tuple, ded.ingest(w2, wave_id=2).collect()))
    assert replay2b == out2
    # out-of-window replay: superset of the wave's own pairs, subset of
    # everything already reported — nothing new is invented
    replay1 = sorted(map(tuple, ded.ingest(w1, wave_id=1).collect()))
    assert set(out1) <= set(replay1) <= set(out1) | set(out2)
    ded.drop_state()


def test_shared_state_naming_and_wave_resolution_contract(tmp_path):
    """r11 review finding 5: the per-workdir table mangle and the
    resume/sentinel wave numbering now have ONE definition site
    (sources/bucketed.py) shared by all five wave-state classes — this
    pins the contract they all inherit."""
    import pytest as _pytest

    from clickhouse_segments_tutorial_spark.sources.bucketed import (
        resolve_wave_counter,
        state_table_prefix,
    )

    a = state_table_prefix(str(tmp_path / "state"), "novstate")
    # deterministic: a crashed re-run must re-attach to the same tables
    assert a == state_table_prefix(str(tmp_path / "state"), "novstate")
    # full-path hashed: same basename under different parents must differ
    b = state_table_prefix(str(tmp_path / "other" / "state"), "novstate")
    assert a != b and a.startswith("novstate_state_")
    # catalog-safe: identifier chars only
    import re as _re

    assert _re.fullmatch(r"[a-z0-9_]+", a)

    # explicit wave id wins and the probe is not consulted
    assert resolve_wave_counter(0, 7, lambda: 1 / 0) == 7
    # fresh counter resumes after the probe's last completed wave
    assert resolve_wave_counter(0, None, lambda: 3) == 4
    # warm counter just increments (probe not consulted)
    assert resolve_wave_counter(5, None, lambda: 1 / 0) == 6
    # fresh workdir (probe 0) starts at 1
    assert resolve_wave_counter(0, None, lambda: 0) == 1
    # 0 is the no-completed-wave sentinel: never a valid wave id
    with _pytest.raises(ValueError):
        resolve_wave_counter(0, 0, lambda: 0)
    with _pytest.raises(ValueError):
        resolve_wave_counter(0, -2, lambda: 0)


def test_streaming_rowcount_gate_restarts_with_cluster_key(spark, tmp_path):
    """The quota gate generalized to a row-count budget on an int group
    key (the streaming cluster-balance configuration, r11): per-group
    admitted counts survive a gate-object RESTART (checkpointed state),
    the cap is inclusive-prefix, and the order key may be a string."""
    from clickhouse_segments_tutorial_spark.streaming.stream_quota import (
        StreamingQuotaGate,
    )

    schema = "cluster int, _ord string"

    def mk():
        return StreamingQuotaGate(
            spark,
            str(tmp_path),
            schema=spark.createDataFrame([], schema).schema,
            budget=2,
            group_col="cluster",
            order_col="_ord",
            weight_expr=F.lit(1),
            group_type="int",
            order_type="string",
        )

    gate = mk()
    w1 = spark.createDataFrame(
        [(0, "aa"), (0, "ab"), (1, "ba")], schema
    )
    w1.coalesce(1).write.mode("append").parquet(gate.docs_dir)
    gate.run_available_now()
    # NEW gate object on the same workdir: state resumes from checkpoint —
    # cluster 0 is already full, cluster 1 admits exactly one more
    gate2 = mk()
    w2 = spark.createDataFrame(
        [(0, "ac"), (1, "bb"), (1, "bc")], schema
    )
    w2.coalesce(1).write.mode("append").parquet(gate2.docs_dir)
    gate2.run_available_now()
    got = sorted(
        (r["cluster"], r["_ord"], r["cum_tokens"]) for r in gate2.accepted().collect()
    )
    assert got == [(0, "aa", 1), (0, "ab", 2), (1, "ba", 1), (1, "bb", 2)]
