"""Physical-plan quality assertions: the properties that make these queries
scale are visible in `.explain` output, so pin them. A regression that
un-broadcasts a dimension join or stops pushing a filter into the parquet
scan changes the plan string long before it shows up in a wall-clock bench.
"""

from __future__ import annotations

import pytest

from clickhouse_segments_tutorial_spark.plans import all_queries

SF_DIR = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = all_queries()[name].spark(spark, SF_DIR)
    return formatted_plan(df)


def formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def node_count(plan: str, node: str) -> int:
    """Count physical nodes by their detail-section headers ``(id) Node`` —
    one per node regardless of how the tree rendering prints them (raw
    substring counts double-count tree + details and would break on a
    plan-formatting change)."""
    import re as _re

    return len(_re.findall(rf"^\(\d+\) {node}\b", plan, _re.M))


def test_q1_filter_pushed_and_columns_pruned(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # projection reaches the scan: no un-needed wide columns in ReadSchema
    assert "l_comment" not in plan
    assert "HashAggregate" in plan


def test_q3_broadcasts_dim_and_takeordered(spark):
    plan = plan_of(spark, "q3_top_revenue_orders")
    assert "BroadcastHashJoin" in plan
    # top-k must not be a global sort
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_q5_all_dims_broadcast(spark):
    plan = plan_of(spark, "q5_nation_revenue")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan


def test_rollup_is_single_pass_expand(spark):
    plan = plan_of(spark, "revenue_rollup_nation_year")
    assert "Expand" in plan  # grouping sets in one shuffle, not a UNION of passes
    assert "Union" not in plan


def test_semi_join_for_intersect(spark):
    plan = plan_of(spark, "heavy_click_and_view_users")
    assert "LeftSemi" in plan


def test_exists_compiles_to_semi_join(spark):
    plan = plan_of(spark, "order_priority_with_late_ship")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_not_in_compiles_to_broadcast_anti_join(spark):
    plan = plan_of(spark, "brand_supplier_counts_excluding_negative")
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan


def test_pivot_is_single_aggregate(spark):
    plan = plan_of(spark, "event_type_pivot")
    # explicit value list -> one conditional-count hash agg, no generator
    assert "HashAggregate" in plan
    assert "Generate" not in plan


def test_jaccard_no_cartesian(spark):
    plan = plan_of(spark, "jaccard_near_dup_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bucketed_table_skips_shuffle(spark):
    """Bucketing is the pay-once shuffle: a table bucketed+sorted on
    user_id must aggregate AND semi-join on that key with ZERO Exchange
    in the plan (the storage layout IS the partitioning)."""
    from pyspark.sql import functions as F

    from clickhouse_segments_tutorial_spark.sources.bucketed import (
        read_table,
        write_bucketed,
    )
    from clickhouse_segments_tutorial_spark.sources.catalog import load_table

    events = load_table(spark, SF_DIR, "events")
    spark.sql("DROP TABLE IF EXISTS ev_bucketed_test")
    write_bucketed(events, "ev_bucketed_test", key="user_id", buckets=8)
    b = read_table(spark, "ev_bucketed_test")

    agg = b.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    agg_plan = agg._sc._jvm.PythonSQLUtils.explainString(
        agg._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in agg_plan
    assert agg.count() > 0

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        heavy = b.groupBy("user_id").count().filter("count >= 2").select("user_id")
        semi = b.join(heavy, "user_id", "left_semi")
        semi_plan = semi._sc._jvm.PythonSQLUtils.explainString(
            semi._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in semi_plan
        assert semi.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.sql("DROP TABLE IF EXISTS ev_bucketed_test")


def test_microbatch_finalize_broadcasts_changed_users(spark, tmp_path):
    import datetime as dt

    from pyspark.sql import functions as F

    from clickhouse_segments_tutorial_spark.segmentation import (
        MicroBatchSegmenter,
        SegmentSpec,
    )
    from clickhouse_segments_tutorial_spark.segmentation.spec import CORPUS_EVENTS
    from clickhouse_segments_tutorial_spark.sources.catalog import load_table

    events = load_table(spark, SF_DIR, "events")
    spec = SegmentSpec(name="hc", event_name="click", threshold=13)
    seg = MicroBatchSegmenter(spark, str(tmp_path), spec, CORPUS_EVENTS)
    t0 = dt.datetime(2000, 1, 1)
    seg.process_batch(events, lower_bound=t0, now=t0)
    # the serve plan resolves latest-wins with a single hash aggregate
    members = seg.members()
    plan = members._sc._jvm.PythonSQLUtils.explainString(
        members._jdf.queryExecution(), "formatted"
    )
    assert "max_by" in plan or "HashAggregate" in plan


def test_hash_sample_is_scan_side_and_pruned(spark):
    """Deterministic sampling must stay a pure scan-side predicate: zero
    exchanges, and column pruning must reach the parquet scan (only the
    key column is read when only it is selected)."""
    from clickhouse_segments_tutorial_spark.operators.sampling import hash_sample
    from clickhouse_segments_tutorial_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    df = hash_sample(docs, 0.1, "doc_id").select("doc_id")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df.queryExecution() if hasattr(df, "queryExecution") else df._jdf.queryExecution(),
        "formatted",
    )
    assert "Exchange" not in plan
    assert "ReadSchema: struct<doc_id:bigint>" in plan


def test_chunk_documents_is_map_only(spark):
    """Chunking is explode + expressions — any Exchange would mean a
    100 TB shuffle of raw text."""
    plan = plan_of(spark, "doc_chunks")
    assert "Exchange" not in plan


def test_top_ngrams_shuffles_aggregates_not_grams(spark):
    """Two exchanges exactly: (grp, ngram) partial-aggregated counts, then
    the tiny (grp) exchange for the rank window. The first must be a
    hash-partial aggregate — shuffling RAW exploded grams on a handful of
    language keys would be the 100 TB anti-pattern."""
    plan = plan_of(spark, "top_bigrams_per_lang")
    # formatted explain lists each node twice (tree + detail section)
    assert plan.count("Exchange") // 2 == 2
    assert "partial_count" in plan  # map-side combine before the shuffle


def test_pack_chunks_single_shuffle(spark):
    """Packing is one Exchange on the shard key feeding one Arrow
    FlatMapGroupsInPandas — per-shard state never crosses executors.
    (Pinned on the words-lane operator directly: the registered
    packed_chunks query is the r17 two-head lane union, whose bytes
    lane adds the byte-BPE training exchanges.)"""
    from clickhouse_segments_tutorial_spark.plans.llm import packed_chunks

    plan = formatted_plan(packed_chunks(spark, SF_DIR))
    assert plan.count("Exchange") // 2 == 1
    assert "FlatMapGroupsInPandas" in plan


def test_mix_corpus_is_map_only(spark):
    """The mixture decision is a scan-side expression + explode: after the
    one driver-side counts collect, the corpus must NOT shuffle (no
    Exchange) — that is the whole scale story of the operator."""
    plan = plan_of(spark, "mixed_corpus_docs")
    assert "Exchange" not in plan
    assert "Generate explode" in plan or "explode" in plan


def test_contamination_broadcasts_eval_grams(spark):
    """The eval-gram set and the hit table must both ride broadcast joins;
    the only corpus-side Exchange allowed is the per-doc hit count (rare
    rows), never a full-corpus shuffle on text or grams."""
    plan = plan_of(spark, "contamination_check_docs")
    assert "BroadcastHashJoin" in plan
    # broadcast LEFT join for the zero-fill + broadcast inner for grams
    assert plan.count("BroadcastExchange") >= 2


# Queries whose physical plan legitimately contains a non-equi join:
# the documented exact quadratic oracle paths (their scale twins are
# bucketed) and the single-probe-row brute-force baseline.
_NON_EQUI_OK = {
    "embedding_near_dup_pairs",  # exact-lane O(n^2) oracle (lsh lane is bucketed)
    "extendedprice_logbin_quantiles",  # ONE-row log sketch x ONE-row eq sketch
    "knn_cosine_bruteforce",     # one probe row x corpus, by design
    "rich_idle_customers",       # scalar-subquery: ONE-row broadcast x corpus
    "tfidf_top_terms_docs",      # ONE-row corpus-count broadcast x tf table
    "bigram_lm_nll_docs",        # ONE-row vocab-count broadcast x bigrams
    "ccnet_ppl_buckets_docs",    # NLL's vocab scalar + ONE-row tercile cuts
    # the r12 incremental/streaming twins (consolidated into lane-tagged
    # lifecycle queries in r16) share the batch scorers above verbatim
    # (tfidf_from_stats / bigram_nll_from_counts), so they carry the
    # same single ONE-row scalar broadcast
    "tfidf_top_terms_lifecycle",
    "bigram_lm_nll_lifecycle",
}


@pytest.mark.parametrize("name", sorted(all_queries()), ids=str)
def test_no_cartesian_or_python_row_udfs_anywhere(spark, name):
    """Global plan hygiene across EVERY registered query: no cartesian /
    nested-loop joins outside the documented quadratic oracle paths, and no
    row-at-a-time Python UDFs ever (Arrow-batched pandas stages show as
    ArrowEvalPython and are allowed; BatchEvalPython is the 10-100x slow
    path this repo bans)."""
    plan = plan_of(spark, name)
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    if name not in _NON_EQUI_OK:
        assert "CartesianProduct" not in plan, f"{name}: cartesian join"
        assert "BroadcastNestedLoopJoin" not in plan, f"{name}: non-equi join"


def test_tfidf_partial_agg_no_row_udfs(spark):
    """TF-IDF: tf/df are hash aggregates (map-side partial applies), the
    only nested-loop is the one-row corpus-count broadcast, and the per-doc
    top-k is a window over doc_id — never a global sort."""
    plan = plan_of(spark, "tfidf_top_terms_docs")
    assert "HashAggregate" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # exactly the 1-row scalar broadcast: counted from the parsed node
    # list, so an accidental second nested-loop join fails and a Spark
    # plan-formatting change cannot fail it spuriously
    assert node_count(plan, "BroadcastNestedLoopJoin") == 1
    assert "RunningWindowFunction" in plan or "Window" in plan
    assert "GlobalLimit" not in plan.split("Window")[0]  # no pre-window sort-limit


def test_bigram_nll_context_counts_fold_from_bigram_counts(spark):
    """The C(w1,.) context table must aggregate the vocab-sized bigram-count
    table, not re-explode the corpus: exactly two corpus-wide token explodes
    appear in the plan (bigram stream + vocab count), not three."""
    plan = plan_of(spark, "bigram_lm_nll_docs")
    assert plan.count("Generate posexplode") <= 2 or plan.count("posexplode") <= 2
    assert "BatchEvalPython" not in plan
    assert node_count(plan, "BroadcastNestedLoopJoin") == 1  # the 1-row vocab scalar only


def test_incremental_wrapper_never_collects_corpus():
    """corpus_curated_incremental must return a LAZY plan over its scratch
    state table: a .collect() of the curated corpus is corpus-proportional
    driver traffic (tens of GB at 1B docs). AST-level guard over the
    whole module — the curator's state tables are file-backed, so nothing
    in it ever has a legitimate reason to collect (docstrings mentioning
    the anti-pattern are fine; calls are not)."""
    import ast
    import inspect

    import clickhouse_segments_tutorial_spark.plans.incremental as inc

    calls = [
        node.func.attr
        for node in ast.walk(ast.parse(inspect.getsource(inc)))
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute)
    ]
    assert "collect" not in calls and "toPandas" not in calls


def test_incremental_result_outlives_wrapper(spark):
    """The returned DataFrame must stay actionable after the wrapper has
    dropped its wave-state dirs (the plan may only depend on curated/)."""
    from clickhouse_segments_tutorial_spark.plans.incremental import (
        corpus_curated_incremental,
    )

    df = corpus_curated_incremental(spark, SF_DIR)
    n1 = df.count()
    n2 = df.count()  # second action: files must still be there
    assert n1 == n2 and n1 > 0


def test_incremental_state_joins_colocate_on_bucketed_state(spark, tmp_path):
    """Round-9 scale fix: a wave's anti-joins / band-join against the
    persisted dedup state must shuffle ONLY the wave. The state lives in
    bucketed catalog tables keyed on the join key (sources/bucketed.py),
    so the state side of each join reads co-located with zero Exchange —
    plain parquet state would reshuffle the FULL history every wave
    (O(corpus) shuffle bytes per wave at 100 TB)."""
    from pyspark.sql import functions as F

    from clickhouse_segments_tutorial_spark.plans.incremental import (
        IncrementalCorpusCurator,
        eval_grams_from_docs,
    )

    eval_df = spark.createDataFrame([(900, "en", "benchmark only text")],
                                    "doc_id long, lang string, text string")
    cur = IncrementalCorpusCurator(
        spark, str(tmp_path / "state"), eval_grams_from_docs(eval_df)
    )
    cur.ingest(
        spark.createDataFrame(
            [(1, "en", "the quick brown fox jumps over the lazy dog today")],
            "doc_id long, lang string, text string",
        )
    )

    wave_h = spark.range(100).select(F.md5(F.col("id").cast("string")).alias("_h"))
    wave_bands = spark.range(100).select(
        F.col("id").alias("_id"),
        (F.col("id") % 4).cast("int").alias("band"),
        F.xxhash64("id").alias("bucket"),
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        anti = wave_h.join(cur._read("para_hashes"), "_h", "left_anti")
        plan = formatted_plan(anti)
        assert "Bucketed: true" in plan  # state scan uses the bucketing
        # exactly ONE Exchange: the wave side; none above the state scan
        assert node_count(plan, "Exchange") == 1

        band = wave_bands.join(cur._read("exd_bands"), ["band", "bucket"])
        plan2 = formatted_plan(band)
        assert "Bucketed: true" in plan2
        assert node_count(plan2, "Exchange") == 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    cur.drop_dedup_state()


def test_cube_is_single_pass_expand(spark):
    plan = plan_of(spark, "revenue_cube_flag_status")
    assert "Expand" in plan  # all 4 grouping sets in one shuffle
    assert "Union" not in plan


def test_quota_and_shuffle_are_single_exchange_windows(spark):
    """The round-9 window operators must cost exactly ONE shuffle each:
    quota = running-sum window partitioned by source, shuffle = rank
    window partitioned by bucket. A second Exchange would mean the
    partitioning key leaked (e.g. a repartition before the window)."""
    for name in ("source_quota_docs", "shuffled_chunk_order"):
        plan = plan_of(spark, name)
        assert node_count(plan, "Exchange") == 1, f"{name}: extra shuffle"
        assert "Window" in plan
        assert "BatchEvalPython" not in plan


def test_novelty_is_two_hash_agg_shuffles(spark):
    """Novelty = distinct-gram explode -> min-doc hash agg -> join back ->
    per-doc agg: two shuffle keys (gram, doc_id). At sf the join side
    broadcasts; the assert bounds TOTAL exchanges so a corpus re-explode
    or an extra repartition fails the test."""
    plan = plan_of(spark, "novelty_ngram_docs")
    assert "HashAggregate" in plan
    assert node_count(plan, "Exchange") <= 3
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan


def test_bpe_pair_count_is_partial_agg_no_python(spark):
    """One BPE train round's pair-count: explode over the dictionary ->
    hash-agg with MAP-SIDE PARTIAL counts (shuffle carries one row per
    distinct pair per task, not per occurrence), argmax as
    TakeOrderedAndProject (per-partition top-1 + driver merge — no
    global sort), and zero Python in the plan. This IS the per-round
    scale story of distributed BPE training."""
    from pyspark.sql import functions as F

    from clickhouse_segments_tutorial_spark.operators import bpe

    docs = spark.createDataFrame(
        [(1, "low lower lowest"), (2, "new newest")], "doc_id long, text string"
    )
    words = bpe._init_symbols(bpe.word_frequencies(docs))
    top1 = (
        bpe._pair_counts(words)
        .orderBy(F.desc("cnt"), F.asc("lhs"), F.asc("rhs"))
        .limit(1)
    )
    plan = formatted_plan(top1)
    assert "partial_sum" in plan  # map-side combine before the shuffle
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bpe_token_counts_dictionary_join_no_python(spark):
    """Corpus tokenization with a trained dictionary is a join from
    exploded tokens to the dictionary (broadcast at this scale — AQE's
    choice) plus hash-aggs; the 32-merge application never appears in
    the scoring plan (it was paid once at train time) and no Python
    runs per row."""
    from clickhouse_segments_tutorial_spark.operators import bpe

    docs = spark.createDataFrame(
        [(1, "low lower lowest low"), (2, "new newest"), (3, "   ")],
        "doc_id long, text string",
    )
    _, trained = bpe.bpe_train(bpe.word_frequencies(docs), n_merges=4)
    plan = formatted_plan(bpe.bpe_token_counts(docs, trained))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the fold expression (aggregate(...)) belongs to training only
    assert "aggregate(" not in plan.lower() or "partial" in plan


def test_zorder_layout_prunes_on_every_clustered_dimension(spark, tmp_path):
    """Z-order clustering (sources/zorder.py): on a 64x64 grid written as
    16 range-partitioned files, footer min/max statistics prune a
    predicate on EITHER clustered dimension, where a single-column sort
    prunes only its own column — the property the layout-rewrite path
    exists for. Also pins the documented trade (a single-column sort
    prunes its own column at least as well) and that clustering is a
    pure reorder: the data read back is identical."""
    from pyspark.sql import functions as F

    from clickhouse_segments_tutorial_spark.sources.zorder import (
        append_zordered,
        files_overlapping,
    )

    df = spark.range(0, 64 * 64).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    zpath = str(tmp_path / "zord")
    append_zordered(df, zpath, zorder_by=["x", "y"], bits=6, num_files=16)
    spath = str(tmp_path / "xsort")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(
        spath
    )

    # y-only probe: the x-sorted layout cannot prune at all; z-order
    # confines an 8-row strip to the squares it actually crosses.
    yhit_z, tot_z = files_overlapping(zpath, {"y": (8, 15)})
    yhit_s, tot_s = files_overlapping(spath, {"y": (8, 15)})
    assert tot_z == 16 and tot_s == 16
    assert yhit_s == 16
    assert yhit_z <= 8

    # x-only probe: both layouts prune; single-column sort prunes its
    # OWN column at least as well (the documented trade).
    xhit_z, _ = files_overlapping(zpath, {"x": (8, 15)})
    xhit_s, _ = files_overlapping(spath, {"x": (8, 15)})
    assert xhit_z <= 8
    assert xhit_s <= xhit_z

    # box probe on both dims: an aligned 8x8 quadrant is (nearly) one
    # z-block; allow range-boundary slop but require real pruning.
    bhit_z, _ = files_overlapping(zpath, {"x": (8, 15), "y": (8, 15)})
    assert bhit_z <= 3

    # clustering is a reorder, not a transform
    back = spark.read.parquet(zpath)
    assert back.count() == 4096
    assert back.select(F.sum("payload")).first()[0] == sum(range(4096))


def test_spread_gated_on_input_parallelism(spark):
    """The spread() fan-out must be CONDITIONAL (r14 verdict item 1): a
    map-only text operator over an input already at cluster parallelism
    must plan with ZERO Exchange nodes (at 100 TB the scan arrives as
    ~800k splits and an unconditional round-robin repartition would
    shuffle every byte of text for nothing), while an under-split input
    (one big file -> one task) still pays the one cheap shuffle that
    buys full-cluster fan-out."""
    from pyspark.sql import functions as F

    from clickhouse_segments_tutorial_spark.operators.text import (
        spread,
        text_stats,
    )

    par = spark.sparkContext.defaultParallelism
    mk = lambda n_parts: spark.range(0, 256, 1, n_parts).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("some words here doc "), F.col("id")).alias("text"),
    )

    wide = mk(par * 2)
    assert spread(wide) is wide  # pass-through, not even a new plan node
    assert node_count(formatted_plan(text_stats(wide)), "Exchange") == 0

    narrow = mk(1)
    narrow_plan = formatted_plan(text_stats(narrow))
    assert node_count(narrow_plan, "Exchange") == 1
    assert "REPARTITION_BY_NUM" in narrow_plan or "RoundRobin" in narrow_plan


def test_interval_join_is_bucketed_equi_join(spark):
    """The range join must reach the executor as an EQUI-join on
    (key, bucket) with the exact range check as a residual — never a
    BroadcastNestedLoopJoin / CartesianProduct (what a raw range
    predicate degenerates to), which is the entire point of the
    bucketed operator."""
    plan = plan_of(spark, "purchases_in_signup_window")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "_bkt" in plan  # the bucket participates in the join keys
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_quantile_sketch_has_no_sort(spark):
    """The histogram-sketch quantile queries must plan with ZERO Sort
    nodes — the whole point vs exact percentile (a per-group global
    sort): construction is two hash aggs and the estimator an
    expression walk over the array state. The merged variant adds only
    the partial-fold agg, still sortless."""
    for name in (
        "order_value_quantiles_by_priority",
        "order_value_quantiles_merged",
    ):
        plan = plan_of(spark, name)
        assert node_count(plan, "Sort") == 0, name
        assert node_count(plan, "HashAggregate") >= 2, name
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cms_probe_broadcasts_sketch(spark):
    """The CMS point-estimate join must broadcast the counter table
    (d*w rows by construction — never a shuffled join against the
    probe set) and the top-k harness side must be TakeOrderedAndProject,
    not a global sort."""
    plan = plan_of(spark, "heavy_user_counts_cms")
    assert node_count(plan, "BroadcastHashJoin") >= 1
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_agg_maps_single_pass(spark):
    """agg_maps computes every map aggregate in ONE shared pass: one
    parquet scan, no join (the naive two-agg_map shape scanned twice
    and broadcast-joined on the group key)."""
    plan = plan_of(spark, "user_event_type_maps")
    assert node_count(plan, "Scan parquet") == 1
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cms_heavy_hitters_candidates_sub_universe(spark):
    """r15 verdict item 2: cms_heavy_hitters' candidate pass must not
    shuffle the full key universe. The r15 anti-pattern was
    ``distinct(user_id)`` — a HashAggregate keyed on user_id with NO
    aggregate functions — feeding the sketch probe; the dyadic-range
    walk replaced it, so the ONLY user_id-keyed aggregate left is the
    exact verify over candidate rows (functions=[count(1)]), sitting
    ABOVE the candidate semi-join. Assert no empty-functions aggregate
    over the item column anywhere in the plan, and that the verify
    semi-join survives."""
    import re as _re

    plan = plan_of(spark, "heavy_users_exact_via_cms")
    blocks = _re.split(r"^(?=\(\d+\) )", plan, flags=_re.M)
    for b in blocks:
        if not b.startswith("(") or "HashAggregate" not in b.split("\n")[0]:
            continue
        keys = _re.search(r"^Keys \[\d+\]: \[(.*)\]$", b, _re.M)
        funcs = _re.search(r"^Functions \[(\d+)\]", b, _re.M)
        if keys and "user_id" in keys.group(1) and funcs:
            assert funcs.group(1) != "0", (
                "distinct(user_id)-shaped aggregate found — the "
                "candidate pass is shuffling the key universe again:\n" + b
            )
    assert "LeftSemi" in plan  # exact verify runs over candidate rows only


def test_bloom_skip_index_prunes_point_probes(spark, tmp_path):
    """File-level Bloom skip index (sources/bloom_index.py — the
    ClickHouse bloom_filter/tokenbf analog): on a layout range-split by
    user, a point probe on user_id keeps only the file(s) whose filter
    might contain it (real pruning), NEVER drops a file that holds the
    value (no false negatives — pruned-scan results equal the full
    scan's for every probed user), and files appended after indexing
    are conservatively kept until indexed."""
    from pyspark.sql import functions as F

    from clickhouse_segments_tutorial_spark.sources.bloom_index import (
        index_files,
        pruned_paths,
    )
    from clickhouse_segments_tutorial_spark.sources.catalog import load_table

    ev = load_table(spark, SF_DIR, "events").select("user_id", "event_id")
    path = str(tmp_path / "ev_bloom")
    ev.repartitionByRange(8, "user_id").write.parquet(path)
    assert index_files(spark, path, "user_id") == 8
    # second call: everything already indexed
    assert index_files(spark, path, "user_id") == 0

    users = [r.user_id for r in ev.select("user_id").distinct().limit(5).collect()]
    n_files = 8
    pruned_some = False
    for u in users:
        keep = pruned_paths(spark, path, "user_id", u)
        assert keep  # at least the owning file survives
        pruned_some |= len(keep) < n_files
        got = (
            spark.read.parquet(*keep)
            .filter(F.col("user_id") == u)
            .count()
        )
        want = ev.filter(F.col("user_id") == u).count()
        assert got == want, (u, len(keep))
    assert pruned_some  # the index actually skips files

    # unindexed append: new file must be KEPT (never skipped) ...
    extra = spark.createDataFrame([(999_999, 0)], "user_id long, event_id long")
    extra.coalesce(1).write.mode("append").parquet(path)
    keep = pruned_paths(spark, path, "user_id", 999_999)
    assert (
        spark.read.parquet(*keep).filter(F.col("user_id") == 999_999).count()
        == 1
    )
    # ... and one incremental index_files call covers exactly it
    assert index_files(spark, path, "user_id") == 1

    # an all-null-column file still gets a sidecar row (the zero mask):
    # it prunes for EVERY probe — a null can't match an equality — and
    # the next incremental call must not rescan it forever
    before = set(pruned_paths(spark, path, "user_id", 999_999))
    nulls = spark.createDataFrame(
        [(None, 1)], "user_id long, event_id long"
    )
    nulls.coalesce(1).write.mode("append").parquet(path)
    assert index_files(spark, path, "user_id") == 1
    assert index_files(spark, path, "user_id") == 0  # not rescanned
    after = set(pruned_paths(spark, path, "user_id", 999_999))
    assert after == before  # indexed already-pruned, never kept


def test_bloom_probe_launches_no_job_over_data(spark, tmp_path):
    """r15 verdict item 1: the probe path must never run a Spark job
    over the data table. File enumeration comes from the FileIndex
    (``inputFiles()`` — metadata only, one driver-side footer read) and
    the mask test is a distributed filter over the SIDECAR, collecting
    names + a survive bit, never masks. Pinned by running the probe
    inside a job group and counting its jobs: exactly ONE (the sidecar
    scan) — the old implementation's
    ``input_file_name().distinct().collect()`` file enumeration added a
    scan+shuffle job over every table row, which at 100 TB costs more
    than the unpruned query the index exists to avoid. The build side
    is pinned too: an incremental call after a one-file append must
    read only that file, so its scan job carries exactly one task."""
    from pyspark.sql import functions as F

    from clickhouse_segments_tutorial_spark.sources.bloom_index import (
        index_files,
        pruned_paths,
    )
    from clickhouse_segments_tutorial_spark.sources.catalog import load_table

    ev = load_table(spark, SF_DIR, "events").select("user_id", "event_id")
    path = str(tmp_path / "ev_bloom_jobs")
    ev.repartitionByRange(8, "user_id").write.parquet(path)
    assert index_files(spark, path, "user_id") == 8

    sc = spark.sparkContext
    group = "bloom_probe_job_audit"
    sc.setJobGroup(group, "bloom probe must only read the sidecar")
    try:
        keep = pruned_paths(spark, path, "user_id", 1)
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert keep  # sanity: the probe still answers
    jobs = sc.statusTracker().getJobIdsForGroup(group)
    assert len(jobs) == 1, (
        f"probe ran {len(jobs)} jobs — anything past the sidecar scan "
        "means the data table is being scanned on the probe path"
    )

    # incremental build after a 1-row append must read ONLY the new
    # file. Structural pin, stronger than job counting: corrupt every
    # already-indexed data file — an implementation that rescans the
    # whole table (the r15 shape: scan + left_anti above the explode)
    # crashes on the garbage; reading only the new-file list succeeds.
    import pathlib

    for f in pathlib.Path(path).glob("part-*.parquet"):
        f.write_bytes(b"not a parquet file")
    extra = spark.createDataFrame([(999_999, 0)], "user_id long, event_id long")
    extra.coalesce(1).write.mode("append").parquet(path)
    assert index_files(spark, path, "user_id") == 1
    # ... and the probe never opens ANY data file (all 8 originals are
    # garbage now; only the FileIndex listing and the sidecar are read)
    keep = pruned_paths(spark, path, "user_id", 999_999)
    assert any("part-" in f for f in keep)


def test_tokenbf_index_prunes_word_probes(spark, tmp_path):
    """tokenbf_v1 mode: a token-level Bloom over documents.text prunes
    files for a word probe with no false negatives — every document
    containing the probed token survives in the pruned scan."""
    from pyspark.sql import functions as F

    from clickhouse_segments_tutorial_spark.operators.text import tokens
    from clickhouse_segments_tutorial_spark.sources.bloom_index import (
        index_files,
        pruned_paths,
    )
    from clickhouse_segments_tutorial_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    path = str(tmp_path / "docs_tokenbf")
    # hash-split so token sets differ per file (docs are small; a rare
    # token lands in few files)
    docs.repartition(8, "doc_id").write.parquet(path)
    assert index_files(spark, path, "text", tokenized=True) == 8

    # pick a token that appears in only a handful of docs
    tok_counts = (
        docs.select(F.explode(tokens(F.col("text"))).alias("t"))
        .groupBy("t")
        .count()
        .orderBy("count", "t")
        .limit(1)
        .collect()
    )
    rare = tok_counts[0]["t"]
    want = docs.filter(F.array_contains(tokens(F.col("text")), rare)).count()
    keep = pruned_paths(spark, path, "text", rare, tokenized=True)
    got = (
        spark.read.parquet(*keep)
        .filter(F.array_contains(tokens(F.col("text")), rare))
        .count()
    )
    assert got == want >= 1
    # a nonsense token prunes everything (no file can contain it,
    # modulo the documented false-positive rate at this fill factor —
    # allow fp survivors but require real pruning)
    assert len(pruned_paths(spark, path, "text", "zzqqxxyy_not_a_word",
                            tokenized=True)) <= 4


def test_ngrambf_index_prunes_substring_probes(spark, tmp_path):
    """ngrambf_v1 mode: a char-3-gram Bloom over documents.text serves
    SUBSTRING probes — every doc containing the fragment survives the
    pruned scan (no false negatives: a file can hold the fragment only
    if all its 3-grams are present); a fragment shorter than the gram
    size honestly prunes nothing."""
    from pyspark.sql import functions as F

    from clickhouse_segments_tutorial_spark.operators.text import tokens
    from clickhouse_segments_tutorial_spark.sources.bloom_index import (
        index_files,
        pruned_paths,
    )
    from clickhouse_segments_tutorial_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    path = str(tmp_path / "docs_ngrambf")
    docs.repartition(8, "doc_id").write.parquet(path)
    assert index_files(spark, path, "text", ngram=3) == 8

    # probe with a rare whole word (its 3-grams must all be present)
    rare = (
        docs.select(F.explode(tokens(F.col("text"))).alias("t"))
        .filter(F.length("t") >= 4)
        .groupBy("t")
        .count()
        .orderBy("count", "t")
        .first()["t"]
    )
    want = docs.filter(F.col("text").contains(rare)).count()
    keep = pruned_paths(spark, path, "text", rare, ngram=3)
    got = (
        spark.read.parquet(*keep).filter(F.col("text").contains(rare)).count()
    )
    assert got == want >= 1

    # a fragment shorter than n cannot prune (no grams)
    assert len(pruned_paths(spark, path, "text", "ab", ngram=3)) == 8
    # modes are mutually exclusive
    import pytest as _pytest

    with _pytest.raises(ValueError, match="mutually exclusive"):
        index_files(spark, path, "text", tokenized=True, ngram=3)


def test_bloom_sidecar_compaction(spark, tmp_path):
    """r16 verdict item 4: incremental builds append one sidecar parquet
    each, so a daily-append table turns the probe's single job into a
    small-file listing storm. compact_sidecar must collapse the sidecar
    to ONE file with identical probe verdicts, and the probe must still
    run exactly one job afterwards."""
    from pyspark.sql import functions as F

    from clickhouse_segments_tutorial_spark.sources.bloom_index import (
        _sidecar,
        compact_sidecar,
        index_files,
        pruned_paths,
    )
    from clickhouse_segments_tutorial_spark.sources.catalog import load_table

    ev = load_table(spark, SF_DIR, "events").select("user_id", "event_id")
    path = str(tmp_path / "ev_bloom_compact")
    ev.repartitionByRange(8, "user_id").write.parquet(path)
    assert index_files(spark, path, "user_id") == 8
    # three incremental appends -> three more sidecar files
    for uid in (1_000_001, 1_000_002, 1_000_003):
        spark.createDataFrame(
            [(uid, 0)], "user_id long, event_id long"
        ).coalesce(1).write.mode("append").parquet(path)
        assert index_files(spark, path, "user_id") == 1

    side = _sidecar(path, "user_id")
    before_files = spark.read.parquet(side).inputFiles()
    assert len(before_files) == 4
    users = [r.user_id for r in ev.select("user_id").distinct().limit(4).collect()]
    users.append(1_000_002)
    before = {u: set(pruned_paths(spark, path, "user_id", u)) for u in users}

    assert compact_sidecar(spark, path, "user_id") == 4
    assert len(spark.read.parquet(side).inputFiles()) == 1
    after = {u: set(pruned_paths(spark, path, "user_id", u)) for u in users}
    assert after == before  # same verdicts, row for row

    # probe job count is still exactly one (the sidecar scan)
    sc = spark.sparkContext
    group = "bloom_probe_after_compaction"
    sc.setJobGroup(group, "post-compaction probe job audit")
    try:
        keep = pruned_paths(spark, path, "user_id", users[0])
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert keep
    assert len(sc.statusTracker().getJobIdsForGroup(group)) == 1

    # compacting a non-existent sidecar is a no-op
    assert compact_sidecar(spark, path, "nope_col") == 0


def test_bloom_malformed_mask_keeps_file(spark, tmp_path):
    """r16 ADVICE: a sidecar row whose mask is shorter than m_bits//64
    (corruption, or a build at a different m_bits) made element_at
    return NULL and the NULL verdict read as PRUNE — a false negative.
    Malformed rows must mean KEEP for their file."""
    from clickhouse_segments_tutorial_spark.sources.bloom_index import (
        _sidecar,
        index_files,
        pruned_paths,
    )
    from clickhouse_segments_tutorial_spark.sources.catalog import load_table

    ev = load_table(spark, SF_DIR, "events").select("user_id", "event_id")
    path = str(tmp_path / "ev_bloom_malformed")
    ev.repartitionByRange(8, "user_id").write.parquet(path)
    assert index_files(spark, path, "user_id") == 8

    probe = ev.select("user_id").first().user_id
    keep = pruned_paths(spark, path, "user_id", probe)
    dropped = sorted(set(_all_ev_files(spark, path)) - set(keep))
    assert dropped  # the index prunes something for this probe
    victim = dropped[0]
    # append a malformed (length-1 mask) row for an already-pruned file:
    # the untrusted row must flip it back to KEPT, never the reverse
    spark.createDataFrame(
        [(victim, [0])], "file string, mask array<bigint>"
    ).coalesce(1).write.mode("append").parquet(_sidecar(path, "user_id"))
    keep2 = pruned_paths(spark, path, "user_id", probe)
    assert victim in keep2
    assert set(keep) <= set(keep2)


def _all_ev_files(spark, path):
    from clickhouse_segments_tutorial_spark.sources.bloom_index import (
        _data_files,
    )

    return _data_files(spark, path)


def test_bloom_sidecar_read_error_propagates(spark, tmp_path):
    """r16 ADVICE: only the missing-path case may mean 'no sidecar yet'.
    A corrupt sidecar read must RAISE from index_files — the old
    swallow-everything path silently re-indexed every file and appended
    duplicate rows."""
    import pytest as _pytest

    from clickhouse_segments_tutorial_spark.sources.bloom_index import (
        _sidecar,
        index_files,
    )
    from clickhouse_segments_tutorial_spark.sources.catalog import load_table

    ev = load_table(spark, SF_DIR, "events").select("user_id", "event_id")
    path = str(tmp_path / "ev_bloom_corrupt")
    ev.repartitionByRange(4, "user_id").write.parquet(path)
    assert index_files(spark, path, "user_id") == 4

    side = _sidecar(path, "user_id")
    import pathlib

    (pathlib.Path(side) / "part-corrupt.parquet").write_bytes(
        b"this is not parquet"
    )
    with _pytest.raises(Exception, match="(?i)parquet|footer|corrupt"):
        index_files(spark, path, "user_id")


def test_bloom_hasalltokens_conjunction(spark, tmp_path):
    """r16 verdict item 5: CH's hasToken composes with AND; the tokenbf
    sidecar serves the conjunction directly — the kept set must be
    exactly the intersection of the per-token kept sets (the probe's
    bit union), and reading it with the double filter on top must match
    the unpruned double-filtered scan."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from clickhouse_segments_tutorial_spark.operators.text import tokens
    from clickhouse_segments_tutorial_spark.sources.bloom_index import (
        index_files,
        pruned_paths,
    )
    from clickhouse_segments_tutorial_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    path = str(tmp_path / "docs_tokenbf_and")
    docs.repartition(8, "doc_id").write.parquet(path)
    assert index_files(spark, path, "text", tokenized=True) == 8

    # two moderately rare tokens that co-occur in at least one doc
    t1, t2 = [
        r.t
        for r in docs.select(F.explode(tokens(F.col("text"))).alias("t"))
        .groupBy("t")
        .count()
        .filter(F.length("t") >= 5)
        .orderBy(F.desc("count"))
        .limit(2)
        .collect()
    ]
    both = docs.filter(
        F.array_contains(tokens(F.col("text")), t1)
        & F.array_contains(tokens(F.col("text")), t2)
    )
    want = both.count()
    keep_and = pruned_paths(spark, path, "text", [t1, t2], tokenized=True)
    got = (
        spark.read.parquet(*keep_and)
        .filter(
            F.array_contains(tokens(F.col("text")), t1)
            & F.array_contains(tokens(F.col("text")), t2)
        )
        .count()
    )
    assert got == want
    k1 = set(pruned_paths(spark, path, "text", t1, tokenized=True))
    k2 = set(pruned_paths(spark, path, "text", t2, tokenized=True))
    assert set(keep_and) == k1 & k2

    # a list probe outside tokenized mode is a contract error
    with _pytest.raises(ValueError, match="tokenized"):
        pruned_paths(spark, path, "text", [t1, t2])
