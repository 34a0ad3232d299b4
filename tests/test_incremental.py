"""Incremental corpus curation: per-wave stateful decisions.

Fixture-level tests of the first-ACCEPTED-wins contract —
cross-wave paragraph/exact/near-dup state, anchor-drop components, the
documented bridge-doc divergence from batch recompute, fixed-eval
decontamination, and empty-wave no-ops."""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_segments_tutorial_spark.plans.incremental import (
    IncrementalCorpusCurator,
    eval_grams_from_docs,
)

SCHEMA = "doc_id long, lang string, text string"

# long enough to clear the 10-token floor and the quality gate
BASE = "the quick brown fox jumps over the lazy dog and it is very happy today"
OTHER = "pack my box with five dozen liquor jugs and you will see that it is fine"
THIRD = "sphinx of black quartz judge my vow and the end of it is that you agree"


def _curator(spark, tmp_path, eval_rows=None):
    eval_df = spark.createDataFrame(
        eval_rows or [(900, "en", "benchmark question about ancient history answers")],
        SCHEMA,
    )
    return IncrementalCorpusCurator(
        spark, str(tmp_path / "state"), eval_grams_from_docs(eval_df)
    )


def test_cross_wave_exact_and_paragraph_state(spark, tmp_path):
    cur = _curator(spark, tmp_path)
    w1 = spark.createDataFrame(
        [
            (1, "en", BASE),
            (2, "en", f"cookie banner accept all\n{OTHER}"),
        ],
        SCHEMA,
    )
    a1 = {r.doc_id for r in cur.ingest(w1).collect()}
    assert a1 == {1, 2}

    w2 = spark.createDataFrame(
        [
            (10, "en", BASE),  # exact dup of accepted doc 1 -> dropped
            # repeats wave-1 boilerplate line; its own paragraph survives
            (11, "en", f"cookie banner accept all\n{THIRD}"),
        ],
        SCHEMA,
    )
    a2 = {r.doc_id: r for r in cur.ingest(w2).collect()}
    assert set(a2) == {11}
    # the curated text of 11 lost the state-seen boilerplate paragraph
    assert "cookie banner" not in a2[11].text
    assert "sphinx" in a2[11].text
    assert cur.curated().count() == 3


def test_near_dup_anchor_drop_and_within_wave_groups(spark, tmp_path):
    cur = _curator(spark, tmp_path)
    cur.ingest(spark.createDataFrame([(1, "en", BASE)], SCHEMA))

    near_base = BASE.replace("today", "tonight")  # J >= 0.8 vs BASE
    near_other_a = OTHER.replace("fine", "great")
    near_other_b = OTHER.replace("fine", "nice")
    w2 = spark.createDataFrame(
        [
            (20, "en", near_base),      # anchors to accepted 1 -> dropped
            (21, "en", near_other_a),   # new group, min id -> kept
            (22, "en", near_other_b),   # same group as 21 -> dropped
        ],
        SCHEMA,
    )
    a2 = {r.doc_id for r in cur.ingest(w2).collect()}
    assert a2 == {21}


def test_bridge_doc_is_rejected_not_merging(spark, tmp_path):
    """The documented divergence from batch recompute: a later doc that is
    near-dup of TWO previously accepted docs cannot revoke either — it is
    rejected, both stay curated (first-ACCEPTED-wins)."""
    cur = _curator(spark, tmp_path)
    # 30 distinct tokens; a and b differ at positions 3 and 18 (Jaccard
    # (28-6)/(28+6) = 0.647 < 0.8 -> both accepted), the bridge takes a's
    # token at 3 and b's at 18 (one-token difference to each: (28-3)/(28+3)
    # = 0.806 >= 0.8 -> near-dup of BOTH)
    base = [f"w{i:02d}" for i in range(30)]

    def doc(p3, p18):
        t = list(base)
        t[3], t[18] = p3, p18
        return " ".join(t)

    a = doc("alphaa", "alphab")
    b = doc("betaa", "betab")
    w1 = spark.createDataFrame([(1, "en", a), (2, "en", b)], SCHEMA)
    a1 = {r.doc_id for r in cur.ingest(w1).collect()}
    assert a1 == {1, 2}
    bridge = doc("alphaa", "betab")
    a2 = {r.doc_id for r in cur.ingest(
        spark.createDataFrame([(30, "en", bridge)], SCHEMA)
    ).collect()}
    assert a2 == set()  # rejected; 1 and 2 remain curated
    assert {r.doc_id for r in cur.curated().collect()} == {1, 2}


def test_fixed_eval_decontamination(spark, tmp_path):
    eval_text = "benchmark question about ancient history answers"
    cur = _curator(spark, tmp_path, eval_rows=[(900, "en", eval_text)])
    w = spark.createDataFrame(
        [
            # carries a 5-gram of the benchmark -> dropped
            (1, "en", f"{BASE} benchmark question about ancient history answers"),
            (2, "en", OTHER),
        ],
        SCHEMA,
    )
    assert {r.doc_id for r in cur.ingest(w).collect()} == {2}


def test_empty_wave_is_noop(spark, tmp_path):
    cur = _curator(spark, tmp_path)
    cur.ingest(spark.createDataFrame([(1, "en", BASE)], SCHEMA))
    empty = spark.createDataFrame([], SCHEMA)
    assert cur.ingest(empty).count() == 0
    assert cur.curated().count() == 1


def test_quality_and_length_gates_apply_per_wave(spark, tmp_path):
    cur = _curator(spark, tmp_path)
    w = spark.createDataFrame(
        [
            (1, "en", BASE),
            (2, "en", "too short"),          # under 10 tokens
            (3, "en", "!!! ??? ;;; ### $$$ %%% ^^^ &&& *** ((( ))) @@@"),  # punct
        ],
        SCHEMA,
    )
    assert {r.doc_id for r in cur.ingest(w).collect()} == {1}


def _builder(spark, tmp_path, weights=None):
    from clickhouse_segments_tutorial_spark.plans.incremental import (
        IncrementalCorpusBuilder,
    )

    eval_df = spark.createDataFrame(
        [(900, "en", "benchmark question about ancient history answers")], SCHEMA
    )
    return IncrementalCorpusBuilder(
        spark,
        str(tmp_path / "state"),
        eval_grams_from_docs(eval_df),
        mix_weights=weights or {"en": 0.7, "de": 0.3},
        capacity=32,
        chunk_tokens=16,
        stride=16,
        shards=2,
    )


def test_builder_appends_are_sealed_across_waves(spark, tmp_path):
    """Wave 2 must only APPEND packed rows: every wave-1 row is byte-
    identical afterwards (sealed-sequence contract), and (shard, seq_id,
    position-in-sequence) never collides across waves."""
    bld = _builder(spark, tmp_path)
    bld.ingest(spark.createDataFrame([(1, "en", BASE), (2, "de", OTHER)], SCHEMA))
    after_w1 = {tuple(r) for r in bld.packed().collect()}
    assert after_w1, "wave 1 must emit packed rows"
    bld.ingest(spark.createDataFrame([(3, "en", THIRD)], SCHEMA))
    after_w2 = {tuple(r) for r in bld.packed().collect()}
    assert after_w1 <= after_w2
    new_rows = after_w2 - after_w1
    assert new_rows and all(r[1] == 2 for r in new_rows)  # wave column


def test_builder_seq_ids_monotone_and_capacity_respected(spark, tmp_path):
    """seq_id is per-shard monotone across waves (persisted pack_seq
    counters); no sequence's token sum exceeds capacity; each doc is
    packed exactly once, in its acceptance wave."""
    bld = _builder(spark, tmp_path)
    bld.ingest(spark.createDataFrame([(1, "en", BASE), (2, "de", OTHER)], SCHEMA))
    bld.ingest(
        spark.createDataFrame([(3, "en", THIRD), (1, "en", BASE)], SCHEMA)
    )  # doc 1 re-offered: already accepted -> must NOT repack
    rows = bld.packed().collect()
    by_doc_wave = {(r.doc_id, r.wave) for r in rows}
    # a doc with fractional rate < 1 may legitimately draw 0 copies
    # (doc 2's de rate is 0.6 here), so assert containment, not equality
    assert {d for d, _ in by_doc_wave} <= {1, 2, 3}
    assert (1, 1) in by_doc_wave and (3, 2) in by_doc_wave
    assert sum(1 for d, _ in by_doc_wave if d == 1) == 1  # one wave only
    # wave-2 seq ids start after wave-1's per shard
    for shard in {r.shard for r in rows}:
        w1 = [r.seq_id for r in rows if r.shard == shard and r.wave == 1]
        w2 = [r.seq_id for r in rows if r.shard == shard and r.wave == 2]
        if w1 and w2:
            assert min(w2) > max(w1)
    # capacity: sum of chunk tokens per (shard, seq_id) <= 32
    fill: dict = {}
    for r in rows:
        fill[(r.shard, r.seq_id)] = fill.get((r.shard, r.seq_id), 0) + r.n_chunk_tokens
    assert all(v <= 32 for v in fill.values()), fill


def test_takedown_filters_curated_and_whole_sequences(spark, tmp_path):
    """The curator/builder takedown lane (r14): delete() retracts a doc
    from curated() and drops every packed sequence CONTAINING its
    chunks at whole-sequence granularity (a sequence with a hole where
    removed content sat is not a valid training sequence), while
    sequences without the doc survive byte-identically; re-offering the
    deleted doc's identical text later stays deduped (claims persist —
    removed content must not re-enter)."""
    from pyspark.sql import functions as F

    bld = _builder(spark, tmp_path)
    bld.ingest(spark.createDataFrame([(1, "en", BASE), (2, "de", OTHER)], SCHEMA))
    bld.ingest(spark.createDataFrame([(3, "en", THIRD)], SCHEMA))
    before = bld.packed().collect()
    assert {r.doc_id for r in before} >= {1, 3}
    dead_seqs = {(r.shard, r.seq_id) for r in before if r.doc_id == 1}
    assert dead_seqs

    bld.delete(spark.createDataFrame([(1,)], "doc_id long"))
    assert bld.curated().filter(F.col("doc_id") == 1).count() == 0
    assert bld.curated().filter(F.col("doc_id") == 3).count() == 1
    after = bld.packed().collect()
    assert all(r.doc_id != 1 for r in after)
    # whole-sequence drop: nothing from the affected sequences survives
    assert all((r.shard, r.seq_id) not in dead_seqs for r in after)
    # untouched sequences are byte-identical
    keep = {tuple(r) for r in before if (r.shard, r.seq_id) not in dead_seqs}
    assert {tuple(r) for r in after} == keep
    # re-ingesting the deleted doc's identical text stays deduped
    out = bld.ingest(spark.createDataFrame([(7, "en", BASE)], SCHEMA))
    assert out.filter(F.col("doc_id") == 7).count() == 0
    bld.drop_state() if hasattr(bld, "drop_state") else None


def test_builder_mixture_rates_use_cumulative_counts(spark, tmp_path):
    """Rate-at-acceptance: a language's copy count in wave 2 reflects the
    wave-1 + wave-2 composition, not wave 2 alone. With weights en=0.9 /
    de=0.1 and de appearing only in wave 2 alongside many en docs, the
    de doc gets rate << 1 (usually 0 copies) under cumulative counts but
    would get ~0.2 under wave-local ones; assert via epoch counts that
    en docs dominate the packed output."""
    bld = _builder(spark, tmp_path, weights={"en": 0.9, "de": 0.1})
    en_docs = [(i, "en", f"{BASE} marker {i} unique") for i in range(1, 8)]
    bld.ingest(spark.createDataFrame(en_docs, SCHEMA))
    bld.ingest(spark.createDataFrame([(20, "de", OTHER)], SCHEMA))
    rows = bld.packed().collect()
    langs = {r.doc_id: ("de" if r.doc_id == 20 else "en") for r in rows}
    n_en = sum(1 for r in rows if langs[r.doc_id] == "en")
    n_de = sum(1 for r in rows if langs[r.doc_id] == "de")
    # 8 docs total, de share 1/8 > target 0.1 -> de rate < 1, en rate ~1
    assert n_en > 0
    assert n_de <= n_en  # de must not be upsampled above the en mass


def test_compaction_preserves_ingest_results(spark, tmp_path):
    """compact() rewrites each bucketed state table to one sorted file per
    bucket; it must be a pure physical reorganization — a run that
    compacts between (and after) waves curates the exact same corpus as
    one that never compacts."""
    plain = _curator(spark, tmp_path / "plain")
    comp = _curator(spark, tmp_path / "comp")
    w1 = [(1, "en", BASE), (2, "en", f"cookie banner accept all\n{OTHER}")]
    w2 = [
        (10, "en", BASE),  # exact dup across waves
        (11, "en", f"cookie banner accept all\n{THIRD}"),  # state-seen para
        (12, "en", BASE.replace("today", "tonight")),  # near-dup anchor
    ]
    for cur, do_compact in ((plain, False), (comp, True)):
        cur.ingest(spark.createDataFrame(w1, SCHEMA))
        if do_compact:
            cur.compact()
        cur.ingest(spark.createDataFrame(w2, SCHEMA))
        if do_compact:
            cur.compact()
    a = sorted(tuple(r) for r in plain.curated().collect())
    b = sorted(tuple(r) for r in comp.curated().collect())
    assert a == b and a  # identical, non-empty

    # post-compaction: at most ONE file per bucket per state table (the
    # many small per-wave appends are folded away)
    from clickhouse_segments_tutorial_spark.plans.incremental import (
        _STATE_BUCKET_KEYS,
    )

    for name in _STATE_BUCKET_KEYS:
        tbl = comp._table(name)
        if not spark.catalog.tableExists(tbl):
            continue
        files = spark.table(tbl).inputFiles()
        assert len(files) <= comp.state_buckets, (name, files)
    plain.drop_dedup_state()
    comp.drop_dedup_state()


def test_multiwave_replay_matches_generalized_oracle(spark):
    """N-wave drift check (round-9): four UNEVEN waves — one of them
    EMPTY — replayed over the real sf0.001 documents table, compared to
    the wave-count-generalized DuckDB recurrence. A two-wave replay
    cannot catch cross-wave drift in the persisted pack_seq offsets or
    the mix_counts cumulative rates; four waves with an empty no-op wave
    exercises both counters three advance steps deep."""
    from clickhouse_segments_tutorial_spark.plans.incremental import (
        IncrementalCorpusBuilder,
        _incremental_oracle,
        _packed_incremental_oracle,
        eval_grams_from_docs,
    )
    from clickhouse_segments_tutorial_spark.plans.llm import _MIX_WEIGHTS
    from clickhouse_segments_tutorial_spark.session import scratch_dir
    from clickhouse_segments_tutorial_spark.sources import load_table
    from oracle_check import compare

    waves = (
        "doc_id % 7 IN (0, 1, 2, 3)",  # big wave
        "doc_id % 7 = 4",              # small wave
        "doc_id < 0",                  # EMPTY wave: must be a no-op
        "doc_id % 7 IN (5, 6)",        # remainder
    )
    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    is_eval = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8) < "19999999"
    feed = docs.filter(~is_eval).select("doc_id", "lang", "text")
    bld = IncrementalCorpusBuilder(
        spark,
        scratch_dir("multiwave"),
        eval_grams_from_docs(docs.filter(is_eval)),
        mix_weights=_MIX_WEIGHTS,
    )
    accepted = [bld.ingest(feed.filter(F.expr(p))).count() for p in waves]
    assert accepted[2] == 0          # empty wave accepted nothing
    assert accepted[0] > accepted[1]  # genuinely uneven

    curated = bld.curated().select(
        "doc_id", "lang", F.md5("text").alias("text_fp"), "n_tokens"
    )
    ok, msg = compare(curated, _incremental_oracle(waves), sf)
    assert ok, f"curated: {msg}"
    ok, msg = compare(bld.packed(), _packed_incremental_oracle(waves), sf)
    assert ok, f"packed: {msg}"
    bld.drop_dedup_state()


def test_crash_replayed_wave_is_idempotent(spark, tmp_path):
    """r10 self-review finding 2 fix: wave-tagged dedup state. A wave
    re-ingested with the SAME wave id (the gate's crash-replay shape)
    must reproduce its original output — not drop its documents against
    its own prior appends — and later waves must be unaffected by the
    replay's duplicate state rows."""
    w1 = spark.createDataFrame(
        [(1, "en", BASE), (2, "en", f"cookie banner accept all\n{OTHER}")],
        SCHEMA,
    )
    w2 = spark.createDataFrame(
        [(10, "en", BASE), (11, "en", f"cookie banner accept all\n{THIRD}")],
        SCHEMA,
    )
    w3 = spark.createDataFrame(
        [(20, "en", THIRD), (21, "en", OTHER + " extra tail words here")],
        SCHEMA,
    )

    cur = _curator(spark, tmp_path / "a")
    cur.ingest(w1, wave_id=1)
    out2 = sorted(map(tuple, cur.ingest(w2, wave_id=2).collect()))
    assert [r[0] for r in out2] == [11]
    # crash replay: same wave id, same data
    replay2 = sorted(map(tuple, cur.ingest(w2, wave_id=2).collect()))
    assert replay2 == out2
    out3 = sorted(map(tuple, cur.ingest(w3, wave_id=3).collect()))

    # reference run with NO replay: wave 3 must match exactly
    ref = _curator(spark, tmp_path / "b")
    ref.ingest(w1, wave_id=1)
    ref.ingest(w2, wave_id=2)
    assert sorted(map(tuple, ref.ingest(w3, wave_id=3).collect())) == out3

    # curated() holds each wave exactly once despite the replay
    assert sorted(r.doc_id for r in cur.curated().collect()) == sorted(
        r.doc_id for r in ref.curated().collect()
    )


def test_reattach_resumes_default_wave_numbering(spark, tmp_path):
    """r10 second-review finding 2: a NEW curator object on an existing
    workdir (cross-process re-attach, default numbering) must resume
    from the persisted max wave — not restart at 1, which would exclude
    the whole history from every lookup and overwrite curated/w1."""
    w1 = spark.createDataFrame(
        [(1, "en", BASE), (2, "en", OTHER)],
        SCHEMA,
    )
    w2 = spark.createDataFrame(
        [(10, "en", BASE), (11, "en", THIRD)],  # 10 = exact dup of doc 1
        SCHEMA,
    )
    curA = _curator(spark, tmp_path)
    a1 = {r.doc_id for r in curA.ingest(w1).collect()}
    assert a1 == {1, 2}

    # re-attach: fresh object, same workdir, default numbering
    curB = _curator(spark, tmp_path)
    a2 = {r.doc_id for r in curB.ingest(w2).collect()}
    assert a2 == {11}  # doc 10 deduped against wave-1 HISTORY
    # wave 1's curated output intact alongside wave 2's
    assert sorted(r.doc_id for r in curB.curated().collect()) == [1, 2, 11]
