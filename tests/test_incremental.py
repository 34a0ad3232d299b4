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
