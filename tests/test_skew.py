"""Skew-mitigation operators (operators/skew.py): the salted plans must be
row-for-row identical to their plain counterparts — salting is a shuffle
LAYOUT change, never a semantic one. Skew is synthesized here (one key
holding ~90% of rows); the registered scale.py queries prove the same
equivalence end-to-end on the corpus under the driver's hash-compare.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickhouse_segments_tutorial_spark.operators.skew import (
    replicate_skew_join,
    salted_count_distinct,
    sampled_hot_keys,
)


def _skewed_big(spark, n=2000, hot_share=0.9):
    """n rows; key 1 holds hot_share of them, the rest spread over keys 2..101."""
    n_hot = int(n * hot_share)
    return spark.range(n).select(
        F.when(F.col("id") < n_hot, F.lit(1))
        .otherwise(F.pmod(F.col("id"), F.lit(100)) + 2)
        .cast("long")
        .alias("k"),
        F.col("id").alias("row_id"),
        (F.col("id") % 7).cast("double").alias("v"),
    )


def _small_dim(spark):
    # keys 1..80 have attributes; 81..101 deliberately unmatched in `small`,
    # and key 999 exists only in `small` (never joins).
    rows = [(k, f"attr_{k}") for k in range(1, 81)] + [(999, "attr_999")]
    return spark.createDataFrame(rows, "k long, attr string")


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_sampled_hot_keys_finds_hot_key(spark):
    big = _skewed_big(spark)
    hot = sampled_hot_keys(big, "k", sample_fraction=1.0, min_share=0.25)
    assert hot == [1]


def test_sampled_hot_keys_empty_on_uniform(spark):
    uniform = spark.range(1000).select(F.pmod(F.col("id"), F.lit(100)).alias("k"))
    assert sampled_hot_keys(uniform, "k", sample_fraction=1.0, min_share=0.25) == []


def test_sampled_hot_keys_rejects_bad_fraction(spark):
    big = _skewed_big(spark, n=10)
    with pytest.raises(ValueError, match="sample_fraction"):
        sampled_hot_keys(big, "k", sample_fraction=0.0)


def test_replicate_skew_join_inner_equals_plain(spark):
    big, small = _skewed_big(spark), _small_dim(spark)
    plain = big.join(small, "k", "inner")
    salted = replicate_skew_join(
        big, small, "k", n_salts=4, hot_keys=[1], salt_source="row_id"
    )
    assert sorted(salted.columns) == sorted(plain.columns)
    assert _sorted_rows(salted.select(*plain.columns)) == _sorted_rows(plain)


def test_replicate_skew_join_left_unmatched_exactly_once(spark):
    big, small = _skewed_big(spark), _small_dim(spark)
    plain = big.join(small, "k", "left")
    salted = replicate_skew_join(
        big, small, "k", how="left", n_salts=4, hot_keys=[1], salt_source="row_id"
    )
    assert _sorted_rows(salted.select(*plain.columns)) == _sorted_rows(plain)
    # keys 81..101 are unmatched: each big row must surface once, attr NULL
    unmatched = salted.filter(F.col("k") > 80)
    assert unmatched.count() == big.filter(F.col("k") > 80).count()
    assert unmatched.filter(F.col("attr").isNotNull()).count() == 0


def test_replicate_skew_join_hot_key_when_small_lacks_it(spark):
    """A hot key missing from `small` must not survive an inner join and
    must surface NULL-extended (once per big row) in a left join."""
    big, small = _skewed_big(spark), _small_dim(spark).filter(F.col("k") != 1)
    inner = replicate_skew_join(
        big, small, "k", n_salts=4, hot_keys=[1], salt_source="row_id"
    )
    assert inner.filter(F.col("k") == 1).count() == 0
    left = replicate_skew_join(
        big, small, "k", how="left", n_salts=4, hot_keys=[1], salt_source="row_id"
    )
    assert left.filter(F.col("k") == 1).count() == big.filter(F.col("k") == 1).count()


def test_replicate_skew_join_spreads_hot_key(spark):
    """The whole point: the hot key's big-side rows land in >1 salt."""
    big = _skewed_big(spark)
    from clickhouse_segments_tutorial_spark.operators.skew import _salt_expr

    salts = (
        big.withColumn("_salt", _salt_expr(F.col("k"), [1], 4, F.col("row_id")))
        .filter(F.col("k") == 1)
        .select("_salt")
        .distinct()
        .count()
    )
    assert salts == 4
    # cold keys pay nothing: always salt 0
    cold = (
        big.withColumn("_salt", _salt_expr(F.col("k"), [1], 4, F.col("row_id")))
        .filter(F.col("k") != 1)
        .select("_salt")
        .distinct()
        .collect()
    )
    assert [r["_salt"] for r in cold] == [0]


def test_replicate_skew_join_auto_hot_detection(spark):
    """hot_keys=None detects the hot key itself and still matches plain."""
    big, small = _skewed_big(spark), _small_dim(spark)
    plain = big.join(small, "k", "inner")
    salted = replicate_skew_join(big, small, "k", n_salts=4, salt_source="row_id")
    assert _sorted_rows(salted.select(*plain.columns)) == _sorted_rows(plain)


def test_replicate_skew_join_noop_without_hot_keys(spark):
    big, small = _skewed_big(spark), _small_dim(spark)
    out = replicate_skew_join(big, small, "k", hot_keys=[], salt_source="row_id")
    # plain join returned untouched: no salt machinery in the plan
    assert "_salt" not in out._jdf.queryExecution().analyzed().toString()
    assert _sorted_rows(out) == _sorted_rows(big.join(small, "k", "inner"))


def test_replicate_skew_join_default_salt_source(spark):
    """Default source (all non-key columns) still spreads and still matches."""
    big, small = _skewed_big(spark), _small_dim(spark)
    plain = big.join(small, "k", "inner")
    salted = replicate_skew_join(big, small, "k", n_salts=4, hot_keys=[1])
    assert _sorted_rows(salted.select(*plain.columns)) == _sorted_rows(plain)


def test_replicate_skew_join_rejects_right_full_and_bad_salts(spark):
    big, small = _skewed_big(spark, n=10), _small_dim(spark)
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="inner.*left"):
            replicate_skew_join(big, small, "k", how=how, hot_keys=[1])
    with pytest.raises(ValueError, match="n_salts"):
        replicate_skew_join(big, small, "k", n_salts=1, hot_keys=[1])


def test_salted_count_distinct_matches_exact(spark):
    df = spark.range(5000).select(
        F.pmod(F.col("id"), F.lit(3)).alias("g"),
        # hot group 0 gets many distinct values, others few; plus repeats
        F.when(F.pmod(F.col("id"), F.lit(3)) == 0, F.col("id") % 997)
        .otherwise(F.col("id") % 11)
        .cast("string")
        .alias("v"),
    )
    salted = salted_count_distinct(df, "g", "v", n_salts=16, alias="n")
    exact = df.groupBy("g").agg(F.count_distinct("v").alias("n"))
    assert _sorted_rows(salted) == _sorted_rows(exact)


def test_salted_count_distinct_ignores_nulls(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("a", None), ("a", "x"), ("b", None)], "g string, v string"
    )
    rows = {r["g"]: r["n"] for r in salted_count_distinct(df, "g", "v", alias="n").collect()}
    # count(DISTINCT) semantics: NULL never counted; all-NULL group -> no row
    # after the notNull filter (matches SQL GROUP BY over filtered rows)
    assert rows == {"a": 1}


def test_salted_count_distinct_multi_group_cols(spark):
    df = spark.range(1000).select(
        (F.col("id") % 2).alias("g1"),
        (F.col("id") % 5).alias("g2"),
        (F.col("id") % 37).cast("string").alias("v"),
    )
    salted = salted_count_distinct(df, ["g1", "g2"], "v", n_salts=8, alias="n")
    exact = df.groupBy("g1", "g2").agg(F.count_distinct("v").alias("n"))
    assert _sorted_rows(salted) == _sorted_rows(exact)


def test_salted_count_distinct_rejects_bad_salts(spark):
    df = spark.createDataFrame([("a", "x")], "g string, v string")
    with pytest.raises(ValueError, match="n_salts"):
        salted_count_distinct(df, "g", "v", n_salts=0)
