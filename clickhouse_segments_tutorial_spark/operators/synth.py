"""Deterministic synthetic inputs shared by tests and measurement
scripts (scripts/measure_tokenizer_scale.py and
tests/test_tokenizer_scale.py previously coupled the runtime script to
the tests package for this one helper — r12 ADVICE).

Everything here is pure Spark expressions over ``spark.range`` — no
driver-side data, partitioning-invariant (Murmur3 over bound values),
so the same call produces the same frame on any cluster layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def synth_dictionary(spark: SparkSession, n: int, max_len: int = 32) -> DataFrame:
    """Deterministic (word, freq) dictionary: word i is base-26 letters
    of hash(i, position), length (i % max_len) + 1, freq Zipf-ish from
    hash(i). Distinct-word count lands a few percent under ``n`` (short
    words collide and merge their freqs)."""
    return (
        spark.range(n)
        .select(
            F.concat_ws(
                "",
                F.transform(
                    F.sequence(F.lit(1), (F.col("id") % max_len + 1).cast("int")),
                    lambda j: F.char(
                        F.lit(97) + F.pmod(F.hash(F.col("id"), j), F.lit(26))
                    ),
                ),
            ).alias("word"),
            (F.pmod(F.hash("id"), F.lit(1000)) + 1).cast("long").alias("freq"),
        )
        .groupBy("word")
        .agg(F.sum("freq").alias("freq"))
        .localCheckpoint(eager=True)
    )
