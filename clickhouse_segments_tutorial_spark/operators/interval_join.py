"""Keyed point-in-interval (range) join — the temporal-join sibling of
operators/asof_join.py, without the range-predicate blowup.

Expressing ``p.key = i.key AND p.ts BETWEEN i.start AND i.end`` directly
gives Spark an equi-join on the key with the range as a residual — fine
until one key holds many intervals (every point under that key meets
every interval row before the filter), and catastrophic with no usable
equi key at all (BroadcastNestedLoopJoin). The scalable shape coarsens
time into buckets: each interval explodes into the buckets it spans
(linear in interval length — bounded when intervals are bounded, the
Flink interval-join contract), each point lands in exactly ONE bucket,
and the join becomes a plain (key, bucket) equi-join with the exact
range check as a post-filter. A point's single bucket means each
qualifying (point, interval) pair is emitted exactly once — no
post-dedup pass.

100-TB shape: one shuffle on (key, bucket) for each side; bucket
granularity trades explode factor against join selectivity (pick the
bucket near the typical interval length so intervals explode to O(1)
rows and a bucket only co-locates temporally-plausible pairs). Skewed
hot keys fall to the same salting mitigation as any equi-join
(operators/skew.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


_BKT = "__interval_join_bkt"


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    keys: list[str],
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_seconds: int = 86400,
    how: str = "inner",
    max_span_buckets: int = 1000,
) -> DataFrame:
    """Join each point row to every interval row of the same key whose
    [start_ts, end_ts] (both inclusive) contains point_ts. Column names
    other than ``keys`` must be disjoint between the two frames (the
    result carries both sides' columns). ``how``:

    - ``'inner'`` — one output row per qualifying (point, interval);
    - ``'left_semi'`` — points that fall in at least one window;
    - ``'left_anti'`` — points that fall in NO window of their key
      (correct under the bucket scheme because each point occupies
      exactly one bucket — the anti-join sees every interval that
      could contain it);
    - ``'left'`` — inner rows PLUS every unmatched point with the
      interval side's columns null (a point has exactly ONE bucket, so
      an unmatched point emits exactly one null-extended row — the
      retention-report shape where users outside any window must stay
      visible).

    ``max_span_buckets`` bounds the per-interval explode (r14 verdict
    item 4): the bucket fan-out is linear in interval length, so ONE
    malformed open-ended interval (end_ts in 2200, a sentinel
    9999-12-31, a sign-flipped epoch) would silently explode to
    millions of rows and dominate the whole shuffle. Any interval
    spanning more buckets than the cap fails the job LOUDLY at
    execution time (java.lang.RuntimeException wrapping the span
    message) — size the cap to max expected interval length /
    bucket_seconds, or raise bucket_seconds so real intervals stay
    O(1) buckets, which is the performance contract anyway (module
    docstring). Intervals with end < start have an empty bucket
    sequence and drop out (matching the BETWEEN semantics: no point
    can satisfy them). Intervals with a NULL start_ts or end_ts also
    drop out silently — BETWEEN against a NULL bound is never true, so
    no point could match them; the span cap deliberately does NOT fire
    on them (a NULL bound is an absent value, not an over-long span,
    and assert_true over a NULL condition would otherwise kill the job
    with a NULL message)."""
    if how not in ("inner", "left_semi", "left_anti", "left"):
        raise ValueError(
            f"how={how!r}: supported modes are 'inner', 'left_semi', "
            "'left_anti', 'left' (an unchecked pass-through previously "
            "let 'left' run with inner-shaped drop semantics and other "
            "modes fail at analysis depth)"
        )
    if max_span_buckets < 1:
        raise ValueError("max_span_buckets must be >= 1")
    for frame, side in ((points, "points"), (intervals, "intervals")):
        if _BKT in frame.columns:
            raise ValueError(
                f"{side} already carries the reserved helper column "
                f"{_BKT!r}"
            )
    p = points.withColumn(
        _BKT,
        F.floor(F.unix_timestamp(F.col(point_ts)) / bucket_seconds).cast(
            "long"
        ),
    ).alias("p")
    sb = F.floor(F.unix_timestamp(F.col(start_ts)) / bucket_seconds).cast(
        "long"
    )
    eb = F.floor(F.unix_timestamp(F.col(end_ts)) / bucket_seconds).cast(
        "long"
    )
    # assert_true evaluates per interval row BEFORE the explode: the
    # runtime error carries the offending span instead of an OOM'd task.
    # NULL-bounded intervals are exempted (isNull disjuncts): they match
    # no point under BETWEEN semantics and are dropped by the explode
    # below, and a NULL condition would otherwise make assert_true throw
    # with a NULL-concat message
    span_ok = F.assert_true(
        sb.isNull() | eb.isNull() | ((eb - sb) < F.lit(max_span_buckets)),
        F.concat(
            F.lit("interval_join: interval spans "),
            (eb - sb + 1).cast("string"),
            F.lit(
                f" buckets of {bucket_seconds}s, over the "
                f"max_span_buckets={max_span_buckets} cap — malformed "
                "open-ended interval, or raise bucket_seconds/the cap"
            ),
        ),
    )
    i = intervals.withColumn(
        _BKT,
        # eb < sb guard: bare sequence(sb, eb) would auto-step BACKWARDS
        # (Spark picks step -1 when start > stop), fabricating buckets
        # for an inverted interval; the when() makes it null and the
        # explode drops the row instead
        F.explode(
            F.when(span_ok.isNull() & (eb >= sb), F.sequence(sb, eb))
        ),
    ).alias("i")
    cond = F.col(f"p.{_BKT}") == F.col(f"i.{_BKT}")
    for k in keys:
        cond = cond & (F.col(f"p.{k}") == F.col(f"i.{k}"))
    cond = (
        cond
        & (F.col(f"p.{point_ts}") >= F.col(f"i.{start_ts}"))
        & (F.col(f"p.{point_ts}") <= F.col(f"i.{end_ts}"))
    )
    if how in ("left_semi", "left_anti"):
        return p.join(i, cond, how).drop(_BKT)
    joined = p.join(i, cond, how)
    keep = [F.col(f"p.{c}") for c in points.columns] + [
        F.col(f"i.{c}") for c in intervals.columns if c not in keys
    ]
    return joined.select(*keep)
