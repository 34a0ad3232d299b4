"""Event funnel levels — the ClickHouse `windowFunnel` shape re-expressed
relationally (the reference's engine family popularized this operator for
exactly the segmentation workloads the reference demonstrates; the
reference repo itself stops at per-user distinct counts).

Two variants, same strict-increase event-order convention:

- :func:`funnel_levels` — *greedy earliest-chain*: t1 = the user's
  earliest step-1 event; t_i = the earliest step-i event STRICTLY after
  t_{i-1}; the funnel level is the deepest i whose t_i falls within
  `window` of t1 (level 1 needs no window check; level 0 = user never
  performed step 1). Deterministic, cheapest, and a LOWER BOUND of
  windowFunnel's maximal-chain answer: on corpora where step events
  repeat densely, a chain starting at a later step-1 event can reach
  deeper within its window than the chain anchored at the earliest one.
- :func:`funnel_levels_exact` — the maximal-chain search itself
  (ClickHouse ``windowFunnel(window, 'strict_increase')`` semantics),
  via dominant-start pruning + per-start greedy extension. Costs one
  extra chain key per dominant start; run the greedy variant as the
  screen at scale.

Scale: one user-keyed hash aggregation per step (min() partial-aggregates
map-side) and one user-keyed join per step — no per-user event arrays are
ever collected, unlike sort-by-user + UDF funnel implementations, so a
single hyperactive user cannot blow a task. Timestamp math stays at
microsecond resolution in both engines (registry determinism rules).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window, functions as F


def funnel_levels(
    events: DataFrame,
    steps: list[str],
    *,
    window: str = "7 days",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(user_id, funnel_level, first_step_ts) for every user with >=1 event.

    funnel_level in 0..len(steps); first_step_ts = unix seconds of t1
    (NULL when level 0).
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    ev = events.select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("_type"),
        F.col(ts_col).alias("_ts"),
    )
    levels = [
        ev.filter(F.col("_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("_ts").alias("t1"))
    ]
    for i, step in enumerate(steps[1:], start=2):
        prev = levels[-1].select("user_id", f"t{i - 1}")
        levels.append(
            ev.filter(F.col("_type") == step)
            .join(prev, "user_id")
            .filter(F.col("_ts") > F.col(f"t{i - 1}"))
            .groupBy("user_id")
            .agg(F.min("_ts").alias(f"t{i}"))
        )
    users = ev.select("user_id").distinct()
    joined = reduce(
        lambda acc, lv: acc.join(
            lv.select("user_id", lv.columns[-1]), "user_id", "left"
        ),
        levels,
        users,
    )
    deadline = F.col("t1") + F.expr(f"INTERVAL {window}")
    # build the when-chain deepest-first so the first true branch wins
    expr = None
    for i in range(len(steps), 1, -1):
        cond = F.col(f"t{i}").isNotNull() & (F.col(f"t{i}") <= deadline)
        expr = (expr.when(cond, F.lit(i)) if expr is not None
                else F.when(cond, F.lit(i)))
    expr = expr.when(F.col("t1").isNotNull(), F.lit(1)).otherwise(F.lit(0))
    return joined.select(
        "user_id",
        expr.cast("int").alias("funnel_level"),
        F.unix_timestamp("t1").alias("first_step_ts"),
    )


def funnel_levels_exact(
    events: DataFrame,
    steps: list[str],
    *,
    window: str = "7 days",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(user_id, funnel_level) with EXACT ClickHouse ``windowFunnel(window,
    'strict_increase')`` maximal-chain semantics: the level is the deepest
    L for which ANY chain e1 < e2 < ... < eL of step-typed events exists
    with t_L <= t_1 + window — not just the chain greedily grown from the
    user's earliest step-1 event (:func:`funnel_levels`, which is a
    documented lower bound of this).

    Algorithm — maximal level without per-user arrays or a sequential
    scan, in two relational moves:

    1. **Start pruning.** For any valid chain, replacing its start with
       the LATEST step-1 event still strictly before its second event
       keeps the chain valid (strict increase holds, and a later start
       only relaxes the deadline). So only "dominant" starts matter: for
       each step-2 event, the latest step-1 event strictly before it.
       One window function over the step-1/step-2 event stream computes
       them — candidate count is bounded by the user's step-2 event
       count, with no join fan-out.
    2. **Greedy per start.** For a FIXED start t1, taking the earliest
       valid next event at every step is optimal (exchange argument), so
       each candidate chain extends with the same min-agg/join shape as
       the greedy operator, keyed by (user_id, t1) instead of user_id.
       A user's level is the max depth any candidate reaches.

    Scale: step-1/step-2 stream window (per-user, microsecond
    rangeBetween for strictness under ties), then per step one
    (user, t1)-keyed hash agg and one join — candidate keys multiply the
    greedy cost by (dominant starts per user), the price of exactness.
    At 100 TB run :func:`funnel_levels` as the cheap screen and this only
    where the greedy level is below len(steps) (greedy == max is already
    provably exact).
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    ev = events.select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("_type"),
        F.col(ts_col).alias("_ts"),
    )
    # 1. dominant starts: latest step-1 strictly before each step-2 event.
    # rangeBetween over microseconds gives STRICTLY-earlier rows even when
    # a step-1 and step-2 event share a timestamp (rowsBetween would not).
    s12 = ev.filter(F.col("_type").isin(steps[0], steps[1])).withColumn(
        "_us", F.unix_micros("_ts")
    )
    w12 = (
        Window.partitionBy("user_id")
        .orderBy("_us")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    prev1 = F.max(F.when(F.col("_type") == steps[0], F.col("_us"))).over(w12)
    starts = (
        s12.withColumn("_t1us", prev1)
        .filter((F.col("_type") == steps[1]) & F.col("_t1us").isNotNull())
        .select("user_id", "_t1us")
        .distinct()
        .select("user_id", F.timestamp_micros("_t1us").alias("t1"))
    )
    deadline = F.col("t1") + F.expr(f"INTERVAL {window}")
    # 2. extend every candidate chain greedily, keyed by (user_id, t1)
    reached = []
    prev = starts.withColumn("_tp", F.col("t1"))
    for i, step in enumerate(steps[1:], start=2):
        prev = (
            ev.filter(F.col("_type") == step)
            .join(prev.select("user_id", "t1", "_tp"), "user_id")
            .filter((F.col("_ts") > F.col("_tp")) & (F.col("_ts") <= deadline))
            .groupBy("user_id", "t1")
            .agg(F.min("_ts").alias("_tn"))
            .withColumnRenamed("_tn", "_tp")
        )
        reached.append(
            prev.select("user_id").distinct().withColumn("_lvl", F.lit(i))
        )
    level1 = (
        ev.filter(F.col("_type") == steps[0])
        .select("user_id")
        .distinct()
        .withColumn("_lvl", F.lit(1))
    )
    level0 = ev.select("user_id").distinct().withColumn("_lvl", F.lit(0))
    all_levels = level0.union(level1)
    for r in reached:
        all_levels = all_levels.union(r)
    return all_levels.groupBy("user_id").agg(
        F.max("_lvl").cast("int").alias("funnel_level")
    )


def sequence_count(
    events: DataFrame,
    first: str,
    second: str,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """The ClickHouse ``sequenceCount('(?1)(?t>=0)(?2)')`` shape: per
    user, the number of DISJOINT first->second chains (each first event
    matches at most one strictly-later second event and vice versa —
    the greedy/maximum matching, which coincide by the exchange
    argument). One row per user with >= 1 of the two event types:
    (user_id, n_chains int).

    NOT a per-user array fold: the maximum number of disjoint pairs
    has a min-cut closed form —

        n_chains = min over event-prefix boundaries p of
                   [ cumFirst(p) + totalSecond - cumSecond(p) ]

    (every un-matchable second is either short of firsts before it or
    beyond the firsts' reach; the binomial prefix expression is the
    bottleneck cut of the bipartite earlier-first -> later-second
    matching; verified against the greedy scan on interleavings). That
    is two running sums over one per-user window sort — the same
    hyperactive-user-safe shape as the funnel operators (a window sort
    spills; a collected per-user array OOMs a task). Event order is
    the total order (ts, id) shared with the oracle, so ties are
    deterministic cross-engine."""
    ev = events.filter(F.col(type_col).isin(first, second)).select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("_type"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
    )
    w = Window.partitionBy("user_id").orderBy("_ts", "_id")
    wall = Window.partitionBy("user_id")
    isa = F.when(F.col("_type") == first, 1).otherwise(0)
    isb = F.when(F.col("_type") == second, 1).otherwise(0)
    v = (
        F.sum(isa).over(w)
        + F.sum(isb).over(wall)
        - F.sum(isb).over(w)
    )
    return (
        ev.select(
            "user_id",
            v.alias("_v"),
            F.sum(isb).over(wall).alias("_btot"),
        )
        .groupBy("user_id")
        # the empty prefix's cut is totalSecond itself (first() is safe:
        # _btot is per-user constant)
        .agg(
            F.least(F.min("_v"), F.first("_btot")).cast("int").alias(
                "n_chains"
            )
        )
    )
