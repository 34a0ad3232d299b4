"""SpaceSaving / Misra-Gries approximate top-k — the ClickHouse
``topK(N)`` / ``topKWeighted`` aggregate analog (r16 verdict item 3; the
reference anchor is the count-threshold query shape of
/root/reference/src/1-naive.test.ts:74, whose "most active entities"
variant CH answers with topK): mergeable bounded-state per-group
summaries built in ONE pass over the data, no shuffle of the item
universe.

Relationship to operators/cms.py: ``cms_heavy_hitters`` answers
"every item above an absolute threshold" and needs the dyadic-walk
candidate pass; SpaceSaving is the one-pass sibling for "the k biggest
items per group" from bounded per-partition state.

Design (Spark-first):

- **Partials** (:func:`spacesaving_partials`): one ``mapInPandas`` pass.
  Each physical partition folds its Arrow batches into a per-group
  Misra-Gries summary of at most ``capacity`` items: exact
  ``value_counts`` per batch (C-speed, order-insensitive within the
  batch), dict-merge into the running summary, then the classic prune —
  subtract the (capacity+1)-th largest count from every item, drop the
  non-positives, and add that subtrahend to the summary's cumulative
  ``err``. Invariants (Misra-Gries / Agarwal et al., Mergeable
  Summaries, PODS'12 §3): for every item i and partition p,
  ``cnt_p(i) <= true_p(i) <= cnt_p(i) + err_p``, and an item ABSENT from
  the summary has ``true_p(i) <= err_p``. Output rows are
  ``(group..., item, cnt, err)`` plus ONE sentinel row per
  (partition, group) with a NULL item carrying that summary's ``err`` —
  at most ``capacity + 1`` rows per partition per group, bounded
  metadata regardless of data size.
- **Merge** (:func:`topk_spacesaving`): summaries merge by plain SUM —
  ``lower(i) = sum_p cnt_p(i)`` and ``total_err(g) = sum_p err_p`` (the
  sentinel rows), giving ``lower <= true <= lower + total_err`` for
  every item (present or absent). One hash agg over the bounded partial
  rows; the data itself is never re-read.
- **Exact top-k** (:func:`topk_exact_via_spacesaving`): the summary's
  items are a complete top-k candidate set whenever
  ``total_err < k-th largest lower`` (an item absent from every summary
  has true count <= total_err, so it cannot displace any of the k
  candidates whose exact counts are >= their lowers >= kth_lower). For
  groups passing that guard, ONE exact verify pass over candidate rows
  only (broadcast semi-join) yields the provably-exact top-k; groups
  failing it fall back to the exact per-group aggregation — the result
  is the EXACT top-k either way (deterministic tiebreak: count desc,
  item asc), which is what makes the operator value-oracle-able against
  plain SQL row_number() regardless of physical partitioning. The
  fallback is surfaced with a warning, the cms_heavy_hitters contract.

Scale shape at 100 TB: the partial pass is map-only (no shuffle of the
item universe — the whole point); the merge agg and the guard run over
O(n_partitions * n_groups * capacity) summary rows; the verify pass
broadcasts the bounded candidate list and aggregates only matching
rows. No driver-side state beyond the per-group guard counts.
"""

from __future__ import annotations

import warnings
from collections.abc import Iterator

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import StructType

_RESERVED = ("__ss_cnt", "__ss_err", "__ss_lower", "__ss_rk")


def _check_cols(df: DataFrame, group_cols: list[str], item_col: str) -> None:
    for c in (*group_cols, item_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in {df.columns}")
    for c in df.columns:
        if c in _RESERVED:
            raise ValueError(f"input carries reserved column {c!r}")
    if item_col in group_cols:
        raise ValueError("item_col cannot also be a group column")


def spacesaving_partials(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    *,
    capacity: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-partition per-group Misra-Gries summaries (see module doc).
    Returns ``group_cols + [item_col, "__ss_cnt", "__ss_err"]`` with at
    most ``capacity`` item rows plus one NULL-item sentinel (carrying
    the summary's cumulative err) per partition per group. NULL items
    never count (equality semantics, the cms.py rule).

    ``weight_col`` (non-negative integer weights — cast upstream) gives
    the topKWeighted analog: each row contributes ``weight`` units of
    mass to its item, so "count" everywhere below means total weight.
    Every Misra-Gries invariant holds verbatim under weighted
    increments (an increment of w is w unit increments of the same
    item); NULL weights contribute nothing (the SQL SUM rule)."""
    import pandas as pd

    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    cols = [*group_cols, item_col] + ([weight_col] if weight_col else [])
    _check_cols(df, [*group_cols] + ([weight_col] if weight_col else []), item_col)
    src = df.select(*cols).filter(F.col(item_col).isNotNull())
    from pyspark.sql.types import StructField

    fields = {f.name: f for f in src.schema.fields}
    # the sentinel rows carry a NULL item, so the item field must be
    # nullable in the output schema even when the source column is not
    item_f = fields[item_col]
    out_schema = StructType(
        [fields[c] for c in group_cols]
        + [StructField(item_f.name, item_f.dataType, nullable=True)]
    ).add("__ss_cnt", "long").add("__ss_err", "long")

    n_group = len(group_cols)

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # state: group key tuple -> (dict item -> cnt, err)
        state: dict[tuple, tuple[dict, int]] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            if weight_col is None:
                vc = pdf.groupby(group_cols, dropna=False, sort=False)[
                    item_col
                ].value_counts()
            else:
                vc = pdf.groupby(
                    [*group_cols, item_col], dropna=False, sort=False
                )[weight_col].sum()
            for key, c in vc.items():
                # key = (*group_values, item)
                g, item = key[:n_group], key[n_group]
                d, err = state.setdefault(g, ({}, 0))
                d[item] = d.get(item, 0) + int(c)
            # prune each over-full summary: subtract the (capacity+1)-th
            # largest count, drop non-positives, accrue err
            for g, (d, err) in list(state.items()):
                if len(d) > capacity:
                    t = sorted(d.values(), reverse=True)[capacity]
                    state[g] = (
                        {i: c - t for i, c in d.items() if c > t},
                        err + t,
                    )
        rows = []
        for g, (d, err) in state.items():
            for item, c in d.items():
                rows.append((*g, item, c, err))
            rows.append((*g, None, 0, err))  # sentinel: summary err
        out_cols = [*group_cols, item_col, "__ss_cnt", "__ss_err"]
        yield pd.DataFrame(rows, columns=out_cols)

    return src.mapInPandas(fold, schema=out_schema)


def topk_spacesaving(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    *,
    k: int,
    capacity: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Approximate per-group top-k from the merged summaries, ONE pass
    over the data: ``(group..., item, n_lo, n_hi, guaranteed)`` for the
    k items with the largest count lower bounds (tiebreak item asc).
    ``n_lo <= true count <= n_hi`` always; ``guaranteed`` is true when
    the item provably belongs to the true top-k (its lower bound beats
    the upper bound of every item outside the reported k — absent items
    included via total_err)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    parts = spacesaving_partials(
        df, group_cols, item_col, capacity=capacity, weight_col=weight_col
    )
    items = parts.filter(F.col(item_col).isNotNull())
    sent = parts.filter(F.col(item_col).isNull())
    total_err = sent.groupBy(*group_cols).agg(
        F.sum("__ss_err").alias("__ss_err")
    )
    merged = (
        items.groupBy(*group_cols, item_col)
        .agg(F.sum("__ss_cnt").alias("__ss_lower"))
        .join(total_err, group_cols)
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc("__ss_lower"), F.col(item_col)
    )
    ranked = merged.withColumn("__ss_rk", F.row_number().over(w))
    # the largest upper bound OUTSIDE the reported k: max over rank > k
    # of (lower + total_err), and total_err alone for absent items —
    # which is dominated by any retained row's upper, unless no row is
    # outside k at all
    outside = (
        ranked.filter(F.col("__ss_rk") > k)
        .groupBy(*group_cols)
        .agg(F.max(F.col("__ss_lower") + F.col("__ss_err")).alias("__out_hi"))
    )
    top = (
        ranked.filter(F.col("__ss_rk") <= k)
        .join(outside, group_cols, "left")
        .select(
            *group_cols,
            item_col,
            F.col("__ss_lower").alias("n_lo"),
            (F.col("__ss_lower") + F.col("__ss_err")).alias("n_hi"),
            (
                F.col("__ss_lower")
                > F.greatest(
                    F.coalesce(F.col("__out_hi"), F.lit(0)), F.col("__ss_err")
                )
            ).alias("guaranteed"),
            F.col("__ss_rk").alias("rk"),
        )
    )
    return top


def topk_exact_via_spacesaving(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    *,
    k: int,
    capacity: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """EXACT per-group top-k (count desc, item asc — the deterministic
    row_number tiebreak) through the SpaceSaving summary: candidate
    discovery from the bounded merged summaries, one exact verify pass
    over candidate rows for the groups whose guard holds, and the plain
    exact aggregation for groups where the sketch cannot promise
    candidate completeness (warned — the cms_heavy_hitters fallback
    contract). Output ``(group..., item, n, rk)`` is the exact top-k
    in every case; physical partitioning affects only WHICH plan ran.

    The data is read exactly twice (partials + verify/fallback); all
    intermediate state is bounded by partitions * groups * capacity."""
    if k < 1:
        raise ValueError("k must be >= 1")
    _check_cols(df, group_cols, item_col)
    spark = df.sparkSession
    # persisted: the bounded summary rows serve the guard count NOW and
    # the candidate/verify plan the CALLER executes later — without the
    # cache the returned plan would re-run the partial pass (a third
    # read of the data). Deliberately NOT unpersisted here: the returned
    # DataFrame still references it; Spark evicts LRU under pressure.
    parts = spacesaving_partials(
        df, group_cols, item_col, capacity=capacity, weight_col=weight_col
    ).persist()
    items = parts.filter(F.col(item_col).isNotNull())
    sent = parts.filter(F.col(item_col).isNull())
    total_err = sent.groupBy(*group_cols).agg(
        F.sum("__ss_err").alias("__ss_err")
    )
    merged = (
        items.groupBy(*group_cols, item_col)
        .agg(F.sum("__ss_cnt").alias("__ss_lower"))
        .join(total_err, group_cols)
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc("__ss_lower"), F.col(item_col)
    )
    kth_lower = (
        merged.withColumn("__ss_rk", F.row_number().over(w))
        .filter(F.col("__ss_rk") == k)
        .select(*group_cols, F.col("__ss_lower").alias("__kth_lower"))
    )
    # guard per group: candidates complete iff total_err < kth_lower
    # (a group with fewer than k summary items has no kth row —
    # complete by construction only if total_err == 0, else fall
    # back: unseen items could fill the missing ranks)
    guard = total_err.join(kth_lower, group_cols, "left")
    bad_groups = guard.filter(
        (F.col("__kth_lower").isNull() & (F.col("__ss_err") > 0))
        | (F.col("__ss_err") >= F.col("__kth_lower"))
    ).select(*group_cols)
    n_bad = bad_groups.count()  # bounded: one row per group
    if n_bad:
        warnings.warn(
            f"topk_exact_via_spacesaving: {n_bad} group(s) failed the "
            "candidate-completeness guard (total_err >= kth lower "
            "bound) — running the exact per-group aggregation for "
            "them; raise capacity to keep the one-verify-pass plan",
            stacklevel=2,
        )
    exact_src = df.select(
        *group_cols,
        item_col,
        (
            F.coalesce(F.col(weight_col).cast("long"), F.lit(0))
            if weight_col is not None
            else F.lit(1).cast("long")
        ).alias("__ss_w"),
    ).filter(F.col(item_col).isNotNull())
    cand = items.select(*group_cols, item_col).distinct()
    good_counts = (
        exact_src.join(F.broadcast(bad_groups), group_cols, "left_anti")
        .join(F.broadcast(cand), [*group_cols, item_col], "left_semi")
        .groupBy(*group_cols, item_col)
        .agg(F.sum("__ss_w").alias("n"))
    )
    counts = good_counts
    if n_bad:
        bad_counts = (
            exact_src.join(F.broadcast(bad_groups), group_cols, "left_semi")
            .groupBy(*group_cols, item_col)
            .agg(F.sum("__ss_w").alias("n"))
        )
        counts = good_counts.unionByName(bad_counts)
    wx = Window.partitionBy(*group_cols).orderBy(
        F.desc("n"), F.col(item_col)
    )
    return (
        counts.withColumn("rk", F.row_number().over(wx))
        .filter(F.col("rk") <= k)
    )
