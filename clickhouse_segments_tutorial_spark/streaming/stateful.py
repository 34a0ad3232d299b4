"""Custom stateful streaming operator: exact cross-batch distinct counting.

The built-in streaming aggregation path (stream_segment.py) mirrors the
reference's ``uniq`` with ``approx_count_distinct`` — mergeable, bounded
state, approximate. This module is the *exact* twin of
uniqState/uniqMerge (/root/reference/src/3-microBatch.test.ts:122,140)
for when the dedup key space per user is small enough to hold exactly:
an ``applyInPandasWithState`` operator whose per-user state is the set of
seen message ids plus the max event time
(/root/reference/src/4-eventTime.test.ts:135's maxState).

Semantics
- At-least-once delivery: re-delivered message_ids land in the set once —
  exact idempotence across batches, which the HLL path only guarantees
  within sketch error (/root/reference/src/2-idempotent.test.ts:72-87).
- Update-mode output: a row per user per batch in which that user appeared
  (the changelog contract of the MV trigger,
  /root/reference/src/3-microBatch.test.ts:50-56).

Scale design
- State is O(distinct ids per user) — the exact-mode tradeoff. The state
  store shards by user across executors, same as any streaming groupBy;
  per-user sets are independent so there is no cross-partition state.
- For unbounded id spaces use the HLL path instead; this operator is for
  bounded-cardinality keys (e.g. "distinct campaign ids clicked",
  distinct-per-user capped by product semantics).
- Arrow-batched: each micro-batch group arrives as pandas chunks; the
  update is set-union per chunk, no per-row Python loop beyond the set op.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .stream_segment import StreamingSegmenter

def _schemas(grouped_events: DataFrame, message_col: str) -> tuple[str, str]:
    """Output/state schemas derived from the input types — user ids and
    message ids may be strings (reference schemas) or longs (corpus)."""
    user_t = grouped_events.schema["user_id"].dataType.simpleString()
    msg_t = grouped_events.schema[message_col].dataType.simpleString()
    out = (
        f"user_id {user_t}, n_distinct long, value boolean, "
        "last_event_time timestamp"
    )
    state = f"ids array<{msg_t}>, last_ts long"
    return out, state


def exact_distinct_membership(
    grouped_events: DataFrame,
    *,
    message_col: str,
    time_col: str,
    threshold: int,
) -> DataFrame:
    """Stateful exact distinct-count segmentation over a streaming DataFrame.

    ``grouped_events`` must be a *streaming* DataFrame already filtered to
    the segment's event, carrying the user id in column ``user_id``.
    Returns an update-mode stream of
    (user_id, n_distinct, value, last_event_time).
    """

    output_schema, state_schema = _schemas(grouped_events, message_col)

    def update(key, pdf_iter, state: GroupState):
        if state.exists:
            stored_ids, stored_ts = state.get
            ids = set(stored_ids)
            last_ts = stored_ts  # epoch seconds or None (no event time seen)
        else:
            ids, last_ts = set(), None
        for pdf in pdf_iter:
            col = pdf[message_col].dropna()
            # a long column containing nulls arrives as float64 + NaN;
            # dropna removes the NaN but leaves floats — normalize back so
            # 1.0 and 1 dedup to the same id and the array<bigint> state
            # never sees floats
            if pd.api.types.is_float_dtype(col):
                col = col.astype("int64")
            ids.update(col.tolist())
            if len(pdf):
                batch_max = pdf[time_col].max()
                if pd.notna(batch_max):
                    secs = int(batch_max.value // 1_000_000_000)
                    last_ts = secs if last_ts is None else max(last_ts, secs)
        state.update((sorted(ids), last_ts))
        yield pd.DataFrame(
            [
                {
                    "user_id": key[0],
                    "n_distinct": len(ids),
                    "value": len(ids) >= threshold,
                    "last_event_time": (
                        pd.Timestamp(last_ts, unit="s")
                        if last_ts is not None
                        else pd.NaT
                    ),
                }
            ]
        )

    return grouped_events.groupBy("user_id").applyInPandasWithState(
        update,
        output_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )


class ExactStreamingSegmenter(StreamingSegmenter):
    """StreamingSegmenter with exact (set-based) distinct state instead of
    the built-in approximate aggregation — same file source, checkpoint,
    foreachBatch sink, and latest-wins serving."""

    def _stream(self) -> DataFrame:
        log = self.log
        # _filtered() supplies source + filter + watermark + optional
        # dedup-at-ingest, so drop_duplicates composes with exact state too
        filtered = self._filtered().withColumnRenamed(log.user, "user_id")
        return exact_distinct_membership(
            filtered,
            message_col=log.message,
            time_col=log.time,
            threshold=self.spec.threshold,
        )

    def _sink_select(self, batch_df: DataFrame, batch_id: int) -> DataFrame:
        # the stateful operator already emits `value`
        return batch_df.select(
            "user_id",
            "value",
            "last_event_time",
            F.lit(batch_id).alias("version"),
        )
