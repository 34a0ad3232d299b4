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
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

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


# --- transformWithState twin -------------------------------------------------


def _make_distinct_processor(
    message_col: str, time_col: str, threshold: int, msg_type: str
) -> StatefulProcessor:
    """Spark 4 arbitrary-state processor holding each user's distinct id set
    (ListState — appended incrementally, never rewritten whole) and max
    event time (ValueState). Same semantics as exact_distinct_membership;
    the typed per-field state API is the difference: only NEW ids are
    appended per batch, so state-store write amplification is O(new ids),
    not O(all ids) as with applyInPandasWithState's single-blob state.

    Defined inside a factory ON PURPOSE: transformWithState deserializes
    the processor in a dedicated Python runner process that does not share
    the driver's sys.path, so a module-level class (pickled by reference)
    raises ModuleNotFoundError there. A locally-defined class is
    cloudpickled BY VALUE and needs only pandas on the worker."""
    import pandas as pd  # worker-side import, by value with the class

    class DistinctMembershipProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._ids = handle.getListState("ids", f"id {msg_type}")
            self._last = handle.getValueState("last_ts", "last_ts long")

        def handleInputRows(self, key, rows, timer_values):
            ids = {t[0] for t in self._ids.get()}
            stored = self._last.get()
            last_ts = stored[0] if stored is not None else None
            fresh: set = set()
            for pdf in rows:
                col = pdf[message_col].dropna()
                # long column with nulls arrives as float64 + NaN (same
                # normalization as exact_distinct_membership)
                if pd.api.types.is_float_dtype(col):
                    col = col.astype("int64")
                fresh.update(col.tolist())
                if len(pdf):
                    batch_max = pdf[time_col].max()
                    if pd.notna(batch_max):
                        secs = int(batch_max.value // 1_000_000_000)
                        last_ts = secs if last_ts is None else max(last_ts, secs)
            fresh -= ids
            if fresh:
                self._ids.appendList([(i,) for i in sorted(fresh)])
            n = len(ids) + len(fresh)
            if last_ts is not None:
                self._last.update((last_ts,))
            yield pd.DataFrame(
                [
                    {
                        "user_id": key[0],
                        "n_distinct": n,
                        "value": n >= threshold,
                        "last_event_time": (
                            pd.Timestamp(last_ts, unit="s")
                            if last_ts is not None
                            else pd.NaT
                        ),
                    }
                ]
            )

        def close(self) -> None:
            pass

    return DistinctMembershipProcessor()


class TransformWithStateSegmenter(ExactStreamingSegmenter):
    """Exact streaming segmenter on Spark 4's ``transformWithStateInPandas``
    (the successor to applyInPandasWithState): typed per-field state
    (ListState of ids + ValueState of max event time) in the RocksDB state
    store, append-only id growth per batch.

    The RocksDB provider is REQUIRED by transformWithState; it is set for
    the duration of the run and restored afterwards so co-resident streams
    keep whatever provider their checkpoints were created with."""

    _ROCKSDB = (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )

    def _stream(self) -> DataFrame:
        log = self.log
        filtered = self._filtered().withColumnRenamed(log.user, "user_id")
        user_t = filtered.schema["user_id"].dataType.simpleString()
        msg_t = filtered.schema[log.message].dataType.simpleString()
        out_schema = (
            f"user_id {user_t}, n_distinct long, value boolean, "
            "last_event_time timestamp"
        )
        return filtered.groupBy("user_id").transformWithStateInPandas(
            _make_distinct_processor(
                log.message, log.time, self.spec.threshold, msg_t
            ),
            out_schema,
            "Update",
            "None",
        )

    def run_available_now(self) -> None:
        # transformWithState's state-server protocol between the JVM and the
        # Python runner is protobuf-encoded; without the protobuf package
        # the runner dies at init with an opaque -2. Fail fast with the
        # actionable message instead (the applyInPandasWithState twin,
        # ExactStreamingSegmenter, has no such dependency).
        import importlib.util

        try:
            # raises (not returns None) when even the parent 'google'
            # namespace package is absent
            have_protobuf = importlib.util.find_spec("google.protobuf") is not None
        except ModuleNotFoundError:
            have_protobuf = False
        if not have_protobuf:
            raise RuntimeError(
                "transformWithStateInPandas requires the 'protobuf' package "
                "for its state-server protocol; it is not installed in this "
                "environment. Use ExactStreamingSegmenter "
                "(applyInPandasWithState) for the same exact-distinct "
                "semantics without the dependency."
            )
        conf_key = "spark.sql.streaming.stateStore.providerClass"
        before = self.spark.conf.get(conf_key, None)
        self.spark.conf.set(conf_key, self._ROCKSDB)
        try:
            super().run_available_now()
        finally:
            if before is None:
                self.spark.conf.unset(conf_key)
            else:
                self.spark.conf.set(conf_key, before)
