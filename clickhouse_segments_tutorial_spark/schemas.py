"""Explicit schemas for every table the engine touches.

The reference declares every table schema in DDL
(/root/reference/src/1-naive.test.ts:13-28 and siblings); we mirror the
discipline at the boundaries: ingest (JSON parse, createDataFrame) and the
corpus catalog always use these declared StructTypes. Reads of tables the
engine itself wrote (state/assignments parquet) use the parquet footer,
which IS the declared schema as written — the state-table constants below
document the DDL parity for those paths.

Two schema families:

1. Reference-parity segmentation tables (SURVEY.md §1.2): user event logs,
   versioned segment assignments, mergeable partial-aggregate state,
   changelog. ClickHouse types map per SURVEY §1.2 (String->StringType,
   DateTime->TimestampType, AggregateFunction(uniq,String)->BinaryType HLL
   sketch, Boolean->BooleanType).

2. The driver-provided parquet corpus (TESTDATA.md): TPC-H-ish star schema
   plus events/documents/embeddings. Declared here so readers can assert the
   footer matches expectations.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- 1. Segmentation tables (reference parity) -----------------------------

# user_events_naive: /root/reference/src/1-naive.test.ts:13-19
USER_EVENTS_NAIVE = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("event_name", T.StringType(), False),
        T.StructField("timestamp", T.TimestampType(), False),
    ]
)

# user_events_idempotent adds message_id: /root/reference/src/2-idempotent.test.ts:13-20
USER_EVENTS_IDEMPOTENT = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("event_name", T.StringType(), False),
        T.StructField("message_id", T.StringType(), False),
        T.StructField("timestamp", T.TimestampType(), False),
    ]
)

# user_events_micro_batch: /root/reference/src/3-microBatch.test.ts:14-21
USER_EVENTS_MICRO_BATCH = USER_EVENTS_IDEMPOTENT

# user_events_event_time splits event_time/processing_time:
# /root/reference/src/4-eventTime.test.ts:14-22
USER_EVENTS_EVENT_TIME = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("event_name", T.StringType(), False),
        T.StructField("message_id", T.StringType(), False),
        T.StructField("event_time", T.TimestampType(), False),
        T.StructField("processing_time", T.TimestampType(), False),
    ]
)

# segment_assignments_*: ReplacingMergeTree ORDER BY (user_id)
# /root/reference/src/1-naive.test.ts:21-28 — append-only here; latest-wins
# is resolved at read time (operators/latest_wins.py).
SEGMENT_ASSIGNMENTS = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("value", T.BooleanType(), False),
        T.StructField("assigned_at", T.TimestampType(), False),
    ]
)

# user_states_micro_batch: AggregatingMergeTree with
# event_count AggregateFunction(uniq, String) -> HLL sketch bytes
# /root/reference/src/3-microBatch.test.ts:23-29
USER_STATES = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("event_count", T.BinaryType(), False),
        T.StructField("computed_at", T.TimestampType(), False),
    ]
)

# + last_event_time AggregateFunction(max, DateTime) (max state = plain value)
# /root/reference/src/4-eventTime.test.ts:24-31
USER_STATES_EVENT_TIME = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("event_count", T.BinaryType(), False),
        T.StructField("last_event_time", T.TimestampType(), False),
        T.StructField("computed_at", T.TimestampType(), False),
    ]
)

# updated_user_states_* changelog fed by the MV trigger:
# /root/reference/src/3-microBatch.test.ts:31-38
UPDATED_USER_STATES = T.StructType(
    [
        T.StructField("user_id", T.StringType(), False),
        T.StructField("computed_at", T.TimestampType(), False),
    ]
)

# --- 2. Driver-provided corpus (TESTDATA.md / FIXTURES.md §2) ---------------

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType(), True),
        T.StructField("l_partkey", T.LongType(), True),
        T.StructField("l_suppkey", T.LongType(), True),
        T.StructField("l_linenumber", T.IntegerType(), True),
        T.StructField("l_quantity", T.DoubleType(), True),
        T.StructField("l_extendedprice", T.DoubleType(), True),
        T.StructField("l_discount", T.DoubleType(), True),
        T.StructField("l_tax", T.DoubleType(), True),
        T.StructField("l_returnflag", T.StringType(), True),
        T.StructField("l_linestatus", T.StringType(), True),
        T.StructField("l_shipdate", T.TimestampType(), True),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), True),
        T.StructField("o_custkey", T.LongType(), True),
        T.StructField("o_orderstatus", T.StringType(), True),
        T.StructField("o_totalprice", T.DoubleType(), True),
        T.StructField("o_orderdate", T.TimestampType(), True),
        T.StructField("o_orderpriority", T.StringType(), True),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType(), True),
        T.StructField("c_name", T.StringType(), True),
        T.StructField("c_nationkey", T.IntegerType(), True),
        T.StructField("c_acctbal", T.DoubleType(), True),
        T.StructField("c_mktsegment", T.StringType(), True),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType(), True),
        T.StructField("p_name", T.StringType(), True),
        T.StructField("p_brand", T.StringType(), True),
        T.StructField("p_type", T.StringType(), True),
        T.StructField("p_size", T.IntegerType(), True),
        T.StructField("p_retailprice", T.DoubleType(), True),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType(), True),
        T.StructField("s_name", T.StringType(), True),
        T.StructField("s_nationkey", T.IntegerType(), True),
        T.StructField("s_acctbal", T.DoubleType(), True),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType(), True),
        T.StructField("n_name", T.StringType(), True),
        T.StructField("n_regionkey", T.IntegerType(), True),
    ]
)

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType(), True),
        T.StructField("r_name", T.StringType(), True),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

CORPUS_TABLES = {
    "events": EVENTS,
    "lineitem": LINEITEM,
    "orders": ORDERS,
    "customer": CUSTOMER,
    "part": PART,
    "supplier": SUPPLIER,
    "nation": NATION,
    "region": REGION,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}
