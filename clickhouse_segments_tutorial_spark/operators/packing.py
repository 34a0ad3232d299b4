"""Sequence packing: fill fixed-size context windows with document chunks.

The step between chunking and training: given chunk rows (each at most the
model context length), assign them greedily to "sequences" (bins) of
``capacity`` tokens so batches are dense. Greedy sequential packing is
inherently stateful — bin fill depends on every previous row — so it is
NOT expressible as window functions (a running cumsum would let bins
overflow); this is a textbook justified use of ``applyInPandas``.

Distribution model: rows are sharded by a deterministic key, each shard
packs independently in a stable sort order, and sequence ids are
(shard, seq_id) pairs. Sharding costs a little density (each shard's last
bin is partially full) but buys full parallelism — the per-shard greedy
loop never sees another shard's state.

Memory model (the 100 TB constraint): ``applyInPandas`` materializes each
shard's ENTIRE group as one pandas DataFrame on one executor, so the shard
count must GROW with the corpus. When ``shards`` is not given it is derived
from the corpus token volume (one cheap aggregate) as
``ceil(total_tokens / tokens_per_shard)`` — per-shard memory stays bounded
by ``tokens_per_shard`` regardless of corpus size. A fixed shard count is
still accepted for oracle-replayable queries, but callers own the memory
bound then.

Everything is deterministic (hash/mod sharding + total sort order), so the
exact packing is reproducible in SQL with a recursive CTE — the DuckDB
oracle in plans/llm.py replays the same greedy recurrence.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

# ~8M tokens/shard: a chunk row is ~100 bytes of metadata; at 128-token
# chunks that is ~62k rows / a few MB per pandas group — far under executor
# memory even with many concurrent tasks.
DEFAULT_TOKENS_PER_SHARD = 8_000_000

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def pack_chunks(
    df: DataFrame,
    *,
    capacity: int,
    tokens_col: str = "n_chunk_tokens",
    key_col: str = "doc_id",
    order_cols: tuple[str, ...] = ("doc_id", "chunk_idx"),
    shards: int | None = None,
    tokens_per_shard: int = DEFAULT_TOKENS_PER_SHARD,
) -> DataFrame:
    """Assign every row a (shard, seq_id): greedy first-open-bin packing in
    ``order_cols`` order within each shard. A row larger than ``capacity``
    gets a bin of its own (never split). Input columns pass through.

    ``shards=None`` (default) derives the shard count from the corpus:
    ``ceil(sum(tokens_col) / tokens_per_shard)`` — the per-shard pandas
    group stays bounded as the corpus grows (see module docstring).

    Sharding key: an integral ``key_col`` shards as ``key % shards`` (the
    SQL-replayable form the packed_chunks oracle uses); any other type is
    hashed first (``pmod(xxhash64(key), shards)``) — a non-numeric key
    must never silently cast to NULL and collapse every row into one
    shard (round-2 ADVICE)."""
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    if shards is None:
        if tokens_per_shard < 1:
            raise ValueError("tokens_per_shard must be >= 1")
        total = df.agg(F.sum(F.col(tokens_col)).alias("t")).collect()[0].t or 0
        shards = max(1, math.ceil(total / tokens_per_shard))
    elif shards < 1:
        raise ValueError("shards must be >= 1")
    key_type = df.schema[key_col].dataType
    if isinstance(key_type, _INTEGRAL):
        shard_expr = F.pmod(F.col(key_col), F.lit(shards))
    else:
        shard_expr = F.pmod(F.xxhash64(F.col(key_col)), F.lit(shards))
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", shard int, seq_id int"
    order = list(order_cols)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order).reset_index(drop=True)
        seq = 0
        fill = 0
        ids = []
        for t in pdf[tokens_col]:
            if fill > 0 and fill + t > capacity:
                seq += 1
                fill = 0
            fill += int(t)
            ids.append(seq)
        pdf["seq_id"] = pd.Series(ids, dtype="int32")
        return pdf

    return (
        df.withColumn("shard", shard_expr.cast("int"))
        .groupBy("shard")
        .applyInPandas(pack, schema=out_schema)
    )
