"""Sequence packing: fill fixed-size context windows with document chunks.

The step between chunking and training: given chunk rows (each at most the
model context length), assign them greedily to "sequences" (bins) of
``capacity`` tokens so batches are dense. Greedy sequential packing is
inherently stateful — bin fill depends on every previous row — so it is
NOT expressible as window functions (a running cumsum would let bins
overflow); this is a textbook justified use of ``applyInPandas``.

Distribution model: rows are sharded by a deterministic key (``key`` mod
``shards``), each shard packs independently in a stable sort order, and
sequence ids are (shard, seq_id) pairs. Sharding costs a little density
(each shard's last bin is partially full) but buys full parallelism — the
per-shard greedy loop never sees another shard's state. At 100 TB, shards
= O(cluster cores), each shard's group streams through one Arrow batch
chain; no state is ever driver-side.

Everything is deterministic (mod-sharding + total sort order), so the
exact packing is reproducible in SQL with a recursive CTE — the DuckDB
oracle in plans/llm.py replays the same greedy recurrence.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def pack_chunks(
    df: DataFrame,
    *,
    capacity: int,
    tokens_col: str = "n_chunk_tokens",
    key_col: str = "doc_id",
    order_cols: tuple[str, ...] = ("doc_id", "chunk_idx"),
    shards: int = 16,
) -> DataFrame:
    """Assign every row a (shard, seq_id): greedy first-open-bin packing in
    ``order_cols`` order within each shard. A row larger than ``capacity``
    gets a bin of its own (never split). Input columns pass through."""
    if capacity < 1 or shards < 1:
        raise ValueError("capacity and shards must be >= 1")
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
        df.withColumn(
            "shard", F.pmod(F.col(key_col), F.lit(shards)).cast("int")
        )
        .groupBy("shard")
        .applyInPandas(pack, schema=out_schema)
    )
