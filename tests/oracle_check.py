"""Local replica of the driver's DuckDB-oracle comparison: run a Spark query
and its ANSI-SQL oracle side by side, compare row count, column names, and
order-insensitive values (exact equality — the engine expressions are
designed to be bit-identical across engines; see plans/ docstrings)."""

from __future__ import annotations

import math

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def _rows_to_sorted(rows: list[dict]) -> list[tuple]:
    out = [tuple(_norm(r[k]) for k in sorted(r)) for r in rows]
    return sorted(out, key=repr)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> tuple[bool, str]:
    """Returns (match, message). Columns sorted by name; rows order-insensitive."""
    spark_rows = [r.asDict() for r in spark_df.collect()]
    con = duckdb_conn(sf_dir)
    cur = con.execute(oracle_sql)
    cols = [d[0] for d in cur.description]
    duck_rows = [dict(zip(cols, row)) for row in cur.fetchall()]

    if spark_rows and duck_rows:
        sc, dc = sorted(spark_rows[0]), sorted(duck_rows[0])
        if sc != dc:
            return False, f"column mismatch: spark={sc} duck={dc}"
    if len(spark_rows) != len(duck_rows):
        return False, f"row count: spark={len(spark_rows)} duck={len(duck_rows)}"

    s, d = _rows_to_sorted(spark_rows), _rows_to_sorted(duck_rows)
    for i, (a, b) in enumerate(zip(s, d)):
        if a != b:
            return False, f"first diff at sorted row {i}: spark={a!r} duck={b!r}"
    return True, f"OK ({len(spark_rows)} rows)"
