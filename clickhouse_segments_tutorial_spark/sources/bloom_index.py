"""File-level Bloom skip index — the ClickHouse ``bloom_filter`` /
``tokenbf_v1`` data-skipping index analog (SURVEY §2.1 S7's sort-order
minmax family, extended to the index type that prunes EQUALITY probes
on columns the sort order cannot serve; reference layout contract:
/root/reference/src/1-naive.test.ts:13-19 clusters by user — a probe on
any OTHER high-cardinality column reads every part there, which is
exactly what this index fixes).

The minmax/footer-stats path (sources/writers.py sort-on-write) prunes
RANGE predicates on the clustering column; Z-order (sources/zorder.py)
generalizes to a few clustered dimensions. A point probe on an
unclustered high-cardinality column (message_id, trace_id, doc
fingerprint) defeats both — every file's [min, max] straddles the
probe. A per-file Bloom filter answers "might this file contain v?"
from m bits with no false negatives, so the reader drops every file
whose filter says no and correctness never depends on the index.

Design (Spark-first, no sidecar service):

- **Build**: after writing, one pass per file computes the k bit
  positions of each distinct value (bit_j(v) = md5_hash60("<j>:<v>")
  mod m — the engine-portable hash family shared with operators/cms.py)
  and ORs them into an m-bit mask held as packed longs. The per-file
  masks land in ONE sidecar parquet (``_bloom/<col>/``) of
  (file, mask array<long>) rows — KB per file, read once per probe.
  The aggregation is a distributed groupBy(file) fold; nothing
  driver-side scales with data.
- **Probe**: compute the probe value's k positions driver-side (tiny),
  read the sidecar, keep files whose mask has ALL k bits set, and
  return the pruned path list for ``spark.read.parquet(*paths)`` with
  the ordinary filter on top (the filter stays — the index only
  SKIPS, semantics are the scan's).
- **Append-friendly**: each ``index_files`` call indexes only files
  not yet in the sidecar (mode=append) — the compaction-cadence story,
  same as the Z-order rewriter.

False-positive rate: (1 - e^{-kn/m})^k per file for n distinct values;
the defaults (m = 8192 bits, k = 4) hold ~1% at n ≈ 850 per file.
Over-full files degrade to never-pruned, never to wrong results."""

from __future__ import annotations

import os

from pyspark.sql import Column, SparkSession, functions as F

from ..operators.dedup import md5_hash60

_WORDS = 64  # bits per packed long


def _bit_pos(value: Column, j: Column, *, m: int) -> Column:
    """Bit position j of ``value`` in the m-bit filter (portable md5
    family, the cms.py construction)."""
    return F.pmod(
        md5_hash60(
            F.concat(j.cast("string"), F.lit(":"), value.cast("string"))
        ),
        F.lit(m),
    ).cast("int")


def _sidecar(path: str, col: str) -> str:
    return os.path.join(path, "_bloom", col)


def _char_ngrams(text: Column, n: int) -> Column:
    """All character n-grams of ``text`` as an array (empty when the
    text is shorter than n) — pure expressions, map-only."""
    return F.when(
        F.length(text) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(text) - (n - 1)),
            lambda i: F.substr(text, i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def index_files(
    spark: SparkSession,
    path: str,
    col: str,
    *,
    m_bits: int = 8192,
    k: int = 4,
    tokenized: bool = False,
    ngram: int | None = None,
) -> int:
    """Build (or extend) the Bloom sidecar for ``col`` over every data
    file under ``path`` not yet indexed. Returns the number of newly
    indexed files. One distributed pass over the new files: explode
    each row into its k bit positions, distinct per (file, word,
    bit), OR-fold into the packed-long mask per file.

    ``tokenized=True`` is the ``tokenbf_v1`` mode: the column is a
    TEXT column and the filter indexes its TOKENS (operators/text.
    tokens — the repo's one tokenizer rule), so the probe asks "does
    this file contain word X anywhere" — the skip index behind
    hasToken()-style predicates. ``ngram=n`` is the ``ngrambf_v1``
    mode: the filter indexes the text's character n-grams, serving
    SUBSTRING probes (LIKE '%frag%'): a file can contain the fragment
    only if every one of the fragment's n-grams is present, so
    pruned_paths requires ALL of them (still no false negatives).
    Each mode's sidecar lands under a distinct name
    (``<col>__tokens`` / ``<col>__ngram<n>``) so indexes on the same
    column coexist; probe with the matching pruned_paths mode and keep
    the ordinary predicate on top."""
    if m_bits % _WORDS != 0:
        raise ValueError(f"m_bits must be a multiple of {_WORDS}")
    if tokenized and ngram:
        raise ValueError("tokenized and ngram modes are mutually exclusive")
    n_words = m_bits // _WORDS
    df = spark.read.parquet(path).select(
        F.input_file_name().alias("file"), F.col(col).alias("_v")
    )
    if tokenized:
        from ..operators.text import tokens

        df = df.select("file", F.explode(tokens(F.col("_v"))).alias("_v"))
        col = f"{col}__tokens"
    elif ngram:
        df = df.select(
            "file", F.explode(_char_ngrams(F.col("_v"), ngram)).alias("_v")
        )
        col = f"{col}__ngram{ngram}"
    side = _sidecar(path, col)
    try:
        # anti-join, not an isin(<python list>) literal: a 100 TB table
        # has ~800k files and a literal that size bloats the plan; the
        # sidecar is one (file, mask) row per file, a natural broadcast
        have = spark.read.parquet(side).select("file")
    except Exception:
        have = None
    if have is not None:
        df = df.join(F.broadcast(have), "file", "left_anti")
    bits = df.select(
        "file",
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_j"),
        "_v",
    ).select(
        "file", _bit_pos(F.col("_v"), F.col("_j"), m=m_bits).alias("_bit")
    ).distinct()
    words = (
        bits.select(
            "file",
            (F.col("_bit") / _WORDS).cast("int").alias("_w"),
            # pyspark's shiftleft() takes a literal int shift; the SQL
            # form accepts a column
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), "
                f"CAST(pmod(_bit, {_WORDS}) AS INT))"
            ).alias("_m"),
        )
        .groupBy("file", "_w")
        # OR-fold via bit_or aggregate
        .agg(F.expr("bit_or(_m)").alias("_mask"))
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(n_words - 1)),
        lambda i: F.coalesce(
            F.element_at(
                F.map_from_entries(
                    F.collect_list(F.struct(F.col("_w"), F.col("_mask")))
                ),
                i,
            ),
            F.lit(0).cast("long"),
        ),
    )
    masks = words.groupBy("file").agg(dense.alias("mask"))
    n_new = masks.count()
    if n_new:
        masks.write.mode("append").parquet(side)
    return n_new


def pruned_paths(
    spark: SparkSession,
    path: str,
    col: str,
    value,
    *,
    m_bits: int = 8192,
    k: int = 4,
    tokenized: bool = False,
    ngram: int | None = None,
) -> list[str]:
    """Files under ``path`` that MIGHT contain ``value`` in ``col``
    (no false negatives): the probe's k bit positions are computed in
    one row against the sidecar; a file survives only if every probe
    bit is set in its mask. Files missing from the sidecar are KEPT
    (unindexed data must never be skipped). ``ngram=n`` probes the
    ngrambf sidecar with a SUBSTRING: every n-gram of ``value`` must
    be present (a fragment shorter than n has no grams and prunes
    nothing — the honest answer). The returned list feeds
    ``spark.read.parquet(*paths)`` with the ordinary predicate on
    top.

    Probe-side cost is DRIVER-side O(n_files): the sidecar masks and
    the table's file listing both collect (at ~800k files that is
    ~1 GB of masks at the default m — a deployment at that scale
    filters the sidecar DISTRIBUTED instead: join the mask table
    against the probe bits and collect only surviving file names,
    which this sidecar layout already supports; the catalog-scale
    collect here keeps the common case one read + one list)."""
    import hashlib

    if tokenized and ngram:
        raise ValueError("tokenized and ngram modes are mutually exclusive")
    probes = [str(value)]
    suffix = ""
    if tokenized:
        suffix = "__tokens"
    elif ngram:
        suffix = f"__ngram{ngram}"
        s = str(value)
        probes = [s[i : i + ngram] for i in range(len(s) - ngram + 1)]
        if not probes:  # fragment shorter than the gram size
            probes = []
    positions = [
        int(hashlib.md5(f"{j}:{p}".encode()).hexdigest()[:15], 16) % m_bits
        for p in probes
        for j in range(k)
    ]
    side = _sidecar(path, f"{col}{suffix}")
    try:
        rows = spark.read.parquet(side).collect()
    except Exception:
        rows = []
    indexed: dict[str, list[int]] = {r.file: list(r.mask) for r in rows}
    all_files = {
        r.file
        for r in spark.read.parquet(path)
        .select(F.input_file_name().alias("file"))
        .distinct()
        .collect()
    }
    keep = []
    for f in sorted(all_files):
        mask = indexed.get(f)
        if mask is None:
            keep.append(f)  # unindexed: cannot skip
            continue
        if all(mask[p // _WORDS] & (1 << (p % _WORDS)) for p in positions):
            keep.append(f)
    return keep
