"""Registered queries for BYTE-LEVEL tokenizer training
(operators/pretokenize.py): GPT-2-style regex pre-tokenization +
byte-to-unicode encoding feeding the UNCHANGED BPE and unigram train
loops — the realistic-text front end (r11 verdict item 1).

These twins train on byte-encoded pre-tokens instead of whitespace
words: leading spaces are part of the token (so ``Ġthe`` and ``the``
are distinct, the published convention), every symbol is one UTF-8
byte, and the engine-portability caveats of char-mode training close
outright (pretokenize module docstring — all symbols are printable BMP
characters, identical splitting and collation on both engines, for ANY
input including astral-plane text).

Oracles: full retraining replays, reusing the char-mode round
machinery — bpe_queries._stage for the merge rounds and
unigram_queries._train_ctes for the EM rounds — under the byte head
(pretokenize.BYTE_TOKENS_CTE: the same regex in DuckDB's RE2, the same
256-entry byte map as a VALUES table). The pre-tokens here reach 9
bytes at every SF (beyond char-mode's 8-char words); the oracle unroll
depth is pinned below and handed to the trainer as its word-length cap
so a corpus outgrowing the oracle fails loudly on the Spark side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.bpe import bpe_train
from ..operators.pretokenize import (
    BYTE_TOKENS_CTE,
    byte_encode,
    byte_pretoken_frequencies,
    pretokens,
)
from ..operators.unigram import UNI_ROUNDS, unigram_train
from ..sources.catalog import load_table
from .bpe_queries import _merges_df, _stage
from .registry import QuerySpec
from .unigram_queries import _train_ctes as _uni_train_ctes

# Merge rounds for the byte-level BPE — char-mode's 32 (bpe_queries
# rationale); trained at round_batch=1 so the oracle replays exactly.
N_MERGES_BYTES = 32

# Oracle DP unroll depth == the trainer's per-call word-length cap
# (unigram_queries.ORACLE_MAX_WORD_LEN pattern). Pre-tokens measure 9
# encoded bytes max at every SF (leading space + 8-char word); 12 gives
# headroom while keeping the unrolled chain ~3x72 CTEs.
BYTES_ORACLE_MAXW = 12

_BPE_CACHE: dict[tuple[str, str], tuple[list, DataFrame]] = {}


def _bpe_trained(spark: SparkSession, sf_dir: str, *, refresh: bool = False):
    """One byte-BPE training per (app, corpus); the trainer query always
    retrains (the bpe_queries._trained contract)."""
    docs = load_table(spark, sf_dir, "documents")
    key = (spark.sparkContext.applicationId, sf_dir)
    if refresh or key not in _BPE_CACHE:
        _BPE_CACHE[key] = bpe_train(
            byte_pretoken_frequencies(docs), n_merges=N_MERGES_BYTES
        )
    merges, trained = _BPE_CACHE[key]
    return docs, merges, trained


def bpe_merges_bytes_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The byte-level BPE merge table in learning order: (rank, lhs,
    rhs, merged, n_occurrences) — symbols are byte-characters (one per
    UTF-8 byte; pretokenize.byte_decode recovers display text)."""
    _, merges, _ = _bpe_trained(spark, sf_dir, refresh=True)
    return _merges_df(spark, merges)


def bpe_token_counts_bytes_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc pre-token and learned byte-BPE subword counts via the
    trained dictionary join (the bpe_token_counts shape over byte-
    encoded pre-tokens). Docs with no pre-tokens keep a zero row; the
    dictionary covers every pre-token by construction (trained on this
    corpus), enforced by a loud raise."""
    docs, _, trained = _bpe_trained(spark, sf_dir)
    dict_df = trained.select("word", F.size("syms").alias("_n_sub"))
    toks = docs.select(
        "doc_id", F.explode(pretokens("text")).alias("rawtok")
    ).select("doc_id", byte_encode(F.col("rawtok")).alias("word"))
    joined = toks.join(dict_df, "word", "left").withColumn(
        "_n_sub",
        F.when(F.col("_n_sub").isNotNull(), F.col("_n_sub")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("pre-token not in byte-BPE dictionary: "),
                    F.col("word"),
                )
            )
        ),
    )
    per_doc = joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("_n_pt"),
        F.sum("_n_sub").cast("int").alias("_n_bpe"),
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("_n_pt", F.lit(0)).alias("n_pretokens"),
            F.coalesce("_n_bpe", F.lit(0)).alias("n_bpe_tokens"),
        )
    )


def bpe_encode_bytes_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document as its byte-level learned subword token-id
    sequence — the tokenizer's END ARTIFACT in byte mode, one row per
    (doc_id, pos, token_id) with the deterministic sorted-symbol vocab
    ids (operators.bpe.encode_docs under the pre-tokenize+byte-encode
    tokens_fn). Completes the byte-mode surface: what a dataloader
    manifest of this corpus under the byte tokenizer IS."""
    from ..operators.bpe import encode_docs

    docs, _, trained = _bpe_trained(spark, sf_dir)
    return encode_docs(
        docs,
        trained,
        tokens_fn=lambda c: F.transform(pretokens(c), byte_encode),
    )


def bpe_fertility_bytes_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language fertility (byte-BPE subwords per PRE-TOKEN) and
    compression (text BYTES per subword) of the byte-level vocabulary —
    bpe_fertility_lang's metrics restated in byte-mode units so the
    char- and byte-trained vocabularies are directly comparable on the
    standard multilingual-tokenizer health axes. Exact integer sums per
    language, one rounded double division each (NULL on empty)."""
    docs, _, _ = _bpe_trained(spark, sf_dir)
    per_doc = bpe_token_counts_bytes_docs(spark, sf_dir).join(
        docs.select(
            "doc_id", "lang",
            F.length(F.encode("text", "UTF-8")).alias("_bytes"),
        ),
        "doc_id",
    )
    agg = per_doc.groupBy("lang").agg(
        F.sum("n_pretokens").cast("long").alias("n_pretokens"),
        F.sum("n_bpe_tokens").cast("long").alias("n_subwords"),
        F.sum("_bytes").cast("long").alias("_nb"),
    )
    return agg.select(
        "lang",
        "n_pretokens",
        "n_subwords",
        F.when(
            F.col("n_pretokens") > 0,
            F.round(F.col("n_subwords").cast("double") / F.col("n_pretokens"), 6),
        ).alias("fertility"),
        F.when(
            F.col("n_subwords") > 0,
            F.round(F.col("_nb").cast("double") / F.col("n_subwords"), 6),
        ).alias("bytes_per_subword"),
    )


def _byte_tokens_fn(c):
    """Text column -> byte-encoded pre-token array — the tokens_fn hook
    that retargets every whitespace-word consumer to the byte head."""
    return F.transform(pretokens(c), byte_encode)


def bpe_budget_chunks_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bpe_queries.bpe_budget_chunks under the BYTE head (r12 verdict
    item 3 — the downstream subword consumers wired to the byte-mode
    tokenizer): chunk boundaries from a per-doc prefix sum of byte-BPE
    subword counts over GPT-2 pre-tokens. Same start-boundary window
    math, same budget; only tokens_fn changes — the consumer machinery
    is head-independent by construction. Output (doc_id, chunk_idx,
    n_words, n_subwords) where n_words counts PRE-TOKENS."""
    from ..operators.bpe import budget_chunks

    docs, _, trained = _bpe_trained(spark, sf_dir)
    return budget_chunks(
        docs, trained, budget=BYTES_CHUNK_BUDGET, tokens_fn=_byte_tokens_fn
    )


def mixed_corpus_bpe_bytes_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bpe_queries.mixed_corpus_bpe_docs under the BYTE head: the
    temperature mixture weights computed over each language's total
    byte-BPE token count — the multilingual rebalancing rule measured
    in the units a REAL multilingual budget uses (byte-level subwords
    are the published convention precisely because whitespace words
    under-count CJK). Weight math unchanged
    (operators.sampling.temperature_weights, the one definition site);
    one bounded collect (#languages rows) then the map-only
    sequence+explode."""
    from ..operators.sampling import mix_corpus, temperature_weights

    docs, _, _ = _bpe_trained(spark, sf_dir)
    weights = temperature_weights(
        bpe_token_counts_bytes_docs(spark, sf_dir).join(
            docs.select("doc_id", "lang"), "doc_id"
        ),
        strata_col="lang",
        alpha=BYTES_MIX_ALPHA,
        quantum=BYTES_MIX_QUANTUM,
        weight_col="n_bpe_tokens",
    )
    return mix_corpus(
        docs, weights, strata_col="lang", key_col="doc_id"
    ).select("doc_id", "lang", "epoch")


def packed_chunks_bpe_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bpe_queries.packed_chunks_bpe under the BYTE head: the
    byte-budgeted chunks of bpe_budget_chunks_bytes greedily packed
    into BYTES_PACK_CAPACITY-subword training sequences — the same
    sharded applyInPandas recurrence and recursive-CTE oracle; the
    oracle retrains the byte tokenizer from scratch first."""
    from ..operators.bpe import budget_chunks
    from ..operators.packing import pack_chunks

    docs, _, trained = _bpe_trained(spark, sf_dir)
    chunks = budget_chunks(
        docs, trained, budget=BYTES_CHUNK_BUDGET, tokens_fn=_byte_tokens_fn
    )
    return pack_chunks(
        chunks, capacity=BYTES_PACK_CAPACITY, tokens_col="n_subwords", shards=8
    ).select("doc_id", "chunk_idx", "n_subwords", "shard", "seq_id")


def quality_signals_bytes_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dsir_queries.quality_signals_docs EXTENDED with the byte-mode
    tokenizer health signal: per-document byte-BPE FERTILITY (learned
    subwords per pre-token — over-fragmented documents are the ones a
    shared vocabulary serves worst, a curation signal the char-mode
    composite lacked). Same four signals + (n_pretokens, fertility);
    one extra equi-join on doc_id against the token-count frame; NULL
    fertility for a document with no pre-tokens."""
    from .dsir_queries import quality_signals_docs

    base = quality_signals_docs(spark, sf_dir)
    counts = bpe_token_counts_bytes_docs(spark, sf_dir).select(
        "doc_id",
        "n_pretokens",
        F.when(
            F.col("n_pretokens") > 0,
            F.round(
                F.col("n_bpe_tokens").cast("double") / F.col("n_pretokens"), 6
            ),
        ).alias("bpe_fertility"),
    )
    return base.join(counts, "doc_id")


# Consumer operating points under the byte head — the char-mode
# constants restated (bpe_queries rationale): byte-BPE subword counts
# run slightly above char-mode's (punctuation and spaces are tokens),
# so the same budgets still cut mid-stream at every SF.
BYTES_CHUNK_BUDGET = 64
BYTES_PACK_CAPACITY = 256
BYTES_MIX_ALPHA = 0.5
BYTES_MIX_QUANTUM = 10**9


def unigram_pieces_bytes_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The byte-level unigram piece table after UNI_ROUNDS hard-EM
    rounds: (piece, cnt, lp) over byte-character pieces — the unigram
    twin of bpe_merges_bytes_docs, trained on >8-char dictionary words
    (pre-tokens reach 9 encoded bytes on this corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    vocab, _ = unigram_train(
        byte_pretoken_frequencies(docs), max_word_len=BYTES_ORACLE_MAXW
    )
    return vocab


def unigram_pieces_bytes_pruned_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-pruned unigram training ON the byte-level corpus view
    — the round's two tokenizer features composed: GPT-2 pre-tokens +
    byte encoding feed unigram_train_pruned, which shrinks the seeded
    piece budget down to BYTES_PRUNE_TARGET by Viterbi usage. Output
    (piece, cnt, lp) over the 256-ish byte alphabet + target pieces."""
    from ..operators.unigram import unigram_train_pruned

    docs = load_table(spark, sf_dir, "documents")
    vocab, _ = unigram_train_pruned(
        byte_pretoken_frequencies(docs),
        target_extra=BYTES_PRUNE_TARGET,
        start_extra=BYTES_PRUNE_START,
        max_word_len=BYTES_ORACLE_MAXW,
    )
    return vocab


# Pruning operating point for the byte-mode twin: same shape as the
# char-mode unigram_pieces_pruned_docs (256 -> 128 -> 64).
BYTES_PRUNE_START = 256
BYTES_PRUNE_TARGET = 64


def _bpe_train_ctes(n_merges: int) -> str:
    """Byte-mode BPE retraining chain: the byte head + char-split w1
    (each char IS one byte after encoding) + the shared per-round
    stages (bpe_queries._stage, head-independent)."""
    head = f"""{BYTE_TOKENS_CTE},
w1 AS MATERIALIZED (
  SELECT word, freq,
         [substring(word, CAST(i AS INT), 1) FOR i IN range(1, length(word) + 1)] AS syms
  FROM wf
)"""
    return head + "," + ",".join(_stage(k) for k in range(1, n_merges + 1))


_MERGES_BYTES_ORACLE = f"""
WITH {_bpe_train_ctes(N_MERGES_BYTES)}
SELECT * FROM (
  {" UNION ALL ".join(
      f"SELECT {k} AS rank, lhs, rhs, lhs || rhs AS merged, cnt AS n_occurrences FROM b{k}"
      for k in range(1, N_MERGES_BYTES + 1)
  )}
)
"""

_TOKEN_COUNTS_BYTES_ORACLE = f"""
WITH {_bpe_train_ctes(N_MERGES_BYTES)},
tok AS (SELECT doc_id, unnest(t) AS word FROM bt),
dict AS (SELECT word, len(syms) AS n_sub FROM w{N_MERGES_BYTES + 1}),
agg AS (
  SELECT doc_id, CAST(count(*) AS INT) AS n_pt, CAST(sum(n_sub) AS INT) AS n_bpe
  FROM tok JOIN dict USING (word) GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(a.n_pt, 0) AS INT) AS n_pretokens,
       CAST(coalesce(a.n_bpe, 0) AS INT) AS n_bpe_tokens
FROM documents d LEFT JOIN agg a USING (doc_id)
"""

_BYTE_CTES = _bpe_train_ctes(N_MERGES_BYTES)

_ENCODE_BYTES_ORACLE = f"""
WITH {_BYTE_CTES},
vocab AS (
  SELECT sym, CAST(row_number() OVER (ORDER BY sym) AS INT) AS token_id
  FROM (SELECT DISTINCT unnest(syms) AS sym FROM w{N_MERGES_BYTES + 1})
),
tokp AS (
  SELECT doc_id, unnest(t) AS word,
         CAST(unnest(range(1, len(t) + 1)) AS INT) AS wpos
  FROM bt
),
dictn AS (SELECT word, len(syms) AS n_sub FROM w{N_MERGES_BYTES + 1}),
placed AS (
  SELECT doc_id, word, wpos,
         coalesce(sum(n_sub) OVER (PARTITION BY doc_id ORDER BY wpos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
  FROM tokp JOIN dictn USING (word)
),
enc AS (
  SELECT doc_id, CAST(bef + i AS INT) AS pos, sym FROM (
    SELECT p.doc_id, p.bef, unnest(w.syms) AS sym,
           unnest(range(1, len(w.syms) + 1)) AS i
    FROM placed p JOIN w{N_MERGES_BYTES + 1} w USING (word)
  )
)
SELECT doc_id, pos, token_id FROM enc JOIN vocab USING (sym)
"""

_FERTILITY_BYTES_ORACLE = f"""
WITH {_BYTE_CTES},
tok AS (SELECT doc_id, unnest(t) AS word FROM bt),
dict AS (SELECT word, len(syms) AS n_sub FROM w{N_MERGES_BYTES + 1}),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pt, CAST(sum(n_sub) AS BIGINT) AS n_bpe
  FROM tok JOIN dict USING (word) GROUP BY doc_id
),
perlang AS (
  SELECT d.lang,
         CAST(coalesce(sum(a.n_pt), 0) AS BIGINT) AS n_pretokens,
         CAST(coalesce(sum(a.n_bpe), 0) AS BIGINT) AS n_subwords,
         CAST(sum(octet_length(encode(d.text))) AS BIGINT) AS nb
  FROM documents d LEFT JOIN agg a USING (doc_id)
  GROUP BY d.lang
)
SELECT lang, n_pretokens, n_subwords,
       CASE WHEN n_pretokens > 0
            THEN round(CAST(n_subwords AS DOUBLE) / n_pretokens, 6) END AS fertility,
       CASE WHEN n_subwords > 0
            THEN round(CAST(nb AS DOUBLE) / n_subwords, 6) END AS bytes_per_subword
FROM perlang
"""

_UNI_PIECES_BYTES_ORACLE = f"""WITH {
    _uni_train_ctes(maxw=BYTES_ORACLE_MAXW, head=BYTE_TOKENS_CTE)
}
SELECT piece, cnt, lp FROM lp{UNI_ROUNDS}
"""


def _bytes_prune_budgets() -> list[int]:
    from ..operators.unigram import prune_schedule

    return prune_schedule(BYTES_PRUNE_START, BYTES_PRUNE_TARGET)


_UNI_PRUNED_BYTES_ORACLE = f"""WITH {
    _uni_train_ctes(
        maxw=BYTES_ORACLE_MAXW,
        head=BYTE_TOKENS_CTE,
        vocab_extra=BYTES_PRUNE_START,
        prune_budgets=_bytes_prune_budgets(),
    )
}
SELECT piece, cnt, lp FROM lp{len(_bytes_prune_budgets()) + 1}
"""

# --- byte-head consumer oracles: the char-mode consumer replays with the
# byte training chain (_BYTE_CTES) and its token frame (bt) swapped in —
# the consumer SQL itself is head-independent, like the Spark side.

_BUDGET_CHUNKS_BYTES_ORACLE = f"""
WITH {_BYTE_CTES},
tokp AS (
  SELECT doc_id, unnest(t) AS word,
         CAST(unnest(range(1, len(t) + 1)) AS INT) AS pos
  FROM bt
),
dict AS (SELECT word, len(syms) AS n_sub FROM w{N_MERGES_BYTES + 1}),
placed AS (
  SELECT doc_id, pos, n_sub,
         coalesce(sum(n_sub) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
  FROM tokp JOIN dict USING (word)
)
SELECT doc_id, CAST(floor(bef / {BYTES_CHUNK_BUDGET}) AS INT) AS chunk_idx,
       CAST(count(*) AS INT) AS n_words, CAST(sum(n_sub) AS INT) AS n_subwords
FROM placed GROUP BY doc_id, chunk_idx
"""

_MIX_BPE_BYTES_ORACLE = f"""
WITH {_BYTE_CTES},
tok AS (SELECT doc_id, unnest(t) AS word FROM bt),
dict AS (SELECT word, len(syms) AS n_sub FROM w{N_MERGES_BYTES + 1}),
agg AS (
  SELECT doc_id, CAST(sum(n_sub) AS BIGINT) AS n_bpe
  FROM tok JOIN dict USING (word) GROUP BY doc_id
),
langtok AS (
  SELECT d.lang AS s, CAST(sum(coalesce(a.n_bpe, 0)) AS BIGINT) AS n_l
  FROM documents d LEFT JOIN agg a USING (doc_id) GROUP BY d.lang
),
tot AS (SELECT CAST(sum(n_l) AS BIGINT) AS t FROM langtok),
wts AS (
  SELECT s,
         CAST(floor(sqrt(CAST(n_l AS DOUBLE) / CAST(t AS DOUBLE))
                    * {BYTES_MIX_QUANTUM}.0 + 0.5) AS BIGINT) AS wt
  FROM langtok, tot
),
wsum AS (SELECT CAST(sum(wt) AS BIGINT) AS ws FROM wts),
counts AS (SELECT lang AS s, CAST(count(*) AS BIGINT) AS n_s FROM documents GROUP BY lang),
ntot AS (SELECT CAST(sum(n_s) AS BIGINT) AS nt FROM counts JOIN wts USING (s)),
rates AS (
  SELECT w.s, ((n.nt * w.wt) / m.ws) / c.n_s AS rate
  FROM wts w JOIN counts c USING (s), wsum m, ntot n
),
expanded AS (
  SELECT d.doc_id, d.lang,
         CAST(floor(r.rate) AS INT)
         + CASE WHEN substring(md5(CAST(d.doc_id AS VARCHAR) || ':' || d.lang), 1, 8)
                     < lpad(lower(hex(CAST(floor((r.rate - floor(r.rate)) * 4294967296.0) AS BIGINT))), 8, '0')
                THEN 1 ELSE 0 END AS n_copies
  FROM documents d JOIN rates r ON d.lang = r.s
)
SELECT doc_id, lang, CAST(unnest(range(0, n_copies)) AS INT) AS epoch
FROM expanded WHERE n_copies >= 1
"""

_PACKED_BPE_BYTES_ORACLE = f"""
WITH RECURSIVE {_BYTE_CTES},
tokp AS (
  SELECT doc_id, unnest(t) AS word,
         CAST(unnest(range(1, len(t) + 1)) AS INT) AS pos
  FROM bt
),
dict AS (SELECT word, len(syms) AS n_sub FROM w{N_MERGES_BYTES + 1}),
placed AS (
  SELECT doc_id, pos, n_sub,
         coalesce(sum(n_sub) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
  FROM tokp JOIN dict USING (word)
),
chunks AS (
  SELECT doc_id, CAST(floor(bef / {BYTES_CHUNK_BUDGET}) AS INT) AS chunk_idx,
         CAST(sum(n_sub) AS INT) AS n_subwords,
         CAST(doc_id % 8 AS INT) AS shard
  FROM placed GROUP BY doc_id, chunk_idx
),
ordered AS (
  SELECT *, row_number() OVER (PARTITION BY shard
                               ORDER BY doc_id, chunk_idx) AS rn
  FROM chunks
),
pack(shard, rn, doc_id, chunk_idx, n_subwords, seq_id, fill) AS (
  SELECT shard, rn, doc_id, chunk_idx, n_subwords, 0, n_subwords
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT c.shard, c.rn, c.doc_id, c.chunk_idx, c.n_subwords,
         CASE WHEN p.fill + c.n_subwords > {BYTES_PACK_CAPACITY}
              THEN p.seq_id + 1 ELSE p.seq_id END,
         CASE WHEN p.fill + c.n_subwords > {BYTES_PACK_CAPACITY}
              THEN c.n_subwords ELSE p.fill + c.n_subwords END
  FROM pack p JOIN ordered c ON c.shard = p.shard AND c.rn = p.rn + 1
)
SELECT doc_id, chunk_idx, n_subwords, shard, CAST(seq_id AS INTEGER) AS seq_id
FROM pack
"""


def _quality_signals_bytes_oracle() -> str:
    from .dsir_queries import _quality_signals_oracle

    return f"""
SELECT doc_id, quality, gopher_keep, nb_llr, dsir_lw, n_pretokens, bpe_fertility
FROM ({_quality_signals_oracle()}) qs
JOIN (
  SELECT doc_id, n_pretokens,
         CASE WHEN n_pretokens > 0
              THEN round(CAST(n_bpe_tokens AS DOUBLE) / n_pretokens, 6)
         END AS bpe_fertility
  FROM ({_TOKEN_COUNTS_BYTES_ORACLE})
) f USING (doc_id)
"""




def bpe_budget_chunks_heads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bpe_budget_chunks under BOTH tokenizer heads in one lane-tagged
    registered query (r17 window consolidation, the r15-endorsed lane
    pattern): lane 'char' is bpe_queries.bpe_budget_chunks (learned
    char-BPE subword budgets), lane 'bytes' is the byte-head variant
    (GPT-2 pre-tokens, byte-BPE subword counts). Identical consumer
    machinery, one UNION ALL oracle — each head stays independently
    value-checked per round."""
    from .bpe_queries import bpe_budget_chunks

    char = bpe_budget_chunks(spark, sf_dir)
    byts = bpe_budget_chunks_bytes(spark, sf_dir)
    return char.select(F.lit("char").alias("lane"), "*").unionByName(
        byts.select(F.lit("bytes").alias("lane"), "*")
    )


def packed_chunks_heads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing under BOTH chunkers in one lane-tagged query
    (r17 window consolidation): lane 'words' is llm.packed_chunks
    (whitespace 128-token chunks packed to 512) and lane 'bytes' is
    packed_chunks_bpe_bytes (byte-BPE budget chunks packed to
    BYTES_PACK_CAPACITY). The per-lane token-count columns
    (n_chunk_tokens / n_subwords) align as n_tokens so the lanes
    union; both recursive-CTE oracles wrap with the same alias."""
    from .llm import packed_chunks

    words = packed_chunks(spark, sf_dir).withColumnRenamed(
        "n_chunk_tokens", "n_tokens"
    )
    byts = packed_chunks_bpe_bytes(spark, sf_dir).withColumnRenamed(
        "n_subwords", "n_tokens"
    )
    return words.select(F.lit("words").alias("lane"), "*").unionByName(
        byts.select(F.lit("bytes").alias("lane"), "*")
    )


def _packed_heads_oracle() -> str:
    from .llm import _PACKED_ORACLE

    return (
        "SELECT 'words' AS lane, doc_id, chunk_idx, "
        "n_chunk_tokens AS n_tokens, shard, seq_id "
        f"FROM ({_PACKED_ORACLE}) UNION ALL "
        "SELECT 'bytes' AS lane, doc_id, chunk_idx, "
        "n_subwords AS n_tokens, shard, seq_id "
        f"FROM ({_PACKED_BPE_BYTES_ORACLE})"
    )


def _budget_chunks_heads_oracle() -> str:
    from .bpe_queries import _BUDGET_CHUNKS_ORACLE

    return (
        f"SELECT 'char' AS lane, * FROM ({_BUDGET_CHUNKS_ORACLE}) "
        f"UNION ALL SELECT 'bytes' AS lane, * FROM ({_BUDGET_CHUNKS_BYTES_ORACLE})"
    )


QUERIES = [
    QuerySpec(
        "bpe_merges_bytes_docs", bpe_merges_bytes_docs, _MERGES_BYTES_ORACLE
    ),
    QuerySpec(
        "bpe_token_counts_bytes_docs",
        bpe_token_counts_bytes_docs,
        _TOKEN_COUNTS_BYTES_ORACLE,
    ),
    QuerySpec(
        "unigram_pieces_bytes_docs",
        unigram_pieces_bytes_docs,
        _UNI_PIECES_BYTES_ORACLE,
    ),
    QuerySpec(
        "bpe_encode_bytes_docs", bpe_encode_bytes_docs, _ENCODE_BYTES_ORACLE
    ),
    QuerySpec(
        "bpe_fertility_bytes_lang",
        bpe_fertility_bytes_lang,
        _FERTILITY_BYTES_ORACLE,
    ),
    QuerySpec(
        "unigram_pieces_bytes_pruned_docs",
        unigram_pieces_bytes_pruned_docs,
        _UNI_PRUNED_BYTES_ORACLE,
    ),
    QuerySpec(
        "bpe_budget_chunks",
        bpe_budget_chunks_heads,
        _budget_chunks_heads_oracle(),
    ),
    QuerySpec(
        "mixed_corpus_bpe_bytes_docs",
        mixed_corpus_bpe_bytes_docs,
        _MIX_BPE_BYTES_ORACLE,
    ),
    QuerySpec(
        "packed_chunks",
        packed_chunks_heads,
        _packed_heads_oracle(),
    ),
    QuerySpec(
        "quality_signals_bytes_docs",
        quality_signals_bytes_docs,
        _quality_signals_bytes_oracle(),
    ),
]
