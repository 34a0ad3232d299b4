"""Registered queries for the corpus-trained BPE tokenizer
(operators/bpe.py) — train on `documents`, emit the learned merge table,
per-doc subword counts, and a BPE-budgeted source quota (the
"token-budget consumers upgrade from whitespace proxies" the r9 verdict
asked for).

Oracle strategy: BPE training is deterministic (exact integer pair
counts, binary-string argmax tie-break), so the DuckDB oracle RETRAINS
from scratch by unrolling the ``N_MERGES`` rounds as chained CTEs — each
round recomputes weighted adjacent-pair counts over the word
dictionary's symbol rows, picks the same argmax, and applies the greedy
left-to-right merge with window functions:

- ``occ``:   (sym, next) equals the round's winning pair;
- ``ms``:    merge STARTS — an occurrence whose run of immediately
             preceding consecutive occurrences has even length (the
             closed form of "greedy scan skips past a merge": for
             lhs != rhs runs are length 1 so every occurrence merges;
             for lhs == rhs a k-run merges at positions 1,3,5,...);
- ``consumed``: the element after a merge start disappears;
- reassemble with list(... ORDER BY i).

This replays the Spark fold (operators.bpe.apply_merge) bit-for-bit, so
the SAME oracle text validates training AND application at every SF —
no pinned merge list that would desync across corpora (the
_packed_incremental_oracle shared-constants pattern, taken further).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.bpe import (
    bpe_token_counts,
    bpe_train,
    budget_chunks,
    encode_docs,
    word_frequencies,
)
from ..operators.sampling import mix_corpus, quota_by_group, temperature_weights
from ..sources.catalog import load_table
from .curation import _TOKENS_CTE
from .registry import QuerySpec

# Rounds to train in the registered queries. 32 learns every high-value
# subword of this corpus (saturation — all words single-symbol — is ~108
# rounds at its 31-word vocabulary) while keeping the unrolled oracle
# chain and the per-round Spark jobs bounded. ONE definition site shared
# by the Spark queries and the oracle f-strings below (the _QUOTA_TOKENS
# rule).
N_MERGES = 32

# Per-source budget for the BPE-weighted quota twin, in learned-subword
# units. Subword counts run ~1.3-1.6x whitespace counts on this corpus,
# so 1200 cuts each source mid-stream at every SF (a real cut, like
# curation._QUOTA_TOKENS' 800).
BPE_QUOTA_UNITS = 1200

# Context-window budget for the subword chunker, in learned subwords.
# Docs here average ~55 whitespace tokens -> ~70-90 subwords, so 64
# yields mostly 2-chunk docs — boundaries are real at every SF.
BPE_CHUNK_BUDGET = 64

# Training-sequence capacity for the subword packer, in learned
# subwords: ~3-4 BPE_CHUNK_BUDGET chunks per packed sequence, so bins
# close mid-stream at every SF (a real packing, not one-bin-per-chunk).
BPE_PACK_CAPACITY = 256

# Temperature and quantum for the subword-budgeted mixture weights —
# operators.sampling.temperature_weights' pinned oracle-portable setting
# (alpha=0.5 -> sqrt, IEEE-exact in every libm; integer quantum so the
# weight sum is exact — see that docstring for the 2^53 product bound).
BPE_MIX_ALPHA = 0.5
BPE_MIX_QUANTUM = 10**9


# One training per (Spark app, corpus): the three registered queries and
# any repeated harness invocation reuse the same localCheckpoint-backed
# dictionary. Keyed by applicationId so a restarted session retrains
# instead of touching checkpoints of a stopped context; stale entries
# are dead plan handles, never reused.
_TRAIN_CACHE: dict[tuple[str, str], tuple[list, DataFrame]] = {}


def _trained(spark: SparkSession, sf_dir: str, *, refresh: bool = False):
    """``refresh=True`` (the trainer query) always retrains and updates
    the cache — so bench samples of bpe_merges_docs time REAL training
    runs, never a memo hit; the consumer queries reuse the artifact, as
    a pipeline would."""
    docs = load_table(spark, sf_dir, "documents")
    key = (spark.sparkContext.applicationId, sf_dir)
    if refresh or key not in _TRAIN_CACHE:
        _TRAIN_CACHE[key] = bpe_train(word_frequencies(docs), n_merges=N_MERGES)
    merges, trained = _TRAIN_CACHE[key]
    return docs, merges, trained


def _merges_df(spark: SparkSession, merges: list) -> DataFrame:
    """The learned merge table as a DataFrame — O(N_MERGES) rows,
    driver-held by design (this IS the broadcastable tokenizer
    artifact)."""
    return spark.createDataFrame(
        [(m.rank, m.lhs, m.rhs, m.merged, m.n_occurrences) for m in merges],
        "rank int, lhs string, rhs string, merged string, n_occurrences bigint",
    )


def bpe_merges_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge table, in learning order: (rank, lhs, rhs,
    merged, n_occurrences)."""
    _, merges, _ = _trained(spark, sf_dir, refresh=True)
    return _merges_df(spark, merges)


def bpe_token_counts_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc whitespace vs learned-subword token counts via the trained
    dictionary join (operators.bpe.bpe_token_counts)."""
    docs, _, trained = _trained(spark, sf_dir)
    return bpe_token_counts(docs, trained)


def source_quota_bpe_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """curation.source_quota_docs upgraded to LEARNED subword budgets:
    each source keeps its doc_id-ordered prefix within BPE_QUOTA_UNITS
    trained-BPE tokens — the whitespace-proxy-to-real-tokenizer upgrade
    path for every budget consumer (weight_col is pluggable)."""
    docs, _, trained = _trained(spark, sf_dir)
    weighted = bpe_token_counts(docs, trained).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    return quota_by_group(
        weighted.select("source", "doc_id", "n_bpe_tokens"),
        group_col="source",
        order_col="doc_id",
        weight_col="n_bpe_tokens",
        budget=BPE_QUOTA_UNITS,
    ).select(
        "source", "doc_id", "n_bpe_tokens",
        F.col("cum_weight").cast("long").alias("cum_bpe"),
    )


def bpe_budget_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators.text.chunk_documents' budget upgraded to LEARNED
    subwords: chunk boundaries from a per-doc prefix sum of trained
    dictionary subword counts (operators.bpe.budget_chunks,
    start-boundary rule)."""
    docs, _, trained = _trained(spark, sf_dir)
    return budget_chunks(docs, trained, budget=BPE_CHUNK_BUDGET)


def bpe_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document encoded as its learned subword token-id sequence
    (operators.bpe.encode_docs) — the tokenizer's end artifact, one row
    per (doc_id, pos, token_id) with deterministic sorted-symbol vocab
    ids, value-checked bit-for-bit against the retraining oracle."""
    docs, _, trained = _trained(spark, sf_dir)
    return encode_docs(docs, trained)


def mixed_corpus_bpe_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """llm.mixed_corpus_docs upgraded to LEARNED-subword budgets (r10
    verdict item 5): the temperature mixture weights are computed over
    each language's total trained-BPE token count instead of its row
    count — the multilingual rebalancing rule (XLM-R/mT5) applied to
    what the budget actually is, tokens, not documents.

    Weight math is operators.sampling.temperature_weights — the ONE
    definition site of the oracle-portable quantization (share^0.5 via
    IEEE sqrt, integer-quantized) — called with ``weight_col`` so
    sum(n_bpe_tokens) replaces count(*) as the share numerator: no
    per-subword explode, just the per-doc token-count frame. One
    bounded collect (#languages rows), then mix_corpus's map-only
    sequence+explode — no corpus shuffle beyond the dictionary join."""
    docs, _, trained = _trained(spark, sf_dir)
    weights = temperature_weights(
        bpe_token_counts(docs, trained).join(docs.select("doc_id", "lang"), "doc_id"),
        strata_col="lang",
        alpha=BPE_MIX_ALPHA,
        quantum=BPE_MIX_QUANTUM,
        weight_col="n_bpe_tokens",
    )
    return mix_corpus(
        docs, weights, strata_col="lang", key_col="doc_id"
    ).select("doc_id", "lang", "epoch")


def packed_chunks_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """llm.packed_chunks upgraded to LEARNED-subword capacities (r10
    verdict item 5): the packed bins are the subword-budgeted chunks of
    bpe_budget_chunks, greedily packed into BPE_PACK_CAPACITY-subword
    training sequences — capacity measured in the units a dataloader
    actually fills. Same sharded applyInPandas recurrence and
    recursive-CTE oracle as the whitespace packer; the oracle retrains
    the tokenizer from scratch first (shared _train_ctes)."""
    from ..operators.packing import pack_chunks

    docs, _, trained = _trained(spark, sf_dir)
    chunks = budget_chunks(docs, trained, budget=BPE_CHUNK_BUDGET)
    return pack_chunks(
        chunks, capacity=BPE_PACK_CAPACITY, tokens_col="n_subwords", shards=8
    ).select("doc_id", "chunk_idx", "n_subwords", "shard", "seq_id")


def bpe_fertility_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-quality evaluation: per-language FERTILITY (learned
    subwords per whitespace word) and compression (text characters per
    subword) of the trained BPE — the standard multilingual-tokenizer
    health metrics (a language with outsized fertility is being
    over-fragmented and under-served by the shared vocabulary). Exact
    integer sums per language; each ratio is ONE double division of
    exact integers, rounded to 6 (NULL for a language with no tokens).
    Output (lang, n_words, n_subwords, fertility, chars_per_subword).

    Scale: one dictionary join (bpe_token_counts' plan) + a
    #languages-sized hash-agg — nothing beyond the existing encode
    shapes."""
    docs, _, trained = _trained(spark, sf_dir)
    per_doc = bpe_token_counts(docs, trained).join(
        docs.select("doc_id", "lang", F.length("text").alias("_chars")), "doc_id"
    )
    agg = per_doc.groupBy("lang").agg(
        F.sum("n_ws_tokens").cast("long").alias("n_words"),
        F.sum("n_bpe_tokens").cast("long").alias("n_subwords"),
        F.sum("_chars").cast("long").alias("_nc"),
    )
    return agg.select(
        "lang",
        "n_words",
        "n_subwords",
        F.when(
            F.col("n_words") > 0,
            F.round(F.col("n_subwords").cast("double") / F.col("n_words"), 6),
        ).alias("fertility"),
        F.when(
            F.col("n_subwords") > 0,
            F.round(F.col("_nc").cast("double") / F.col("n_subwords"), 6),
        ).alias("chars_per_subword"),
    )


def _stage(k: int) -> str:
    """One unrolled training round: w{k} -> b{k} (the round's argmax
    pair) and w{k+1} (dictionary after applying it)."""
    a, b = f"(SELECT lhs FROM b{k})", f"(SELECT rhs FROM b{k})"
    return f"""
s{k} AS MATERIALIZED (
  SELECT word, freq, CAST(unnest(range(1, len(syms) + 1)) AS INT) AS i, syms
  FROM w{k}
),
t{k} AS MATERIALIZED (
  SELECT word, freq, i, syms[i] AS sym,
         lead(syms[i]) OVER (PARTITION BY word ORDER BY i) AS nxt
  FROM s{k}
),
p{k} AS MATERIALIZED (
  SELECT sym AS lhs, nxt AS rhs, CAST(sum(freq) AS BIGINT) AS cnt
  FROM t{k} WHERE nxt IS NOT NULL GROUP BY sym, nxt
),
b{k} AS MATERIALIZED (SELECT lhs, rhs, cnt FROM p{k} ORDER BY cnt DESC, lhs, rhs LIMIT 1),
o{k} AS MATERIALIZED (
  SELECT word, freq, i, sym,
         coalesce(sym = {a} AND nxt = {b}, false) AS occ
  FROM t{k}
),
m{k} AS MATERIALIZED (
  SELECT word, freq, i, sym, occ,
         occ AND ((i - 1 - coalesce(max(CASE WHEN NOT occ THEN i END)
                    OVER (PARTITION BY word ORDER BY i
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0)) % 2 = 0) AS ms
  FROM o{k}
),
c{k} AS MATERIALIZED (
  SELECT word, freq, i, sym, ms,
         coalesce(lag(ms) OVER (PARTITION BY word ORDER BY i), false) AS consumed
  FROM m{k}
),
w{k + 1} AS MATERIALIZED (
  SELECT word, freq,
         list(CASE WHEN ms THEN {a} || {b} ELSE sym END ORDER BY i) AS syms
  FROM c{k} WHERE NOT consumed GROUP BY word, freq
)"""


def _train_ctes(n_merges: int) -> str:
    """The full retraining chain: corpus tokens -> word dictionary ->
    n_merges unrolled rounds. Ends with w{n_merges+1} (trained
    dictionary) and b1..b{n_merges} (the merge table)."""
    head = f"""{_TOKENS_CTE},
wf AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(t) AS word FROM base) GROUP BY word
),
w1 AS MATERIALIZED (
  SELECT word, freq,
         [substring(word, CAST(i AS INT), 1) FOR i IN range(1, length(word) + 1)] AS syms
  FROM wf
)"""
    return head + "," + ",".join(_stage(k) for k in range(1, n_merges + 1))


class IncrementalBPETrainer:
    """Wave-state twin of BPE training — the tokenizer joins the
    batch / incremental / streaming triangle.

    BPE's only corpus-sized input is the word-frequency dictionary
    (operators/bpe.py module docstring), and word counts are an
    ASSOCIATIVE sufficient statistic: per-wave (word, freq) deltas
    summed in any order reproduce the batch dictionary exactly, and
    ``bpe_train`` is deterministic given the dictionary — so the merge
    table retrained from accumulated wave counts is bit-identical to
    training on the full corpus, with NO wave-order contract. State
    mechanics (bucketed wave-tagged rows, replay collapse, compaction,
    crash healing, resume numbering) are the shared
    operators.wave_counts.WaveCountState chassis.

    100 TB design: each wave pays one wave-sized explode + hash-agg;
    state is the Heaps-law dictionary x waves (compaction folds it);
    retraining reads ONLY the state — the nightly-tokenizer-refresh
    pattern where yesterday's corpus is never re-read. At a real 32k
    vocab the rebuild uses ``round_batch`` batched training
    (``bpe_train`` docstring); the registered twins train at the exact
    sequential setting to share the batch oracle."""

    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        *,
        n_merges: int = N_MERGES,
        state_buckets: int = 32,
    ):
        from ..operators.wave_counts import WaveCountState

        self.spark, self.n_merges = spark, n_merges
        self._st = WaveCountState(
            spark,
            workdir,
            name="bpestate",
            key_col="word",
            key_type="string",
            value_cols=["freq"],
            state_buckets=state_buckets,
        )

    def ingest(self, docs: DataFrame, *, wave_id: int | None = None) -> DataFrame:
        """Fold one wave's word frequencies into state; returns the
        wave's audit row (wave, n_words, n_tokens — THIS wave's distinct
        words and token total), pinned under the workdir."""
        wave = self._st.resolve_wave(wave_id)
        # The wave aggregate feeds TWO writes (audit pin, state append);
        # persist it for their duration so the wave-sized explode+agg
        # runs once, not twice per micro-batch (r11 review finding 3).
        wf = word_frequencies(docs).persist()
        try:
            audit = wf.agg(
                F.lit(wave).alias("wave"),
                F.count(F.lit(1)).alias("n_words"),
                F.coalesce(F.sum("freq"), F.lit(0)).cast("long").alias("n_tokens"),
            )
            # pin the audit BEFORE the state append (read-your-writes rule)
            pinned = self._st.pin_audit(audit, wave)
            self._st.append(wf.select("word", "freq"), wave)
        finally:
            wf.unpersist()
        return pinned

    def dictionary(self) -> DataFrame:
        """(word, freq) over every ingested wave — equals
        ``word_frequencies`` of the concatenated corpus exactly."""
        return self._st.read().groupBy("word").agg(F.sum("freq").alias("freq"))

    def train(self) -> tuple[list, DataFrame]:
        """(merge table, trained dictionary) retrained from accumulated
        counts — bit-identical to batch training on the full corpus."""
        return bpe_train(self.dictionary(), n_merges=self.n_merges)

    def compact(self) -> None:
        self._st.compact(self._st._wave)

    def reset(self) -> None:
        self._st.reset()

    def drop_state(self) -> None:
        self._st.drop()


def word_state_two_waves(
    spark: SparkSession, sf_dir: str, scratch_name: str
) -> IncrementalBPETrainer:
    """Ingest `documents` into a fresh word-count state as two
    doc_id-median waves (newest-first on purpose — word counts are
    associative, no wave-order contract) and return the drained
    trainer. The ONE two-wave harness shared by the BPE and unigram
    incremental twins (r12 review finding 3): both tokenizers train
    from this same accumulated dictionary."""
    from .curation import _stream_scratch

    docs = load_table(spark, sf_dir, "documents")
    mid = docs.agg(F.expr("percentile_approx(doc_id, 0.5)")).collect()[0][0]
    tr = IncrementalBPETrainer(spark, _stream_scratch(scratch_name))
    tr.reset()
    tr.ingest(docs.filter(F.col("doc_id") >= mid))
    tr.ingest(docs.filter(F.col("doc_id") < mid))
    return tr


def word_state_streamed(
    spark: SparkSession, sf_dir: str, scratch_name: str
) -> IncrementalBPETrainer:
    """The word-count state fed through the generic streaming wave gate
    (streaming/stream_curation.py): a checkpointed file stream drains
    two wave files into the trainer via foreachBatch (per-batch audit
    rows in results/); returns the trainer for model rebuild. Shared by
    the BPE and unigram streaming twins."""
    from ..streaming.stream_curation import StreamingWaveGate
    from .curation import _stream_scratch

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    mid = docs.agg(F.expr("percentile_approx(doc_id, 0.5)")).collect()[0][0]
    workdir = _stream_scratch(scratch_name)
    tr = IncrementalBPETrainer(spark, f"{workdir}/state")
    gate = StreamingWaveGate(spark, workdir, schema=docs.schema, ingestor=tr)
    gate.reset_state()
    docs.filter(F.col("doc_id") < mid).coalesce(1).write.mode("append").parquet(
        gate.in_dir
    )
    gate.run_available_now()
    docs.filter(F.col("doc_id") >= mid).coalesce(1).write.mode("append").parquet(
        gate.in_dir
    )
    gate.run_available_now()
    return tr


def bpe_merges_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE training run INCREMENTALLY over two waves of documents with
    bucketed word-count state between them (word_state_two_waves); the
    retrained merge table SHARES bpe_merges_docs' unrolled-rounds
    retraining oracle."""
    merges, _ = word_state_two_waves(spark, sf_dir, "bpe_incremental").train()
    return _merges_df(spark, merges)


def bpe_merges_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BPE trainer behind the streaming wave gate
    (word_state_streamed); the merge table retrained from the
    gate-accumulated word-count state shares the batch retraining
    oracle."""
    merges, _ = word_state_streamed(spark, sf_dir, "bpe_streaming").train()
    return _merges_df(spark, merges)


_MERGES_ORACLE = f"""
WITH {_train_ctes(N_MERGES)}
SELECT * FROM (
  {" UNION ALL ".join(
      f"SELECT {k} AS rank, lhs, rhs, lhs || rhs AS merged, cnt AS n_occurrences FROM b{k}"
      for k in range(1, N_MERGES + 1)
  )}
)
"""

_TOKEN_COUNTS_ORACLE = f"""
WITH {_train_ctes(N_MERGES)},
tok AS (SELECT doc_id, unnest(t) AS word FROM base),
dict AS (SELECT word, len(syms) AS n_sub FROM w{N_MERGES + 1}),
agg AS (
  SELECT doc_id, CAST(count(*) AS INT) AS n_ws, CAST(sum(n_sub) AS INT) AS n_bpe
  FROM tok JOIN dict USING (word) GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(coalesce(a.n_ws, 0) AS INT) AS n_ws_tokens,
       CAST(coalesce(a.n_bpe, 0) AS INT) AS n_bpe_tokens
FROM (SELECT DISTINCT doc_id FROM base) b LEFT JOIN agg a USING (doc_id)
"""

_FERTILITY_ORACLE = f"""
WITH {_train_ctes(N_MERGES)},
tok AS (SELECT doc_id, unnest(t) AS word FROM base),
dict AS (SELECT word, len(syms) AS n_sub FROM w{N_MERGES + 1}),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ws, CAST(sum(n_sub) AS BIGINT) AS n_bpe
  FROM tok JOIN dict USING (word) GROUP BY doc_id
),
perlang AS (
  SELECT d.lang,
         CAST(coalesce(sum(a.n_ws), 0) AS BIGINT) AS n_words,
         CAST(coalesce(sum(a.n_bpe), 0) AS BIGINT) AS n_subwords,
         CAST(sum(length(d.text)) AS BIGINT) AS nc
  FROM documents d LEFT JOIN agg a USING (doc_id)
  GROUP BY d.lang
)
SELECT lang, n_words, n_subwords,
       CASE WHEN n_words > 0
            THEN round(CAST(n_subwords AS DOUBLE) / n_words, 6) END AS fertility,
       CASE WHEN n_subwords > 0
            THEN round(CAST(nc AS DOUBLE) / n_subwords, 6) END AS chars_per_subword
FROM perlang
"""

_QUOTA_BPE_ORACLE = f"""
WITH {_train_ctes(N_MERGES)},
tok AS (SELECT doc_id, unnest(t) AS word FROM base),
dict AS (SELECT word, len(syms) AS n_sub FROM w{N_MERGES + 1}),
agg AS (
  SELECT doc_id, CAST(sum(n_sub) AS INT) AS n_bpe
  FROM tok JOIN dict USING (word) GROUP BY doc_id
),
cum AS (
  SELECT b.source, b.doc_id,
         CAST(coalesce(a.n_bpe, 0) AS INT) AS n_bpe_tokens,
         sum(coalesce(a.n_bpe, 0)) OVER (
           PARTITION BY b.source ORDER BY b.doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_bpe
  FROM (SELECT DISTINCT doc_id, source FROM base) b LEFT JOIN agg a USING (doc_id)
)
SELECT source, doc_id, n_bpe_tokens, CAST(cum_bpe AS BIGINT) AS cum_bpe
FROM cum WHERE cum_bpe <= {BPE_QUOTA_UNITS}
"""

_BUDGET_CHUNKS_ORACLE = f"""
WITH {_train_ctes(N_MERGES)},
tokp AS (
  SELECT doc_id, unnest(t) AS word,
         CAST(unnest(range(1, len(t) + 1)) AS INT) AS pos
  FROM base
),
dict AS (SELECT word, len(syms) AS n_sub FROM w{N_MERGES + 1}),
placed AS (
  SELECT doc_id, pos, n_sub,
         coalesce(sum(n_sub) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
  FROM tokp JOIN dict USING (word)
)
SELECT doc_id, CAST(floor(bef / {BPE_CHUNK_BUDGET}) AS INT) AS chunk_idx,
       CAST(count(*) AS INT) AS n_words, CAST(sum(n_sub) AS INT) AS n_subwords
FROM placed GROUP BY doc_id, chunk_idx
"""

_ENCODE_ORACLE = f"""
WITH {_train_ctes(N_MERGES)},
vocab AS (
  SELECT sym, CAST(row_number() OVER (ORDER BY sym) AS INT) AS token_id
  FROM (SELECT DISTINCT unnest(syms) AS sym FROM w{N_MERGES + 1})
),
tokp AS (
  SELECT doc_id, unnest(t) AS word,
         CAST(unnest(range(1, len(t) + 1)) AS INT) AS wpos
  FROM base
),
dictn AS (SELECT word, len(syms) AS n_sub FROM w{N_MERGES + 1}),
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
    FROM placed p JOIN w{N_MERGES + 1} w USING (word)
  )
)
SELECT doc_id, pos, token_id FROM enc JOIN vocab USING (sym)
"""

_MIX_BPE_ORACLE = f"""
WITH {_train_ctes(N_MERGES)},
tok AS (SELECT doc_id, unnest(t) AS word FROM base),
dict AS (SELECT word, len(syms) AS n_sub FROM w{N_MERGES + 1}),
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
                    * {BPE_MIX_QUANTUM}.0 + 0.5) AS BIGINT) AS wt
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

_PACKED_BPE_ORACLE = f"""
WITH RECURSIVE {_train_ctes(N_MERGES)},
tokp AS (
  SELECT doc_id, unnest(t) AS word,
         CAST(unnest(range(1, len(t) + 1)) AS INT) AS pos
  FROM base
),
dict AS (SELECT word, len(syms) AS n_sub FROM w{N_MERGES + 1}),
placed AS (
  SELECT doc_id, pos, n_sub,
         coalesce(sum(n_sub) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bef
  FROM tokp JOIN dict USING (word)
),
chunks AS (
  SELECT doc_id, CAST(floor(bef / {BPE_CHUNK_BUDGET}) AS INT) AS chunk_idx,
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
         CASE WHEN p.fill + c.n_subwords > {BPE_PACK_CAPACITY}
              THEN p.seq_id + 1 ELSE p.seq_id END,
         CASE WHEN p.fill + c.n_subwords > {BPE_PACK_CAPACITY}
              THEN c.n_subwords ELSE p.fill + c.n_subwords END
  FROM pack p JOIN ordered c ON c.shard = p.shard AND c.rn = p.rn + 1
)
SELECT doc_id, chunk_idx, n_subwords, shard, CAST(seq_id AS INTEGER) AS seq_id
FROM pack
"""

QUERIES = [
    # headline: representatively prices the new iterative train loop
    # (N_MERGES rounds of dictionary-sized pair-count hash-aggs) plus the
    # corpus-token dictionary join — a physical shape nothing else in the
    # timed set exercises (BASELINE.md widening note, r10).
    QuerySpec("bpe_merges_docs", bpe_merges_docs, _MERGES_ORACLE, headline=True),
    QuerySpec("bpe_token_counts_docs", bpe_token_counts_docs, _TOKEN_COUNTS_ORACLE),
    QuerySpec("bpe_fertility_lang", bpe_fertility_lang, _FERTILITY_ORACLE),
    QuerySpec("source_quota_bpe_docs", source_quota_bpe_docs, _QUOTA_BPE_ORACLE),
    # bpe_budget_chunks is registered from bytetok_queries as the
    # two-head (char/bytes) lane-tagged query (r17 window consolidation)
    QuerySpec("bpe_encode_docs", bpe_encode_docs, _ENCODE_ORACLE),
    QuerySpec("mixed_corpus_bpe_docs", mixed_corpus_bpe_docs, _MIX_BPE_ORACLE),
    QuerySpec("packed_chunks_bpe", packed_chunks_bpe, _PACKED_BPE_ORACLE),
    QuerySpec("bpe_merges_incremental", bpe_merges_incremental, _MERGES_ORACLE),
    QuerySpec("bpe_merges_streaming", bpe_merges_streaming, _MERGES_ORACLE),
]
