"""The end-to-end corpus-build pipeline, composed from the individually
oracle-checked stages and registered as ONE value-oracled query.

Every training-corpus build runs (a variant of) this chain; each stage is
green on its own, but composition is where real pipelines break — schema
drift between stages, dedup-ordering interactions, filters that starve a
downstream stage. This module is the whole-cascade test of the LLM-pipeline
pillar, the corpus-scale analog of the reference's full micro-batch cascade
test (`3-microBatch.test.ts:116-169`, which drives ingest -> state ->
changelog -> finalize end-to-end rather than asserting each table alone).

Stage order (and the composition constraint that dictates it):

1. **paragraph dedup** (`operators.dedup.dedup_paragraphs`) on the RAW
   text. It must run before normalization: `normalize_text` collapses all
   whitespace runs — including newlines — to single spaces, so a
   normalized document has exactly one "paragraph" and paragraph dedup
   degenerates to exact dedup. Discovered by composing the stages; the
   kind of bug no per-stage test can see.
2. **normalize** (`operators.text.normalize_text`): tag-strip, whitespace
   collapse, trim, lowercase of the paragraph-deduped text.
3. **drop empty docs**: boilerplate-only documents come back empty from
   stage 1; removing them here also keeps stage 4 from merging unrelated
   all-boilerplate docs into one arbitrary survivor.
4. **exact dedup** (`operators.dedup.exact_dedup`) on the normalized text
   (post-lowercase, so case variants collapse). One hash shuffle.
5. **near-dup groups** (`operators.dedup.minhash_lsh_pairs` ->
   `operators.components.dedup_groups`): MinHash-LSH banding (the scale
   path) -> connected components -> keep only each group's representative.
6. **decontamination** (`operators.sampling.train_test_split` +
   `operators.dedup.decontaminate`): hold out a deterministic 10% eval
   split of the SURVIVING corpus, drop every training doc sharing a word
   5-gram with it. Holding out after dedup mirrors real eval-set hygiene:
   a near-dup of an eval doc cannot survive in train via its duplicate.
7. **quality filter**: heuristic quality >= 0.5 and 10..5000 tokens
   (drops ~8-10% of survivors on the corpus while keeping every language
   stratum alive).
   Deliberately NO language clause — the language balance is the next
   stage's job, and an en-only filter would starve the mixture.
8. **mixture** (`operators.sampling.mix_corpus`): re-weight languages to
   the target proportions; up-sampled docs gain whole-epoch copies.
9. **chunk** (`operators.text.chunk_documents`): 128-token windows,
   stride 64 — chunked ONCE per distinct doc, then replicated per epoch
   with a thin (doc_id, epoch) join. At scale this is the difference
   between tokenizing the corpus once and tokenizing it rate× times.
10. **pack** (`operators.packing.pack_chunks`): greedy 512-token sequence
    packing, sharded doc_id % 8, ordered (doc_id, epoch, chunk_idx).

Scale shape: stages 1-8 are the documented shapes of their operators (all
bucketed/banded/map-only — nothing quadratic); the two persist() barriers
pin the exact-deduped corpus (consumed by the LSH self-join, the component
iteration, and the split) and the filtered corpus (consumed by the mixture
count, the expansion, and the chunker) so the upstream chain executes once,
not once per consumer.

The DuckDB oracle replays the full chain as one WITH RECURSIVE CTE stack —
every fragment lifted from the already-green per-stage oracles, re-rooted
on the previous stage's CTE instead of the base table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.components import dedup_groups
from ..operators.dedup import (
    decontaminate,
    dedup_paragraphs,
    exact_dedup,
    minhash_lsh_pairs,
)
from ..operators.packing import pack_chunks
from ..operators.sampling import mix_corpus, train_test_split
from ..operators.text import (
    chunk_documents,
    normalize_text,
    quality_score,
    tokens,
)
from ..sources import load_table
from .registry import QuerySpec


def corpus_pipeline_stages(
    docs: DataFrame,
    *,
    mix_weights: dict[str, float],
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    eval_fraction: float = 0.1,
    quality_min: float = 0.5,
    min_tokens: int = 10,
    max_tokens: int = 5000,
    chunk_tokens: int = 128,
    stride: int = 64,
    capacity: int = 512,
    shards: int = 8,
    quality_gate=None,
) -> dict[str, DataFrame]:
    """Run the full corpus build (module docstring) and return every
    stage's output DataFrame, in stage order — 'packed' is the final
    product; the rest power per-stage reporting/debugging
    (:func:`corpus_pipeline_report`)."""
    # 1. paragraph dedup needs the raw line structure (see module doc)
    para = dedup_paragraphs(docs, text_col=text_col, id_col=id_col)
    # 2-3. normalize, drop boilerplate-only (now empty) docs, re-attach
    # the language label with a thin id-keyed join. Persist BEFORE the
    # exact-dedup semi-join: both join sides consume this frame, and
    # without the barrier the whole paragraph-dedup + normalize chain
    # executes once PER SIDE (observed: 6 scans of the documents
    # parquet and 3 paragraph Generates in the stage-4 plan; guide §2.4
    # — the duplicated subtree was the pipeline's hidden second corpus
    # pass).
    norm0 = (
        para.select(id_col, normalize_text("clean_text").alias(text_col))
        .filter(F.length(text_col) > 0)
        .join(docs.select(id_col, lang_col), id_col)
        .persist()
    )
    # 4. exact dedup on the normalized text; stage the token arrays on
    # the surviving barrier — every downstream token consumer (LSH
    # shingles, decontamination shingles, the quality length gate, the
    # chunker) derives from ``_toks`` instead of re-running the
    # tokenizer per stage (tokens() is deterministic: same text, same
    # arrays, bit-identical results).
    norm = norm0.join(exact_dedup(norm0, text_col, id_col), id_col, "left_semi")
    norm = norm.withColumn("_toks", tokens(text_col))
    norm = norm.persist()  # barrier: LSH self-join + components + split all read this
    # 5. near-dup groups -> representatives only
    pairs = minhash_lsh_pairs(
        norm, text_col=text_col, id_col=id_col, n=3, k=64, bands=32,
        threshold=0.8, tokens_col="_toks",
    )
    reps = dedup_groups(norm, pairs, id_col=id_col).filter("keep").select(id_col)
    survivors = norm.join(reps, id_col, "left_semi")
    # 6. hold out eval split, decontaminate train against it. NOTE the
    # scale caveat: this self-holdout eval is PROPORTIONAL to the corpus,
    # while ngram_contamination's unconditional eval-gram broadcast
    # assumes a fixed-size eval suite — at true 100 TB a deployment passes
    # its real (fixed) benchmark set here instead of a fractional split.
    # For the same reason the hit table (contaminated docs, also
    # corpus-proportional under a fractional holdout) is NOT
    # broadcast-hinted: AQE broadcasts it only when it is actually small.
    split = train_test_split(survivors, eval_fraction, key_col=id_col)
    train = split.filter(F.col("split") == "train").drop("split")
    evals = split.filter(F.col("split") == "test").drop("split")
    clean = decontaminate(
        train, evals, text_col=text_col, id_col=id_col, n=5, min_common=1,
        broadcast_hits=False, tokens_col="_toks",
    )
    # 7. quality gate (no language clause — mixture owns the balance).
    # ``quality_gate`` swaps the heuristic for an alternative filter
    # (e.g. the learned NB scorer, quality_nb_queries) — it receives the
    # decontaminated train docs and returns the kept subset with the
    # same columns; length bounds are the gate's responsibility so a
    # learned gate can own its whole keep policy.
    if quality_gate is not None:
        filtered = quality_gate(clean)
    else:
        # token_count(text) == size(tokens(text)) == size(_toks) — the
        # length bound reads the staged arrays instead of re-tokenizing
        filtered = clean.filter(
            (quality_score(text_col) >= quality_min)
            & F.size("_toks").between(min_tokens, max_tokens)
        )
    filtered = filtered.persist()  # barrier: mixture count + expansion + chunker
    # 8. language mixture: (doc_id, epoch) copies
    epochs = mix_corpus(
        filtered, mix_weights, strata_col=lang_col, key_col=id_col
    ).select(id_col, "epoch")
    # 9. chunk each distinct doc once, replicate per epoch (thin join)
    chunks = chunk_documents(
        filtered, text_col=text_col, id_col=id_col,
        chunk_tokens=chunk_tokens, stride=stride, tokens_col="_toks",
    )
    echunks = chunks.join(epochs, id_col).select(
        id_col, "epoch", "chunk_idx", "n_chunk_tokens"
    )
    # 10. greedy sequence packing, epoch-aware order within doc_id % shards
    packed = pack_chunks(
        echunks, capacity=capacity, key_col=id_col,
        order_cols=(id_col, "epoch", "chunk_idx"), shards=shards,
    ).select(id_col, "epoch", "chunk_idx", "n_chunk_tokens", "shard", "seq_id")
    return {
        "raw_docs": docs,
        "exact_deduped": norm,  # the stages 1-4 persisted barrier
        "neardup_survivors": survivors,
        "train_split": train,
        "decontaminated": clean,
        "quality_filtered": filtered,
        "mixture_rows": epochs,
        "chunks": chunks,
        "epoch_chunks": echunks,
        "packed": packed,
    }


def corpus_pipeline(docs: DataFrame, **kwargs) -> DataFrame:
    """The packed training chunks of the full corpus build — see
    :func:`corpus_pipeline_stages` for the per-stage surface."""
    return corpus_pipeline_stages(docs, **kwargs)["packed"]


def corpus_pipeline_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The registered end-to-end corpus build over the documents table."""
    from .llm import _MIX_WEIGHTS

    return corpus_pipeline(
        load_table(spark, sf_dir, "documents"), mix_weights=_MIX_WEIGHTS
    )


def corpus_pipeline_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage row counts of the corpus build — the run report every
    production pipeline logs (how many docs each gate dropped, how many
    epoch copies the mixture added, how many training sequences came
    out). One row per stage, stage-indexed for stable ordering; the
    oracle re-counts the same stages from the shared CTE stack, so a
    composition change anywhere in the chain breaks BOTH the packed
    output query and this report. Cost: the stage counts reuse the two
    persisted barriers, so the chain still executes once."""
    from .llm import _MIX_WEIGHTS

    stages = corpus_pipeline_stages(
        load_table(spark, sf_dir, "documents"), mix_weights=_MIX_WEIGHTS
    )
    report_stages = [
        ("raw_docs", stages["raw_docs"]),
        ("neardup_survivors", stages["neardup_survivors"]),
        ("decontaminated", stages["decontaminated"]),
        ("quality_filtered", stages["quality_filtered"]),
        ("mixture_rows", stages["mixture_rows"]),
        ("epoch_chunks", stages["epoch_chunks"]),
        ("packed_sequences", stages["packed"].select("shard", "seq_id").distinct()),
    ]
    out = None
    for i, (name, df) in enumerate(report_stages):
        row = df.agg(
            F.lit(i).alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# --- the full-chain DuckDB oracle ---------------------------------------------

_WS = r"[ \t\n\x0B\f\r]"  # Java \s, written out (RE2 \s excludes \x0B)
_LINE_WS = r"[ \t\x0B\f\r]"  # line-trim class: every Java \s char except \n


def _toks(col: str) -> str:
    """Whitespace tokenization of ``col`` (tokens()' exact semantics)."""
    return (
        f"CASE WHEN regexp_replace({col}, '^{_WS}+|{_WS}+$', '', 'g') = '' "
        f"THEN []::VARCHAR[] "
        f"ELSE string_split_regex("
        f"regexp_replace({col}, '^{_WS}+|{_WS}+$', '', 'g'), '{_WS}+') END"
    )


def _shingles(toks: str, n: int) -> str:
    """Distinct word n-gram strings of a token array (shingled_docs)."""
    return (
        f"list_distinct(CASE WHEN len({toks}) = 0 THEN []::VARCHAR[] "
        f"WHEN len({toks}) < {n} THEN [array_to_string({toks}, ' ')] "
        f"ELSE [array_to_string({toks}[i:i+{n - 1}], ' ') "
        f"FOR i IN range(1, len({toks}) - {n - 2})] END)"
    )


def _normalize(col: str) -> str:
    """normalize_text: tag-strip -> ws-collapse -> trim -> lowercase."""
    return (
        f"lower(trim(regexp_replace(regexp_replace({col}, '<[^>]*>', ' ', 'g'), "
        f"'{_WS}+', ' ', 'g')))"
    )


def _corpus_pipeline_ctes(
    mix_weights: dict[str, float], filt_sql: str | None = None
) -> str:
    """The shared WITH RECURSIVE stack (stages 1-10 as CTEs) — composed
    with a final SELECT by the packed-output and report oracles, so both
    replay the identical chain.

    ``filt_sql``: optional replacement for the stage-7 CTE block — it
    must end by defining ``filt(doc_id, lang, t, n_tokens)`` over the
    ``clean`` CTE (the oracle twin of the ``quality_gate`` parameter;
    quality_nb_queries splices the NB retraining chain here)."""
    mix_values = ",\n".join(f"  ('{s}', {w!r})" for s, w in mix_weights.items())
    wsum = repr(sum(mix_weights.values()))
    if filt_sql is None:
        filt_sql = f"""
-- stage 7: quality gate (quality >= 0.5, 10..5000 tokens; no lang clause)
q AS (
  SELECT doc_id, lang, text, {_toks("text")} AS t FROM clean
),
filt AS MATERIALIZED (
  SELECT doc_id, lang, t, len(t) AS n_tokens
  FROM q
  WHERE len(t) BETWEEN 10 AND 5000
    AND round((least(CAST(len(t) AS DOUBLE) / 50.0, 1.0)
         + (1.0 - least((CASE WHEN length(text) = 0 THEN 0.0
                ELSE CAST(length(text) - length(regexp_replace(text, '[^\\w{_WS[1:]}', '', 'g')) AS DOUBLE)
                     / length(text) END) * 5, 1.0))
         + least((CASE WHEN len(t) = 0 THEN 0.0
                ELSE CAST(len(list_filter(t, x -> lower(x) IN
                       ('the','and','of','to','is','you','that','it'))) AS DOUBLE)
                     / len(t) END) * 4, 1.0)) / 3.0, 6) >= 0.5
)"""
    return f"""
WITH RECURSIVE
-- stage 1: paragraph dedup on raw text (first occurrence by (doc, pos))
p_tok AS (
  SELECT doc_id,
         list_filter(
           list_transform(string_split(text, chr(10)),
                          x -> regexp_replace(x, '^{_LINE_WS}+|{_LINE_WS}+$', '', 'g')),
           x -> x != '') AS l
  FROM documents
),
p_paras AS (
  SELECT doc_id, unnest(range(1, len(l) + 1)) - 1 AS pos, unnest(l) AS p
  FROM p_tok
),
p_kept AS (
  SELECT doc_id, pos, p,
         row_number() OVER (PARTITION BY md5(p) ORDER BY doc_id, pos) AS rn
  FROM p_paras
),
p_rebuilt AS MATERIALIZED (
  SELECT doc_id, string_agg(p, chr(10) ORDER BY pos) AS clean_text
  FROM p_kept WHERE rn = 1 GROUP BY doc_id
),
-- stages 2-3: normalize, drop emptied docs, re-attach lang
nz AS MATERIALIZED (
  SELECT d.doc_id, d.lang, {_normalize("r.clean_text")} AS text
  FROM documents d JOIN p_rebuilt r ON r.doc_id = d.doc_id
  WHERE {_normalize("r.clean_text")} != ''
),
-- stage 4: exact dedup (min id per normalized text)
ex AS (SELECT min(doc_id) AS doc_id FROM nz GROUP BY md5(text)),
exd AS MATERIALIZED (SELECT n.* FROM nz n JOIN ex USING (doc_id)),
-- stage 5: near-dup components over the exact-Jaccard >= 0.8 pair graph
-- (== the MinHash-LSH graph: banding recall at J>=0.8 is 1 - 1e-14)
g_sh AS (SELECT doc_id, {_shingles(_toks("text"), 3)} AS sh FROM exd),
g_post AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS g FROM g_sh),
g_pairs AS MATERIALIZED (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM g_post a JOIN g_post b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2, a.n, b.n
  HAVING CAST(count(*) AS DOUBLE) / (a.n + b.n - count(*)) >= 0.8
),
g_edges AS (
  SELECT id_a AS u, id_b AS v FROM g_pairs
  UNION SELECT id_b, id_a FROM g_pairs
),
g_reach(node, r) AS (
  SELECT doc_id, doc_id FROM exd
  UNION
  SELECT g_reach.node, e.v FROM g_reach JOIN g_edges e ON g_reach.r = e.u
),
g_keep AS (SELECT node AS doc_id FROM g_reach GROUP BY node HAVING min(r) = node),
surv AS (SELECT e.* FROM exd e JOIN g_keep USING (doc_id)),
-- stage 6: deterministic 10% eval holdout + 5-gram decontamination
sp AS MATERIALIZED (
  SELECT *, CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '19999999'
                 THEN 'test' ELSE 'train' END AS split
  FROM surv
),
c_sh AS MATERIALIZED (SELECT doc_id, split, {_shingles(_toks("text"), 5)} AS sh FROM sp),
c_eval AS (SELECT DISTINCT unnest(sh) AS g FROM c_sh WHERE split = 'test'),
c_bad AS (
  SELECT DISTINCT p.doc_id
  FROM (SELECT doc_id, unnest(sh) AS g FROM c_sh WHERE split = 'train') p
  JOIN c_eval e ON p.g = e.g
),
clean AS (
  SELECT doc_id, lang, text FROM sp
  WHERE split = 'train' AND doc_id NOT IN (SELECT doc_id FROM c_bad)
),
{filt_sql},
-- stage 8: language mixture -> (doc_id, epoch) copies
m_w(s, wt) AS (VALUES
{mix_values}
),
m_counts AS (SELECT lang AS s, count(*) AS n_s FROM filt GROUP BY lang),
m_total AS (SELECT CAST(sum(n_s) AS DOUBLE) AS t FROM m_counts JOIN m_w USING (s)),
m_rates AS (
  SELECT s, (t * wt / {wsum}) / n_s AS rate
  FROM m_counts JOIN m_w USING (s), m_total
),
m_exp AS (
  SELECT f.doc_id,
         CAST(floor(r.rate) AS INT)
         + CASE WHEN substring(md5(CAST(f.doc_id AS VARCHAR) || ':' || f.lang), 1, 8)
                     < lpad(lower(hex(CAST(floor((r.rate - floor(r.rate)) * 4294967296.0) AS BIGINT))), 8, '0')
                THEN 1 ELSE 0 END AS n_copies
  FROM filt f JOIN m_rates r ON f.lang = r.s
),
epochs AS MATERIALIZED (
  SELECT doc_id, CAST(unnest(range(0, n_copies)) AS INT) AS epoch
  FROM m_exp WHERE n_copies >= 1
),
-- stage 9: 128-token stride-64 chunks, chunked once then joined to epochs
chunks AS (
  SELECT doc_id,
         CAST(s // 64 AS INTEGER) AS chunk_idx,
         CAST(len(t[s + 1 : s + 128]) AS INTEGER) AS n_chunk_tokens
  FROM (SELECT doc_id, t, unnest(range(0, len(t), 64)) AS s
        FROM filt WHERE len(t) > 0)
),
echunks AS (
  SELECT c.doc_id, e.epoch, c.chunk_idx, c.n_chunk_tokens,
         CAST(c.doc_id % 8 AS INTEGER) AS shard
  FROM chunks c JOIN epochs e ON c.doc_id = e.doc_id
),
-- stage 10: greedy 512-token packing per shard, order (doc, epoch, chunk)
ordered AS MATERIALIZED (
  SELECT *, row_number() OVER (PARTITION BY shard
                               ORDER BY doc_id, epoch, chunk_idx) AS rn
  FROM echunks
),
pack(shard, rn, doc_id, epoch, chunk_idx, n_chunk_tokens, seq_id, fill) AS (
  SELECT shard, rn, doc_id, epoch, chunk_idx, n_chunk_tokens, 0, n_chunk_tokens
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT c.shard, c.rn, c.doc_id, c.epoch, c.chunk_idx, c.n_chunk_tokens,
         CASE WHEN p.fill + c.n_chunk_tokens > 512
              THEN p.seq_id + 1 ELSE p.seq_id END,
         CASE WHEN p.fill + c.n_chunk_tokens > 512
              THEN c.n_chunk_tokens ELSE p.fill + c.n_chunk_tokens END
  FROM pack p JOIN ordered c ON c.shard = p.shard AND c.rn = p.rn + 1
)
"""


def _pipeline_oracle() -> str:
    from .llm import _MIX_WEIGHTS

    return _corpus_pipeline_ctes(_MIX_WEIGHTS) + """
SELECT doc_id, epoch, chunk_idx, n_chunk_tokens, shard,
       CAST(seq_id AS INTEGER) AS seq_id
FROM pack
"""


def _report_oracle() -> str:
    from .llm import _MIX_WEIGHTS

    return _corpus_pipeline_ctes(_MIX_WEIGHTS) + """
SELECT CAST(stage_idx AS INT) AS stage_idx, stage, n_rows FROM (
            SELECT 0 AS stage_idx, 'raw_docs' AS stage, count(*) AS n_rows FROM documents
  UNION ALL SELECT 1, 'neardup_survivors', count(*) FROM surv
  UNION ALL SELECT 2, 'decontaminated', count(*) FROM clean
  UNION ALL SELECT 3, 'quality_filtered', count(*) FROM filt
  UNION ALL SELECT 4, 'mixture_rows', count(*) FROM epochs
  UNION ALL SELECT 5, 'epoch_chunks', count(*) FROM echunks
  UNION ALL SELECT 6, 'packed_sequences', count(*)
            FROM (SELECT DISTINCT shard, seq_id FROM pack)
)
"""


QUERIES = [
    QuerySpec("corpus_pipeline_docs", corpus_pipeline_docs, _pipeline_oracle(), headline=True),
    QuerySpec("corpus_pipeline_report", corpus_pipeline_report, _report_oracle()),
]
