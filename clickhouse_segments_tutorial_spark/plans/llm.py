"""LLM-data-pipeline queries (SURVEY.md §2.5 / BASELINE north star):
dedup, similarity search, text analysis, multimodal plumbing — over the
`documents` and `embeddings` corpus tables.

Oracle notes:
- cosine similarity is bit-identical between Spark's zip_with/aggregate
  double fold and DuckDB's list_cosine_similarity on DOUBLE[] (verified
  499/499 exact on the corpus) — so similarity queries get full value
  oracles.
- MinHash-LSH and SimHash are sketch algorithms with no SQL equivalent;
  MinHash output is oracle-checked anyway because its verify stage makes
  output = {exact-Jaccard pairs >= t} whenever banding recall is 1 (tested
  at sf0.01/sf0.1 in tests/test_dedup.py); SimHash stays rows-only.
- ratios are int/int single double divisions; fingerprints are md5 —
  identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

import os
import tempfile

from ..operators.components import dedup_groups
from ..operators.corpus_stats import bigram_nll, tfidf_top_terms
from ..operators.dedup import (
    dedup_paragraphs,
    duplicate_spans,
    strip_duplicate_spans,
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    ngram_contamination,
    simhash_pairs,
)
from ..operators.multimodal import documents_as_media, extract_features
from ..operators.sampling import mix_corpus, stratified_sample, train_test_split
from ..operators.pq import ivfpq_topk
from ..operators.similarity import (
    cosine_pairs,
    cosine_topk,
    ivf_build_index,
    ivf_probe_index,
    quantize_embeddings,
    quantized_cosine_topk,
    srp_build_index,
    srp_probe_index,
)
from ..operators.text import (
    GOPHER_DUP_BIGRAM_DENOM,
    GOPHER_MAX_MWL,
    GOPHER_MAX_WORDS,
    GOPHER_MIN_MWL,
    GOPHER_MIN_STOPWORDS,
    GOPHER_MIN_WORDS,
    GOPHER_STOPWORDS,
    PII_PATTERNS,
    chunk_documents,
    gopher_quality,
    normalize_text,
    quality_score,
    redact_pii,
    repetition_stats,
    text_stats,
    token_count,
    top_ngrams,
)
from ..sources.catalog import load_table
from .registry import QuerySpec


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- dedup ---------------------------------------------------------------------

# MinHash-LSH near-dup operating point, ONE definition site shared by the
# batch query, the exact-Jaccard oracle twin, and the incremental /
# streaming twins in plans/curation.py (the SEM_* shared-constants rule:
# query and twins cannot desync).
MH_SHINGLE_N = 3
MH_K = 64
MH_BANDS = 32
MH_THRESHOLD = 0.8


def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(_t(spark, sf_dir, "documents"))


_DEDUP_EXACT_ORACLE = """
SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
"""


def jaccard_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard pairs — the documented quadratic ORACLE path
    (allow_quadratic acknowledged; the scale twin with the same output and
    oracle is minhash_near_dup_pairs)."""
    return jaccard_pairs(
        _t(spark, sf_dir, "documents"),
        n=MH_SHINGLE_N,
        threshold=MH_THRESHOLD,
        allow_quadratic=True,
    )


_JACCARD_ORACLE = f"""
WITH docs AS (
  SELECT doc_id,
         list_distinct(
           CASE WHEN len(t) = 0 THEN []::VARCHAR[]
                WHEN len(t) < {MH_SHINGLE_N} THEN [array_to_string(t, ' ')]
                ELSE [array_to_string(t[i:i+{MH_SHINGLE_N - 1}], ' ')
                      FOR i IN range(1, len(t) - {MH_SHINGLE_N - 2})]
           END
         ) AS sh
  FROM (
    SELECT doc_id,
           CASE WHEN regexp_replace(text, '^[ \\t\\n\\x0B\\f\\r]+|[ \\t\\n\\x0B\\f\\r]+$', '', 'g') = ''
                THEN []::VARCHAR[]
                ELSE string_split_regex(
                       regexp_replace(text, '^[ \\t\\n\\x0B\\f\\r]+|[ \\t\\n\\x0B\\f\\r]+$', '', 'g'), '[ \\t\\n\\x0B\\f\\r]+')
           END AS t
    FROM documents
  )
),
posting AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS g FROM docs),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS n_a, b.n AS n_b, count(*) AS n_common
  FROM posting a JOIN posting b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT id_a, id_b,
       round(CAST(n_common AS DOUBLE) / (n_a + n_b - n_common), 6) AS jaccard
FROM common
WHERE CAST(n_common AS DOUBLE) / (n_a + n_b - n_common) >= {MH_THRESHOLD}
"""


def minhash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash k=64, 32 bands x 2 rows, exact-Jaccard verified at 0.8.

    Banding recall at J>=0.8: 1-(1-0.64)^32 ≈ 1-1e-14 — tested exhaustively
    equal to jaccard_near_dup_pairs on this corpus, hence the shared oracle.
    """
    return minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"),
        n=MH_SHINGLE_N,
        k=MH_K,
        bands=MH_BANDS,
        threshold=MH_THRESHOLD,
    )


def simhash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash with the 60-bit engine-portable signature (md5-derived
    shingle hashes), Hamming <= 3 via pigeonhole banding (4 chunks x 15
    bits). The DuckDB oracle replays every vote, bit, band key, and the
    final Hamming filter — flipping this query from rows-only to
    value-checked. pytest additionally verifies the banding against
    brute-force Hamming on both hash modes."""
    return simhash_pairs(
        _t(spark, sf_dir, "documents"), n=3, max_distance=3, hash_mode="md5"
    )


# Replays simhash_pairs(hash_mode='md5') exactly: same tokens/shingles as
# _JACCARD_ORACLE, 60-bit hash = first 15 md5 hex chars (positive bigint,
# so >> and & behave identically to Spark's shiftright/bitwiseAND), one
# ±1 vote per (shingle, bit), sign -> signature, 4x15-bit pigeonhole bands,
# exact bit_count(xor) verification.
_SIMHASH_ORACLE = """
WITH docs AS (
  SELECT doc_id,
         list_distinct(
           CASE WHEN len(t) = 0 THEN []::VARCHAR[]
                WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                ELSE [array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t) - 1)]
           END
         ) AS sh
  FROM (
    SELECT doc_id,
           CASE WHEN regexp_replace(text, '^[ \\t\\n\\x0B\\f\\r]+|[ \\t\\n\\x0B\\f\\r]+$', '', 'g') = ''
                THEN []::VARCHAR[]
                ELSE string_split_regex(
                       regexp_replace(text, '^[ \\t\\n\\x0B\\f\\r]+|[ \\t\\n\\x0B\\f\\r]+$', '', 'g'), '[ \\t\\n\\x0B\\f\\r]+')
           END AS t
    FROM documents
  )
),
posting AS (
  SELECT doc_id, ('0x' || substr(md5(unnest(sh)), 1, 15))::BIGINT AS h
  FROM docs
),
votes AS (
  SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM posting CROSS JOIN range(60) bits(b)
  GROUP BY doc_id, b
),
sigs AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS sig
  FROM votes GROUP BY doc_id
),
banded AS (
  SELECT doc_id, sig, c, (sig >> CAST(c * 15 AS INTEGER)) & 32767 AS key
  FROM sigs CROSS JOIN range(4) chunks(c)
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.c = b.c AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       CAST(bit_count(xor(sa.sig, sb.sig)) AS INTEGER) AS hamming
FROM pairs
JOIN sigs sa ON sa.doc_id = pairs.id_a
JOIN sigs sb ON sb.doc_id = pairs.id_b
WHERE bit_count(xor(sa.sig, sb.sig)) <= 3
"""


def dedup_groups_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup GROUPS: MinHash-LSH pairs (the scale path — banding recall
    is 1 at J>=0.8, proven identical to exact Jaccard on this corpus) ->
    alternating large-star/small-star connected components -> every doc's
    canonical representative + keep flag. filter('keep') IS the deduped
    corpus; the oracle re-derives components with a recursive CTE over the
    exact-Jaccard pair graph."""
    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, n=3, k=64, bands=32, threshold=0.8)
    return dedup_groups(docs, pairs)


_DEDUP_GROUPS_ORACLE = """
WITH RECURSIVE docs AS (
  SELECT doc_id,
         list_distinct(
           CASE WHEN len(t) = 0 THEN []::VARCHAR[]
                WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                ELSE [array_to_string(t[i:i+2], ' ') FOR i IN range(1, len(t) - 1)]
           END
         ) AS sh
  FROM (
    SELECT doc_id,
           CASE WHEN regexp_replace(text, '^[ \\t\\n\\x0B\\f\\r]+|[ \\t\\n\\x0B\\f\\r]+$', '', 'g') = ''
                THEN []::VARCHAR[]
                ELSE string_split_regex(
                       regexp_replace(text, '^[ \\t\\n\\x0B\\f\\r]+|[ \\t\\n\\x0B\\f\\r]+$', '', 'g'), '[ \\t\\n\\x0B\\f\\r]+')
           END AS t
    FROM documents
  )
),
posting AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS g FROM docs),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM posting a JOIN posting b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2, a.n, b.n
  HAVING CAST(count(*) AS DOUBLE) / (a.n + b.n - count(*)) >= 0.8
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT reach.node, e.v FROM reach JOIN edges e ON reach.r = e.u
)
SELECT node AS doc_id, min(r) AS rep_id, min(r) = node AS keep
FROM reach GROUP BY node
"""


def sample_docs_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash stratified sample: 50% of 'en' docs, 20%
    of each other language — keyed on md5(doc_id), so the kept set is
    invariant to partitioning/reruns and exactly reproducible in SQL."""
    return stratified_sample(
        _t(spark, sf_dir, "documents"),
        {"en": 0.5, "de": 0.2, "fr": 0.2, "es": 0.2},
        strata_col="lang",
        key_col="doc_id",
    ).select("doc_id", "lang")


_SAMPLE_ORACLE = """
SELECT doc_id, lang
FROM documents
WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
      CASE lang WHEN 'en' THEN '80000000'
                WHEN 'de' THEN '33333333'
                WHEN 'fr' THEN '33333333'
                WHEN 'es' THEN '33333333'
                ELSE '00000000' END
"""


def train_test_split_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% held-out split keyed on md5(doc_id): the same doc
    lands in the same split on every run and engine — no leakage when the
    corpus is re-ingested or extended."""
    return train_test_split(
        _t(spark, sf_dir, "documents"), 0.1, key_col="doc_id"
    ).select("doc_id", "split")


_SPLIT_ORACLE = """
SELECT doc_id,
       CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '19999999'
            THEN 'test' ELSE 'train' END AS split
FROM documents
"""


def top_bigrams_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 most frequent word bigrams per language (boilerplate / corpus
    vocabulary report). Ties break on the bigram string."""
    return top_ngrams(_t(spark, sf_dir, "documents"), n=2, k=5, group_col="lang")


_TOP_NGRAMS_ORACLE = """
WITH base AS (
  SELECT lang,
         CASE WHEN regexp_replace(text, '^[ \\t\\n\\x0B\\f\\r]+|[ \\t\\n\\x0B\\f\\r]+$', '', 'g') = ''
              THEN []::VARCHAR[]
              ELSE string_split_regex(
                     regexp_replace(text, '^[ \\t\\n\\x0B\\f\\r]+|[ \\t\\n\\x0B\\f\\r]+$', '', 'g'), '[ \\t\\n\\x0B\\f\\r]+')
         END AS t
  FROM documents
),
grams AS (
  SELECT lang,
         unnest(CASE WHEN len(t) < 2 THEN []::VARCHAR[]
                     ELSE [array_to_string(t[i:i+1], ' ') FOR i IN range(1, len(t))]
                END) AS ngram
  FROM base
),
counts AS (
  SELECT lang, ngram, count(*) AS n_occurrences FROM grams GROUP BY 1, 2
)
SELECT lang, ngram, n_occurrences, rank FROM (
  SELECT lang, ngram, n_occurrences,
         CAST(row_number() OVER (PARTITION BY lang
                                 ORDER BY n_occurrences DESC, ngram ASC)
              AS INTEGER) AS rank
  FROM counts
) WHERE rank <= 5
"""


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window 128-token chunks with stride 64 over every document
    (LLM context-window preprocessing); chunk_fp (md5 of the chunk text)
    makes the full output value-comparable."""
    return chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_tokens=128, stride=64
    )


_CHUNKS_ORACLE = """
WITH base AS (
  SELECT doc_id,
         CASE WHEN regexp_replace(text, '^[ \\t\\n\\x0B\\f\\r]+|[ \\t\\n\\x0B\\f\\r]+$', '', 'g') = ''
              THEN []::VARCHAR[]
              ELSE string_split_regex(
                     regexp_replace(text, '^[ \\t\\n\\x0B\\f\\r]+|[ \\t\\n\\x0B\\f\\r]+$', '', 'g'), '[ \\t\\n\\x0B\\f\\r]+')
         END AS t
  FROM documents
),
starts AS (
  SELECT doc_id, t, unnest(range(0, len(t), 64)) AS s FROM base WHERE len(t) > 0
)
SELECT doc_id,
       CAST(s // 64 AS INTEGER) AS chunk_idx,
       CAST(len(t[s + 1 : s + 128]) AS INTEGER) AS n_chunk_tokens,
       md5(array_to_string(t[s + 1 : s + 128], ' ')) AS chunk_fp
FROM starts
"""


# --- similarity search -----------------------------------------------------------


def _probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("_probe"))


def knn_cosine_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 cosine neighbors of vec_id 0 (probe folded in via a
    broadcast cross join, so the scan side never moves)."""
    from ..operators.similarity import cosine

    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") != 0)
    return (
        emb.crossJoin(F.broadcast(_probe(spark, sf_dir)))
        .select(
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("_probe")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


_KNN_ORACLE = """
SELECT e.vec_id,
       round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    CAST(p.embedding AS DOUBLE[])), 6) AS cos_sim
FROM embeddings e
CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) p
WHERE e.vec_id != 0
ORDER BY cos_sim DESC, e.vec_id ASC
LIMIT 10
"""


# Persisted ANN indexes, built ONCE per (kind, source-table identity) per
# process — the pay-once index-build / pruned-probe shape that matters at
# 100 TB (retraining the quantizer or recomputing corpus signatures per
# query is the scale anti-pattern the inline operators demo against).
# The cache key carries the source parquet's (path, mtime, size) stamp: a
# table regenerated in-process changes the stamp, so the stale index is
# wiped and rebuilt instead of silently served; superseded dirs are
# removed on rebuild and every dir is removed atexit (repeated runs no
# longer leak /tmp state — round-2 ADVICE).
_ANN_INDEX: dict[tuple, tuple[str, object]] = {}


def _table_stamp(sf_dir: str, name: str) -> tuple:
    p = os.path.join(sf_dir, f"{name}.parquet")
    try:
        st = os.stat(p)
        return (p, st.st_mtime_ns, st.st_size)
    except OSError:
        return (p, 0, 0)


def _ann_index(kind: str, sf_dir: str, build) -> tuple[str, object]:
    import atexit
    import shutil

    key = (kind, _table_stamp(sf_dir, "embeddings"))
    if key not in _ANN_INDEX:
        stale = [
            k for k in _ANN_INDEX
            if k[0] == kind and k[1][0] == key[1][0] and k != key
        ]
        for k in stale:
            shutil.rmtree(_ANN_INDEX.pop(k)[0], ignore_errors=True)
        path = tempfile.mkdtemp(prefix=f"{kind}_index_")
        atexit.register(shutil.rmtree, path, ignore_errors=True)
        meta = build(path)
        _ANN_INDEX[key] = (path, meta)
    return _ANN_INDEX[key]


def _ivf_index(spark: SparkSession, sf_dir: str) -> tuple[str, object]:
    return _ann_index(
        "ivf",
        sf_dir,
        lambda path: ivf_build_index(
            _t(spark, sf_dir, "embeddings"), path, n_centroids=128,
            portable=True, spill=2,
        ),
    )


def _srp_index(spark: SparkSession, sf_dir: str) -> tuple[str, object]:
    return _ann_index(
        "srp",
        sf_dir,
        lambda path: srp_build_index(
            _t(spark, sf_dir, "embeddings"), path, n_planes=126
        ),
    )


def ann_srp_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via sign-random-projection signatures over a
    PERSISTED index (built once per process): thin signature scan -> top
    20% of ids by Hamming distance (deterministic, ties on id) -> clustered
    vector fetch -> exact-cosine re-rank. Row-identical to inline srp_topk.

    The signature is integer-exact (quantized ±1 planes from md5 bits), so
    the DuckDB oracle replays every bit; measured mean top-10 recall ~0.85
    on this near-random corpus (the 20 fixed probes of
    tests/test_operators.py), vs 0.74 at 41% scanned for the round-2
    Gaussian Hamming ball."""
    path, meta = _srp_index(spark, sf_dir)
    probe = [r["_probe"] for r in _probe(spark, sf_dir).collect()][0]
    return srp_probe_index(
        spark, path, meta, list(probe), k=10, candidate_fraction=0.2, exclude_id=0
    )


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via a PERSISTED IVF index in its engine-portable
    configuration: md5-ordered sampled centroids (no Lloyd — float
    averages are not bit-portable), round-6 cosine rank assignment with
    spill=2 multi-assignment (each vector indexed under its top-2 lists —
    boundary vectors, the ones quantization loses, sit in BOTH their
    nearby lists), vectors partitioned by inverted list; each probe scans
    the 24 nearest of 128 list partitions (~33% of the spilled corpus,
    directory-pruned — PartitionFilters asserted in
    tests/test_operators.py) and dedups candidates by id. The DuckDB
    oracle replays sampling, spilled assignment, and probe selection
    exactly. Measured mean top-10 recall 0.755 over 20 probes (pinned
    >= 0.70 in tests) — up from 0.57 at the r6 32/8/spill=1 point and
    above the 0.70 Lloyd-refined non-portable path, while staying
    bit-replayable."""
    path, cents = _ivf_index(spark, sf_dir)
    probe = [r["_probe"] for r in _probe(spark, sf_dir).collect()][0]
    return ivf_probe_index(
        spark, path, cents, list(probe), k=10, n_probe=24, exclude_id=0,
        portable=True, spill=2,
    )


def _srp_sig_ctes(n_planes: int) -> str:
    """Shared oracle CTEs replaying srp_signature_words in SQL: quantize
    components with floor(v*1e6 + 0.5) (the fully-specified rounding the
    pandas UDF uses), ±1 plane signs from the md5 first-hex-digit parity,
    exact integer dots, sign bits packed 63 per word. Bit-for-bit equal to
    the Spark signature by construction — no float ops after quantization."""
    n_words = (n_planes + 62) // 63
    word_cols = ",\n         ".join(
        "CAST(sum(CASE WHEN i >= {lo} AND i < {hi} THEN bit << (i - {lo}) "
        "ELSE 0 END) AS BIGINT) AS w{w}".format(lo=w * 63, hi=min((w + 1) * 63, n_planes), w=w)
        for w in range(n_words)
    )
    return f"""
comps AS (
  SELECT vec_id,
         unnest(range(0, len(embedding))) AS j,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS q
  FROM embeddings
),
planes AS (
  SELECT i, j,
         CASE WHEN ('0x' || substr(md5('srp:' || i || ':' || j), 1, 1))::INTEGER % 2 = 1
              THEN 1 ELSE -1 END AS s
  FROM range({n_planes}) p(i)
  CROSS JOIN (SELECT DISTINCT j FROM comps) d
),
bits AS (
  SELECT c.vec_id, p.i,
         CASE WHEN sum(c.q * p.s) >= 0 THEN 1::BIGINT ELSE 0::BIGINT END AS bit
  FROM comps c JOIN planes p USING (j)
  GROUP BY c.vec_id, p.i
),
sigs AS (
  SELECT vec_id,
         {word_cols}
  FROM bits GROUP BY vec_id
)"""


# ann_srp_topk replay: signature words for every vector (probe included),
# Hamming ranking with id tie-break, top max(10, ceil(0.2 * n)) candidates,
# exact-cosine re-rank of exactly those ids.
_ANN_SRP_ORACLE = f"""
WITH {_srp_sig_ctes(126)},
probe_sig AS (SELECT w0, w1 FROM sigs WHERE vec_id = 0),
hams AS (
  SELECT s.vec_id,
         bit_count(xor(s.w0, p.w0)) + bit_count(xor(s.w1, p.w1)) AS ham
  FROM sigs s CROSS JOIN probe_sig p
  WHERE s.vec_id != 0
),
ranked AS (
  SELECT vec_id, row_number() OVER (ORDER BY ham, vec_id) AS rn FROM hams
),
total AS (SELECT count(*) AS cnt FROM hams),
cand AS (
  SELECT vec_id FROM ranked, total
  WHERE rn <= greatest(10, CAST(ceil(0.2 * cnt) AS BIGINT))
)
SELECT e.vec_id,
       round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    CAST(pr.embedding AS DOUBLE[])), 6) AS cos_sim
FROM embeddings e
JOIN cand USING (vec_id)
CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) pr
ORDER BY cos_sim DESC, e.vec_id ASC
LIMIT 10
"""


# Semantic near-dup tuning shared by the LSH pair query, semantic dedup
# (plans/curation.py semantic_dedup_keep + IncrementalSemanticDeduper),
# and their one shared oracle below. ONE definition site: the r9 ADVICE
# flagged that the query passed threshold=0.4 while the oracle hardcoded
# '>= 0.4' (and the 56-plane / 8x7-bit banding) — editing either side
# would silently desync query from oracle (the _QUOTA_TOKENS pattern).
SEM_NEAR_DUP_THRESHOLD = 0.4
SEM_SRP_PLANES = 56
SEM_SRP_MAX_HAMMING = 7  # pigeonhole banding: max_hamming+1 chunks
_SEM_SRP_CHUNKS = SEM_SRP_MAX_HAMMING + 1
_SEM_SRP_BITS = SEM_SRP_PLANES // _SEM_SRP_CHUNKS

# embedding_near_dup_pairs_lsh replay: single-word 56-plane signatures,
# 8x7-bit pigeonhole bands, candidate pairs sharing >= 1 band key, exact
# rounded-cosine verification at the threshold.
_COS_PAIRS_LSH_ORACLE = f"""
WITH {_srp_sig_ctes(SEM_SRP_PLANES)},
banded AS (
  SELECT vec_id, c, (w0 >> CAST(c * {_SEM_SRP_BITS} AS INTEGER)) & {(1 << _SEM_SRP_BITS) - 1} AS key
  FROM sigs CROSS JOIN range({_SEM_SRP_CHUNKS}) chunks(c)
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM banded a JOIN banded b
    ON a.c = b.c AND a.key = b.key AND a.vec_id < b.vec_id
)
SELECT id_a, id_b,
       round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                    CAST(eb.embedding AS DOUBLE[])), 6) AS cos_sim
FROM cand
JOIN embeddings ea ON ea.vec_id = cand.id_a
JOIN embeddings eb ON eb.vec_id = cand.id_b
WHERE round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                   CAST(eb.embedding AS DOUBLE[])), 6) >= {SEM_NEAR_DUP_THRESHOLD}
"""


# ann_ivf_topk replay: 32 centroids sampled by (md5(id), id) order, every
# vector assigned to its argmax round-6-cosine centroid (ties to the lowest
# centroid index — row_number replays numpy's first-max argmax), probe
# scans the 8 nearest lists by the same rule, exact-cosine re-rank.
_ANN_IVF_ORACLE = """
WITH cents AS (
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cidx,
         embedding AS cvec
  FROM embeddings
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
  LIMIT 128
),
assign AS (
  SELECT e.vec_id, c.cidx,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                 CAST(c.cvec AS DOUBLE[])), 6) DESC,
                    c.cidx ASC
         ) AS rk
  FROM embeddings e CROSS JOIN cents c
),
vec_list AS (SELECT vec_id, cidx AS ivf_list FROM assign WHERE rk <= 2),
probe_rank AS (
  SELECT c.cidx,
         row_number() OVER (
           ORDER BY round(list_cosine_similarity(CAST(p.embedding AS DOUBLE[]),
                                                 CAST(c.cvec AS DOUBLE[])), 6) DESC,
                    c.cidx ASC
         ) AS rk
  FROM cents c
  CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) p
),
probe_lists AS (SELECT cidx FROM probe_rank WHERE rk <= 24),
cand AS (
  SELECT DISTINCT v.vec_id
  FROM vec_list v JOIN probe_lists pl ON v.ivf_list = pl.cidx
  WHERE v.vec_id != 0
)
SELECT e.vec_id,
       round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    CAST(pr.embedding AS DOUBLE[])), 6) AS cos_sim
FROM embeddings e
JOIN cand USING (vec_id)
CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) pr
ORDER BY cos_sim DESC, e.vec_id ASC
LIMIT 10
"""


# Cluster-balanced selection constants: ONE definition site for the
# Spark query and the oracle f-string. 16 clusters over the 500-vector
# test table leave real imbalance (md5-sampled centroids do not
# equalize occupancy), so the cap genuinely thins heavy clusters at
# every SF.
CB_N_CENTROIDS = 16
CB_CAP_PER_CLUSTER = 20


def cluster_balanced_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced corpus selection over the embedding space — the
    DataComp/SemDeDup-adjacent "balance the topic mix" step: k-means-style
    clusters from the portable IVF coarse quantizer (md5-ordered sampled
    centroids, round-6 cosine argmax assignment — ann_ivf_topk's exact
    machinery), then at most CB_CAP_PER_CLUSTER vectors kept per cluster
    in deterministic md5 order (a reproducible uniform subsample within
    each cluster, the deterministic_shuffle rule). Heavy clusters —
    over-represented topics — are thinned to the cap; rare clusters
    survive whole. Output (vec_id, label, cluster).

    Scale: assignment is the map-only Arrow-batched matmul (no shuffle);
    the cap is ONE shuffle on the cluster key + a bounded per-cluster
    sort — at 100 TB the same shape as every quota operator here. The
    centroid table is driver-resident by design (C x dim floats)."""
    from pyspark.sql import Window

    from ..operators.similarity import ivf_assign, ivf_centroids

    emb = _t(spark, sf_dir, "embeddings")
    cents = ivf_centroids(emb, n_centroids=CB_N_CENTROIDS, hash_mode="md5")
    assigned = ivf_assign(emb, cents, portable=True, spill=1)
    w = Window.partitionBy("ivf_list").orderBy(
        F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
    )
    return (
        assigned.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= CB_CAP_PER_CLUSTER)
        .select("vec_id", "label", F.col("ivf_list").cast("int").alias("cluster"))
    )


def cluster_balanced_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster balancing run as an ACTUAL Structured Streaming ingest
    gate: the quota gate (streaming/stream_quota.py) generalized to a
    ROW-COUNT budget keyed on the cluster id — per-cluster admitted
    counts carry across checkpointed availableNow runs, so an
    over-represented topic stops admitting the moment its cap fills,
    at ingest time instead of in a batch rewrite.

    The coarse quantizer is trained BEFORE the stream (the production
    IVF contract: the codebook is an offline artifact) from the same
    md5-ordered sample the batch query uses; each wave is assigned
    batch-side with the portable rule and fed in md5-of-vec_id order
    (waves split lexicographically on the order key), so the gate's
    first-cap-admitted prefix equals the batch query's md5-ordered cap
    selection and this SHARES cluster_balanced_embeddings' oracle."""
    from ..operators.similarity import ivf_assign, ivf_centroids
    from ..streaming.stream_quota import StreamingQuotaGate
    from .curation import _stream_scratch

    import os

    emb = _t(spark, sf_dir, "embeddings")
    cents = ivf_centroids(emb, n_centroids=CB_N_CENTROIDS, hash_mode="md5")
    workdir = _stream_scratch("cluster_balanced_streaming")
    # materialize the assignment ONCE to scratch (the Arrow matmul + md5
    # over every vector is the query's dominant cost; lazily it would
    # re-run for each wave write AND the final recovery join — r11
    # third-review finding 1)
    asg_path = os.path.join(workdir, "assigned")
    ivf_assign(emb, cents, portable=True, spill=1).select(
        "vec_id",
        "label",
        F.col("ivf_list").cast("int").alias("cluster"),
        F.md5(F.col("vec_id").cast("string")).alias("_ord"),
    ).write.parquet(asg_path)
    assigned = spark.read.parquet(asg_path)
    gate = StreamingQuotaGate(
        spark,
        workdir,
        schema=assigned.select("cluster", "_ord").schema,
        budget=CB_CAP_PER_CLUSTER,
        group_col="cluster",
        order_col="_ord",
        weight_expr=F.lit(1),
        group_type="int",
        order_type="string",
    )
    # waves split lexicographically on the order key so cross-batch
    # arrival respects the per-cluster admission order
    waves = assigned.select("cluster", "_ord")
    gate.ingest_wave(waves.filter(F.col("_ord") < "8"))
    gate.ingest_wave(waves.filter(F.col("_ord") >= "8"))
    # recover the passthrough columns: the order key is md5(vec_id),
    # unique per vector, so the join is 1:1
    return gate.accepted().select("cluster", "_ord").join(
        assigned, ["cluster", "_ord"]
    ).select("vec_id", "label", "cluster")


_CLUSTER_BALANCED_ORACLE = f"""
WITH cents AS (
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cidx,
         embedding AS cvec
  FROM embeddings
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
  LIMIT {CB_N_CENTROIDS}
),
assign AS (
  SELECT e.vec_id, e.label, c.cidx,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                 CAST(c.cvec AS DOUBLE[])), 6) DESC,
                    c.cidx ASC
         ) AS rk
  FROM embeddings e CROSS JOIN cents c
),
vl AS (SELECT vec_id, label, cidx AS cluster FROM assign WHERE rk <= 1),
ranked AS (
  SELECT vec_id, label, cluster,
         row_number() OVER (
           PARTITION BY cluster
           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
         ) AS rk
  FROM vl
)
SELECT vec_id, label, CAST(cluster AS INT) AS cluster
FROM ranked WHERE rk <= {CB_CAP_PER_CLUSTER}
"""


def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via IVF-PQ (r10 verdict item 7): the portable
    IVF coarse quantizer prunes to 24 of 128 lists (spill=2, identical
    to ann_ivf_topk's machinery), then ASYMMETRIC-DISTANCE scoring over
    4-bit-ish PQ codes (m=16 subspaces x 32 codes; 16 small ints — 10
    bytes packed — stand in for 256 bytes of float32, 25.6x) ranks the
    pruned candidates WITHOUT touching a float vector, and only the
    top-80 ADC shortlist is re-ranked with exact cosine (Jegou et al.
    2011). Codebooks are md5-ordered samples (the first 32 vectors of
    the SAME ordered sample the IVF centroids come from), code
    assignment is argmin round-6 squared distance with ties to the
    lowest code index, and ADC partials are round-6 decimals summed
    exactly — every stage integer/decimal-deterministic, so the DuckDB
    oracle replays coarse pruning, encoding, ADC ranking, and re-rank
    bit-for-bit. Measured mean top-10 recall 0.770 over 10 probes at
    sf0.01 (pinned >= 0.70 in tests, the ann_ivf_topk floor; IVF-alone
    measures 0.755 — the ADC shortlist loses almost none of the coarse
    candidate recall at 25.6x code compression)."""
    probe = [r["_probe"] for r in _probe(spark, sf_dir).collect()][0]
    return ivfpq_topk(
        _t(spark, sf_dir, "embeddings"), list(probe), k=10, n_centroids=128,
        n_probe=24, spill=2, m=16, k_codes=32, k_cand=80, exclude_id=0,
        portable=True,
    )


# ann_ivfpq_topk replay: the cents/assign/probe_lists/cand CTEs are the
# _ANN_IVF_ORACLE machinery verbatim; books = the first 32 vectors of the
# same md5-ordered sample; enc_d2 replays pq_encode's portable rule
# (argmin of round((v.v - 2*v.c) + c.c, 6) per 4-dim subspace, ties to
# the lowest code index == row_number ORDER BY d2, code_j); lut/adc
# replay pq_adc_scores (round-6 partial inner products summed as exact
# decimals); the final SELECT is the exact-cosine re-rank of the top-80
# ADC shortlist.
_ANN_IVFPQ_ORACLE = """
WITH cents AS (
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cidx,
         CAST(embedding AS DOUBLE[]) AS cvec
  FROM embeddings
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
  LIMIT 128
),
assign AS (
  SELECT e.vec_id, c.cidx,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                 c.cvec), 6) DESC,
                    c.cidx ASC
         ) AS rk
  FROM embeddings e CROSS JOIN cents c
),
vec_list AS (SELECT vec_id, cidx AS ivf_list FROM assign WHERE rk <= 2),
probe_vec AS (SELECT CAST(embedding AS DOUBLE[]) AS pvec FROM embeddings WHERE vec_id = 0),
probe_rank AS (
  SELECT c.cidx,
         row_number() OVER (
           ORDER BY round(list_cosine_similarity(p.pvec, c.cvec), 6) DESC,
                    c.cidx ASC
         ) AS rk
  FROM cents c CROSS JOIN probe_vec p
),
probe_lists AS (SELECT cidx FROM probe_rank WHERE rk <= 24),
cand AS (
  SELECT DISTINCT v.vec_id
  FROM vec_list v JOIN probe_lists pl ON v.ivf_list = pl.cidx
  WHERE v.vec_id != 0
),
books AS (SELECT cidx AS code_j, cvec FROM cents WHERE cidx < 32),
subs AS (SELECT CAST(mi AS INTEGER) AS mi FROM range(16) t(mi)),
enc_d2 AS (
  SELECT e.vec_id, s.mi, b.code_j,
         round(
           list_inner_product(list_slice(CAST(e.embedding AS DOUBLE[]), s.mi*4+1, s.mi*4+4),
                              list_slice(CAST(e.embedding AS DOUBLE[]), s.mi*4+1, s.mi*4+4))
           - 2 * list_inner_product(list_slice(CAST(e.embedding AS DOUBLE[]), s.mi*4+1, s.mi*4+4),
                                    list_slice(b.cvec, s.mi*4+1, s.mi*4+4))
           + list_inner_product(list_slice(b.cvec, s.mi*4+1, s.mi*4+4),
                                list_slice(b.cvec, s.mi*4+1, s.mi*4+4)), 6) AS d2
  FROM embeddings e
  JOIN cand USING (vec_id)
  CROSS JOIN subs s
  CROSS JOIN books b
),
codes AS (
  SELECT vec_id, mi, code_j FROM (
    SELECT vec_id, mi, code_j,
           row_number() OVER (PARTITION BY vec_id, mi ORDER BY d2 ASC, code_j ASC) AS rk
    FROM enc_d2
  ) WHERE rk = 1
),
lut AS (
  SELECT s.mi, b.code_j,
         CAST(round(list_inner_product(list_slice(p.pvec, s.mi*4+1, s.mi*4+4),
                                       list_slice(b.cvec, s.mi*4+1, s.mi*4+4)), 6)
              AS DECIMAL(18,6)) AS part
  FROM subs s CROSS JOIN books b CROSS JOIN probe_vec p
),
adc AS (
  SELECT c.vec_id, CAST(sum(l.part) AS DOUBLE) AS adc_score
  FROM codes c JOIN lut l USING (mi, code_j)
  GROUP BY c.vec_id
),
shortlist AS (SELECT vec_id FROM adc ORDER BY adc_score DESC, vec_id ASC LIMIT 80)
SELECT e.vec_id,
       round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), p.pvec), 6) AS cos_sim
FROM embeddings e
JOIN shortlist USING (vec_id)
CROSS JOIN probe_vec p
ORDER BY cos_sim DESC, e.vec_id ASC
LIMIT 10
"""


def ann_ivfadc_residual_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via IVFADC with RESIDUAL encoding over a
    PORTABLE-LLOYD coarse quantizer (r11 verdict item 6 — the Jegou
    composition completed): two decimal-exact Lloyd iterations refine
    the 128 md5-sampled centroids (similarity.ivf_train_portable), each
    candidate encodes its residual to its primary list with
    residual-space sample codebooks, and ADC scores
    round(q·c_primary, 6) + Σ LUT[m, code] — the coarse term re-ranks
    across lists, which raw-PQ ADC cannot. Same operating point as
    ann_ivfpq_topk (m=16 x 32 codes, 24/128 lists, spill 2, top-80
    shortlist): measured mean top-10 recall **0.880** over 10 probes at
    sf0.01 vs raw-PQ's 0.770 and IVF-only's 0.755 (pinned >= 0.80 in
    tests). The residual gain REQUIRES the trained quantizer: over the
    raw md5-sampled centroids residual recall measures 0.560 — sampled
    centroids leave ~89% of vector energy in the residual and sample
    codebooks quantize that unstructured space 3.3x worse (BASELINE.md
    r12). Every stage is round-6/decimal deterministic, so the oracle
    replays Lloyd refinement, residual encoding, ADC, and re-rank
    bit-for-bit."""
    from ..operators.pq import ivfadc_residual_topk

    probe = [r["_probe"] for r in _probe(spark, sf_dir).collect()][0]
    return ivfadc_residual_topk(
        _t(spark, sf_dir, "embeddings"), list(probe), k=10, n_centroids=128,
        n_probe=24, spill=2, m=16, k_codes=32, k_cand=80, refine_iters=2,
        exclude_id=0,
    )


# --- persisted IVFADC index lifecycle (r12 verdict item 1) -----------------------

# get-or-build cache: one persisted index per (sf_dir, n_vectors) per
# process, living in a session scratch dir (atexit-cleaned). The bench's
# warmup run pays the build; every measured run and every later call is
# probe-only — the production shape, where the index is a long-lived
# catalog artifact and queries never train.
_IVFADC_INDEX_CACHE: dict[tuple, str] = {}


def _ivfadc_index_for(
    spark: SparkSession, sf_dir: str, *, book_refine_iters: int = 0
) -> str:
    from ..operators.ann_index import ivfadc_build_index, load_meta
    from ..session import scratch_dir

    emb = _t(spark, sf_dir, "embeddings")
    # the one corpus count per call IS the staleness fingerprint
    # (parquet footer metadata, no data scan); the build reuses it
    # instead of counting a second time (r13 review finding)
    n = emb.count()
    key = (os.path.abspath(sf_dir), n, book_refine_iters)
    workdir = _IVFADC_INDEX_CACHE.get(key)
    if workdir is not None:
        try:
            if load_meta(workdir)["n_vectors"] == n:
                return workdir
        except (OSError, ValueError, KeyError):
            pass  # torn/absent meta: rebuild below
    workdir = scratch_dir("ivfadc_index")
    ivfadc_build_index(
        emb, workdir, n_centroids=128, refine_iters=2, m=16, k_codes=32,
        spill=2, book_refine_iters=book_refine_iters, n_vectors=n,
    )
    _IVFADC_INDEX_CACHE[key] = workdir
    return workdir


def ann_ivfadc_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROBE-ONLY approximate top-10 over the persisted IVFADC index —
    the pay-per-query half of the lifecycle split (r12 verdict item 1;
    the build half is operators.ann_index.ivfadc_build_index, paid once
    per corpus by the get-or-build cache). Identical operating point
    and math to ann_ivfadc_residual_topk (128 lists / 24 probed /
    spill 2 / m=16 x 32 codes / top-80 shortlist, recall 0.880), so the
    SAME value oracle replays both — what differs is the movement
    pattern: the probe reads 24/128 code partitions (directory-pruned),
    joins one broadcast LUT, and touches 80 float vectors, with zero
    training work in the query path."""
    from ..operators.ann_index import ivfadc_probe_index

    probe = [r["_probe"] for r in _probe(spark, sf_dir).collect()][0]
    return ivfadc_probe_index(
        _t(spark, sf_dir, "embeddings"),
        _ivfadc_index_for(spark, sf_dir),
        list(probe),
        k=10, n_probe=24, k_cand=80, exclude_id=0,
    )


def ann_ivfadc_probe_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted index's INCREMENTAL twin: build on wave 1 (even
    vec_ids — train the coarse quantizer and residual codebooks there,
    encode the wave), EXTEND with wave 2 (odd vec_ids encoded under the
    FROZEN artifacts, appended to the code partitions — a map-only pass
    over the new wave, no history re-read: the WaveCountState pattern
    applied to vectors), then probe the merged index. The oracle
    replays the same contract: training CTEs restricted to the even
    wave, assignment/encoding/ADC over the full corpus. Runs the full
    build+extend per call ON PURPOSE — this query IS the lifecycle
    proof; the latency row is ann_ivfadc_probe."""
    from ..operators.ann_index import (
        ivfadc_build_index,
        ivfadc_extend_index,
        ivfadc_probe_index,
    )
    from ..session import scratch_dir

    emb = _t(spark, sf_dir, "embeddings")
    wave1 = emb.filter(F.col("vec_id") % 2 == 0)
    wave2 = emb.filter(F.col("vec_id") % 2 != 0)
    workdir = scratch_dir("ivfadc_incr")
    ivfadc_build_index(
        wave1, workdir, train_df=wave1,
        n_centroids=128, refine_iters=2, m=16, k_codes=32, spill=2,
    )
    ivfadc_extend_index(wave2, workdir)
    probe = [r["_probe"] for r in _probe(spark, sf_dir).collect()][0]
    return ivfadc_probe_index(
        emb, workdir, list(probe), k=10, n_probe=24, k_cand=80, exclude_id=0
    )


def ann_ivfadc_probe_deleted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted index's DELETION lane (r13 verdict item 1): build
    the index over the full corpus, commit a TOMBSTONE wave retracting
    every vec_id % 7 == 3 (a takedown batch — the ReplacingMergeTree
    supersedence idea applied to index state, see
    operators.ann_index.ivfadc_delete_ids), then probe: the deleted ids
    must neither surface in the top-k nor consume a shortlist slot,
    at the cost of ONE broadcast anti-join on the candidate set — no
    rebuild, no re-encode. The oracle replays the same contract:
    training / assignment / codes over the full corpus (the codes rows
    remain on disk until compaction physically reaps them —
    pytest-covered), candidates excluding the tombstoned ids. Runs the
    full build+delete per call ON PURPOSE — this query IS the takedown
    proof; the latency row is ann_ivfadc_probe."""
    from ..operators.ann_index import (
        ivfadc_build_index,
        ivfadc_delete_ids,
        ivfadc_probe_index,
    )
    from ..session import scratch_dir

    emb = _t(spark, sf_dir, "embeddings")
    workdir = scratch_dir("ivfadc_deleted")
    ivfadc_build_index(
        emb, workdir, n_centroids=128, refine_iters=2, m=16, k_codes=32,
        spill=2,
    )
    ivfadc_delete_ids(emb.filter(F.col("vec_id") % 7 == 3), workdir)
    probe = [r["_probe"] for r in _probe(spark, sf_dir).collect()][0]
    return ivfadc_probe_index(
        emb, workdir, list(probe), k=10, n_probe=24, k_cand=80, exclude_id=0
    )


def _lloyd_iter_ctes(t: int, train_where: str = "") -> str:
    """One portable-Lloyd iteration: rank-1 assignment under
    cents{t-1}, per-(list, slot) decimal-exact round-6 mean, array
    rebuild, empty-list carryover — replaying
    similarity.ivf_train_portable exactly. ``train_where`` restricts
    the TRAINING set (the persisted-index incremental twin trains on
    its first wave only)."""
    return f"""
asg{t} AS MATERIALIZED (
  SELECT vec_id, cidx FROM (
    SELECT e.vec_id, c.cidx,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                   c.cvec), 6) DESC,
                      c.cidx ASC
           ) AS rk
    FROM embeddings e CROSS JOIN cents{t - 1} c {train_where}
  ) WHERE rk = 1
),
mn{t} AS MATERIALIZED (
  SELECT cidx, pos,
         round(CAST(sum(CAST(round(val, 6) AS DECIMAL(28,12))) AS DOUBLE)
               / count(*), 6) AS m
  FROM (
    SELECT a.cidx,
           unnest(CAST(e.embedding AS DOUBLE[])) AS val,
           CAST(unnest(range(1, len(e.embedding) + 1)) AS INT) AS pos
    FROM asg{t} a JOIN embeddings e USING (vec_id)
  ) GROUP BY cidx, pos
),
newc{t} AS MATERIALIZED (
  SELECT cidx, list(m ORDER BY pos) AS cvec FROM mn{t} GROUP BY cidx
),
cents{t} AS MATERIALIZED (
  SELECT p.cidx, coalesce(n.cvec, p.cvec) AS cvec
  FROM cents{t - 1} p LEFT JOIN newc{t} n USING (cidx)
)"""


# ann_ivfadc_residual_topk replay: cents0 is the md5 sample; two unrolled
# portable-Lloyd iterations (decimal-exact round-6 means, the
# ivf_train_portable rule); spill-2 candidate discovery under the refined
# centroids; every candidate residualized to its RANK-1 list; books = the
# first 32 md5-ordered vectors' primary residuals; enc_d2/codes replay
# pq_encode's portable argmin over residuals; adc adds the round-6
# q·c_primary coarse term to the LUT sum as exact decimals.
def ann_ivfadc_probe_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe-only over the TRAINED-BOOKS persisted index — the full
    production configuration: both lifecycle (build once, probe many)
    AND the r13 recall lever (per-subspace portable-Lloyd sub-codebooks,
    recall 0.890 = the candidate ceiling) in one registered query. The
    probe-side cost is identical to ann_ivfadc_probe — better books
    change WHAT the LUT contains, not how much work the probe does; the
    extra training is paid once in the cached build. Oracle = the
    trained-books replay (book iterations unrolled)."""
    from ..operators.ann_index import ivfadc_probe_index

    probe = [r["_probe"] for r in _probe(spark, sf_dir).collect()][0]
    return ivfadc_probe_index(
        _t(spark, sf_dir, "embeddings"),
        _ivfadc_index_for(spark, sf_dir, book_refine_iters=2),
        list(probe),
        k=10, n_probe=24, k_cand=80, exclude_id=0,
    )


def ann_ivfadc_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVFADC+R refined operating point over the SAME persisted
    trained-books index (r14 verdict item 2): the r13 recall analysis
    pinned the trained probe AT its candidate ceiling — 0.890 at
    n_probe=24/128 was the BUDGET's limit, not the method's — so the
    refined probe widens both stages that bound recall: probe budget
    n_probe 24 -> 40 and the exact-re-rank shortlist k_cand 80 -> 240
    (the Jegou IVFADC+R refine stage, tripled so the wider candidate
    set cannot be re-bound by the ADC stage). Measured mean top-10
    recall over the 10-probe panel at sf0.01: **0.960** vs the trained
    probe's 0.890 ceiling, along a 0.920 (28/160) / 0.930 (32/160)
    curve (BASELINE.md r15). Probe-side cost stays in the probe-only
    class: directory-pruned code partitions, one broadcast LUT, k_cand
    float vectors touched — the index artifact is byte-identical to
    ann_ivfadc_probe_trained's (shared build cache).

    r16 (r15 verdict item 6): the operating point is now CHOSEN by the
    budget picker, not hand-pinned — ivfadc_pick_n_probe at
    target=0.95 prices the probe's candidate-ceiling curve off the
    persisted index and returns the cheapest budget meeting the target
    (for a single probe at k=10, any target > 0.9 means 10/10
    coverage, so the pick is the max over the exact top-10 of each
    neighbor's minimum probed-list rank); k_cand scales 6x the pick,
    the 240/40 refine ratio that keeps the ADC stage from re-binding
    the wider candidate set. The oracle replays the picker in SQL
    (exact10 / minrank / picked CTEs), so the CHOICE itself is
    hash-gated."""
    from ..operators.ann_index import ivfadc_pick_n_probe, ivfadc_probe_index

    emb = _t(spark, sf_dir, "embeddings")
    workdir = _ivfadc_index_for(spark, sf_dir, book_refine_iters=2)
    probe = [r["_probe"] for r in _probe(spark, sf_dir).collect()][0]
    n_probe = ivfadc_pick_n_probe(
        emb, workdir, [list(probe)], target=0.95, exclude_ids=[0]
    )
    return ivfadc_probe_index(
        emb, workdir, list(probe),
        k=10, n_probe=n_probe, k_cand=6 * n_probe, exclude_id=0,
    )


def ann_ivfadc_probe_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted index's STREAMING twin — the batch / incremental /
    streaming triangle closed for similarity search: two waves of
    vectors (even then odd vec_ids, the incremental twin's split)
    arrive through an ACTUAL Structured Streaming wave gate
    (StreamingWaveGate + operators.ann_index.IncrementalAnnIndexer),
    the first wave building the index and the second extending it under
    the frozen artifacts; the probe over the drained index SHARES
    ann_ivfadc_probe_incremental's oracle (training CTEs restricted to
    the even wave), so the stream is value-checked end to end."""
    from ..operators.ann_index import IncrementalAnnIndexer
    from ..streaming.stream_curation import StreamingWaveGate
    from .curation import _stream_scratch

    emb = _t(spark, sf_dir, "embeddings")
    workdir = _stream_scratch("ann_index_streaming")
    indexer = IncrementalAnnIndexer(
        spark, os.path.join(workdir, "index"), n_centroids=128,
        refine_iters=2, m=16, k_codes=32, spill=2,
    )
    gate = StreamingWaveGate(
        spark, workdir, schema=emb.schema, ingestor=indexer
    )
    gate.reset_state()
    for wave in (
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 != 0),
    ):
        wave.coalesce(1).write.mode("append").parquet(gate.in_dir)
        gate.run_available_now()
    probe = [r["_probe"] for r in _probe(spark, sf_dir).collect()][0]
    return indexer.probe(
        emb, list(probe), k=10, n_probe=24, k_cand=80, exclude_id=0
    )


def ann_ivfadc_probe_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted IVFADC index's FOUR maintenance lanes in ONE
    lane-tagged registered query (r17 window consolidation — the
    r15-endorsed pattern; each lane was previously its own registered
    query and keeps its own oracle replay under the UNION ALL):

    - lane 'incremental': build on wave 1 (even vec_ids), extend with
      wave 2 under the frozen artifacts, probe the merged index;
    - lane 'streaming': the same two waves through the actual
      Structured Streaming wave gate (IncrementalAnnIndexer);
    - lane 'deleted': full build, tombstone wave (vec_id % 7 == 3),
      probe with the takedown anti-join;
    - lane 'trained': probe-only over the trained-books persisted index
      (the production configuration; build cached).

    The latency row for the probe-only path remains ann_ivfadc_probe
    (headline); this query IS the lifecycle proof and runs the builds
    on purpose."""
    lanes = [
        ("incremental", ann_ivfadc_probe_incremental),
        ("streaming", ann_ivfadc_probe_streaming),
        ("deleted", ann_ivfadc_probe_deleted),
        ("trained", ann_ivfadc_probe_trained),
    ]
    out = None
    for lane, fn in lanes:
        part = fn(spark, sf_dir).select(F.lit(lane).alias("lane"), "*")
        out = part if out is None else out.unionByName(part)
    return out


def ann_ivfadc_tune_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The n_probe TUNING surface for the persisted IVFADC index: one
    row per probe budget (n_probe, ceiling) where ceiling is the
    candidate-recall ceiling — the fraction of the probe's exact top-10
    whose spill lists intersect the first n_probe probed lists. The r13
    decomposition showed the trained encoder is LOSSLESS given its
    candidates (recall == this ceiling at n_probe=24), so the ceiling
    curve IS the recall curve and an operator picks the cheapest budget
    meeting a target straight off this table — the ivf_recall_curve /
    choose_n_probe pattern, recast over the index artifact: the lists
    come from the persisted codes (all spill replicas), the centroids
    from meta; one k-row top-k plus a bounded (10 x n_centroids) curve
    expansion, no full re-scan per budget."""
    from ..operators.ann_index import _read_codes, load_meta
    from ..operators.similarity import cosine, ivf_probe_lists

    workdir = _ivfadc_index_for(spark, sf_dir)
    meta = load_meta(workdir)
    cents = meta["cents"]
    emb = _t(spark, sf_dir, "embeddings")
    probe = [r["_probe"] for r in _probe(spark, sf_dir).collect()][0]
    order = ivf_probe_lists(cents, list(probe), len(cents), portable=True)
    rank_map = F.create_map(
        *[x for i, l in enumerate(order) for x in (F.lit(l), F.lit(i + 1))]
    )
    probe_col = F.array(*[F.lit(float(x)) for x in probe])
    top10 = (
        emb.filter(F.col("vec_id") != 0)
        .select(
            "vec_id", F.round(cosine(F.col("embedding"), probe_col), 6).alias("_c")
        )
        .orderBy(F.desc("_c"), F.asc("vec_id"))
        .limit(10)
        .select("vec_id")
    )
    minrk = (
        _read_codes(spark, workdir, meta)
        .join(top10, "vec_id", "left_semi")
        .select("vec_id", F.element_at(rank_map, F.col("ivf_list")).alias("_rk"))
        .groupBy("vec_id")
        .agg(F.min("_rk").alias("_mr"))
    )
    budgets = spark.range(1, len(cents) + 1).select(
        F.col("id").cast("int").alias("n_probe")
    )
    # a neighbor with min probed rank mr is a candidate at every budget
    # n >= mr: explode its contribution range and equi-join the budget
    # axis (a cross join would be a nested-loop node — the plan-hygiene
    # suite bans those outside documented quadratic oracles, and the
    # equi shape is no larger: <= 10 x n_centroids rows either way)
    contrib = (
        minrk.select(
            F.explode(
                F.sequence(F.col("_mr").cast("int"), F.lit(len(cents)))
            ).alias("n_probe")
        )
        .groupBy("n_probe")
        .agg(F.count(F.lit(1)).alias("_k"))
    )
    return budgets.join(contrib, "n_probe", "left").select(
        "n_probe",
        F.round(F.coalesce(F.col("_k"), F.lit(0)) / F.lit(10.0), 6).alias(
            "ceiling"
        ),
    )


# tune_nprobe replay: trained centroids, spill-2 assignment, the probe's
# full list ranking, the exact top-10, each neighbor's MIN probed rank
# over its spill lists, then the cumulative curve over every budget.
_ANN_TUNE_ORACLE = f"""
WITH cents0 AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cidx,
         CAST(embedding AS DOUBLE[]) AS cvec
  FROM embeddings
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
  LIMIT 128
),{_lloyd_iter_ctes(1)},{_lloyd_iter_ctes(2)},
probe_vec AS (SELECT CAST(embedding AS DOUBLE[]) AS pvec FROM embeddings WHERE vec_id = 0),
assign AS MATERIALIZED (
  SELECT e.vec_id, c.cidx,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                 c.cvec), 6) DESC,
                    c.cidx ASC
         ) AS rk
  FROM embeddings e CROSS JOIN cents2 c
),
probe_rank AS (
  SELECT c.cidx,
         row_number() OVER (
           ORDER BY round(list_cosine_similarity(p.pvec, c.cvec), 6) DESC,
                    c.cidx ASC
         ) AS prk
  FROM cents2 c CROSS JOIN probe_vec p
),
exact10 AS (
  SELECT e.vec_id
  FROM embeddings e CROSS JOIN probe_vec p
  WHERE e.vec_id != 0
  ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), p.pvec), 6) DESC,
           e.vec_id ASC
  LIMIT 10
),
minrk AS (
  SELECT a.vec_id, min(pr.prk) AS mr
  FROM assign a
  JOIN exact10 USING (vec_id)
  JOIN probe_rank pr USING (cidx)
  WHERE a.rk <= 2
  GROUP BY a.vec_id
)
SELECT CAST(n AS INT) AS n_probe,
       round(sum(CASE WHEN mr <= n THEN 1 ELSE 0 END) / 10.0, 6) AS ceiling
FROM range(1, 129) t(n) CROSS JOIN minrk
GROUP BY n
"""


def ann_ivfadc_index_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-list rebuild-decision report over the persisted IVFADC index
    (operators.ann_index.ivfadc_index_health): (ivf_list, n_vectors,
    resid_energy) where resid_energy is the fraction of vector energy
    the coarse quantizer leaves in the residual — the r12 diagnosis
    metric made a standing operational surface: a drifting corpus
    pushes the ratio up, and a sustained rise (not an append) is what
    triggers a rebuild. Reads the codes artifact for the primary
    assignment; no re-assignment pass."""
    from ..operators.ann_index import ivfadc_index_health

    return ivfadc_index_health(
        _t(spark, sf_dir, "embeddings"), _ivfadc_index_for(spark, sf_dir)
    )


def ann_ivfadc_rebuild_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The health->rebuild loop's DECISION, driver-value-checked (r13
    verdict item 5 made a registered row): build the index on the
    corpus, record the post-build drift baseline
    (operators.ann_index.ivfadc_record_baseline), extend with a
    deterministic DRIFTED wave (every component +0.8, ids offset — the
    same synthetic shift the e2e pytest measures), then evaluate
    ivfadc_choose_rebuild: one row (baseline, resid_energy, threshold,
    rebuild) where the energies are the vector-weighted means of the
    per-list health ratios in exact decimal arithmetic (one double
    division + HALF_UP round each — engine-portable by construction)
    and the decision fires when the current energy exceeds
    baseline + 0.05. The oracle replays the whole chain: trained
    centroids on the ORIGINAL corpus, rank-1 assignment over original +
    drifted vectors, per-list decimal energies, both weighted means,
    the margin rule. Runs the full build per call ON PURPOSE (the
    lifecycle-proof convention; the latency row is ann_ivfadc_probe)."""
    from ..operators.ann_index import (
        ivfadc_build_index,
        ivfadc_choose_rebuild,
        ivfadc_extend_index,
        ivfadc_record_baseline,
    )
    from ..session import scratch_dir

    emb = _t(spark, sf_dir, "embeddings")
    drift = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x + F.lit(0.8)).alias("embedding"),
        "label",
    )
    workdir = scratch_dir("ivfadc_rebuild_decision")
    ivfadc_build_index(
        emb, workdir, train_df=emb, n_centroids=128, refine_iters=2, m=16,
        k_codes=32, spill=2,
    )
    base = ivfadc_record_baseline(emb, workdir)
    ivfadc_extend_index(drift, workdir)
    d = ivfadc_choose_rebuild(emb.unionByName(drift), workdir)
    return spark.createDataFrame(
        [(base, d["resid_energy"], d["threshold"], bool(d["rebuild"]))],
        "baseline double, resid_energy double, threshold double, rebuild boolean",
    )


# rebuild-decision replay: centroids trained on the ORIGINAL corpus
# (cents0 + two Lloyd iterations over `embeddings` — the build
# happened before the drift), rank-1 assignment over original + the
# +0.8-shifted drifted twin, per-vector decimal energies, per-list
# round-6 ratios, then the two vector-weighted means (baseline over the
# original vectors' lists, current over all) in exact decimals with one
# double division each, and the margin rule.
_ANN_REBUILD_DECISION_ORACLE = f"""
WITH cents0 AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cidx,
         CAST(embedding AS DOUBLE[]) AS cvec
  FROM embeddings
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
  LIMIT 128
),{_lloyd_iter_ctes(1)},{_lloyd_iter_ctes(2)},
all_vecs AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, 0 AS is_drift FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, [x + 0.8 FOR x IN CAST(embedding AS DOUBLE[])], 1
  FROM embeddings
),
assign AS MATERIALIZED (
  SELECT a.vec_id, a.is_drift, c.cidx,
         row_number() OVER (
           PARTITION BY a.vec_id
           ORDER BY round(list_cosine_similarity(a.v, c.cvec), 6) DESC,
                    c.cidx ASC
         ) AS rk
  FROM all_vecs a CROSS JOIN cents2 c
),
energies AS (
  SELECT p.cidx, p.is_drift,
         list_sum([CAST(CAST(round(x, 6) AS DECIMAL(18,6))
                        * CAST(round(x, 6) AS DECIMAL(18,6)) AS DECIMAL(28,12))
                   FOR x IN r.rvec]) AS rr,
         list_sum([CAST(CAST(round(x, 6) AS DECIMAL(18,6))
                        * CAST(round(x, 6) AS DECIMAL(18,6)) AS DECIMAL(28,12))
                   FOR x IN a.v]) AS vv
  FROM all_vecs a
  JOIN (SELECT vec_id, is_drift, cidx FROM assign WHERE rk <= 1) p USING (vec_id, is_drift)
  JOIN LATERAL (
    SELECT [a.v[i] - c.cvec[i] FOR i IN range(1, len(a.v) + 1)] AS rvec
    FROM cents2 c WHERE c.cidx = p.cidx
  ) r ON true
),
base_lists AS (
  SELECT cidx, count(*) AS n,
         round(CAST(sum(rr) AS DOUBLE) / CAST(sum(vv) AS DOUBLE), 6) AS e
  FROM energies WHERE is_drift = 0 GROUP BY cidx
),
cur_lists AS (
  SELECT cidx, count(*) AS n,
         round(CAST(sum(rr) AS DOUBLE) / CAST(sum(vv) AS DOUBLE), 6) AS e
  FROM energies GROUP BY cidx
),
base_e AS (
  SELECT round(CAST(sum(CAST(e AS DECIMAL(18,6)) * n) AS DOUBLE)
               / CAST(sum(n) AS DOUBLE), 6) AS baseline
  FROM base_lists
),
cur_e AS (
  SELECT round(CAST(sum(CAST(e AS DECIMAL(18,6)) * n) AS DOUBLE)
               / CAST(sum(n) AS DOUBLE), 6) AS resid_energy
  FROM cur_lists
)
SELECT b.baseline, c.resid_energy,
       round(b.baseline + 0.05, 6) AS threshold,
       c.resid_energy > round(b.baseline + 0.05, 6) AS rebuild
FROM base_e b CROSS JOIN cur_e c
"""


def ann_ivfadc_books_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC with TRAINED residual sub-codebooks (r12 verdict item 5):
    the md5-sample seed refined by two per-subspace portable-Lloyd
    iterations over every corpus vector's primary residual
    (operators.pq.pq_residual_codebooks refine_iters=2 — the assignment
    step IS pq_encode, the update the decimal-exact round-6 mean).
    Measured at this operating point (sf0.01, 10 probes): recall
    **0.890** vs 0.880 sample-books — and 0.890 is EXACTLY the
    coarse-stage candidate ceiling (the fraction of true top-10 whose
    spill-2 lists intersect the 24 probed lists), so the trained ADC
    stage is now LOSSLESS: every true neighbor that reaches the
    candidate set survives the shortlist. Further recall lives in
    n_probe/spill, not the books (BASELINE.md r13). The oracle unrolls
    the book iterations as CTEs."""
    from ..operators.pq import ivfadc_residual_topk

    probe = [r["_probe"] for r in _probe(spark, sf_dir).collect()][0]
    return ivfadc_residual_topk(
        _t(spark, sf_dir, "embeddings"), list(probe), k=10, n_centroids=128,
        n_probe=24, spill=2, m=16, k_codes=32, k_cand=80, refine_iters=2,
        book_refine_iters=2, exclude_id=0,
    )


def _book_iter_ctes(t: int) -> str:
    """One per-subspace portable-Lloyd iteration over the residual
    sub-codebooks — replaying pq_residual_codebooks(refine_iters>0):
    assignment is pq_encode's round-6 argmin of every corpus vector's
    primary residual under books{t-1} (all m subspaces in one pass),
    the update is the decimal-exact round-6 mean per (subspace, code,
    slot), empty codes carry over."""
    return f"""
bdist{t} AS MATERIALIZED (
  SELECT r.vec_id, bb.mi, bb.code_j,
         round(
           list_inner_product(list_slice(r.rvec, bb.mi*4+1, bb.mi*4+4),
                              list_slice(r.rvec, bb.mi*4+1, bb.mi*4+4))
           - 2 * list_inner_product(list_slice(r.rvec, bb.mi*4+1, bb.mi*4+4), bb.subv)
           + list_inner_product(bb.subv, bb.subv), 6) AS d2
  FROM resid_all r CROSS JOIN books{t - 1} bb
),
bcode{t} AS (
  SELECT vec_id, mi, code_j FROM (
    SELECT vec_id, mi, code_j,
           row_number() OVER (PARTITION BY vec_id, mi ORDER BY d2 ASC, code_j ASC) AS rk
    FROM bdist{t}
  ) WHERE rk = 1
),
bmean{t} AS MATERIALIZED (
  SELECT mi, code_j, pos,
         round(CAST(sum(CAST(round(val, 6) AS DECIMAL(28,12))) AS DOUBLE)
               / count(*), 6) AS mv
  FROM (
    SELECT c.mi, c.code_j,
           unnest(list_slice(r.rvec, c.mi*4+1, c.mi*4+4)) AS val,
           CAST(unnest(range(1, 5)) AS INT) AS pos
    FROM bcode{t} c JOIN resid_all r USING (vec_id)
  ) GROUP BY mi, code_j, pos
),
bnew{t} AS (
  SELECT mi, code_j, list(mv ORDER BY pos) AS subv FROM bmean{t} GROUP BY mi, code_j
),
books{t} AS MATERIALIZED (
  SELECT p.mi, p.code_j, coalesce(n.subv, p.subv) AS subv
  FROM books{t - 1} p LEFT JOIN bnew{t} n USING (mi, code_j)
)"""


def _ivfadc_oracle(
    train_where: str = "",
    book_iters: int = 0,
    delete_where: str = "",
    n_probe: int = 24,
    k_cand: int = 80,
    picked_target: float | None = None,
) -> str:
    """The IVFADC replay, parameterized by a TRAINING-set predicate and
    a sub-codebook refinement depth. ``train_where`` empty = train on
    the full corpus (ann_ivfadc_residual_topk and the persisted-index
    ann_ivfadc_probe, whose build/probe split computes the identical
    math); a predicate = the persisted-index incremental twin, which
    trains centroids + codebooks on its FIRST wave only and encodes
    every later wave with those frozen artifacts — so the oracle
    restricts cents0 / the Lloyd iterations / book_rows to the training
    wave while assignment, encoding, ADC, and the re-rank still cover
    the whole corpus. ``book_iters > 0`` unrolls per-subspace portable
    Lloyd over the residual sub-codebooks (_book_iter_ctes) — the
    trained-books query, whose measured recall hits the coarse-stage
    candidate ceiling (BASELINE.md r13). ``n_probe``/``k_cand`` replay
    a different probe budget / refine-shortlist size (the REFINED
    query's wider operating point). ``delete_where`` marks ids a
    TOMBSTONE wave removed AFTER the build: the index (training,
    assignment, codes) still covers them — the codes rows are on disk
    until compaction — but the probe's candidate set excludes them, so
    the predicate lands exactly on the ``cand`` CTE (and the shortlist
    / re-rank inherit the exclusion), replaying
    operators.ann_index.ivfadc_delete_ids' broadcast anti-join."""
    tw = f"WHERE {train_where}" if train_where else ""
    twe = f"WHERE e.{train_where}" if train_where else ""
    dw = f" AND NOT (v.{delete_where})" if delete_where else ""
    # picked_target: replay operators.ann_index.ivfadc_pick_n_probe in
    # SQL — exact top-10, each neighbor's MIN probed-list rank over its
    # spill lists (assign rk <= 2 replays spill=2), and the smallest
    # budget whose ceiling meets the target. For a single probe at
    # k=10, any target > 0.9 needs 10/10 coverage, so the picked
    # n_probe is max(min_rank); k_cand scales 6x (the refined query's
    # 240/40 ratio, so the ADC stage cannot re-bind the wider set).
    picked_ctes = ""
    np_expr, kc_expr = str(n_probe), str(k_cand)
    if picked_target is not None:
        if delete_where:
            raise ValueError(
                "picked_target oracle path does not model tombstones"
            )
        if not picked_target > 0.9:
            raise ValueError(
                "single-probe picker replay requires target > 0.9 "
                "(10/10 coverage); lower targets need the panel picker"
            )
        picked_ctes = """
exact10 AS MATERIALIZED (
  SELECT e.vec_id
  FROM embeddings e CROSS JOIN probe_vec p
  WHERE e.vec_id != 0
  ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                        p.pvec), 6) DESC,
           e.vec_id ASC
  LIMIT 10
),
minrank AS (
  SELECT a.vec_id, min(pr.rk) AS mr
  FROM (SELECT vec_id, cidx FROM assign WHERE rk <= 2) a
  JOIN probe_rank pr USING (cidx)
  JOIN exact10 USING (vec_id)
  GROUP BY a.vec_id
),
picked AS (SELECT max(mr) AS np FROM minrank),"""
        np_expr = "(SELECT np FROM picked)"
        kc_expr = "(SELECT 6 * np FROM picked)"
    biters = "".join("," + _book_iter_ctes(t) for t in range(1, book_iters + 1))
    bfinal = f"books{book_iters}"
    # the full-corpus residual table exists ONLY to train sub-codebooks;
    # without book iterations the candidates' resid computes directly
    # (materializing corpus-wide residuals for every book_iters=0 parity
    # run was pure oracle cost — r13 review finding)
    resid_all_cte = (
        """
resid_all AS MATERIALIZED (
  SELECT e.vec_id, p.cidx,
         [CAST(e.embedding AS DOUBLE[])[i] - c.cvec[i]
          FOR i IN range(1, len(e.embedding) + 1)] AS rvec
  FROM embeddings e
  JOIN prim p USING (vec_id)
  JOIN cents2 c ON p.cidx = c.cidx
),"""
        if book_iters > 0
        else ""
    )
    return f"""
WITH cents0 AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cidx,
         CAST(embedding AS DOUBLE[]) AS cvec
  FROM embeddings {tw}
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
  LIMIT 128
),{_lloyd_iter_ctes(1, twe)},{_lloyd_iter_ctes(2, twe)},
probe_vec AS (SELECT CAST(embedding AS DOUBLE[]) AS pvec FROM embeddings WHERE vec_id = 0),
assign AS MATERIALIZED (
  SELECT e.vec_id, c.cidx,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                 c.cvec), 6) DESC,
                    c.cidx ASC
         ) AS rk
  FROM embeddings e CROSS JOIN cents2 c
),
probe_rank AS (
  SELECT c.cidx,
         row_number() OVER (
           ORDER BY round(list_cosine_similarity(p.pvec, c.cvec), 6) DESC,
                    c.cidx ASC
         ) AS rk
  FROM cents2 c CROSS JOIN probe_vec p
),
{picked_ctes}
probe_lists AS (SELECT cidx FROM probe_rank WHERE rk <= {np_expr}),
cand AS MATERIALIZED (
  SELECT DISTINCT v.vec_id
  FROM (SELECT vec_id, cidx FROM assign WHERE rk <= 2) v
  JOIN probe_lists pl USING (cidx)
  WHERE v.vec_id != 0{dw}
),
prim AS (SELECT vec_id, cidx FROM assign WHERE rk <= 1),{resid_all_cte}
resid AS MATERIALIZED (
  SELECT e.vec_id, p.cidx,
         [CAST(e.embedding AS DOUBLE[])[i] - c.cvec[i]
          FOR i IN range(1, len(e.embedding) + 1)] AS rvec
  FROM embeddings e
  JOIN cand USING (vec_id)
  JOIN prim p USING (vec_id)
  JOIN cents2 c ON p.cidx = c.cidx
),
book_rows AS (
  SELECT row_number() OVER (ORDER BY md5(CAST(e.vec_id AS VARCHAR)), e.vec_id) - 1 AS code_j,
         [CAST(e.embedding AS DOUBLE[])[i] - c.cvec[i]
          FOR i IN range(1, len(e.embedding) + 1)] AS bvec
  FROM embeddings e
  JOIN prim p USING (vec_id)
  JOIN cents2 c ON p.cidx = c.cidx
  {twe}
  ORDER BY md5(CAST(e.vec_id AS VARCHAR)), e.vec_id
  LIMIT 32
),
subs AS (SELECT CAST(mi AS INTEGER) AS mi FROM range(16) t(mi)),
books0 AS MATERIALIZED (
  SELECT s.mi, b.code_j, list_slice(b.bvec, s.mi*4+1, s.mi*4+4) AS subv
  FROM book_rows b CROSS JOIN subs s
){biters},
enc_d2 AS MATERIALIZED (
  SELECT r.vec_id, b.mi, b.code_j,
         round(
           list_inner_product(list_slice(r.rvec, b.mi*4+1, b.mi*4+4),
                              list_slice(r.rvec, b.mi*4+1, b.mi*4+4))
           - 2 * list_inner_product(list_slice(r.rvec, b.mi*4+1, b.mi*4+4), b.subv)
           + list_inner_product(b.subv, b.subv), 6) AS d2
  FROM resid r CROSS JOIN {bfinal} b
),
codes AS (
  SELECT vec_id, mi, code_j FROM (
    SELECT vec_id, mi, code_j,
           row_number() OVER (PARTITION BY vec_id, mi ORDER BY d2 ASC, code_j ASC) AS rk
    FROM enc_d2
  ) WHERE rk = 1
),
lut AS (
  SELECT b.mi, b.code_j,
         CAST(round(list_inner_product(list_slice(p.pvec, b.mi*4+1, b.mi*4+4),
                                       b.subv), 6)
              AS DECIMAL(18,6)) AS part
  FROM {bfinal} b CROSS JOIN probe_vec p
),
qc AS (
  SELECT c.cidx,
         CAST(round(list_inner_product(p.pvec, c.cvec), 6) AS DECIMAL(18,6)) AS qcpart
  FROM cents2 c CROSS JOIN probe_vec p
),
adc AS (
  SELECT c.vec_id,
         CAST(sum(l.part) + any_value(q.qcpart) AS DOUBLE) AS adc_score
  FROM codes c
  JOIN lut l USING (mi, code_j)
  JOIN resid r ON c.vec_id = r.vec_id
  JOIN qc q ON r.cidx = q.cidx
  GROUP BY c.vec_id
),
shortlist AS (SELECT vec_id FROM adc ORDER BY adc_score DESC, vec_id ASC LIMIT {kc_expr})
SELECT e.vec_id,
       round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), p.pvec), 6) AS cos_sim
FROM embeddings e
JOIN shortlist USING (vec_id)
CROSS JOIN probe_vec p
ORDER BY cos_sim DESC, e.vec_id ASC
LIMIT 10
"""


_ANN_IVFADC_ORACLE = _ivfadc_oracle()


# ann_ivfadc_index_health replay: the same trained coarse quantizer
# (cents0 + two Lloyd iterations), rank-1 primary assignment, per-vector
# round-6 energy folds, decimal-exact per-list sums, one rounded double
# division — the ratio the Spark report computes from the codes artifact.
_ANN_HEALTH_ORACLE = f"""
WITH cents0 AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cidx,
         CAST(embedding AS DOUBLE[]) AS cvec
  FROM embeddings
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
  LIMIT 128
),{_lloyd_iter_ctes(1)},{_lloyd_iter_ctes(2)},
assign AS MATERIALIZED (
  SELECT e.vec_id, c.cidx,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                 c.cvec), 6) DESC,
                    c.cidx ASC
         ) AS rk
  FROM embeddings e CROSS JOIN cents2 c
),
energies AS (
  SELECT p.cidx,
         list_sum([CAST(CAST(round(x, 6) AS DECIMAL(18,6))
                        * CAST(round(x, 6) AS DECIMAL(18,6)) AS DECIMAL(28,12))
                   FOR x IN r.rvec]) AS rr,
         list_sum([CAST(CAST(round(x, 6) AS DECIMAL(18,6))
                        * CAST(round(x, 6) AS DECIMAL(18,6)) AS DECIMAL(28,12))
                   FOR x IN CAST(e.embedding AS DOUBLE[])]) AS vv
  FROM embeddings e
  JOIN (SELECT vec_id, cidx FROM assign WHERE rk <= 1) p USING (vec_id)
  JOIN LATERAL (
    SELECT [CAST(e.embedding AS DOUBLE[])[i] - c.cvec[i]
            FOR i IN range(1, len(e.embedding) + 1)] AS rvec
    FROM cents2 c WHERE c.cidx = p.cidx
  ) r ON true
)
SELECT cidx AS ivf_list, CAST(count(*) AS BIGINT) AS n_vectors,
       round(CAST(sum(rr) AS DOUBLE) / CAST(sum(vv) AS DOUBLE), 6) AS resid_energy
FROM energies GROUP BY cidx
"""


def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs, BOTH paths in one lane-tagged query
    (r17 window consolidation — the r15-endorsed lane pattern):

    - lane 'exact': all pairs with cosine >= SEM_NEAR_DUP_THRESHOLD
      (O(n^2), allow_quadratic acknowledged — the oracle baseline);
    - lane 'lsh': the SRP-banded scale path (56 planes, 8x7-bit bands,
      thin banded keys + exact-cosine verification, never the O(n^2)
      cross) — precision 1.0, deliberately a subset on this corpus's
      artificial low-cos pairs (see the former _lsh query's analysis,
      r5 verdict item 3).

    Threshold from the shared constant so both lanes and both oracle
    replays move together; the UNION ALL oracle value-checks each lane
    independently per round."""
    from ..operators.similarity import cosine_pairs_srp

    exact = cosine_pairs(
        _t(spark, sf_dir, "embeddings"),
        threshold=SEM_NEAR_DUP_THRESHOLD,
        allow_quadratic=True,
    )
    lsh = cosine_pairs_srp(
        _t(spark, sf_dir, "embeddings"), threshold=SEM_NEAR_DUP_THRESHOLD
    )
    return exact.select(F.lit("exact").alias("lane"), "*").unionByName(
        lsh.select(F.lit("lsh").alias("lane"), "*")
    )


_COS_PAIRS_ORACLE = f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= {SEM_NEAR_DUP_THRESHOLD}
"""


# --- text analysis ----------------------------------------------------------------


def text_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_stats(_t(spark, sf_dir, "documents"))


def gopher_quality_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule gate over documents (operators.text.
    gopher_quality): per-rule boolean flags + conjunctive keep, all rule
    predicates integer-exact. Map-only — one codegen project over the
    scan."""
    return gopher_quality(_t(spark, sf_dir, "documents"))


_GOPHER_ORACLE = rf"""
WITH base AS (
  SELECT doc_id, text,
         CASE WHEN regexp_replace(text, '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g') = '' THEN []::VARCHAR[]
              ELSE string_split_regex(regexp_replace(text, '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g'), '[ \t\n\x0B\f\r]+') END AS toks
  FROM documents
),
feat AS (
  SELECT doc_id,
         len(toks) AS n_words,
         CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0) AS BIGINT) AS sum_chars,
         len(list_filter(toks, x -> x IN {tuple(GOPHER_STOPWORDS)})) AS n_stop,
         CASE WHEN len(toks) > 1
              THEN [toks[i] || ' ' || toks[i + 1] FOR i IN range(1, len(toks))]
              ELSE []::VARCHAR[] END AS bg
  FROM base
),
rules AS (
  SELECT doc_id, n_words, sum_chars, n_stop,
         len(bg) AS n_bi, len(list_distinct(bg)) AS n_dist,
         n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS} AS r_word_count,
         n_words > 0 AND sum_chars >= {GOPHER_MIN_MWL} * n_words
                     AND sum_chars <= {GOPHER_MAX_MWL} * n_words AS r_mean_word_len,
         n_stop >= {GOPHER_MIN_STOPWORDS} AS r_stopwords,
         (len(bg) - len(list_distinct(bg))) * {GOPHER_DUP_BIGRAM_DENOM} <= len(bg) AS r_repetition
  FROM feat
)
SELECT doc_id, n_words,
       round(CASE WHEN n_words > 0 THEN CAST(sum_chars AS DOUBLE) / n_words ELSE 0.0 END, 6) AS mean_word_len,
       n_stop,
       round(CASE WHEN n_bi > 0 THEN CAST(n_bi - n_dist AS DOUBLE) / n_bi ELSE 0.0 END, 6) AS dup_bigram_frac,
       r_word_count, r_mean_word_len, r_stopwords, r_repetition,
       r_word_count AND r_mean_word_len AND r_stopwords AND r_repetition AS keep
FROM rules
"""


_TEXT_STATS_ORACLE = r"""
WITH base AS (
  SELECT doc_id, text,
         CASE WHEN regexp_replace(text, '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g') = '' THEN []::VARCHAR[]
              ELSE string_split_regex(regexp_replace(text, '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g'), '[ \t\n\x0B\f\r]+') END AS toks
  FROM documents
),
feat AS (
  SELECT doc_id, text, toks,
         len(toks) AS n_tokens,
         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]')) AS n_bpe_tokens,
         length(text) AS n_chars,
         CASE WHEN length(text) = 0 THEN 0.0
              ELSE CAST(length(text) - length(regexp_replace(text, '[^\w \t\n\x0B\f\r]', '', 'g')) AS DOUBLE)
                   / length(text) END AS punct_ratio_raw,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE CAST(len(list_filter(toks, t -> lower(t) IN
                    ('the','and','of','to','is','you','that','it'))) AS DOUBLE)
                   / len(toks) END AS stop_ratio_raw,
         CAST(len(list_filter(toks, t -> lower(t) IN
              ('the','and','of','to','is','you','that','it'))) AS DOUBLE)
              / greatest(len(toks), 1) AS s_en,
         CAST(len(list_filter(toks, t -> lower(t) IN
              ('der','die','und','das','ist','nicht','ich','ein'))) AS DOUBLE)
              / greatest(len(toks), 1) AS s_de,
         CAST(len(list_filter(toks, t -> lower(t) IN
              ('le','la','les','et','est','que','une','vous'))) AS DOUBLE)
              / greatest(len(toks), 1) AS s_fr,
         CAST(len(list_filter(toks, t -> lower(t) IN
              ('el','los','las','es','una','para','por','con'))) AS DOUBLE)
              / greatest(len(toks), 1) AS s_es
  FROM base
)
SELECT doc_id,
       n_tokens, n_bpe_tokens, n_chars,
       round(punct_ratio_raw, 6) AS punct_ratio,
       round(stop_ratio_raw, 6) AS stopword_ratio,
       round((least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0)
              + (1.0 - least(punct_ratio_raw * 5, 1.0))
              + least(stop_ratio_raw * 4, 1.0)) / 3.0, 6) AS quality,
       CASE WHEN s_en = 0 AND s_de = 0 AND s_fr = 0 AND s_es = 0 THEN 'und'
            WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
            WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
            WHEN s_fr >= s_es THEN 'fr'
            ELSE 'es' END AS lang_pred,
       md5(text) AS fingerprint
FROM feat
"""


# --- multimodal plumbing -------------------------------------------------------------


def multimodal_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload pipeline: documents-as-media -> mapInPandas feature
    extraction (stub codec) -> typed output. The oracled projection checks
    the Arrow plumbing moved every payload byte-exactly."""
    media = documents_as_media(_t(spark, sf_dir, "documents"))
    feats = extract_features(media, use_stub=True)
    return feats.select("media_id", "kind", "n_bytes")


_MULTIMODAL_ORACLE = """
SELECT doc_id AS media_id, 'image' AS kind,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
FROM documents
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (video-demux shape): one payload -> every 4th 64-byte
    'frame' row, exploded INSIDE the Arrow batch (operators/multimodal.py:
    sample_frames — no shuffle). Frames are value-checked end-to-end as
    uppercase hex (DuckDB can neither md5 nor slice BLOBs, but hex(blob)
    is a sliceable VARCHAR and bit-exact with Spark's hex), proving the
    one-to-many mapInPandas plumbing moves every sampled byte."""
    from ..operators.multimodal import sample_frames

    media = documents_as_media(_t(spark, sf_dir, "documents"))
    frames = sample_frames(media, frame_bytes=64, every_n=4)
    return frames.select(
        "media_id",
        "frame_idx",
        F.hex("payload").alias("frame_hex"),
        F.length("payload").alias("n_bytes"),
    )


_FRAME_SAMPLE_ORACLE = """
WITH media AS (
  SELECT doc_id AS media_id, hex(encode(text)) AS hexpay,
         octet_length(encode(text)) AS n
  FROM documents
),
f AS (
  SELECT media_id, hexpay,
         CAST(unnest(range(0, greatest(1, n // 64), 4)) AS INT) AS frame_idx
  FROM media
)
SELECT media_id, frame_idx,
       substring(hexpay, frame_idx * 128 + 1, 128) AS frame_hex,
       CAST(length(substring(hexpay, frame_idx * 128 + 1, 128)) // 2 AS INT)
         AS n_bytes
FROM f
"""


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full feature pipeline output, FULLY value-oracled: the stub codec's
    8-bucket byte histogram is projected to scalar double columns f0..f7
    (round 1 recorded an err because the driver's canonicalizer cannot
    lexsort array cells). The oracle recomputes the histogram from
    hex(encode(text)) — bucket = byte >> 5 = hexdigit(2i) >> 1 — so every
    byte the Arrow pipeline moved is value-checked, division included
    (count/len is one IEEE double op in both engines)."""
    media = documents_as_media(_t(spark, sf_dir, "documents"))
    feats = extract_features(media, use_stub=True)
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        *[F.col("feature")[i].alias(f"f{i}") for i in range(8)],
    )


_MULTIMODAL_FEATURES_ORACLE = """
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n
  FROM documents
),
bytes AS (
  SELECT doc_id, n,
         (strpos('0123456789ABCDEF', unnest([substr(h, 2 * i + 1, 1) FOR i IN range(0, n)])) - 1) // 2 AS bucket
  FROM b WHERE n > 0
),
hist AS (
  SELECT doc_id,
         count(*) FILTER (bucket = 0) AS c0,
         count(*) FILTER (bucket = 1) AS c1,
         count(*) FILTER (bucket = 2) AS c2,
         count(*) FILTER (bucket = 3) AS c3,
         count(*) FILTER (bucket = 4) AS c4,
         count(*) FILTER (bucket = 5) AS c5,
         count(*) FILTER (bucket = 6) AS c6,
         count(*) FILTER (bucket = 7) AS c7
  FROM bytes GROUP BY doc_id
)
SELECT b.doc_id AS media_id, 'image' AS kind, CAST(b.n AS BIGINT) AS n_bytes,
       COALESCE(c0 / CAST(b.n AS DOUBLE), 0.0) AS f0,
       COALESCE(c1 / CAST(b.n AS DOUBLE), 0.0) AS f1,
       COALESCE(c2 / CAST(b.n AS DOUBLE), 0.0) AS f2,
       COALESCE(c3 / CAST(b.n AS DOUBLE), 0.0) AS f3,
       COALESCE(c4 / CAST(b.n AS DOUBLE), 0.0) AS f4,
       COALESCE(c5 / CAST(b.n AS DOUBLE), 0.0) AS f5,
       COALESCE(c6 / CAST(b.n AS DOUBLE), 0.0) AS f6,
       COALESCE(c7 / CAST(b.n AS DOUBLE), 0.0) AS f7
FROM b LEFT JOIN hist USING (doc_id)
"""


def multimodal_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, value-oracled with zero binary fixtures: one
    deterministic P6 PPM per document (operators/multimodal.py:
    synthesize_ppm — every raster byte a pure integer function of
    (doc_id, position)), decoded by the dependency-free codec parser
    (decode_image_py: header parse, dims recovered from the codec not the
    metadata, RGB -> truncating ITU-R 601-2 luma), aggregated to
    integer-exact pixel stats. The oracle regenerates the identical pixel
    stream with modular arithmetic and replays the luma conversion, so a
    header-parse or de-interleave bug anywhere in the decoder
    hash-mismatches. This closes r6 verdict gap 2 (real decode was an
    import-gated never-run branch): the codec path now executes in every
    environment, PIL or not."""
    from ..operators.multimodal import image_decode_stats, synthetic_image_corpus

    return image_decode_stats(synthetic_image_corpus(_t(spark, sf_dir, "documents")))


_IMAGE_DECODE_ORACLE = """
WITH dims AS (
  SELECT doc_id, 8 + (doc_id % 9) AS w, 8 + ((doc_id * 3) % 7) AS h
  FROM documents
),
px AS (
  SELECT doc_id, w, h, unnest(range(0, w * h)) AS p FROM dims
),
luma AS (
  SELECT doc_id, w, h,
         (299 * ((doc_id * 2654435761 + (3 * p) * 40503) % 256)
        + 587 * ((doc_id * 2654435761 + (3 * p + 1) * 40503) % 256)
        + 114 * ((doc_id * 2654435761 + (3 * p + 2) * 40503) % 256)) // 1000 AS l
  FROM px
)
SELECT doc_id AS media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(count(*) AS INT) AS n_pixels,
       CAST(sum(l) AS BIGINT) AS sum_luma,
       CAST(count(*) FILTER (l < 64) AS INT) AS n_dark,
       CAST(count(*) FILTER (l >= 192) AS INT) AS n_bright,
       CAST(sum(l) AS DOUBLE) / count(*) AS mean_luma
FROM luma GROUP BY doc_id, w, h
"""


def multimodal_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL JPEG decode on the driver value-hash gate, zero binary
    fixtures (r10 verdict item 8: the JPEG lane must be exercised green
    per round, and the container cannot install Pillow): one
    deterministic baseline JPEG per document, piecewise-constant on the
    8x8 grid so every block is DC-only and the quality-95 round-trip is
    bit-exact (operators/multimodal.py: synthesize_jpeg_gray), encoded
    AND decoded by the from-scratch T.81 codec (operators/jpeg.py —
    Huffman, zigzag, quantization, float IDCT), aggregated to
    integer-exact pixel stats. The oracle regenerates each block's gray
    with modular arithmetic: a single wrong bit anywhere in the
    bitstream machinery mismatches the hash."""
    from ..operators.multimodal import image_decode_stats, synthetic_jpeg_corpus

    return image_decode_stats(synthetic_jpeg_corpus(_t(spark, sf_dir, "documents")))


_JPEG_DECODE_ORACLE = """
WITH dims AS (
  SELECT doc_id, 1 + (doc_id % 3) AS bw, 1 + ((doc_id // 3) % 2) AS bh
  FROM documents
),
blocks AS (
  SELECT doc_id, bw, bh, unnest(range(0, bw * bh)) AS b FROM dims
),
luma AS (
  SELECT doc_id, bw, bh, (doc_id * 2654435761 + b * 40503) % 256 AS l
  FROM blocks
)
SELECT doc_id AS media_id, CAST(8 * bw AS INT) AS width,
       CAST(8 * bh AS INT) AS height,
       CAST(64 * count(*) AS INT) AS n_pixels,
       CAST(64 * sum(l) AS BIGINT) AS sum_luma,
       CAST(64 * count(*) FILTER (l < 64) AS INT) AS n_dark,
       CAST(64 * count(*) FILTER (l >= 192) AS INT) AS n_bright,
       CAST(64 * sum(l) AS DOUBLE) / (64 * count(*)) AS mean_luma
FROM luma GROUP BY doc_id, bw, bh
"""


def multimodal_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode, value-oracled with zero binary fixtures — the
    audio lane closed the way the image lanes were (r13 verdict item 4):
    one deterministic RIFF/WAVE PCM file per document
    (operators/multimodal.py synthesize_wav — every interleaved sample a
    pure integer function of (doc_id, position); some ids carry a LIST
    metadata chunk so the decoder's chunk WALK is exercised, not a
    fixed-offset read), decoded by the dependency-free RIFF parser
    (decode_wav_py: chunk walk, fmt parse, little-endian 16-bit PCM,
    rate/channels recovered from the codec not the metadata), aggregated
    to integer-exact amplitude stats. The oracle regenerates the
    identical sample stream with modular arithmetic — a header-parse,
    alignment, or endianness bug anywhere hash-mismatches."""
    from ..operators.multimodal import (
        audio_decode_stats,
        synthetic_audio_corpus,
    )

    return audio_decode_stats(
        synthetic_audio_corpus(_t(spark, sf_dir, "documents"))
    )


_AUDIO_DECODE_ORACLE = """
WITH dims AS (
  SELECT doc_id,
         1 + (doc_id % 2) AS n_ch,
         8000 + 4000 * (doc_id % 3) AS rate,
         50 + ((doc_id * 7) % 100) AS n_frames
  FROM documents
),
samp AS (
  SELECT doc_id, n_ch, rate, n_frames,
         abs((doc_id * 2654435761 + unnest(range(0, n_frames * n_ch)) * 48271) % 65536 - 32768) AS a
  FROM dims
)
SELECT doc_id AS media_id, CAST(rate AS INT) AS sample_rate,
       CAST(n_ch AS INT) AS n_channels, CAST(n_frames AS INT) AS n_frames,
       CAST(sum(a) AS BIGINT) AS sum_abs,
       CAST(max(a) AS INT) AS peak,
       CAST(count(*) FILTER (a >= 16384) AS INT) AS n_loud,
       CAST(sum(a) AS DOUBLE) / count(*) AS mean_abs
FROM samp GROUP BY doc_id, rate, n_ch, n_frames
"""


def multimodal_resize_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL resize lane, value-oracled end-to-end: the synthetic PPM
    corpus decoded, nearest-neighbor resized to a fixed 8x6 luma
    thumbnail (the vision-encoder input shape), re-encoded as P5, and
    decoded AGAIN by image_decode_stats — so one hash gate covers
    decode -> resample -> re-encode -> decode, including the P5 read
    path. The oracle regenerates the source raster with modular
    arithmetic, replays the truncating luma conversion and the exact
    nearest-neighbor index map ((j*h)//6, (i*w)//8), and aggregates the
    same integer stats — one wrong index anywhere in the resample
    mismatches."""
    from ..operators.multimodal import (
        image_decode_stats,
        resize_images,
        synthetic_image_corpus,
    )

    return image_decode_stats(
        resize_images(
            synthetic_image_corpus(_t(spark, sf_dir, "documents")),
            width=8,
            height=6,
        )
    )


_RESIZE_DECODE_ORACLE = """
WITH dims AS (
  SELECT doc_id, 8 + (doc_id % 9) AS w, 8 + ((doc_id * 3) % 7) AS h
  FROM documents
),
outpx AS (
  SELECT doc_id, w, h, unnest(range(0, 48)) AS q FROM dims
),
mapped AS (
  SELECT doc_id,
         ((q // 8) * h // 6) * w + ((q % 8) * w // 8) AS p
  FROM outpx
),
luma AS (
  SELECT doc_id,
         (299 * ((doc_id * 2654435761 + (3 * p) * 40503) % 256)
        + 587 * ((doc_id * 2654435761 + (3 * p + 1) * 40503) % 256)
        + 114 * ((doc_id * 2654435761 + (3 * p + 2) * 40503) % 256)) // 1000 AS l
  FROM mapped
)
SELECT doc_id AS media_id, CAST(8 AS INT) AS width, CAST(6 AS INT) AS height,
       CAST(count(*) AS INT) AS n_pixels,
       CAST(sum(l) AS BIGINT) AS sum_luma,
       CAST(count(*) FILTER (l < 64) AS INT) AS n_dark,
       CAST(count(*) FILTER (l >= 192) AS INT) AS n_bright,
       CAST(sum(l) AS DOUBLE) / count(*) AS mean_luma
FROM luma GROUP BY doc_id
"""


def multimodal_video_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video demux+decode, value-oracled with zero binary fixtures —
    the video lane closed the way image and audio were, leaving only
    COMPRESSED codecs (libav) as a scope note: one deterministic
    YUV4MPEG2 stream per document (operators/multimodal.py
    synthesize_y4m — every planar byte a pure integer function of
    (doc_id, frame, position); some ids carry vendor X tags and FRAME
    parameters so the demuxer's tag WALK is exercised, not a
    fixed-offset read), demuxed+decoded by the dependency-free Y4M
    parser (decode_y4m_py: stream-header tag walk, geometry recovered
    from the codec not the metadata, FRAME-delimited raw planar 4:2:0),
    frame-SAMPLED (every 2nd frame — the decode-only-what-you-embed
    shape a 100 TB video pipeline runs), and aggregated to integer-exact
    per-frame plane stats. Chroma sums pin the Y/Cb/Cr plane offsets: a
    demux bug that survives the luma check mismatches the chroma
    columns. The oracle regenerates the identical plane stream with
    modular arithmetic — a header-parse, frame-boundary, or
    plane-offset bug anywhere hash-mismatches."""
    from ..operators.multimodal import (
        synthetic_video_corpus,
        video_decode_stats,
    )

    return video_decode_stats(
        synthetic_video_corpus(_t(spark, sf_dir, "documents")), every_n=2
    )


_VIDEO_DECODE_ORACLE = """
WITH dims AS (
  SELECT doc_id,
         8 + 2 * (doc_id % 5) AS w,
         8 + 2 * ((doc_id * 3) % 4) AS h,
         3 + (doc_id % 5) AS nf
  FROM documents
),
frames AS (
  SELECT doc_id, w, h, nf, unnest(range(0, nf)) AS f FROM dims
),
vals AS (
  SELECT doc_id, w, h, nf, f,
         unnest(range(0, w * h + 2 * ((w // 2) * (h // 2)))) AS p
  FROM frames WHERE f % 2 = 0
),
px AS (
  SELECT doc_id, w, h, nf, f, p,
         (doc_id * 2654435761 + f * 69069 + p * 40503) % 256 AS v
  FROM vals
)
SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(nf AS INT) AS n_frames,
       CAST(sum(v) FILTER (p < w * h) AS BIGINT) AS sum_luma,
       CAST(count(*) FILTER (p < w * h AND v < 64) AS INT) AS n_dark,
       CAST(count(*) FILTER (p < w * h AND v >= 192) AS INT) AS n_bright,
       CAST(sum(v) FILTER (p >= w * h AND p < w * h + (w // 2) * (h // 2)) AS BIGINT) AS sum_cb,
       CAST(sum(v) FILTER (p >= w * h + (w // 2) * (h // 2)) AS BIGINT) AS sum_cr,
       CAST(sum(v) FILTER (p < w * h) AS DOUBLE) / (w * h) AS mean_luma
FROM px GROUP BY doc_id, f, w, h, nf
"""


def packed_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: the 128-token chunks greedily packed into
    512-token training sequences, sharded mod 8 on doc_id. The stateful
    greedy recurrence runs per-shard in applyInPandas; the oracle replays
    the identical recurrence with a recursive CTE."""
    from ..operators.packing import pack_chunks

    chunks = chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_tokens=128, stride=64
    )
    return pack_chunks(chunks, capacity=512, shards=8).select(
        "doc_id", "chunk_idx", "n_chunk_tokens", "shard", "seq_id"
    )


_PACKED_ORACLE = """
WITH RECURSIVE base AS (
  SELECT doc_id,
         CASE WHEN regexp_replace(text, '^[ \\t\\n\\x0B\\f\\r]+|[ \\t\\n\\x0B\\f\\r]+$', '', 'g') = ''
              THEN []::VARCHAR[]
              ELSE string_split_regex(
                     regexp_replace(text, '^[ \\t\\n\\x0B\\f\\r]+|[ \\t\\n\\x0B\\f\\r]+$', '', 'g'), '[ \\t\\n\\x0B\\f\\r]+')
         END AS t
  FROM documents
),
chunks AS (
  SELECT doc_id,
         CAST(s // 64 AS INTEGER) AS chunk_idx,
         CAST(len(t[s + 1 : s + 128]) AS INTEGER) AS n_chunk_tokens,
         CAST(doc_id % 8 AS INTEGER) AS shard
  FROM (SELECT doc_id, t, unnest(range(0, len(t), 64)) AS s
        FROM base WHERE len(t) > 0)
),
ordered AS (
  SELECT *, row_number() OVER (PARTITION BY shard
                               ORDER BY doc_id, chunk_idx) AS rn
  FROM chunks
),
pack(shard, rn, doc_id, chunk_idx, n_chunk_tokens, seq_id, fill) AS (
  SELECT shard, rn, doc_id, chunk_idx, n_chunk_tokens, 0, n_chunk_tokens
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT c.shard, c.rn, c.doc_id, c.chunk_idx, c.n_chunk_tokens,
         CASE WHEN p.fill + c.n_chunk_tokens > 512
              THEN p.seq_id + 1 ELSE p.seq_id END,
         CASE WHEN p.fill + c.n_chunk_tokens > 512
              THEN c.n_chunk_tokens ELSE p.fill + c.n_chunk_tokens END
  FROM pack p JOIN ordered c ON c.shard = p.shard AND c.rn = p.rn + 1
)
SELECT doc_id, chunk_idx, n_chunk_tokens, shard, CAST(seq_id AS INTEGER) AS seq_id
FROM pack
"""


def packing_efficiency_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataloader-health report for the sequence packer: per shard, how
    full the 512-token training sequences actually are — (shard, n_seqs,
    n_chunks, n_tokens, fill_rate). A fill rate well below 1.0 means the
    capacity/chunk-size pairing wastes context window (padding) and the
    budget constants need retuning; this is the metric that decision is
    made on. Exact integer sums; ONE rounded double division per shard.

    Scale: a two-level hash-agg over the packed output — nothing beyond
    the packer's own shapes."""
    packed = packed_chunks(spark, sf_dir)
    per_seq = packed.groupBy("shard", "seq_id").agg(
        F.count(F.lit(1)).alias("_nc"),
        F.sum("n_chunk_tokens").alias("_nt"),
    )
    return (
        per_seq.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_seqs"),
            F.sum("_nc").cast("long").alias("n_chunks"),
            F.sum("_nt").cast("long").alias("n_tokens"),
        )
        .select(
            "shard",
            "n_seqs",
            "n_chunks",
            "n_tokens",
            F.round(
                F.col("n_tokens").cast("double") / (F.col("n_seqs") * F.lit(512.0)), 6
            ).alias("fill_rate"),
        )
    )


_PACKING_EFFICIENCY_ORACLE = f"""
SELECT shard,
       CAST(count(DISTINCT seq_id) AS BIGINT) AS n_seqs,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(n_chunk_tokens) AS BIGINT) AS n_tokens,
       round(CAST(sum(n_chunk_tokens) AS DOUBLE)
             / (count(DISTINCT seq_id) * 512.0), 6) AS fill_rate
FROM ({_PACKED_ORACLE})
GROUP BY shard
"""


def quality_filter_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite C4/Gopher-style quality gate: English, mid-length, decent
    heuristic quality — the filter stage every training pipeline runs
    between text_stats and tokenization. Pure scan-side predicates."""
    stats = text_stats(_t(spark, sf_dir, "documents"))
    return stats.filter(
        (F.col("lang_pred") == "en")
        & (F.col("quality") >= 0.5)
        & F.col("n_tokens").between(10, 5000)
    ).select("doc_id", "n_tokens", "quality")


_QUALITY_FILTER_ORACLE = f"""
SELECT doc_id, n_tokens, quality FROM ({_TEXT_STATS_ORACLE})
WHERE lang_pred = 'en' AND quality >= 0.5 AND n_tokens BETWEEN 10 AND 5000
"""


def embedding_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 scalar quantization of the embedding corpus (per-vector scale +
    int components — the 4x compression step before ANN indexing at
    billion-vector scale). Map-only expressions, fully value-oracled; the
    quantized-search recall is pytest-measured vs the exact path.

    The registered row projects qvec to a CSV string: the driver's pandas
    canonicalizer sorts result columns, and numpy arrays are unhashable/
    unsortable there (r5 err) — same scalar-projection rule as
    multimodal_features. quantize_embeddings itself keeps the array."""
    q = quantize_embeddings(_t(spark, sf_dir, "embeddings"))
    return q.select(
        "vec_id",
        "scale",
        F.array_join(F.col("qvec").cast("array<string>"), ",").alias("qvec_csv"),
    )


_QUANTIZED_ORACLE = """
WITH s AS (
  SELECT vec_id, embedding,
         CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE)
           / CAST(127.0 AS DOUBLE) AS scale
  FROM embeddings
)
SELECT vec_id, scale,
       array_to_string(
         CASE WHEN scale = 0 THEN list_transform(embedding, x -> 0)
              ELSE list_transform(embedding, x -> CAST(round(x / scale) AS INT))
         END, ',') AS qvec_csv
FROM s
"""


def ann_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 neighbors of vec_id 0 ranked by cosine over the int8-quantized
    corpus (operators/similarity.py:quantized_cosine_topk): the memory-
    bandwidth-bound search mode at billion-vector scale. Every step is
    integer math (dot/norms are exact in double well below 2^53) followed
    by one sqrt/multiply/divide in a fixed order, so the DuckDB oracle
    replays the ranking bit-for-bit — closing the loop the r5 verdict
    named: quantization value-oracled AND quantized search value-oracled."""
    probe = [r["_probe"] for r in _probe(spark, sf_dir).collect()][0]
    return quantized_cosine_topk(
        _t(spark, sf_dir, "embeddings"), list(probe), k=10, exclude_id=0
    )


# Replays quantize (per-vector symmetric int8) on corpus AND probe, then
# the quantized cosine: int dot / (sqrt(int self-dot) * probe-norm) — all
# integer sums are exact in double (|q| <= 127, dim 64 -> max 2^20), so
# engine-side summation order is irrelevant and the single rounding
# sequence (sqrt -> multiply -> divide -> round 6) is IEEE-identical.
_ANN_QUANTIZED_ORACLE = """
WITH qp AS (
  SELECT CASE WHEN scale = 0 THEN list_transform(embedding, x -> 0)
              ELSE list_transform(embedding, x -> CAST(round(x / scale) AS INT))
         END AS qprobe
  FROM (
    SELECT embedding,
           CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE)
             / CAST(127.0 AS DOUBLE) AS scale
    FROM embeddings WHERE vec_id = 0
  )
),
qv AS (
  SELECT vec_id,
         CASE WHEN scale = 0 THEN list_transform(embedding, x -> 0)
              ELSE list_transform(embedding, x -> CAST(round(x / scale) AS INT))
         END AS qvec
  FROM (
    SELECT vec_id, embedding,
           CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE)
             / CAST(127.0 AS DOUBLE) AS scale
    FROM embeddings WHERE vec_id != 0
  )
)
SELECT vec_id,
       round(
         list_dot_product(CAST(qvec AS DOUBLE[]), CAST(qprobe AS DOUBLE[]))
         / (sqrt(list_dot_product(CAST(qvec AS DOUBLE[]), CAST(qvec AS DOUBLE[])))
            * sqrt(list_dot_product(CAST(qprobe AS DOUBLE[]), CAST(qprobe AS DOUBLE[])))),
         6) AS cos_sim_q
FROM qv CROSS JOIN qp
ORDER BY cos_sim_q DESC, vec_id ASC
LIMIT 10
"""


def cleaned_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cleaning pass: tag-strip + whitespace-collapse + trim +
    lowercase, with before/after char counts (the shrinkage a cleaning
    stage reports). Map-only expressions, value-oracled byte-for-byte."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        normalize_text("text").alias("clean_text"),
        F.length("text").alias("n_chars_raw"),
        F.length(normalize_text("text")).alias("n_chars_clean"),
    )


_CLEANED_ORACLE = """
SELECT doc_id,
       lower(trim(regexp_replace(regexp_replace(text, '<[^>]*>', ' ', 'g'),
                                 '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))) AS clean_text,
       length(text) AS n_chars_raw,
       length(lower(trim(regexp_replace(regexp_replace(text, '<[^>]*>', ' ', 'g'),
                                        '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')))) AS n_chars_clean
FROM documents
"""


def corpus_composition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition report per (source, lang): doc count, token
    volume, mean quality, and share of the corpus — the dashboard every
    mixture decision starts from (what the _MIX_WEIGHTS upsampling in
    mixed_corpus_docs consumes). One map-side-combined groupBy over
    scan-side features; the share ratio adds one single-partition window
    over the handful of GROUP rows (never the corpus). Mean quality uses
    the registry's decimal-sum rule: per-doc quality is already rounded
    to 6, so the decimal sum is exact and order-independent, then one
    double division."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source",
        "lang",
        token_count("text").alias("_nt"),
        quality_score("text").alias("_q"),
    )
    agg = per_doc.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_nt").alias("n_tokens"),
        F.round(
            F.sum(F.col("_q").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_quality"),
    )
    w = Window.partitionBy()
    return agg.select(
        "source",
        "lang",
        "n_docs",
        "n_tokens",
        "mean_quality",
        F.round(F.col("n_docs") / F.sum("n_docs").over(w), 6).alias("doc_share"),
    )


_COMPOSITION_ORACLE = r"""
WITH base AS (
  SELECT source, lang, text,
         CASE WHEN regexp_replace(text, '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g') = '' THEN []::VARCHAR[]
              ELSE string_split_regex(regexp_replace(text, '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g'), '[ \t\n\x0B\f\r]+') END AS toks
  FROM documents
),
q AS (
  SELECT source, lang, len(toks) AS nt,
         round((least(CAST(len(toks) AS DOUBLE) / 50.0, 1.0)
                + (1.0 - least((CASE WHEN length(text) = 0 THEN 0.0
                       ELSE CAST(length(text) - length(regexp_replace(text, '[^\w \t\n\x0B\f\r]', '', 'g')) AS DOUBLE)
                            / length(text) END) * 5, 1.0))
                + least((CASE WHEN len(toks) = 0 THEN 0.0
                       ELSE CAST(len(list_filter(toks, t -> lower(t) IN
                              ('the','and','of','to','is','you','that','it'))) AS DOUBLE)
                            / len(toks) END) * 4, 1.0)) / 3.0, 6) AS quality
  FROM base
),
g AS (
  SELECT source, lang, count(*) AS n_docs,
         CAST(sum(nt) AS BIGINT) AS n_tokens,
         round(CAST(sum(CAST(quality AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS mean_quality
  FROM q GROUP BY 1, 2
)
SELECT source, lang, n_docs, n_tokens, mean_quality,
       round(CAST(n_docs AS DOUBLE) / sum(n_docs) OVER (), 6) AS doc_share
FROM g
"""


def dedup_paragraphs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style cross-document paragraph dedup over the corpus
    (operators/dedup.py:dedup_paragraphs): every repeated non-empty line
    survives only at its globally first (doc_id, position) occurrence and
    each doc is rebuilt from its survivors — the boilerplate-removal pass
    document-level dedup cannot express. Fully value-oracled including
    the rebuilt text (string_agg replays the ordered rejoin)."""
    return dedup_paragraphs(_t(spark, sf_dir, "documents"))


_DEDUP_PARAGRAPHS_ORACLE = """
WITH tok AS (
  SELECT doc_id,
         list_filter(
           list_transform(string_split(text, chr(10)),
                          x -> regexp_replace(x, '^[ \\t\\x0B\\f\\r]+|[ \\t\\x0B\\f\\r]+$', '', 'g')),
           x -> x != '') AS l
  FROM documents
),
paras AS (
  SELECT doc_id,
         unnest(range(1, len(l) + 1)) - 1 AS pos,
         unnest(l) AS p
  FROM tok
),
kept AS (
  SELECT doc_id, pos, p,
         row_number() OVER (PARTITION BY md5(p) ORDER BY doc_id, pos) AS rn
  FROM paras
),
rebuilt AS (
  SELECT doc_id,
         string_agg(p, chr(10) ORDER BY pos) AS clean_text,
         CAST(count(*) AS INT) AS n_kept_paras
  FROM kept WHERE rn = 1 GROUP BY doc_id
)
SELECT t.doc_id,
       COALESCE(r.clean_text, '') AS clean_text,
       CAST(len(t.l) AS INT) AS n_paras,
       COALESCE(r.n_kept_paras, 0) AS n_kept_paras
FROM tok t LEFT JOIN rebuilt r ON r.doc_id = t.doc_id
"""


def pii_redacted_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over the corpus (operators/text.py:redact_pii): emails,
    IPv4s, and phone-shaped digit runs replaced by typed tokens with
    per-doc counts. Each stage counts/replaces on the previous stage's
    output; the oracle chains the identical regexp_replace sequence, so
    the redacted text itself is value-checked byte-for-byte."""
    return redact_pii(_t(spark, sf_dir, "documents"))


_PII = {name: pat for name, pat, _ in PII_PATTERNS}
_PII_ORACLE = f"""
WITH s1 AS (
  SELECT doc_id, text,
         CAST(len(regexp_extract_all(text, '{_PII["email"]}')) AS INT) AS n_email,
         regexp_replace(text, '{_PII["email"]}', '<EMAIL>', 'g') AS t1
  FROM documents
),
s2 AS (
  SELECT doc_id, n_email,
         CAST(len(regexp_extract_all(t1, '{_PII["ipv4"]}')) AS INT) AS n_ipv4,
         regexp_replace(t1, '{_PII["ipv4"]}', '<IP>', 'g') AS t2
  FROM s1
),
s3 AS (
  SELECT doc_id, n_email, n_ipv4,
         CAST(len(regexp_extract_all(t2, '{_PII["phone"]}')) AS INT) AS n_phone,
         regexp_replace(t2, '{_PII["phone"]}', '<PHONE>', 'g') AS redacted_text
  FROM s2
)
SELECT doc_id, redacted_text, n_email, n_ipv4, n_phone,
       (n_email + n_ipv4 + n_phone) > 0 AS has_pii
FROM s3
"""


def repetition_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality metrics per document (duplicate-line
    fractions, top-2-gram and duplicate-5-gram character coverage — the
    boilerplate/degenerate-text filter family; operators/text.py:
    repetition_stats). One tagged explode + two map-side-combined
    aggregations; every ratio is a single exact-int division, replayed
    bit-for-bit by the oracle."""
    return repetition_stats(_t(spark, sf_dir, "documents"))


_REPETITION_ORACLE = """
WITH tok AS (
  SELECT doc_id, text,
         CASE WHEN regexp_replace(text, '^[ \\t\\n\\x0B\\f\\r]+|[ \\t\\n\\x0B\\f\\r]+$', '', 'g') = ''
              THEN []::VARCHAR[]
              ELSE string_split_regex(
                     regexp_replace(text, '^[ \\t\\n\\x0B\\f\\r]+|[ \\t\\n\\x0B\\f\\r]+$', '', 'g'), '[ \\t\\n\\x0B\\f\\r]+')
         END AS t
  FROM documents
),
lines AS (
  SELECT doc_id, item FROM (
    SELECT doc_id,
           regexp_replace(unnest(string_split(text, chr(10))),
                          '^[ \\t\\x0B\\f\\r]+|[ \\t\\x0B\\f\\r]+$', '', 'g') AS item
    FROM documents
  ) WHERE item != ''
),
lc AS (SELECT doc_id, item, count(*) AS cnt FROM lines GROUP BY 1, 2),
ls AS (
  SELECT doc_id,
         CAST(sum(cnt) AS INT) AS n_lines,
         CAST(count(*) AS INT) AS n_dist,
         COALESCE(sum(CASE WHEN cnt > 1 THEN cnt * length(item) END), 0) AS dup_chars,
         sum(cnt * length(item)) AS tot_chars
  FROM lc GROUP BY doc_id
),
g2c AS (
  SELECT doc_id, g, count(*) AS cnt FROM (
    SELECT doc_id, unnest(CASE WHEN len(t) < 2 THEN []::VARCHAR[]
                               ELSE [array_to_string(t[i:i+1], ' ') FOR i IN range(1, len(t))]
                          END) AS g
    FROM tok
  ) GROUP BY 1, 2
),
top2 AS (
  SELECT doc_id, cnt, g FROM (
    SELECT doc_id, cnt, g,
           row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, g ASC) AS rn
    FROM g2c
  ) WHERE rn = 1
),
g5s AS (
  SELECT doc_id, sum(cnt * length(g)) AS dup5 FROM (
    SELECT doc_id, g, count(*) AS cnt FROM (
      SELECT doc_id, unnest(CASE WHEN len(t) < 5 THEN []::VARCHAR[]
                                 ELSE [array_to_string(t[i:i+4], ' ') FOR i IN range(1, len(t) - 3)]
                            END) AS g
      FROM tok
    ) GROUP BY 1, 2
  ) WHERE cnt > 1 GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(ls.n_lines, 0) AS n_lines,
       CASE WHEN COALESCE(ls.n_lines, 0) > 0
            THEN round(CAST(ls.n_lines - ls.n_dist AS DOUBLE) / ls.n_lines, 6)
            ELSE 0.0 END AS dup_line_frac,
       CASE WHEN COALESCE(ls.tot_chars, 0) > 0
            THEN round(CAST(ls.dup_chars AS DOUBLE) / ls.tot_chars, 6)
            ELSE 0.0 END AS dup_line_char_frac,
       CASE WHEN top2.g IS NOT NULL AND length(d.text) > 0
            THEN round(CAST(top2.cnt * length(top2.g) AS DOUBLE) / length(d.text), 6)
            ELSE 0.0 END AS top_2gram_char_frac,
       CASE WHEN length(d.text) > 0
            THEN round(CAST(COALESCE(g5s.dup5, 0) AS DOUBLE) / length(d.text), 6)
            ELSE 0.0 END AS dup_5gram_char_frac
FROM documents d
LEFT JOIN ls ON ls.doc_id = d.doc_id
LEFT JOIN top2 ON top2.doc_id = d.doc_id
LEFT JOIN g5s ON g5s.doc_id = d.doc_id
"""


def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc content fingerprints: exact (md5 of the full text — the
    exact-dedup key) and winnowing-style robust (min portable 60-bit hash
    over word 8-gram windows — stable under small edits outside the
    minimizing window; operators/text.py:rolling_fingerprint is the
    xxhash64 hot-path twin). Map-only: tokenize once, hash grams, one
    array_min — no shuffle."""
    from ..operators.dedup import shingle_hashes_from_tokens
    from ..operators.text import tokens

    docs = _t(spark, sf_dir, "documents")
    with_toks = docs.select("doc_id", F.col("text"), tokens("text").alias("_t"))
    gram_hashes = shingle_hashes_from_tokens(F.col("_t"), 8, hash_mode="md5")
    return with_toks.select(
        "doc_id",
        F.md5("text").alias("fingerprint"),
        F.array_min(gram_hashes).alias("rolling_fp"),
    )


_FINGERPRINTS_ORACLE = """
WITH tok AS (
  SELECT doc_id, text,
         CASE WHEN regexp_replace(text, '^[ \\t\\n\\x0B\\f\\r]+|[ \\t\\n\\x0B\\f\\r]+$', '', 'g') = ''
              THEN []::VARCHAR[]
              ELSE string_split_regex(
                     regexp_replace(text, '^[ \\t\\n\\x0B\\f\\r]+|[ \\t\\n\\x0B\\f\\r]+$', '', 'g'), '[ \\t\\n\\x0B\\f\\r]+')
         END AS t
  FROM documents
),
grams AS (
  SELECT doc_id, text,
         CASE WHEN len(t) = 0 THEN []::VARCHAR[]
              WHEN len(t) < 8 THEN [array_to_string(t, ' ')]
              ELSE [array_to_string(t[i:i+7], ' ') FOR i IN range(1, len(t) - 6)]
         END AS g
  FROM tok
)
SELECT doc_id,
       md5(text) AS fingerprint,
       (SELECT min(CAST(('0x' || substr(md5(u.x), 1, 15)) AS BIGINT))
        FROM unnest(g) AS u(x)) AS rolling_fp
FROM grams
"""


# Target language mix for the mixture query: en-dominant with long-tail
# upsampling (zh's natural share is ~3x its target's inverse — it gets
# repeated epochs). Weights and their sum are inlined as repr() literals
# into BOTH engines' expressions so the per-stratum double rates are
# bit-identical (same IEEE-754 ops in the same order).
_MIX_WEIGHTS = {"en": 0.5, "de": 0.2, "fr": 0.15, "es": 0.1, "zh": 0.05}


def mixed_corpus_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic language remix of the documents corpus to the
    _MIX_WEIGHTS proportions: under-represented languages are upsampled by
    whole-epoch repetition plus a content-hash-drawn fractional epoch,
    over-represented ones are downsampled — partitioning-invariant and
    replayed exactly by the SQL oracle (see operators.sampling.mix_corpus)."""
    return mix_corpus(
        _t(spark, sf_dir, "documents"),
        _MIX_WEIGHTS,
        strata_col="lang",
        key_col="doc_id",
    ).select("doc_id", "lang", "epoch")


_MIX_CASES = "\n".join(
    f"    ('{s}', {w!r})," for s, w in _MIX_WEIGHTS.items()
).rstrip(",")
_MIX_WSUM = repr(sum(_MIX_WEIGHTS.values()))

_MIX_ORACLE = f"""
WITH w(s, wt) AS (VALUES
{_MIX_CASES}
),
counts AS (SELECT lang AS s, count(*) AS n_s FROM documents GROUP BY lang),
total AS (
  SELECT CAST(sum(n_s) AS DOUBLE) AS t FROM counts JOIN w USING (s)
),
rates AS (
  SELECT s, (t * wt / {_MIX_WSUM}) / n_s AS rate
  FROM counts JOIN w USING (s), total
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


def contamination_check_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination report: per train-split doc, the count of
    distinct word 5-grams shared with ANY test-split doc and the resulting
    contaminated flag (GPT-3/PaLM-style n-gram collision rule; eval side
    broadcast, corpus side map-only — see operators.dedup.ngram_contamination)."""
    docs = train_test_split(_t(spark, sf_dir, "documents"), 0.1, key_col="doc_id")
    return ngram_contamination(
        docs.filter(F.col("split") == "train"),
        docs.filter(F.col("split") == "test"),
        n=5,
        min_common=1,
        # hit count here is bounded by the (held-out 10%) eval overlap on a
        # known corpus — the documented precondition for forcing the hint
        broadcast_hits=True,
    )


_CONTAMINATION_ORACLE = """
WITH tok AS (
  SELECT doc_id,
         CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '19999999'
              THEN 'test' ELSE 'train' END AS split,
         CASE WHEN regexp_replace(text, '^[ \\t\\n\\x0B\\f\\r]+|[ \\t\\n\\x0B\\f\\r]+$', '', 'g') = ''
              THEN []::VARCHAR[]
              ELSE string_split_regex(
                     regexp_replace(text, '^[ \\t\\n\\x0B\\f\\r]+|[ \\t\\n\\x0B\\f\\r]+$', '', 'g'), '[ \\t\\n\\x0B\\f\\r]+')
         END AS t
  FROM documents
),
sh AS (
  SELECT doc_id, split,
         list_distinct(
           CASE WHEN len(t) = 0 THEN []::VARCHAR[]
                WHEN len(t) < 5 THEN [array_to_string(t, ' ')]
                ELSE [array_to_string(t[i:i+4], ' ') FOR i IN range(1, len(t) - 3)]
           END
         ) AS sh
  FROM tok
),
eval_grams AS (
  SELECT DISTINCT unnest(sh) AS g FROM sh WHERE split = 'test'
),
hits AS (
  SELECT p.doc_id, count(*) AS n_common
  FROM (SELECT doc_id, unnest(sh) AS g FROM sh WHERE split = 'train') p
  JOIN eval_grams e ON p.g = e.g
  GROUP BY p.doc_id
)
SELECT s.doc_id,
       COALESCE(h.n_common, 0) AS n_common_grams,
       COALESCE(h.n_common, 0) >= 1 AS contaminated
FROM sh s LEFT JOIN hits h ON s.doc_id = h.doc_id
WHERE s.split = 'train'
"""


# --- corpus-level statistical scoring: TF-IDF keywords + bigram-LM nll ------


def tfidf_top_terms_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tfidf_top_terms(_t(spark, sf_dir, "documents"), k=5)


def bigram_lm_nll_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bigram_nll(_t(spark, sf_dir, "documents"))


# Shared CTE text: whitespace-split with the explicit Java-\s class (VT
# included — the r5/r6 oracle-divergence lesson), ASCII lowercasing via
# translate (lower() is locale-sensitive and differs between engines on
# e.g. Turkish I), edge-punctuation strip with the 'g' flag (DuckDB
# regexp_replace is first-match-only by default; Spark replaces all).
_TERMS_CTE = r"""
WITH tok AS (
  SELECT doc_id,
         CASE WHEN regexp_replace(text, '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g') = ''
              THEN []::VARCHAR[]
              ELSE string_split_regex(
                     regexp_replace(text, '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g'),
                     '[ \t\n\x0B\f\r]+') END AS t
  FROM documents
),
kept AS (
  SELECT doc_id, i, term FROM (
    SELECT doc_id, generate_subscripts(t, 1) AS i,
           regexp_replace(
             translate(unnest(t), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'),
             '^[^a-z0-9]+|[^a-z0-9]+$', '', 'g') AS term
    FROM tok
  ) WHERE regexp_matches(term, '^[a-z0-9]+$')
)
"""

_TFIDF_ORACLE = (
    _TERMS_CTE
    + r""",
tf AS (SELECT doc_id, term, count(*) AS tf FROM kept GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, term, tf, df,
         round(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 6) AS score
  FROM tf JOIN df USING (term) CROSS JOIN n
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, rank, term, CAST(tf AS INTEGER) AS tf, CAST(df AS INTEGER) AS df,
       score AS tfidf
FROM ranked WHERE rank <= 5
"""
)

_BIGRAM_NLL_ORACLE = (
    _TERMS_CTE
    + r""",
big AS (
  SELECT doc_id, term AS w1, lead(term) OVER (PARTITION BY doc_id ORDER BY i) AS w2
  FROM kept
),
bigrams AS (SELECT doc_id, w1, w2 FROM big WHERE w2 IS NOT NULL),
bc AS (SELECT w1, w2, count(*) AS c12 FROM bigrams GROUP BY 1, 2),
uc AS (SELECT w1, count(*) AS c1 FROM bigrams GROUP BY 1),
v AS (SELECT count(DISTINCT term) AS vv FROM kept),
per AS (
  SELECT doc_id, count(*) AS n_bigrams,
         - CAST(sum(CAST(round(ln((c12 + 1.0) / (c1 + vv)), 12) AS DECIMAL(28,14))) AS DOUBLE)
           / count(*) AS nll
  FROM bigrams JOIN bc USING (w1, w2) JOIN uc USING (w1) CROSS JOIN v
  GROUP BY doc_id
)
SELECT d.doc_id, CAST(coalesce(n_bigrams, 0) AS INTEGER) AS n_bigrams,
       round(nll, 6) AS avg_nll
FROM documents d LEFT JOIN per USING (doc_id)
"""
)


def ccnet_ppl_buckets_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail bucketing of the corpus by bigram-LM NLL
    terciles (operators.corpus_stats.perplexity_buckets) — the quality
    slicing CCNet applies before choosing what to keep. Shares the
    bigram-NLL scoring path; the oracle wraps the NLL oracle and replays
    the interpolated tercile cuts with quantile_cont (the percentile
    interpolation equivalence order_value_percentiles already pins)."""
    from ..operators.corpus_stats import perplexity_buckets

    return perplexity_buckets(_t(spark, sf_dir, "documents"))


_CCNET_BUCKETS_ORACLE = f"""
WITH scored AS ({_BIGRAM_NLL_ORACLE}),
valid AS (SELECT * FROM scored WHERE avg_nll IS NOT NULL),
cuts AS (
  SELECT quantile_cont(avg_nll, {1 / 3!r}) AS c1,
         quantile_cont(avg_nll, {2 / 3!r}) AS c2
  FROM valid
)
SELECT doc_id, n_bigrams, avg_nll,
       CASE WHEN avg_nll <= c1 THEN 'head'
            WHEN avg_nll <= c2 THEN 'middle'
            ELSE 'tail' END AS ppl_bucket
FROM valid, cuts
"""


# --- exact duplicated-substring spans (Lee et al. 2022 granularity) ---------


def duplicate_spans_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return duplicate_spans(_t(spark, sf_dir, "documents"), k=8)


_DUP_SPANS_ORACLE = r"""
WITH tok AS (
  SELECT doc_id,
         CASE WHEN regexp_replace(text, '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g') = ''
              THEN []::VARCHAR[]
              ELSE string_split_regex(
                     regexp_replace(text, '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g'),
                     '[ \t\n\x0B\f\r]+') END AS t
  FROM documents
),
base AS (SELECT doc_id, len(t) AS n_tokens, t FROM tok),
grams0 AS (
  SELECT doc_id,
         CASE WHEN len(t) < 8 THEN []::VARCHAR[]
              ELSE [array_to_string(t[i:i+7], ' ') FOR i IN range(1, len(t) - 6)] END AS gs
  FROM base
),
grams AS (
  SELECT doc_id, generate_subscripts(gs, 1) - 1 AS pos,
         md5(unnest(gs)) AS gh  -- full 128-bit key: independent of the engine's 120-bit two-long key
  FROM grams0
),
duph AS (SELECT gh FROM grams GROUP BY gh HAVING count(*) >= 2),
dup AS (SELECT g.doc_id, g.pos FROM grams g JOIN duph USING (gh)),
flagged AS (
  SELECT doc_id, pos,
         CASE WHEN max(pos + 7) OVER (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              OR pos > max(pos + 7) OVER (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS ni
  FROM dup
),
isl AS (
  SELECT doc_id, pos,
         sum(ni) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM flagged
),
spans AS (
  SELECT doc_id, island, min(pos) AS s, max(pos) AS e, count(*) AS c
  FROM isl GROUP BY 1, 2
),
per AS (
  SELECT doc_id, count(*) AS n_dup_spans, sum(e + 8 - s) AS dup_tokens,
         sum(c) AS n_dup_grams
  FROM spans GROUP BY 1
)
SELECT b.doc_id,
       CAST(b.n_tokens AS INTEGER) AS n_tokens,
       CAST(greatest(b.n_tokens - 7, 0) AS INTEGER) AS n_grams,
       CAST(coalesce(p.n_dup_grams, 0) AS INTEGER) AS n_dup_grams,
       CAST(coalesce(p.n_dup_spans, 0) AS INTEGER) AS n_dup_spans,
       CAST(coalesce(p.dup_tokens, 0) AS INTEGER) AS dup_tokens,
       CASE WHEN b.n_tokens = 0 THEN 0.0
            ELSE CAST(coalesce(p.dup_tokens, 0) AS DOUBLE) / b.n_tokens END AS dup_frac
FROM base b LEFT JOIN per p USING (doc_id)
"""


def stripped_spans_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return strip_duplicate_spans(_t(spark, sf_dir, "documents"), k=8)


_STRIP_SPANS_ORACLE = r"""
WITH tok AS (
  SELECT doc_id,
         CASE WHEN regexp_replace(text, '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g') = ''
              THEN []::VARCHAR[]
              ELSE string_split_regex(
                     regexp_replace(text, '^[ \t\n\x0B\f\r]+|[ \t\n\x0B\f\r]+$', '', 'g'),
                     '[ \t\n\x0B\f\r]+') END AS t
  FROM documents
),
base AS (SELECT doc_id, len(t) AS n_tokens, t FROM tok),
grams0 AS (
  SELECT doc_id,
         CASE WHEN len(t) < 8 THEN []::VARCHAR[]
              ELSE [array_to_string(t[i:i+7], ' ') FOR i IN range(1, len(t) - 6)] END AS gs
  FROM base
),
grams AS (
  SELECT doc_id, generate_subscripts(gs, 1) - 1 AS pos,
         md5(unnest(gs)) AS gh  -- full 128-bit key: independent of the engine's 120-bit two-long key
  FROM grams0
),
occ AS (
  SELECT doc_id, pos,
         row_number() OVER (PARTITION BY gh ORDER BY doc_id, pos) AS rn
  FROM grams
),
red AS (SELECT doc_id, pos FROM occ WHERE rn > 1),
covered AS (SELECT DISTINCT doc_id, pos + i AS tpos FROM red, range(0, 8) r(i)),
toksx AS (
  SELECT doc_id, generate_subscripts(t, 1) - 1 AS tpos, unnest(t) AS tok FROM base
),
kept AS (
  SELECT x.doc_id, x.tpos, x.tok
  FROM toksx x LEFT JOIN covered c ON x.doc_id = c.doc_id AND x.tpos = c.tpos
  WHERE c.doc_id IS NULL
),
reb AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY tpos) AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY 1
)
SELECT b.doc_id,
       coalesce(r.clean_text, '') AS clean_text,
       CAST(b.n_tokens AS INTEGER) AS n_tokens,
       CAST(coalesce(r.n_kept, 0) AS INTEGER) AS n_kept_tokens,
       CAST(b.n_tokens - coalesce(r.n_kept, 0) AS INTEGER) AS n_removed_tokens
FROM base b LEFT JOIN reb r USING (doc_id)
"""


QUERIES = [
    QuerySpec("dedup_exact_docs", dedup_exact_docs, _DEDUP_EXACT_ORACLE),
    QuerySpec("contamination_check_docs", contamination_check_docs, _CONTAMINATION_ORACLE),
    QuerySpec("jaccard_near_dup_pairs", jaccard_near_dup_pairs, _JACCARD_ORACLE, headline=True),
    QuerySpec("minhash_near_dup_pairs", minhash_near_dup_pairs, _JACCARD_ORACLE, headline=True),
    QuerySpec("simhash_near_dup_pairs", simhash_near_dup_pairs, _SIMHASH_ORACLE),
    QuerySpec("dedup_groups_docs", dedup_groups_docs, _DEDUP_GROUPS_ORACLE),
    QuerySpec("sample_docs_stratified", sample_docs_stratified, _SAMPLE_ORACLE),
    QuerySpec("train_test_split_docs", train_test_split_docs, _SPLIT_ORACLE),
    QuerySpec("mixed_corpus_docs", mixed_corpus_docs, _MIX_ORACLE),
    QuerySpec("doc_fingerprints", doc_fingerprints, _FINGERPRINTS_ORACLE),
    QuerySpec("cleaned_docs", cleaned_docs, _CLEANED_ORACLE),
    QuerySpec("embedding_quantized", embedding_quantized, _QUANTIZED_ORACLE),
    QuerySpec("ann_quantized_topk", ann_quantized_topk, _ANN_QUANTIZED_ORACLE, headline=True),
    QuerySpec("top_bigrams_per_lang", top_bigrams_per_lang, _TOP_NGRAMS_ORACLE),
    QuerySpec("doc_chunks", doc_chunks, _CHUNKS_ORACLE),
    QuerySpec("knn_cosine_bruteforce", knn_cosine_bruteforce, _KNN_ORACLE, headline=True),
    QuerySpec("ann_srp_topk", ann_srp_topk, _ANN_SRP_ORACLE),
    QuerySpec("ann_ivf_topk", ann_ivf_topk, _ANN_IVF_ORACLE),
    QuerySpec("ann_ivfpq_topk", ann_ivfpq_topk, _ANN_IVFPQ_ORACLE),
    QuerySpec(
        "ann_ivfadc_residual_topk", ann_ivfadc_residual_topk, _ANN_IVFADC_ORACLE
    ),
    QuerySpec(
        "ann_ivfadc_probe", ann_ivfadc_probe, _ANN_IVFADC_ORACLE, headline=True
    ),
    QuerySpec(
        "ann_ivfadc_probe_lifecycle",
        ann_ivfadc_probe_lifecycle,
        # one oracle replay per lane, lane-tagged — each maintenance
        # mode stays independently value-checked
        " UNION ALL ".join(
            f"SELECT '{lane}' AS lane, * FROM ({sql})"
            for lane, sql in [
                ("incremental", _ivfadc_oracle("vec_id % 2 = 0")),
                ("streaming", _ivfadc_oracle("vec_id % 2 = 0")),
                ("deleted", _ivfadc_oracle(delete_where="vec_id % 7 = 3")),
                ("trained", _ivfadc_oracle(book_iters=2)),
            ]
        ),
    ),
    QuerySpec(
        "ann_ivfadc_books_trained_topk",
        ann_ivfadc_books_trained_topk,
        _ivfadc_oracle(book_iters=2),
    ),
    QuerySpec(
        "ann_ivfadc_index_health", ann_ivfadc_index_health, _ANN_HEALTH_ORACLE
    ),
    QuerySpec(
        "ann_ivfadc_rebuild_decision",
        ann_ivfadc_rebuild_decision,
        _ANN_REBUILD_DECISION_ORACLE,
    ),
    QuerySpec(
        "ann_ivfadc_refined",
        ann_ivfadc_refined,
        _ivfadc_oracle(book_iters=2, picked_target=0.95),
    ),
    QuerySpec(
        "ann_ivfadc_tune_nprobe", ann_ivfadc_tune_nprobe, _ANN_TUNE_ORACLE
    ),
    QuerySpec(
        "cluster_balanced_embeddings",
        cluster_balanced_embeddings,
        _CLUSTER_BALANCED_ORACLE,
    ),
    QuerySpec(
        "cluster_balanced_streaming",
        cluster_balanced_streaming,
        _CLUSTER_BALANCED_ORACLE,
    ),
    QuerySpec(
        "embedding_near_dup_pairs",
        embedding_near_dup_pairs,
        f"SELECT 'exact' AS lane, * FROM ({_COS_PAIRS_ORACLE}) "
        f"UNION ALL SELECT 'lsh' AS lane, * FROM ({_COS_PAIRS_LSH_ORACLE})",
    ),
    QuerySpec("text_stats_docs", text_stats_docs, _TEXT_STATS_ORACLE),
    QuerySpec(
        "gopher_quality_docs", gopher_quality_docs, _GOPHER_ORACLE, headline=True
    ),
    QuerySpec("repetition_stats_docs", repetition_stats_docs, _REPETITION_ORACLE, headline=True),
    QuerySpec("dedup_paragraphs_docs", dedup_paragraphs_docs, _DEDUP_PARAGRAPHS_ORACLE, headline=True),
    QuerySpec("pii_redacted_docs", pii_redacted_docs, _PII_ORACLE, headline=True),
    QuerySpec("corpus_composition", corpus_composition, _COMPOSITION_ORACLE),
    QuerySpec("multimodal_byte_stats", multimodal_byte_stats, _MULTIMODAL_ORACLE),
    QuerySpec("multimodal_image_decode", multimodal_image_decode, _IMAGE_DECODE_ORACLE),
    QuerySpec("multimodal_jpeg_decode", multimodal_jpeg_decode, _JPEG_DECODE_ORACLE),
    QuerySpec("multimodal_audio_decode", multimodal_audio_decode, _AUDIO_DECODE_ORACLE),
    QuerySpec("multimodal_video_decode", multimodal_video_decode, _VIDEO_DECODE_ORACLE),
    QuerySpec("multimodal_resize_decode", multimodal_resize_decode, _RESIZE_DECODE_ORACLE),
    QuerySpec("multimodal_features", multimodal_features, _MULTIMODAL_FEATURES_ORACLE),
    QuerySpec(
        "multimodal_frame_sample", multimodal_frame_sample, _FRAME_SAMPLE_ORACLE
    ),
    # packed_chunks is registered from bytetok_queries as the two-head
    # (words/bytes) lane-tagged query (r17 window consolidation)
    QuerySpec(
        "packing_efficiency_report",
        packing_efficiency_report,
        _PACKING_EFFICIENCY_ORACLE,
    ),
    QuerySpec("quality_filter_docs", quality_filter_docs, _QUALITY_FILTER_ORACLE),
    QuerySpec("tfidf_top_terms_docs", tfidf_top_terms_docs, _TFIDF_ORACLE, headline=True),
    QuerySpec("duplicate_spans_docs", duplicate_spans_docs, _DUP_SPANS_ORACLE, headline=True),
    QuerySpec("stripped_spans_docs", stripped_spans_docs, _STRIP_SPANS_ORACLE),
    QuerySpec("bigram_lm_nll_docs", bigram_lm_nll_docs, _BIGRAM_NLL_ORACLE, headline=True),
    QuerySpec("ccnet_ppl_buckets_docs", ccnet_ppl_buckets_docs, _CCNET_BUCKETS_ORACLE),
]
