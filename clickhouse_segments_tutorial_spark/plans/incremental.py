"""Incremental corpus curation: the reference's micro-batch philosophy
applied to the LLM-pipeline pillar.

The batch `corpus_pipeline` (plans/pipeline.py) recomputes the whole chain
per run — correct, but at 100 TB you cannot re-dedup the full corpus for
every new drop. The reference exists to demonstrate the alternative for
segmentation (`3-microBatch.test.ts:116-154`: persisted partial state +
per-batch work bounded by NEW data); this module is the same design for
corpus curation. Per ingested wave, the work is O(wave + state lookups):

- **paragraph-hash state** (`para_hashes/`): every paragraph md5 ever
  seen. A wave's paragraphs anti-join it (CCNet first-occurrence
  semantics across the whole ingest history), then dedup within the wave
  by the same groupBy(md5).agg(min(struct(id, pos, p))) partial-agg shape
  as the batch operator.
- **text-fingerprint state** (`text_fps/`): md5 of every nonempty
  normalized text ever seen — the streaming-exact-dedup accumulator
  (`streaming/stream_dedup.py` holds the same state inside a Spark state
  store; here it is an explicit parquet table the batch planner can
  prune).
- **LSH index state** (`exd_bands/` + `exd_shingles/`): the banded
  MinHash keys and shingle sets of every exact-dedup survivor —
  *exactly* the "write this to storage instead; it is the reusable
  index" note on `minhash_lsh_pairs`. New waves band-join against it, so
  candidate generation is new-vs-all, never all-vs-all.
- **fixed eval-gram set**: decontamination state. Incremental curation
  FORCES the honest eval contract the batch pipeline can only document:
  the benchmark suite must exist before ingestion (a fractional holdout
  of a corpus that hasn't fully arrived is unknowable), and retroactive
  revocation is impossible — an accepted doc stays accepted.

Semantics are **first-ACCEPTED-wins** (the ingest-gate contract of
`StreamingDeduper`), with one documented divergence from the batch
pipeline: a later *bridge* doc that is near-dup of two previously
accepted groups is simply rejected — it cannot retroactively merge the
groups or revoke their representatives, where a batch recompute would
merge them and keep only the global-min id. Near-dup decisions within a
wave use connected components with *anchor-drop*: a component any member
of which verifies (exact Jaccard >= threshold) against ANY prior
exact-dedup survivor is dropped whole — its docs are duplicates of
already-ingested content transitively.

Every per-wave step materializes to the state directory before the state
it read from is appended (the same write-then-advance discipline as the
micro-batch segmenter), so a crashed ingest can be re-run.

The registered query `corpus_curated_incremental` replays a two-wave
ingest (wave = doc_id parity — deterministic and scale-free) and is
VALUE-ORACLED: the DuckDB oracle replays the incremental semantics
themselves (min(wave)-owns-the-hash for both paragraph and text state,
per-wave components with cross-wave anchor-drop, fixed eval grams), not
the batch chain — so the first-accepted-wins contract is what the
correctness gate checks.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.components import connected_components
from ..operators.dedup import banded_minhash_keys, shingled_docs
from ..operators.text import normalize_text, quality_score, token_count
from ..sources import load_table
from .pipeline import _LINE_WS, _normalize, _shingles, _toks
from .registry import QuerySpec

_STATE_SCHEMAS = {
    "para_hashes": "_h string",
    "text_fps": "_fp string",
    "exd_bands": "_id long, band int, bucket long",
    "exd_shingles": "_id long, _sh array<bigint>",
    "curated": "doc_id long, lang string, text string, n_tokens int",
}


class IncrementalCorpusCurator:
    """Stateful micro-batch corpus curation (module docstring).

    ``eval_grams``: DataFrame of xxhash64'd word 5-grams (column ``_g``)
    of the NORMALIZED benchmark texts — the fixed decontamination set,
    written into the state dir at construction."""

    def __init__(
        self,
        spark: SparkSession,
        workdir: str,
        eval_grams: DataFrame,
        *,
        n: int = 3,
        k: int = 64,
        bands: int = 32,
        threshold: float = 0.8,
        contamination_n: int = 5,
        quality_min: float = 0.5,
        min_tokens: int = 10,
        max_tokens: int = 5000,
    ):
        self.spark = spark
        self.workdir = workdir
        self.n, self.k, self.bands, self.threshold = n, k, bands, threshold
        self.contamination_n = contamination_n
        self.quality_min = quality_min
        self.min_tokens, self.max_tokens = min_tokens, max_tokens
        self._wave = 0
        os.makedirs(workdir, exist_ok=True)
        eval_path = os.path.join(workdir, "eval_grams")
        if not os.path.exists(eval_path):
            eval_grams.select("_g").distinct().write.parquet(eval_path)
        self.eval_grams = spark.read.parquet(eval_path)

    # -- state plumbing --------------------------------------------------

    def _path(self, name: str) -> str:
        return os.path.join(self.workdir, name)

    def _read(self, name: str) -> DataFrame:
        p = self._path(name)
        if os.path.exists(p):
            return self.spark.read.parquet(p)
        return self.spark.createDataFrame([], _STATE_SCHEMAS[name])

    def _append(self, df: DataFrame, name: str) -> None:
        df.write.mode("append").parquet(self._path(name))

    def _materialize(self, df: DataFrame, name: str) -> DataFrame:
        """Write a per-wave intermediate and read it back: stages that
        consume state MUST be pinned to files before that state is
        appended, or lazy lineage would re-read the grown state."""
        p = os.path.join(self.workdir, "tmp", f"w{self._wave}_{name}")
        df.write.mode("overwrite").parquet(p)
        return self.spark.read.parquet(p)

    # -- ingest ----------------------------------------------------------

    def ingest(self, wave: DataFrame) -> DataFrame:
        """Curate one wave of raw docs (doc_id, lang, text) against all
        prior state; returns the accepted rows (also appended to
        ``curated/``)."""
        self._wave += 1
        ws = "[ \\t\\x0B\\f\\r]+"
        paras = F.filter(
            F.transform(
                F.split(F.col("text"), "\n"),
                lambda p: F.regexp_replace(p, f"^{ws}|{ws}$", ""),
            ),
            lambda p: p != "",
        )
        exploded = wave.select(
            F.col("doc_id").alias("_id"), F.posexplode(paras).alias("_pos", "_p")
        ).withColumn("_h", F.md5("_p"))

        # 1. paragraph dedup: drop history-seen hashes, then within-wave
        # first occurrence (same partial-agg shape as dedup_paragraphs)
        fresh = exploded.join(self._read("para_hashes"), "_h", "left_anti")
        kept_paras = (
            fresh.groupBy("_h")
            .agg(F.min(F.struct("_id", "_pos", "_p")).alias("_f"))
            .select(
                F.col("_f._id").alias("_id"),
                F.col("_f._pos").alias("_pos"),
                F.col("_f._p").alias("_p"),
            )
        )
        rebuilt = kept_paras.groupBy("_id").agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_p"))),
                    lambda s: s["_p"],
                ),
                "\n",
            ).alias("_clean")
        )
        # 2-3. normalize, drop emptied docs, re-attach lang
        norm = (
            rebuilt.select(F.col("_id").alias("doc_id"), normalize_text("_clean").alias("text"))
            .filter(F.length("text") > 0)
            .join(wave.select("doc_id", "lang"), "doc_id")
        )
        norm = self._materialize(norm, "norm")
        # state advance AFTER the consumer is pinned; every paragraph of
        # the wave enters state (batch parity: rejected docs' boilerplate
        # still counts as seen). The delta is materialized FIRST — an
        # append whose plan also scans the target dir is a read-your-
        # writes hazard.
        new_h = self._materialize(
            exploded.select("_h").distinct().join(
                self._read("para_hashes"), "_h", "left_anti"
            ),
            "new_para_hashes",
        )
        self._append(new_h, "para_hashes")

        # 4. exact dedup: history fps, then within-wave min id
        fp = norm.withColumn("_fp", F.md5("text"))
        fp_new = fp.join(self._read("text_fps"), "_fp", "left_anti")
        exd_new = (
            fp_new.groupBy("_fp")
            .agg(F.min(F.struct("doc_id", "lang", "text")).alias("_f"))
            .select("_f.doc_id", "_f.lang", "_f.text")
        )
        exd_new = self._materialize(exd_new, "exd")
        new_fp = self._materialize(
            fp.select("_fp").distinct().join(
                self._read("text_fps"), "_fp", "left_anti"
            ),
            "new_text_fps",
        )
        self._append(new_fp, "text_fps")

        # 5. near-dup: band-join the wave against the persisted LSH index
        # (new-vs-all candidates only), CC within the wave, anchor-drop
        sh_new = shingled_docs(exd_new, n=self.n).persist()
        bands_new = banded_minhash_keys(sh_new, k=self.k, bands=self.bands).persist()
        old_bands = self._read("exd_bands")
        old_sh = self._read("exd_shingles")
        cand_old = (
            bands_new.alias("a")
            .join(
                old_bands.alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket")),
            )
            .select(F.col("a._id").alias("_new"), F.col("b._id").alias("_old"))
            .distinct()
        )
        anchored = (
            cand_old.join(sh_new.select(F.col("_id").alias("_new"), F.col("_sh").alias("_sa")), "_new")
            .join(old_sh.select(F.col("_id").alias("_old"), F.col("_sh").alias("_sb")), "_old")
            .filter(
                F.size(F.array_intersect("_sa", "_sb"))
                / F.size(F.array_union("_sa", "_sb"))
                >= self.threshold
            )
            .select(F.col("_new").alias("node"))
            .distinct()
        )
        cand_new = (
            bands_new.alias("a")
            .join(
                bands_new.alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a._id") < F.col("b._id")),
            )
            .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
            .distinct()
        )
        pairs = (
            cand_new.join(sh_new.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sa")), "id_a")
            .join(sh_new.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_sb")), "id_b")
            .filter(
                F.size(F.array_intersect("_sa", "_sb"))
                / F.size(F.array_union("_sa", "_sb"))
                >= self.threshold
            )
            .select("id_a", "id_b")
        )
        comps = connected_components(pairs)  # (node, component)
        anchored_comps = comps.join(anchored, "node").select("component").distinct()
        drops = (
            anchored.select(F.col("node").alias("doc_id"))
            .union(
                comps.join(anchored_comps, "component").select(
                    F.col("node").alias("doc_id")
                )
            )
            .union(
                comps.filter(F.col("node") != F.col("component")).select(
                    F.col("node").alias("doc_id")
                )
            )
            .distinct()
        )
        kept = exd_new.join(drops, "doc_id", "left_anti")
        kept = self._materialize(kept, "kept")
        self._append(bands_new, "exd_bands")
        self._append(sh_new.select("_id", "_sh"), "exd_shingles")
        sh_new.unpersist()
        bands_new.unpersist()

        # 6. decontamination vs the FIXED eval-gram state
        contaminated = (
            shingled_docs(kept, n=self.contamination_n)
            .select(F.col("_id").alias("doc_id"), F.explode("_sh").alias("_g"))
            .join(self.eval_grams, "_g", "left_semi")
            .select("doc_id")
            .distinct()
        )
        clean = kept.join(contaminated, "doc_id", "left_anti")
        # 7. quality gate
        accepted = clean.filter(
            (quality_score("text") >= self.quality_min)
            & token_count("text").between(self.min_tokens, self.max_tokens)
        ).select(
            "doc_id", "lang", "text", token_count("text").cast("int").alias("n_tokens")
        )
        accepted = self._materialize(accepted, "accepted")
        self._append(accepted, "curated")
        return accepted

    def curated(self) -> DataFrame:
        return self._read("curated")


def eval_grams_from_docs(
    eval_docs: DataFrame, *, n: int = 5, text_col: str = "text"
) -> DataFrame:
    """The fixed decontamination set: distinct xxhash64'd word n-grams of
    the NORMALIZED benchmark texts (normalization only — benchmark docs
    are external, they don't go through paragraph dedup)."""
    normed = eval_docs.select(
        F.col("doc_id"), normalize_text(text_col).alias("text")
    )
    return (
        shingled_docs(normed, n=n)
        .select(F.explode("_sh").alias("_g"))
        .distinct()
    )


def corpus_curated_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-wave incremental curation of the documents table: the
    hash-test split is the fixed benchmark suite, the train side arrives
    as two waves (doc_id parity), each curated against all prior state.
    Returns the curated corpus as (doc_id, lang, text_fp, n_tokens) —
    the md5 keeps the compared surface byte-exact without hashing whole
    documents through the driver.

    The result is a LAZY DataFrame over the ``curated/`` state table,
    which lives in the session-scoped scratch warehouse (atexit-cleaned,
    see :func:`session.scratch_dir`) — NEVER a ``.collect()`` of
    corpus-proportional rows through the driver (at 1B docs even thin
    (id, lang, md5, int) rows are tens of GB). Only the wave-state
    tables (LSH index, fingerprint sets, per-wave pins) are dropped
    eagerly once ingest completes."""
    import shutil

    from ..session import scratch_dir

    docs = load_table(spark, sf_dir, "documents")
    is_eval = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8) < "19999999"
    evals = docs.filter(is_eval)
    feed = docs.filter(~is_eval).select("doc_id", "lang", "text")
    workdir = scratch_dir("inc-curator")
    cur = IncrementalCorpusCurator(spark, workdir, eval_grams_from_docs(evals))
    cur.ingest(feed.filter(F.col("doc_id") % 2 == 0))
    cur.ingest(feed.filter(F.col("doc_id") % 2 == 1))
    # the replay is one-shot: free the (corpus-sized) dedup state now;
    # curated/ stays on disk until the warehouse atexit cleanup so the
    # returned plan stays valid for the caller's whole session
    for name in ("tmp", "para_hashes", "text_fps", "exd_bands", "exd_shingles", "eval_grams"):
        shutil.rmtree(os.path.join(workdir, name), ignore_errors=True)
    return cur.curated().select(
        "doc_id", "lang", F.md5("text").alias("text_fp"), "n_tokens"
    )


def _wave_expr(w: int) -> str:
    return f"doc_id % 2 = {0 if w == 1 else 1}"


def _incremental_oracle() -> str:
    """DuckDB replay of the two-wave INCREMENTAL semantics (not the batch
    chain): min(wave) owns each paragraph hash and text fingerprint;
    near-dup components are per wave with cross-wave anchor-drop against
    every earlier exact-dedup survivor; eval grams are the fixed
    benchmark set (normalized test-split texts)."""
    q = r"""
WITH RECURSIVE
sp AS (
  SELECT *, substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '19999999' AS is_eval
  FROM documents
),
feed AS (
  SELECT doc_id, lang, text, CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END AS wave
  FROM sp WHERE NOT is_eval
),
ev_tok AS (
  SELECT {TOKS_NORM_TEXT} AS t FROM sp WHERE is_eval
),
ev_grams AS (SELECT DISTINCT unnest({SH5_T}) AS g FROM ev_tok),
-- paragraph state: min(wave) owns the hash; first (id, pos) within it
p_tok AS (
  SELECT doc_id, wave,
         list_filter(
           list_transform(string_split(text, chr(10)),
                          x -> regexp_replace(x, '^{LINE_WS}+|{LINE_WS}+$', '', 'g')),
           x -> x != '') AS l
  FROM feed
),
p_paras AS (
  SELECT doc_id, wave, unnest(range(1, len(l) + 1)) - 1 AS pos, unnest(l) AS p
  FROM p_tok
),
p_kept AS MATERIALIZED (
  SELECT doc_id, pos, p FROM (
    SELECT doc_id, wave, pos, p,
           min(wave) OVER (PARTITION BY md5(p)) AS fw,
           row_number() OVER (PARTITION BY md5(p), wave ORDER BY doc_id, pos) AS rn
    FROM p_paras)
  WHERE wave = fw AND rn = 1
),
p_rebuilt AS MATERIALIZED (
  SELECT doc_id, string_agg(p, chr(10) ORDER BY pos) AS clean_text
  FROM p_kept GROUP BY doc_id
),
nz AS MATERIALIZED (
  SELECT f.doc_id, f.wave, f.lang, {NORM_CLEAN} AS text
  FROM feed f JOIN p_rebuilt r USING (doc_id)
  WHERE {NORM_CLEAN} != ''
),
-- text-fp state: min(wave) owns the fingerprint; min id within it
exd AS MATERIALIZED (
  SELECT doc_id, wave, lang, text FROM (
    SELECT *, min(wave) OVER (PARTITION BY md5(text)) AS fw,
           row_number() OVER (PARTITION BY md5(text), wave ORDER BY doc_id) AS rn
    FROM nz)
  WHERE wave = fw AND rn = 1
),
-- near-dup: exact-Jaccard pair graph over all exd (the LSH index finds
-- exactly these pairs: banding recall is 1 at J >= 0.8 on this corpus)
g_sh AS MATERIALIZED (SELECT doc_id, wave, {SH3_TOKS} AS sh FROM exd),
g_post AS (SELECT doc_id, wave, len(sh) AS n, unnest(sh) AS g FROM g_sh),
g_pairs AS MATERIALIZED (
  SELECT a.doc_id AS id_a, a.wave AS wave_a, b.doc_id AS id_b, b.wave AS wave_b
  FROM g_post a JOIN g_post b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4, a.n, b.n
  HAVING CAST(count(*) AS DOUBLE) / (a.n + b.n - count(*)) >= 0.8
),
-- wave-1 components (no anchors: no earlier state)
e1 AS (
  SELECT id_a AS u, id_b AS v FROM g_pairs WHERE wave_a = 1 AND wave_b = 1
  UNION SELECT id_b, id_a FROM g_pairs WHERE wave_a = 1 AND wave_b = 1
),
reach1(node, r) AS (
  SELECT doc_id, doc_id FROM exd WHERE wave = 1
  UNION
  SELECT reach1.node, e.v FROM reach1 JOIN e1 e ON reach1.r = e.u
),
keep1 AS (SELECT node AS doc_id FROM reach1 GROUP BY node HAVING min(r) = node),
-- wave-2: anchors = verified pair to ANY wave-1 exd survivor
anchors2 AS (
  SELECT DISTINCT CASE WHEN wave_a = 2 THEN id_a ELSE id_b END AS doc_id
  FROM g_pairs WHERE wave_a <> wave_b
),
e2 AS (
  SELECT id_a AS u, id_b AS v FROM g_pairs WHERE wave_a = 2 AND wave_b = 2
  UNION SELECT id_b, id_a FROM g_pairs WHERE wave_a = 2 AND wave_b = 2
),
reach2(node, r) AS (
  SELECT doc_id, doc_id FROM exd WHERE wave = 2
  UNION
  SELECT reach2.node, e.v FROM reach2 JOIN e2 e ON reach2.r = e.u
),
comp2 AS MATERIALIZED (SELECT node, min(r) AS component FROM reach2 GROUP BY node),
bad_comps AS (
  SELECT DISTINCT c.component FROM comp2 c JOIN anchors2 a ON c.node = a.doc_id
),
keep2 AS (
  SELECT node AS doc_id FROM comp2
  WHERE node = component AND component NOT IN (SELECT component FROM bad_comps)
),
kept AS MATERIALIZED (
  SELECT e.* FROM exd e JOIN (SELECT * FROM keep1 UNION ALL SELECT * FROM keep2) k
  USING (doc_id)
),
-- decontamination vs the FIXED benchmark grams
c_sh AS (SELECT doc_id, {SH5_TOKS} AS sh FROM kept),
c_bad AS (
  SELECT DISTINCT p.doc_id
  FROM (SELECT doc_id, unnest(sh) AS g FROM c_sh) p
  JOIN ev_grams e ON p.g = e.g
),
clean AS (
  SELECT doc_id, lang, text FROM kept
  WHERE doc_id NOT IN (SELECT doc_id FROM c_bad)
),
q AS (SELECT doc_id, lang, text, {TOKS_TEXT} AS t FROM clean)
SELECT doc_id, lang, md5(text) AS text_fp, CAST(len(t) AS INT) AS n_tokens
FROM q
WHERE len(t) BETWEEN 10 AND 5000
  AND round((least(CAST(len(t) AS DOUBLE) / 50.0, 1.0)
       + (1.0 - least((CASE WHEN length(text) = 0 THEN 0.0
              ELSE CAST(length(text) - length(regexp_replace(text, '{PUNCT}', '', 'g')) AS DOUBLE)
                   / length(text) END) * 5, 1.0))
       + least((CASE WHEN len(t) = 0 THEN 0.0
              ELSE CAST(len(list_filter(t, x -> lower(x) IN
                     ('the','and','of','to','is','you','that','it'))) AS DOUBLE)
                   / len(t) END) * 4, 1.0)) / 3.0, 6) >= 0.5
"""
    ws = r"[ \t\n\x0B\f\r]"
    return (
        q.replace("{TOKS_NORM_TEXT}", _toks(_normalize("text")))
        .replace("{NORM_CLEAN}", _normalize("r.clean_text"))
        .replace("{SH5_T}", _shingles("t", 5))
        .replace("{SH3_TOKS}", _shingles(_toks("text"), 3))
        .replace("{SH5_TOKS}", _shingles(_toks("text"), 5))
        .replace("{TOKS_TEXT}", _toks("text"))
        .replace("{LINE_WS}", _LINE_WS)
        .replace("{PUNCT}", "[^\\w" + ws[1:])
    )


QUERIES = [
    QuerySpec(
        "corpus_curated_incremental", corpus_curated_incremental, _incremental_oracle()
    ),
]
