"""KMV (k-minimum-values / bottom-k) distinct sketches with set-operation
estimators — mergeable audience-overlap analytics, the ClickHouse
``uniqTheta``/``uniqCombined`` family re-expressed with Spark built-ins
(reference analog: the segment cascades count audiences with ``uniq``;
this is the sketch the same engine reaches for when two audiences must
COMBINE — union / intersection / Jaccard — without re-reading raw data,
cf. /root/reference/src/1-naive.test.ts:72-95 counting distinct users).

A KMV sketch keeps the k smallest DISTINCT values of a uniform hash of
the items (Beyer et al., "On synopses for distinct-value estimation
under multiset operations", SIGMOD'07 — the theta-sketch precursor).
With hashes uniform on [0, M):

- estimate: exact ``n`` while the sketch holds fewer than k hashes;
  otherwise the unbiased bottom-k estimator ``(k-1) * M / h_(k)``.
- merge: bottom-k of a union IS the merge of the bottom-k's — partial
  sketches per shard/day/source fold to exactly the sketch of the whole
  (the AggregatingMergeTree partial-state shape, closed under merge).
- set ops (theta framework): clip both sketches to the shared threshold
  theta = min(theta_a, theta_b); entries below theta are a uniform
  p = theta/M sample of the underlying set, so any set expression over
  the samples scales by M/theta. Intersections of audiences never touch
  the raw events again.

100-TB shape: construction is one distinct (map-side partial hash-agg)
plus one per-group bottom-k (window row_number — a distributed sort
that SPILLS; never a collect, never unbounded per-group state), after
which every group is <= k longs: overlap math runs on KB-scale frames
regardless of corpus size. A skewed giant group sorts more rows than it
keeps; the mitigation at that scale is a pre-salted local bottom-k
(bottom-k per (group, h % s) then merge — correct because bottom-k is
merge-closed), which this module's merge primitive already expresses.
All arithmetic is engine-portable: the hash is the md5-derived 60-bit
key (dedup.md5_hash60, uniform on [0, 2^60)) and the estimator is one
double multiply + divide, so a SQL oracle replays estimates
bit-for-bit."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .dedup import md5_hash60

# Hash domain: md5_hash60 is uniform on [0, 2^60). Exactly representable
# as a double (one bit set), so M-scaled estimator arithmetic is the
# same IEEE ops in every engine.
M_DOMAIN = float(1 << 60)


def kmv_sketch(
    df: DataFrame, key_cols: list[str], item_col: str, *, k: int,
    salt: int | None = 64,
) -> DataFrame:
    """Bottom-k sketch of ``item_col``'s distinct values per key group:
    one row per group with ``sketch`` = the k smallest distinct 60-bit
    hashes, ascending. Items hash through their canonical string form
    (cast — integers render identically in Spark and SQL engines).

    Two shuffles, both spill-safe: a distinct on (keys, hash) with
    map-side partial aggregation, then the bottom-k. The bottom-k runs
    TWO-LEVEL by default (r14 verdict item 3): local bottom-k per
    (group, h % ``salt``) salt bucket — h is uniform by construction,
    so each bucket's window sorts ~1/salt of the group — then one
    bounded per-group fold of <= salt·k candidate hashes. Identical
    result because bottom-k is merge-closed (module docstring), so a
    skewed giant group (one language holding most of a corpus's
    shingles) never serializes through a single window task; with NO
    key columns the same shape avoids the one-partition global window.
    ``salt=None`` (or <= 1) uses the direct single-window path — the
    reference implementation the property test compares against."""
    hashed = df.select(
        *[F.col(c) for c in key_cols],
        md5_hash60(F.col(item_col).cast("string")).alias("h"),
    ).distinct()
    salted = salt is not None and salt > 1
    if not key_cols and not salted:
        raise ValueError("a global (keyless) sketch requires salt > 1")
    parts = [F.col(c) for c in key_cols]
    if salted:
        parts.append(F.pmod(F.col("h"), F.lit(salt)))
    w = Window.partitionBy(*parts).orderBy("h")
    ranked = hashed.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    fold = (
        F.slice(F.sort_array(F.collect_list("h")), 1, k)
        if salted
        else F.sort_array(F.collect_list("h"))
    )
    return ranked.groupBy(*[F.col(c) for c in key_cols]).agg(
        fold.alias("sketch")
    )


def uniq_upto(
    df: DataFrame, key_cols: list[str], item_col: str, *, n: int,
    salt: int | None = 64,
) -> DataFrame:
    """The ClickHouse ``uniqUpTo(N)`` analog: per key group, the EXACT
    distinct count while it is <= n, and n+1 for anything larger ("more
    than n") — the bounded-state way to ask "does this group have more
    than N distinct X" without counting them all. Implemented as the
    bottom-(n+1) sketch's size: a group with <= n distinct items
    retains all of them (exact); a larger group fills the sketch at
    n+1. One row per group: (keys..., uniq_upto bigint). Same two
    spill-safe shuffles and salted bottom-k as kmv_sketch."""
    sk = kmv_sketch(df, key_cols, item_col, k=n + 1, salt=salt)
    return sk.select(
        *[F.col(c) for c in key_cols],
        F.size("sketch").cast("long").alias("uniq_upto"),
    )


def kmv_estimate(sketch: Column, *, k: int) -> Column:
    """Distinct-count estimate off a sketch column: exact size below k
    (the sketch IS the value set), else the unbiased bottom-k estimator
    (k-1) * M / h_(k). Multiply-then-divide order is fixed so both
    engines run the identical two IEEE ops."""
    full = F.size(sketch) >= k
    hk = F.element_at(sketch, k).cast("double")
    return F.when(
        full, F.lit(float(k - 1)) * F.lit(M_DOMAIN) / hk
    ).otherwise(F.size(sketch).cast("double"))


def kmv_theta(sketch: Column, *, k: int) -> Column:
    """The sketch's sampling threshold as a double: h_(k) when full
    (entries below it are a uniform theta/M sample), M otherwise (the
    sketch saw everything)."""
    return F.when(
        F.size(sketch) >= k, F.element_at(sketch, k).cast("double")
    ).otherwise(F.lit(M_DOMAIN))


def kmv_merge(a: Column, b: Column, *, k: int) -> Column:
    """Merge two sketches: bottom-k of the concatenation. Exactly the
    sketch the union of the underlying sets would produce (a full input
    sketch retains everything below its theta, and merging only lowers
    the threshold), so partial sketches fold losslessly."""
    return F.slice(F.array_sort(F.array_distinct(F.concat(a, b))), 1, k)


def kmv_merge_agg(sketch_col: str, *, k: int) -> Column:
    """Aggregate form of the merge for groupBy folds over partial
    sketches: collect_list gathers <= n_partials arrays of <= k longs
    (bounded state — this is sketch metadata, not data), then one
    flatten/distinct/sort/slice. Order-insensitive, so collect_list's
    nondeterministic ordering is harmless."""
    return F.slice(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list(sketch_col)))),
        1,
        k,
    )


def _retained(sketch: Column, *, k: int) -> Column:
    """Entries strictly below the sketch's theta: all of them when the
    sketch is not full, the first k-1 when it is (the k-th IS theta)."""
    return F.when(F.size(sketch) < k, sketch).otherwise(
        F.slice(sketch, 1, k - 1)
    )


def kmv_intersect_estimate(a: Column, b: Column, *, k: int) -> Column:
    """Theta-framework intersection estimate: clip both retained sets to
    theta_c = min(theta_a, theta_b); the common entries below theta_c
    are a uniform theta_c/M sample of the true intersection, so the
    estimate is |common| * M / theta_c. Exact when neither sketch is
    full (theta_c = M: the samples are the sets). The double-domain
    comparison (hash cast to double vs theta) is the same IEEE compare
    in every engine."""
    theta_c = F.least(kmv_theta(a, k=k), kmv_theta(b, k=k))
    common = F.filter(
        F.array_intersect(_retained(a, k=k), _retained(b, k=k)),
        lambda h: h.cast("double") < theta_c,
    )
    return F.size(common).cast("double") * F.lit(M_DOMAIN) / theta_c


def kmv_union_estimate(a: Column, b: Column, *, k: int) -> Column:
    """Union estimate: estimate of the merged sketch (merge is lossless,
    so this is simply the bottom-k estimator over A ∪ B)."""
    return kmv_estimate(kmv_merge(a, b, k=k), k=k)


def kmv_difference_estimate(a: Column, b: Column, *, k: int) -> Column:
    """Theta-framework A-not-B estimate (the set-op family's EXCEPT):
    clip both retained sets to theta_c = min(theta_a, theta_b); A's
    entries below theta_c that B lacks are a uniform theta_c/M sample
    of A \\ B, so the estimate is |sample| * M / theta_c. Exact when
    neither sketch is full. NOTE the clip must use theta_c, not
    theta_a: an entry of A below theta_a but above theta_b says nothing
    about membership in B (B never retained that range)."""
    theta_c = F.least(kmv_theta(a, k=k), kmv_theta(b, k=k))
    only_a = F.filter(
        F.array_except(_retained(a, k=k), _retained(b, k=k)),
        lambda h: h.cast("double") < theta_c,
    )
    return F.size(only_a).cast("double") * F.lit(M_DOMAIN) / theta_c


class IncrementalKmvVocab:
    """Wave-state twin of the vocab KMV sketch (plans/relational.py
    ``vocab_kmv_per_lang``) on the shared wave chassis
    (operators/wave_counts.WaveCountState): per-language
    distinct-shingle sketches maintained incrementally, rebuilt
    bit-identically to the batch query from ANY disjoint wave split —
    the merge-closure argument made operational: every global-bottom-k
    hash is bottom-k within its own wave (at most k-1 hashes are
    smaller ANYWHERE), so the union of per-wave bottom-k's contains the
    global bottom-k and the rebuild's window recovers it exactly.

    State rows (one string-keyed table, <= (k + n_sources) rows per
    (lang, wave) — KB-scale regardless of corpus size):

    - ``h:<lang>:<rank>`` -> h: the wave's per-language bottom-k hashes,
      rank zero-padded so a crash-replayed wave appends byte-identical
      rows (the chassis's max()-collapse absorbs them);
    - ``s:<lang>:<source>`` -> 0: source-presence rows (a source counts
      when it contributed >= 1 shingle — the batch query's n_partials
      semantics), distinct-unioned across waves by the rebuild.

    Deletion/takedown note: unlike the engine's count states (which
    retract by appending negative deltas) and its index states (which
    tombstone ids), a bottom-k sketch is NOT invertible — removing a
    source cannot recover the hashes it displaced from other waves'
    bottom-k's. The correct takedown path is reset() + re-ingest of the
    surviving corpus (sketch states are KB-scale and one corpus pass to
    rebuild, so rebuild-on-delete is the cheap honest answer here, not
    a gap the way it was for the ANN index before its tombstone lane).
    """

    def __init__(
        self,
        spark,
        workdir: str,
        *,
        k: int = 128,
        state_buckets: int = 8,
    ):
        from .wave_counts import WaveCountState

        self.spark, self.k = spark, k
        self._st = WaveCountState(
            spark,
            workdir,
            name="kmvvocab",
            key_col="key",
            key_type="string",
            value_cols=["h"],
            state_buckets=state_buckets,
        )

    def reset(self) -> None:
        self._st.reset()

    def compact(self, wave: int = 0) -> None:
        self._st.compact(wave)

    def ingest(self, docs: DataFrame, *, wave_id: int | None = None) -> DataFrame:
        """Fold one wave: per-language bottom-k of the wave's distinct
        shingle hashes plus source-presence rows. Same staging as the
        batch query (spread -> token column -> shingles-from-tokens)."""
        from .dedup import md5_hash60, word_shingles_from_tokens
        from .text import spread, tokens

        wave = self._st.resolve_wave(wave_id)
        sh = (
            spread(docs)
            .select("lang", "source", tokens(F.col("text")).alias("_t"))
            .select(
                "lang",
                "source",
                F.explode(word_shingles_from_tokens(F.col("_t"), 3)).alias(
                    "sh"
                ),
            )
        )
        hashed = sh.select(
            "lang", "source", md5_hash60(F.col("sh")).alias("h")
        )
        w = Window.partitionBy("lang").orderBy("h")
        hrows = (
            hashed.select("lang", "h")
            .distinct()
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= self.k)
            .select(
                F.concat(
                    F.lit("h:"),
                    F.col("lang"),
                    F.lit(":"),
                    F.lpad((F.col("rn") - 1).cast("string"), 6, "0"),
                ).alias("key"),
                F.col("h"),
            )
        )
        srows = (
            hashed.select("lang", "source")
            .distinct()
            .select(
                F.concat(
                    F.lit("s:"), F.col("lang"), F.lit(":"), F.col("source")
                ).alias("key"),
                F.lit(0).cast("long").alias("h"),
            )
        )
        delta = hrows.unionByName(srows).persist()
        try:
            audit = delta.groupBy().agg(
                F.lit(wave).alias("wave"),
                F.count(F.lit(1)).alias("n_rows"),
            )
            pinned = self._st.pin_audit(audit, wave)
            self._st.append(delta, wave)
        finally:
            delta.unpersist()
        return pinned

    def score(self, docs: DataFrame | None = None) -> DataFrame:
        """(lang, n_partials, est_distinct_shingles) rebuilt from state —
        identical to the batch query over the concatenation of every
        wave (docs accepted and ignored: the trainer-protocol signature
        the wave gate and _two_waves choreography expect)."""
        s = self._st.read()
        hs = (
            s.filter(F.col("key").startswith("h:"))
            .select(
                F.split(F.col("key"), ":").getItem(1).alias("lang"), "h"
            )
            .distinct()
        )
        w = Window.partitionBy("lang").orderBy("h")
        sk = (
            hs.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= self.k)
            .groupBy("lang")
            .agg(F.sort_array(F.collect_list("h")).alias("sketch"))
        )
        np_ = (
            s.filter(F.col("key").startswith("s:"))
            # distinct over the key BEFORE counting: a source present in
            # several waves has one state row per wave (different _w)
            .select("key")
            .distinct()
            .select(F.split(F.col("key"), ":").getItem(1).alias("lang"))
            .groupBy("lang")
            .agg(F.count(F.lit(1)).cast("int").alias("n_partials"))
        )
        return sk.join(np_, "lang").select(
            "lang",
            "n_partials",
            kmv_estimate(F.col("sketch"), k=self.k).alias(
                "est_distinct_shingles"
            ),
        )
