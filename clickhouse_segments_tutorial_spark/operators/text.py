"""Text-analysis operators for large-scale training-data pipelines.

Extensions beyond the reference surface (SURVEY.md §2.5): token counting,
quality scoring, language ID, document fingerprinting. All hot paths are
built-in ``pyspark.sql.functions`` expressions — JVM-side, whole-stage
codegen, no Python UDFs — so they run at full scan speed over 100 TB of
documents (the per-doc cost is a handful of regex passes, embarrassingly
parallel, no shuffle at all).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword heuristic.
# Deliberately small and high-precision: these are the highest-frequency
# function words that rarely collide across these languages.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "you", "that", "it"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ich", "ein"],
    "fr": ["le", "la", "les", "et", "est", "que", "une", "vous"],
    "es": ["el", "los", "las", "es", "una", "para", "por", "con"],
}


def tokens(text: str | Column) -> Column:
    """Whitespace tokenization; whitespace-only text -> empty array.

    Strips ALL leading/trailing whitespace (F.trim only strips spaces, so
    a trailing newline/tab would otherwise yield a phantom '' token that
    corrupts token counts and shingle sets)."""
    col = F.col(text) if isinstance(text, str) else text
    trimmed = F.regexp_replace(col, r"^\s+|\s+$", "")
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(text: str | Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: str | Column) -> Column:
    """Sub-word-ish token estimate: count maximal runs of word chars, digits,
    or single punctuation marks — the classic "BPE-ish regex" approximation
    (a GPT-2-style pre-tokenizer pass without the merge table)."""
    col = F.col(text) if isinstance(text, str) else text
    return F.size(
        F.regexp_extract_all(col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0))
    )


def punct_ratio(text: str | Column) -> Column:
    """Fraction of characters that are punctuation/symbols (not word chars or
    whitespace). 0.0 for empty text."""
    col = F.col(text) if isinstance(text, str) else text
    n = F.length(col)
    n_punct = n - F.length(F.regexp_replace(col, r"[^\w\s]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(n_punct / n)


def stopword_ratio(text: str | Column, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens in ``stopwords`` (defaults to English markers
    when None; an explicit empty list means ratio 0)."""
    words = stopwords if stopwords is not None else LANG_MARKERS["en"]
    toks = tokens(text)
    n = F.size(toks)
    n_stop = F.size(F.filter(toks, _in_words(words)))
    return F.when(n == 0, F.lit(0.0)).otherwise(n_stop / n)


def quality_score(text: str | Column) -> Column:
    """Composite heuristic quality score in [0, 1]: rewards mid-length docs,
    low punctuation density, and a natural stopword ratio. Deterministic,
    expression-only — the shape of a Gopher/C4-style quality rule."""
    col = F.col(text) if isinstance(text, str) else text
    n_tok = token_count(col).cast("double")
    length_term = F.least(n_tok / F.lit(50.0), F.lit(1.0))  # saturate at 50 tokens
    punct_term = F.lit(1.0) - F.least(punct_ratio(col) * 5, F.lit(1.0))
    stop_term = F.least(stopword_ratio(col) * 4, F.lit(1.0))
    return F.round((length_term + punct_term + stop_term) / 3.0, 6)


def _in_words(words: list[str]):
    # NB: higher-order-function lambdas MUST keep arity 1 — pyspark passes
    # (element, index) to arity-2 lambdas, so a `w=words` default would
    # silently bind the array index.
    return lambda t: F.lower(t).isin(words)


def lang_scores(text: str | Column) -> dict[str, Column]:
    """Per-language marker-hit ratios (hits / tokens) for each candidate."""
    toks = tokens(text)
    n = F.greatest(F.size(toks), F.lit(1)).cast("double")
    return {
        lang: F.size(F.filter(toks, _in_words(words))) / n
        for lang, words in LANG_MARKERS.items()
    }


def lang_id(text: str | Column, default: str = "und") -> Column:
    """Predicted language = argmax marker ratio; 'und' when no marker hits.

    Ties break by language key order (deterministic). Implemented as a fold
    over (score, lang) structs — pure Catalyst expressions.
    """
    scores = lang_scores(text)
    best = None
    for lang, score in scores.items():
        cand = F.struct(score.alias("score"), F.lit(lang).alias("lang"))
        best = cand if best is None else F.when(score > best["score"], cand).otherwise(best)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit(default))


def fingerprint(text: str | Column) -> Column:
    """Stable 128-bit content fingerprint (md5 hex) — the exact-dedup key.
    md5 exists in every engine, so oracle checks are trivial."""
    col = F.col(text) if isinstance(text, str) else text
    return F.md5(col)


def rolling_fingerprint(text: str | Column, window: int = 8) -> Column:
    """Winnowing-style robust fingerprint: min xxhash64 over word ``window``-
    grams. Stable under small edits outside the minimizing window — the
    standard near-dup document sketch primitive.

    For bulk use, project ``tokens(text)`` into a column first and call
    :func:`rolling_fingerprint_from_tokens` (same re-eval trap as
    dedup.shingle_hashes_from_tokens: the gram lambda re-runs its outer
    expression per element, so this convenience form pays the tokenizer
    once per gram). The engine-portable md5 twin is the ``rolling_fp``
    column of plans/llm.py's ``doc_fingerprints``."""
    return rolling_fingerprint_from_tokens(tokens(text), window)


def rolling_fingerprint_from_tokens(toks: Column, window: int = 8) -> Column:
    """Rolling fingerprint over an already-tokenized array column."""
    n = F.size(toks)
    grams = F.when(n < window, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - window),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, window)),
        )
    )
    return F.array_min(F.transform(grams, lambda g: F.xxhash64(g)))


def ngrams(text: str | Column, n: int = 2) -> Column:
    """ALL word n-grams in order (not deduplicated — frequency analysis
    needs multiplicity, unlike dedup's shingle sets). Docs with fewer
    than n tokens yield an empty array (no partial grams)."""
    return ngrams_from_tokens(tokens(text), n)


def ngrams_from_tokens(toks: Column, n: int = 2) -> Column:
    """n-grams over an already-tokenized array column. For bulk work,
    project the token array into a column first: the transform lambda below
    re-evaluates its outer ``toks`` expression per element in the
    interpreted path, so passing ``tokens(text)`` directly re-runs the
    regexp tokenizer once per gram (see dedup.shingle_hashes_from_tokens,
    measured 3.5x)."""
    cnt = F.size(toks)
    return F.when(cnt < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), cnt - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


def top_ngrams(
    df: DataFrame,
    *,
    text_col: str = "text",
    group_col: str = "lang",
    n: int = 2,
    k: int = 5,
) -> DataFrame:
    """Top-k most frequent word n-grams per group (corpus vocabulary /
    boilerplate detection — repeated headers and nav text surface here
    long before they hurt a model).

    Shape at scale: explode -> two-level aggregation. The (group, gram)
    count is partial map-side, so the shuffle carries one row per distinct
    gram per map task, not per occurrence; the rank window then runs over
    the aggregated counts only (tiny). Ties break on the gram string, so
    the result is deterministic."""
    from pyspark.sql import Window

    counts = (
        df.select(F.col(group_col).alias("grp"), tokens(text_col).alias("_t"))
        .select("grp", F.explode(ngrams_from_tokens(F.col("_t"), n)).alias("ngram"))
        .groupBy("grp", "ngram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    w = Window.partitionBy("grp").orderBy(F.desc("n_occurrences"), F.asc("ngram"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("grp").alias(group_col), "ngram", "n_occurrences", "rank")
    )


# PII patterns, ordered: each stage counts/replaces on the PREVIOUS stage's
# output, so a replacement token can never be re-matched by a later pattern
# (the tokens carry no digits). Every class is explicit ASCII — identical
# under Java regex (Spark) and RE2 (DuckDB), same portability rule as
# normalize_text. \x20 = literal space (inside the char class, a bare space
# reads as a typo; the escape is identical in both engines).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\-\x20]{6,}[0-9]", "<PHONE>"),
]


def redact_pii(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4/RefinedWeb-style PII scrub: replace emails, IPv4 addresses, and
    phone-shaped digit runs with typed tokens, reporting per-doc match
    counts and a has_pii flag. Crude by design (regex PII detection always
    is) but deterministic and engine-portable, so the whole output —
    redacted text included — is value-oracle-able. Map-only expressions,
    no shuffle: runs at scan speed over 100 TB.

    NULL text is treated as '' (counts 0, redacted '', has_pii false) —
    without the coalesce every regexp would propagate NULL and downstream
    ``has_pii`` filters would silently drop the row."""
    col = F.coalesce(F.col(text_col), F.lit(""))
    out_cols = []
    red = col
    total = F.lit(0)
    for name, pat, token in PII_PATTERNS:
        n = F.size(F.regexp_extract_all(red, F.lit(pat), F.lit(0)))
        out_cols.append(n.alias(f"n_{name}"))
        total = total + n
        red = F.regexp_replace(red, pat, token)
    return df.select(
        id_col,
        red.alias("redacted_text"),
        *out_cols,
        (total > 0).alias("has_pii"),
    )


def repetition_stats(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher-style repetition metrics — the quality-filter family that
    catches boilerplate and degenerate generation loops (Rae et al. 2021,
    Table A1): per doc,

    - ``n_lines``: non-empty (whitespace-trimmed) lines;
    - ``dup_line_frac``: fraction of lines that are repeats of an earlier
      line (1 - distinct/total);
    - ``dup_line_char_frac``: fraction of line characters inside line
      values occurring more than once (all occurrences counted);
    - ``top_2gram_char_frac``: characters covered by the most frequent
      word 2-gram (count x gram length) over total doc characters;
    - ``dup_5gram_char_frac``: characters inside word 5-grams occurring
      more than once, over total doc characters (overlapping grams can
      push this past 1.0 on pathological inputs — same artifact as the
      published definition).

    Shape at scale: ONE scan — lines, 2-grams, and 5-grams ride a single
    tagged explode — then a (doc, tag, item) count with map-side partial
    aggregation and a per-doc rollup: shuffle volume is one row per
    distinct item per map task, never per occurrence. A sentinel row per
    doc keeps empty documents in the output without a zero-fill join.
    Every ratio is one exact-int division rounded to 6, so a DuckDB
    oracle replays the output bit-for-bit. Ties for the top 2-gram break
    on the gram string (min over (-count, gram) structs), making the
    result deterministic and engine-portable."""
    col = F.col(text_col)
    ws = "[ \\t\\x0B\\f\\r]+"  # explicit class: engine-portable (see normalize_text)
    lines = F.filter(
        F.transform(
            F.split(col, "\n"),
            lambda l: F.regexp_replace(l, f"^{ws}|{ws}$", ""),
        ),
        lambda l: l != "",
    )
    df = spread(df)  # per-row tokenize/shingle CPU: fan out first
    # Materialize lines/tokens as COLUMNS before any higher-order lambda
    # consumes them: a transform lambda re-evaluates its outer expression
    # per element in the interpreted path, so feeding tokens(col) straight
    # into ngrams_from_tokens re-runs the regex tokenizer once per gram —
    # measured 13.8s -> 0.6s on 5k docs (the f59b557 trap, again).
    base = df.select(
        F.col(id_col),
        F.length(col).alias("_nc"),
        lines.alias("_lines"),
        tokens(col).alias("_toks"),
    )
    tag = lambda t, arr: F.transform(  # noqa: E731
        arr, lambda x: F.struct(F.lit(t).alias("tag"), x.alias("item"))
    )
    items = F.concat(
        F.array(F.struct(F.lit("D").alias("tag"), F.lit("").alias("item"))),
        tag("L", F.col("_lines")),
        tag("2", ngrams_from_tokens(F.col("_toks"), 2)),
        tag("5", ngrams_from_tokens(F.col("_toks"), 5)),
    )
    exploded = base.select(
        F.col(id_col),
        F.col("_nc"),
        F.explode(items).alias("_it"),
    ).select(id_col, "_nc", F.col("_it.tag").alias("_tag"), F.col("_it.item").alias("_item"))
    counts = exploded.groupBy(id_col, "_tag", "_item").agg(
        F.count(F.lit(1)).alias("_cnt"), F.max("_nc").alias("_nc")
    )
    is_line = F.col("_tag") == "L"
    chars = F.col("_cnt") * F.length("_item")
    per_doc = counts.groupBy(id_col).agg(
        F.max("_nc").alias("_n_chars"),
        F.coalesce(F.sum(F.when(is_line, F.col("_cnt"))), F.lit(0)).cast("int").alias("n_lines"),
        F.count(F.when(is_line, F.lit(1))).cast("int").alias("_n_dist_lines"),
        F.coalesce(F.sum(F.when(is_line & (F.col("_cnt") > 1), chars)), F.lit(0)).alias("_dup_line_chars"),
        F.coalesce(F.sum(F.when(is_line, chars)), F.lit(0)).alias("_tot_line_chars"),
        F.min(
            F.when(
                F.col("_tag") == "2",
                F.struct((-F.col("_cnt")).alias("nc"), F.col("_item").alias("g")),
            )
        ).alias("_top2"),
        F.coalesce(
            F.sum(F.when((F.col("_tag") == "5") & (F.col("_cnt") > 1), chars)), F.lit(0)
        ).alias("_dup5_chars"),
    )
    nz = lambda num, den: F.when(den > 0, F.round(num / den, 6)).otherwise(F.lit(0.0))  # noqa: E731
    return per_doc.select(
        id_col,
        "n_lines",
        nz(F.col("n_lines") - F.col("_n_dist_lines"), F.col("n_lines")).alias("dup_line_frac"),
        nz(F.col("_dup_line_chars"), F.col("_tot_line_chars")).alias("dup_line_char_frac"),
        F.when(
            F.col("_top2").isNotNull() & (F.col("_n_chars") > 0),
            F.round((-F.col("_top2.nc")) * F.length("_top2.g") / F.col("_n_chars"), 6),
        ).otherwise(F.lit(0.0)).alias("top_2gram_char_frac"),
        nz(F.col("_dup5_chars"), F.col("_n_chars")).alias("dup_5gram_char_frac"),
    )


def chunk_documents(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 128,
    stride: int = 64,
    tokens_col: str | None = None,
) -> DataFrame:
    """Sliding-window token chunks — the context-window preprocessing step
    of an LLM training pipeline (stride < chunk_tokens overlaps windows).

    One row per (doc, window): (doc_id, chunk_idx, n_chunk_tokens,
    chunk_fp) where chunk_fp is md5 of the space-joined chunk text — the
    downstream join key for chunk-level dedup, and engine-portable so the
    whole output is value-oracle-able. Pure expressions + one explode:
    map-only, no shuffle, no Python. Empty docs yield no chunks."""
    if stride < 1 or chunk_tokens < 1:
        raise ValueError("chunk_tokens and stride must be >= 1")
    # tokens_col: an already-tokenized array column (the corpus
    # pipeline's staged barrier) — tokens() is deterministic, so the
    # chunks are identical either way
    toks = F.col(tokens_col) if tokens_col is not None else tokens(text_col)
    cnt = F.size(toks)
    starts = F.sequence(F.lit(0), cnt - 1, F.lit(stride))
    chunked = df.select(
        id_col,
        toks.alias("_toks"),
        F.explode(F.when(cnt > 0, starts).otherwise(F.array().cast("array<int>"))).alias("_s"),
    )
    chunk = F.slice("_toks", F.col("_s") + 1, chunk_tokens)
    return chunked.select(
        id_col,
        (F.col("_s") / stride).cast("int").alias("chunk_idx"),
        F.size(chunk).alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_fp"),
    )


def spread(df: DataFrame) -> DataFrame:
    """Repartition to the cluster's parallelism before compute-heavy
    per-row expressions (the dedup family's _spread, shared from here so
    dedup can keep importing text without a cycle) — but ONLY when the
    input is actually under-split. A corpus arriving as a few big
    parquet files otherwise runs the whole per-row expression tree on a
    handful of cores — measured 4.2x on text_stats at sf0.1 (one file,
    one task, eight tokenizing expressions per row); one cheap
    round-robin shuffle buys full-cluster fan-out downstream.

    The gate (r14 verdict item 1): at 100 TB the input arrives as
    ~800k parquet splits that are ALREADY at least cluster-parallel,
    and an unconditional round-robin repartition would add a full
    corpus shuffle (write + read of every byte of text) to otherwise
    shuffle-free map-only operators. The plan's actual scan partition
    count (rdd.getNumPartitions() — reflects file splitting under
    spark.sql.files.maxPartitionBytes, not just file count) decides:
    already >= defaultParallelism -> pass through untouched (NO
    Exchange in the plan, pinned in test_plans); under-split -> fan
    out as before. Streaming frames can't be partition-counted
    without starting the query; they keep the fan-out (a micro-batch
    arriving through a wave gate is small and single-source — the
    exact under-split shape the fan-out exists for)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if not df.isStreaming and df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per doc: the standard text-quality feature vector.

    Spreads its input first: every output column re-tokenizes the text
    (eight independent expression trees per row — the per-row CPU shape
    the spread() contract exists for)."""
    return spread(df).select(
        id_col,
        token_count(text_col).alias("n_tokens"),
        bpe_ish_token_count(text_col).alias("n_bpe_tokens"),
        F.length(text_col).alias("n_chars"),
        F.round(punct_ratio(text_col), 6).alias("punct_ratio"),
        F.round(stopword_ratio(text_col), 6).alias("stopword_ratio"),
        quality_score(text_col).alias("quality"),
        lang_id(text_col).alias("lang_pred"),
        fingerprint(text_col).alias("fingerprint"),
    )


def normalize_text(text: str | Column) -> Column:
    """C4-style cleaning normalization, expression-only and engine-portable:
    strip HTML-ish tags, collapse all whitespace runs to single spaces, trim,
    lowercase. Every step is a simple character-class regex that behaves
    identically under Java regex (Spark) and RE2 (DuckDB), so cleaned output
    is value-oracle-able. Map-only — composes with quality_filter/dedup
    upstream of tokenization.

    The whitespace run is an EXPLICIT class, not \\s: Java's \\s includes
    vertical tab (\\x0B) while RE2's does not, so \\s+ silently diverges
    across engines on documents containing VT (r5 ADVICE). The explicit
    class is the Java \\s set, spelled identically in both dialects."""
    col = F.col(text) if isinstance(text, str) else text
    no_tags = F.regexp_replace(col, r"<[^>]*>", " ")
    collapsed = F.regexp_replace(no_tags, "[ \\t\\n\\x0B\\f\\r]+", " ")
    return F.lower(F.trim(collapsed))


# Gopher-style rule gate thresholds (Rae et al. 2021, "Scaling Language
# Models: ... Gopher", appendix A1.1 quality rules), tuned so every rule
# discriminates on this corpus (the paper's 50..100k word bounds etc.
# would pass or fail trivially on 10..99-word synthetic docs). ONE
# definition site shared by the Spark operator and the DuckDB oracle
# (plans/llm.py) — the curation._QUOTA_TOKENS rule.
GOPHER_MIN_WORDS = 30
GOPHER_MAX_WORDS = 90
# mean word length in [4, 5]: compared in the INTEGER domain as
# 4*n_words <= sum_word_chars <= 5*n_words — exact in any engine.
GOPHER_MIN_MWL = 4
GOPHER_MAX_MWL = 5
GOPHER_MIN_STOPWORDS = 2
GOPHER_STOPWORDS = ("the", "a", "of", "to", "and", "that", "have", "with")
# duplicate-bigram fraction <= 1/20: (n_bigrams - n_distinct)*20 <=
# n_bigrams in the integer domain.
GOPHER_DUP_BIGRAM_DENOM = 20


def gopher_quality(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style RULE-BASED quality gate: per-document boolean rule
    flags plus the conjunctive keep — the standard pre-filter that runs
    BEFORE any learned scorer (quality_score heuristic, the NB
    classifier) in a production curation stack (Gopher/MassiveText,
    RefinedWeb, Dolma all lead with rule gates).

    Four rules, each engine-exact (no float-threshold comparisons — all
    rule predicates are INTEGER arithmetic, the displayed ratios are
    derived afterwards):

    - ``r_word_count``: GOPHER_MIN_WORDS <= n_words <= GOPHER_MAX_WORDS;
    - ``r_mean_word_len``: mean word length within
      [GOPHER_MIN_MWL, GOPHER_MAX_MWL], compared as
      min*n <= sum_chars <= max*n;
    - ``r_stopwords``: at least GOPHER_MIN_STOPWORDS occurrences of the
      Gopher stop list (an English-ness proxy);
    - ``r_repetition``: duplicate-bigram fraction at most
      1/GOPHER_DUP_BIGRAM_DENOM (the paper's duplicate-n-gram family) —
      (n_bigrams - n_distinct_bigrams) * DENOM <= n_bigrams; vacuously
      true for docs with < 2 words. Bigrams are compared as
      space-joined strings, alias-free because tokens are
      whitespace-split (no token contains a space).

    Scale: map-only per document (explode-free — all array expressions
    over the token list), so the plan is one WholeStageCodegen project
    over the scan; composes with any downstream gate. Output: (doc_id,
    n_words, mean_word_len, n_stop, dup_bigram_frac, r_word_count,
    r_mean_word_len, r_stopwords, r_repetition, keep)."""
    # Materialize the token and bigram ARRAYS as named columns first:
    # every rule below references them several times, and inlined they
    # would re-run the regex tokenization per array ELEMENT of every
    # consumer (F.get(tokens(text), i) inside a transform re-splits the
    # whole text per position — measured 13.7 s vs 0.5 s at sf0.1 for
    # the whole query). Non-cheap multiply-referenced aliases survive
    # Catalyst's project-collapse, so each array is computed once per row.
    staged = df.withColumn("_gq_t", tokens(text_col))
    t = F.col("_gq_t")
    n_words0 = F.size(t)
    idx = F.when(
        n_words0 > 1, F.sequence(F.lit(0), n_words0 - 2)
    ).otherwise(F.array().cast("array<int>"))
    staged = staged.withColumn(
        "_gq_bg",
        F.transform(idx, lambda i: F.concat_ws(" ", F.get(t, i), F.get(t, i + 1))),
    )
    bigrams = F.col("_gq_bg")
    df = staged
    n_words = F.size(t)
    sum_chars = F.aggregate(
        t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    n_stop = F.size(F.filter(t, lambda x: x.isin(*GOPHER_STOPWORDS)))
    n_bi = F.size(bigrams)
    n_dist = F.size(F.array_distinct(bigrams))
    r_wc = (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
    r_mwl = (
        (n_words > 0)
        & (sum_chars >= GOPHER_MIN_MWL * n_words)
        & (sum_chars <= GOPHER_MAX_MWL * n_words)
    )
    r_stop = n_stop >= GOPHER_MIN_STOPWORDS
    r_rep = (n_bi - n_dist) * GOPHER_DUP_BIGRAM_DENOM <= n_bi
    # spread first: the rule expressions tokenize/shingle per row (the
    # per-row CPU shape of text_stats — measured 1.6x at sf0.1)
    return spread(df).select(
        id_col,
        n_words.alias("n_words"),
        F.round(
            F.when(n_words > 0, sum_chars.cast("double") / n_words).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("mean_word_len"),
        n_stop.alias("n_stop"),
        F.round(
            F.when(
                n_bi > 0, (n_bi - n_dist).cast("double") / n_bi
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_bigram_frac"),
        r_wc.alias("r_word_count"),
        r_mwl.alias("r_mean_word_len"),
        r_stop.alias("r_stopwords"),
        r_rep.alias("r_repetition"),
        (r_wc & r_mwl & r_stop & r_rep).alias("keep"),
    )
