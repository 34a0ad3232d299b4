"""Property-based tests (hypothesis): operator semantics vs pure-Python
models on randomized small fixtures. Few examples per property — every
example runs real Spark jobs — but each example is adversarially shrunk,
which catches boundary semantics (empty groups, ties, single-token docs)
that hand-written goldens miss.
"""

from __future__ import annotations

import datetime as dt
from itertools import combinations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from clickhouse_segments_tutorial_spark.operators.asof_join import asof_join
from clickhouse_segments_tutorial_spark.operators.dedup import jaccard_pairs
from clickhouse_segments_tutorial_spark.operators.latest_wins import latest_value

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]

doc_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=6).map(" ".join),
    min_size=1,
    max_size=8,
)


def py_shingles(text: str, n: int = 3) -> frozenset:
    toks = text.split()
    if not toks:
        return frozenset()
    if len(toks) < n:
        return frozenset([" ".join(toks)])
    return frozenset(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1))


@given(texts=doc_strategy)
@settings(**SETTINGS)
def test_jaccard_pairs_matches_python_model(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_pairs(df, n=3, threshold=0.3).collect()
    }
    expected = {}
    sh = {i: py_shingles(t) for i, t in enumerate(texts)}
    for a, b in combinations(range(len(texts)), 2):
        inter = len(sh[a] & sh[b])
        union = len(sh[a] | sh[b])
        if union and inter / union >= 0.3:
            expected[(a, b)] = round(inter / union, 6)
    assert got == expected


@given(texts=doc_strategy)
@settings(**SETTINGS)
def test_minhash_lsh_equals_exact_jaccard(spark, texts):
    """At k=64/b=32/r=2 and threshold 0.8, banding recall is ~1 - 1e-14:
    LSH must return exactly the exact-Jaccard pair set on any corpus."""
    from clickhouse_segments_tutorial_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    exact = {
        (r.id_a, r.id_b, r.jaccard)
        for r in jaccard_pairs(df, n=3, threshold=0.8).collect()
    }
    lsh = {
        (r.id_a, r.id_b, r.jaccard)
        for r in minhash_lsh_pairs(df, n=3, k=64, bands=32, threshold=0.8).collect()
    }
    assert exact == lsh


assign_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # user
        st.booleans(),  # value
        st.integers(min_value=0, max_value=10),  # version tick
    ),
    min_size=1,
    max_size=12,
)


@given(rows=assign_strategy)
@settings(**SETTINGS)
def test_latest_wins_matches_python_model(spark, rows):
    t0 = dt.datetime(2023, 1, 1)
    data = [(str(u), v, t0 + dt.timedelta(seconds=tick)) for u, v, tick in rows]
    df = spark.createDataFrame(
        data, "user_id string, value boolean, assigned_at timestamp"
    )
    got = {
        r.user_id: r.latest
        for r in df.groupBy("user_id")
        .agg(latest_value("value", "assigned_at").alias("latest"))
        .collect()
    }
    # python model: max by (assigned_at); ties broken by max value — mirror
    # max_by's tie behavior by asserting only on users with a unique max tick
    expected_users = set()
    by_user: dict = {}
    for u, v, tick in rows:
        by_user.setdefault(str(u), []).append((tick, v))
    for u, pairs in by_user.items():
        mx = max(t for t, _ in pairs)
        winners = [v for t, v in pairs if t == mx]
        if len(winners) == 1:
            expected_users.add(u)
            assert got[u] == winners[0], (u, pairs, got[u])
    assert set(got) == set(by_user)


events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),  # user
        st.integers(min_value=0, max_value=6),  # message id (duplicates likely)
        st.integers(min_value=0, max_value=100),  # time tick
    ),
    min_size=1,
    max_size=25,
)


@given(rows=events_strategy, split=st.integers(min_value=0, max_value=100))
@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
def test_microbatch_cascade_equals_full_recompute(spark, tmp_path_factory, rows, split):
    """THE core engine property: for any event stream, any 2-batch split,
    and duplicate message deliveries, the persisted-state incremental
    cascade must serve the same membership as an exact full recompute."""
    import tempfile

    from clickhouse_segments_tutorial_spark.schemas import USER_EVENTS_IDEMPOTENT
    from clickhouse_segments_tutorial_spark.segmentation import (
        MicroBatchSegmenter,
        SegmentSpec,
        idempotent_assignments,
        serve_segment,
    )
    from clickhouse_segments_tutorial_spark.segmentation.spec import EventLog

    log = EventLog(
        user="user_id", event="event_name", message="message_id", time="timestamp"
    )
    t0 = dt.datetime(2023, 1, 1)
    data = [
        (str(u), "BUTTON_CLICK", f"m{m}", t0 + dt.timedelta(minutes=tick))
        for u, m, tick in rows
    ]
    events = spark.createDataFrame(data, USER_EVENTS_IDEMPOTENT)
    spec = SegmentSpec(name="p", event_name="BUTTON_CLICK", threshold=2)

    mid = t0 + dt.timedelta(minutes=split)
    seg = MicroBatchSegmenter(
        spark, tempfile.mkdtemp(dir=tmp_path_factory.getbasetemp()), spec, log
    )
    seg.process_batch(
        events.filter(F.col("timestamp") < F.lit(mid)), lower_bound=t0, now=t0
    )
    seg.process_batch(
        events.filter(F.col("timestamp") >= F.lit(mid)), lower_bound=mid, now=mid
    )
    incremental = sorted(r.user_id for r in seg.members().collect())
    full = sorted(
        r.user_id
        for r in serve_segment(idempotent_assignments(events, spec, log)).collect()
    )
    assert incremental == full


asof_strategy = st.tuples(
    st.lists(st.integers(min_value=0, max_value=20), min_size=1, max_size=8),
    st.lists(st.integers(min_value=0, max_value=20), min_size=0, max_size=8),
)


@given(times=asof_strategy)
@settings(**SETTINGS)
def test_asof_join_matches_python_model(spark, times):
    left_ticks, right_ticks = times
    t0 = dt.datetime(2023, 1, 1)
    left = spark.createDataFrame(
        [(i, "u", t0 + dt.timedelta(hours=t)) for i, t in enumerate(left_ticks)],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u", t0 + dt.timedelta(hours=t), t) for t in set(right_ticks)],
        "user_id string, order_ts timestamp, order_tick long",
    )
    got = {
        r.event_id: r.order_tick
        for r in asof_join(
            left, right, on="user_id", left_time="ts", right_time="order_ts"
        ).collect()
    }
    rt = sorted(set(right_ticks))
    for i, lt in enumerate(left_ticks):
        candidates = [t for t in rt if t <= lt]
        assert got[i] == (max(candidates) if candidates else None), (
            lt,
            rt,
            got[i],
        )


# --- connected components vs union-find ------------------------------------------


edge_strategy = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=20,
)


def py_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find model: node -> min reachable node."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in parent}


@given(edges=edge_strategy)
@settings(**SETTINGS)
def test_connected_components_matches_union_find(spark, edges):
    from clickhouse_segments_tutorial_spark.operators.components import (
        connected_components,
    )

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert got == py_components(edges)


# --- sequence packing invariants ---------------------------------------------------


@given(
    sizes=st.lists(st.integers(1, 150), min_size=1, max_size=25),
    capacity=st.integers(50, 200),
)
@settings(**SETTINGS)
def test_pack_chunks_matches_python_greedy(spark, sizes, capacity):
    """The Spark packing must equal a per-shard pure-Python greedy replay,
    and every multi-chunk bin must respect capacity."""
    from clickhouse_segments_tutorial_spark.operators.packing import pack_chunks

    rows = [(i % 5, i // 5, s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id long, chunk_idx int, n_chunk_tokens int")
    got = {
        (r.doc_id, r.chunk_idx): (r.shard, r.seq_id)
        for r in pack_chunks(df, capacity=capacity, shards=3).collect()
    }

    expected = {}
    for shard in range(3):
        shard_rows = sorted(r for r in rows if r[0] % 3 == shard)
        seq, fill = 0, 0
        for doc_id, chunk_idx, tok in shard_rows:
            if fill > 0 and fill + tok > capacity:
                seq, fill = seq + 1, 0
            fill += tok
            expected[(doc_id, chunk_idx)] = (shard, seq)
    assert got == expected


@given(
    train_texts=doc_strategy,
    eval_texts=doc_strategy,
    n=st.integers(min_value=1, max_value=4),
)
@settings(**SETTINGS)
def test_contamination_matches_python_model(spark, train_texts, eval_texts, n):
    """n_common_grams == |shingles(train doc) ∩ union(eval shingles)| for
    every train doc, on arbitrary tiny corpora (empty docs, single tokens,
    full overlap)."""
    from clickhouse_segments_tutorial_spark.operators.dedup import ngram_contamination

    train = spark.createDataFrame(list(enumerate(train_texts)), "doc_id long, text string")
    eval_df = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(eval_texts)], "doc_id long, text string"
    )
    eval_grams = frozenset().union(*(py_shingles(t, n) for t in eval_texts))
    got = {
        r.doc_id: (r.n_common_grams, r.contaminated)
        for r in ngram_contamination(train, eval_df, n=n, min_common=1).collect()
    }
    want = {
        i: (len(py_shingles(t, n) & eval_grams), len(py_shingles(t, n) & eval_grams) >= 1)
        for i, t in enumerate(train_texts)
    }
    assert got == want


multiline_doc = st.lists(
    st.lists(st.sampled_from(WORDS[:3]), min_size=0, max_size=5).map(" ".join),
    min_size=0,
    max_size=5,
).map("\n".join)


def py_repetition(text: str) -> dict:
    from collections import Counter

    strip_chars = " \t\x0b\f\r"
    lines = [l.strip(strip_chars) for l in text.split("\n")]
    lines = [l for l in lines if l]
    lc = Counter(lines)
    n_lines = len(lines)
    tot = sum(c * len(l) for l, c in lc.items())
    dup = sum(c * len(l) for l, c in lc.items() if c > 1)
    toks = text.split()
    g2 = Counter(" ".join(toks[i : i + 2]) for i in range(len(toks) - 1))
    g5 = Counter(" ".join(toks[i : i + 5]) for i in range(len(toks) - 4))
    top2 = 0.0
    if g2 and text:
        neg_cnt, gram = min((-c, g) for g, c in g2.items())
        top2 = (-neg_cnt) * len(gram) / len(text)
    dup5 = sum(c * len(g) for g, c in g5.items() if c > 1)
    return {
        "n_lines": n_lines,
        "dup_line_frac": round((n_lines - len(lc)) / n_lines, 6) if n_lines else 0.0,
        "dup_line_char_frac": round(dup / tot, 6) if tot else 0.0,
        "top_2gram_char_frac": round(top2, 6),
        "dup_5gram_char_frac": round(dup5 / len(text), 6) if text else 0.0,
    }


@given(texts=st.lists(multiline_doc, min_size=1, max_size=6))
@settings(**SETTINGS)
def test_repetition_stats_matches_python_model(spark, texts):
    """Every metric equals the pure-Python replay on arbitrary tiny docs
    (empty docs, duplicate lines, tie-broken top 2-grams)."""
    from clickhouse_segments_tutorial_spark.operators.text import repetition_stats

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r.doc_id: {k: v for k, v in r.asDict().items() if k != "doc_id"}
           for r in repetition_stats(df).collect()}
    want = {i: py_repetition(t) for i, t in enumerate(texts)}
    assert got == want


@given(texts=st.lists(multiline_doc, min_size=1, max_size=6))
@settings(**SETTINGS)
def test_dedup_paragraphs_matches_python_model(spark, texts):
    """Cross-doc paragraph dedup == the sequential-scan Python model: keep
    a paragraph iff its value was never seen at any earlier (doc, pos)."""
    from clickhouse_segments_tutorial_spark.operators.dedup import dedup_paragraphs

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r.doc_id: r.asDict() for r in dedup_paragraphs(df).collect()}

    seen: set = set()
    for i, t in enumerate(texts):
        paras = [p.strip(" \t\x0b\f\r") for p in t.split("\n")]
        paras = [p for p in paras if p]
        kept = []
        for p in paras:
            if p not in seen:
                seen.add(p)
                kept.append(p)
        assert got[i] == {
            "doc_id": i,
            "clean_text": "\n".join(kept),
            "n_paras": len(paras),
            "n_kept_paras": len(kept),
        }, (i, t)


pii_fragment = st.sampled_from(
    [
        "plain words here",
        "bob@x.io",
        "a.b-c_d@mail.example.com",
        "10.0.0.1",
        "256.1.1.1",          # still 4 octets -> matched by the crude rule
        "+44 (0)20 7946 0958",
        "555-0100x",
        "v1.2.3.4beta",       # \b keeps this matched inside the word run
        "no@tld@",
    ]
)


@given(frags=st.lists(pii_fragment, min_size=1, max_size=6))
@settings(**SETTINGS)
def test_redact_pii_matches_python_re(spark, frags):
    """The staged redaction equals Python re with the same patterns — the
    patterns use only explicit ASCII classes, so Java regex, RE2, and
    Python re agree; proving it against re pins the cross-engine claim."""
    import re

    from clickhouse_segments_tutorial_spark.operators.text import (
        PII_PATTERNS,
        redact_pii,
    )

    text = " ".join(frags)
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    row = redact_pii(df).first().asDict()
    cur = text
    for name, pat, token in PII_PATTERNS:
        pat_py = pat.replace(r"\x20", " ")
        assert row[f"n_{name}"] == len(re.findall(pat_py, cur)), (name, cur)
        cur = re.sub(pat_py, token, cur)
    assert row["redacted_text"] == cur


@given(
    strata=st.lists(st.sampled_from(["a", "b", "c"]), min_size=2, max_size=40),
    w_a=st.floats(min_value=0.1, max_value=0.9),
)
@settings(**SETTINGS)
def test_mix_corpus_copy_counts_match_python_model(spark, strata, w_a):
    """Every row's copy count equals the Python-computed floor(rate) +
    md5-draw fractional epoch — exact replication of the engine rule, so
    the operator is provably partitioning- and engine-invariant."""
    import hashlib
    import math

    from clickhouse_segments_tutorial_spark.operators.sampling import mix_corpus

    weights = {"a": w_a, "b": 1.0 - w_a}
    df = spark.createDataFrame(list(enumerate(strata)), "doc_id long, src string")
    counts = {}
    for _, s in enumerate(strata):
        counts[s] = counts.get(s, 0) + 1
    total = sum(counts.get(s, 0) for s in weights)
    wsum = sum(weights.values())
    try:
        mixed = mix_corpus(
            df, weights, strata_col="src", key_col="doc_id", max_rate=50.0
        ).collect()
    except ValueError:
        return  # guard tripped (stratum absent) — nothing to compare
    got = {}
    for r in mixed:
        got[r.doc_id] = got.get(r.doc_id, 0) + 1
    want = {}
    for i, s in enumerate(strata):
        if s not in weights or counts.get(s, 0) == 0:
            continue
        rate = (total * weights[s] / wsum) / counts[s]
        frac = rate - math.floor(rate)
        thresh = format(int(frac * (1 << 32)), "08x")
        draw = hashlib.md5(f"{i}:{s}".encode()).hexdigest()[:8]
        n = math.floor(rate) + (1 if draw < thresh else 0)
        if n >= 1:
            want[i] = n
    assert got == want


def py_duplicate_spans(texts: list[str], k: int = 3) -> dict:
    """Sequential-scan model of duplicate_spans: corpus k-gram counts,
    per-doc duplicated positions, maximal-interval merge."""
    from collections import Counter

    toks = {i: t.split() for i, t in enumerate(texts)}
    counts = Counter()
    for t in toks.values():
        for p in range(len(t) - k + 1):
            counts[" ".join(t[p : p + k])] += 1
    out = {}
    for i, t in enumerate(toks.values()):
        n = len(t)
        dup_pos = [
            p for p in range(n - k + 1) if counts[" ".join(t[p : p + k])] >= 2
        ]
        spans = []
        for p in dup_pos:
            if spans and p <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], p + k - 1)
            else:
                spans.append([p, p + k - 1])
        cov = sum(e - s + 1 for s, e in spans)
        out[i] = {
            "n_tokens": n,
            "n_grams": max(n - k + 1, 0),
            "n_dup_grams": len(dup_pos),
            "n_dup_spans": len(spans),
            "dup_tokens": cov,
            "dup_frac": cov / n if n else 0.0,
        }
    return out


@given(texts=doc_strategy)
@settings(**SETTINGS)
def test_duplicate_spans_matches_python_model(spark, texts):
    """Integer-exact span semantics vs the sequential model on random tiny
    corpora (overlapping islands, within-doc repeats, sub-k docs)."""
    from clickhouse_segments_tutorial_spark.operators.dedup import duplicate_spans

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r.doc_id: {c: v for c, v in r.asDict().items() if c != "doc_id"}
           for r in duplicate_spans(df, k=3).collect()}
    assert got == py_duplicate_spans(texts, k=3)


def py_bigram_nll(texts: list[str]) -> dict:
    import math
    from collections import Counter

    import re

    def terms(t):
        out = []
        for tok in t.split():
            w = re.sub(r"^[^a-z0-9]+|[^a-z0-9]+$", "", tok.lower())
            if re.fullmatch(r"[a-z0-9]+", w):
                out.append(w)
        return out

    streams = {i: terms(t) for i, t in enumerate(texts)}
    vocab = {w for s in streams.values() for w in s}
    bigrams = {i: list(zip(s, s[1:])) for i, s in streams.items()}
    bc = Counter(b for bs in bigrams.values() for b in bs)
    uc = Counter(b[0] for bs in bigrams.values() for b in bs)
    out = {}
    for i, bs in bigrams.items():
        if not bs:
            out[i] = {"n_bigrams": 0, "avg_nll": None}
            continue
        lns = [round(math.log((bc[b] + 1.0) / (uc[b[0]] + len(vocab))), 12) for b in bs]
        out[i] = {"n_bigrams": len(bs), "avg_nll": round(-sum(lns) / len(bs), 6)}
    return out


@given(texts=doc_strategy)
@settings(**SETTINGS)
def test_bigram_nll_matches_python_model(spark, texts):
    """LM scoring vs the sequential model (smoothing denominator uses the
    FULL kept-term vocab, including terms that never start a bigram)."""
    from clickhouse_segments_tutorial_spark.operators.corpus_stats import bigram_nll

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r.doc_id: {c: v for c, v in r.asDict().items() if c != "doc_id"}
           for r in bigram_nll(df).collect()}
    assert got == py_bigram_nll(texts)


def py_strip_spans(texts: list[str], k: int = 3) -> dict:
    """Sequential model: first occurrence per gram by (doc, pos); every
    later occurrence's k positions are removed from its doc."""
    toks = {i: t.split() for i, t in enumerate(texts)}
    first: dict[str, tuple[int, int]] = {}
    for i in sorted(toks):
        t = toks[i]
        for p in range(len(t) - k + 1):
            first.setdefault(" ".join(t[p : p + k]), (i, p))
    out = {}
    for i, t in enumerate(toks.values()):
        removed = set()
        for p in range(len(t) - k + 1):
            if first[" ".join(t[p : p + k])] != (i, p):
                removed.update(range(p, p + k))
        kept = [tok for j, tok in enumerate(t) if j not in removed]
        out[i] = {
            "clean_text": " ".join(kept),
            "n_tokens": len(t),
            "n_kept_tokens": len(kept),
            "n_removed_tokens": len(t) - len(kept),
        }
    return out


@given(texts=doc_strategy)
@settings(**SETTINGS)
def test_strip_duplicate_spans_matches_python_model(spark, texts):
    """Rewrite semantics vs the sequential model: globally-first copy
    survives, overlapping redundant grams union their coverage, the
    rebuilt text preserves original token order."""
    from clickhouse_segments_tutorial_spark.operators.dedup import strip_duplicate_spans

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r.doc_id: {c: v for c, v in r.asDict().items() if c != "doc_id"}
           for r in strip_duplicate_spans(df, k=3).collect()}
    assert got == py_strip_spans(texts, k=3)


@given(
    times=st.lists(st.integers(0, 200), min_size=1, max_size=10),
    windows=st.lists(
        st.tuples(st.integers(0, 200), st.integers(0, 60)),
        min_size=1,
        max_size=6,
    ),
    bucket=st.sampled_from([7, 50, 86400]),
)
@settings(**SETTINGS)
def test_interval_join_matches_python_model(spark, times, windows, bucket):
    """interval_join == the brute-force point-in-window model for any
    points/intervals/bucket granularity, including boundary hits, empty
    matches, overlapping windows, and bucket sizes far off the window
    length (the bucket only generates candidates; the exact filter
    decides)."""
    from clickhouse_segments_tutorial_spark.operators.interval_join import (
        interval_join,
    )

    t0 = dt.datetime(2024, 1, 1)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    points = spark.createDataFrame(
        [(1, i, ts(s)) for i, s in enumerate(times)],
        "user_id long, pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(1, j, ts(a), ts(a + d)) for j, (a, d) in enumerate(windows)],
        "user_id long, wid long, win_start timestamp, win_end timestamp",
    )
    got = sorted(
        (r.pid, r.wid)
        for r in interval_join(
            points, intervals, keys=["user_id"], point_ts="ts",
            start_ts="win_start", end_ts="win_end", bucket_seconds=bucket,
        ).collect()
    )
    expected = sorted(
        (i, j)
        for i, s in enumerate(times)
        for j, (a, d) in enumerate(windows)
        if a <= s <= a + d
    )
    assert got == expected


@given(
    a=st.sets(st.integers(0, 10_000), min_size=0, max_size=40),
    b=st.sets(st.integers(0, 10_000), min_size=0, max_size=40),
    k=st.sampled_from([4, 16]),
)
@settings(**SETTINGS)
def test_kmv_merge_and_estimates_match_python_model(spark, a, b, k):
    """KMV vs a pure-Python model on arbitrary overlapping sets: the
    sketch is exactly the sorted bottom-k distinct md5-60 hashes, the
    merge equals the sketch of the union (losslessness, as array
    equality), and the union/intersection estimators reproduce the
    theta-clip formulas bit-for-bit — across empty, sub-k, and full
    regimes in any combination."""
    import hashlib

    from clickhouse_segments_tutorial_spark.operators.kmv import (
        M_DOMAIN,
        kmv_difference_estimate,
        kmv_intersect_estimate,
        kmv_merge,
        kmv_sketch,
        kmv_union_estimate,
    )

    def h60(x):
        return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)

    def sk(items):
        return sorted({h60(x) for x in items})[:k]

    rows = [("a", x) for x in a] + [("b", x) for x in b]
    df = spark.createDataFrame(rows or [("z", 0)], "g string, item long")
    sa = (
        kmv_sketch(df.filter("g = 'a'"), [], "item", k=k)
        .withColumnRenamed("sketch", "sa")
    )
    sb = (
        kmv_sketch(df.filter("g = 'b'"), [], "item", k=k)
        .withColumnRenamed("sketch", "sb")
    )
    row = (
        sa.crossJoin(sb)
        .select(
            F.col("sa"),
            F.col("sb"),
            kmv_merge(F.col("sa"), F.col("sb"), k=k).alias("m"),
            kmv_union_estimate(F.col("sa"), F.col("sb"), k=k).alias("eu"),
            kmv_intersect_estimate(F.col("sa"), F.col("sb"), k=k).alias("ei"),
            kmv_difference_estimate(F.col("sa"), F.col("sb"), k=k).alias("ed"),
        )
        .collect()[0]
    )
    assert row["sa"] == sk(a) and row["sb"] == sk(b)
    assert row["m"] == sk(a | b)  # merge losslessness

    def est(sketch):
        return (
            float(len(sketch))
            if len(sketch) < k
            else (k - 1) * M_DOMAIN / float(sketch[k - 1])
        )

    assert row["eu"] == est(sk(a | b))
    theta = min(
        float(sk(a)[k - 1]) if len(sk(a)) >= k else M_DOMAIN,
        float(sk(b)[k - 1]) if len(sk(b)) >= k else M_DOMAIN,
    )
    ra = sk(a)[: k - 1] if len(sk(a)) >= k else sk(a)
    rb = sk(b)[: k - 1] if len(sk(b)) >= k else sk(b)
    m = sum(1 for h in set(ra) & set(rb) if float(h) < theta)
    assert row["ei"] == m * M_DOMAIN / theta
    d = sum(1 for h in set(ra) - set(rb) if float(h) < theta)
    assert row["ed"] == d * M_DOMAIN / theta


@given(
    xy=st.lists(
        st.tuples(st.integers(0, 63), st.integers(0, 63)),
        min_size=1,
        max_size=12,
    )
)
@settings(**SETTINGS)
def test_zorder_key_matches_python_interleave(spark, xy):
    """zorder_key == the pure-Python Morton interleave for arbitrary
    coordinates, and deinterleaving the key recovers both inputs (the
    expression is a bijection on the quantized grid)."""
    from clickhouse_segments_tutorial_spark.sources.zorder import zorder_key

    def morton(x, y, bits=6):
        z = 0
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    df = spark.createDataFrame(xy, "x long, y long")
    got = [
        r.z
        for r in df.select(
            zorder_key([F.col("x"), F.col("y")], bits=6).alias("z")
        ).collect()
    ]
    assert got == [morton(x, y) for x, y in xy]
    for (x, y), z in zip(xy, got):
        rx = sum(((z >> (2 * b)) & 1) << b for b in range(6))
        ry = sum(((z >> (2 * b + 1)) & 1) << b for b in range(6))
        assert (rx, ry) == (x, y)


def test_zorder_key_check_flags_off_grid_values(spark):
    """check=True enforces zorder_key's quantization contract at
    runtime (r14 ADVICE: a value >= 2**bits previously ALIASED silently
    — high bits simply not interleaved — quietly degrading the
    clustering/pruning the key exists for): on-grid values produce the
    identical key as the unchecked expression; any off-grid value fails
    the job loudly with the offending tuple in the message."""
    from clickhouse_segments_tutorial_spark.sources.zorder import zorder_key

    ok = spark.createDataFrame([(3, 5), (63, 0)], "x long, y long")
    cols = [F.col("x"), F.col("y")]
    plain = [r.z for r in ok.select(zorder_key(cols, bits=6).alias("z")).collect()]
    checked = [
        r.z
        for r in ok.select(
            zorder_key(cols, bits=6, check=True).alias("z")
        ).collect()
    ]
    assert checked == plain

    import pytest

    bad = spark.createDataFrame([(3, 5), (64, 0)], "x long, y long")
    with pytest.raises(Exception, match="off the \\[0, 64\\) grid"):
        bad.select(zorder_key(cols, bits=6, check=True).alias("z")).collect()


@given(
    vals=st.lists(
        st.floats(min_value=-50.0, max_value=1100.0, allow_nan=False),
        min_size=1,
        max_size=60,
    ),
    q=st.sampled_from([0.01, 0.25, 0.5, 0.75, 0.99]),
)
@settings(**SETTINGS)
def test_hist_quantile_matches_python_model(spark, vals, q):
    """hist_sketch + hist_quantile == a pure-Python replay of the
    binning, rank, and interpolation rules for arbitrary inputs —
    including out-of-domain values (edge-bin saturation) — and the
    estimate always lands inside the located bin's value range."""
    from clickhouse_segments_tutorial_spark.operators.quantile_sketch import (
        hist_quantile,
        hist_sketch,
    )

    lo, hi, bins = 0.0, 1000.0, 50
    width = (hi - lo) / bins
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    sk = hist_sketch(df, [], "v", lo=lo, hi=hi, bins=bins)
    got = sk.select(
        hist_quantile(F.col("sketch"), q, lo=lo, hi=hi, bins=bins).alias("e")
    ).collect()[0]["e"]

    # python model
    import math

    counts = [0] * bins
    for v in vals:
        counts[min(bins - 1, max(0, math.floor((v - lo) / width)))] += 1
    n = len(vals)
    r = min(max(math.floor(q * n) + 1, 1), n)
    cum = 0
    for b, c in enumerate(counts):
        if c > 0 and cum + c >= r:
            est = round(lo + width * (b + (r - cum) / c), 6)
            break
        cum += c
    assert got == est
    assert lo + b * width <= got <= lo + (b + 1) * width + 1e-9


@given(
    seq=st.lists(st.sampled_from(["a", "b", "x"]), min_size=1, max_size=40)
)
@settings(**SETTINGS)
def test_sequence_count_matches_greedy_scan(spark, seq):
    """sequence_count's min-cut closed form == the greedy scan (hold
    unmatched firsts, consume one per later second) for ARBITRARY
    interleavings including irrelevant events — the exchange-argument
    optimum the operator claims. Also checks users absent from the
    filtered stream emit no row."""
    import datetime as dtm

    from clickhouse_segments_tutorial_spark.operators.funnel import (
        sequence_count,
    )

    t0 = dtm.datetime(2024, 1, 1)
    rows = [
        (7, {"a": "first", "b": "second", "x": "noise"}[c],
         t0 + dtm.timedelta(seconds=i), i)
        for i, c in enumerate(seq)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, event_id long"
    )
    out = sequence_count(df, "first", "second").collect()

    avail = matched = 0
    for c in seq:
        if c == "a":
            avail += 1
        elif c == "b" and avail > 0:
            avail -= 1
            matched += 1
    if all(c == "x" for c in seq):
        assert out == []
    else:
        assert len(out) == 1 and out[0].n_chains == matched
