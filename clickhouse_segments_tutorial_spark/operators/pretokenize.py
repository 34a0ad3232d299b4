"""GPT-2-style byte-level pre-tokenization for the learned tokenizers.

The corpus-trained BPE (operators/bpe.py) and unigram-LM
(operators/unigram.py) both consume a (word, freq) dictionary built by
whitespace tokenization with CHARACTER seeding — fine for the all-ASCII
registered testdata, but a realistic multilingual corpus needs the
published byte-level convention (Radford et al. 2019, GPT-2; the
tiktoken/HuggingFace lineage): a regex pre-tokenizer splits text into
pre-tokens that KEEP their leading space, each pre-token's UTF-8 bytes
are remapped one-to-one onto printable Basic-Multilingual-Plane
characters, and the tokenizer trains on those byte-characters. This
module provides exactly that front end; the train loops are unchanged
(README "byte-init" note) because after :func:`byte_encode` each
CHARACTER of the dictionary word IS one byte of the original text.

Why the byte-character remap (beyond matching the published
convention): it gives the tokenizers a CLOSED 256-symbol alphabet
(every future corpus is segmentable with no out-of-alphabet seeding)
and whitespace-aware pre-tokens (``Ġthe`` vs ``the``), and it makes
engine portability INSENSITIVE to string-splitting semantics: every
encoded character lies in U+0021..U+0143 — printable, strictly BMP —
where codepoint, UTF-16 code-unit, and UTF-8 byte-order views all
coincide, on any engine version. (Char-mode itself was MEASURED
portable on this Spark/DuckDB pair, non-BMP included — Spark 4 splits
and collates by codepoint/UTF-8 order; see the rewritten
operators/bpe.py caveat and tests/test_pretokenize.py — so the remap
is belt-and-braces there, not a bug fix.)

Pre-tokenizer pattern: the GPT-2 regex with ONE documented deviation —
the published pattern's trailing-whitespace lookahead ``\\s+(?!\\S)``
is dropped because DuckDB's RE2 has no lookahead; a run of 2+ spaces
therefore folds into one whitespace pre-token instead of donating its
last space to the following word. Both engines run the SAME pattern
(Java regex and RE2 agree on this lookahead-free subset: verified
leftmost-first alternation, ``\\p{L}``/``\\p{N}`` Unicode classes), so
cross-engine replay is exact; only fidelity to GPT-2 on multi-space
runs is approximate. Concatenating the pre-tokens reproduces the input
text byte-for-byte (losslessness is pinned in tests).

Scale design (100 TB corpus): both functions are pure Catalyst
expressions (regexp_extract_all; hex/substr/element_at over a 256-entry
literal map) — JVM-side, whole-stage codegen, no Python, no shuffle.
The byte remap costs one map probe per input byte during the ONE
corpus-sized dictionary-building pass; everything downstream is
dictionary-sized (Heaps' law, the bpe.py argument).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# GPT-2's pre-tokenizer minus the RE2-incompatible trailing-whitespace
# lookahead (module docstring). Shared verbatim by both engines.
GPT2ISH_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def byte_unicode_table() -> dict[int, int]:
    """The GPT-2 byte-to-unicode map: printable latin bytes
    (``!``..``~``, ``¡``..``¬``, ``®``..``ÿ``) map to their own
    codepoint; the remaining 68 bytes (controls, space, DEL, ``­``)
    map to U+0100.. in ascending byte order. Bijective; every image
    codepoint is < U+0144 (BMP, printable)."""
    keep = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    table = {b: b for b in keep}
    n = 0
    for b in range(256):
        if b not in table:
            table[b] = 256 + n
            n += 1
    return table


_B2C = byte_unicode_table()
_C2B = {c: b for b, c in _B2C.items()}

# 256-entry literal map, hex pair -> byte-character. Built once at
# import; Catalyst folds it into the plan as one constant.
_ENC_MAP = None


def _enc_map() -> Column:
    global _ENC_MAP
    if _ENC_MAP is None:
        kv: list[Column] = []
        for b, c in sorted(_B2C.items()):
            kv += [F.lit(f"{b:02X}"), F.lit(chr(c))]
        _ENC_MAP = F.create_map(*kv)
    return _ENC_MAP


def pretokens(text: str | Column) -> Column:
    """GPT-2-style pre-tokens of ``text`` (RAW, not byte-encoded), in
    order, leading spaces attached — ``array_join(result, '')`` equals
    the input. Empty text -> empty array."""
    col = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(col, F.lit(GPT2ISH_RE), F.lit(0))


def byte_encode(s: str | Column) -> Column:
    """``s`` as its byte-character string: one BMP character per UTF-8
    byte of the input (module docstring). '' -> ''."""
    col = F.col(s) if isinstance(s, str) else s
    b = F.encode(col, "UTF-8")
    h = F.hex(b)
    pairs = F.transform(
        F.sequence(F.lit(1), F.length(b)),
        lambda i: h.substr(((i - 1) * 2 + 1).cast("int"), F.lit(2)),
    )
    return F.when(F.length(col) == 0, F.lit("")).otherwise(
        F.array_join(F.transform(pairs, lambda p: F.element_at(_enc_map(), p)), "")
    )


def byte_decode(s: str | Column) -> Column:
    """Inverse of :func:`byte_encode` — the display/export path for
    learned byte-level symbols (a merge table's ``lhs+rhs`` or a
    unigram piece decodes to the original text fragment; a fragment
    that splits a multi-byte character mid-sequence decodes to
    replacement characters, as the published byte-level tokenizers'
    decoders do)."""
    col = F.col(s) if isinstance(s, str) else s
    kv: list[Column] = []
    for c, b in sorted(_C2B.items()):
        kv += [F.lit(chr(c)), F.lit(f"{b:02X}")]
    dec = F.create_map(*kv)
    chars = F.filter(F.split(col, ""), lambda ch: ch != F.lit(""))
    # a character OUTSIDE the byte-character image (arbitrary input, not
    # a byte_encode product) maps to NULL, which array_join would DROP —
    # silently vanishing bytes instead of the documented replacement
    # character. Coalesce it to U+FFFD's UTF-8 bytes so decode stays
    # total: every input char yields a visible output char (r12 ADVICE).
    hexes = F.array_join(
        F.transform(
            chars, lambda ch: F.coalesce(F.element_at(dec, ch), F.lit("EFBFBD"))
        ),
        "",
    )
    # binary -> string cast reinterprets the bytes without validation;
    # make_valid_utf8 then substitutes U+FFFD for invalid sequences —
    # the replacement-character contract (a strict decode() would RAISE
    # on a merge fragment that splits a multi-byte character)
    return F.when(F.length(col) == 0, F.lit("")).otherwise(
        F.make_valid_utf8(F.unhex(hexes).cast("string"))
    )


def byte_pretoken_frequencies(
    df: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """(word, freq) dictionary over BYTE-ENCODED pre-tokens — the
    drop-in replacement for operators.bpe.word_frequencies that feeds
    ``bpe_train`` / ``unigram_train`` a byte-level corpus view: the
    existing char-init seeding then IS byte-init, because each
    character of ``word`` is one byte of the raw text. The one
    corpus-sized pass (explode + hash-agg), like its whitespace
    sibling."""
    return (
        df.select(
            F.explode(pretokens(text_col)).alias("rawtok")
        )
        .select(byte_encode(F.col("rawtok")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


# ---------------------------------------------------------------------------
# DuckDB oracle fragments (shared by the byte-mode registered queries)
# ---------------------------------------------------------------------------


def _sq(s: str) -> str:
    return s.replace("'", "''")


def bmap_values_sql() -> str:
    """The 256-row ``(hx, ch)`` VALUES list replaying
    :func:`byte_unicode_table` in DuckDB."""
    return ", ".join(
        f"('{b:02X}', '{_sq(chr(c))}')" for b, c in sorted(_B2C.items())
    )


# Oracle head: documents -> byte-encoded pre-token arrays (bt) and the
# (word, freq) dictionary (wf) — the byte-mode twin of curation._TOKENS_CTE
# + the train heads in bpe_queries/unigram_queries. `bt` keeps doc_id and
# the per-doc encoded-token ARRAY so corpus-join consumers (token counts,
# fertility) can reuse it exactly like `base.t`.
BYTE_TOKENS_CTE = f"""
bmap(hx, ch) AS (VALUES {bmap_values_sql()}),
bm AS MATERIALIZED (SELECT map(list(hx), list(ch)) AS mm FROM bmap),
bt AS MATERIALIZED (
  SELECT doc_id, source,
         [list_aggregate(
            [mm[substring(hex(encode(rt)), CAST(k * 2 + 1 AS INT), 2)][1]
             FOR k IN range(0, CAST(length(hex(encode(rt))) / 2 AS INT))],
            'string_agg', '')
          FOR rt IN regexp_extract_all(text, '{_sq(GPT2ISH_RE)}')] AS t
  FROM documents, bm
),
wf AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(t) AS word FROM bt) GROUP BY word
)"""
