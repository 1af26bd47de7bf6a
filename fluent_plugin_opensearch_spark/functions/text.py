"""Unicode-aware tokenization shared by search, dedup, lang-id and
token counting.

Why this exists (round-5 top item): the original tokenizers were
ASCII/whitespace-bound — ``[^a-z0-9]+`` query/term splits and
``split(trim(x), '\\s+')`` shingles. A CJK document (no spaces)
yielded ZERO search terms and ZERO shingles, silently excluding it
from BM25/TF-IDF and every near-dup family. The reference pipeline is
byte-agnostic (out_opensearch.rb:363-373 serializes whatever UTF-8 it
receives), so the graft was NARROWER than the reference on non-Latin
content.

Design — one normalization, two token shapes, three engines:

* **CJK padding**: every codepoint in a script whose words are not
  whitespace-delimited (Han, kana, Hangul) is space-padded, turning
  each into its own token (Lucene StandardAnalyzer's unigram CJK
  treatment). The pad regex is spelled with ``\\x{....}`` escapes,
  which parse identically in Java regex (Spark) and RE2 (DuckDB
  oracles); Python (driver-side query splitting) uses ``\\uXXXX``
  twins. On text containing no CJK the pad is a byte-identical no-op,
  so every pre-existing ASCII oracle is unaffected.
* **``ws_tokens``** — whitespace tokens after padding: the historical
  shingle/token-count shape (punctuation stays attached), now
  CJK-aware.
* **``unicode_tokens``** — lowercased ``[\\p{L}\\p{N}]+`` word runs
  after padding: the search shape (punctuation stripped). ``\\p{L}``
  is supported by Java regex and RE2 with the same spelling. On ASCII
  input this matches the historical ``[^a-z0-9]+`` split exactly.

Case-parity note: Spark's lower() uses full Unicode case mapping and
DuckDB's utf8proc mapping agrees on 1:1 mappings (Latin, Cyrillic,
Greek); locale-sensitive full mappings (e.g. U+0130 İ) can diverge
between engines — CJK scripts are caseless so the padded path is
safe, and the planted multilingual oracles pin the parity we rely on.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

#: scripts without whitespace word boundaries → unigram tokens.
#: (start, end) codepoint ranges: CJK ext-A, CJK Unified, CJK compat
#: ideographs, Hiragana+Katakana, Hangul syllables.
_CJK_RANGES = (
    ("3400", "4DBF"),
    ("4E00", "9FFF"),
    ("F900", "FAFF"),
    ("3040", "30FF"),
    ("AC00", "D7AF"),
)

#: Java/RE2 char-class body, e.g. ``\x{3400}-\x{4DBF}...``
CJK_CLASS = "".join(rf"\x{{{a}}}-\x{{{b}}}" for a, b in _CJK_RANGES)
#: Python re twin (``\uXXXX`` spelling)
CJK_CLASS_PY = "".join(rf"\u{a}-\u{b}" for a, b in _CJK_RANGES)


def _lit(ranges) -> str:
    """Literal-codepoint spelling of a char-class body (``一-鿿``…) —
    brace-free, so SQL oracle fragments built from it interpolate
    safely into Python f-strings; RE2 and Java parse it identically."""
    return "".join(chr(int(a, 16)) + "-" + chr(int(b, 16)) for a, b in ranges)


CJK_CLASS_LIT = _lit(_CJK_RANGES)

#: other script classes used by lang-id (dual-dialect spelling)
HAN_CLASS = r"\x{3400}-\x{4DBF}\x{4E00}-\x{9FFF}\x{F900}-\x{FAFF}"
KANA_CLASS = r"\x{3040}-\x{30FF}"
HANGUL_CLASS = r"\x{AC00}-\x{D7AF}"
CYRILLIC_CLASS = r"\x{0400}-\x{04FF}"
HAN_CLASS_LIT = _lit((("3400", "4DBF"), ("4E00", "9FFF"), ("F900", "FAFF")))
KANA_CLASS_LIT = _lit((("3040", "30FF"),))
HANGUL_CLASS_LIT = _lit((("AC00", "D7AF"),))
CYRILLIC_CLASS_LIT = _lit((("0400", "04FF"),))

_PAD_RE = f"([{CJK_CLASS}])"
_PAD_RE_PY = re.compile(f"([{CJK_CLASS_PY}])")

#: the search token class — identical spelling in Java regex and RE2
TOKEN_CLASS = r"[\p{L}\p{N}]+"
#: Python twin: \w minus underscore (letters+digits incl. full Unicode)
_TOKEN_RE_PY = re.compile(r"[^\W_]+", re.UNICODE)


# ---------------------------------------------------------------------------
# Spark expressions
# ---------------------------------------------------------------------------

def cjk_pad(col: Column) -> Column:
    """Space-pad each CJK codepoint (no-op on non-CJK text)."""
    return F.regexp_replace(col, _PAD_RE, " $1 ")


def ws_tokens(col: Column) -> Column:
    """Whitespace tokens of CJK-padded text — drop-in replacement for
    the historical ``split(trim(x), '\\s+')`` (byte-identical on text
    without CJK; CJK chars become single-char tokens)."""
    return F.split(F.trim(cjk_pad(col)), r"\s+")


def unicode_tokens(col: Column) -> Column:
    """Lowercased ``[\\p{L}\\p{N}]+`` word tokens of CJK-padded text —
    the search-side tokenizer (matches the historical ``[^a-z0-9]+``
    split exactly on ASCII input)."""
    return F.regexp_extract_all(cjk_pad(F.lower(col)), F.lit(TOKEN_CLASS), F.lit(0))


def n_chars_in(col: Column, char_class: str) -> Column:
    """Count of codepoints of ``col`` inside a regex char-class body
    (length-difference trick: both engines count codepoints, both
    regexp_replace calls are global — DuckDB twin passes 'g')."""
    return (F.length(col) - F.length(F.regexp_replace(col, f"[{char_class}]", ""))).cast("bigint")


# ---------------------------------------------------------------------------
# DuckDB SQL fragments (oracle twins — same semantics, RE2 spellings).
# All fragments are BRACE-FREE (literal codepoint ranges, `\pL` short
# property names) so they interpolate into f-string oracle CTEs
# without escaping.
# ---------------------------------------------------------------------------

def cjk_pad_sql(expr: str) -> str:
    return rf"regexp_replace({expr}, '([{CJK_CLASS_LIT}])', ' \1 ', 'g')"


def ws_tokens_sql(expr: str) -> str:
    return rf"string_split_regex(trim({cjk_pad_sql(expr)}), '\s+')"


def unicode_tokens_sql(expr: str) -> str:
    return rf"regexp_extract_all({cjk_pad_sql(f'lower({expr})')}, '[\pL\pN]+')"


#: brace-free BPE-ish twin of curation._BPE_ISH (applied to padded text)
BPE_ISH_SQL = r"\pL+|\d+|[^\s\pL\d]"


def n_chars_in_sql(expr: str, char_class_lit: str) -> str:
    return (
        f"CAST(length({expr}) - length(regexp_replace({expr}, '[{char_class_lit}]', '', 'g')) AS BIGINT)"
    )


# ---------------------------------------------------------------------------
# Python twin (driver-side query splitting)
# ---------------------------------------------------------------------------

def tokenize_py(text: str) -> list[str]:
    """Python twin of ``unicode_tokens`` for driver-side query strings
    (parity-tested against the Spark expression)."""
    padded = _PAD_RE_PY.sub(r" \1 ", text.lower().strip())
    return _TOKEN_RE_PY.findall(padded)
