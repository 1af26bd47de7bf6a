"""Unicode tokenization (functions/text.py): three-engine parity
(Spark Column expr / DuckDB SQL fragment / Python re twin), ASCII
no-op identity, script-tier lang-id, and CJK participation in search
and near-dup — the r4 VERDICT top gap."""

import duckdb
import pytest
from pyspark.sql import functions as F

from fluent_plugin_opensearch_spark.functions import text as T

MULTILINGUAL = [
    "Hello, World! foo_bar 42",
    "日本語のテキストです",
    "混合 mixed 文本 text",
    "Привет мир, как дела?",
    "Café naïve Zürich",
    "한국어 문서입니다",
    "分散システムの検索エンジンは転置インデックスを使う。",
    "the quick brown fox",
    "",
    "   ",
    "a",
    "ひらがなとカタカナとKanji漢字とlatin混じり text123",
]


@pytest.fixture(scope="module")
def tok_rows(spark):
    df = spark.createDataFrame([(s,) for s in MULTILINGUAL], "text string")
    return df.select(
        "text",
        T.unicode_tokens(F.col("text")).alias("uni"),
        T.ws_tokens(F.col("text")).alias("ws"),
        F.split(F.trim(F.col("text")), r"\s+").alias("ws_legacy"),
    ).collect()


def test_spark_matches_python_twin(tok_rows):
    for r in tok_rows:
        assert list(r.uni) == T.tokenize_py(r.text), r.text


def test_spark_matches_duckdb_fragment(tok_rows):
    con = duckdb.connect()
    for r in tok_rows:
        uni = con.execute(f"SELECT {T.unicode_tokens_sql('?')}", [r.text]).fetchone()[0]
        ws = con.execute(f"SELECT {T.ws_tokens_sql('?')}", [r.text]).fetchone()[0]
        assert list(r.uni) == uni, r.text
        assert list(r.ws) == ws, r.text


def test_ws_tokens_ascii_identity(tok_rows):
    """On text with no CJK codepoints the padded split is byte-identical
    to the historical split(trim(x), '\\s+') — the property that keeps
    every pre-r5 oracle output unchanged."""
    for r in tok_rows:
        if not any("぀" <= c <= "힯" or "一" <= c <= "鿿" for c in r.text):
            assert list(r.ws) == list(r.ws_legacy), r.text


def test_cjk_text_produces_tokens_and_shingles(spark):
    """A CJK doc (no whitespace) must yield search terms AND minhash
    shingles — under the r4 tokenizers it yielded zero of both."""
    from fluent_plugin_opensearch_spark.operators import dataset as DS
    from fluent_plugin_opensearch_spark.operators.search import term_postings

    docs = spark.createDataFrame(
        [(1, "分散システムの検索エンジン"), (2, "the quick brown fox")],
        "doc_id long, text string",
    )
    post = term_postings(docs).collect()
    cjk_terms = {r.term for r in post if r.doc_id == 1}
    assert "検" in cjk_terms and "索" in cjk_terms
    sigs = DS.minhash_signatures(docs, num_hashes=4).collect()
    assert {r.doc_id for r in sigs} == {1, 2}  # CJK doc has shingles now


def test_bm25_finds_cjk_document(spark):
    from fluent_plugin_opensearch_spark.operators.search import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "転置インデックスで高速検索"),
            (2, "the quick brown fox jumps"),
            (3, "検索エンジンの検索は検索らしい検索"),
        ],
        "doc_id long, text string",
    )
    hits = bm25_topk(docs, "検索", k=2).collect()
    assert [r.doc_id for r in hits] == [3, 1]  # tf-ordered, English absent


def test_lang_id_script_tier(spark):
    from fluent_plugin_opensearch_spark.operators.dataset import lang_id_ngram

    docs = spark.createDataFrame(
        [
            (1, "ひらがなと漢字のテキスト"),
            (2, "大规模语言模型的训练数据"),
            (3, "한국어 문서입니다"),
            (4, "Привет мир как дела"),
            (5, "the cat and the dog in the house"),
            (6, "der hund ist nicht das problem und die katze"),
            (7, "!!! ??? 123"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.pred_lang for r in lang_id_ngram(docs).collect()}
    assert got == {1: "ja", 2: "zh", 3: "ko", 4: "ru", 5: "en", 6: "de", 7: "unk"}


def test_query_splitter_matches_spark_tokenizer():
    from fluent_plugin_opensearch_spark.operators.search import _split_query

    assert _split_query("検索エンジン高速") == list("検索エンジン高速")
    assert _split_query("Hash JOIN merge!") == ["hash", "join", "merge"]


def test_oracle_fragments_not_drifted():
    """The oracle SQL in plans/queries.py bakes the generated tokenizer
    fragments as literals (inside r-strings); if functions/text.py
    changes, this asserts the baked copies were re-synced."""
    import fluent_plugin_opensearch_spark.plans.queries as Q

    src = open(Q.__file__.replace(".pyc", ".py")).read()
    ws_frag = T.ws_tokens_sql("text")
    assert src.count(ws_frag) >= 10, "ws_tokens_sql fragment drifted from queries.py"
    assert T.cjk_pad_sql("text") in src, "cjk_pad_sql fragment drifted"


def test_phrase_search(spark):
    """match_phrase analog: consecutive-position semantics, repeated
    query terms counted exactly, occurrence-count ranking, CJK
    no-whitespace phrases, and scattered-tokens non-matches."""
    from fluent_plugin_opensearch_spark.operators.search import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the cat mat"),
            (2, "cat and then the dog"),  # both terms, never adjacent as "the cat"
            (3, "the cat the cat the cat"),
            (4, "nothing relevant"),
            (5, "全文検索は高速です"),
        ],
        "doc_id long, text string",
    )
    got = [(r.rank, r.doc_id, r.n_occurrences) for r in phrase_search(docs, "the cat").collect()]
    assert got == [(1, 3, 3), (2, 1, 2)]  # doc2 has both terms, never adjacent
    # repeated term in the phrase: "the cat the" needs t(a)=the, t(a+1)=cat, t(a+2)=the
    got = [(r.rank, r.doc_id, r.n_occurrences) for r in phrase_search(docs, "the cat the").collect()]
    assert got == [(1, 3, 2)]
    got = [(r.rank, r.doc_id, r.n_occurrences) for r in phrase_search(docs, "全文検索").collect()]
    assert got == [(1, 5, 1)]
    assert phrase_search(docs, "missing phrase entirely").collect() == []
    with pytest.raises(ValueError, match="no tokens"):
        phrase_search(docs, "...")


def test_bpe_ish_counts_cjk_per_char(spark):
    from fluent_plugin_opensearch_spark.operators.dataset import token_count_bpe_ish

    docs = spark.createDataFrame(
        [(1, "abc def, 42"), (2, "日本語abc")], "doc_id long, text string"
    )
    got = {r.doc_id: (r.n_ws_tokens, r.n_bpe_tokens) for r in token_count_bpe_ish(docs).collect()}
    # doc1 ASCII: identical to r4 — 3 ws tokens; bpe: abc,def,',',42 = 4
    assert got[1] == (3, 4)
    # doc2: 3 CJK chars + 'abc' = 4 ws tokens (padded) and 4 bpe tokens
    assert got[2] == (4, 4)
