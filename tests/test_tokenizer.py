"""Tokenizer parity with SQLite FTS5 unicode61 (the reference's tokenizer).

fts5vocab exposes FTS5's own (term, df, total_tf) — comparing against
our tokenize() pins the analysis chain end-to-end.
"""

from collections import Counter

import pytest

from gopensearch_spark.analysis import term_freqs, tokenize
from gopensearch_spark.fts5_oracle import Fts5Oracle


def _vocab_from_python(docs):
    df = Counter()
    cnt = Counter()
    for _id, text in docs:
        tf = term_freqs(text)
        for t, c in tf.items():
            df[t] += 1
            cnt[t] += c
    return sorted((t, df[t], cnt[t]) for t in df)


def _assert_parity(docs):
    o = Fts5Oracle()
    o.load(docs)
    assert o.vocab() == _vocab_from_python(docs)
    o.close()


def test_ascii_basic():
    _assert_parity([(1, "Hello, World! hello... 123 abc123 a_b")])


def test_punctuation_and_whitespace():
    _assert_parity([(1, "foo\tbar\nbaz--qux (one) [two] {three} a.b.c a@b.com 3.14")])


def test_unicode_diacritics_and_case():
    _assert_parity([(1, "Café CAFÉ café naïve Ünïcödé résumé"), (2, "Zürich STRASSE")])


def test_empty_and_only_separators():
    assert tokenize("") == []
    assert tokenize("!!! ... ---") == []


def test_term_freqs():
    assert term_freqs("a b a c a b") == {"a": 3, "b": 2, "c": 1}


def test_corpus_parity_small(docs_small):
    rows = docs_small.select("doc_id", "text").limit(200).collect()
    _assert_parity([(int(r["doc_id"]), r["text"]) for r in rows])


def test_python_xxh64_matches_spark(spark, docs_small):
    """The query-side pure-Python bucket hash must equal the builder's
    JVM xxhash64 for every vocabulary term (and edge-case strings)."""
    from pyspark.sql import functions as F

    from gopensearch_spark.xxh64 import spark_xxhash64_str, term_bucket

    vocab = (
        docs_small.select(F.explode(F.split(F.lower("text"), r"\W+")).alias("t"))
        .where(F.col("t") != "")
        .distinct()
        .select("t", F.xxhash64("t").alias("h"),
                F.pmod(F.xxhash64("t"), F.lit(64)).cast("int").alias("b"))
        .collect()
    )
    assert len(vocab) > 20
    for r in vocab:
        assert spark_xxhash64_str(r["t"]) == r["h"], r["t"]
        assert term_bucket(r["t"], 64) == r["b"], r["t"]
    edge = ["", "a", "0123456", "01234567", "0123456789abcdef0123456789abcdef!", "é漢字🙂"]
    rows = spark.createDataFrame([(w,) for w in edge], "w string").select(
        "w", F.xxhash64("w").alias("h")).collect()
    for r in rows:
        assert spark_xxhash64_str(r["w"]) == r["h"], repr(r["w"])
