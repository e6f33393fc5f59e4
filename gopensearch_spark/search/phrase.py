"""Phrase and prefix matching over the positional index.

FTS5 (the reference's delegated backend, reference pkg/server/db.go:49)
supports `"a b"` phrase queries and `ab*` prefix queries; both are
scored by bm25() as a SINGLE phrase unit: tf(doc) = number of phrase
(or any-matching-term) occurrences, df = number of docs containing the
unit, idf/weighting identical to a plain term (fts5_aux.c via
xQueryPhrase/xInstCount). We reproduce that exactly — rank-identity is
pinned in tests/test_rank_identity.py against the FTS5 oracle.

Execution shape (all sizes bounded by the query terms' postings):

- phrase: postings for the phrase's terms are read with term_bucket
  partition pruning + `term IN (...)` pushdown, grouped per doc_id (a
  shuffle of ONLY those postings), and an Arrow-batched pandas UDF
  decodes the delta+varint position lists and counts adjacency chains
  with vectorized `np.isin` — no per-position Python.
- prefix: `term LIKE 'p%'` is pushed to the parquet scan as
  StringStartsWith (term_bucket pruning is impossible under a hash
  layout — documented trade-off); per-doc tf is a plain sum.
- both need the unit's df for the final score; the match relation is
  persisted, counted (a metrics-sized job), then top-k'd — at cluster
  scale this is one extra pass over an already-filtered, in-memory
  relation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.storagelevel import StorageLevel

from gopensearch_spark import codecs
from gopensearch_spark.search.bm25 import K1, B, idf, term_buckets_for

_EMPTY = "doc_id long, score double"


def _score_topk(matches: DataFrame, n_docs: int, avgdl: float, k: int | None) -> DataFrame:
    """(doc_id, doc_len, tf) + unit df -> top-k (doc_id, score).

    ``k=None`` returns the full unordered scoring relation (the Engine
    joins it against filters before its own top-k — no global sort)."""
    matches = matches.persist(StorageLevel.MEMORY_AND_DISK)
    df_unit = matches.count()
    if df_unit == 0:
        return matches.sparkSession.createDataFrame([], _EMPTY)
    idf_u = idf(n_docs, df_unit)
    tf = F.col("tf").cast("double")
    dl = F.col("doc_len").cast("double")
    w = tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))
    scores = matches.select("doc_id", (F.lit(idf_u) * w).alias("score"))
    if k is None:
        return scores
    return scores.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def _make_phrase_tf_udf(phrase_terms: list[str]):
    """pandas UDF: (terms array, encoded-positions array) -> phrase tf.

    Chain check: keep start positions p of term0 such that term_i has a
    hit at p+i for every i — vectorized np.isin per term.
    """

    @F.pandas_udf(T.IntegerType())
    def phrase_tf(terms: pd.Series, poss: pd.Series) -> pd.Series:
        def one(ts, ps) -> int:
            pos = {t: codecs.delta_decode(bytes(p)).astype(np.int64) for t, p in zip(ts, ps)}
            starts = pos[phrase_terms[0]]
            for i, t in enumerate(phrase_terms[1:], 1):
                if starts.size == 0:
                    return 0
                starts = starts[np.isin(starts + i, pos[t])]
            return int(starts.size)

        return pd.Series(
            [one(ts, ps) for ts, ps in zip(terms, poss)], dtype="int32"
        )

    return phrase_tf


def phrase_match(
    spark: SparkSession, index_dir: str, phrase: str | list[str], k: int | None = 10
) -> DataFrame:
    """Top-k BM25 for a quoted phrase (`t MATCH '"a b"'` in FTS5)."""
    from gopensearch_spark.analysis import tokenize

    from gopensearch_spark.search.readers import corpus_stats, index_table

    terms = tokenize(phrase) if isinstance(phrase, str) else list(phrase)
    if not terms:
        raise ValueError("empty phrase after tokenization")
    stats = corpus_stats(index_dir)
    if not stats.get("with_positions"):
        raise ValueError(f"index at {index_dir} was built without positions")
    if len(terms) == 1:
        from gopensearch_spark.search.bm25 import bm25_match, bm25_scores

        if k is None:
            return bm25_scores(spark, index_dir, terms, mode="and")
        return bm25_match(spark, index_dir, terms, k=k, mode="and")

    distinct = sorted(set(terms))
    buckets = sorted(set(term_buckets_for(spark, distinct, stats["term_buckets"]).values()))
    posts = (
        index_table(spark, index_dir, "postings")
        .where(F.col("term_bucket").isin(buckets) & F.col("term").isin(distinct))
        .select("doc_id", "doc_len", "term", "positions")
    )
    grouped = (
        posts.groupBy("doc_id")
        .agg(
            F.collect_list("term").alias("terms"),
            F.collect_list("positions").alias("poss"),
            F.first("doc_len").alias("doc_len"),
        )
        .where(F.size("terms") == len(distinct))  # must contain every term
    )
    tf_udf = _make_phrase_tf_udf(terms)
    matches = grouped.select(
        "doc_id", "doc_len", tf_udf("terms", "poss").alias("tf")
    ).where(F.col("tf") > 0)
    return _score_topk(matches, stats["n_docs"], stats["avg_doc_len"], k)


def prefix_match(
    spark: SparkSession, index_dir: str, prefix: str, k: int | None = 10
) -> DataFrame:
    """Top-k BM25 for a prefix token (`t MATCH 'ab*'` in FTS5)."""
    from gopensearch_spark.analysis import tokenize

    from gopensearch_spark.search.readers import corpus_stats, index_table

    toks = tokenize(prefix)
    if len(toks) != 1:
        raise ValueError(f"prefix must be a single token, got {toks!r}")
    prefix = toks[0]
    stats = corpus_stats(index_dir)
    posts = (
        index_table(spark, index_dir, "postings")
        .where(F.col("term").startswith(prefix))
        .select("doc_id", "doc_len", "tf")
    )
    matches = posts.groupBy("doc_id").agg(
        F.sum("tf").alias("tf"), F.first("doc_len").alias("doc_len")
    )
    return _score_topk(matches, stats["n_docs"], stats["avg_doc_len"], k)
