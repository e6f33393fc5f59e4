"""ES 8.x `knn` search section: exact cosine top-k over a dense-vector
column through the DSL engine, value-checked against DuckDB's
list_cosine_similarity on the same parquet. ES semantics pinned:
score = boost * (1 + cosine) / 2, `filter` is a PRE-filter on the
candidate set, `size` pages the k retrieved hits, and aggregations run
over the k knn hits (not the whole candidate set)."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

EMB = os.path.join(SF_SMALL, "embeddings.parquet")


@pytest.fixture(scope="module")
def knn_engine(spark):
    from gopensearch_spark.dsl import Engine

    e = Engine(spark)
    e.create_index("emb", spark.read.parquet(EMB), id_col="vec_id")
    return e


def _qv(spark, vec_id: int) -> list[float]:
    row = (
        spark.read.parquet(EMB).where(F.col("vec_id") == vec_id).head()
    )
    return [float(x) for x in row["embedding"]]


def _oracle_topk(qv: list[float], k: int, where: str = "TRUE") -> list[tuple]:
    con = duckdb.connect()
    try:
        return con.execute(
            f"""
            SELECT vec_id,
                   round((1 + list_cosine_similarity(embedding::DOUBLE[], ?::DOUBLE[])) / 2, 8) AS s
            FROM read_parquet('{EMB}')
            WHERE {where}
            ORDER BY s DESC, vec_id ASC LIMIT {k}
            """,
            [qv],
        ).fetchall()
    finally:
        con.close()


def test_knn_topk_matches_duckdb(knn_engine, spark):
    qv = _qv(spark, 3)
    out = knn_engine.search(
        "emb",
        {"knn": {"field": "embedding", "query_vector": qv, "k": 7}, "size": 7},
    )
    hits = [(int(h["_id"]), round(h["_score"], 8)) for h in out["hits"]["hits"]]
    assert hits == _oracle_topk(qv, 7)


def test_knn_filter_is_pre_filter(knn_engine, spark):
    qv = _qv(spark, 3)
    out = knn_engine.search(
        "emb",
        {
            "knn": {
                "field": "embedding",
                "query_vector": qv,
                "k": 5,
                "filter": {"range": {"label": {"gte": 5}}},
            },
            "size": 5,
        },
    )
    hits = [(int(h["_id"]), round(h["_score"], 8)) for h in out["hits"]["hits"]]
    assert hits == _oracle_topk(qv, 5, where="label >= 5")
    # every hit satisfies the filter (pre-filter, not post-trim)
    assert len(hits) == 5


def test_knn_size_pages_the_k_hits(knn_engine, spark):
    qv = _qv(spark, 0)
    full = knn_engine.search(
        "emb", {"knn": {"field": "embedding", "query_vector": qv, "k": 6}, "size": 6}
    )["hits"]["hits"]
    page = knn_engine.search(
        "emb",
        {"knn": {"field": "embedding", "query_vector": qv, "k": 6},
         "size": 2, "from": 2},
    )["hits"]["hits"]
    assert [h["_id"] for h in page] == [h["_id"] for h in full[2:4]]


def test_knn_boost_scales_score(knn_engine, spark):
    qv = _qv(spark, 1)
    base = knn_engine.search(
        "emb", {"knn": {"field": "embedding", "query_vector": qv, "k": 3}}
    )["hits"]["hits"]
    boosted = knn_engine.search(
        "emb",
        {"knn": {"field": "embedding", "query_vector": qv, "k": 3, "boost": 2.0}},
    )["hits"]["hits"]
    for b, h in zip(boosted, base):
        assert b["_id"] == h["_id"]
        assert b["_score"] == pytest.approx(2.0 * h["_score"], rel=1e-12)


def test_knn_aggs_run_over_knn_hits(knn_engine, spark):
    qv = _qv(spark, 3)
    out = knn_engine.search(
        "emb",
        {
            "knn": {"field": "embedding", "query_vector": qv, "k": 10},
            "aggs": {"labels": {"terms": {"field": "label", "size": 20}}},
            "size": 10,
        },
    )
    buckets = out["aggregations"]["labels"]["buckets"]
    # bucket doc_counts sum to the k retrieved hits, not the corpus
    assert sum(b["doc_count"] for b in buckets) == 10


def test_knn_list_form_and_query_conflict(knn_engine, spark):
    qv = _qv(spark, 2)
    out = knn_engine.search(
        "emb", {"knn": [{"field": "embedding", "query_vector": qv, "k": 2}]}
    )
    assert len(out["hits"]["hits"]) == 2
    with pytest.raises(ValueError, match="knn cannot be combined"):
        knn_engine.search(
            "emb",
            {
                "knn": {"field": "embedding", "query_vector": qv, "k": 2},
                "query": {"term": {"label": 5}},
            },
        )
