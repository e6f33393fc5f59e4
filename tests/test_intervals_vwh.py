"""intervals query (match-rule subset -> span_near kernel) and
variable_width_histogram (deterministic equi-depth construction,
value-checked against DuckDB quantile_cont)."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def docs_engine(spark, docs_small, index_small):
    from gopensearch_spark.dsl import Engine

    e = Engine(spark)
    e.create_index("docs", docs_small, id_col="doc_id",
                   text_field="text", index_dir=index_small)
    return e


def test_intervals_match_equals_span_near(docs_engine):
    a = docs_engine.search("docs", {
        "query": {"intervals": {"text": {"match": {
            "query": "spark join", "max_gaps": 2, "ordered": True}}}},
        "size": 5, "track_total_hits": True,
    })
    b = docs_engine.search("docs", {
        "query": {"span_near": {"clauses": [
            {"span_term": {"text": "spark"}},
            {"span_term": {"text": "join"}}],
            "slop": 2, "in_order": True}},
        "size": 5, "track_total_hits": True,
    })
    assert a["hits"]["total"] == b["hits"]["total"]
    assert a["hits"]["total"]["value"] > 0
    assert [(h["_id"], h["_score"]) for h in a["hits"]["hits"]] == \
           [(h["_id"], h["_score"]) for h in b["hits"]["hits"]]


def test_intervals_defaults_and_errors(docs_engine):
    # defaults: max_gaps 0, unordered — adjacency either direction
    out = docs_engine.search("docs", {
        "query": {"intervals": {"text": {"match": {"query": "spark join"}}}},
        "size": 1, "track_total_hits": True,
    })
    assert out["hits"]["total"]["value"] > 0
    with pytest.raises(ValueError, match="match.*rule"):
        docs_engine.search("docs", {
            "query": {"intervals": {"text": {"prefix": {"prefix": "sp"}}}},
        })
    with pytest.raises(ValueError, match="max_gaps"):
        docs_engine.search("docs", {
            "query": {"intervals": {"text": {"match": {
                "query": "a b", "max_gaps": -1}}}},
        })
    from gopensearch_spark.dsl.model import unknown_query_clauses

    assert unknown_query_clauses(
        {"intervals": {"text": {"match": {"query": "x"}}}}) == []


def test_variable_width_histogram_matches_quantile_oracle(spark):
    from gopensearch_spark.dsl import Engine

    ev_path = os.path.join(SF_SMALL, "events.parquet")
    e = Engine(spark)
    e.create_index("ev", spark.read.parquet(ev_path), id_col="event_id")
    out = e.search("ev", {"size": 0, "aggs": {"vw": {
        "variable_width_histogram": {"field": "value", "buckets": 4}}}})
    bk = out["aggregations"]["vw"]["buckets"]
    assert len(bk) == 4
    con = duckdb.connect()
    du = con.execute(f"""
WITH v AS (SELECT value FROM read_parquet('{ev_path}') WHERE value IS NOT NULL),
b AS (SELECT quantile_cont(value, 0.25) q1, quantile_cont(value, 0.50) q2,
             quantile_cont(value, 0.75) q3 FROM v),
a AS (SELECT value,
    (CASE WHEN value > b.q1 THEN 1 ELSE 0 END
   + CASE WHEN value > b.q2 THEN 1 ELSE 0 END
   + CASE WHEN value > b.q3 THEN 1 ELSE 0 END) AS bid FROM v CROSS JOIN b)
SELECT round(min(value),6), round(avg(value),6), round(max(value),6), count(*)
FROM a GROUP BY bid ORDER BY bid
""").fetchall()
    got = [(round(b["min"], 6), round(b["key"], 6), round(b["max"], 6),
            b["doc_count"]) for b in bk]
    assert got == [tuple(r) for r in du]
    # buckets are ordered and counts cover every non-null value
    assert [b["key"] for b in bk] == sorted(b["key"] for b in bk)


def test_variable_width_histogram_empty_and_single(spark):
    from gopensearch_spark.dsl import Engine

    e = Engine(spark)
    df = spark.createDataFrame([(1, None)], "id long, v double")
    e.create_index("t", df, id_col="id")
    out = e.search("t", {"size": 0, "aggs": {"vw": {
        "variable_width_histogram": {"field": "v", "buckets": 3}}}})
    assert out["aggregations"]["vw"]["buckets"] == []
    df2 = spark.createDataFrame([(1, 5.0), (2, 5.0)], "id long, v double")
    e.create_index("t2", df2, id_col="id")
    out2 = e.search("t2", {"size": 0, "aggs": {"vw": {
        "variable_width_histogram": {"field": "v", "buckets": 3}}}})
    bk = out2["aggregations"]["vw"]["buckets"]
    # identical values collapse the boundaries into a single bucket
    assert len(bk) == 1 and bk[0]["doc_count"] == 2 and bk[0]["key"] == 5.0


def test_ip_range_agg(spark):
    from gopensearch_spark.dsl import Engine

    e = Engine(spark)
    rows = [(i, f"10.0.{i % 4}.{i % 200}") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, ip string")
    e.create_index("ips", df, id_col="id")
    out = e.search("ips", {"size": 0, "aggs": {"r": {"ip_range": {
        "field": "ip", "ranges": [
            {"to": "10.0.1.0"},
            {"from": "10.0.1.0", "to": "10.0.3.0"},
            {"mask": "10.0.3.0/24"},
        ]}}}})
    bk = out["aggregations"]["r"]["buckets"]
    third = [ip.split(".")[2] for _, ip in rows]
    assert [b["doc_count"] for b in bk] == [
        third.count("0"), third.count("1") + third.count("2"),
        third.count("3")]
    # keys: default "from-to" form and the mask string verbatim
    assert bk[0]["key"] == "*-10.0.1.0"
    assert bk[2]["key"] == "10.0.3.0/24"


def test_variable_width_histogram_buckets_1(spark):
    """buckets=1 must be one bucket over everything, not an empty-agg
    assertion crash (r6 ADVICE fix)."""
    from gopensearch_spark.dsl import Engine

    e = Engine(spark)
    df = spark.createDataFrame([(1, 1.0), (2, 2.0), (3, 9.0)], "id long, v double")
    e.create_index("t1b", df, id_col="id")
    out = e.search("t1b", {"size": 0, "aggs": {"vw": {
        "variable_width_histogram": {"field": "v", "buckets": 1}}}})
    bk = out["aggregations"]["vw"]["buckets"]
    assert len(bk) == 1
    assert bk[0]["doc_count"] == 3
    assert bk[0]["min"] == 1.0 and bk[0]["max"] == 9.0
