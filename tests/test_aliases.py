"""Index aliases: the ES `_aliases` surface (no reference analogue —
the reference's mux binds concrete index names only; semantics here
follow ES 7.17: filtered aliases are filter-context clauses, write
aliases need a unique target, action lists apply atomically)."""

from __future__ import annotations

import os

import pytest

from gopensearch_spark.dsl.engine import Engine

SF = os.path.join(os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"), "sf0.001")


@pytest.fixture()
def engine(spark, docs_small, index_small):
    e = Engine(spark)
    e.create_index("events", spark.read.parquet(os.path.join(SF, "events.parquet")),
                   json_col="props", id_col="event_id")
    e.create_index("docs", docs_small, text_field="text", index_dir=index_small)
    return e


def test_alias_crud_and_get_shapes(engine):
    engine.put_alias("events", "logs")
    engine.put_alias("docs", "corpus", filter={"term": {"lang": "en"}})
    got = engine.get_alias()
    assert got["events"]["aliases"]["logs"] == {}
    assert got["docs"]["aliases"]["corpus"]["filter"] == {"term": {"lang": "en"}}
    # name patterns
    assert "events" in engine.get_alias("log*")
    assert "docs" not in engine.get_alias("logs")
    with pytest.raises(KeyError):
        engine.get_alias("nope")
    # cat shape
    assert "logs\tevents\t-" in engine.cat_aliases()
    assert "corpus\tdocs\t*" in engine.cat_aliases()
    engine.delete_alias("events", "logs")
    assert "events" not in engine.get_alias()


def test_search_through_plain_alias(engine):
    engine.put_alias("events", "logs")
    via_alias = engine.search("logs", {"query": {"term": {"event_type": "error"}},
                                       "size": 10000})
    direct = engine.search("events", {"query": {"term": {"event_type": "error"}},
                                      "size": 10000})
    assert via_alias["hits"]["total"] == direct["hits"]["total"]


def test_filtered_alias_injects_filter_context(engine):
    engine.put_alias("events", "errors_only",
                     filter={"term": {"event_type": "error"}})
    # match_all through the alias == term query direct
    via = engine.search("errors_only", {"size": 10000})
    direct = engine.search("events", {"query": {"term": {"event_type": "error"}},
                                      "size": 10000})
    assert via["hits"]["total"] == direct["hits"]["total"]
    # the alias filter ANDs with the request query
    via2 = engine.search("errors_only",
                         {"query": {"exists": {"field": "event_type"}}, "size": 10000})
    assert via2["hits"]["total"] == direct["hits"]["total"]
    # count goes through the same injection
    assert engine.count("errors_only")["count"] == direct["hits"]["total"]["value"]


def test_filtered_alias_filters_aggregations(engine):
    engine.put_alias("events", "errors_only",
                     filter={"term": {"event_type": "error"}})
    r = engine.search("errors_only", {
        "size": 0,
        "aggs": {"by_type": {"terms": {"field": "event_type", "size": 10}}},
    })
    buckets = r["aggregations"]["by_type"]["buckets"]
    assert [b["key"] for b in buckets] == ["error"]


def test_alias_name_collision_rejected(engine):
    with pytest.raises(ValueError):
        engine.put_alias("events", "docs")  # an index named docs exists


def test_add_alias_to_missing_index_rejected(engine):
    with pytest.raises(KeyError):
        engine.put_alias("missing", "m")


def test_atomic_swap_and_multi_target_write(engine, spark):
    # classic zero-downtime reindex swap: alias flips atomically
    df = spark.range(3).withColumnRenamed("id", "event_id")
    engine.create_index("events_v2", df, id_col="event_id")
    engine.put_alias("events", "live")
    engine.update_aliases({"actions": [
        {"remove": {"index": "events", "alias": "live"}},
        {"add": {"index": "events_v2", "alias": "live"}},
    ]})
    assert list(engine.get_alias("live")) == ["events_v2"]
    # invalid action list mutates nothing (atomicity)
    with pytest.raises(KeyError):
        engine.update_aliases({"actions": [
            {"remove": {"index": "events_v2", "alias": "live"}},
            {"add": {"index": "missing", "alias": "live"}},
        ]})
    assert list(engine.get_alias("live")) == ["events_v2"]
    # multi-target alias: reads degrade to first target, writes need a
    # designated write index
    engine.update_aliases({"actions": [
        {"add": {"index": "events", "alias": "both"}},
        {"add": {"index": "events_v2", "alias": "both"}},
    ]})
    with pytest.raises(ValueError):
        engine.index_document("both", {"msg": "x"})
    engine.update_aliases({"actions": [
        {"add": {"index": "events_v2", "alias": "both", "is_write_index": True}},
    ]})
    with pytest.raises(ValueError):
        # events_v2 is DataFrame-backed: resolution happens, append rejects
        engine.index_document("both", {"msg": "x"})


def test_write_through_single_target_alias(engine):
    engine.create_index("inbox")  # empty doc-backed index
    engine.put_alias("inbox", "ingest")
    engine.index_document("ingest", {"msg": "hello world"})
    r = engine.search("inbox", {"query": {"match_all": {}}, "size": 10})
    assert r["hits"]["total"]["value"] == 1
    # and reads resolve through the alias too
    r2 = engine.search("ingest", {"query": {"match_all": {}}, "size": 10})
    assert r2["hits"]["total"]["value"] == 1


def test_fulltext_match_through_alias(engine, oracle_small):
    top = max(oracle_small.vocab(), key=lambda t: t[1])[0]
    engine.put_alias("docs", "corpus")
    via = engine.search("corpus", {"query": {"match": {"text": top}}, "size": 5})
    direct = engine.search("docs", {"query": {"match": {"text": top}}, "size": 5})
    assert [h["_id"] for h in via["hits"]["hits"]] == [
        h["_id"] for h in direct["hits"]["hits"]]


def test_alias_persistence_roundtrip(spark, docs_small, index_small, tmp_path):
    meta = str(tmp_path / "meta")
    e1 = Engine(spark, meta_dir=meta)
    e1.create_index("docs", docs_small, text_field="text", index_dir=index_small)
    e1.put_alias("docs", "corpus", filter={"term": {"lang": "en"}})
    e2 = Engine(spark, meta_dir=meta)
    e2.create_index("docs", docs_small, text_field="text", index_dir=index_small)
    assert e2.get_alias("corpus")["docs"]["aliases"]["corpus"]["filter"] == {
        "term": {"lang": "en"}}


def test_remove_index_action(engine, spark):
    engine.create_index("tmp_ix", spark.range(1).withColumnRenamed("id", "doc_id"))
    engine.put_alias("tmp_ix", "tmp_alias")
    engine.update_aliases({"actions": [{"remove_index": {"index": "tmp_ix"}}]})
    assert "tmp_ix" not in engine.list_indices()
    assert "tmp_alias" not in engine.aliases
