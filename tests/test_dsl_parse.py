"""DSL parse tests over the reference's own JSON query corpus
(reference pkg/dsl/dsl_test.go, agg_test.go, complex_test.go)."""

from gopensearch_spark.dsl import parse_dsl


def test_basic_term():
    d = parse_dsl('{"query": {"term": {"foo": "bar"}}, "size": 1}')
    assert d.query.term["foo"].value == "bar"
    assert d.size == 1


def test_basic_and_verbose_match():
    d1 = parse_dsl('{"query": {"match": {"foo": "bar"}}, "size": 1}')
    d2 = parse_dsl('{"query": {"match": {"foo": {"query": "bar", "operator": "OR"}}}, "size": 1}')
    assert d1.query.match["foo"].query == "bar"
    assert d2.query.match["foo"].query == "bar"
    assert d2.query.match["foo"].operator == "OR"


def test_multiple_terms():
    d = parse_dsl('{"query": {"term": {"foo": "bar", "oof": "rab"}}}')
    assert d.query.term["foo"].value == "bar"
    assert d.query.term["oof"].value == "rab"


def test_nested_bool_array_multiple():
    d = parse_dsl(
        '{"query": {"bool": {"must": ['
        '{"match": {"foo": "bar"}},'
        '{"range": {"fooTime": {"gte": 1654718054570, "lte": "1655322854570", "format": "epoch_millis"}}}'
        "]}}, \"size\": 1}"
    )
    assert d.query.bool_.must[0].match["foo"].query == "bar"
    assert d.query.bool_.must[1].range["fooTime"].gte == 1654718054570


def test_nested_bool_single_object():
    d = parse_dsl('{"query": {"bool": {"must": {"match": {"oof": "rab"}}}}, "size": 1}')
    assert d.query.bool_.must[0].match["oof"].query == "rab"


def test_jaeger_term_single_with_sort():
    d = parse_dsl(
        '{"query": {"bool": {"must": {"term": {"traceID": "5aa29bf8d8454e24"}}}},'
        '"size": 10000, "sort": [{"startTime": {"order": "asc"}}]}'
    )
    assert d.query.bool_.must[0].term["traceID"].value == "5aa29bf8d8454e24"
    assert d.sort[0].field == "startTime" and d.sort[0].order == "asc"
    assert d.size == 10000


def test_double_nested_bool_with_should():
    d = parse_dsl(
        '{"query": {"bool": {"must": {"bool": {"should": ['
        '{"term": {"traceID": {"boost": 2, "value": "0e63d6f89e6091ac"}}},'
        '{"term": {"traceID": "e63d6f89e6091ac"}}'
        ']}}}}, "size": 10000, "sort": [{"startTime": {"order": "asc"}}]}'
    )
    inner = d.query.bool_.must[0].bool_
    assert inner.should[0].term["traceID"].value == "0e63d6f89e6091ac"
    assert inner.should[1].term["traceID"].value == "e63d6f89e6091ac"


def test_bool_with_filter():
    d = parse_dsl(
        '{"query": {"bool": {"filter": [{"term": {"traceID": "5aa29bf8d8454e24"}}]}},'
        '"size": 10000, "sort": [{"startTime": {"order": "asc"}}]}'
    )
    assert d.query.bool_.filter[0].term["traceID"].value == "5aa29bf8d8454e24"


def test_range_include_bounds():
    d = parse_dsl(
        '{"query": {"range": {"fooTime": {"gte": 1654718054570, "lte": "1655322854570",'
        '"include_lower": true, "include_upper": true, "format": "epoch_millis"}}}}'
    )
    r = d.query.range["fooTime"]
    assert r.gte == 1654718054570 and r.lte == "1655322854570"
    assert r.include_lower and r.include_upper and r.format == "epoch_millis"


def test_from_to_aliases():
    d = parse_dsl('{"query": {"range": {"x": {"from": 1, "to": 5}}}}')
    assert d.query.range["x"].gt == 1 and d.query.range["x"].lt == 5


def test_aggs_terms_with_size():
    d = parse_dsl('{"aggs": {"svc": {"terms": {"field": "serviceName", "size": 25}}}}')
    assert d.aggs["svc"].terms.field == "serviceName"
    assert d.aggs["svc"].terms.size == 25


def test_aggregations_wins_over_aggs():
    d = parse_dsl(
        '{"aggs": {"a": {"avg": {"field": "x"}}},'
        '"aggregations": {"b": {"max": {"field": "y"}}}}'
    )
    assert "b" in d.aggs and "a" not in d.aggs


def test_sub_aggregate():
    d = parse_dsl(
        '{"aggs": {"svc": {"terms": {"field": "serviceName"},'
        '"aggregations": {"latest": {"max": {"field": "startTime"}}}}}}'
    )
    assert d.aggs["svc"].terms.field == "serviceName"
    assert d.aggs["svc"].aggs["latest"].max.field == "startTime"


def test_grafana_explore():
    d = parse_dsl(
        """
        {"size": 0,
         "query": {"bool": {"filter": [
            {"range": {"startTimeMillis": {"gte": 1673789792872, "lte": 1673793392872, "format": "epoch_millis"}}},
            {"query_string": {"analyze_wildcard": true, "query": "*"}}]}},
         "aggs": {"2": {"date_histogram": {"interval": "1s", "field": "startTimeMillis",
                        "min_doc_count": 0,
                        "extended_bounds": {"min": 1673789792872, "max": 1673793392872},
                        "format": "epoch_millis"}, "aggs": {}}}}
        """
    )
    assert d.size == 0
    f = d.query.bool_.filter
    assert f[0].range["startTimeMillis"].gte == 1673789792872
    assert f[1].query_string.analyze_wildcard
    assert d.aggs["2"].date_histogram.fixed_interval == "1s"


def test_match_phrase_and_prefix_parse():
    d = parse_dsl('{"query": {"match_phrase": {"text": "a b"}, "prefix": {"text": "ab"}}}')
    assert d.query.match_phrase["text"].query == "a b"
    assert d.query.prefix["text"].value == "ab"


def test_bool_must_not_parse():
    d = parse_dsl('{"query": {"bool": {"must_not": {"term": {"k": "v"}}}}}')
    assert len(d.query.bool_.must_not) == 1
    assert d.query.bool_.must_not[0].term["k"].value == "v"
