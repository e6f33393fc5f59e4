"""Seeded fuzz: random ES bool-query trees compiled by the DSL engine vs
an equivalently-generated DuckDB WHERE clause over the same parquet.

Complements the fixed-query engine tests the way the FTS5 fuzz suite
complements the pinned rank-identity corpus: the generator covers the
COMPOSITION space (nested bool/must/should/must_not over term / terms /
range / exists / wildcard leaves, depths the hand-written tests never
reach) and asserts the hit-id SET matches DuckDB exactly.
"""

import os
import random

import duckdb
import pytest

from gopensearch_spark.dsl import Engine

SF = os.path.join(os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"), "sf0.001")

EVENT_TYPES = ["click", "view", "signup", "error", "purchase"]


def _leaf(rng: random.Random) -> tuple[dict, str]:
    """(dsl fragment, duckdb predicate) over the events table."""
    kind = rng.choice(["term", "terms", "range_value", "range_ts", "exists", "wildcard"])
    if kind == "term":
        t = rng.choice(EVENT_TYPES)
        return {"term": {"event_type": t}}, f"event_type = '{t}'"
    if kind == "terms":
        ts = rng.sample(EVENT_TYPES, rng.randint(1, 3))
        inlist = ", ".join(f"'{t}'" for t in ts)
        return {"terms": {"event_type": ts}}, f"event_type IN ({inlist})"
    if kind == "range_value":
        lo = rng.randint(0, 400)
        hi = lo + rng.randint(10, 400)
        op = rng.choice(["both", "gte", "lt"])
        if op == "both":
            return ({"range": {"value": {"gte": lo, "lt": hi}}},
                    f"(value >= {lo} AND value < {hi})")
        if op == "gte":
            return {"range": {"value": {"gte": lo}}}, f"value >= {lo}"
        return {"range": {"value": {"lt": hi}}}, f"value < {hi}"
    if kind == "range_ts":
        lo = 1704067200000 + rng.randint(0, 20) * 86400000
        hi = lo + rng.randint(1, 10) * 86400000
        return ({"range": {"ts": {"gte": lo, "lt": hi, "format": "epoch_millis"}}},
                f"(ts >= epoch_ms(CAST({lo} AS BIGINT)) AND ts < epoch_ms(CAST({hi} AS BIGINT)))")
    if kind == "exists":
        return {"exists": {"field": "k"}}, "json_extract_string(props, '$.k') IS NOT NULL"
    pat = rng.choice(["s*up", "c*", "*or*", "?iew"])
    glob_sql = pat.replace("'", "")
    return ({"wildcard": {"event_type": {"value": pat}}},
            f"event_type GLOB '{glob_sql}'")


def _tree(rng: random.Random, depth: int) -> tuple[dict, str]:
    if depth == 0 or rng.random() < 0.4:
        return _leaf(rng)
    n = rng.randint(1, 3)
    subs = [_tree(rng, depth - 1) for _ in range(n)]
    mode = rng.choice(["must", "should", "must_not", "mixed"])
    if mode == "must":
        return ({"bool": {"must": [d for d, _ in subs]}},
                "(" + " AND ".join(s for _, s in subs) + ")")
    if mode == "should":
        return ({"bool": {"should": [d for d, _ in subs]}},
                "(" + " OR ".join(s for _, s in subs) + ")")
    if mode == "must_not":
        return ({"bool": {"must_not": [d for d, _ in subs]}},
                "NOT (" + " OR ".join(s for _, s in subs) + ")")
    pos, neg = subs[: max(1, n - 1)], subs[max(1, n - 1):]
    dsl = {"bool": {"must": [d for d, _ in pos]}}
    sql = " AND ".join(s for _, s in pos)
    if neg:
        dsl["bool"]["must_not"] = [d for d, _ in neg]
        sql += " AND NOT (" + " OR ".join(s for _, s in neg) + ")"
    return dsl, "(" + sql + ")"


@pytest.fixture(scope="module")
def fuzz_engine(spark):
    e = Engine(spark)
    e.create_index("events", spark.read.parquet(os.path.join(SF, "events.parquet")),
                   json_col="props", id_col="event_id")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    return e, con


def test_fuzz_bool_trees_match_duckdb(fuzz_engine):
    e, con = fuzz_engine
    rng = random.Random(0xD51)
    nonempty = 0
    for trial in range(40):
        dsl, sql = _tree(rng, depth=3)
        body = {"query": dsl, "size": 10_000_000}
        hits, _, _ = e.search_df("events", body)
        got = {r["event_id"] for r in hits.select("event_id").collect()}
        exp = {r[0] for r in con.execute(f"SELECT event_id FROM events WHERE {sql}").fetchall()}
        assert got == exp, (trial, dsl, sql, len(got), len(exp))
        nonempty += bool(exp)
    assert nonempty >= 20  # the generator must not degenerate to empty sets
