"""FTS5 MATCH-expression engine: `a AND (b OR c) NOT d`, phrases, prefixes.

The reference's backend accepts full FTS5 query syntax through
`content MATCH ?` (SQLite FTS5 docs, "full-text query syntax"); the
reference itself only ever emits implicit-AND term lists (its
query_string handler degrades to GLOB, reference pkg/server/sql.go:198-205),
but a user of the FTS5 layer has the whole grammar. This module restores
it over our index:

    orexpr  := andexpr (OR andexpr)*
    andexpr := notexpr ((AND)? notexpr)*      -- adjacency = implicit AND
    notexpr := primary (NOT primary)*         -- binary, left-assoc
    primary := '(' orexpr ')' | '"phrase..."' | word | word*

Scoring composes per-phrase BM25 contributions exactly like FTS5 bm25():
each leaf (term / phrase / prefix unit) contributes idf_unit * w(tf, dl)
when present and 0 when absent, so

    AND  -> inner join, score = s1 + s2
    OR   -> full outer join, score = coalesce(s1,0) + coalesce(s2,0)
    NOT  -> left-anti join, score = s_left

Every leaf relation is bounded by its term's postings (partition-pruned
scan); the joins are doc_id equi-joins between those bounded relations —
no full-corpus work anywhere. Rank identity vs the FTS5 oracle is
pinned in tests/test_rank_identity.py.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TOKEN_RE = re.compile(
    r'\s*(?:(?P<lparen>\()|(?P<rparen>\))|(?P<comma>,)|(?P<quoted>"[^"]*")'
    r"|(?P<word>[^\s(),\"]+))"
)


@dataclass
class Leaf:
    kind: str  # "term" | "phrase" | "prefix"
    value: object  # str or list[str]


@dataclass
class Op:
    op: str  # "AND" | "OR" | "NOT"
    left: object
    right: object


def _lex(expr: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(expr):
        m = _TOKEN_RE.match(expr, pos)
        if not m or m.end() == pos:
            if expr[pos:].strip():
                raise ValueError(f"bad MATCH expression at {expr[pos:]!r}")
            break
        pos = m.end()
        if m.group("lparen"):
            out.append(("(", "("))
        elif m.group("rparen"):
            out.append((")", ")"))
        elif m.group("comma"):
            out.append((",", ","))
        elif m.group("quoted"):
            out.append(("quoted", m.group("quoted")[1:-1]))
        else:
            w = m.group("word")
            if w in ("AND", "OR", "NOT"):
                out.append((w, w))
            else:
                out.append(("word", w))
    return out


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i][0] if self.i < len(self.toks) else None

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def parse(self):
        node = self.or_expr()
        if self.i != len(self.toks):
            raise ValueError(f"trailing tokens: {self.toks[self.i:]}")
        return node

    def or_expr(self):
        node = self.and_expr()
        while self.peek() == "OR":
            self.next()
            node = Op("OR", node, self.and_expr())
        return node

    def and_expr(self):
        node = self.not_expr()
        while True:
            if self.peek() == "AND":
                self.next()
                node = Op("AND", node, self.not_expr())
            elif self.peek() in ("word", "quoted", "("):
                node = Op("AND", node, self.not_expr())  # implicit AND
            else:
                return node

    def not_expr(self):
        node = self.primary()
        while self.peek() == "NOT":
            self.next()
            node = Op("NOT", node, self.primary())
        return node

    def primary(self):
        kind, val = self.next()
        if kind == "word" and val == "NEAR" and self.peek() == "(":
            return self.near_group()
        if kind == "(":
            node = self.or_expr()
            if self.peek() != ")":
                raise ValueError("unbalanced parentheses")
            self.next()
            return node
        if kind == "quoted":
            from gopensearch_spark.analysis import tokenize

            terms = tokenize(val)
            if not terms:
                raise ValueError(f"empty phrase {val!r}")
            # FTS5: a `*` following a phrase makes the FINAL token a
            # prefix token (`"a b" *` — with or without whitespace)
            if (
                self.i < len(self.toks)
                and self.toks[self.i] == ("word", "*")
            ):
                self.next()
                if len(terms) == 1:
                    return Leaf("prefix", terms[0])
                return Leaf("phrase_prefix", terms)
            return Leaf("phrase", terms) if len(terms) > 1 else Leaf("term", terms[0])
        if kind == "word":
            if val.endswith("*") and len(val) > 1:
                return Leaf("prefix", val[:-1].lower())
            from gopensearch_spark.analysis import tokenize

            terms = tokenize(val)
            if not terms:
                raise ValueError(f"empty token {val!r}")
            return Leaf("phrase", terms) if len(terms) > 1 else Leaf("term", terms[0])
        raise ValueError(f"unexpected token {kind!r}")

    def near_group(self):
        """`NEAR(p1 p2 ..., N)` — N defaults to 10 like FTS5."""
        from gopensearch_spark.analysis import tokenize

        self.next()  # consume '('
        units: list[tuple] = []
        while self.peek() in ("word", "quoted"):
            k2, v2 = self.next()
            if k2 == "word" and v2.endswith("*"):
                raise ValueError("prefix tokens inside NEAR are not supported")
            terms = tokenize(v2)
            if not terms:
                raise ValueError(f"empty NEAR phrase {v2!r}")
            units.append(("phrase", terms) if len(terms) > 1 else ("term", terms[0]))
        if len(units) < 2:
            raise ValueError("NEAR needs at least two phrases")
        n = 10
        if self.peek() == ",":
            self.next()
            k3, v3 = self.next()
            if k3 != "word" or not v3.isdigit():
                raise ValueError(f"bad NEAR distance {v3!r}")
            n = int(v3)
        if self.peek() != ")":
            raise ValueError("unbalanced NEAR(")
        self.next()
        return Leaf("near", (units, n))


def parse_match_expr(expr: str):
    return _Parser(_lex(expr)).parse()


def _leaf_scores(spark: SparkSession, index_dir: str, leaf: Leaf) -> DataFrame:
    from gopensearch_spark.search.bm25 import bm25_scores
    from gopensearch_spark.search.phrase import (
        near_match,
        phrase_match,
        phrase_prefix_match,
        prefix_match,
    )

    if leaf.kind == "term":
        return bm25_scores(spark, index_dir, [leaf.value], mode="or")
    if leaf.kind == "phrase":
        return phrase_match(spark, index_dir, list(leaf.value), k=None)
    if leaf.kind == "phrase_prefix":
        return phrase_prefix_match(spark, index_dir, list(leaf.value), k=None)
    if leaf.kind == "near":
        units, n = leaf.value
        return near_match(spark, index_dir, units, n=n, k=None)
    return prefix_match(spark, index_dir, leaf.value, k=None)


def _eval(spark: SparkSession, index_dir: str, node) -> DataFrame:
    if isinstance(node, Leaf):
        return _leaf_scores(spark, index_dir, node)
    left = _eval(spark, index_dir, node.left)
    right = _eval(spark, index_dir, node.right)
    if node.op == "NOT":
        return left.join(right.select("doc_id"), "doc_id", "left_anti")
    r = right.withColumnRenamed("score", "s2")
    if node.op == "AND":
        return left.join(r, "doc_id").select(
            "doc_id", (F.col("score") + F.col("s2")).alias("score")
        )
    # OR
    return left.join(r, "doc_id", "full_outer").select(
        "doc_id",
        (F.coalesce(F.col("score"), F.lit(0.0)) + F.coalesce(F.col("s2"), F.lit(0.0))).alias("score"),
    )


def match_expr_scores(spark: SparkSession, index_dir: str, expr: str) -> DataFrame:
    """Unlimited (doc_id, score) relation for an FTS5 MATCH expression.

    Runs inside one phrase.query_scope so every leaf's persisted match
    relation survives until the NEXT top-level query, then releases."""
    from gopensearch_spark.search.phrase import query_scope

    with query_scope():
        return _eval(spark, index_dir, parse_match_expr(expr))


def match_expr(
    spark: SparkSession, index_dir: str, expr: str, k: int = 10
) -> DataFrame:
    """Top-k BM25 for a full FTS5 MATCH expression, rank-identical to
    `SELECT rowid FROM t WHERE t MATCH ? ORDER BY bm25(t)`."""
    return (
        match_expr_scores(spark, index_dir, expr)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
