"""DSL -> DataFrame compiler.

The reference transpiles its DSL tree to SQLite SQL strings
(reference pkg/server/sql.go:35-60 GenPlan and the handle* family).
We compile the same tree to declarative DataFrame expressions and let
Catalyst plan them — predicate pushdown, column pruning and partition
pruning come for free; the per-aggregation re-scan of the reference
(one SQL statement per agg label, sql.go:39-58) becomes independent
aggregations over one cached filtered DataFrame.

Semantics choices (ES-correct by default, reference quirks available
and test-pinned):

- `term`/`match` literals: int-vs-string inference like the reference's
  strconv.ParseInt branch (sql.go:131-137, 146-151).
- `bool.should` compiles to a real OR; the reference ANDs everything
  (sql.go:98-109) — ``quirk_should_is_and=True`` reproduces that.
- `range` applies every field; the reference `break`s after the first
  (sql.go:193) — ``quirk_first_range_only=True`` reproduces that.
- `.keyword` suffix stripped (sql.go:158-162).
- `query_string` is a SQLite GLOB over the raw document in the
  reference (sql.go:198-205); we translate glob -> anchored rlike over
  the designated default field, and treat ``analyze_wildcard`` with a
  bare ``*`` as match-all (the Grafana probe, pkg/dsl/complex_test.go:24).
- fields resolve to typed columns when present, else to
  ``get_json_object(json_col, '$.field')`` — the dynamic-JSON path the
  reference uses for everything (sql.go:134 etc.).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gopensearch_spark.dsl import model


def strip_keyword(field: str) -> str:
    """ES `.keyword` multi-field suffix is ignored (reference sql.go:158-162)."""
    return field.split(".keyword")[0]


def glob_to_regex(glob: str) -> str:
    """SQLite GLOB pattern -> anchored Java regex (for rlike)."""
    out = []
    i = 0
    while i < len(glob):
        c = glob[i]
        if c == "*":
            out.append(".*")
        elif c == "?":
            out.append(".")
        elif c == "[":
            j = glob.find("]", i + 1)
            if j == -1:
                out.append(re.escape(c))
            else:
                out.append(glob[i : j + 1])
                i = j
        else:
            out.append(re.escape(c))
        i += 1
    return "^" + "".join(out) + "$"


def _literal(value: str):
    """Int-vs-string inference (reference sql.go:131-137)."""
    try:
        return int(value)
    except (TypeError, ValueError):
        return value


@dataclass
class CompileContext:
    df: DataFrame
    json_col: str | None = None  # fallback column holding a JSON doc
    date_fields: dict[str, str] = dc_field(default_factory=dict)  # field -> format (template analogue)
    quirk_should_is_and: bool = False
    quirk_first_range_only: bool = False
    # the index's document-id column (`_id` analogue), for `ids` queries
    id_col: str | None = None
    # callback(field, clause, kind, scoring) -> Column predicate,
    # installed by the Engine to route full-text `match`/`match_phrase`/
    # `prefix` on indexed fields to the BM25/phrase engines. kind in
    # {"match", "phrase", "prefix"}; ``scoring`` is False inside
    # `bool.filter`/`bool.must_not` (ES filter context: the clause
    # restricts the hit set but contributes NO score).
    fulltext_predicate: object = None

    def resolve(self, field: str) -> Column:
        field = strip_keyword(field)
        if field in self.df.columns:
            return F.col(field)
        if self.json_col:
            return F.get_json_object(F.col(self.json_col), f"$.{field}")
        return F.col(field)

    def field_type(self, field: str):
        field = strip_keyword(field)
        for f in self.df.schema.fields:
            if f.name == field:
                return f.dataType
        return None


def _range_bound(ctx: CompileContext, field: str, value) -> tuple[Column, Column]:
    """Resolve (column, literal) for a range bound, honoring date formats.

    A template-mapped date field (format epoch_millis/epoch_second,
    reference pkg/date/dates.go) compares as a timestamp; a native
    TimestampType column accepts epoch-millis numbers the same way.
    """
    col = ctx.resolve(field)
    fmt = ctx.date_fields.get(strip_keyword(field))
    ftype = ctx.field_type(field)
    if isinstance(ftype, (T.TimestampType, T.TimestampNTZType)):
        # cast the LITERAL to the column's type (session TZ is pinned UTC)
        # so the column itself stays eligible for parquet min/max pushdown
        if isinstance(value, (int, float)) or (isinstance(value, str) and value.lstrip("-").isdigit()):
            v = int(value)
            lit = F.timestamp_seconds(F.lit(v)) if fmt == "epoch_second" else F.timestamp_millis(F.lit(v))
        else:
            lit = F.to_timestamp(F.lit(value))
        return col, lit.cast(ftype)
    if fmt == "epoch_millis" or fmt == "epoch_second":
        # the stored value may be a raw epoch NUMBER (parquet/JSON
        # ingest) or the reference's write-time RFC3339 string
        # (bulk/single-doc ingest via templateMapDoc); both compare as
        # timestamps, mirroring the reference's
        # DATETIME(JSON_EXTRACT(...), 'auto') coercion (sql.go:164-195)
        def to_ts(c: Column) -> Column:
            c = c.cast("long")
            return F.timestamp_seconds(c) if fmt == "epoch_second" else F.timestamp_millis(c)

        s = col.cast("string")
        col_ts = F.when(s.rlike("^-?[0-9]+$"), to_ts(s)).otherwise(F.to_timestamp(s))
        if isinstance(value, (int, float)) or (
            isinstance(value, str) and value.lstrip("-").isdigit()
        ):
            return col_ts, to_ts(F.lit(int(value)))
        return col_ts, F.to_timestamp(F.lit(str(value)))
    return col, F.lit(_literal(value) if isinstance(value, str) else value)


def compile_range(ctx: CompileContext, ranges: dict[str, model.Range]) -> Column:
    preds = []
    for field, r in ranges.items():
        p = F.lit(True)
        if r.gte is not None:
            c, v = _range_bound(ctx, field, r.gte)
            p = p & (c >= v)
        if r.gt is not None:
            c, v = _range_bound(ctx, field, r.gt)
            p = p & ((c >= v) if r.include_lower else (c > v))
        if r.lte is not None:
            c, v = _range_bound(ctx, field, r.lte)
            p = p & (c <= v)
        if r.lt is not None:
            c, v = _range_bound(ctx, field, r.lt)
            p = p & ((c <= v) if r.include_upper else (c < v))
        preds.append(p)
        if ctx.quirk_first_range_only:
            break  # reference processes only the first range field (sql.go:193)
    return _and_all(preds)


def _and_all(preds: list[Column]) -> Column:
    out = None
    for p in preds:
        out = p if out is None else (out & p)
    return out if out is not None else F.lit(True)


def _or_all(preds: list[Column]) -> Column:
    out = None
    for p in preds:
        out = p if out is None else (out | p)
    return out if out is not None else F.lit(True)


def tuple_after_predicate(items: list[tuple[Column, str, object]]) -> Column:
    """Strictly-after predicate for a lexicographic sort tuple with
    per-key directions: OR over i of (keys<i equal) AND (key_i past its
    cursor value in its direction). Linear in the number of keys — this
    is the cursor filter behind `search_after` and `composite.after`,
    and it PUSHES DOWN (on the first key it is a plain range predicate,
    so parquet min/max skipping prunes pages the cursor has passed)."""
    pred: Column | None = None
    eq_prefix: Column | None = None
    for col, order, val in items:
        if val is None:
            # a null cursor value makes every comparison NULL and silently
            # drops all rows at that prefix — reject loudly (scroll already
            # does) rather than skip results
            raise ValueError(
                "search_after/composite.after cursor contains a null sort "
                "value; null-sorted documents cannot be paginated past — "
                "add a non-null tiebreak key (e.g. _id) to the sort"
            )
        lit = F.lit(val)
        cmp = (col > lit) if str(order).lower() != "desc" else (col < lit)
        clause = cmp if eq_prefix is None else (eq_prefix & cmp)
        pred = clause if pred is None else (pred | clause)
        eq = col == lit
        eq_prefix = eq if eq_prefix is None else (eq_prefix & eq)
    if pred is None:
        raise ValueError("after-cursor requires at least one sort key")
    return pred


def resolve_min_should(spec: int | str, n_clauses: int) -> int:
    """ES minimum_should_match arithmetic: int, "N", "-N" (n - N),
    "P%" (floor of P% of n), "-P%" (n minus floor of P% of n). A result
    <= 0 means the shoulds are purely score-boosting; a result > n can
    never be satisfied (Lucene semantics) — callers need no clamping
    because an n-indicator sum simply never reaches it."""
    s = str(spec).strip()
    if s.endswith("%"):
        pct = int(s[:-1])
        if pct >= 0:
            return (pct * n_clauses) // 100
        return n_clauses - ((-pct) * n_clauses) // 100
    v = int(s)
    return v if v >= 0 else n_clauses + v


def compile_query(ctx: CompileContext, q: model.Query | None, scoring: bool = True) -> Column:
    """Query tree -> boolean Column (the WHERE side; scoring is separate).

    ``scoring`` tracks ES scoring context: clauses under `bool.filter` or
    `bool.must_not` restrict the hit set but are score-exempt — the flag
    rides through to the Engine's full-text callback so a `match` inside
    `filter` doesn't add its BM25 contribution to the hit score.
    """
    if q is None:
        return F.lit(True)  # reference emits WHERE 1=1 (sql.go:65-68)
    preds: list[Column] = []
    if q.match_all:
        preds.append(F.lit(True))
    for field, t in q.term.items():
        preds.append(ctx.resolve(field) == F.lit(_literal(t.value)))
    for field, ts in q.terms.items():
        preds.append(ctx.resolve(field).isin([_literal(str(v)) for v in ts.values]))
    if q.exists is not None:
        preds.append(ctx.resolve(q.exists).isNotNull())
    if q.ids is not None:
        if ctx.id_col is None:
            raise ValueError("ids query requires an index with an id column")
        # ES sends _id values as strings; coerce each to the column's
        # natural literal (int-vs-string inference) so the IN list
        # pushes down without casting the scanned column
        preds.append(
            F.col(ctx.id_col).isin([_literal(str(v)) for v in q.ids])
        )
    for field, t in q.wildcard.items():
        preds.append(ctx.resolve(field).rlike(glob_to_regex(t.value)))
    for field, m in q.match.items():
        if ctx.fulltext_predicate is not None:
            if m.fuzziness:
                # ES `match` + `fuzziness`: term-level fuzzy expansion
                fz = model.Fuzzy(value=m.query, fuzziness=m.fuzziness, boost=m.boost)
                ft = ctx.fulltext_predicate(strip_keyword(field), fz, "fuzzy", scoring)
            else:
                ft = ctx.fulltext_predicate(strip_keyword(field), m, "match", scoring)
            if ft is not None:
                preds.append(ft)
                continue
        # reference behavior: match == term equality ("glorified terms
        # query", sql.go:126-141)
        preds.append(ctx.resolve(field) == F.lit(_literal(m.query)))
    for field, m in q.match_phrase.items():
        if ctx.fulltext_predicate is not None:
            ft = ctx.fulltext_predicate(strip_keyword(field), m, "phrase", scoring)
            if ft is not None:
                preds.append(ft)
                continue
        raise ValueError(
            f"match_phrase on {field!r} requires a full-text index (positions)"
        )
    for field, m in q.match_phrase_prefix.items():
        if ctx.fulltext_predicate is not None:
            ft = ctx.fulltext_predicate(strip_keyword(field), m, "phrase_prefix", scoring)
            if ft is not None:
                preds.append(ft)
                continue
        raise ValueError(
            f"match_phrase_prefix on {field!r} requires a full-text index (positions)"
        )
    for field, fz in q.fuzzy.items():
        if ctx.fulltext_predicate is not None:
            ft = ctx.fulltext_predicate(strip_keyword(field), fz, "fuzzy", scoring)
            if ft is not None:
                preds.append(ft)
                continue
        raise ValueError(
            f"fuzzy on {field!r} requires a full-text index (vocabulary)"
        )
    for field, rx in q.regexp.items():
        if ctx.fulltext_predicate is not None:
            ft = ctx.fulltext_predicate(strip_keyword(field), rx, "regexp", scoring)
            if ft is not None:
                preds.append(ft)
                continue
        # ES-correct keyword-level regexp: the pattern matches the
        # ENTIRE value (Lucene anchoring); Java-regex dialect via rlike
        pat = f"^(?:{rx.value})$"
        if rx.case_insensitive:
            pat = "(?i)" + pat
        preds.append(ctx.resolve(field).rlike(pat))
    for field, t in q.prefix.items():
        if ctx.fulltext_predicate is not None:
            ft = ctx.fulltext_predicate(
                strip_keyword(field), model.Match(query=t.value), "prefix", scoring
            )
            if ft is not None:
                preds.append(ft)
                continue
        # ES-correct keyword-level prefix on a plain column
        preds.append(ctx.resolve(field).startswith(t.value))
    if q.range:
        preds.append(compile_range(ctx, q.range))
    if q.query_string is not None:
        qs = q.query_string
        if qs.analyze_wildcard and qs.query.strip("*") == "":
            preds.append(F.lit(True))  # bare-'*' Grafana probe -> match-all
        else:
            target = qs.default_field or ctx.json_col or ctx.df.columns[0]
            preds.append(ctx.resolve(target).rlike(glob_to_regex(qs.query)))
    if q.multi_match is not None:
        if ctx.fulltext_predicate is None:
            raise ValueError("multi_match requires a full-text-indexed Engine index")
        ft = ctx.fulltext_predicate(None, q.multi_match, "multi", scoring)
        if ft is None:
            raise ValueError(
                "multi_match fields must all be full-text indexed "
                f"(got {[f for f, _ in q.multi_match.fields]!r})"
            )
        preds.append(ft)
    if q.constant_score is not None:
        # ES constant_score: the inner query is FILTER context (score-
        # exempt BM25-wise); every matching doc scores exactly `boost`.
        # Membership is just the compiled inner predicate — the fixed
        # score rides a "const" scoring entry (no posting-list join).
        inner = compile_query(ctx, q.constant_score.filter, False)
        if ctx.fulltext_predicate is not None and scoring:
            ctx.fulltext_predicate(
                None, (inner, q.constant_score.boost), "const", scoring
            )
        preds.append(inner)
    if q.function_score is not None:
        fs = q.function_score
        if ctx.fulltext_predicate is not None:
            # the Engine compiles the inner query itself so the
            # function combine can see the inner clauses' scores
            preds.append(ctx.fulltext_predicate(None, fs, "fnscore", scoring))
        else:
            preds.append(compile_query(ctx, fs.query, False))
    if q.dis_max is not None:
        if ctx.fulltext_predicate is not None:
            # the Engine compiles each branch itself so it can group the
            # branch's scoring clauses for the max + tie_breaker fold
            preds.append(ctx.fulltext_predicate(None, q.dis_max, "dismax", scoring))
        else:
            # plain relational context (e.g. inside a filters agg):
            # membership only, no scores to maximize over
            preds.append(_or_all(
                [compile_query(ctx, b, False) for b in q.dis_max.queries]
            ))
    if q.bool_ is not None:
        b = q.bool_
        for sub in b.must:
            preds.append(compile_query(ctx, sub, scoring))
        for sub in b.filter:  # scoring-exempt, same predicate (dsl.go:52-54)
            preds.append(compile_query(ctx, sub, False))
        if b.should:
            should = [compile_query(ctx, s, scoring) for s in b.should]
            if b.minimum_should_match is not None and not ctx.quirk_should_is_and:
                req = resolve_min_should(b.minimum_should_match, len(should))
                if req <= 0:
                    # purely score-boosting shoulds (the ES default when
                    # must/filter are present): no hit-set restriction
                    preds.append(F.lit(True))
                elif req == 1:
                    preds.append(_or_all(should))
                else:
                    # at-least-req-of-n: indicator sum, one pass, no
                    # 2^n predicate expansion (n can't exceed the
                    # request's clause count; still, keep it linear)
                    ind = None
                    for p in should:
                        i = F.when(p, F.lit(1)).otherwise(F.lit(0))
                        ind = i if ind is None else ind + i
                    preds.append(ind >= F.lit(req))
            else:
                preds.append(_and_all(should) if ctx.quirk_should_is_and else _or_all(should))
        if b.must_not:
            # must_not is filter context too (excluded docs never score)
            preds.append(~_or_all([compile_query(ctx, s, False) for s in b.must_not]))
    return _and_all(preds)


def compile_search(ctx: CompileContext, d: model.Dsl) -> DataFrame:
    """Full hits pipeline: filter -> sort -> limit (reference GenPlan's
    hits subquery, sql.go:50-58)."""
    out = ctx.df.where(compile_query(ctx, d.query))
    if d.sort:
        out = out.orderBy(
            *[
                ctx.resolve(s.field).desc() if s.order.lower() == "desc" else ctx.resolve(s.field).asc()
                for s in d.sort
            ]
        )
    size = 10 if d.size is None else d.size  # default LIMIT 10 (sql.go:326-332)
    return out.limit(size)
