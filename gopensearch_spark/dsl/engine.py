"""The search engine facade: indices, templates, _search and _msearch.

Python analogue of the reference's server layer without the HTTP
plumbing (reference pkg/server/server.go:174-215 SearchDocumentHandler,
368-431 MSearchHandler, pkg/server/template.go). An "index" is a
registered DataFrame (+ optionally a built inverted index dir for
full-text `match`); a template maps date fields per index-pattern regex
(`*` -> `.*`, reference template.go:51-53,163-179).

Query lifecycle (vs reference §3.1): parse (model.parse_dsl) ->
compile (compiler/aggs -> DataFrame expressions) -> Catalyst plans ->
collect only the final small results -> ES-shaped dict
(reference types.go:62-78). When a `match` targets the index's
full-text field, scoring routes through the BM25 engine
(gopensearch_spark.search) and filters join against it — filters stay
scoring-exempt exactly like ES filter context (reference dsl.go:52-54).
"""

from __future__ import annotations

import re
import time
from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gopensearch_spark.dsl import model
from gopensearch_spark.dsl.aggs import compile_aggs
from gopensearch_spark.dsl.compiler import CompileContext, compile_query, strip_keyword


@dataclass
class IndexSpec:
    df: DataFrame
    json_col: str | None = None
    text_field: str | None = None   # full-text column backed by index_dir
    index_dir: str | None = None
    id_col: str = "doc_id"


@dataclass
class Template:
    name: str
    index_patterns: str
    date_fields: dict[str, str]  # field -> format (only type=date retained,
    #                              reference template.go:92-97)

    def matches(self, index: str) -> bool:
        pattern = self.index_patterns.replace("*", ".*")
        return re.search(pattern, index) is not None


class Engine:
    def __init__(self, spark: SparkSession, compat_quirks: bool = False):
        self.spark = spark
        self.indices: dict[str, IndexSpec] = {}
        self.templates: dict[str, Template] = {}
        self.compat_quirks = compat_quirks

    # --- catalog ---------------------------------------------------------
    def create_index(self, name: str, df: DataFrame, **kw) -> None:
        self.indices[name] = IndexSpec(df=df, **kw)

    def list_indices(self) -> list[str]:
        return sorted(self.indices)

    def cat_indices(self) -> str:
        """`GET /_cat/indices` text shape (reference admin.go:52-71)."""
        return "".join(f"green open {n}\n" for n in self.list_indices())

    def put_template(self, name: str, body: dict) -> None:
        """Retain only type=date properties (reference template.go:92-97)."""
        props = body.get("properties") or body.get("mappings", {}).get("properties", {})
        date_fields = {
            f: spec.get("format", "epoch_millis")
            for f, spec in props.items()
            if spec.get("type") == "date"
        }
        self.templates[name] = Template(
            name=name,
            index_patterns=body.get("index_patterns", "*"),
            date_fields=date_fields,
        )

    def _date_fields_for(self, index: str) -> dict[str, str]:
        out: dict[str, str] = {}
        for t in self.templates.values():
            if t.matches(index):
                out.update(t.date_fields)
        return out

    # --- search ----------------------------------------------------------
    def _context(self, index: str) -> tuple[IndexSpec, CompileContext, list]:
        spec = self.indices[index]
        ft_specs: list[tuple[str, str, str]] = []  # (kind, query, mode)

        def fulltext(field: str, m: model.Match, kind: str = "match"):
            if spec.index_dir and field == spec.text_field:
                mode = "and" if m.operator.upper() == "AND" else "or"
                ft_specs.append((kind, m.query, mode))
                return F.lit(True)  # membership enforced by the scores join
            return None

        ctx = CompileContext(
            df=spec.df,
            json_col=spec.json_col,
            date_fields=self._date_fields_for(index),
            quirk_should_is_and=self.compat_quirks,
            quirk_first_range_only=self.compat_quirks,
            fulltext_predicate=fulltext,
        )
        return spec, ctx, ft_specs

    def search_df(self, index: str, body: str | dict) -> tuple[DataFrame, dict, model.Dsl]:
        """Compile to DataFrames without collecting: (hits, {label: (kind, df)})."""
        d = model.parse_dsl(body)
        spec, ctx, ft_specs = self._context(index)
        filtered = spec.df.where(compile_query(ctx, d.query))

        scored = None
        if ft_specs:
            from gopensearch_spark.search import bm25_scores, phrase_match, prefix_match

            for kind, q, mode in ft_specs:
                if kind == "phrase":
                    # unlimited matches: reuse phrase_match's relation pre-topk
                    s = phrase_match(self.spark, spec.index_dir, q, k=2**31 - 1)
                elif kind == "prefix":
                    s = prefix_match(self.spark, spec.index_dir, q, k=2**31 - 1)
                else:
                    s = bm25_scores(self.spark, spec.index_dir, q, mode=mode)
                scored = s if scored is None else (
                    scored.join(s.withColumnRenamed("score", "s2"), "doc_id")
                    .withColumn("score", F.col("score") + F.col("s2"))
                    .drop("s2")
                )
            scored = scored.withColumnRenamed("doc_id", "__ft_doc_id")
            filtered = filtered.join(
                scored, filtered[spec.id_col] == scored["__ft_doc_id"]
            ).drop("__ft_doc_id")

        # aggs see the filtered relation (reference re-scans per agg,
        # sql.go:39-58; we cache once instead)
        aggs_out = {}
        if d.aggs:
            filtered = filtered.cache()
            agg_ctx = ctx if scored is None else CompileContext(
                df=filtered, json_col=ctx.json_col, date_fields=ctx.date_fields
            )
            aggs_out = compile_aggs(agg_ctx, filtered, d.aggs)

        hits = filtered
        if d.sort:
            hits = hits.orderBy(
                *[
                    ctx.resolve(s.field).desc() if s.order.lower() == "desc" else ctx.resolve(s.field).asc()
                    for s in d.sort
                ]
            )
        elif scored is not None:
            hits = hits.orderBy(F.desc("score"), F.asc(spec.id_col))
        size = 10 if d.size is None else d.size
        if d.from_:
            hits = hits.offset(d.from_)
        hits = hits.limit(size)
        return hits, aggs_out, d

    def _highlight_leaves(self, d: model.Dsl, spec: IndexSpec) -> list:
        """Full-text leaves targeting the index's text field, for
        fetch-phase highlighting (FTS5 highlight() parity)."""
        from gopensearch_spark.search.highlight import leaves_for_match

        leaves: list = []

        def walk(q: model.Query | None):
            if q is None:
                return
            for f, m in q.match.items():
                if strip_keyword(f) == spec.text_field:
                    leaves.extend(leaves_for_match(m.query, "match"))
            for f, m in q.match_phrase.items():
                if strip_keyword(f) == spec.text_field:
                    leaves.extend(leaves_for_match(m.query, "phrase"))
            for f, t in q.prefix.items():
                if strip_keyword(f) == spec.text_field:
                    leaves.extend(leaves_for_match(t.value, "prefix"))
            if q.bool_:
                for sub in q.bool_.must + q.bool_.should + q.bool_.filter:
                    walk(sub)  # must_not excluded: its terms never match

        walk(d.query)
        return leaves

    def search(self, index: str, body: str | dict) -> dict:
        """`POST /{index}/_search` -> ES-shaped response dict."""
        from gopensearch_spark.dsl.response import shape_response

        t0 = time.time()
        hits, aggs_out, d = self.search_df(index, body)
        spec = self.indices[index]
        rows = hits.collect()
        agg_rows = {label: (kind, df.collect()) for label, (kind, df) in aggs_out.items()}
        resp = shape_response(
            index=index,
            rows=rows,
            agg_rows=agg_rows,
            id_col=spec.id_col,
            took_ms=int((time.time() - t0) * 1000),
        )
        if d.highlight and spec.text_field and spec.text_field in d.highlight.get("fields", {}):
            from gopensearch_spark.search.highlight import highlight_text

            fspec = d.highlight["fields"][spec.text_field] or {}
            pre = (fspec.get("pre_tags") or d.highlight.get("pre_tags") or ["<em>"])[0]
            post = (fspec.get("post_tags") or d.highlight.get("post_tags") or ["</em>"])[0]
            leaves = self._highlight_leaves(d, spec)
            if leaves:
                for h in resp["hits"]["hits"]:
                    src = h["_source"].get(spec.text_field)
                    h["highlight"] = {
                        spec.text_field: [highlight_text(src, leaves, pre, post)]
                    }
        return resp

    def fts_search(self, index: str, expr: str, size: int = 10) -> dict:
        """Full FTS5 MATCH-expression search (`a AND (b OR c) NOT d`,
        quoted phrases, trailing-star prefixes) over the index's built
        full-text index — the query surface the reference's backend
        accepts through `content MATCH ?` but its own DSL never emits."""
        from gopensearch_spark.dsl.response import shape_response
        from gopensearch_spark.search import match_expr_scores

        spec = self.indices[index]
        if not spec.index_dir:
            raise ValueError(f"index {index!r} has no full-text index")
        t0 = time.time()
        scores = match_expr_scores(self.spark, spec.index_dir, expr).withColumnRenamed(
            "doc_id", "__ft_doc_id"
        )
        hits = (
            spec.df.join(scores, spec.df[spec.id_col] == scores["__ft_doc_id"])
            .drop("__ft_doc_id")
            .orderBy(F.desc("score"), F.asc(spec.id_col))
            .limit(size)
        )
        return shape_response(
            index=index,
            rows=hits.collect(),
            agg_rows={},
            id_col=spec.id_col,
            took_ms=int((time.time() - t0) * 1000),
        )

    def msearch(self, lines: list[dict]) -> list[dict]:
        """`POST /_msearch`: alternating header/body pairs. Multi-index
        headers degrade to the first index like the reference
        (server.go:407-410)."""
        out = []
        for header, body in zip(lines[::2], lines[1::2]):
            index = header.get("index") or (header.get("indices") or [None])[0]
            out.append(self.search(index, body))
        return out
