"""ES query-DSL model + JSON normalization.

From-scratch Python analogue of the reference's DSL structs and custom
unmarshalers (reference pkg/dsl/dsl.go:10-87, pkg/dsl/json.go:8-138,
pkg/dsl/agg.go:3-39). Normalization rules reproduced:

- `match` / `term` accept shorthand (`{"match": {"f": "v"}}`) or verbose
  (`{"match": {"f": {"query": "v", ...}}}`) forms (json.go:22-66),
- `aggregations` aliases `aggs`, `aggregations` wins (json.go:81-85),
- `bool.must` / `bool.should` accept a single object or an array
  (json.go:90-138). Reference quirk preserved behind
  ``compat_must_drops_should``: its unmarshaler RETURNS EARLY after
  parsing `must`, silently dropping `should` (json.go:104-115) — we
  parse both and let the compiler decide which semantics to apply.
- `range` treats `from`/`to` as `gt`/`lt` aliases (dsl.go:57-62) and
  carries the deprecated `include_lower`/`include_upper` flags.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field


@dataclass
class Match:
    query: str
    fuzziness: str = ""
    operator: str = ""  # "OR" (default) | "AND"
    slop: int = 0       # match_phrase only: 0 = exact adjacency; > 0
    #                     maps to the FTS5 NEAR window (documented
    #                     divergence from Lucene's edit-move slop)
    boost: float = 1.0  # ES per-clause boost: multiplies the clause's
    #                     BM25 contribution in the additive score


@dataclass
class MultiMatch:
    """ES `multi_match` over N indexed fields — the reference's `match`
    TODO at sql.go:126-141 is the hook; the reference itself never
    parses multi_match. Per-field boosts come from the `"field^2.5"`
    suffix syntax; each field scores against its OWN index stats.
    `operator` applies WITHIN each field (AND = all terms in that one
    field); a doc matches when ANY field's subquery matches.

    Types (ES semantics): `best_fields` (the ES default) takes the best
    field's boosted score plus `tie_breaker` x the others;
    `most_fields` SUMS the boosted per-field scores."""

    query: str
    fields: list  # [(field, boost)]
    operator: str = ""  # "OR" (default) | "AND"
    type: str = "best_fields"
    tie_breaker: float = 0.0


@dataclass
class Term:
    value: str


@dataclass
class Fuzzy:
    """ES `fuzzy` term query (absent from the reference; FTS5 has no
    edit-distance operator) — see search/fuzzy.py for the pinned
    expansion + scoring semantics."""

    value: str
    fuzziness: str = "AUTO"
    prefix_length: int = 0
    max_expansions: int = 50
    boost: float = 1.0


@dataclass
class Range:
    gt: object = None
    gte: object = None
    lt: object = None
    lte: object = None
    format: str | None = None
    include_lower: bool = False
    include_upper: bool = False


@dataclass
class QueryString:
    query: str
    analyze_wildcard: bool = False
    default_field: str = ""


@dataclass
class Sort:
    field: str
    order: str = "asc"


@dataclass
class Bool:
    must: list["Query"] = field(default_factory=list)
    should: list["Query"] = field(default_factory=list)
    filter: list["Query"] = field(default_factory=list)
    # ES-correct extension: the reference parses no must_not
    # (pkg/dsl/dsl.go:41-49 has only Must/Should/Filter) but its ES 7.17
    # surface implies it; we implement the real semantics.
    must_not: list["Query"] = field(default_factory=list)
    # ES minimum_should_match: int, "N", "-N", "P%", "-P%". None keeps
    # the engine's reference-compat default (should OR'd, then AND'd
    # with the other groups — i.e. an effective minimum of 1; ES itself
    # would default to 0 when must/filter are present, a documented
    # divergence).
    minimum_should_match: int | str | None = None


@dataclass
class Terms:
    values: list
    # ES terms lookup: {index, id, path} (values resolved at compile)
    lookup: dict | None = None


@dataclass
class Regexp:
    """ES `regexp` term-level query (absent from the reference; FTS5 has
    no regex MATCH). The pattern must match the ENTIRE term (ES/Lucene
    anchoring); dialect is Java regex via Spark `rlike` — a documented
    divergence from Lucene's operator set (see search/fuzzy.py)."""

    value: str
    case_insensitive: bool = False
    max_expansions: int = 1000  # indexed-text path only (bounded OR)


@dataclass
class ConstantScore:
    """ES `constant_score`: filter-context membership, fixed score
    `boost` for every matching doc (no BM25 term weighting)."""

    filter: "Query" = None  # type: ignore[assignment]
    boost: float = 1.0


@dataclass
class DisMax:
    """ES `dis_max`: docs matching ANY branch; score = best branch +
    tie_breaker x the other matching branches (the generalization of
    multi_match best_fields to arbitrary sub-queries)."""

    queries: list["Query"] = field(default_factory=list)
    tie_breaker: float = 0.0


@dataclass
class FunctionScore:
    """ES `function_score` (single `field_value_factor` function +
    optional `weight`): score = boost_mode(query_score,
    weight * modifier(factor * field)). A purely relational inner query
    scores 1.0 (the ES filter-match convention); a full-text inner
    query keeps its BM25 score."""

    query: "Query" = None  # type: ignore[assignment]
    field: str = ""
    factor: float = 1.0
    modifier: str = "none"  # none|log1p|ln1p|sqrt|square|reciprocal
    missing: float = 1.0
    weight: float = 1.0
    boost_mode: str = "multiply"  # multiply|sum|replace


@dataclass
class Nested:
    """ES `nested` query: the inner query must match WITHIN one element
    of the array at `path` (per-element AND, not cross-element). The
    reference parses no `nested`, but its own Jaeger fixtures carry
    nested tag arrays (pkg/server/testdata/bulk-1.ndjson:4 `tags:
    [{key,value}]`) that are unreachable without it — ES-correct
    extension. score_mode is fixed at "none" (filter semantics)."""

    path: str
    query: "Query" = None  # type: ignore[assignment]


@dataclass
class TopMetrics:
    """ES `top_metrics`: the metric value(s) carried by the best row
    under `sort` — one max_by/min_by aggregate, no window, no fetch."""
    metrics: list[str] = field(default_factory=list)
    sort_field: str = ""
    sort_order: str = "desc"


@dataclass
class Boosting:
    """ES `boosting` query: docs matching `positive` rank normally;
    those ALSO matching `negative` have their score multiplied by
    `negative_boost` (they stay in the result set — unlike must_not)."""
    positive: "Query" = None  # type: ignore[assignment]
    negative: "Query" = None  # type: ignore[assignment]
    negative_boost: float = 0.5


@dataclass
class SpanNear:
    """ES `span_near` over `span_term` clauses (single field): ordered
    (in_order) or two-clause unordered proximity with explicit slop.
    Matching/scoring contract pinned in search/spans.py."""
    terms: list[str] = field(default_factory=list)
    slop: int = 0
    in_order: bool = True
    # declared LAST: this attribute shadows dataclasses.field in the
    # class body, so every field(...) call must precede it
    field: str = ""


@dataclass
class Mlt:
    """ES `more_like_this` (Lucene MoreLikeThis): terms are selected
    from the like text(s) by tf x idf against the index's own term
    stats, then run as an OR match with a minimum-should-match floor.
    `like` entries are strings or {"_index","_id"} document refs."""
    fields: list[str] = field(default_factory=list)
    like: list = field(default_factory=list)
    min_term_freq: int = 2
    min_doc_freq: int = 5
    max_doc_freq: int = 0
    max_query_terms: int = 25
    minimum_should_match: int | str = "30%"


@dataclass
class Query:
    match: dict[str, Match] = field(default_factory=dict)
    # further ES-correct query forms absent from the reference's DSL
    terms: dict[str, Terms] = field(default_factory=dict)
    exists: str | None = None          # {"exists": {"field": f}}
    wildcard: dict[str, Term] = field(default_factory=dict)
    match_all: bool = False
    # ES match_phrase / prefix — the reference never parses these, but
    # its FTS5 backend natively answers them ('"a b"' / 'ab*' MATCH
    # expressions); our positional index restores the capability.
    match_phrase: dict[str, Match] = field(default_factory=dict)
    # ES match_phrase_prefix: phrase whose final token is a prefix
    # (FTS5 `"a b" *`); full expansion, no max_expansions truncation
    match_phrase_prefix: dict[str, Match] = field(default_factory=dict)
    prefix: dict[str, Term] = field(default_factory=dict)
    # ES `fuzzy` term-level query; `match` with a `fuzziness` option
    # routes here too (compiler kind "fuzzy")
    fuzzy: dict[str, Fuzzy] = field(default_factory=dict)
    # ES `regexp`: whole-term match; expansion on indexed text fields,
    # anchored rlike on plain columns
    regexp: dict[str, Regexp] = field(default_factory=dict)
    # ES `ids` query: {"ids": {"values": [...]}} on the index's id column
    ids: list | None = None
    term: dict[str, Term] = field(default_factory=dict)
    bool_: Bool | None = None
    range: dict[str, Range] = field(default_factory=dict)
    query_string: QueryString | None = None
    multi_match: MultiMatch | None = None
    constant_score: ConstantScore | None = None
    dis_max: DisMax | None = None
    function_score: FunctionScore | None = None
    nested: Nested | None = None
    more_like_this: Mlt | None = None
    boosting: Boosting | None = None
    span_near: SpanNear | None = None
    rank_feature: "RankFeature | None" = None
    distance_feature: "DistanceFeature | None" = None


@dataclass
class RankFeature:
    """ES `rank_feature`: matches docs that HAVE the feature field;
    score = boost * f(value). Functions: saturation (default,
    x/(x+pivot); an explicit pivot is required — this engine does not
    derive ES's index-statistics default), log (ln(scaling+x)),
    sigmoid (x^e/(x^e+pivot^e)). Pure Catalyst arithmetic — the score
    rides a "const"-style scoring entry, no posting-list relation."""
    field: str
    boost: float = 1.0
    saturation_pivot: float | None = None
    log_scaling: float | None = None
    sigmoid_pivot: float | None = None
    sigmoid_exponent: float = 1.0


@dataclass
class DistanceFeature:
    """ES `distance_feature`: matches docs that HAVE the field;
    score = boost * pivot / (pivot + |value - origin|). Numeric
    columns (dates as epoch millis); origin accepts a number or an
    RFC3339 UTC string, pivot a number or a duration string
    ("500ms"/"30s"/"5m"/"2h"/"7d")."""
    field: str
    origin: float = 0.0
    pivot: float = 1.0
    boost: float = 1.0


@dataclass
class AggTerms:
    field: str
    size: int = 10  # ES default; reference parses but never applies (sql.go:241-250)
    # ES `order`: "_count" | "_key" | a metric sub-agg label
    order_key: str = "_count"
    order_dir: str = "desc"
    # ES `missing`: bucket docs lacking the field under this key
    # (None = ES default, null keys drop from the buckets)
    missing: object = None
    # ES `include`/`exclude`: regex (whole-key anchored, Java dialect)
    # or exact-value list filtering the buckets BEFORE top-size
    include: object = None
    exclude: object = None


@dataclass
class MultiTerms:
    """ES `multi_terms`: terms buckets keyed by a TUPLE of fields in
    one groupBy pass (the two-field facet without a composite walk).
    A doc missing ANY of the key fields produces no bucket (ES
    contract); `key` in the result is the `|`-joined key_as_string ES
    reports alongside the key array."""
    terms: list[str] = field(default_factory=list)  # field names, in order
    size: int = 10
    order_key: str = "_count"
    order_dir: str = "desc"


@dataclass
class VariableWidthHistogram:
    """ES `variable_width_histogram`: at most `buckets` variable-width
    buckets, each reporting min/key(=centroid)/max/doc_count. ES's
    collector is best-effort online clustering (shard-order dependent,
    explicitly non-deterministic); this engine substitutes a
    DETERMINISTIC equi-depth construction — exact interpolated
    quantile boundaries (one aggregate, request-sized result) and a
    row-local boundary-count assignment — which keeps the contract
    (≤ buckets, ordered, centroid keys) while being reproducible and
    oracle-checkable. Documented divergence."""
    field: str
    buckets: int = 10


@dataclass
class AutoDateHistogram:
    """ES `auto_date_histogram`: pick the smallest interval from the ES
    rounding ladder such that the bucketed span fits in `buckets`
    buckets, then delegate to the date_histogram machinery. The min/max
    probe is a single two-scalar aggregate (bounded, never data-sized)."""
    field: str
    buckets: int = 10


@dataclass
class PercentileRanks:
    """ES `percentile_ranks`: for each requested value, the percentage
    of observed values at or below it (exact; ES approximates with
    TDigest)."""
    field: str
    values: list[float] = field(default_factory=list)


@dataclass
class DateHistogram:
    field: str
    fixed_interval: str = ""
    calendar_interval: str = ""
    buckets: int = 0
    # ES extensions the reference parses but ignores (the Grafana
    # explore probe sends extended_bounds, pkg/dsl/complex_test.go:30):
    min_doc_count: int = 1
    extended_bounds_min: int | None = None  # epoch millis
    extended_bounds_max: int | None = None


@dataclass
class Histogram:
    """ES numeric `histogram` agg (absent from the reference's DSL;
    ES-correct extension like min/sum/cardinality)."""
    field: str
    interval: float
    min_doc_count: int = 0  # ES histogram default: empty buckets emitted


@dataclass
class AggField:
    field: str
    missing: str = ""


@dataclass
class TopHits:
    """ES `top_hits` sub-aggregation (under `terms`): the N best docs
    PER BUCKET. Requires an explicit `sort` (our relational buckets have
    no _score to default to unless the query is full-text scored)."""

    size: int = 3
    sort: list[Sort] = field(default_factory=list)
    source: list[str] | None = None  # `_source` include list


@dataclass
class SignificantText:
    """ES `significant_text`: significant_terms over the INDEXED text
    field — foreground terms re-tokenized from matching docs (bounded
    by the hit set), background doc-frequencies read straight from the
    index's term_stats (no postings scan)."""

    field: str
    size: int = 10
    min_doc_count: int = 3


@dataclass
class SignificantTerms:
    """ES `significant_terms`: terms over-represented in the query's
    foreground docs relative to the whole index (background), JLH
    scored. min_doc_count follows the ES default of 3."""

    field: str
    size: int = 10
    min_doc_count: int = 3


@dataclass
class Percentiles:
    field: str
    percents: list[float] = field(
        default_factory=lambda: [1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0]
    )


@dataclass
class RangeAgg:
    """ES `range` bucket agg. Each range dict carries optional
    `from` (inclusive) / `to` (exclusive) / `key`; buckets keep request
    order and may overlap (a doc can land in several)."""
    field: str
    ranges: list[dict] = field(default_factory=list)


@dataclass
class WeightedAvg:
    """ES `weighted_avg`: sum(value x weight) / sum(weight)."""

    value_field: str
    weight_field: str


@dataclass
class PipelineAgg:
    """ES pipeline aggregation input: `buckets_path` names a sibling
    metric label (or `_count`) inside the SAME parent histogram."""

    buckets_path: str


@dataclass
class BucketScript:
    """ES `bucket_script` / `bucket_selector` input: `buckets_path`
    maps script variable names to sibling metric labels (or `_count`);
    `script` is the painless-arithmetic subset this engine evaluates
    (`params.<name>` refs + arithmetic/comparison operators)."""

    buckets_path: dict[str, str]
    script: str


@dataclass
class MovingFn:
    """ES `moving_fn`: sliding-window function over an ordered bucket
    metric. `script` must call one of the `MovingFunctions.*` builtins
    this engine supports (max/min/sum/unweightedAvg/stdDev). Default
    shift=0 windows the `window` buckets BEFORE the current one
    (exclusive), the ES contract."""

    buckets_path: str
    window: int
    script: str
    shift: int = 0


@dataclass
class SerialDiff:
    """ES `serial_diff`: value minus the value `lag` buckets earlier
    (null while no such bucket exists — gap_policy=skip shape)."""

    buckets_path: str
    lag: int = 1


@dataclass
class BucketSortAgg:
    """ES `bucket_sort`: re-orders / truncates the PARENT's buckets by
    sibling metric labels (or `_key`/`_count`); applied after every
    other pipeline in the same parent."""

    sort: list[Sort] = field(default_factory=list)
    from_: int = 0
    size: int | None = None


@dataclass
class SiblingPipeline:
    """ES sibling pipeline agg (`avg_bucket` et al.): lives NEXT TO a
    bucket agg and reduces one of its metrics across all buckets.
    `buckets_path` is `"<bucket_label>><metric_label>"` or
    `"<bucket_label>>_count"`."""

    op: str  # avg | sum | min | max | stats
    buckets_path: str


@dataclass
class Sampler:
    """ES `sampler` / `diversified_sampler`: sub-aggregations computed
    over the top `shard_size` docs (by score for scored queries, else
    lowest-id — deterministic); the diversified form first caps docs
    per distinct `field` value."""
    shard_size: int = 100
    field: str | None = None          # diversified dedupe key
    max_docs_per_value: int = 1


@dataclass
class RareTerms:
    field: str
    max_doc_count: int = 1
    missing: object = None


@dataclass
class FiltersAgg:
    """ES `filters` bucket agg: one named bucket per sub-query."""
    filters: dict[str, "Query"] = field(default_factory=dict)
    # ES other_bucket/other_bucket_key: a bucket counting docs that
    # match NONE of the named filters (None = off)
    other_bucket_key: str | None = None


@dataclass
class CompositeSource:
    """One `composite` source: terms, histogram (fixed `interval`), or
    date_histogram (`fixed_interval`/`calendar_interval`). Histogram
    keys page as numbers, date keys as epoch millis — both totally
    ordered, so the after-cursor works unchanged."""

    name: str
    field: str
    order: str = "asc"  # asc | desc
    kind: str = "terms"  # terms | histogram | date_histogram
    interval: float = 0.0          # histogram only
    fixed_interval: str = ""       # date_histogram
    calendar_interval: str = ""    # date_histogram


@dataclass
class CompositeAgg:
    """ES `composite` bucket agg: the SCALABLE bucket pagination — keys
    stream in key order with an `after` cursor, so a consumer can walk
    10^9 distinct buckets in bounded pages instead of one top-N
    truncation. Buckets with any NULL source value are skipped
    (missing_bucket=false, the ES default)."""

    sources: list[CompositeSource] = field(default_factory=list)
    size: int = 10
    after: dict | None = None


@dataclass
class NestedAgg:
    """ES `nested` aggregation: sub-aggs run over the ELEMENTS of the
    object array at `path` (one row per element), not over documents —
    the facet shape for Jaeger-style tags:[{key,value}] arrays."""

    path: str


@dataclass
class Aggregate:
    terms: AggTerms | None = None
    multi_terms: MultiTerms | None = None
    auto_date_histogram: AutoDateHistogram | None = None
    percentile_ranks: PercentileRanks | None = None
    top_metrics: TopMetrics | None = None
    boxplot: AggField | None = None
    median_absolute_deviation: AggField | None = None
    nested: NestedAgg | None = None
    composite: CompositeAgg | None = None
    date_histogram: DateHistogram | None = None
    histogram: Histogram | None = None
    variable_width_histogram: "VariableWidthHistogram | None" = None
    avg: AggField | None = None
    max: AggField | None = None
    # ES-correct extensions beyond the reference's avg/max
    # (its MetricsMultiple path is an unimplemented stub, db.go:157-159)
    min: AggField | None = None
    sum: AggField | None = None
    cardinality: AggField | None = None
    value_count: AggField | None = None
    stats: AggField | None = None
    extended_stats: AggField | None = None
    weighted_avg: WeightedAvg | None = None
    percentiles: Percentiles | None = None
    range: RangeAgg | None = None
    # ES `date_range`: same from-incl/to-excl contract as `range`, with
    # bounds as epoch numbers or date strings (template formats honored)
    date_range: RangeAgg | None = None
    # ES `ip_range`: IPv4 from/to (from inclusive, to exclusive) or
    # CIDR `mask` ranges over a dotted-quad string column
    ip_range: RangeAgg | None = None
    # ES `rare_terms`: buckets with doc_count <= max_doc_count
    rare_terms: "RareTerms | None" = None
    filters: FiltersAgg | None = None
    # ES `adjacency_matrix`: named filters + their pairwise
    # intersections, one conditional-count pass
    adjacency_matrix: FiltersAgg | None = None
    sampler: Sampler | None = None
    top_hits: TopHits | None = None
    significant_terms: SignificantTerms | None = None
    significant_text: SignificantText | None = None
    # ES `global`: sub-aggs computed over the WHOLE index, ignoring the
    # request's query (the classic faceted-search "totals" bucket)
    global_: bool = False
    # ES pipeline aggs (inside a histogram/date_histogram parent):
    # running sum / bucket-to-bucket difference of a sibling metric
    cumulative_sum: PipelineAgg | None = None
    derivative: PipelineAgg | None = None
    # ES parent pipeline aggs (round 5): script-computed bucket
    # columns, bucket filtering/sorting, sliding-window functions
    bucket_script: BucketScript | None = None
    bucket_selector: BucketScript | None = None
    moving_fn: MovingFn | None = None
    serial_diff: SerialDiff | None = None
    bucket_sort: BucketSortAgg | None = None
    # ES sibling pipeline aggs (round 5): avg/sum/min/max/stats_bucket
    pipeline_sibling: SiblingPipeline | None = None
    aggs: dict[str, "Aggregate"] = field(default_factory=dict)


@dataclass
class Collapse:
    """ES `collapse`: keep only the best hit per distinct value of
    `field` (field collapsing), best = first under the request's sort
    (or _score for scored queries). One window row_number over the
    collapse key — the shuffle is on the collapse key, bounded state
    per group."""
    field: str


@dataclass
class Rescore:
    """ES `rescore`: re-rank the top `window_size` hits of the primary
    query with a (typically more expensive) secondary query — the
    classic cheap-match-then-phrase two-phase ranking. Only the window
    is rescored; the secondary scoring relation is joined against the
    BOUNDED window ids, never the corpus."""
    query: "Query"
    window_size: int = 10
    query_weight: float = 1.0
    rescore_query_weight: float = 1.0
    score_mode: str = "total"  # total | multiply | avg | max | min


@dataclass
class Knn:
    """ES 8.x top-level `knn` search section: exact cosine top-k over a
    dense-vector column. `num_candidates` is accepted for API parity
    but has no effect — this engine's in-DSL path is exact brute-force
    (one corpus scan, partial top-k per partition via
    TakeOrderedAndProject, no corpus-wide sort shuffle); the
    approximate scale paths live in datapipe.similarity (SRP-LSH /
    IVF) and compose with the DSL via rrf_fuse. `filter` restricts the
    candidate set BEFORE the vector scan (ES pre-filter semantics)."""
    field: str
    query_vector: list[float]
    k: int = 10
    num_candidates: int = 100
    filter: "Query | None" = None
    boost: float = 1.0


@dataclass
class Dsl:
    query: Query | None = None
    size: int | None = None  # None -> default 10 at limit time (sql.go:326-332)
    from_: int = 0  # ES `from` pagination offset (reference has none)
    aggs: dict[str, Aggregate] = field(default_factory=dict)
    sort: list[Sort] = field(default_factory=list)
    highlight: dict | None = None  # ES highlight spec (fetch-phase)
    # ES `track_total_hits`: None -> the Engine's default; True (or a
    # positive int — we always count exactly) -> hits.total is the
    # pre-limit count of the filtered relation; False -> the compat
    # post-limit count (reference server.go:222-230).
    track_total_hits: bool | None = None
    # ES `search_after`: sort-tuple cursor for deep pagination — a
    # strictly-after predicate on the sort keys instead of an
    # offset-sized skip scan (`from` at depth 10^6 re-sorts and drops
    # a million rows per page; search_after filters them out before
    # the top-k). Requires `sort`; incompatible with `from`.
    search_after: list | None = None
    # ES `suggest` block (term suggester only; raw spec, evaluated by
    # the Engine against the index vocabulary at fetch time)
    suggest: dict | None = None
    # ES `_source` filtering: None = full source; False = no source;
    # a list of field names = include only those
    source: object = None
    # ES `_source.excludes`: drop the listed fields, keep the rest
    source_excludes: list | None = None
    # ES `collapse`: field collapsing (one best hit per key)
    collapse: Collapse | None = None
    # ES `rescore`: two-phase ranking over the top-window hits
    rescore: Rescore | None = None
    # ES `script_fields`: fetch-phase computed columns, painless
    # doc['f'].value arithmetic subset compiled to Catalyst expressions
    script_fields: dict[str, str] = field(default_factory=dict)
    # ES `runtime_mappings`: script-defined fields resolvable by the
    # query/sort/agg compilers exactly like stored columns
    runtime_mappings: dict[str, str] = field(default_factory=dict)
    # ES `fields` retrieval option (7.10+): per-hit "fields" dict
    # alongside _source
    fields: list[str] = field(default_factory=list)
    # ES `min_score`: drop hits scoring below the threshold (applies
    # before aggregations, the ES contract)
    min_score: float | None = None
    # ES 8.x `knn` section: exact cosine top-k over a dense-vector
    # column (pre-filter supported; approximate variants live in
    # datapipe.similarity)
    knn: Knn | None = None


def _parse_match(raw: dict) -> dict[str, Match]:
    out = {}
    for k, v in raw.items():
        if isinstance(v, dict):
            out[k] = Match(
                query=str(v.get("query", "")),
                fuzziness=str(v.get("fuzziness", "")),
                operator=str(v.get("operator", "")),
                slop=int(v.get("slop", 0)),
                boost=float(v.get("boost", 1.0)),
            )
        else:
            out[k] = Match(query=str(v))
    return out


def _parse_term(raw: dict) -> dict[str, Term]:
    out = {}
    for k, v in raw.items():
        if isinstance(v, dict):
            out[k] = Term(value=str(v.get("value", "")))
        else:
            out[k] = Term(value=str(v))
    return out


def _parse_range(raw: dict) -> dict[str, Range]:
    out = {}
    for k, v in raw.items():
        out[k] = Range(
            gt=v.get("gt", v.get("from")),  # from == gt (reference dsl.go:57-59)
            gte=v.get("gte"),
            lt=v.get("lt", v.get("to")),  # to == lt
            lte=v.get("lte"),
            format=v.get("format"),
            include_lower=bool(v.get("include_lower", False)),
            include_upper=bool(v.get("include_upper", False)),
        )
    return out


# Every clause key _parse_query understands. Parsing itself stays
# LENIENT (unknown keys are silently ignored — parity with the
# reference's encoding/json unmarshal, which drops unknown fields);
# `_validate/query` uses this set to report what a lenient parse would
# have swallowed.
KNOWN_QUERY_CLAUSES = frozenset({
    "match", "terms", "exists", "wildcard", "match_all", "match_phrase",
    "match_phrase_prefix", "prefix", "fuzzy", "regexp", "ids", "span_term",
    "span_near", "boosting", "more_like_this", "constant_score",
    "function_score", "dis_max", "nested", "term", "range", "bool",
    "query_string", "multi_match", "match_bool_prefix", "rank_feature",
    "distance_feature", "intervals",
})


_DURATION_MS = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000,
                "d": 86_400_000}


def _time_scalar(v, what: str) -> float:
    """Number, RFC3339 UTC string, or duration string -> a numeric
    scalar (epoch/duration millis for the string forms)."""
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        return float(v)
    s = str(v)
    m = re.fullmatch(r"(\d+(?:\.\d+)?)(ms|s|m|h|d)", s)
    if m:
        return float(m.group(1)) * _DURATION_MS[m.group(2)]
    try:
        from datetime import datetime, timezone

        return (
            datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ")
            .replace(tzinfo=timezone.utc)
            .timestamp() * 1000
        )
    except ValueError:
        raise ValueError(f"unparseable {what}: {v!r}") from None


def unknown_query_clauses(raw: dict, path: str = "query") -> list[str]:
    """Dotted paths of clause keys a lenient parse would silently drop,
    recursing through the composite clauses (bool occurrences, dis_max
    branches, boosting sides, nested/constant_score/function_score
    wrappers). Empty list = every clause is understood."""
    out: list[str] = []
    for k, v in raw.items():
        here = f"{path}.{k}"
        if k not in KNOWN_QUERY_CLAUSES:
            out.append(here)
            continue
        if not isinstance(v, dict):
            continue
        if k == "bool":
            for occ in ("must", "should", "filter", "must_not"):
                sub = v.get(occ)
                subs = sub if isinstance(sub, list) else ([sub] if sub else [])
                for i, s in enumerate(subs):
                    if isinstance(s, dict):
                        out += unknown_query_clauses(s, f"{here}.{occ}[{i}]")
        elif k == "dis_max":
            for i, s in enumerate(v.get("queries", [])):
                if isinstance(s, dict):
                    out += unknown_query_clauses(s, f"{here}.queries[{i}]")
        elif k == "boosting":
            for side in ("positive", "negative"):
                if isinstance(v.get(side), dict):
                    out += unknown_query_clauses(v[side], f"{here}.{side}")
        elif k in ("nested", "constant_score", "function_score"):
            subkey = "filter" if k == "constant_score" else "query"
            if isinstance(v.get(subkey), dict):
                out += unknown_query_clauses(v[subkey], f"{here}.{subkey}")
    return out


def _parse_query(raw: dict) -> Query:
    q = Query()
    if "match" in raw:
        q.match = _parse_match(raw["match"])
    if "terms" in raw:
        q.terms = {}
        for k, v in raw["terms"].items():
            if isinstance(v, dict):
                # ES terms LOOKUP: {"index": i, "id": d, "path": f} —
                # values fetched from the referenced document at compile
                q.terms[k] = Terms(values=[], lookup={
                    "index": v.get("index"), "id": v.get("id"),
                    "path": v.get("path"),
                })
            else:
                q.terms[k] = Terms(values=list(v))
    if "exists" in raw:
        q.exists = str(raw["exists"]["field"])
    if "wildcard" in raw:
        q.wildcard = {
            k: Term(value=str(v.get("value", v) if isinstance(v, dict) else v))
            for k, v in raw["wildcard"].items()
        }
    if "match_all" in raw:
        q.match_all = True
    if "match_phrase" in raw:
        q.match_phrase = _parse_match(raw["match_phrase"])
    if "match_phrase_prefix" in raw:
        q.match_phrase_prefix = _parse_match(raw["match_phrase_prefix"])
    if "match_bool_prefix" in raw:
        # ES match_bool_prefix decomposes at parse time into its
        # documented bool equivalent: should(match t1, ..., match tn-1,
        # prefix tn), minimum_should_match 1. Scoring is this engine's
        # native FTS5-pinned term/prefix scoring (ES uses Lucene's).
        fld, v = next(iter(raw["match_bool_prefix"].items()))
        text = v["query"] if isinstance(v, dict) else str(v)
        toks = str(text).split()
        if not toks:
            raise ValueError("match_bool_prefix requires a non-empty query")
        subs = [Query(match={fld: Match(query=t)}) for t in toks[:-1]]
        subs.append(Query(prefix={fld: Term(value=toks[-1])}))
        q.bool_ = Bool(should=subs, minimum_should_match=1)
    if "rank_feature" in raw:
        rf = raw["rank_feature"]
        sat = rf.get("saturation") or {}
        logf = rf.get("log") or {}
        sig = rf.get("sigmoid") or {}
        q.rank_feature = RankFeature(
            field=str(rf["field"]),
            boost=float(rf.get("boost", 1.0)),
            saturation_pivot=(
                float(sat["pivot"]) if "pivot" in sat else None
            ),
            log_scaling=(
                float(logf["scaling_factor"]) if logf else None
            ),
            sigmoid_pivot=float(sig["pivot"]) if sig else None,
            sigmoid_exponent=float(sig.get("exponent", 1.0)),
        )
    if "distance_feature" in raw:
        dfq = raw["distance_feature"]
        q.distance_feature = DistanceFeature(
            field=str(dfq["field"]),
            origin=_time_scalar(dfq["origin"], "distance_feature origin"),
            pivot=_time_scalar(dfq["pivot"], "distance_feature pivot"),
            boost=float(dfq.get("boost", 1.0)),
        )
    if "prefix" in raw:
        q.prefix = _parse_term(raw["prefix"])
    if "fuzzy" in raw:
        q.fuzzy = {}
        for k, v in raw["fuzzy"].items():
            if isinstance(v, dict):
                q.fuzzy[k] = Fuzzy(
                    value=str(v.get("value", "")),
                    fuzziness=str(v.get("fuzziness", "AUTO")),
                    prefix_length=int(v.get("prefix_length", 0)),
                    max_expansions=int(v.get("max_expansions", 50)),
                    boost=float(v.get("boost", 1.0)),
                )
            else:
                q.fuzzy[k] = Fuzzy(value=str(v))
    if "regexp" in raw:
        q.regexp = {}
        for k, v in raw["regexp"].items():
            if isinstance(v, dict):
                q.regexp[k] = Regexp(
                    value=str(v.get("value", "")),
                    case_insensitive=bool(v.get("case_insensitive", False)),
                    max_expansions=int(v.get("max_expansions", 1000)),
                )
            else:
                q.regexp[k] = Regexp(value=str(v))
    if "ids" in raw:
        q.ids = list(raw["ids"].get("values", []))
    if "span_term" in raw:
        # a lone span_term scores exactly like a single-term match
        # (one clause, one unit) — route through the match machinery
        (f, v), = raw["span_term"].items()
        val = v.get("value") if isinstance(v, dict) else v
        q.match[f] = Match(query=str(val))
    if "intervals" in raw:
        # ES `intervals` query, the match-rule subset: {"intervals":
        # {field: {"match": {"query": "...", "max_gaps": g, "ordered":
        # o}}}}. An intervals match rule IS a span-proximity constraint,
        # so it parses straight onto the span_near model (same
        # positional-index kernel; ES default max_gaps=-1/unordered is
        # narrowed to explicit gaps — this engine requires a bounded
        # window, matching its FTS5-pinned NEAR semantics).
        (fld, spec), = raw["intervals"].items()
        if "match" not in spec:
            raise ValueError(
                "only the intervals `match` rule is supported "
                "(all_of/any_of/prefix rules are not)"
            )
        mr = spec["match"]
        toks = str(mr.get("query", "")).split()
        if not toks:
            raise ValueError("intervals match requires a non-empty query")
        gaps = int(mr.get("max_gaps", 0))
        if gaps < 0:
            raise ValueError(
                "intervals max_gaps must be >= 0 (this engine requires a "
                "bounded proximity window)"
            )
        q.span_near = SpanNear(
            field=fld, terms=toks, slop=gaps,
            in_order=bool(mr.get("ordered", False)),
        )
    if "span_near" in raw:
        sn = raw["span_near"]
        fields, terms = [], []
        for c in sn.get("clauses", []):
            if "span_term" not in c:
                raise ValueError("span_near clauses must be span_term")
            (f, v), = c["span_term"].items()
            fields.append(f)
            terms.append(str(v.get("value") if isinstance(v, dict) else v))
        if len(set(fields)) != 1:
            raise ValueError("span_near clauses must target one field")
        q.span_near = SpanNear(
            field=fields[0], terms=terms,
            slop=int(sn.get("slop", 0)),
            in_order=bool(sn.get("in_order", True)),
        )
    if "boosting" in raw:
        b = raw["boosting"]
        if "positive" not in b or "negative" not in b:
            raise ValueError("boosting requires positive and negative")
        q.boosting = Boosting(
            positive=_parse_query(b["positive"]),
            negative=_parse_query(b["negative"]),
            negative_boost=float(b.get("negative_boost", 0.5)),
        )
    if "more_like_this" in raw:
        m = raw["more_like_this"]
        like = m.get("like", [])
        if isinstance(like, (str, dict)):
            like = [like]
        q.more_like_this = Mlt(
            fields=[str(f) for f in m.get("fields", [])],
            like=list(like),
            min_term_freq=int(m.get("min_term_freq", 2)),
            min_doc_freq=int(m.get("min_doc_freq", 5)),
            max_doc_freq=int(m.get("max_doc_freq", 0)),
            max_query_terms=int(m.get("max_query_terms", 25)),
            minimum_should_match=m.get("minimum_should_match", "30%"),
        )
    if "constant_score" in raw:
        cs = raw["constant_score"]
        if "filter" not in cs:
            raise ValueError("constant_score requires a `filter` sub-query")
        q.constant_score = ConstantScore(
            filter=_parse_query(cs["filter"]),
            boost=float(cs.get("boost", 1.0)),
        )
    if "function_score" in raw:
        fs = raw["function_score"]
        fvf = fs.get("field_value_factor")
        if fvf is None:
            raise ValueError(
                "function_score supports the `field_value_factor` function "
                "(with optional `weight`); other function types are not implemented"
            )
        q.function_score = FunctionScore(
            query=_parse_query(fs.get("query", {"match_all": {}})),
            field=str(fvf["field"]),
            factor=float(fvf.get("factor", 1.0)),
            modifier=str(fvf.get("modifier", "none")).lower(),
            missing=float(fvf.get("missing", 1.0)),
            weight=float(fs.get("weight", 1.0)),
            boost_mode=str(fs.get("boost_mode", "multiply")).lower(),
        )
    if "dis_max" in raw:
        dm = raw["dis_max"]
        q.dis_max = DisMax(
            queries=[_parse_query(b) for b in dm.get("queries", [])],
            tie_breaker=float(dm.get("tie_breaker", 0.0)),
        )
        if not q.dis_max.queries:
            raise ValueError("dis_max requires at least one sub-query")
    if "nested" in raw:
        nn = raw["nested"]
        if "path" not in nn or "query" not in nn:
            raise ValueError("nested requires `path` and `query`")
        q.nested = Nested(path=str(nn["path"]), query=_parse_query(nn["query"]))
    if "term" in raw:
        q.term = _parse_term(raw["term"])
    if "range" in raw:
        q.range = _parse_range(raw["range"])
    if "bool" in raw:
        b = raw["bool"]
        q.bool_ = Bool(
            must=_as_query_list(b.get("must")),
            should=_as_query_list(b.get("should")),
            filter=_as_query_list(b.get("filter")),
            must_not=_as_query_list(b.get("must_not")),
            minimum_should_match=b.get("minimum_should_match"),
        )
    if "query_string" in raw:
        s = raw["query_string"]
        q.query_string = QueryString(
            query=str(s.get("query", "")),
            analyze_wildcard=bool(s.get("analyze_wildcard", False)),
            default_field=str(s.get("default_field", "")),
        )
    if "multi_match" in raw:
        mm = raw["multi_match"]
        fields = []
        for f in mm.get("fields", []):
            name, _, boost = str(f).partition("^")
            fields.append((name, float(boost) if boost else 1.0))
        q.multi_match = MultiMatch(
            query=str(mm.get("query", "")),
            fields=fields,
            operator=str(mm.get("operator", "")),
            type=str(mm.get("type", "best_fields")),
            tie_breaker=float(mm.get("tie_breaker", 0.0)),
        )
    return q


def _as_query_list(raw) -> list[Query]:
    """must/should accept one object or an array (reference json.go:90-138)."""
    if raw is None:
        return []
    if isinstance(raw, dict):
        return [_parse_query(raw)]
    return [_parse_query(x) for x in raw]


def _parse_agg(raw: dict) -> Aggregate:
    a = Aggregate()
    if "nested" in raw:
        a.nested = NestedAgg(path=str(raw["nested"]["path"]))
    if "terms" in raw:
        t = raw["terms"]
        order = t.get("order") or {"_count": "desc"}
        (okey, odir), = order.items()
        a.terms = AggTerms(field=t["field"], size=int(t.get("size", 10)),
                           order_key=str(okey), order_dir=str(odir).lower(),
                           missing=t.get("missing"),
                           include=t.get("include"), exclude=t.get("exclude"))
    if "multi_terms" in raw:
        mt = raw["multi_terms"]
        order = mt.get("order") or {"_count": "desc"}
        (okey, odir), = order.items()
        a.multi_terms = MultiTerms(
            terms=[str(t["field"]) for t in mt.get("terms", [])],
            size=int(mt.get("size", 10)),
            order_key=str(okey), order_dir=str(odir).lower(),
        )
    if "auto_date_histogram" in raw:
        ah = raw["auto_date_histogram"]
        a.auto_date_histogram = AutoDateHistogram(
            field=str(ah["field"]), buckets=int(ah.get("buckets", 10)),
        )
    if "percentile_ranks" in raw:
        pr = raw["percentile_ranks"]
        a.percentile_ranks = PercentileRanks(
            field=str(pr["field"]),
            values=[float(v) for v in pr.get("values", [])],
        )
    if "top_metrics" in raw:
        tm = raw["top_metrics"]
        mets = tm.get("metrics", [])
        if isinstance(mets, dict):
            mets = [mets]
        (sf, so), = (
            list(tm["sort"].items()) if isinstance(tm.get("sort"), dict)
            else [("_doc", "asc")]
        )
        a.top_metrics = TopMetrics(
            metrics=[str(m["field"]) for m in mets],
            sort_field=str(sf),
            sort_order=(str(so.get("order", so)) if isinstance(so, dict)
                        else str(so)).lower(),
        )
    for metric in ("boxplot", "median_absolute_deviation"):
        if metric in raw:
            setattr(a, metric, AggField(
                field=raw[metric]["field"],
                missing=str(raw[metric].get("missing", "")),
            ))
    if "composite" in raw:
        c = raw["composite"]
        sources = []
        for src in c.get("sources", []):
            (name, body), = src.items()
            if "terms" in body:
                t = body["terms"]
                sources.append(CompositeSource(
                    name=str(name), field=str(t["field"]),
                    order=str(t.get("order", "asc")).lower(),
                ))
            elif "histogram" in body:
                h = body["histogram"]
                sources.append(CompositeSource(
                    name=str(name), field=str(h["field"]),
                    order=str(h.get("order", "asc")).lower(),
                    kind="histogram", interval=float(h["interval"]),
                ))
            elif "date_histogram" in body:
                h = body["date_histogram"]
                sources.append(CompositeSource(
                    name=str(name), field=str(h["field"]),
                    order=str(h.get("order", "asc")).lower(),
                    kind="date_histogram",
                    fixed_interval=str(h.get("fixed_interval", "")
                                       or h.get("interval", "")),
                    calendar_interval=str(h.get("calendar_interval", "")),
                ))
            else:
                raise ValueError(
                    f"composite source {name!r}: must be terms, histogram, "
                    "or date_histogram"
                )
        a.composite = CompositeAgg(
            sources=sources,
            size=int(c.get("size", 10)),
            after=c.get("after"),
        )
    if "date_histogram" in raw:
        d = raw["date_histogram"]
        eb = d.get("extended_bounds") or {}
        a.date_histogram = DateHistogram(
            field=d["field"],
            # legacy `interval` (the Grafana explore probe,
            # reference pkg/dsl/complex_test.go:30) treated as fixed
            fixed_interval=str(d.get("fixed_interval", "") or d.get("interval", "")),
            calendar_interval=str(d.get("calendar_interval", "")),
            buckets=int(d.get("buckets", 0)),
            min_doc_count=int(d.get("min_doc_count", 1)),
            extended_bounds_min=(int(eb["min"]) if "min" in eb else None),
            extended_bounds_max=(int(eb["max"]) if "max" in eb else None),
        )
    if "histogram" in raw:
        h = raw["histogram"]
        a.histogram = Histogram(
            field=h["field"],
            interval=float(h["interval"]),
            min_doc_count=int(h.get("min_doc_count", 0)),
        )
    if "weighted_avg" in raw:
        wa = raw["weighted_avg"]
        a.weighted_avg = WeightedAvg(
            value_field=str(wa["value"]["field"]),
            weight_field=str(wa["weight"]["field"]),
        )
    for metric in ("avg", "max", "min", "sum", "cardinality", "value_count",
                   "stats", "extended_stats"):
        if metric in raw:
            setattr(a, metric, AggField(
                field=raw[metric]["field"],
                missing=str(raw[metric].get("missing", "")),
            ))
    if "range" in raw:
        r = raw["range"]
        a.range = RangeAgg(field=r["field"], ranges=list(r.get("ranges", [])))
    if "date_range" in raw:
        r = raw["date_range"]
        a.date_range = RangeAgg(field=r["field"], ranges=list(r.get("ranges", [])))
    if "ip_range" in raw:
        r = raw["ip_range"]
        a.ip_range = RangeAgg(field=r["field"], ranges=list(r.get("ranges", [])))
    if "variable_width_histogram" in raw:
        v = raw["variable_width_histogram"]
        a.variable_width_histogram = VariableWidthHistogram(
            field=str(v["field"]), buckets=int(v.get("buckets", 10))
        )
    if "rare_terms" in raw:
        r = raw["rare_terms"]
        a.rare_terms = RareTerms(
            field=str(r["field"]),
            max_doc_count=int(r.get("max_doc_count", 1)),
            missing=r.get("missing"),
        )
    if "filters" in raw:
        fr = raw["filters"]
        ob = fr.get("other_bucket_key") or (
            "_other_" if fr.get("other_bucket") else None)
        a.filters = FiltersAgg(
            filters={k: _parse_query(v) for k, v in fr["filters"].items()},
            other_bucket_key=ob,
        )
    if "adjacency_matrix" in raw:
        a.adjacency_matrix = FiltersAgg(
            filters={k: _parse_query(v)
                     for k, v in raw["adjacency_matrix"]["filters"].items()}
        )
    if "sampler" in raw:
        a.sampler = Sampler(shard_size=int(raw["sampler"].get("shard_size", 100)))
    if "diversified_sampler" in raw:
        ds = raw["diversified_sampler"]
        a.sampler = Sampler(
            shard_size=int(ds.get("shard_size", 100)),
            field=str(ds["field"]),
            max_docs_per_value=int(ds.get("max_docs_per_value", 1)),
        )
    if "global" in raw:
        a.global_ = True
    for pname in ("cumulative_sum", "derivative"):
        if pname in raw:
            setattr(a, pname, PipelineAgg(
                buckets_path=str(raw[pname]["buckets_path"])
            ))
    for pname in ("bucket_script", "bucket_selector"):
        if pname in raw:
            p = raw[pname]
            bp = p["buckets_path"]
            if not isinstance(bp, dict):
                # ES also accepts a bare string; variable name defaults
                # to "value" (painless: params.value)
                bp = {"value": str(bp)}
            setattr(a, pname, BucketScript(
                buckets_path={str(k): str(v) for k, v in bp.items()},
                script=str(p["script"]),
            ))
    if "moving_fn" in raw:
        p = raw["moving_fn"]
        a.moving_fn = MovingFn(
            buckets_path=str(p["buckets_path"]),
            window=int(p["window"]),
            script=str(p["script"]),
            shift=int(p.get("shift", 0)),
        )
    if "serial_diff" in raw:
        p = raw["serial_diff"]
        a.serial_diff = SerialDiff(
            buckets_path=str(p["buckets_path"]),
            lag=int(p.get("lag", 1)),
        )
    if "bucket_sort" in raw:
        p = raw["bucket_sort"]
        a.bucket_sort = BucketSortAgg(
            sort=_parse_sort(p.get("sort")),
            from_=int(p.get("from", 0)),
            size=(int(p["size"]) if p.get("size") is not None else None),
        )
    for op in ("avg", "sum", "min", "max", "stats"):
        pname = f"{op}_bucket"
        if pname in raw:
            a.pipeline_sibling = SiblingPipeline(
                op=op, buckets_path=str(raw[pname]["buckets_path"])
            )
    if "top_hits" in raw:
        t = raw["top_hits"]
        src = t.get("_source")
        if isinstance(src, dict):
            src = src.get("includes")
        if isinstance(src, str):
            src = [src]
        a.top_hits = TopHits(
            size=int(t.get("size", 3)),
            sort=_parse_sort(t.get("sort")),
            source=(list(src) if src is not None else None),
        )
    if "significant_terms" in raw:
        s = raw["significant_terms"]
        a.significant_terms = SignificantTerms(
            field=str(s["field"]),
            size=int(s.get("size", 10)),
            min_doc_count=int(s.get("min_doc_count", 3)),
        )
    if "significant_text" in raw:
        s = raw["significant_text"]
        a.significant_text = SignificantText(
            field=str(s["field"]),
            size=int(s.get("size", 10)),
            min_doc_count=int(s.get("min_doc_count", 3)),
        )
    if "percentiles" in raw:
        p = raw["percentiles"]
        a.percentiles = Percentiles(
            field=p["field"],
            **({"percents": [float(x) for x in p["percents"]]} if p.get("percents") else {}),
        )
    sub = raw.get("aggregations", raw.get("aggs"))
    if sub:
        a.aggs = {k: _parse_agg(v) for k, v in sub.items()}
    return a


def parse_dsl(body: str | dict) -> Dsl:
    """Parse an ES search body (JSON string or dict) into the model."""
    raw = json.loads(body) if isinstance(body, str) else body
    d = Dsl()
    if raw.get("query") is not None:
        d.query = _parse_query(raw["query"])
    if raw.get("size") is not None:
        d.size = int(raw["size"])
    if raw.get("from") is not None:
        d.from_ = int(raw["from"])
    if raw.get("highlight") is not None:
        d.highlight = raw["highlight"]
    if raw.get("min_score") is not None:
        d.min_score = float(raw["min_score"])
    if raw.get("track_total_hits") is not None:
        d.track_total_hits = bool(raw["track_total_hits"])
    if raw.get("search_after") is not None:
        d.search_after = list(raw["search_after"])
    if raw.get("suggest") is not None:
        d.suggest = dict(raw["suggest"])
    if raw.get("collapse") is not None:
        d.collapse = Collapse(field=str(raw["collapse"]["field"]))
    if raw.get("knn") is not None:
        kn = raw["knn"]
        if isinstance(kn, list):
            if len(kn) != 1:
                raise ValueError("only a single knn section is supported")
            kn = kn[0]
        d.knn = Knn(
            field=str(kn["field"]),
            query_vector=[float(x) for x in kn["query_vector"]],
            k=int(kn.get("k", 10)),
            num_candidates=int(kn.get("num_candidates", 100)),
            filter=_parse_query(kn["filter"]) if kn.get("filter") else None,
            boost=float(kn.get("boost", 1.0)),
        )
    if raw.get("rescore") is not None:
        rs = raw["rescore"]
        if isinstance(rs, list):
            if len(rs) != 1:
                raise ValueError("only a single rescore stage is supported")
            rs = rs[0]
        rq = rs.get("query") or {}
        if "rescore_query" not in rq:
            raise ValueError("rescore requires query.rescore_query")
        d.rescore = Rescore(
            query=_parse_query(rq["rescore_query"]),
            window_size=int(rs.get("window_size", 10)),
            query_weight=float(rq.get("query_weight", 1.0)),
            rescore_query_weight=float(rq.get("rescore_query_weight", 1.0)),
            score_mode=str(rq.get("score_mode", "total")),
        )
    for name, sf in (raw.get("script_fields") or {}).items():
        script = sf.get("script") if isinstance(sf, dict) else sf
        if isinstance(script, dict):
            script = script.get("source", "")
        d.script_fields[str(name)] = str(script)
    for f in raw.get("fields") or []:
        d.fields.append(str(f["field"] if isinstance(f, dict) else f))
    for name, rm in (raw.get("runtime_mappings") or {}).items():
        script = (rm or {}).get("script", "")
        if isinstance(script, dict):
            script = script.get("source", "")
        d.runtime_mappings[str(name)] = str(script)
    if "_source" in raw:
        src = raw["_source"]
        if isinstance(src, dict):
            exc = src.get("excludes")
            if exc is not None:
                d.source_excludes = [exc] if isinstance(exc, str) else list(exc)
            src = src.get("includes")
            if src is None and d.source_excludes is not None:
                src = True  # excludes-only form keeps the rest
        if isinstance(src, str):
            src = [src]
        d.source = list(src) if isinstance(src, list) else bool(src)
    # `aggregations` wins over `aggs` (reference json.go:81-85)
    aggs = raw.get("aggregations") or raw.get("aggs") or {}
    d.aggs = {k: _parse_agg(v) for k, v in aggs.items()}
    d.sort = _parse_sort(raw.get("sort"))
    return d


def _parse_sort(raw_sort) -> list[Sort]:
    out: list[Sort] = []
    for s in raw_sort or []:
        for f, spec in s.items():
            order = spec.get("order", "asc") if isinstance(spec, dict) else str(spec)
            out.append(Sort(field=f, order=order))
    return out
