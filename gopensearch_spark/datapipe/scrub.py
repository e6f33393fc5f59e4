"""PII scrubbing + Gopher-rule document filtering for web-scale
training-data pipelines.

Both operators are built-in-expression only (JVM-side, whole-stage
codegen; no Python UDFs) so the identical logic is expressible in the
DuckDB oracle SQL — these are `queries()`/`oracle_sql()` pairs the
driver hash-compares. Regex patterns are written in the common subset
of Java regex (Spark) and RE2 (DuckDB): no lookaround, no backrefs.

At 100 TB both are embarrassingly parallel single-pass projections:
no shuffle, no state, filter-pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Order matters: EMAIL first (its local part may contain digits/dots a
# later pattern could nibble), SSN before PHONE (an SSN is a valid
# phone-shaped digit run), IP before PHONE (dotted quads share digit
# groups with dotted phone formats).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    # phone in two passes: +country-code form first (a word boundary
    # cannot precede '+', both non-word chars), then the bare NANP
    # 3-3-4 form; `\(?\b` puts the boundary between '(' and the digit
    ("phone", r"\+\d{1,2}[ .-]?\(?\d{3}\)?[ .-]?\d{3}[ .-]?\d{4}\b", "<PHONE>"),
    ("phone", r"\(?\b\d{3}\)?[ .-]?\d{3}[ .-]?\d{4}\b", "<PHONE>"),
]


def scrub_pii_col(col: Column, kinds: tuple[str, ...] | None = None) -> Column:
    """Chained regexp_replace over `col`; each pattern replaces ALL
    matches (Spark regexp_replace is global; the oracle SQL must pass
    the 'g' flag to DuckDB's regexp_replace to match)."""
    out = col
    for name, pat, token in PII_PATTERNS:
        if kinds is not None and name not in kinds:
            continue
        out = F.regexp_replace(out, pat, token)
    return out


def scrub_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    kinds: tuple[str, ...] | None = None,
) -> DataFrame:
    """(id, text_clean, n_redactions): redact emails / SSNs / IPv4s /
    phone numbers with typed placeholder tokens.

    n_redactions is computed from the placeholder delta (length-based
    counting of inserted tokens) — one pass, no second regex scan.

    The regex chain is row-local but CPU-heavy; a single-file input
    scans as ONE partition and serializes it, so under-partitioned
    inputs are spread first (well-partitioned at-scale tables pass
    through untouched)."""
    from gopensearch_spark.util import ensure_parallelism

    df = ensure_parallelism(df, bytes_per_partition=128 << 10)
    clean = scrub_pii_col(F.col(text_col), kinds)
    tokens = list(dict.fromkeys(
        token for name, _, token in PII_PATTERNS
        if kinds is None or name in kinds
    ))
    counts = []
    for token in tokens:
        # occurrences of `token` in the cleaned text: (len - len(without)) / len(token)
        counts.append(
            (F.length(F.col("text_clean"))
             - F.length(F.replace(F.col("text_clean"), F.lit(token), F.lit(""))))
            / F.lit(len(token))
        )
    total = counts[0] if counts else F.lit(0)
    for c in counts[1:]:
        total = total + c
    return (
        df.select(F.col(id_col), clean.alias("text_clean"))
        .withColumn("n_redactions", total.cast("long"))
    )


# Gopher quality rules (Rae et al. 2021, table A1) — thresholds are the
# paper's defaults; callers tune per corpus. Every signal is a pure
# column expression over the whitespace token array.
GOPHER_DEFAULTS = dict(
    min_words=50, max_words=100_000,
    min_mean_word_len=3.0, max_mean_word_len=10.0,
    max_symbol_word_ratio=0.1,       # '#' or '…' per word
    min_alpha_word_frac=0.8,         # words containing >=1 alphabetic char
    min_stop_hits=2,                 # distinct hits from the stop list
)

GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    **overrides,
) -> DataFrame:
    """(id, word_count, mean_word_len, symbol_word_ratio,
    alpha_word_frac, stop_hits, passes): the Gopher rule battery as
    one projection; `passes` is the AND of every band check.

    Symbols counted: '#' and the ellipsis character. Alphabetic test is
    ASCII letters (the SQL-portable subset; real CC pipelines run the
    same shape with a wider class)."""
    from gopensearch_spark.util import ensure_parallelism

    df = ensure_parallelism(df, bytes_per_partition=256 << 10)  # spread single-file scans (see scrub_pii)
    p = {**GOPHER_DEFAULTS, **overrides}
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    mwl = (F.length(F.replace(F.col(text_col), F.lit(" "), F.lit(""))) / n)
    n_hash = F.length(F.col(text_col)) - F.length(
        F.replace(F.col(text_col), F.lit("#"), F.lit("")))
    n_ell = F.length(F.col(text_col)) - F.length(
        F.replace(F.col(text_col), F.lit("…"), F.lit("")))
    symbol_ratio = (n_hash + n_ell) / n
    alpha_frac = (
        F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))) / n
    )
    stop_hits = F.size(F.array_intersect(
        F.array_distinct(toks),
        F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
    ))
    out = df.select(
        F.col(id_col),
        n.alias("word_count"),
        mwl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_word_ratio"),
        alpha_frac.alias("alpha_word_frac"),
        stop_hits.alias("stop_hits"),
    )
    passes = (
        (F.col("word_count") >= p["min_words"])
        & (F.col("word_count") <= p["max_words"])
        & (F.col("mean_word_len") >= p["min_mean_word_len"])
        & (F.col("mean_word_len") <= p["max_mean_word_len"])
        & (F.col("symbol_word_ratio") <= p["max_symbol_word_ratio"])
        & (F.col("alpha_word_frac") >= p["min_alpha_word_frac"])
        & (F.col("stop_hits") >= p["min_stop_hits"])
    )
    return out.withColumn("passes", passes)


# C4 line-level cleaning (Raffel et al. 2020 §2.2) — the classic
# Common-Crawl page cleaner. Thresholds are the paper's; callers tune.
C4_DEFAULTS = dict(
    min_words_per_line=5,    # retain lines with >= 5 words
    min_kept_lines=3,        # drop pages with < 3 surviving "sentences"
    # pages containing these are dropped outright
    page_drop_substrings=("lorem ipsum", "{"),
    # lines mentioning these are dropped (boilerplate/policy lines)
    line_drop_pattern=r"javascript|cookie|privacy policy|terms of use",
)


def c4_rules(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    line_sep: str = "\n", **overrides,
) -> DataFrame:
    """(id, n_lines, n_kept, text_clean, passes): the C4 cleaning rules
    as ONE whole-stage projection — no UDFs, no shuffle, no explode.

    Line filter (keep iff ALL hold): ends in terminal punctuation
    (. ! ? "), has >= min_words_per_line whitespace words, and does not
    match the boilerplate pattern (case-insensitive). Page filter:
    `passes` is false when the page contains any page_drop substring
    (case-insensitive) or fewer than min_kept_lines lines survive.
    All signals are array HOFs over the split lines — the identical
    logic runs in DuckDB via list_filter for the oracle pair."""
    p = {**C4_DEFAULTS, **overrides}
    lines = F.split(F.col(text_col), line_sep)
    drop_re = p["line_drop_pattern"]

    def keep(line: Column) -> Column:
        return (
            line.rlike(r'[.!?"]\s*$')
            & (F.size(F.split(F.trim(line), r"\s+")) >= p["min_words_per_line"])
            & ~F.lower(line).rlike(drop_re)
        )

    kept = F.filter(lines, keep)
    low = F.lower(F.col(text_col))
    page_drop = F.lit(False)
    for s in p["page_drop_substrings"]:
        page_drop = page_drop | low.contains(s.lower())
    return df.select(
        F.col(id_col),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        F.array_join(kept, line_sep).alias("text_clean"),
        (~page_drop & (F.size(kept) >= p["min_kept_lines"])).alias("passes"),
    )


# Unicode-punctuation normalization map (typographic -> ASCII), applied
# via translate (1:1 chars) + regexp passes (multi-char): the
# SQL-portable normalization subset every web-crawl pipeline needs
# before tokenization/dedup. Full NFKC needs ICU; this covers the
# high-frequency web typography without it.
_NORM_TRANSLATE_SRC = "‘’“”–— −"
_NORM_TRANSLATE_DST = "''\"\"-- -"


def normalize_text(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    lowercase: bool = False,
) -> DataFrame:
    """(id, text_norm, n_chars_removed): canonicalize web typography —
    curly quotes/dashes/NBSP/minus to ASCII (translate), ellipsis to
    '...', control chars stripped, whitespace runs collapsed, ends
    trimmed. One shuffle-free projection of chained builtin expressions
    (translate + regexp_replace), identical semantics in the DuckDB
    oracle."""
    c = F.col(text_col)
    c = F.translate(c, _NORM_TRANSLATE_SRC, _NORM_TRANSLATE_DST)
    c = F.regexp_replace(c, "…", "...")
    c = F.regexp_replace(c, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "")
    c = F.regexp_replace(c, r"\s+", " ")
    c = F.trim(c)
    if lowercase:
        c = F.lower(c)
    return df.select(
        F.col(id_col),
        c.alias("text_norm"),
        (F.length(F.col(text_col)) - F.length(c)).cast("long").alias("n_chars_removed"),
    )
