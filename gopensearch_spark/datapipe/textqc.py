"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

Everything here is built-in-expression only (JVM-side, codegen'd) so
the same logic is expressible in the DuckDB oracle SQL verbatim — these
are the `queries()`/`oracle_sql()` pairs the driver hash-compares.
Tokenization for QC purposes is simple whitespace/regex (NOT the FTS5
tokenizer — QC wants cheap, index wants exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny seeded stopword lists per language — the n-gram/stopword-hit
# heuristic; deterministic and SQL-portable.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "nicht", "ist", "ein", "zu"],
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est"],
    "zh": ["de5", "shi4", "bu4", "le5", "zai4", "wo3", "you3", "he2"],
}

_TOKENS = lambda c: F.split(c, " ")  # noqa: E731  (corpus is space-joined)


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, n_chars, avg_token_len, n_types) —
    whitespace tokens + a BPE-ish subword estimate (chars/4 heuristic,
    the common rule-of-thumb for byte-level BPE)."""
    toks = _TOKENS(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.length(text_col).alias("n_chars"),
        (F.length(text_col) / F.size(toks)).alias("avg_token_len"),
        F.size(F.array_distinct(toks)).alias("n_types"),
        F.ceil(F.length(text_col) / 4).cast("long").alias("bpe_est_tokens"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher/C4-style quality signals + a composite score in [0, 1]:
    length band, type-token ratio, stopword presence, mean word length
    band. Deterministic arithmetic only."""
    toks = _TOKENS(F.col(text_col))
    n = F.size(toks)
    ttr = F.size(F.array_distinct(toks)) / n
    stop_hits = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in LANG_MARKERS["en"]])))
    mwl = F.length(text_col) / n
    score = (
        F.when((n >= 10) & (n <= 100000), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when((mwl >= 3) & (mwl <= 12), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(ttr >= 0.1, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(stop_hits >= 1, F.lit(0.25)).otherwise(F.lit(0.0))
    )
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        ttr.alias("type_token_ratio"),
        stop_hits.alias("stopword_hits"),
        mwl.alias("mean_word_len"),
        score.alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit language ID: distinct-marker intersection count per
    language, argmax with lexicographic tie-break. (doc_id, pred_lang)."""
    toks = F.array_distinct(_TOKENS(F.col(text_col)))
    scored = F.array(
        *[
            F.struct(
                F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, words in sorted(LANG_MARKERS.items())
        ]
    )
    # max score, ties -> lexicographically smallest lang: sort by
    # (-score, lang) and take element 1
    best = F.sort_array(
        F.transform(scored, lambda s: F.struct((-s["score"]).alias("neg"), s["lang"].alias("lang")))
    )[0]["lang"]
    return df.select(F.col(id_col), best.alias("pred_lang"))


def repetition_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021
    use duplicate-line / top-n-gram fractions as quality filters):

    - ``top_bigram_frac``: occurrences of the most frequent bigram /
      total bigrams (the "top n-gram fraction" filter),
    - ``dup_bigram_frac``: fraction of bigram OCCURRENCES beyond each
      bigram's first (1 - distinct/total),
    - ``repeated_token_frac``: 1 - types/tokens.

    All built-in array expressions, fully row-local (no shuffle, no
    explode — a 10^12-doc scan stays one narrow codegen stage): bigrams
    via transform over an index sequence, and the per-doc mode count as
    a max-run-length aggregate over the SORTED bigram array, which is
    O(n log n) per doc with O(1) state — never a per-doc hash map in
    Python."""
    toks = _TOKENS(F.col(text_col))
    n = F.size(toks)
    bigrams = F.when(n >= 2, F.transform(
        F.sequence(F.lit(0), n - 2),
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)
        ),
    )).otherwise(F.array().cast("array<string>"))
    sb = F.sort_array(bigrams)
    zero = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    max_count = F.aggregate(sb, zero, step, lambda acc: acc["best"])
    nb = F.size(bigrams)
    nd = F.size(F.array_distinct(bigrams))
    ntypes = F.size(F.array_distinct(toks))
    return df.select(
        F.col(id_col),
        nb.cast("long").alias("n_bigrams"),
        F.when(nb > 0, max_count / nb).otherwise(F.lit(0.0)).alias("top_bigram_frac"),
        F.when(nb > 0, (nb - nd) / nb).otherwise(F.lit(0.0)).alias("dup_bigram_frac"),
        F.when(n > 0, (n - ntypes) / n).otherwise(F.lit(0.0)).alias("repeated_token_frac"),
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic document fingerprint: md5 over the normalized
    (lowercased, single-space) token stream — identical in DuckDB
    (md5(lower(text))) so exact-dup detection is oracle-checkable."""
    return df.select(
        F.col(id_col),
        F.md5(F.lower(F.col(text_col))).alias("fp"),
    )
