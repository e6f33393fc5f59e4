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
from pyspark.sql import types as T

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
    from gopensearch_spark.util import ensure_parallelism

    df = ensure_parallelism(df, bytes_per_partition=256 << 10)  # spread single-file scans
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
    band. Deterministic arithmetic only. Row-local but tokenize-heavy —
    under-partitioned (single-file) inputs are spread first."""
    from gopensearch_spark.util import ensure_parallelism

    df = ensure_parallelism(df, bytes_per_partition=256 << 10)
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


# explicit DataType (a DDL string here would need a live SparkSession
# at import time)
_REP_TYPE = T.StructType([
    T.StructField("n_bigrams", T.LongType()),
    T.StructField("top_bigram_frac", T.DoubleType()),
    T.StructField("dup_bigram_frac", T.DoubleType()),
    T.StructField("repeated_token_frac", T.DoubleType()),
])


@F.pandas_udf(_REP_TYPE)
def _repetition_udf(texts):
    import pandas as pd

    out = {"n_bigrams": [], "top_bigram_frac": [],
           "dup_bigram_frac": [], "repeated_token_frac": []}
    from collections import Counter

    for s in texts:
        toks = s.split(" ") if s else []
        n = len(toks)
        bgs = list(zip(toks, toks[1:]))
        nb = len(bgs)
        if nb:
            c = Counter(bgs)
            top = max(c.values()) / nb
            dup = (nb - len(c)) / nb
        else:
            top = dup = 0.0
        rep = (n - len(set(toks))) / n if n else 0.0
        out["n_bigrams"].append(nb)
        out["top_bigram_frac"].append(top)
        out["dup_bigram_frac"].append(dup)
        out["repeated_token_frac"].append(rep)
    return pd.DataFrame(out)


def repetition_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021
    use duplicate-line / top-n-gram fractions as quality filters):

    - ``top_bigram_frac``: occurrences of the most frequent bigram /
      total bigrams (the "top n-gram fraction" filter),
    - ``dup_bigram_frac``: fraction of bigram OCCURRENCES beyond each
      bigram's first (1 - distinct/total),
    - ``repeated_token_frac``: 1 - types/tokens.

    Fully row-local (no shuffle, no explode): one Arrow-batched pandas
    kernel per scan partition — a deliberate exception to this module's
    built-ins-only rule, because Catalyst higher-order lambdas
    RE-EVALUATE captured array expressions per element (a transform
    building bigrams over `split(text)` re-splits the text for every
    element: measured ~10s for a 5k-doc corpus vs ~0.1s for this
    kernel, and the sorted-run formulation degrades O(n^2)). Same cost
    model as the index build's tokenize kernel; the DuckDB oracle pins
    the values exactly."""
    from gopensearch_spark.util import ensure_parallelism

    return ensure_parallelism(df, bytes_per_partition=1 << 20).select(
        F.col(id_col), _repetition_udf(F.col(text_col)).alias("r")
    ).select(id_col, "r.*")


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic document fingerprint: md5 over the normalized
    (lowercased, single-space) token stream — identical in DuckDB
    (md5(lower(text))) so exact-dup detection is oracle-checkable."""
    return df.select(
        F.col(id_col),
        F.md5(F.lower(F.col(text_col))).alias("fp"),
    )


def unigram_lm(
    df: DataFrame,
    text_col: str = "text",
    smoothing: float = 1.0,
) -> DataFrame:
    """Train an add-k-smoothed unigram language model from a corpus:
    ``(token, logp)`` with ``logp = ln((count + k) / (total + k*vocab))``.

    This is the LM half of CCNet-style perplexity filtering (Wenzek et
    al. 2020 score documents by LM perplexity and keep the low-ppl
    head; they use a KenLM trained on Wikipedia — here the model class
    is unigram so the whole pipeline stays inside built-in expressions
    and is value-exact against a SQL oracle, and the training corpus is
    whatever ``df`` you pass, e.g. a trusted high-quality slice).

    Plan shape: one explode → one hash-agg keyed by token (map-side
    combine makes the shuffle carry one row per (partition, token)),
    then a single-row totals aggregate cross-joined back (broadcast, 1
    row). Vocabulary-sized output — at web scale this is millions of
    rows, not corpus-sized."""
    toks = df.select(F.explode(F.split(F.col(text_col), " ")).alias("token"))
    counts = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("total"), F.count("*").alias("vocab")
    )
    k = float(smoothing)
    return counts.crossJoin(F.broadcast(totals)).select(
        "token",
        F.log(
            (F.col("cnt") + F.lit(k))
            / (F.col("total") + F.lit(k) * F.col("vocab"))
        ).alias("logp"),
    )


def doc_logprob(
    df: DataFrame,
    lm: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    oov_logp: float = -20.0,
    broadcast_lm: bool = True,
) -> DataFrame:
    """Score every document under a unigram LM (see ``unigram_lm``):
    ``(doc_id, n_tokens, avg_logprob, ppl)`` where ``avg_logprob`` is
    the mean token log-probability and ``ppl = exp(-avg_logprob)`` —
    the CCNet filtering statistic (low ppl = LM-like = keep).

    Tokens the LM never saw take ``oov_logp`` (irrelevant when the LM
    was trained on the same corpus). Plan shape: explode → equi-join
    on token → one hash-agg keyed by doc id. ``broadcast_lm=True``
    broadcasts the vocabulary relation (right for an external
    curated-corpus LM, typically ≤ a few million rows); at full
    web-corpus vocabularies pass False and the join shuffles both
    sides on token — still linear, no corpus-sized state on any single
    node. The doc_id groupBy's map-side combine means the final
    shuffle carries ~one row per document."""
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("token")
    )
    lm_side = F.broadcast(lm) if broadcast_lm else lm
    scored = toks.join(lm_side, "token", "left").select(
        id_col, F.coalesce("logp", F.lit(float(oov_logp))).alias("logp")
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.avg("logp").alias("avg_logprob"),
        F.exp(-F.avg("logp")).alias("ppl"),
    )
