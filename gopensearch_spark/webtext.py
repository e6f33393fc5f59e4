"""Common-Crawl-style `web_pages` input table: generation + extraction.

BASELINE.json `input_hint` pins the primary input shape:

    web_pages(url string, warc_ts timestamp, html binary, text string,
              lang string)

and the per-row invariant: **byte-identical extracted text per url** vs
the reference. The reference stores each document verbatim and never
transforms it (INSERT of the raw JSON blob, reference
pkg/server/db.go:14-44), so the extraction contract here is a pure,
reproducible function of the stored page: our synthetic pages embed the
text between fixed byte markers, and `extract_text_udf` recovers it
exactly (pinned by tests/test_webtext.py round-trip tests).

Everything is Arrow-vectorized (pandas UDFs); no per-row Python UDFs.

On a real cluster `web_pages` is an Iceberg table
(``spark.read.format("iceberg").load("cat.db.web_pages")``); this
sandbox has no Iceberg catalog jar, so readers/writers below take a
``fmt`` parameter defaulting to parquet — the DataFrame program on top
is identical either way.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PREFIX = b"<html><head><title>"
_MID = b"</title></head><body>"
_SUFFIX = b"</body></html>"

# Fixed epoch ramp start: 2022-11-11T00:00:00Z (the era of the
# reference's jaeger fixtures, startTimeMillis ~ 1668173489840 in
# reference pkg/server/testdata/bulk-1.ndjson).
_T0_MS = 1_668_124_800_000


def render_html(url: str, text: str) -> bytes:
    """Deterministic page bytes embedding ``text`` verbatim."""
    return _PREFIX + url.encode("utf-8") + _MID + text.encode("utf-8") + _SUFFIX


def extract_text(html: bytes) -> str:
    """Pure inverse of :func:`render_html` — byte-identical text."""
    if html is None:
        return ""
    body_start = html.find(_MID)
    if body_start < 0:
        return ""
    start = body_start + len(_MID)
    end = html.rfind(_SUFFIX)
    if end < start:
        end = len(html)
    return html[start:end].decode("utf-8")


@F.pandas_udf(T.StringType())
def extract_text_udf(htmls: pd.Series) -> pd.Series:
    """Vectorized extraction: html binary -> text string."""
    return htmls.map(extract_text)


def doc_id_expr(url_col: str = "url"):
    """Stable 64-bit doc id from the natural key (xxhash64(url)),
    masked non-negative so FTS5-oracle rowid comparisons stay valid.
    Stable across runs and cluster sizes — a requirement for
    rank-identical checks and for resumable builds."""
    return F.abs(F.xxhash64(F.col(url_col))).alias("doc_id")


def synth_web_pages(
    spark: SparkSession,
    docs: DataFrame,
    copies: int = 1,
    text_col: str = "text",
    lang_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic web_pages table derived from a seeded text corpus.

    ``docs`` supplies (id, text, lang) rows (e.g. the driver-generated
    ``documents.parquet``); each input row becomes ``copies`` pages with
    distinct urls (copy index baked into the url so doc_ids differ).
    No randomness — same input => same bytes, any partitioning, any
    cluster size (row ids come from the seeded id column, not from
    physical row order).
    """
    base = docs.select(
        F.col(id_col).cast("long").alias("row_id"),
        F.col(text_col).alias("text"),
        F.col(lang_col).alias("lang"),
    )
    if copies > 1:
        base = base.withColumn("copy", F.explode(F.sequence(F.lit(0), F.lit(copies - 1))))
    else:
        base = base.withColumn("copy", F.lit(0))
    pages = base.select(
        F.concat(
            F.lit("https://site"), (F.col("row_id") % 1000).cast("string"),
            F.lit(".example/page/"), F.col("row_id").cast("string"),
            F.lit("/c"), F.col("copy").cast("string"),
        ).alias("url"),
        F.timestamp_millis(
            F.lit(_T0_MS) + (F.col("row_id") * 1000 + F.col("copy")).cast("long")
        ).alias("warc_ts"),
        "text",
        "lang",
    )

    @F.pandas_udf(T.BinaryType())
    def render_udf(urls: pd.Series, texts: pd.Series) -> pd.Series:
        return pd.Series(
            [render_html(u, t if t is not None else "") for u, t in zip(urls, texts)]
        )

    return pages.select(
        "url", "warc_ts", render_udf("url", "text").alias("html"), "text", "lang"
    )


def prepare_corpus(web_pages: DataFrame) -> DataFrame:
    """web_pages -> (doc_id, text) corpus for the index builder.

    Extraction runs from the ``html`` bytes (NOT the convenience
    ``text`` column) so the byte-identical invariant is exercised on
    the real path; doc_id derives from url, so it is stable across
    runs, partitionings and cluster sizes.
    """
    return web_pages.select(
        doc_id_expr("url"),
        "url",
        extract_text_udf(F.col("html")).alias("text"),
        "lang",
    )
