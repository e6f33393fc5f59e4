"""Cached index-table readers.

Every query used to call `spark.read.parquet(...)` afresh, re-listing
files and re-reading footers — pure latency on repeated queries against
the same index. Reusing one DataFrame handle per (session, index_dir,
table) keeps Spark's FileIndex/schema cache warm; the plan on top is
rebuilt per query as usual, so correctness is unaffected. Corpus stats
(a tiny driver-side JSON) are memoized with an mtime guard so a
rebuilt/extended index invalidates cleanly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from gopensearch_spark.index.builder import read_corpus_stats, resolve_index_dir

_DF_CACHE: dict[tuple[int, str, str], DataFrame] = {}
_STATS_CACHE: dict[str, tuple[float, dict]] = {}
_TERM_DF_CACHE: dict[tuple[int, str], dict[str, int]] = {}
_HOT_BLOCKS: dict[tuple[int, str], DataFrame] = {}


def warm_index(spark: SparkSession, index_dir: str) -> DataFrame:
    """Pin the blocks table in memory, hash-partitioned by seg_id — the
    serving-cluster posture for a HOT index.

    Once warmed, every wand/phrase query's per-segment kernel reads the
    in-memory relation with NO per-query parquet scan and NO per-query
    shuffle: HashPartitioning(seg_id) already satisfies the
    applyInPandas ClusteredDistribution, so the query plan is one
    kernel stage over cached batches (InMemoryTableScan prunes batches
    on the pushed term predicate via per-batch column stats). The warm
    is explicit opt-in — a 10^12-doc index does not fit executor
    memory, but the exact same call scales to 'pin the head-term
    term_buckets of a hot shard', and MEMORY_AND_DISK degrades
    gracefully. Writers invalidate() this cache like every other
    handle."""
    from pyspark.storagelevel import StorageLevel

    key = (id(spark), resolve_index_dir(index_dir))
    df = _HOT_BLOCKS.get(key)
    if df is None:
        # sortWithinPartitions(term) is what makes the cache PRUNE: the
        # cached relation keeps per-batch column min/max stats, and a
        # term-clustered layout lets InMemoryTableScan skip every batch
        # outside the query's terms (the in-memory analogue of the
        # term_bucket partition pruning the parquet path gets). Without
        # it each query scans ALL cached batches — measured 2.8x SLOWER
        # than the cold path on a 6M-doc index.
        df = (
            index_table(spark, index_dir, "blocks")
            .repartition("seg_id")
            .sortWithinPartitions("term")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        df.count()  # materialize before first query
        _HOT_BLOCKS[key] = df
    return df


def hot_blocks(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """The warmed blocks relation, or None when the index isn't hot
    (queries then read parquet as usual — warming is never implicit)."""
    return _HOT_BLOCKS.get((id(spark), resolve_index_dir(index_dir)))


def index_table(spark: SparkSession, index_dir: str, name: str) -> DataFrame:
    """`postings` / `term_stats` / `blocks` / `doc_stats` reader, memoized.

    Cache keys hold the RESOLVED generation dir, so a pointer flip
    (rename-free compaction) naturally misses the stale handle even
    before ``invalidate`` runs."""
    key = (id(spark), resolve_index_dir(index_dir), name)
    df = _DF_CACHE.get(key)
    if df is None:
        df = spark.read.parquet(os.path.join(key[1], name))
        _DF_CACHE[key] = df
    return df


def corpus_stats(index_dir: str) -> dict:
    resolved = resolve_index_dir(index_dir)
    path = os.path.join(resolved, "corpus_stats.json")
    mtime = os.path.getmtime(path)
    hit = _STATS_CACHE.get(resolved)
    if hit is not None and hit[0] == mtime:
        return hit[1]
    stats = read_corpus_stats(index_dir)
    _STATS_CACHE[resolved] = (mtime, stats)
    return stats


def term_dfs(spark: SparkSession, index_dir: str, terms: list[str]) -> dict[str, int]:
    """term -> document frequency (delta rows summed on a streaming
    index), memoized per (session, index). Every query used to run one
    metrics-sized Spark job to fetch its terms' dfs; repeated queries on
    a read-mostly index now resolve idfs driver-side. Absent terms cache
    as 0 (callers drop them). All index writers call ``invalidate``,
    which clears this cache alongside the DataFrame handles."""
    key = (id(spark), index_dir)
    cache = _TERM_DF_CACHE.setdefault(key, {})
    missing = sorted(t for t in set(terms) if t not in cache)
    if missing:
        from pyspark.sql import functions as F

        from gopensearch_spark.search.bm25 import term_buckets_for

        stats = corpus_stats(index_dir)
        buckets = sorted(set(term_buckets_for(spark, missing, stats["term_buckets"]).values()))
        found: dict[str, int] = {}
        for r in (
            index_table(spark, index_dir, "term_stats")
            .where(F.col("term_bucket").isin(buckets) & F.col("term").isin(missing))
            .select("term", "df")
            .collect()
        ):
            found[r["term"]] = found.get(r["term"], 0) + r["df"]
        for t in missing:
            cache[t] = found.get(t, 0)
    return {t: cache[t] for t in set(terms)}


def invalidate(index_dir: str | None = None) -> None:
    """Drop cached handles (all, or one index) — call after a rebuild.
    Prefix-matched: cache keys may hold generation subdirs of the index
    (``<dir>/gen-N``), which must invalidate with their root."""
    global _DF_CACHE, _STATS_CACHE, _TERM_DF_CACHE, _HOT_BLOCKS
    if index_dir is None:
        for df in _HOT_BLOCKS.values():
            df.unpersist()
        _DF_CACHE, _STATS_CACHE, _TERM_DF_CACHE, _HOT_BLOCKS = {}, {}, {}, {}
        return

    def _keep(path: str) -> bool:
        return path != index_dir and not path.startswith(index_dir.rstrip(os.sep) + os.sep)

    for k, df in list(_HOT_BLOCKS.items()):
        if not _keep(k[1]):
            df.unpersist()
            del _HOT_BLOCKS[k]
    _DF_CACHE = {k: v for k, v in _DF_CACHE.items() if _keep(k[1])}
    _STATS_CACHE = {k: v for k, v in _STATS_CACHE.items() if _keep(k)}
    _TERM_DF_CACHE = {k: v for k, v in _TERM_DF_CACHE.items() if _keep(k[1])}
