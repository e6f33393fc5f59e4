"""Inverted-index builder: tokenize -> postings -> compressed blocks.

Reimplements from scratch what the reference outsources to SQLite FTS5
(virtual-table creation at reference pkg/server/db.go:46-54; tokenize +
posting-list maintenance happen inside SQLite on every INSERT,
db.go:16-17). Spark-first design:

- **tokenize**: one Arrow-batched `mapInPandas` pass emits flattened
  (term, doc_id, tf[, positions]) rows directly. Computing tf inside the
  kernel (instead of explode + groupBy) removes the (term, doc_id)
  pre-aggregation shuffle entirely — partial counts never leave the
  input partition — and a single Python crossing per partition avoids
  the GC-heavy map-column explode (measured 8x build throughput vs the
  pandas-UDF + explode formulation).
- **flat postings** (``postings/``): `(term, doc_id, tf, doc_len)` rows,
  written partitioned by ``term_bucket = pmod(xxhash64(term), B)`` and
  sorted by (term, doc_id) within files. doc_len is denormalized into the
  row so BM25 scoring needs NO join against doc_stats at query time.
  Queries prune to the handful of term_bucket partitions their terms hash
  to — at 10^12 docs this is the difference between scanning the whole
  index and scanning ~q/B of it.
- **compressed blocks** (``blocks/``): per (segment, term) posting lists,
  doc_ids delta+varint encoded, tfs/doc_lens varint encoded, chunked into
  BLOCK_SIZE-entry blocks carrying (max_tf, min_doc_len) so a block-max
  score upper bound can be computed at query time without decoding
  (block-max WAND, Ding & Suel 2011). Segments are disjoint doc_id hash
  classes, so per-segment top-k results combine by a global top-k.
- **skew**: the segment axis IS the skew-splitting device — a Zipf head
  term's postings are spread across all ``num_segments`` groups, so no
  single task ever holds a stopword's full posting list (the salted-merge
  requirement of BASELINE north_rule; salt == seg_id).
- **resumability**: `build_index` processes the corpus in ``slices``
  (doc_id hash classes); each slice commits its output and a checkpoint
  record with lineage + doc/term/byte metrics before the next starts.
  A re-run skips committed slices (tests/test_webtext.py:92-95;
  streaming-resume analogue in tests/test_streaming.py).
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gopensearch_spark import codecs

BLOCK_SIZE = 128            # postings per compressed block
DEFAULT_TERM_BUCKETS = 64   # term_bucket partitions on disk
DEFAULT_NUM_SEGMENTS = 32   # doc-hash segments (sandbox default; see below)
TARGET_DOCS_PER_SEGMENT = 250_000  # sizing rule input, recommended_num_segments


GEN_POINTER = "_current"  # generation pointer file (rename-free commit)


def resolve_index_dir(index_dir: str) -> str:
    """Data directory of the CURRENT generation: ``<dir>/gen-N`` when a
    ``_current`` pointer file exists, else ``<dir>`` itself (flat legacy
    layout). Idempotent — resolving a generation dir returns it.

    The pointer file is the compaction COMMIT: one small atomic write
    (``os.replace`` locally, a single object PUT on S3/GCS), never a
    directory rename — object stores have no rename, so versioned
    generation dirs + a pointer are the only deployable in-place swap at
    100 TB. Readers resolve through this on every table access; a crash
    while building the next generation leaves the pointer (and every
    reader) on the committed one.
    """
    p = os.path.join(index_dir, GEN_POINTER)
    if not os.path.exists(p):
        return index_dir
    with open(p) as f:
        return os.path.join(index_dir, f"gen-{json.load(f)['generation']}")


def current_generation(index_dir: str) -> int:
    """0 = flat legacy layout (no pointer)."""
    p = os.path.join(index_dir, GEN_POINTER)
    if not os.path.exists(p):
        return 0
    with open(p) as f:
        return int(json.load(f)["generation"])


def _commit_generation(index_dir: str, gen: int) -> None:
    tmp = os.path.join(index_dir, GEN_POINTER + ".tmp")
    with open(tmp, "w") as f:
        json.dump(
            {"generation": gen,
             "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())},
            f,
        )
    os.replace(tmp, os.path.join(index_dir, GEN_POINTER))


def recommended_num_segments(
    n_docs: int,
    parallelism: int = 32,
    target_docs_per_segment: int = TARGET_DOCS_PER_SEGMENT,
) -> int:
    """Segment-count sizing rule: ``max(parallelism, ceil(n_docs /
    target_docs_per_segment))``.

    Segments are the query kernel's unit of both parallelism AND memory:
    a worst-case term (df = N, a stopword) contributes ~N/num_segments
    postings to each per-segment Arrow group, so the per-task bound is
    ``target_docs_per_segment`` postings per query term regardless of
    corpus size (~2 MB decoded arrays per term at the default). The
    parallelism floor keeps small corpora from serializing the kernel.
    At 10^12 docs this yields 4M segments — rare terms then carry one
    block row per touched segment, the deliberate trade for a bounded
    worst case. ``build_index(num_segments=None)`` applies this rule
    automatically from a corpus count."""
    import math

    return max(int(parallelism), math.ceil(max(int(n_docs), 1) / target_docs_per_segment))


EST_POSTINGS_PER_DOC = 120          # distinct terms per ~400-token web page
TARGET_POSTINGS_PER_BUCKET = 2_000_000  # ~100-250 MB sorted parquet w/ positions
MIN_POSTINGS_PER_BUCKET = 25_000    # below this, per-file overhead > sort benefit


def recommended_term_buckets(n_docs: int) -> int:
    """Bucket-count sizing rule: ``clamp(est_postings / target, adaptive
    floor, 64k)``.

    term_bucket is the unit of the build's big shuffle-and-sort (one
    sorted parquet run per bucket) and of query-side partition pruning.
    A FIXED bucket count stops scaling the moment the corpus outgrows
    it: per-bucket sort partitions exceed each task's execution-memory
    share (heap / concurrent tasks), every sort spills, and — because
    the per-task share SHRINKS as cores grow — the spill tax lands
    hardest on the biggest cluster (measured here: 2->8 core efficiency
    0.81 at 800k docs vs 0.57 at 6M with 32 fixed buckets). Sizing by
    estimated posting rows keeps the sorted unit ~constant
    (``TARGET_POSTINGS_PER_BUCKET``) at any corpus size; the estimate
    errs toward MORE buckets (smaller sorts, finer pruning), which is
    the safe side.

    The floor is adaptive for the opposite regime: a hard 64-bucket
    floor on a 5k-doc corpus means 64 partition dirs × (postings +
    term_stats + blocks) tiny files, and per-file open/commit overhead
    dominates the build (measured here: 13.3s vs 5.9s on identical 5k-doc
    input at 64 vs 32 buckets). Buckets therefore never shrink below
    ``est_postings / MIN_POSTINGS_PER_BUCKET``-sized units either —
    small corpora get few fat-enough buckets, large corpora keep the
    ``DEFAULT_TERM_BUCKETS`` parallelism floor.
    ``build_index(term_buckets=None)`` applies this rule from a corpus
    count."""
    import math

    est_postings = max(int(n_docs), 1) * EST_POSTINGS_PER_DOC
    floor = min(
        DEFAULT_TERM_BUCKETS,
        max(1, math.ceil(est_postings / MIN_POSTINGS_PER_BUCKET)),
    )
    return min(
        max(floor, math.ceil(est_postings / TARGET_POSTINGS_PER_BUCKET)),
        65536,
    )


BLOCKS_SCHEMA = (
    "term string, seg_id int, block_id int, n int, "
    "min_doc_id long, max_doc_id long, max_tf int, min_doc_len int, "
    "min_tf int, max_doc_len int, "
    "doc_ids binary, tfs binary, doc_lens binary"
)


def _flat_postings(
    docs: DataFrame, text_col: str, id_col: str, with_positions: bool = False
) -> DataFrame:
    """(doc_id, doc_len, term, tf[, positions]) — computed partition-locally.

    One `mapInPandas` pass does tokenize -> per-doc tf (and, with
    positions, delta+varint-encoded position lists, the FTS5
    detail=full analogue) -> flattened posting rows. A single
    Arrow crossing per input partition; no JVM map explode, no second
    UDF round-trip — measured ~3x less GC-churny than the
    map-column + explode + encode-UDF formulation it replaces.

    EVERY document additionally emits one per-doc SENTINEL row with
    ``term = NULL, tf = 0`` and its true ``doc_len``. Sentinels make the
    flat relation self-contained: ``doc_stats`` is a NULL-term filter
    scan (no dropDuplicates shuffle over per-(doc, term) rows), and a
    zero-token document (empty/whitespace text) — which has no postings
    but IS a document, FTS5 counts every row in N and avgdl (verified
    against SQLite directly; see tests) — needs no special casing: its
    sentinel is its only row. Postings/blocks/term-stat consumers filter
    ``term IS NOT NULL``; query-side term-equality/prefix predicates
    never match NULL, so sentinels are invisible to search.

    The kernel is batch-vectorized: per doc only the C-speed pieces run
    (ASCII/NFKD fold + one regex findall); everything after — term
    dictionary encoding, per-(doc, term) tf, sorted position lists — is
    one pandas.factorize + numpy lexsort + run-length pass over the
    batch's FLAT token array. The previous per-doc Python dict loop
    (setdefault/append per token) was the build's hottest path after the
    ASCII fold fast path; tokenizer parity is unchanged
    (tests/test_tokenizer.py pins it against fts5vocab).
    """
    from gopensearch_spark.analysis import tokenize

    schema = "doc_id long, doc_len int, term string, tf int" + (
        ", positions binary" if with_positions else ""
    )

    def flatten(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids_arr = pdf[id_col].to_numpy()
            tok_lists = [
                tokenize(t) if isinstance(t, str) and t else [] for t in pdf[text_col]
            ]
            lens = np.fromiter(
                (len(x) for x in tok_lists), dtype=np.int64, count=len(tok_lists)
            )
            total = int(lens.sum())
            if total == 0:
                yield _sentinel_frame(ids_arr, lens, with_positions)
                continue
            flat = np.empty(total, dtype=object)
            off = 0
            for toks in tok_lists:
                flat[off : off + len(toks)] = toks
                off += len(toks)
            codes, uniques = pd.factorize(flat, sort=False)
            doc_idx = np.repeat(np.arange(len(tok_lists), dtype=np.int64), lens)
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
            # group to (doc, term) with ONE stable argsort over a fused
            # (doc, code) key — measured ~5x faster than np.lexsort's two
            # passes; stability keeps positions ascending within each
            # group (FTS5 stores them sorted). Fused key fits int64 for
            # any realistic Arrow batch; lexsort fallback guards overflow.
            n_uniq = len(uniques)
            if len(tok_lists) * n_uniq < (1 << 62):
                key = doc_idx * n_uniq + codes
                order = np.argsort(key, kind="stable")
                ks = key[order]
                change = np.flatnonzero(ks[1:] != ks[:-1]) + 1
                d, c, p = doc_idx[order], codes[order], pos[order]
            else:
                order = np.lexsort((codes, doc_idx))
                d, c, p = doc_idx[order], codes[order], pos[order]
                change = np.flatnonzero((d[1:] != d[:-1]) | (c[1:] != c[:-1])) + 1
            g = np.concatenate(([0], change))
            tf = np.diff(np.concatenate((g, [total])))
            uniq_terms = np.asarray(uniques, dtype=object)
            out = {
                "doc_id": pd.Series(ids_arr[d[g]], dtype="int64"),
                "doc_len": pd.Series(lens[d[g]], dtype="int32"),
                "term": pd.Series(uniq_terms[c[g]], dtype="object"),
                "tf": pd.Series(tf, dtype="int32"),
            }
            if with_positions:
                out["positions"] = pd.Series(
                    codecs.delta_encode_chunks(p.astype(np.uint64), tf),
                    dtype="object",
                )
            frame = pd.DataFrame(out)
            # one per-doc sentinel for EVERY doc (incl. zero-token docs)
            yield pd.concat(
                [frame, _sentinel_frame(ids_arr, lens, with_positions)],
                ignore_index=True,
            )

    return docs.select(
        F.col(id_col).cast("long").alias(id_col), F.col(text_col)
    ).mapInPandas(flatten, schema)


def _sentinel_frame(
    ids: np.ndarray, lens: np.ndarray, with_positions: bool
) -> pd.DataFrame:
    """Per-doc stats sentinel rows (term NULL, tf 0, true doc_len)."""
    out = {
        "doc_id": pd.Series(np.asarray(ids, dtype=np.int64), dtype="int64"),
        "doc_len": pd.Series(np.asarray(lens, dtype=np.int32), dtype="int32"),
        "term": pd.Series([None] * len(ids), dtype="object"),
        "tf": pd.Series(np.zeros(len(ids)), dtype="int32"),
    }
    if with_positions:
        out["positions"] = pd.Series([b""] * len(ids), dtype="object")
    return pd.DataFrame(out)


def _encoders(block_codec: str):
    """(ids_encode, vals_encode) for a block codec name."""
    if block_codec == "pfor":
        return codecs.delta_pfor_encode, codecs.pfor_encode
    if block_codec == "varint":
        return codecs.delta_encode, codecs.varint_encode
    raise ValueError(f"unknown block codec {block_codec!r}")


def _make_segment_blocks_kernel(block_codec: str = "pfor"):
    enc_ids, enc_vals = _encoders(block_codec)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        return _build_segment_blocks(pdf, enc_ids, enc_vals)

    return kernel


def _build_segment_blocks(
    pdf: pd.DataFrame, enc_ids=codecs.delta_encode, enc_vals=codecs.varint_encode
) -> pd.DataFrame:
    """applyInPandas kernel: one segment's flat postings -> block rows.

    Sort by (term, doc_id) with numpy, find term boundaries, encode each
    term's ids/tfs/doc_lens in BLOCK_SIZE chunks with the chosen codec
    (delta+varint default, delta+PForDelta optional).
    """
    seg_id = int(pdf["seg_id"].iloc[0])
    order = np.lexsort((pdf["doc_id"].to_numpy(), pdf["term"].to_numpy()))
    terms = pdf["term"].to_numpy()[order]
    doc_ids = pdf["doc_id"].to_numpy()[order].astype(np.uint64)
    tfs = pdf["tf"].to_numpy()[order].astype(np.uint64)
    dls = pdf["doc_len"].to_numpy()[order].astype(np.uint64)

    # term run boundaries
    change = np.flatnonzero(terms[1:] != terms[:-1]) + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [len(terms)]))

    # Block tiling + per-block order stats, vectorized across ALL blocks
    # of the group (a Zipf vocabulary means most runs are a single tiny
    # block — per-block numpy slicing paid ~25us of call overhead per
    # block before the three codec calls even started):
    run_lens = ends - starts
    nblocks = -(-run_lens // BLOCK_SIZE)
    run_idx = np.repeat(np.arange(starts.size), nblocks)
    first_of_run = np.concatenate(([0], np.cumsum(nblocks)[:-1]))
    block_ids = np.arange(run_idx.size) - first_of_run[run_idx]
    off = starts[run_idx] + block_ids * BLOCK_SIZE
    hi = np.minimum(off + BLOCK_SIZE, ends[run_idx])
    # blocks tile the sorted arrays contiguously, so `off` is a valid
    # reduceat boundary list: segment i is [off[i], off[i+1]) (last to
    # end) == exactly block i
    # (max_tf, min_doc_len) -> per-block BM25 UPPER bound (block-max
    # WAND); (min_tf, max_doc_len) -> LOWER bound for the query layer's
    # no-decode top-k floor (wand._prefilter)
    max_tf = np.maximum.reduceat(tfs, off)
    min_tf = np.minimum.reduceat(tfs, off)
    min_dl = np.minimum.reduceat(dls, off)
    max_dl = np.maximum.reduceat(dls, off)
    return pd.DataFrame(
        {
            "term": pd.Series(terms[off], dtype="object"),
            "seg_id": pd.Series(np.full(off.size, seg_id, dtype=np.int32), dtype="int32"),
            "block_id": pd.Series(block_ids.astype(np.int32), dtype="int32"),
            "n": pd.Series((hi - off).astype(np.int32), dtype="int32"),
            "min_doc_id": pd.Series(doc_ids[off].astype(np.int64), dtype="int64"),
            "max_doc_id": pd.Series(doc_ids[hi - 1].astype(np.int64), dtype="int64"),
            "max_tf": pd.Series(max_tf.astype(np.int32), dtype="int32"),
            "min_doc_len": pd.Series(min_dl.astype(np.int32), dtype="int32"),
            "min_tf": pd.Series(min_tf.astype(np.int32), dtype="int32"),
            "max_doc_len": pd.Series(max_dl.astype(np.int32), dtype="int32"),
            "doc_ids": pd.Series(
                [enc_ids(doc_ids[o:h]) for o, h in zip(off, hi)], dtype="object"
            ),
            "tfs": pd.Series(
                [enc_vals(tfs[o:h]) for o, h in zip(off, hi)], dtype="object"
            ),
            "doc_lens": pd.Series(
                [enc_vals(dls[o:h]) for o, h in zip(off, hi)], dtype="object"
            ),
        }
    )


def build_postings(
    docs: DataFrame,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    term_buckets: int = DEFAULT_TERM_BUCKETS,
    num_segments: int = DEFAULT_NUM_SEGMENTS,
    mode: str = "overwrite",
    build_blocks: bool = True,
    with_positions: bool = False,
    block_codec: str = "pfor",
    batch_id: int | None = None,
) -> None:
    """One build pass over ``docs``.

    BATCH (``batch_id=None``): writes ONLY ``postings/`` (per-doc
    sentinel rows included) in a single persist-free lineage;
    ``finalize_stats`` derives doc_stats/blocks/term_stats from the
    written parquet with column-pruned re-reads. ``build_blocks`` /
    ``num_segments`` are ignored on this path — pass them to
    ``finalize_stats`` (or use ``build_index``, which wires both).

    STREAMING (``batch_id=N``): one persisted pass writes every
    per-batch table (postings, doc_stats, term-df deltas, batch_stats,
    blocks). ``batch_id`` makes the pass IDEMPOTENT: every
    table gains a leading ``batch_id`` partition and is written with
    dynamic partition-overwrite, so a replayed micro-batch (crash after
    the data write, before the commit record) REPLACES its own
    partitions instead of appending duplicate postings. It also writes
    this batch's term-df deltas into ``term_stats/batch_id=N/`` — the
    batch-scoped groupBy replaces the full-index re-aggregation that
    made per-batch stats O(index size); readers SUM df across batch
    runs (a few rows per query term).
    """
    # Guard against under-partitioned input (e.g. one small parquet file
    # = ONE scan partition): tokenization is the dominant cost and runs
    # in the scan stage, so low input parallelism serializes the whole
    # build no matter how many cores exist. A well-partitioned Iceberg
    # table at real scale passes through untouched (a blind repartition
    # of 10^12 rows would be a catastrophic extra shuffle).
    from gopensearch_spark.util import ensure_parallelism

    docs = ensure_parallelism(docs)
    out_dir = resolve_index_dir(out_dir)  # write into the live generation
    # per-doc sentinels (term NULL) spread by doc hash so they never
    # concentrate in one repartition key / one output dir
    bucket_expr = (
        F.when(
            F.col("term").isNull(),
            F.pmod(F.xxhash64("doc_id"), F.lit(term_buckets)),
        )
        .otherwise(F.pmod(F.xxhash64("term"), F.lit(term_buckets)))
        .cast("int")
    )
    flat = _flat_postings(
        docs, text_col, id_col, with_positions=with_positions
    ).withColumn("term_bucket", bucket_expr)

    if batch_id is None:
        # BATCH path: SINGLE-PASS. One lineage — tokenize -> shuffle by
        # term_bucket -> sort (term, doc_id) -> parquet — with no
        # persist/cache: at 10^8+ docs a persisted flat relation (posting
        # rows + position bytes) spills far past executor storage memory,
        # and that disk traffic is exactly what stops the build scaling
        # with cores (measured: 2->8 core efficiency fell 0.81 -> 0.57
        # between 800k and 6M docs with the old persist+re-consume
        # design). doc_stats, blocks, and term_stats all derive from the
        # WRITTEN postings parquet in ``finalize_stats`` — column-pruned
        # re-reads (never the position bytes) instead of cache hits.
        # Sentinel rows ride along in the postings table; NULLS-FIRST
        # sorting clusters them at each file's head so the doc_stats
        # filter scan row-group-skips the rest.
        (
            flat.repartition(term_buckets, "term_bucket")
            .sortWithinPartitions("term", "doc_id")
            .write.mode(mode)
            .partitionBy("term_bucket")
            .parquet(os.path.join(out_dir, "postings"))
        )
        return

    # STREAMING micro-batch path: batches are small (bounded by the
    # trigger), so one persist + multi-consumer fan-out is cheap and
    # keeps every per-batch table (postings, doc_stats, term-df deltas,
    # batch_stats, blocks) in a single pass over the batch.
    flat = flat.withColumn("batch_id", F.lit(int(batch_id)))
    mode = "overwrite"  # dynamic: replaces only this batch's partitions

    def writer(df):
        w = df.write.mode(mode)
        return w.option("partitionOverwriteMode", "dynamic")

    post_parts = ["batch_id", "term_bucket"]
    flat.persist()
    posts = flat.where(F.col("term").isNotNull())
    try:
        (
            writer(
                posts.repartition(term_buckets, "term_bucket")
                .sortWithinPartitions("term", "doc_id")
            )
            .partitionBy(*post_parts)
            .parquet(os.path.join(out_dir, "postings"))
        )
        # per-doc sentinel filter — one row per doc by construction, no
        # dropDuplicates shuffle over per-(doc, term) rows
        doc_stats = flat.where(F.col("term").isNull()).select(
            "doc_id", "doc_len", "batch_id"
        )
        writer(doc_stats).partitionBy("batch_id").parquet(
            os.path.join(out_dir, "doc_stats")
        )
        # batch-scoped term-df deltas (see docstring); clustered by the
        # partition column so each bucket dir gets ONE file per batch
        (
            writer(posts.groupBy("batch_id", "term_bucket", "term")
                   .agg(F.count("*").alias("df"))
                   .repartition(term_buckets, *post_parts))
            .partitionBy(*post_parts)
            .parquet(os.path.join(out_dir, "term_stats"))
        )
        # batch-scoped corpus-stat delta: ONE row (n_docs,
        # total_tokens) per batch, aggregated from the in-memory
        # persisted postings — never a scan of other batches.
        # fold_corpus_stats sums these rows (O(#batches), not
        # O(total docs)) to refresh N/avgdl per micro-batch; the
        # dynamic partition overwrite keeps replays idempotent.
        (
            writer(
                doc_stats.groupBy("batch_id").agg(
                    F.count("*").alias("n_docs"),
                    F.sum("doc_len").alias("total_tokens"),
                )
            )
            .partitionBy("batch_id")
            .parquet(os.path.join(out_dir, "batch_stats"))
        )
        if build_blocks:
            # blocks carry no positions — select only what the kernel
            # needs so position bytes never enter the segment shuffle.
            # Group by (seg_id, term_bucket), NOT seg_id alone: one task
            # then holds 1/(segments*buckets) of the postings instead of
            # a whole segment (1/32 of EVERYTHING — OOM at 10^12 docs).
            # Blocks are per (term, seg), and a term lives in exactly
            # one bucket, so the finer grouping changes nothing
            # semantically.
            seg = posts.select("doc_id", "doc_len", "term", "tf", "term_bucket").withColumn(
                "seg_id",
                F.pmod(F.xxhash64("doc_id"), F.lit(num_segments)).cast("int"),
            )
            blocks = seg.groupBy("seg_id", "term_bucket").applyInPandas(
                _make_segment_blocks_kernel(block_codec), schema=BLOCKS_SCHEMA
            ).withColumn(
                "term_bucket",
                F.pmod(F.xxhash64("term"), F.lit(term_buckets)).cast("int"),
            ).withColumn("batch_id", F.lit(int(batch_id)))
            (
                writer(blocks.repartition(term_buckets, *post_parts))
                .partitionBy(*post_parts)
                .parquet(os.path.join(out_dir, "blocks"))
            )
    finally:
        flat.unpersist()


def _write_blocks_from_postings(
    spark: SparkSession,
    postings_path: str,
    blocks_path: str,
    term_buckets: int,
    num_segments: int,
    block_codec: str = "pfor",
    batch_id: int | None = None,
) -> None:
    """Blocks derived from the WRITTEN postings parquet.

    Column-pruned read (doc_id, doc_len, term, tf, term_bucket — never
    the position bytes; parquet's columnar layout skips them on disk),
    sentinels filtered, then the (seg_id, term_bucket) grouped kernel.
    The explicit ``repartition(K, seg_id, term_bucket)`` sizes the
    shuffle by DATA (one partition per term_bucket floor), not by
    ``spark.sql.shuffle.partitions``: with the session default (~1 per
    core) each reduce task would hold corpus_size/cores posting rows —
    the per-task sort/group spill that erased core scaling at 6M docs.
    HashPartitioning(seg_id, term_bucket, K) satisfies the groupBy's
    clustering requirement, so no second shuffle is added.

    Grouping by (seg_id, term_bucket), NOT seg_id alone, keeps one task
    at 1/(segments*buckets) of the postings — a Zipf-head term is
    processed as ``num_segments`` independent tasks (the north rule's
    explicit skew split), never one giant one.
    """
    posts = (
        spark.read.parquet(postings_path)
        .where(F.col("term").isNotNull())
        .select("doc_id", "doc_len", "term", "tf", "term_bucket")
    )
    k = max(spark.sparkContext.defaultParallelism, term_buckets)
    blocks = (
        posts.withColumn(
            "seg_id", F.pmod(F.xxhash64("doc_id"), F.lit(num_segments)).cast("int")
        )
        .repartition(k, "seg_id", "term_bucket")
        .groupBy("seg_id", "term_bucket")
        .applyInPandas(_make_segment_blocks_kernel(block_codec), schema=BLOCKS_SCHEMA)
        .withColumn(
            "term_bucket", F.pmod(F.xxhash64("term"), F.lit(term_buckets)).cast("int")
        )
    )
    parts = ["term_bucket"]
    if batch_id is not None:
        blocks = blocks.withColumn("batch_id", F.lit(int(batch_id)))
        parts = ["batch_id", "term_bucket"]
    # cluster by the partition column before the partitioned write: the
    # kernel's (seg_id, term_bucket) tasks each hold rows of EVERY
    # term_bucket, so a direct write fans out tasks x buckets tiny files
    # (512 commits at bench scale — the write dominated the whole blocks
    # phase). One task per bucket writes one file per dir instead; the
    # blocks relation is ~1/BLOCK_SIZE of the postings, so this shuffle
    # is noise next to the kernel exchange it follows.
    blocks = blocks.repartition(term_buckets, *parts)
    blocks.write.mode("overwrite").partitionBy(*parts).parquet(blocks_path)


def finalize_stats(
    spark: SparkSession,
    out_dir: str,
    term_buckets: int = DEFAULT_TERM_BUCKETS,
    with_positions: bool = False,
    block_codec: str = "pfor",
    num_segments: int = DEFAULT_NUM_SEGMENTS,
    build_blocks: bool = True,
    derive_doc_stats: bool | None = None,
) -> dict:
    """Derive every secondary table from the written postings parquet:
    doc_stats (per-doc sentinel filter scan), blocks (pruned re-read +
    segment kernel), term_stats (the only unavoidable full groupBy —
    map-side combined), then corpus N/avgdl and the sorted term_dict.

    ``derive_doc_stats=None`` probes the postings table for sentinel
    rows (one pushdown ``term IS NULL`` row fetch): a fresh batch build
    always has them; a compacted index (sentinels dropped at merge, the
    doc_stats table authoritative) or a pre-sentinel layout keeps its
    existing doc_stats untouched.

    Streaming ingest does NOT use this — build_postings(batch_id=N)
    writes batch-scoped term deltas and ``fold_corpus_stats`` folds
    O(#batches) delta rows, so micro-batch stats never rescan the index.
    """
    out_dir = resolve_index_dir(out_dir)
    postings_path = os.path.join(out_dir, "postings")
    postings = spark.read.parquet(postings_path)
    sentinels = postings.where(F.col("term").isNull())
    if derive_doc_stats is None:
        derive_doc_stats = bool(sentinels.select("doc_id").take(1))
    if derive_doc_stats:
        (
            sentinels.select("doc_id", "doc_len")
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, "doc_stats"))
        )
    if build_blocks:
        _write_blocks_from_postings(
            spark,
            postings_path,
            os.path.join(out_dir, "blocks"),
            term_buckets=term_buckets,
            num_segments=num_segments,
            block_codec=block_codec,
        )
    (
        postings.where(F.col("term").isNotNull())
        .groupBy("term", "term_bucket")
        .agg(F.count("*").alias("df"))
        # one writer task per bucket dir (see _write_blocks_from_postings:
        # an unclustered partitioned write commits tasks x buckets files)
        .repartition(term_buckets, "term_bucket")
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(os.path.join(out_dir, "term_stats"))
    )
    stats = refresh_corpus_stats(
        spark, out_dir, term_buckets=term_buckets,
        with_positions=with_positions, block_codec=block_codec,
    )
    rebuild_term_dict(spark, out_dir, n_docs=stats["n_docs"])
    return stats


def rebuild_term_dict(spark: SparkSession, out_dir: str, n_docs: int) -> None:
    """(term, df) dictionary, RANGE-partitioned and sorted by term.

    The hash term_bucket layout cannot prune a PREFIX query; this small
    side table can (parquet min/max on sorted runs answers
    `term LIKE 'p%'` with file/row-group skipping), and the matching
    terms' bucket set then prunes the postings scan — see
    search/phrase.prefix_match. Size = distinct terms, O(GB) even at web
    scale. Cost = one groupBy over term_stats (df-delta rows, tiny next
    to postings), so streaming ingest rebuilds it EVERY micro-batch and
    prefix queries partition-prune on streaming indexes too.

    ``_meta.json`` records the corpus n_docs the dict was built against;
    prefix_match compares it with corpus_stats.json and falls back to
    the full postings scan when postings are newer than the dict (e.g. a
    crash between the stats fold and this rebuild, or a raw
    build_postings append without finalize) — a stale dict must degrade
    to a slower plan, never silently drop matching terms."""
    out_dir = resolve_index_dir(out_dir)
    (
        spark.read.parquet(os.path.join(out_dir, "term_stats"))
        .groupBy("term")
        .agg(F.sum("df").alias("df"))
        .repartitionByRange(8, "term")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "term_dict"))
    )
    tmp = os.path.join(out_dir, "term_dict", "_meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump({"n_docs": int(n_docs)}, f)
    os.replace(tmp, os.path.join(out_dir, "term_dict", "_meta.json"))


def read_term_dict_meta(out_dir: str) -> dict | None:
    path = os.path.join(resolve_index_dir(out_dir), "term_dict", "_meta.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def refresh_corpus_stats(
    spark: SparkSession,
    out_dir: str,
    term_buckets: int = DEFAULT_TERM_BUCKETS,
    with_positions: bool = False,
    block_codec: str = "pfor",
) -> dict:
    """N/avgdl/total_tokens from a FULL scan of doc_stats (one row per
    doc, never the postings) -> corpus_stats.json. This is the batch
    finalize/compaction path; streaming micro-batches use
    ``fold_corpus_stats`` (O(#batches) delta rows) instead."""
    out_dir = resolve_index_dir(out_dir)
    doc_stats = spark.read.parquet(os.path.join(out_dir, "doc_stats"))
    row = doc_stats.agg(
        F.count("*").alias("n_docs"),
        F.avg("doc_len").alias("avg_doc_len"),
        F.sum("doc_len").alias("total_tokens"),
    ).collect()[0]
    stats = {
        "n_docs": row["n_docs"],
        "avg_doc_len": float(row["avg_doc_len"] or 0.0),
        "total_tokens": int(row["total_tokens"] or 0),
        "term_buckets": term_buckets,
        "with_positions": with_positions,
        "block_codec": block_codec,
    }
    _write_corpus_stats(out_dir, stats)
    return stats


def _write_corpus_stats(out_dir: str, stats: dict) -> None:
    out_dir = resolve_index_dir(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    tmp = os.path.join(out_dir, "corpus_stats.json.tmp")
    with open(tmp, "w") as f:
        json.dump(stats, f)
    os.replace(tmp, os.path.join(out_dir, "corpus_stats.json"))


def fold_corpus_stats(
    spark: SparkSession,
    out_dir: str,
    term_buckets: int = DEFAULT_TERM_BUCKETS,
    with_positions: bool = False,
    block_codec: str = "pfor",
) -> dict:
    """Streaming-path stats refresh: sum the per-batch (n_docs,
    total_tokens) delta rows written by build_postings(batch_id=N) —
    O(#batches) rows, NEVER a re-aggregation of doc_stats (O(total
    docs) per micro-batch, the scale-killer at 10^12 docs). Idempotent:
    a replayed batch REPLACED its batch_stats partition, so the fold
    can never double-count.

    Self-healing: a doc_stats batch partition with no batch_stats row
    (an index written by a pre-delta version, or a crash between the
    two writes) would silently UNDERCOUNT the fold. Partition dirs are
    compared by listing (filesystem-cheap, O(#batches)) and any missing
    delta is backfilled from ONLY that batch's doc_stats partition.
    The listing goes through the Hadoop FileSystem API so it works on
    any scheme Spark can write to (local, HDFS, s3a://, gs://) —
    ``os.listdir`` would silently no-op on object-store URIs."""
    out_dir = resolve_index_dir(out_dir)

    def _batch_ids(table: str) -> set[int]:
        names = _list_dir(spark, os.path.join(out_dir, table))
        return {
            int(name.split("=", 1)[1])
            for name in names
            if name.startswith("batch_id=")
        }

    missing = _batch_ids("doc_stats") - _batch_ids("batch_stats")
    for b in sorted(missing):
        (
            spark.read.parquet(os.path.join(out_dir, "doc_stats"))
            .where(F.col("batch_id") == b)
            .groupBy("batch_id")
            .agg(F.count("*").alias("n_docs"), F.sum("doc_len").alias("total_tokens"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(os.path.join(out_dir, "batch_stats"))
        )
    # empty index (no batch partition ever written — e.g. every batch
    # empty, or nothing ingested yet): write honest zeros instead of
    # failing the parquet read / crashing on int(None) / dividing by 0
    if _batch_ids("batch_stats"):
        row = (
            spark.read.parquet(os.path.join(out_dir, "batch_stats"))
            .agg(
                F.sum("n_docs").alias("n_docs"),
                F.sum("total_tokens").alias("total_tokens"),
            )
            .collect()[0]
        )
        n_docs = int(row["n_docs"] or 0)
        total_tokens = int(row["total_tokens"] or 0)
    else:
        n_docs, total_tokens = 0, 0
    stats = {
        "n_docs": n_docs,
        "avg_doc_len": (total_tokens / n_docs) if n_docs else 0.0,
        "total_tokens": total_tokens,
        "term_buckets": term_buckets,
        "with_positions": with_positions,
        "block_codec": block_codec,
    }
    _write_corpus_stats(out_dir, stats)
    return stats


def _list_dir(spark: SparkSession, path: str) -> list[str]:
    """Child names of ``path`` via the Hadoop FileSystem API (scheme-
    aware: local paths, HDFS, s3a://, gs://); [] when absent. Falls back
    to os.listdir if the JVM gateway is unreachable (plain-Python use)."""
    try:
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(jpath):
            return []
        return [st.getPath().getName() for st in fs.listStatus(jpath)]
    except Exception:
        if not os.path.isdir(path):
            return []
        return os.listdir(path)


def read_corpus_stats(out_dir: str) -> dict:
    with open(os.path.join(resolve_index_dir(out_dir), "corpus_stats.json")) as f:
        return json.load(f)


def _ckpt_path(out_dir: str, slice_id: int) -> str:
    return os.path.join(out_dir, "_checkpoints", f"slice-{slice_id:05d}.json")


def completed_slices(out_dir: str) -> set[int]:
    d = os.path.join(out_dir, "_checkpoints")
    if not os.path.isdir(d):
        return set()
    done = set()
    for name in os.listdir(d):
        if name.startswith("slice-") and name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                rec = json.load(f)
            if rec.get("status") == "committed":
                done.add(rec["slice_id"])
    return done


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    slices: int = 1,
    term_buckets: int | None = None,
    num_segments: int | None = DEFAULT_NUM_SEGMENTS,
    build_blocks: bool = True,
    with_positions: bool = False,
    block_codec: str = "pfor",
    input_lineage: str = "",
) -> dict:
    """Full resumable build: slices -> postings -> derived tables + stats.

    Each slice is a doc_id hash class processed as its own distributed
    job and committed with a checkpoint record (lineage + metrics), so a
    crashed build resumes by skipping committed slices — the reference
    has no equivalent (its bulk ingest is a sequential HTTP loop,
    reference pkg/server/server.go:253-364). Per slice only the postings
    table is written (single-pass, persist-free); doc_stats/blocks/
    term_stats derive from the complete postings parquet in the finalize
    step — blocks in particular are built ONCE over all slices instead
    of per-slice incremental runs.

    ``num_segments=None`` / ``term_buckets=None`` (the default) size the
    segment and bucket counts from the corpus via
    ``recommended_num_segments`` / ``recommended_term_buckets`` (one
    shared count job): segments bound the query kernel's worst-case
    per-task postings, buckets bound the build's per-task sort — both
    must GROW with the corpus or per-task state eventually outruns each
    core's memory share and the build stops scaling. Pass explicit
    values to pin either.
    """
    n_docs_total = None
    if num_segments is None or term_buckets is None:
        n_docs_total = docs.count()
        if num_segments is None:
            num_segments = recommended_num_segments(
                n_docs_total, spark.sparkContext.defaultParallelism
            )
        if term_buckets is None:
            term_buckets = recommended_term_buckets(n_docs_total)
    os.makedirs(os.path.join(out_dir, "_checkpoints"), exist_ok=True)
    done = completed_slices(out_dir)
    for s in range(slices):
        if s in done:
            continue
        t0 = time.time()
        part = docs if slices == 1 else docs.where(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(slices)) == s
        )
        # single-slice builds that already counted for sizing reuse that
        # count for the checkpoint record instead of a second full pass
        n_docs = n_docs_total if (slices == 1 and n_docs_total is not None) else part.count()
        build_postings(
            part,
            out_dir,
            text_col=text_col,
            id_col=id_col,
            term_buckets=term_buckets,
            num_segments=num_segments,
            mode="overwrite" if (s == 0 and not done) else "append",
            build_blocks=build_blocks,
            with_positions=with_positions,
            block_codec=block_codec,
        )
        rec = {
            "slice_id": s,
            "status": "committed",
            "n_docs": n_docs,
            "input": input_lineage,
            "id_col": id_col,
            "text_col": text_col,
            "slices": slices,
            "elapsed_sec": round(time.time() - t0, 3),
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        tmp = _ckpt_path(out_dir, s) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, _ckpt_path(out_dir, s))
    stats = finalize_stats(
        spark, out_dir, term_buckets=term_buckets,
        with_positions=with_positions, block_codec=block_codec,
        num_segments=num_segments, build_blocks=build_blocks,
        derive_doc_stats=True,
    )
    from gopensearch_spark.search.readers import invalidate

    invalidate(out_dir)  # drop stale cached readers for this index
    return stats


CONSOLIDATED_BATCH_ID = -1  # partition value for compacted streaming runs


def compact_streaming_index(
    spark: SparkSession,
    index_dir: str,
    num_segments: int = DEFAULT_NUM_SEGMENTS,
) -> dict:
    """Compact a multi-batch STREAMING index in place — RENAME-FREE.

    Every micro-batch appends its own (term, seg) block runs and
    per-batch delta rows; after B batches a term's postings are spread
    over B sorted runs and df/stat lookups sum B delta rows. This merges
    everything back to one run per term — the same salted
    repartition-by-term + (seg_id, term_bucket) skew-split as
    ``compact_index`` — while KEEPING the ``batch_id`` partition axis
    (consolidated under ``batch_id=-1``) so the parquet layout stays
    consistent and FUTURE micro-batches keep appending under their own
    ``batch_id=N`` partitions:

    - postings/blocks/doc_stats/term_stats rewritten under
      ``batch_id=-1``; batch_stats collapses to ONE consolidated row, so
      ``fold_corpus_stats`` stays O(#batches-since-compaction);
    - doc_stats copied from the SOURCE doc_stats (zero-token docs stay
      in N/avgdl — FTS5 semantics);
    - ``_stream_batches`` commit records live at the index ROOT, outside
      any generation, so replayed batches still skip;
    - COMMIT = write the next generation dir ``<dir>/gen-{N+1}`` fully,
      then atomically write the ``_current`` pointer file. No directory
      rename anywhere — deployable on object stores (S3/GCS have no
      rename; a small pointer PUT is atomic). A crash mid-build leaves
      the pointer (and every reader) on the committed generation; the
      half-built dir is removed and rebuilt by the next attempt. The
      previous generation is kept for in-flight readers; generations
      older than that are deleted.

    Called manually or via ``start_streaming_index(compact_every=N)``.
    """
    import shutil

    src = resolve_index_dir(index_dir)
    gen = current_generation(index_dir)
    src_stats = read_corpus_stats(index_dir)
    term_buckets = src_stats["term_buckets"]
    block_codec = src_stats.get("block_codec", "varint")
    with_positions = bool(src_stats.get("with_positions"))
    dst = os.path.join(index_dir, f"gen-{gen + 1}")
    shutil.rmtree(dst, ignore_errors=True)  # junk from a crashed attempt

    cb = F.lit(int(CONSOLIDATED_BATCH_ID))
    # persist-free merge (same rationale as the batch build): the merged
    # postings are written once, then term_stats/blocks derive from the
    # WRITTEN parquet with column-pruned re-reads — a compaction input
    # is O(index), far past what a cached relation holds at scale.
    flat = (
        spark.read.parquet(os.path.join(src, "postings"))
        .where(F.col("term").isNotNull())  # batch-gen per-doc sentinels, if any
        .drop("batch_id", "term_bucket")
        .withColumn("term_bucket", F.pmod(F.xxhash64("term"), F.lit(term_buckets)).cast("int"))
        .withColumn("batch_id", cb)
    )
    (
        flat.repartition(term_buckets, "term_bucket")
        .sortWithinPartitions("term", "doc_id")
        .write.mode("overwrite")
        .partitionBy("batch_id", "term_bucket")
        .parquet(os.path.join(dst, "postings"))
    )
    # doc_stats from the SOURCE doc_stats table, not from postings:
    # zero-token docs have no posting rows but still count in
    # N/avgdl (FTS5 semantics) — rebuilding from postings would drop
    # them and shift every BM25 score across the compaction.
    doc_stats = (
        spark.read.parquet(os.path.join(src, "doc_stats"))
        .drop("batch_id")
        .dropDuplicates(["doc_id"])
        .withColumn("batch_id", cb)
    )
    doc_stats.write.mode("overwrite").partitionBy("batch_id").parquet(
        os.path.join(dst, "doc_stats")
    )
    (
        doc_stats.groupBy("batch_id")
        .agg(F.count("*").alias("n_docs"), F.sum("doc_len").alias("total_tokens"))
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .parquet(os.path.join(dst, "batch_stats"))
    )
    merged = spark.read.parquet(os.path.join(dst, "postings"))
    (
        merged.groupBy("batch_id", "term_bucket", "term")
        .agg(F.count("*").alias("df"))
        .write.mode("overwrite")
        .partitionBy("batch_id", "term_bucket")
        .parquet(os.path.join(dst, "term_stats"))
    )
    _write_blocks_from_postings(
        spark,
        os.path.join(dst, "postings"),
        os.path.join(dst, "blocks"),
        term_buckets=term_buckets,
        num_segments=num_segments,
        block_codec=block_codec,
        batch_id=CONSOLIDATED_BATCH_ID,
    )
    stats = fold_corpus_stats(
        spark, dst, term_buckets=term_buckets,
        with_positions=with_positions, block_codec=block_codec,
    )
    rebuild_term_dict(spark, dst, n_docs=stats["n_docs"])
    # THE commit: one atomic pointer write; everything before this line
    # is invisible to readers, everything after is cleanup
    _commit_generation(index_dir, gen + 1)
    _cleanup_old_generations(index_dir, gen + 1)
    from gopensearch_spark.search.readers import invalidate

    invalidate(index_dir)
    return stats


_TABLE_DIRS = ("postings", "blocks", "doc_stats", "term_stats", "batch_stats", "term_dict")


def _cleanup_old_generations(index_dir: str, committed_gen: int) -> None:
    """Keep the committed generation plus ONE predecessor (for in-flight
    readers); delete anything older. Generation 0 is the flat legacy
    layout — its table dirs live at the index root, so only those are
    removed (never ``_stream_batches``/``_checkpoints``/the pointer)."""
    import shutil

    for g in range(1, committed_gen - 1):
        shutil.rmtree(os.path.join(index_dir, f"gen-{g}"), ignore_errors=True)
    if committed_gen >= 2:  # flat layout is now two generations old
        for t in _TABLE_DIRS:
            shutil.rmtree(os.path.join(index_dir, t), ignore_errors=True)
        try:
            os.remove(os.path.join(index_dir, "corpus_stats.json"))
        except OSError:
            pass


def compact_index(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    term_buckets: int | None = None,
    num_segments: int = DEFAULT_NUM_SEGMENTS,
    block_codec: str | None = None,
) -> dict:
    """Merge a multi-slice (fragmented) index into one compacted index.

    Each resumable slice appends its own parquet files per term_bucket
    and its own (term, seg) block runs, so after S slices a term's
    postings are spread over S sorted runs. Compaction is the explicit
    salted segment merge of the north rule:

    - **salted repartition-by-term**: postings shuffle on
      ``term_bucket = pmod(xxhash64(term), B)`` and are re-sorted by
      (term, doc_id) within each bucket — one sorted run per term again.
    - **skew splitting for head terms**: blocks rebuild under the
      (seg_id, term_bucket) grouping, so a Zipf-head term (a stopword
      with ~N postings at 10^12 docs) is processed as ``num_segments``
      independent tasks, never one giant one.

    Writes a complete new index at ``dst_dir`` (postings, blocks,
    doc_stats, term_stats, corpus_stats) and leaves ``src_dir``
    untouched — swap-in is the caller's atomic rename.
    """
    src_stats = read_corpus_stats(src_dir)
    term_buckets = term_buckets or src_stats["term_buckets"]
    block_codec = block_codec or src_stats.get("block_codec", "varint")
    with_positions = bool(src_stats.get("with_positions"))

    # persist-free merge: write the re-sorted postings once, then derive
    # blocks/term_stats from the WRITTEN parquet (see build_postings)
    flat = (
        spark.read.parquet(os.path.join(src_dir, "postings"))
        .where(F.col("term").isNotNull())  # drop per-doc sentinels
        .withColumn(
            "term_bucket", F.pmod(F.xxhash64("term"), F.lit(term_buckets)).cast("int")
        )
    )
    (
        flat.repartition(term_buckets, "term_bucket")
        .sortWithinPartitions("term", "doc_id")
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(os.path.join(dst_dir, "postings"))
    )
    # source doc_stats, not postings-derived: preserves zero-token
    # docs' membership in N/avgdl (see compact_streaming_index)
    (
        spark.read.parquet(os.path.join(src_dir, "doc_stats"))
        .drop("batch_id")
        .dropDuplicates(["doc_id"])
        .write.mode("overwrite")
        .parquet(os.path.join(dst_dir, "doc_stats"))
    )
    stats = finalize_stats(
        spark, dst_dir, term_buckets=term_buckets,
        with_positions=with_positions, block_codec=block_codec,
        num_segments=num_segments, build_blocks=True,
        derive_doc_stats=False,
    )
    from gopensearch_spark.search.readers import invalidate

    invalidate(dst_dir)
    return stats
