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
DEFAULT_NUM_SEGMENTS = 32   # doc-hash segments for the block index

BLOCKS_SCHEMA = (
    "term string, seg_id int, block_id int, n int, "
    "min_doc_id long, max_doc_id long, max_tf int, min_doc_len int, "
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
    """
    from gopensearch_spark.analysis import term_positions

    schema = "doc_id long, doc_len int, term string, tf int" + (
        ", positions binary" if with_positions else ""
    )

    def flatten(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, dls, terms, tfs, pos_flat = [], [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                pos = term_positions(text if text is not None else "")
                dl = sum(len(p) for p in pos.values())
                for t, p in pos.items():
                    ids.append(doc_id)
                    dls.append(dl)
                    terms.append(t)
                    tfs.append(len(p))
                    if with_positions:
                        pos_flat.extend(p)
            out = {
                "doc_id": pd.Series(ids, dtype="int64"),
                "doc_len": pd.Series(dls, dtype="int32"),
                "term": pd.Series(terms, dtype="object"),
                "tf": pd.Series(tfs, dtype="int32"),
            }
            if with_positions:
                # one vectorized encode for the whole batch (tf == list len)
                out["positions"] = pd.Series(
                    codecs.delta_encode_chunks(
                        np.asarray(pos_flat, dtype=np.uint64),
                        np.asarray(tfs, dtype=np.int64),
                    ),
                    dtype="object",
                )
            yield pd.DataFrame(out)

    return docs.select(
        F.col(id_col).cast("long").alias(id_col), F.col(text_col)
    ).mapInPandas(flatten, schema)


def _encoders(block_codec: str):
    """(ids_encode, vals_encode) for a block codec name."""
    if block_codec == "pfor":
        return codecs.delta_pfor_encode, codecs.pfor_encode
    if block_codec == "varint":
        return codecs.delta_encode, codecs.varint_encode
    raise ValueError(f"unknown block codec {block_codec!r}")


def _make_segment_blocks_kernel(block_codec: str = "varint"):
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

    rows = []
    for s, e in zip(starts, ends):
        term = terms[s]
        for b, off in enumerate(range(s, e, BLOCK_SIZE)):
            hi = min(off + BLOCK_SIZE, e)
            ids_b = enc_ids(doc_ids[off:hi])
            tfs_b = enc_vals(tfs[off:hi])
            dls_b = enc_vals(dls[off:hi])
            rows.append(
                (
                    term,
                    seg_id,
                    b,
                    hi - off,
                    int(doc_ids[off]),
                    int(doc_ids[hi - 1]),
                    int(tfs[off:hi].max()),
                    int(dls[off:hi].min()),
                    ids_b,
                    tfs_b,
                    dls_b,
                )
            )
    return pd.DataFrame(
        rows,
        columns=[
            "term", "seg_id", "block_id", "n", "min_doc_id", "max_doc_id",
            "max_tf", "min_doc_len", "doc_ids", "tfs", "doc_lens",
        ],
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
    block_codec: str = "varint",
    batch_id: int | None = None,
) -> None:
    """One build pass over ``docs`` -> postings/, blocks/, doc_stats/.

    ``batch_id`` (streaming ingest) makes the pass IDEMPOTENT: every
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
    flat = _flat_postings(docs, text_col, id_col, with_positions=with_positions).withColumn(
        "term_bucket", F.pmod(F.xxhash64("term"), F.lit(term_buckets)).cast("int")
    )
    if batch_id is not None:
        flat = flat.withColumn("batch_id", F.lit(int(batch_id)))
        mode = "overwrite"  # dynamic: replaces only this batch's partitions

    def writer(df):
        w = df.write.mode(mode)
        return w.option("partitionOverwriteMode", "dynamic") if batch_id is not None else w

    post_parts = (["batch_id"] if batch_id is not None else []) + ["term_bucket"]
    # Materialize flat postings once; all outputs derive from it.
    flat.persist()
    try:
        (
            writer(
                flat.repartition(term_buckets, "term_bucket")
                .sortWithinPartitions("term", "doc_id")
            )
            .partitionBy(*post_parts)
            .parquet(os.path.join(out_dir, "postings"))
        )
        doc_stats = flat.select(
            "doc_id", "doc_len", *(["batch_id"] if batch_id is not None else [])
        ).dropDuplicates(["doc_id"])
        w = writer(doc_stats)
        if batch_id is not None:
            w = w.partitionBy("batch_id")
        w.parquet(os.path.join(out_dir, "doc_stats"))
        if batch_id is not None:
            # batch-scoped term-df deltas (see docstring)
            (
                writer(flat.groupBy("batch_id", "term_bucket", "term").agg(F.count("*").alias("df")))
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
            seg = flat.select("doc_id", "doc_len", "term", "tf", "term_bucket").withColumn(
                "seg_id",
                F.pmod(F.xxhash64("doc_id"), F.lit(num_segments)).cast("int"),
            )
            blocks = seg.groupBy("seg_id", "term_bucket").applyInPandas(
                _make_segment_blocks_kernel(block_codec), schema=BLOCKS_SCHEMA
            ).withColumn(
                "term_bucket",
                F.pmod(F.xxhash64("term"), F.lit(term_buckets)).cast("int"),
            )
            if batch_id is not None:
                blocks = blocks.withColumn("batch_id", F.lit(int(batch_id)))
            (
                writer(blocks)
                .partitionBy(*post_parts)
                .parquet(os.path.join(out_dir, "blocks"))
            )
    finally:
        flat.unpersist()


def finalize_stats(
    spark: SparkSession,
    out_dir: str,
    term_buckets: int = DEFAULT_TERM_BUCKETS,
    with_positions: bool = False,
    block_codec: str = "varint",
) -> dict:
    """Global stats after all slices: term df + corpus N/avgdl.

    One groupBy over the postings table (the only unavoidable full
    shuffle of the build); df counts are map-side combined by Spark's
    partial hash aggregation. Streaming ingest does NOT use this —
    build_postings(batch_id=N) writes batch-scoped term deltas and
    ``refresh_corpus_stats`` derives N/avgdl from doc_stats, so each
    micro-batch's stats cost scans only that batch's postings.
    """
    postings = spark.read.parquet(os.path.join(out_dir, "postings"))
    (
        postings.groupBy("term", "term_bucket")
        .agg(F.count("*").alias("df"))
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
    path = os.path.join(out_dir, "term_dict", "_meta.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def refresh_corpus_stats(
    spark: SparkSession,
    out_dir: str,
    term_buckets: int = DEFAULT_TERM_BUCKETS,
    with_positions: bool = False,
    block_codec: str = "varint",
) -> dict:
    """N/avgdl/total_tokens from a FULL scan of doc_stats (one row per
    doc, never the postings) -> corpus_stats.json. This is the batch
    finalize/compaction path; streaming micro-batches use
    ``fold_corpus_stats`` (O(#batches) delta rows) instead."""
    doc_stats = spark.read.parquet(os.path.join(out_dir, "doc_stats"))
    row = doc_stats.agg(
        F.count("*").alias("n_docs"),
        F.avg("doc_len").alias("avg_doc_len"),
        F.sum("doc_len").alias("total_tokens"),
    ).collect()[0]
    stats = {
        "n_docs": row["n_docs"],
        "avg_doc_len": float(row["avg_doc_len"]),
        "total_tokens": row["total_tokens"],
        "term_buckets": term_buckets,
        "with_positions": with_positions,
        "block_codec": block_codec,
    }
    _write_corpus_stats(out_dir, stats)
    return stats


def _write_corpus_stats(out_dir: str, stats: dict) -> None:
    tmp = os.path.join(out_dir, "corpus_stats.json.tmp")
    with open(tmp, "w") as f:
        json.dump(stats, f)
    os.replace(tmp, os.path.join(out_dir, "corpus_stats.json"))


def fold_corpus_stats(
    spark: SparkSession,
    out_dir: str,
    term_buckets: int = DEFAULT_TERM_BUCKETS,
    with_positions: bool = False,
    block_codec: str = "varint",
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
    delta is backfilled from ONLY that batch's doc_stats partition."""

    def _batch_ids(table: str) -> set[int]:
        d = os.path.join(out_dir, table)
        if not os.path.isdir(d):
            return set()
        return {
            int(name.split("=", 1)[1])
            for name in os.listdir(d)
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
    row = (
        spark.read.parquet(os.path.join(out_dir, "batch_stats"))
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("total_tokens").alias("total_tokens"),
        )
        .collect()[0]
    )
    stats = {
        "n_docs": int(row["n_docs"]),
        "avg_doc_len": row["total_tokens"] / row["n_docs"],
        "total_tokens": int(row["total_tokens"]),
        "term_buckets": term_buckets,
        "with_positions": with_positions,
        "block_codec": block_codec,
    }
    _write_corpus_stats(out_dir, stats)
    return stats


def read_corpus_stats(out_dir: str) -> dict:
    with open(os.path.join(out_dir, "corpus_stats.json")) as f:
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
    term_buckets: int = DEFAULT_TERM_BUCKETS,
    num_segments: int = DEFAULT_NUM_SEGMENTS,
    build_blocks: bool = True,
    with_positions: bool = False,
    block_codec: str = "varint",
    input_lineage: str = "",
) -> dict:
    """Full resumable build: slices -> postings/blocks -> global stats.

    Each slice is a doc_id hash class processed as its own distributed
    job and committed with a checkpoint record (lineage + metrics), so a
    crashed build resumes by skipping committed slices — the reference
    has no equivalent (its bulk ingest is a sequential HTTP loop,
    reference pkg/server/server.go:253-364).
    """
    os.makedirs(os.path.join(out_dir, "_checkpoints"), exist_ok=True)
    done = completed_slices(out_dir)
    for s in range(slices):
        if s in done:
            continue
        t0 = time.time()
        part = docs if slices == 1 else docs.where(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(slices)) == s
        )
        n_docs = part.count()
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
    """Compact a multi-batch STREAMING index in place (atomic-ish swap).

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
    - ``_stream_batches`` commit records are preserved across the swap
      (replayed batches still skip);
    - swap = build ``<dir>.compact`` fully, rename the old dir aside,
      rename the new one in, delete the old. A crash between the two
      renames leaves ``<dir>.pre_compact`` on disk for manual recovery —
      the compacted data is never destructively overwritten in place.

    Called manually or via ``start_streaming_index(compact_every=N)``.
    """
    import shutil

    src_stats = read_corpus_stats(index_dir)
    term_buckets = src_stats["term_buckets"]
    block_codec = src_stats.get("block_codec", "varint")
    with_positions = bool(src_stats.get("with_positions"))
    dst = index_dir + ".compact"
    shutil.rmtree(dst, ignore_errors=True)

    cb = F.lit(int(CONSOLIDATED_BATCH_ID))
    flat = (
        spark.read.parquet(os.path.join(index_dir, "postings"))
        .drop("batch_id", "term_bucket")
        .withColumn("term_bucket", F.pmod(F.xxhash64("term"), F.lit(term_buckets)).cast("int"))
        .withColumn("batch_id", cb)
    )
    flat.persist()
    try:
        (
            flat.repartition(term_buckets, "term_bucket")
            .sortWithinPartitions("term", "doc_id")
            .write.mode("overwrite")
            .partitionBy("batch_id", "term_bucket")
            .parquet(os.path.join(dst, "postings"))
        )
        doc_stats = flat.select("doc_id", "doc_len", "batch_id").dropDuplicates(["doc_id"])
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
        (
            flat.groupBy("batch_id", "term_bucket", "term")
            .agg(F.count("*").alias("df"))
            .write.mode("overwrite")
            .partitionBy("batch_id", "term_bucket")
            .parquet(os.path.join(dst, "term_stats"))
        )
        seg = flat.select("doc_id", "doc_len", "term", "tf", "term_bucket").withColumn(
            "seg_id", F.pmod(F.xxhash64("doc_id"), F.lit(num_segments)).cast("int")
        )
        (
            seg.groupBy("seg_id", "term_bucket")
            .applyInPandas(_make_segment_blocks_kernel(block_codec), schema=BLOCKS_SCHEMA)
            .withColumn("term_bucket", F.pmod(F.xxhash64("term"), F.lit(term_buckets)).cast("int"))
            .withColumn("batch_id", cb)
            .write.mode("overwrite")
            .partitionBy("batch_id", "term_bucket")
            .parquet(os.path.join(dst, "blocks"))
        )
    finally:
        flat.unpersist()
    stats = fold_corpus_stats(
        spark, dst, term_buckets=term_buckets,
        with_positions=with_positions, block_codec=block_codec,
    )
    rebuild_term_dict(spark, dst, n_docs=stats["n_docs"])
    # preserve streaming commit records + slice checkpoints across the swap
    for meta in ("_stream_batches", "_checkpoints"):
        src_meta = os.path.join(index_dir, meta)
        if os.path.isdir(src_meta):
            shutil.copytree(src_meta, os.path.join(dst, meta))
    old = index_dir + ".pre_compact"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(index_dir, old)
    os.rename(dst, index_dir)
    shutil.rmtree(old)
    from gopensearch_spark.search.readers import invalidate

    invalidate(index_dir)
    return stats


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

    flat = spark.read.parquet(os.path.join(src_dir, "postings")).withColumn(
        "term_bucket", F.pmod(F.xxhash64("term"), F.lit(term_buckets)).cast("int")
    )
    flat.persist()
    try:
        (
            flat.repartition(term_buckets, "term_bucket")
            .sortWithinPartitions("term", "doc_id")
            .write.mode("overwrite")
            .partitionBy("term_bucket")
            .parquet(os.path.join(dst_dir, "postings"))
        )
        (
            flat.select("doc_id", "doc_len")
            .dropDuplicates(["doc_id"])
            .write.mode("overwrite")
            .parquet(os.path.join(dst_dir, "doc_stats"))
        )
        seg = flat.select("doc_id", "doc_len", "term", "tf", "term_bucket").withColumn(
            "seg_id", F.pmod(F.xxhash64("doc_id"), F.lit(num_segments)).cast("int")
        )
        (
            seg.groupBy("seg_id", "term_bucket")
            .applyInPandas(_make_segment_blocks_kernel(block_codec), schema=BLOCKS_SCHEMA)
            .withColumn("term_bucket", F.pmod(F.xxhash64("term"), F.lit(term_buckets)).cast("int"))
            .write.mode("overwrite")
            .partitionBy("term_bucket")
            .parquet(os.path.join(dst_dir, "blocks"))
        )
    finally:
        flat.unpersist()
    stats = finalize_stats(
        spark, dst_dir, term_buckets=term_buckets,
        with_positions=with_positions, block_codec=block_codec,
    )
    from gopensearch_spark.search.readers import invalidate

    invalidate(dst_dir)
    return stats
