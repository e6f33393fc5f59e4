"""Inverted-index builder: tokenize -> postings -> compressed blocks.

Reimplements from scratch what the reference outsources to SQLite FTS5
(virtual-table creation at reference pkg/server/db.go:46-54; tokenize +
posting-list maintenance happen inside SQLite on every INSERT,
db.go:16-17). Spark-first design:

- **tokenize**: Arrow-vectorized pandas UDF producing a term->tf map per
  doc. Computing tf inside the UDF (instead of explode + groupBy) removes
  the (term, doc_id) pre-aggregation shuffle entirely — partial counts
  never leave the input partition.
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
  A re-run skips committed slices (tests/test_checkpoint.py).
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
from gopensearch_spark.analysis import term_freqs_udf

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

    With positions (FTS5 detail=full analogue, needed for phrase
    queries) the tokenizer emits term->positions maps; tf and doc_len
    derive from them, and per-posting position lists are delta+varint
    encoded into a binary column before anything shuffles.
    """
    if with_positions:
        from gopensearch_spark.analysis import encode_positions_udf, term_positions_udf

        base = docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            term_positions_udf(F.col(text_col)).alias("pos_map"),
        ).withColumn(
            "doc_len",
            F.aggregate(F.map_values("pos_map"), F.lit(0), lambda a, b: a + F.size(b)),
        )
        return base.select(
            "doc_id", "doc_len", F.explode("pos_map").alias("term", "pos_arr")
        ).select(
            "doc_id",
            "doc_len",
            "term",
            F.size("pos_arr").alias("tf"),
            encode_positions_udf("pos_arr").alias("positions"),
        )
    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        term_freqs_udf(F.col(text_col)).alias("tf_map"),
    ).withColumn(
        "doc_len",
        F.aggregate(F.map_values("tf_map"), F.lit(0), lambda a, b: a + b),
    )
    return base.select(
        "doc_id", "doc_len", F.explode("tf_map").alias("term", "tf")
    )


def _build_segment_blocks(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas kernel: one segment's flat postings -> block rows.

    Sort by (term, doc_id) with numpy, find term boundaries, delta+varint
    encode each term's ids/tfs/doc_lens in BLOCK_SIZE chunks.
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
            ids_b, tfs_b = codecs.encode_postings(doc_ids[off:hi], tfs[off:hi])
            dls_b = codecs.varint_encode(dls[off:hi])
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
) -> None:
    """One build pass over ``docs`` -> postings/, blocks/, doc_stats/."""
    flat = _flat_postings(docs, text_col, id_col, with_positions=with_positions).withColumn(
        "term_bucket", F.pmod(F.xxhash64("term"), F.lit(term_buckets)).cast("int")
    )
    # Materialize flat postings once; both outputs derive from it.
    flat.persist()
    try:
        (
            flat.repartition(term_buckets, "term_bucket")
            .sortWithinPartitions("term", "doc_id")
            .write.mode(mode)
            .partitionBy("term_bucket")
            .parquet(os.path.join(out_dir, "postings"))
        )
        (
            flat.select("doc_id", "doc_len")
            .dropDuplicates(["doc_id"])
            .write.mode(mode)
            .parquet(os.path.join(out_dir, "doc_stats"))
        )
        if build_blocks:
            # blocks carry no positions — select only what the kernel
            # needs so position bytes never enter the segment shuffle
            seg = flat.select("doc_id", "doc_len", "term", "tf").withColumn(
                "seg_id",
                F.pmod(F.xxhash64("doc_id"), F.lit(num_segments)).cast("int"),
            )
            blocks = seg.groupBy("seg_id").applyInPandas(
                _build_segment_blocks, schema=BLOCKS_SCHEMA
            ).withColumn(
                "term_bucket",
                F.pmod(F.xxhash64("term"), F.lit(term_buckets)).cast("int"),
            )
            (
                blocks.write.mode(mode)
                .partitionBy("term_bucket")
                .parquet(os.path.join(out_dir, "blocks"))
            )
    finally:
        flat.unpersist()


def finalize_stats(
    spark: SparkSession,
    out_dir: str,
    term_buckets: int = DEFAULT_TERM_BUCKETS,
    with_positions: bool = False,
) -> dict:
    """Global stats after all slices: term df + corpus N/avgdl.

    One groupBy over the postings table (the only unavoidable full
    shuffle of the build); df counts are map-side combined by Spark's
    partial hash aggregation.
    """
    postings = spark.read.parquet(os.path.join(out_dir, "postings"))
    (
        postings.groupBy("term", "term_bucket")
        .agg(F.count("*").alias("df"))
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(os.path.join(out_dir, "term_stats"))
    )
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
    }
    with open(os.path.join(out_dir, "corpus_stats.json"), "w") as f:
        json.dump(stats, f)
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
    return finalize_stats(spark, out_dir, term_buckets=term_buckets, with_positions=with_positions)
