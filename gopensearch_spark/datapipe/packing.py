"""Sequence packing: assign documents to fixed-token-budget packs.

Training pipelines batch documents into packs of ~``budget`` tokens
(sequence packing for LLM pre-training). The assignment here is the
deterministic streaming pack: documents in ``id_col`` order, pack_id =
exclusive-prefix-token-count // budget — the same doc always lands in
the same pack regardless of partitioning or cluster size.

The global running sum is a DISTRIBUTED two-pass prefix sum, not a
single-partition window (``Window.orderBy`` without partitionBy pulls
10^12 rows through ONE task — the classic anti-pattern):

1. assign each row a DETERMINISTIC partition id ``pid`` by searching a
   driver-collected boundary list (approxQuantile over the id column),
   and aggregate one token-total row per pid (driver holds #pids rows,
   never data);
2. broadcast the exclusive per-pid offsets back, hash-repartition by
   pid, and compute the within-pid cumulative sum in an Arrow-batched
   kernel.

Determinism is by construction, not by luck: ``pid`` is a pure function
of the row's id against ONE collected boundary array, so the totals job
and the kernel job can never disagree about which rows a pid holds.
(The previous formulation stamped ``spark_partition_id()`` after
``repartitionByRange``, whose reservoir sampling is keyed to the
per-execution RDD id — two executions of the unpersisted relation could
place boundary docs in different partitions and silently miscount.)
Correctness also does not depend on WHERE the quantile boundaries land:
each doc's prefix sum equals the token total of all ids before it,
however the ids are grouped.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pack_sequences(
    df: DataFrame,
    budget: int,
    len_col: str = "n_tokens",
    id_col: str = "doc_id",
    num_parts: int | None = None,
) -> DataFrame:
    """(id, len) -> (id, len, pack_id) with pack_id = prefix_sum // budget.

    A document longer than ``budget`` straddles packs (it still gets
    exactly one pack_id — the pack its first token falls in), matching
    the greedy streaming packer a sequential trainer would run.

    ``id_col`` must be numeric (packing order is global id order; the
    deterministic boundary path quantile-samples the id domain).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    spark = df.sparkSession
    id_type = df.schema[id_col].dataType
    if not isinstance(id_type, T.NumericType):
        raise ValueError(
            f"pack_sequences needs a numeric id column; {id_col!r} is "
            f"{id_type.simpleString()} (map it to a numeric surrogate first)"
        )
    p = num_parts or spark.sparkContext.defaultParallelism * 2
    base = df.select(
        F.col(id_col).alias("id"), F.col(len_col).cast("long").alias("len")
    )

    # ONE driver-collected boundary list shared by both passes. Any
    # boundary set is correct (the math is placement-free); collecting
    # it once is what makes pid deterministic across the two jobs.
    bounds: list[float] = []
    if p > 1:
        fracs = [i / p for i in range(1, p)]
        bounds = sorted(base.stat.approxQuantile("id", fracs, 1.0 / (4 * p)))
    if bounds:
        barr = F.array(*[F.lit(float(b)) for b in bounds])
        pid_expr = F.size(
            F.filter(barr, lambda b: b <= F.col("id").cast("double"))
        ).cast("int")
    else:
        pid_expr = F.lit(0)
    parts = base.withColumn("pid", pid_expr)

    # pass 1: one (pid, total) row per pid — a groupBy on the VALUE,
    # independent of physical placement
    totals = {r["pid"]: r["t"] for r in parts.groupBy("pid").agg(F.sum("len").alias("t")).collect()}
    offsets = {}
    acc = 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    bc = spark.sparkContext.broadcast(offsets)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # running totals per pid, carried across Arrow batches of one
        # task (hash repartition can co-locate several pids per task;
        # sortWithinPartitions keeps each pid's rows contiguous)
        running: dict[int, int] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            lens = pdf["len"].to_numpy()
            pids = pdf["pid"].to_numpy()
            cum = lens.cumsum() - lens  # exclusive prefix within batch
            prefix = np.empty(len(pdf), dtype=np.int64)
            change = np.flatnonzero(pids[1:] != pids[:-1]) + 1
            starts = np.concatenate(([0], change))
            ends = np.concatenate((change, [len(pids)]))
            for s, e in zip(starts, ends):
                pid = int(pids[s])
                acc0 = running.get(pid)
                if acc0 is None:
                    acc0 = int(bc.value.get(pid, 0))
                prefix[s:e] = cum[s:e] - cum[s] + acc0
                running[pid] = acc0 + int(lens[s:e].sum())
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "len": pdf["len"],
                    "pack_id": prefix // budget,
                }
            )

    out = (
        parts.repartition(p, "pid")
        .sortWithinPartitions("pid", "id")
        .mapInPandas(kernel, "id long, len long, pack_id long")
    )
    return out.select(
        F.col("id").alias(id_col), F.col("len").alias(len_col), "pack_id"
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 256,
    stride: int | None = None,
) -> DataFrame:
    """Split documents into fixed-token chunks with optional overlap
    (the standard pre-tokenization step for LLM training data): chunk
    k covers whitespace tokens [k*stride, k*stride + chunk_tokens);
    ``stride`` defaults to ``chunk_tokens`` (disjoint). Emission stops
    with the first chunk that reaches the document's end, so every
    token is covered exactly once per stride window and no degenerate
    tail chunks are produced. Empty docs emit no chunks.

    Returns (id, chunk_id, chunk_text, n_tokens). Row fan-out happens
    inside an Arrow ``mapInPandas`` kernel — fully row-local, no
    shuffle, no intermediate array-of-chunks column; at 10^12 docs the
    output is a narrow map stage over the scan."""
    if stride is None:
        stride = chunk_tokens
    if chunk_tokens <= 0 or stride <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    id_field = df.schema[id_col]
    out_schema = T.StructType([
        id_field,
        T.StructField("chunk_id", T.IntegerType()),
        T.StructField("chunk_text", T.StringType()),
        T.StructField("n_tokens", T.IntegerType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, cids, texts, lens = [], [], [], []
            for did, s in zip(pdf[id_col], pdf[text_col]):
                toks = s.split(" ") if s else []
                n = len(toks)
                i, cid = 0, 0
                while i < n:
                    chunk = toks[i:i + chunk_tokens]
                    ids.append(did)
                    cids.append(cid)
                    texts.append(" ".join(chunk))
                    lens.append(len(chunk))
                    if i + chunk_tokens >= n:
                        break
                    i += stride
                    cid += 1
            yield pd.DataFrame({
                id_col: ids, "chunk_id": cids,
                "chunk_text": texts, "n_tokens": lens,
            })

    return df.select(id_col, text_col).mapInPandas(gen, out_schema)
