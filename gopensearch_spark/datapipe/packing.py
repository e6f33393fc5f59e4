"""Sequence packing: assign documents to fixed-token-budget packs.

Training pipelines batch documents into packs of ~``budget`` tokens
(sequence packing for LLM pre-training). The assignment here is the
deterministic streaming pack: documents in ``id_col`` order, pack_id =
exclusive-prefix-token-count // budget — the same doc always lands in
the same pack regardless of partitioning or cluster size.

The global running sum is a DISTRIBUTED two-pass prefix sum, not a
single-partition window (``Window.orderBy`` without partitionBy pulls
10^12 rows through ONE task — the classic anti-pattern):

1. range-partition by id and aggregate one token-total row per
   partition (driver holds #partitions rows, never data);
2. broadcast the exclusive per-partition offsets back and compute the
   within-partition cumulative sum in an Arrow-batched kernel.

Correctness does not depend on where the range boundaries land (the
sampler may place them differently across runs): each doc's prefix sum
equals the token total of all ids before it, however they are grouped.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    spark = df.sparkSession
    p = num_parts or spark.sparkContext.defaultParallelism * 2
    parts = (
        df.select(F.col(id_col).alias("id"), F.col(len_col).cast("long").alias("len"))
        .repartitionByRange(p, F.col("id"))
        .sortWithinPartitions("id")
        .withColumn("pid", F.spark_partition_id())
    )
    # pass 1: one (pid, total) row per partition; pid is stamped map-side
    # before the aggregation shuffle, so totals follow the range layout
    totals = {r["pid"]: r["t"] for r in parts.groupBy("pid").agg(F.sum("len").alias("t")).collect()}
    offsets = {}
    acc = 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    bc = spark.sparkContext.broadcast(offsets)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        running = None  # carried across Arrow batches of one partition
        for pdf in batches:
            if pdf.empty:
                continue
            if running is None:
                running = int(bc.value.get(int(pdf["pid"].iloc[0]), 0))
            cum = pdf["len"].cumsum() + running - pdf["len"]  # exclusive prefix
            running += int(pdf["len"].sum())
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "len": pdf["len"],
                    "pack_id": (cum // budget).astype("int64"),
                }
            )

    out = parts.mapInPandas(kernel, "id long, len long, pack_id long")
    return out.select(
        F.col("id").alias(id_col), F.col("len").alias(len_col), "pack_id"
    )
