"""Small shared helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, factor: int = 2) -> DataFrame:
    """Repartition iff the input is under-partitioned for the cluster.

    A single small parquet file scans as ONE partition; any Python-heavy
    operator downstream (minhash signatures, simhash, feature extract)
    then runs serially no matter how many cores exist. Repartitioning to
    ~factor x defaultParallelism fixes that; inputs that are already
    well-partitioned (every real at-scale table) pass through untouched,
    so no extra shuffle is introduced where it would hurt.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
