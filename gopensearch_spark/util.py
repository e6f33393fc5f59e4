"""Small shared helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(
    df: DataFrame, factor: int = 2, bytes_per_partition: int | None = None
) -> DataFrame:
    """Repartition iff the input is under-partitioned for the cluster.

    A single small parquet file scans as ONE partition; any Python-heavy
    operator downstream (minhash signatures, simhash, feature extract)
    then runs serially no matter how many cores exist. Repartitioning to
    ~factor x defaultParallelism fixes that; inputs that are already
    well-partitioned (every real at-scale table) pass through untouched,
    so no extra shuffle is introduced where it would hurt.

    ``bytes_per_partition`` additionally caps the spread by DATA SIZE
    using Catalyst's own driver-side size estimate (no job): a tiny
    relation stays in few partitions (per-task launch overhead would
    exceed the serial work it parallelizes), a big one spreads up to the
    core target. Callers whose per-row work is moderate (tokenize /
    regex kernels) use ~1 MB per partition; the estimate erring large
    only costs idle-ish small tasks, erring small degrades to the old
    serial behavior — both safe.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * factor
    if bytes_per_partition:
        try:
            size = int(str(
                df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            ))
            target = min(target, max(1, size // int(bytes_per_partition)))
        except Exception:
            pass  # estimate unavailable: keep the core-count target
    if target > 1 and df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
