"""Deterministic dataset splitting / sampling for training pipelines.

A training-data pipeline needs train/val/test assignment and subsampling
that are (a) deterministic — the same doc lands in the same split on
every run, every partitioning, every cluster size; (b) shuffle-free —
assignment is a pure row-local expression, so splitting 10^12 docs costs
one scan and no exchange; and (c) independent of physical row order
(Spark's ``randomSplit`` violates all three: it samples per-partition
with seeds keyed to partition ids).

Assignment hashes the id column: ``md5`` (first 8 hex chars) -> bucket
in [0, buckets). md5 is available verbatim in both Spark and DuckDB, so
every operator here has a value-exact SQL oracle (xxhash64 would be
marginally cheaper but is not reproducible outside Spark). All
expressions are JVM-side (whole-stage codegen) — no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 10_000


def hash_bucket(col: Column, buckets: int = DEFAULT_BUCKETS) -> Column:
    """Deterministic bucket in [0, buckets): first 32 md5 bits of the
    stringified id. Identical in DuckDB:
    ``('0x' || substring(md5(CAST(id AS VARCHAR)), 1, 8))::UBIGINT % buckets``."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")
        % F.lit(buckets)
    )


def hash_split(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Add a ``split`` column assigning each row to a named split.

    ``weights`` maps split name -> fraction (must sum to ~1); boundaries
    are integer bucket thresholds, so the split is exact-at-bucket
    granularity and identical at any scale or partitioning.
    """
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    b = hash_bucket(F.col(id_col), buckets)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        thr = int(round(acc * buckets))
        branch = F.when(b < F.lit(thr), F.lit(name))
        expr = branch if expr is None else expr.when(b < F.lit(thr), F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn("split", expr)


def hash_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Deterministic ~``fraction`` subsample: rows whose bucket falls
    below ``fraction * buckets``. Re-running, repartitioning, or scaling
    the cluster returns the IDENTICAL row set (unlike ``df.sample``)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    thr = int(round(fraction * buckets))
    return df.where(hash_bucket(F.col(id_col), buckets) < F.lit(thr))


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strat_col: str,
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample by language):
    a row in stratum s survives iff bucket < fractions[s] * buckets.
    Pure row-local CASE expression — no shuffle, no per-stratum jobs."""
    thr = None
    for s, f in sorted(fractions.items()):
        t = int(round(f * buckets))
        branch = F.when(F.col(strat_col) == F.lit(s), F.lit(t))
        thr = branch if thr is None else thr.when(F.col(strat_col) == F.lit(s), F.lit(t))
    default_thr = int(round(default_fraction * buckets))
    thr = F.lit(default_thr) if thr is None else thr.otherwise(F.lit(default_thr))
    return df.where(hash_bucket(F.col(id_col), buckets) < thr)
