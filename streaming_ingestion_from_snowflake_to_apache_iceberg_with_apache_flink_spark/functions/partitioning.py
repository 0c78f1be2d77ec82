"""Partition-shape guards.

A single small parquet file arrives as ONE input partition, which serializes
every expression over it onto one core regardless of cluster size — the
classic small-source bottleneck in otherwise-parallel plans (observed 5× on
the shingle pipeline at sf0.1). ``spread`` widens only when the input is
narrower than the session's parallelism, so at real scale (many files/row
groups) it is a no-op and costs nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition iff the input has fewer partitions than the
    session's default parallelism (compute-heavy per-row work downstream
    should never be bottlenecked on file count). Streaming DataFrames pass
    through untouched: micro-batch sizing is the trigger's job, and
    ``df.rdd`` is undefined on a stream."""
    if df.isStreaming:
        return df
    spark = df.sparkSession
    target = partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
