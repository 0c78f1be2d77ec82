"""Upsert / overwrite semantics (reference O12) in batch-relational form.

The reference's sink modes (``IcebergSinkBuilder.java:31-43``):
* ``upsert`` — Iceberg v2 equality deletes on the configured key fields:
  the *last* write per key wins;
* ``overwrite`` — replace the target's (partition's) contents.

Batch-queryable equivalents (the runtime ``MERGE INTO`` lives in
``sinks.catalog``):
* ``merge_upsert`` — last-writer-wins dedup: rank rows per equality key by
  recency and keep rank 1. One shuffle on the key; at 100 TB this is the
  same hash partitioning Iceberg's own MERGE performs, and AQE handles key
  skew. The ordering must be total (version + tiebreakers) or replays would
  be nondeterministic — same hazard as pagination (SURVEY.md §2.2).
* ``overwrite_partition`` — everything except the target slice, union the
  replacement. With dynamic partition overwrite this touches only the
  replaced partition's files; the untouched partitions are never rewritten.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    df: DataFrame,
    equality_fields: Sequence[str],
    version_column: str,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Last-writer-wins on ``equality_fields`` by ``version_column`` desc
    (IcebergSinkBuilder.java:36-38 as a batch query)."""
    order = [F.col(version_column).desc()] + [F.col(t).desc() for t in tiebreakers]
    w = Window.partitionBy(*[F.col(c) for c in equality_fields]).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def overwrite_partition(
    target: DataFrame,
    replacement: DataFrame,
    partition_column: str,
    partition_value,
) -> DataFrame:
    """Replace one partition's rows with ``replacement``
    (IcebergSinkBuilder.java:39-40 as a batch query).

    ``replacement`` rows outside the partition are rejected at plan level by
    filtering — mirroring Iceberg's overwrite-by-filter safety.
    """
    keep = target.filter(F.col(partition_column) != F.lit(partition_value))
    repl = replacement.filter(F.col(partition_column) == F.lit(partition_value))
    return keep.unionByName(repl)
