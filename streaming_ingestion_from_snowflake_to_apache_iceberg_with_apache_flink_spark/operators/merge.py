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


def apply_change_feed(
    target: DataFrame,
    changes: DataFrame,
    equality_fields: Sequence[str],
    version_column: str,
    op_column: str = "op",
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Full CDC MERGE: apply a change feed carrying upserts AND deletes to
    a keyed target — the ``WHEN MATCHED AND op = 'delete' THEN DELETE``
    branch the plain upsert (``merge_upsert``) lacks, completing the O12
    write-semantics family (IcebergSinkBuilder.java:36-38's equality
    deletes ARE this: an upsert engine deletes by writing a tombstone for
    the key).

    ``changes`` must carry the target's columns plus ``op_column`` ∈
    {'upsert', 'delete'}; target rows enter as op='base'.  Per key the
    single winner is the highest (version, op-rank, tiebreakers) row —
    op-rank makes a change beat the base state at an equal version, and a
    delete beat a colliding upsert (tombstone-wins, Iceberg's equality-
    delete rule).  A winning delete removes the key from the output; the
    surviving rows keep their winning ``op`` as provenance.

    Scale: one hash shuffle on the equality key for the window — identical
    cost to ``merge_upsert``; deletes are data-sized rows, never a
    driver-side list.
    """
    t = target.withColumn(op_column, F.lit("base"))
    op_rank = (
        F.when(F.col(op_column) == "delete", 2)
        .when(F.col(op_column) == "upsert", 1)
        .otherwise(0)
    )
    order = (
        [F.col(version_column).desc(), op_rank.desc()]
        + [F.col(c).desc() for c in tiebreakers]
    )
    w = Window.partitionBy(*[F.col(c) for c in equality_fields]).orderBy(*order)
    return (
        t.unionByName(changes)
        .withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col(op_column) != "delete"))
        .drop("__rn")
    )
