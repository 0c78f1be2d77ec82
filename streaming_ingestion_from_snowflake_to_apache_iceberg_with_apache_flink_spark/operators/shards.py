"""Shard discovery and shard filtering (reference O1, O2, O3, O6-filter).

Reference semantics:
* O1/O2 — every poll cycle, ``SELECT DISTINCT <shard_col>`` and emit each
  value paired with the column *name* (``ColumnSource.java:42,47``).
* O6 filter — a single parameter-bound equality predicate per shard
  (``SnowflakeProcessFunction.java:93-97``).

Scale notes: ``distinct()`` on one column is a partial-aggregate shuffle on
that column only (map-side combine first — at 100 TB the shuffle carries at
most |distinct values| × partitions rows, not the data). The equality filter
compiles to a parquet ``PushedFilters: [EqualTo(...)]`` so non-matching row
groups are skipped via min/max statistics — no full scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def distinct_shards(df: DataFrame, shard_column: str) -> DataFrame:
    """O1+O2: distinct shard values paired with the shard column name.

    Output schema: (shard_col string, shard_value string) — the Spark form
    of the reference's ``Tuple2<String,String>`` (ColumnSource.java:12,47).
    """
    return (
        df.select(F.col(shard_column).cast("string").alias("shard_value"))
        .distinct()
        .select(F.lit(shard_column).alias("shard_col"), F.col("shard_value"))
    )


def shard_filter(df: DataFrame, shard_column: str, shard_value) -> DataFrame:
    """O6's WHERE clause: one equality predicate, pushed to the scan
    (SnowflakeProcessFunction.java:93-97)."""
    return df.filter(F.col(shard_column) == F.lit(shard_value))


def new_shards(current: DataFrame, known: DataFrame) -> DataFrame:
    """Shard discovery diff: values in the current poll not yet known.

    The reference re-emits the full distinct set every cycle and relies on
    keyed state to no-op repeats (SnowflakeProcessFunction.java:58-73); the
    batch-relational form is a left anti join. ``known`` is tiny (one row
    per shard) — broadcast it so discovery never shuffles the current set.
    """
    return current.join(
        F.broadcast(known.select("shard_value")), on="shard_value", how="left_anti"
    )
