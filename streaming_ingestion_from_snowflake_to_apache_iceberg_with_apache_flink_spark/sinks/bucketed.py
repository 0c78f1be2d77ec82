"""Bucketed table layout — the shuffle-free repeated-join path.

The reference hash-partitions its stream once per run (``keyBy``,
``StreamingJob.java:101``); a table consumed by *many* runs should pay that
shuffle once at write time instead. ``bucketBy(n, key)`` stores each file
pre-hashed on the join/aggregation key, so every later join or groupBy on
that key is exchange-free: Spark reads matching buckets side by side
(SortMergeJoin with zero Exchange nodes — asserted in tests/test_plans.py).

At 100 TB this is the difference between re-shuffling the fact table on
every pipeline run and never shuffling it again:

* pick ``buckets`` ≈ table_size / target_partition_size (512 MB-ish), and
  use the SAME bucket count on tables that join together — mismatched
  counts fall back to a shuffle on one side;
* ``sortBy`` the join key inside each bucket so the SMJ skips its sort;
* bucket pruning: equality filters on the bucket key scan 1/n of the files.

Iceberg expresses the same layout as a ``bucket(n, col)`` partition
transform; this module uses the session-catalog form the sandbox supports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_column: str,
    buckets: int,
    sort: bool = True,
) -> None:
    """Materialize ``df`` as a bucketed (and in-bucket sorted) table."""
    w = df.write.format("parquet").mode("overwrite").bucketBy(buckets, bucket_column)
    if sort:
        w = w.sortBy(bucket_column)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket key.

    The plan this produces is the one to pin in CI: SortMergeJoin with no
    Exchange on either side — the bucketed layout replaces the runtime
    shuffle. (Verify with ``plans.count_exchanges(df) == 0``.)
    """
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
