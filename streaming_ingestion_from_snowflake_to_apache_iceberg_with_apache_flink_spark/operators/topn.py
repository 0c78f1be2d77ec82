"""Per-shard top-N and partition layout audit (reference O3+O6 composed, O11).

``shard_fanout_topn`` is the reference's whole fan-out pipeline as one
query: every shard ranked by the sort column, top N kept
(``StreamingJob.java:95-103`` composed with the per-shard ORDER BY of
``SnowflakeProcessFunction.java:93-94``).

Scale notes: ``row_number() <= N`` per shard is the canonical distributed
top-k — one shuffle on the shard key, per-partition sort, and Spark's
``WindowGroupLimit`` physical optimization keeps only N rows per key on the
map side before the shuffle (verify in the plan), so the shuffle carries
O(shards × N) rows regardless of input size. Never ``collect()`` + sort.

``partitioned_layout`` audits the identity-partitioned target
(``IcebergTableManager.java:75-81``): per-partition-value row counts — a
partial-aggregate (map-side combine) per partition value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def shard_fanout_topn(
    df: DataFrame,
    shard_column: str,
    sort_column: str,
    tiebreaker: str,
    n: int,
    descending: bool = True,
) -> DataFrame:
    """Top-``n`` rows of every shard by ``(sort_column, tiebreaker)``."""
    sort = (
        [F.col(sort_column).desc(), F.col(tiebreaker).desc()]
        if descending
        else [F.col(sort_column).asc(), F.col(tiebreaker).asc()]
    )
    w = Window.partitionBy(shard_column).orderBy(*sort)
    return df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= n)


def partitioned_layout(df: DataFrame, partition_column: str) -> DataFrame:
    """Identity-partition audit: rows per partition value (O11)."""
    return df.groupBy(F.col(partition_column).alias("partition_value")).agg(
        F.count(F.lit(1)).alias("row_count")
    )
