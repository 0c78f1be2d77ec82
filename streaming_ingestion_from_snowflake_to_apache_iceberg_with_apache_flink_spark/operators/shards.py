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


def rebalance_plan(
    df: DataFrame, shard_column: str = "source"
) -> DataFrame:
    """One matched-rank shard REBALANCE round — the skew-repair plan an
    ingest operator reads when per-shard volumes drift (the reference's
    per-shard keyed pipeline degrades with the hottest shard; this is
    the "what to move where" table): shards above the mean are donors,
    below are receivers; the i-th largest surplus pairs with the i-th
    largest deficit and moves ``min(surplus, deficit)`` rows — the
    classic single-round greedy that removes the worst imbalance first.

    Exactness: surpluses are kept in ×n_shards integer units
    (``n_s·k − total``) so the mean never becomes a float; moved rows
    floor-divide once at the end. Scale shape: ONE partial-agg pass to
    the shard-dimension table; ranking windows run on that metadata-
    sized relation only (plan-asserted elsewhere as the bounded-domain
    window contract).
    """
    from pyspark.sql import Window

    counts = df.groupBy(F.col(shard_column).alias("shard")).agg(
        F.count(F.lit(1)).alias("n_s")
    )
    wall = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    scored = counts.select(
        "shard",
        "n_s",
        (
            F.col("n_s") * F.count(F.lit(1)).over(wall)
            - F.sum("n_s").over(wall)
        ).alias("surplus_xk"),
        F.count(F.lit(1)).over(wall).alias("k"),
    )
    donors = scored.filter(F.col("surplus_xk") > 0).select(
        F.col("shard").alias("from_shard"),
        F.col("surplus_xk").alias("surplus"),
        F.col("k"),
        F.row_number()
        .over(
            Window.orderBy(
                F.col("surplus_xk").desc(), F.col("shard").asc()
            )
        )
        .alias("move_rank"),
    )
    receivers = scored.filter(F.col("surplus_xk") < 0).select(
        F.col("shard").alias("to_shard"),
        (-F.col("surplus_xk")).alias("deficit"),
        F.row_number()
        .over(
            Window.orderBy(
                F.col("surplus_xk").asc(), F.col("shard").asc()
            )
        )
        .alias("move_rank"),
    )
    return donors.join(receivers, "move_rank").select(
        F.col("move_rank").cast("int").alias("move_rank"),
        "from_shard",
        "to_shard",
        F.expr("cast(least(surplus, deficit) div k as bigint)").alias(
            "rows_to_move"
        ),
        F.col("surplus").cast("bigint").alias("surplus_xk"),
        F.col("deficit").cast("bigint").alias("deficit_xk"),
    )


def duck_rebalance_sql(shard_column: str = "source") -> str:
    """Oracle twin of :func:`rebalance_plan` over the documents table."""
    return f"""
        WITH counts AS (
            SELECT {shard_column} AS shard, count(*) AS n_s
            FROM documents GROUP BY 1
        ), scored AS (
            SELECT shard, n_s,
                   n_s * count(*) OVER () - sum(n_s) OVER () AS surplus_xk,
                   count(*) OVER () AS k
            FROM counts
        ), donors AS (
            SELECT shard AS from_shard, surplus_xk AS surplus, k,
                   row_number() OVER (
                       ORDER BY surplus_xk DESC, shard ASC) AS move_rank
            FROM scored WHERE surplus_xk > 0
        ), receivers AS (
            SELECT shard AS to_shard, -surplus_xk AS deficit,
                   row_number() OVER (
                       ORDER BY surplus_xk ASC, shard ASC) AS move_rank
            FROM scored WHERE surplus_xk < 0
        )
        SELECT CAST(move_rank AS INT) AS move_rank, from_shard, to_shard,
               (least(surplus, deficit) // k)::BIGINT AS rows_to_move,
               surplus::BIGINT AS surplus_xk, deficit::BIGINT AS deficit_xk
        FROM donors JOIN receivers USING (move_rank)
    """
