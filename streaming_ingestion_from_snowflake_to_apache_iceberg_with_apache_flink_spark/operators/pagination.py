"""Deterministic incremental pagination (reference O5, O6, O7).

The reference pages each shard with ``ORDER BY sort LIMIT size OFFSET n``
and a per-key offset counter (``SnowflakeProcessFunction.java:87-119``).
That idiom has two hazards (SURVEY.md §2.2): the sort column is not unique
(ties make LIMIT/OFFSET nondeterministic) and a mutating table shifts pages.
Our form fixes both:

* ``row_number()`` over ``(sort_col, tiebreaker)`` — a total order, so every
  page is deterministic and ⋃ pages == the shard, exactly once;
* watermark-based incremental slices (``highwater_increment``) as the
  mutation-safe alternative: state is ``max(sort_col)`` seen, not a row
  count, so late inserts behind the watermark are the *only* failure mode —
  and the upsert MERGE keys (operators.merge) are the idempotence backstop.

Scale notes: the window partitions by shard, so ranking shuffles once on the
shard key and sorts per-shard — no global sort, no single-task bottleneck
(a global ``ORDER BY ... OFFSET`` would serialize through one partition).
Skewed shards are split by AQE; the watermark join side is one row per shard
and is always broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ranked(
    df: DataFrame, shard_column: str, sort_column: str, tiebreaker: str
) -> DataFrame:
    """Attach a deterministic per-shard row number ``rn`` (1-based)."""
    w = Window.partitionBy(shard_column).orderBy(
        F.col(sort_column).asc(), F.col(tiebreaker).asc()
    )
    return df.withColumn("rn", F.row_number().over(w))


def page(
    df: DataFrame,
    shard_column: str,
    shard_value,
    sort_column: str,
    tiebreaker: str,
    offset: int,
    size: int,
) -> DataFrame:
    """O6: one page of one shard — rows ``offset+1 .. offset+size`` in the
    total order (SnowflakeProcessFunction.java:93-94, made deterministic)."""
    return ranked(df, shard_column, sort_column, tiebreaker).filter(
        (F.col(shard_column) == F.lit(shard_value))
        & F.col("rn").between(offset + 1, offset + size)
    )


def pages_union(
    df: DataFrame,
    shard_column: str,
    shard_value,
    sort_column: str,
    tiebreaker: str,
    size: int,
    n_pages: int,
) -> DataFrame:
    """O6+O7 completeness: the union of successive pages. With the total
    order, ``⋃_{i<n} page(i)`` == the first ``n*size`` rows of the shard —
    the pagination-completeness property as a single plan.

    The ranking runs ONCE over the pre-filtered shard and the first
    ``n*size`` ranked rows are cached; each page is then a cheap rn-range
    filter over the cache. Without this, every union branch would recompute
    the scan + window sort (n× the work — the plan-reuse analogue of the
    reference re-running ``ORDER BY`` per page,
    SnowflakeProcessFunction.java:93-94)."""
    base = (
        ranked(
            df.filter(F.col(shard_column) == F.lit(shard_value)),
            shard_column,
            sort_column,
            tiebreaker,
        )
        .filter(F.col("rn") <= size * n_pages)
        .persist()
    )
    parts = [
        base.filter(F.col("rn").between(i * size + 1, (i + 1) * size))
        for i in range(n_pages)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def highwater_increment(
    df: DataFrame,
    baseline: DataFrame,
    shard_column: str,
    sort_column: str,
) -> DataFrame:
    """O7 as a watermark: rows strictly beyond each shard's ``max(sort)``
    seen in ``baseline`` (SnowflakeProcessFunction.java:108-110 re-expressed
    mutation-safely; SURVEY.md §2.2).

    The watermark table is |shards| rows — broadcast, so the increment scan
    is a map-side filter with no shuffle of ``df``. Shards absent from the
    baseline (new shards, O4 bootstrap) are included in full via the
    left join + coalesce.
    """
    wm = baseline.groupBy(shard_column).agg(F.max(sort_column).alias("__wm"))
    return (
        df.join(F.broadcast(wm), on=shard_column, how="left")
        .filter(F.col("__wm").isNull() | (F.col(sort_column) > F.col("__wm")))
        .drop("__wm")
    )
