"""Batch sessionization — gap-based session windows over an event log.

The reference has only processing-time timers (SURVEY.md §2.3); session
windows are part of the streaming category our engine must cover. The
streaming form is ``session_window()`` with a watermark
(``streaming`` package); this is the batch-checkable twin used by the
t2 oracle: classic lag + cumulative-sum session assignment.

Scale notes: one shuffle on the session key (``user_id``), then two window
passes over the same partitioning — Spark reuses the exchange (both windows
share partitionBy/orderBy). Session state never materializes per-row Python;
it's all lag/sum Catalyst expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_column: str,
    ts_column: str,
    tiebreaker: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign 1-based ``session_id`` per key with a ``gap_seconds`` gap."""
    order = [F.col(ts_column).asc(), F.col(tiebreaker).asc()]
    w = Window.partitionBy(key_column).orderBy(*order)
    gap_us = gap_seconds * 1_000_000
    prev = F.lag(F.unix_micros(F.col(ts_column))).over(w)
    is_new = F.when(
        prev.isNull() | (F.unix_micros(F.col(ts_column)) - prev > gap_us), 1
    ).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(
            Window.partitionBy(key_column)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    df: DataFrame,
    key_column: str,
    ts_column: str,
    tiebreaker: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-session aggregates: event count and start/end epoch-ms bounds."""
    s = sessionize(df, key_column, ts_column, tiebreaker, gap_seconds)
    return s.groupBy(key_column, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.min(F.unix_micros(F.col(ts_column))) / F.lit(1000)).cast("long").alias("start_ms"),
        (F.max(F.unix_micros(F.col(ts_column))) / F.lit(1000)).cast("long").alias("end_ms"),
    )
