"""Stream-stream joins with event-time bounds.

The streaming runtime form of ``operators.temporal.interval_join`` (Flink
DataStream ``intervalJoin`` — the reference's engine family ships it as a
core stream operator; SURVEY.md §2.3 streaming category). Spark Structured
Streaming supports stream-stream equi-joins natively when both sides carry
watermarks and the join condition bounds event time — that is exactly the
interval-join contract, so the operator is a declarative join, not custom
state code.

State story at scale: the watermark + time-range condition is what lets
Spark EVICT join state — a left row is dropped once the right watermark
passes ``left.ts + upper_ms``, and vice versa; without the bounds the join
state grows with the whole stream. State lives in the checkpointed state
store, partitioned by the join key — the same hash shuffle as the batch
join.

The same function accepts batch DataFrames (watermarks are no-op plan nodes
in batch): the equality keys make Catalyst plan a plain hash equi-join with
the time range as a post-join filter — handy for backfills that must share
code with the live pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    lower_ms: int,
    upper_ms: int,
    delay: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Pairs with equal keys and ``left.ts + lower_ms <= right.ts <=
    left.ts + upper_ms`` (inclusive), with watermark-bounded state.

    Output columns: left columns + right non-key columns (names must not
    collide — alias before calling). ``delay`` is the per-side watermark
    lateness bound; total retained state per key spans roughly
    ``delay + (upper_ms - lower_ms)`` of event time.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if lower_ms > upper_ms:
        raise ValueError(f"lower_ms {lower_ms} > upper_ms {upper_ms}")
    clash = (set(right.columns) - set(keys)) & set(left.columns)
    if clash:
        raise ValueError(f"column collision (alias before joining): {sorted(clash)}")
    lw = left.withWatermark(left_ts, delay)
    rw = right.withWatermark(right_ts, delay)
    # rename right keys so the equality condition is unambiguous and the
    # output keeps exactly one copy of each key column
    for k in keys:
        rw = rw.withColumnRenamed(k, f"__r_{k}")
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"__r_{k}"))
    cond = cond & F.unix_micros(F.col(right_ts)).between(
        F.unix_micros(F.col(left_ts)) + F.lit(lower_ms * 1000),
        F.unix_micros(F.col(left_ts)) + F.lit(upper_ms * 1000),
    )
    return lw.join(rw, cond, how).drop(*[f"__r_{k}" for k in keys])
