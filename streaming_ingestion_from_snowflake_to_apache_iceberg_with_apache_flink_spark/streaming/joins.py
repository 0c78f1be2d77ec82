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
    cond = cond & _interval_cond(left_ts, right_ts, lower_ms, upper_ms)
    return lw.join(rw, cond, how).drop(*[f"__r_{k}" for k in keys])


def _interval_cond(left_ts: str, right_ts: str, lower_ms: int, upper_ms: int):
    """``left.ts + lower <= right.ts <= left.ts + upper`` as RAW timestamp
    arithmetic.  This form matters: Spark's streaming join planner derives
    the per-side STATE watermarks (what lets it evict join state and emit
    outer-join nulls) only from direct timestamp-column range predicates —
    an equivalent ``unix_micros(...)`` comparison is semantically identical
    but opaque to the analyzer, leaving state unbounded (and outer joins
    rejected outright).  Plain INTERVAL literals, specifically — even
    ``make_dt_interval`` defeats the detection, because its value lands
    under a ``cast(... as timestamp)`` the pattern-match won't look
    through."""
    lo = F.expr(f"INTERVAL '{lower_ms}' MILLISECOND")
    hi = F.expr(f"INTERVAL '{upper_ms}' MILLISECOND")
    return (F.col(right_ts) >= F.col(left_ts) + lo) & (
        F.col(right_ts) <= F.col(left_ts) + hi
    )


def _file_stream(spark, source_dir: str, path_glob_filter: str) -> DataFrame:
    """Schema-declared parquet file stream with the repo's ns-timestamp
    convention (same handling as streaming/windows.stream_tumbling_counts:
    ns columns arrive as long under ``nanosAsLong`` and are truncated to
    µs, matching ``sources.parquet.load_table``)."""
    import os

    from pyspark.sql import types as T

    raw = spark.read.parquet(os.path.join(source_dir, path_glob_filter)).schema
    stream = (
        spark.readStream.schema(raw)
        .option("pathGlobFilter", path_glob_filter)
        .parquet(source_dir)
    )
    if "ts" in raw.names and isinstance(raw["ts"].dataType, T.LongType):
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


def stream_interval_join_run(
    spark,
    source_dir: str,
    path_glob_filter: str = "events.parquet",
    query_name: str = "stream_interval_mem",
    timeout_sec: int = 300,
    state_partitions: int | None = None,
) -> DataFrame:
    """The ±1 h error↔click interval join through the ACTUAL streaming
    runtime: two file-stream sides → watermarks → stream-stream inner
    equi-join with event-time bounds → append-mode memory sink, drained
    with ``Trigger.AvailableNow``.  On one drained source this equals the
    batch interval join exactly (inner-join results emit on match; the
    watermark only evicts state and drops rows arriving in later
    micro-batches).

    This is the runtime proof for ``operators.temporal.interval_join`` —
    join state is keyed by user and evicted once the opposite watermark
    passes ``ts ± 1 h``, the property that makes the join sustainable on
    unbounded streams.
    """
    errors = (
        _file_stream(spark, source_dir, path_glob_filter)
        .filter(F.col("event_type") == "error")
        .select(
            "user_id",
            F.col("ts").alias("error_ts"),
            F.col("event_id").alias("error_id"),
        )
    )
    clicks = (
        _file_stream(spark, source_dir, path_glob_filter)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
    )
    lw = errors.withWatermark("error_ts", "1 hour")
    rw = clicks.withWatermark("click_ts", "1 hour")
    joined = lw.join(
        rw,
        (F.col("user_id") == F.col("c_user_id"))
        & _interval_cond("error_ts", "click_ts", -3_600_000, 3_600_000),
        "inner",
    ).select(
        "user_id",
        "error_id",
        "click_id",
        (F.unix_micros("error_ts") / F.lit(1000)).cast("long").alias("error_ts_ms"),
        (F.unix_micros("click_ts") / F.lit(1000)).cast("long").alias("click_ts_ms"),
    )
    from . import drain_to_memory

    # INNER join: every result row emits in the data batch that matched
    # it; the trailing no-data micro-batch only EVICTS state (it cannot
    # emit for an inner join), so on a bounded AvailableNow drain it is
    # a full batch cycle (~0.7 s warm: offset log + replan + one commit
    # per store instance) spent producing zero rows — skip it.  The
    # LEFT OUTER twin below MUST keep it: its null rows emit exactly
    # there.  (Round 13, guide §1.3/§2.6; value-identical, re-verified
    # against the oracle.)
    return drain_to_memory(
        spark,
        joined,
        query_name,
        "append",
        timeout_sec,
        state_partitions,
        extra_confs={"spark.sql.streaming.noDataMicroBatches.enabled": "false"},
    )


def stream_static_join_run(
    spark,
    source_dir: str,
    static_customer,
    path_glob_filter: str = "events.parquet",
    query_name: str = "stream_static_mem",
    timeout_sec: int = 300,
    state_partitions: int | None = None,
) -> DataFrame:
    """Stream-static enrichment through the ACTUAL runtime: the event file
    stream inner-joins a static dimension (re-resolved every micro-batch —
    Spark's face of the Flink broadcast-state enrichment pattern), rolled
    up per segment, complete-mode memory sink, AvailableNow drain.

    The static side broadcasts into each micro-batch (no stream state at
    all — unlike the stream-stream join there is nothing to evict), which
    is why this is THE join shape for slowly-changing dimension enrichment
    at 100 TB/day: dimension updates are picked up at the next batch
    without restarting the query.

    ``state_partitions`` sizes the complete-mode aggregation's state
    stores (``session.stream_state_partitions``): the agg state here is
    |segments|×|event_types| rows — tiny — so running it at the session's
    batch-sized shuffle-partition count pays dozens of state-store
    open/commit cycles per micro-batch for state that fits in one.  Every
    sibling runner threads this knob; this one was the lone holdout and
    the only >2× bench entry in round 10 for exactly that reason.
    """
    stream = _file_stream(spark, source_dir, path_glob_filter)
    dim = static_customer.select(
        F.col("c_custkey").alias("user_key"), "c_mktsegment"
    )
    joined = stream.join(
        F.broadcast(dim), stream["user_id"] == F.col("user_key"), "inner"
    )
    agg = joined.groupBy("c_mktsegment", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.floor(F.col("value") * 10000.0 + F.lit(0.5)).cast("long")).alias(
            "value_e4"
        ),
    )
    from . import drain_to_memory

    return drain_to_memory(
        spark, agg, query_name, "complete", timeout_sec, state_partitions
    )


def stream_interval_outer_join_run(
    spark,
    source_dir: str,
    path_glob_filter: str = "events.parquet",
    query_name: str = "stream_outer_mem",
    timeout_sec: int = 300,
    state_partitions: int | None = None,
) -> DataFrame:
    """The error↔click interval join of :func:`stream_interval_join_run`
    as a LEFT OUTER stream-stream join: errors with no click within ±1 h
    emit once with NULL click columns — but only after the watermark
    PROVES no matching click can still arrive.  This is the semantic the
    batch left join cannot give a stream: the null row is a watermark-
    certified negative, not an artifact of asking too early.

    Emission contract (pinned by test against a hand-built fixture, and
    what the oracle below reproduces): Spark holds an unmatched left row
    until the global watermark passes its match horizon, so with both
    sides watermarked ``delay`` and the AvailableNow drain's final
    no-data micro-batch (which runs eviction at the terminal watermark),
    the drained output is

        inner-join rows (all of them)
        ∪ unmatched errors with  error_ts + upper < min(max error_ts,
                                    max click_ts) − delay   (strict)

    — rows above the horizon stay in state, exactly as they would on a
    live stream.  The match set itself is complete: state outlives every
    candidate right row for any retained left.

    At 100 TB this is the shape for "no follow-up within SLA" alerting;
    state per key spans ``delay + (upper − lower)`` of event time on
    each side, evicted by the opposite watermark.
    """
    errors = (
        _file_stream(spark, source_dir, path_glob_filter)
        .filter(F.col("event_type") == "error")
        .select(
            "user_id",
            F.col("ts").alias("error_ts"),
            F.col("event_id").alias("error_id"),
        )
    )
    clicks = (
        _file_stream(spark, source_dir, path_glob_filter)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
    )
    lw = errors.withWatermark("error_ts", "1 hour")
    rw = clicks.withWatermark("click_ts", "1 hour")
    joined = lw.join(
        rw,
        (F.col("user_id") == F.col("c_user_id"))
        & _interval_cond("error_ts", "click_ts", -3_600_000, 3_600_000),
        "left_outer",
    ).select(
        "user_id",
        "error_id",
        "click_id",
        (F.unix_micros("error_ts") / F.lit(1000)).cast("long").alias("error_ts_ms"),
        (F.unix_micros("click_ts") / F.lit(1000)).cast("long").alias("click_ts_ms"),
    )
    from . import drain_to_memory

    return drain_to_memory(
        spark, joined, query_name, "append", timeout_sec, state_partitions
    )
