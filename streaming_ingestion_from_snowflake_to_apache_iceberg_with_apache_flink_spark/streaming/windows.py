"""Event-time windowing — the streaming semantics the reference lacks but
the category implies (SURVEY.md §2.3: watermarks, tumbling/sliding/session
windows, late data; the reference has only processing-time timers,
``SnowflakeProcessFunction.java:61,78``).

Every operator takes either a batch or a streaming DataFrame — the plan is
identical; on a stream the watermark bounds state. Batch-checkable twins
(tumbling counts, sessionization via lag+cumsum in ``operators.sessions``)
carry the oracle checks; the streaming forms are exercised end-to-end in
tests via file streams + ``availableNow``.

Scale notes: windowed aggregation shuffles on (key, window) — partial
aggregation happens map-side, and the watermark is what lets Spark drop
window state; an unbounded-lateness stream at 100 TB/day otherwise grows
state forever. Sliding windows multiply rows by windows-per-event at the
*aggregation* level (not storage); keep slide ≥ length/4 in practice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _exact_sum_4dp(col: str) -> Column:
    """Order-independent cross-engine sum of a double column: quantize each
    value to 1e-4 via floor(x·10⁴ + 0.5) (identical in Spark and DuckDB —
    their round() half-rules differ, floor does not), sum as exact bigint,
    scale back. A raw sum(double) drifts with partition/accumulation order
    and flips the 4th decimal at sf0.1 row counts."""
    q = F.floor(F.col(col) * 10000 + F.lit(0.5)).cast("bigint")
    return F.sum(q)


def _sum_value_4dp(col: str) -> Column:
    return (_exact_sum_4dp(col) / F.lit(10000.0)).alias(f"sum_{col}")


def with_watermark(events: DataFrame, ts_column: str, delay: str = "10 minutes") -> DataFrame:
    """Late-data bound: rows later than max(event time) - delay are dropped
    from stateful operators (streaming only; a no-op plan node in batch)."""
    return events.withWatermark(ts_column, delay)


def tumbling_counts(
    events: DataFrame,
    ts_column: str = "ts",
    key: str = "event_type",
    length: str = "1 hour",
) -> DataFrame:
    """Per-key tumbling-window count + sum(value); window start as epoch-ms
    so the result is oracle-comparable (DuckDB: date_trunc/time_bucket)."""
    return (
        events.groupBy(key, F.window(ts_column, length).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(_sum_value_4dp("value"), 4).alias("sum_value"),
        )
        .select(
            key,
            (F.unix_micros(F.col("w.start")) / F.lit(1000)).cast("long").alias("window_start_ms"),
            "n_events",
            "sum_value",
        )
    )


def sliding_avg(
    events: DataFrame,
    ts_column: str = "ts",
    key: str = "event_type",
    length: str = "1 hour",
    slide: str = "30 minutes",
) -> DataFrame:
    """Per-key sliding-window average of ``value``."""
    return (
        events.groupBy(key, F.window(ts_column, length, slide).alias("w"))
        .agg(
            # exact-integer numerator / exact count, half-up applied with
            # floor(x+0.5) in integer space: Spark's round() is HALF_UP but
            # DuckDB's is HALF_EVEN, and the quantized sum makes exact
            # .xxxx5 ties common — floor sidesteps the divergent half-rule
            (
                F.floor(
                    _exact_sum_4dp("value") / F.count(F.lit(1)) + F.lit(0.5)
                )
                / F.lit(10000.0)
            ).alias("avg_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            key,
            (F.unix_micros(F.col("w.start")) / F.lit(1000)).cast("long").alias("window_start_ms"),
            "avg_value",
            "n_events",
        )
    )


def stream_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    ts_column: str = "ts",
    delay: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: first-arrival wins per key, with state bounded
    by the watermark (``dropDuplicatesWithinWatermark``) — duplicates
    arriving within ``delay`` of the original are guaranteed dropped, and
    key state older than the watermark is evicted instead of growing
    forever. This is the stream-native face of ``operators.dedup``: at
    100 TB/day an unbounded ``dropDuplicates`` would accumulate every key
    ever seen; the watermark bound is what makes exactly-once-per-key
    sustainable. On a batch DataFrame Spark rejects the within-watermark
    form, so this falls back to plain ``dropDuplicates`` (same result on
    finite input)."""
    keys = keys or ["event_id"]
    wm = events.withWatermark(ts_column, delay)
    if events.isStreaming:
        return wm.dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


def session_windows(
    events: DataFrame,
    ts_column: str = "ts",
    key: str = "user_id",
    gap: str = "30 minutes",
) -> DataFrame:
    """Native gap-based session windows (``F.session_window``). Semantics
    match the batch lag+cumsum form in ``operators.sessions`` (same gap
    closure rule: a new session starts when the inter-event gap exceeds
    ``gap``)."""
    return (
        events.groupBy(key, F.session_window(ts_column, gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key,
            (F.unix_micros(F.col("w.start")) / F.lit(1000)).cast("long").alias("start_ms"),
            (F.unix_micros(F.col("w.end")) / F.lit(1000)).cast("long").alias("end_ms"),
            "n_events",
        )
    )


def stream_tumbling_counts(
    spark,
    source_dir: str,
    path_glob_filter: str,
    length: str = "1 hour",
    query_name: str = "stream_tumbling_mem",
    timeout_sec: int = 300,
    state_partitions: int | None = None,
) -> DataFrame:
    """The tumbling-window aggregation as an ACTUAL Structured Streaming
    run: file-stream source → watermark → windowed agg → complete-mode
    memory sink, drained with ``Trigger.AvailableNow`` — proving the
    event-time pipeline end-to-end, not just its batch twin. On one
    drained source the result equals ``tumbling_counts`` exactly (the
    watermark only drops data arriving in LATER micro-batches).

    The source schema is taken from the parquet footer (ns timestamps
    arrive as long under ``nanosAsLong`` and are truncated to µs — the
    same convention as ``sources.parquet.load_table``).
    """
    import os

    from pyspark.sql import types as T

    raw = spark.read.parquet(
        os.path.join(source_dir, path_glob_filter)
    ).schema
    stream = (
        spark.readStream.schema(raw)
        .option("pathGlobFilter", path_glob_filter)
        .parquet(source_dir)
    )
    if isinstance(raw["ts"].dataType, T.LongType):
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    agg = tumbling_counts(with_watermark(stream, "ts"), length=length)
    from . import drain_to_memory

    return drain_to_memory(
        spark, agg, query_name, "complete", timeout_sec, state_partitions
    )


def stream_session_windows(
    spark,
    source_dir: str,
    path_glob_filter: str = "events.parquet",
    gap: str = "30 minutes",
    query_name: str = "stream_session_mem",
    timeout_sec: int = 300,
    state_partitions: int | None = None,
) -> DataFrame:
    """Gap-based session windows through the ACTUAL streaming runtime:
    file stream → watermark → ``F.session_window`` aggregation →
    complete-mode memory sink, AvailableNow drain.  Session state merges
    windows as events arrive (two sessions fuse when a bridging event
    lands) — the canonical stateful-merge operator; on one drained source
    the result equals the batch ``session_windows`` exactly.

    Session-window semantics pinned here: a session's end is its last
    event + gap, and an event exactly ``gap`` after the previous one
    starts a NEW session (merge requires event_time < session_end,
    strictly).
    """
    from ..streaming.joins import _file_stream

    stream = with_watermark(
        _file_stream(spark, source_dir, path_glob_filter), "ts"
    )
    agg = session_windows(stream, gap=gap)
    from . import drain_to_memory

    return drain_to_memory(
        spark, agg, query_name, "complete", timeout_sec, state_partitions
    )


def sliding_distinct(
    events: DataFrame,
    ts_column: str = "ts",
    key: str = "event_type",
    length: str = "1 hour",
    slide: str = "30 minutes",
) -> DataFrame:
    """Distinct active users per sliding window — the "uniques per
    trailing hour" dashboard aggregate.  Distinct-within-overlapping-
    windows is a different plan shape from the sliding sums: the window
    explode (×length/slide) feeds a partial-DISTINCT aggregate
    (two-level hash: (key, window, user) dedup map-side, then count),
    so the shuffle carries deduped triples, never raw events."""
    return (
        events.groupBy(key, F.window(ts_column, length, slide).alias("w"))
        .agg(
            F.count_distinct(F.col("user_id")).alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            key,
            (F.unix_micros(F.col("w.start")) / F.lit(1000))
            .cast("long")
            .alias("window_start_ms"),
            "n_users",
            "n_events",
        )
    )


#: The in-box RocksDB state store provider (ships in Spark's jars; no
#: extra dependency).  HDFS-backed in-memory state is the default, but at
#: 100 TB/day streaming state (join buffers, dedup maps, session merges)
#: outgrows executor heap — RocksDB spills state to local SSD with
#: changelog checkpointing, which is the production backend choice.
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def stream_dedup_run(
    spark,
    doubled_dir: str,
    query_name: str = "stream_dedup_mem",
    timeout_sec: int = 300,
    state_backend: str | None = None,
    state_partitions: int | None = None,
) -> DataFrame:
    """Exactly-once-per-key dedup through the ACTUAL runtime: a file
    stream over a deliberately DOUBLED copy of the events (every row
    twice) → watermark → ``dropDuplicatesWithinWatermark`` on the event
    key → append-mode memory sink, AvailableNow drain.  The output must
    be exactly the original relation — the state-store dedup provably
    dropped the planted duplicates, not a vacuous identity pass.

    State story: key state is evicted once the watermark passes the
    event's time + delay, which is what bounds the dedup map on an
    unbounded stream (the plain dropDuplicates would retain every key
    forever).  ``state_backend=ROCKSDB_PROVIDER`` runs the same query on
    the RocksDB state store (provider class is captured at query START,
    so setting the conf around ``start()`` scopes it to this query)."""
    raw = spark.read.parquet(doubled_dir).schema
    stream = spark.readStream.schema(raw).parquet(doubled_dir)
    from pyspark.sql import types as T

    if isinstance(raw["ts"].dataType, T.LongType):
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    from . import drain_to_memory

    # dropDuplicatesWithinWatermark EMITS each first-seen row in its own
    # data batch; the watermark only evicts key state, so the trailing
    # no-data micro-batch of an AvailableNow drain produces zero rows at
    # the cost of a full batch cycle (~0.25 s warm) — skip it (round 13,
    # guide §1.3; value-identical, re-verified against the oracle).
    extra = {"spark.sql.streaming.noDataMicroBatches.enabled": "false"}
    if state_backend:
        extra["spark.sql.streaming.stateStore.providerClass"] = state_backend
    return drain_to_memory(
        spark,
        deduped,
        query_name,
        "append",
        timeout_sec,
        state_partitions,
        extra_confs=extra,
    )


def stream_windowed_topk(
    spark,
    source_dir: str,
    path_glob_filter: str = "events.parquet",
    length: str = "1 hour",
    k: int = 3,
    query_name: str = "stream_topk_mem",
    timeout_sec: int = 300,
    state_partitions: int | None = None,
) -> DataFrame:
    """Trending-items top-k per tumbling window through the ACTUAL
    streaming runtime: the per-(window, key) counts run as a Structured
    Streaming aggregation (watermark-bounded state, AvailableNow drain —
    exactly ``stream_tumbling_counts``); the rank head then runs as a
    batch window over the DRAINED result. That split is the production
    shape: streams cannot rank inside an update-mode aggregation (a
    row_number over a streaming agg is unsupported precisely because
    ranks retract), so the dashboard ranks the sink table — here
    |windows|·|keys| rows, metadata-sized at any corpus scale, windowed
    PARTITIONED by window."""
    from pyspark.sql import Window

    counts = stream_tumbling_counts(
        spark,
        source_dir,
        path_glob_filter,
        length=length,
        query_name=query_name,
        timeout_sec=timeout_sec,
        state_partitions=state_partitions,
    )
    w = Window.partitionBy("window_start_ms").orderBy(
        F.col("n_events").desc(), F.col("event_type").asc()
    )
    return (
        counts.select("event_type", "window_start_ms", "n_events")
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )
