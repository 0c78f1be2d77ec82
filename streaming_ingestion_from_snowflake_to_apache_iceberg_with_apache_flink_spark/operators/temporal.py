"""Temporal joins: as-of and interval join.

The reference's engine family (Flink) ships both as first-class stream
operators; the reference job itself uses neither (SURVEY.md §2.1 "not
present"), but the category implies them and any time-series workload over
``events`` needs them. Both are expressed so the *only* exchange is a hash
shuffle on the join key — never an inequality sort-merge join and never a
nested-loop product.

Scale notes:
* ``asof_join`` — the union + running-``last(ignorenulls)`` formulation:
  tag both inputs, union them, and let one window pass per key carry the
  most recent right-side payload forward onto each left row. One shuffle
  on the key, a per-partition sort, and a sequential scan; state is O(1)
  per key (the current last right row). This is the distributed analogue
  of ``pandas.merge_asof`` and scales linearly where a naive
  ``l.ts >= r.ts`` join degenerates to a per-key cross product.
* ``interval_join`` — Flink-style ``l.ts + lower <= r.ts <= l.ts + upper``
  (DataStream interval join semantics), rewritten as an equi-join: time is
  quantized into buckets at least as wide as the interval span, the left
  side explodes to the (≤ 2) buckets its window can touch, and the exact
  predicate filters the bucket collisions. Catalyst sees a plain equi-join
  on (key, bucket) → shuffle or broadcast hash join, AQE-splittable, no
  BroadcastNestedLoopJoin. All arithmetic is integer microseconds
  (``unix_micros``), so boundaries are exact and oracle-reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..schema import ts_ms

def _keys(on: str | list[str]) -> list[str]:
    return [on] if isinstance(on, str) else list(on)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    how: str = "left",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the closest right row at-or-before
    (``backward``) / at-or-after (``forward``) its timestamp, per key.

    ``right_cols`` are the right-side payload columns to attach; they must
    not collide with left column names. Ties at identical (key, ts) are
    inclusive (the right row is visible to the left row); if several right
    rows share one (key, ts), which payload wins is tie-ambiguous — pre-dedup
    the right side for full determinism. ``how='left'`` keeps unmatched left
    rows with NULL payload; ``'inner'`` drops them.
    """
    keys = _keys(on)
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join supports left/inner, got {how!r}")
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    clash = set(right_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right_cols collide with left columns: {sorted(clash)}")
    left_payload = [c for c in left.columns if c not in keys]
    lschema = dict(left.dtypes)
    # the whole right payload travels as ONE nullable struct: it is non-null
    # exactly on right rows, so last(ignorenulls) carries the latest right
    # ROW — including any legitimately-NULL payload fields inside it
    rstruct = F.struct(*[F.col(c) for c in right_cols]).alias("__r")
    rstruct_type = right.select(rstruct).schema["__r"].dataType.simpleString()
    tagged_left = left.select(
        *keys,
        F.col(left_ts).alias("__ats"),
        F.lit(1).alias("__side"),
        *left_payload,
        F.lit(None).cast(rstruct_type).alias("__r"),
    )
    tagged_right = right.select(
        *keys,
        F.col(right_ts).alias("__ats"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(lschema[c]).alias(c) for c in left_payload],
        rstruct,
    )
    # backward: scan time ascending, right-before-left at ties, so "last
    # seen right" == latest right.ts <= left.ts. forward: scan descending.
    if direction == "backward":
        order = [F.col("__ats").asc(), F.col("__side").asc()]
    else:
        order = [F.col("__ats").desc(), F.col("__side").asc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged_left.unionByName(tagged_right).select(
        *keys,
        "__side",
        *left_payload,
        F.last("__r", ignorenulls=True).over(w).alias("__r"),
    )
    out = filled.filter(F.col("__side") == 1)
    if how == "inner":
        out = out.filter(F.col("__r").isNotNull())
    return out.select(
        *keys,
        *left_payload,
        *[F.col("__r").getField(c).alias(c) for c in right_cols],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    lower_ms: int,
    upper_ms: int,
) -> DataFrame:
    """All (left, right) pairs with equal keys and
    ``left.ts + lower_ms <= right.ts <= left.ts + upper_ms`` (bounds
    inclusive, Flink DataStream ``intervalJoin`` semantics).

    Returns left columns + right columns (minus the right key columns);
    non-key column names must not collide — alias before calling.
    """
    keys = _keys(on)
    if lower_ms > upper_ms:
        raise ValueError(f"lower_ms {lower_ms} > upper_ms {upper_ms}")
    clash = (set(right.columns) - set(keys)) & set(left.columns)
    if clash:
        raise ValueError(f"column collision (alias before joining): {sorted(clash)}")
    lower_us, upper_us = lower_ms * 1000, upper_ms * 1000
    # bucket width >= window span => each left window touches <= 2 buckets
    bucket_us = max(upper_us - lower_us, 1)
    l_us, r_us = F.unix_micros(F.col(left_ts)), F.unix_micros(F.col(right_ts))
    lb = left.withColumn(
        "__bucket",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor((l_us + F.lit(lower_us)) / F.lit(bucket_us)),
                    F.floor((l_us + F.lit(upper_us)) / F.lit(bucket_us)),
                )
            )
        ),
    )
    rb = right.withColumn("__bucket", F.floor(r_us / F.lit(bucket_us)))
    joined = lb.join(rb, on=[*keys, "__bucket"]).filter(
        F.unix_micros(F.col(right_ts)).between(
            F.unix_micros(F.col(left_ts)) + F.lit(lower_us),
            F.unix_micros(F.col(left_ts)) + F.lit(upper_us),
        )
    )
    return joined.drop("__bucket")


def scd2_history(events: DataFrame) -> DataFrame:
    """Type-2 slowly-changing-dimension build over an append-only change
    stream: each user's ``event_type`` is the tracked attribute; consecutive
    repeats collapse into one version, and every retained change opens a
    ``[valid_from, valid_to)`` interval with a version number (NULL
    ``valid_to`` = current). Batch twin of the upsert sink's "latest state
    per key" contract (IcebergSinkBuilder.java:36-38) extended with full
    history retention.

    Scale shape: ONE shuffle on ``user_id`` — the change-detection lag, the
    validity lead, and the version row_number all share the same
    ``(ts, event_id)`` sort, and the post-filter windows reuse the
    partitioning the first window established.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changed = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("__prev", F.lag("event_type").over(w))
        .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col("event_type")))
    )
    ms = (F.unix_micros(F.col("ts")) / F.lit(1000)).cast("long")
    next_ms = F.lead(ms).over(w)
    return changed.select(
        "user_id",
        F.col("event_type").alias("state"),
        ms.alias("valid_from_ms"),
        next_ms.alias("valid_to_ms"),
        F.row_number().over(w).alias("version"),
        next_ms.isNull().alias("is_current"),
    )


def snapshot_diff(events: DataFrame, cutoff: str = "2024-01-15") -> DataFrame:
    """CDC audit between two last-writer-wins snapshots of the keyed state
    (key = (user_id, event_type), state = ``value`` of the latest
    (ts, event_id) row): the snapshot at ``ts < cutoff`` vs the snapshot
    over the full stream. Every key in the new snapshot is classified as
    ``insert`` (absent before), ``update`` (state changed), or
    ``unchanged`` — the change-set a MERGE-based sink (O12,
    IcebergSinkBuilder.java:36-38) would apply to roll the old snapshot
    forward.

    Scale shape: each snapshot branch is one key-partitioned window pass
    (Catalyst materializes the shared ranking twice — two exchanges total),
    and the old-state side arrives reduced to one row per key, so the final
    diff is a broadcast join: the full-history table is never joined
    against itself row-for-row.
    """
    tagged = events.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        "value",
        (F.col("ts") < F.lit(cutoff).cast("timestamp")).alias("__old"),
    )
    w_new = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    # rank twice over the same sort: overall (new snapshot) and among old
    # rows only (old snapshot) — count of old rows at-or-above = old rank
    ranked = tagged.select(
        "user_id",
        "event_type",
        "value",
        "__old",
        F.row_number().over(w_new).alias("__rn_new"),
        F.sum(F.col("__old").cast("int")).over(
            w_new.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("__n_old"),
    )
    new_state = ranked.filter(F.col("__rn_new") == 1).select(
        "user_id", "event_type", F.col("value").alias("new_value")
    )
    old_state = ranked.filter(F.col("__old") & (F.col("__n_old") == 1)).select(
        "user_id", "event_type", F.col("value").alias("old_value")
    )
    diff = new_state.join(old_state, ["user_id", "event_type"], "left")
    return diff.select(
        "user_id",
        "event_type",
        "old_value",
        "new_value",
        F.when(F.col("old_value").isNull(), F.lit("insert"))
        .when(F.col("old_value") != F.col("new_value"), F.lit("update"))
        .otherwise(F.lit("unchanged"))
        .alias("change"),
    )


def window_dedup(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Bounded-window deduplication: within each (user_id, event_type,
    tumbling window), keep only the earliest event — the batch twin of
    Structured Streaming's ``dropDuplicatesWithinWatermark`` (the watermark
    bounds how long a key's dedup state lives; the tumbling bucket is that
    bound made explicit and batch-checkable).

    One shuffle on the dedup key; Catalyst's WindowGroupLimit keeps only
    the rank-1 row per group map-side, so the exchange carries survivors,
    not the full stream.
    """
    from pyspark.sql import Window as W

    bucket = F.window("ts", window).getField("start")
    w = W.partitionBy("user_id", "event_type", bucket).orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            ts_ms("ts").alias("ts_ms"),
            "user_id",
            "event_type",
            "value",
            ts_ms(bucket).alias("window_start_ms"),
        )
    )


def late_data_audit(
    events: DataFrame, delay_ms: int = 600_000
) -> DataFrame:
    """Watermark policy audit, batch-checkable: replay the stream in
    arrival order (event_id as the arrival sequence), track the running
    max event time, and flag every event older than (max seen − delay) —
    exactly the rows `withWatermark(ts, delay)` would drop from a
    finalized aggregation. Emits the per-type audit: totals, late count,
    and worst lateness — the measurement that sizes a watermark delay
    before deploying it.

    All time arithmetic is integer epoch-ms (portable). The running max
    is a PARALLEL prefix max — no single-partition window over the
    corpus: range-partition by arrival order (pinned), per-partition
    running max windowed by the physical partition id, then each
    partition's prefix is offset by the max of all EARLIER partitions
    (metadata-sized collect + broadcast join, the same two-phase shape as
    ``ranks.global_row_number``). ``greatest`` skips NULLs, so the first
    rows of partition 0 (no prior event anywhere) keep the exact NULL
    semantics of the single-window form.
    """
    from .ranks import (
        OFF,
        PID,
        exclusive_prefix,
        pin_range_partitions,
        with_offsets,
    )

    part = pin_range_partitions(
        events.select("event_type", ts_ms("ts").alias("t"), "event_id"),
        [F.col("event_id").asc()],
    )
    rows, _ = exclusive_prefix(
        part,
        F.max("t"),
        lambda acc, v: acc
        if v is None
        else (int(v) if acc is None else max(int(acc), int(v))),
        None,
    )
    arrive = (
        Window.partitionBy(PID)
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = (
        with_offsets(part, rows)
        .select(
            "event_type",
            "t",
            F.greatest(F.max("t").over(arrive), F.col(OFF)).alias("seen"),
        )
    ).select(
        "event_type",
        (F.col("t") < F.col("seen") - F.lit(delay_ms)).alias("late"),
        F.when(
            F.col("t") < F.col("seen") - F.lit(delay_ms),
            F.col("seen") - F.lit(delay_ms) - F.col("t"),
        )
        .otherwise(0)
        .alias("late_by_ms"),
    )
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("late").cast("int")).cast("bigint").alias("n_late"),
        F.max("late_by_ms").cast("bigint").alias("max_late_ms"),
    )


def nearest_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    tolerance_ms: int,
) -> DataFrame:
    """Nearest-event temporal join: for each left row, the single right
    row with the same key whose timestamp is CLOSEST in either direction
    within ``±tolerance_ms`` — the bidirectional cousin of the as-of join
    (as-of looks backward only; "match the reading nearest to the event"
    needs both directions).

    Built on the bucketed ``interval_join`` kernel (so candidates come
    from an equi-join on (key, time-bucket), never a nested loop), then
    one WindowGroupLimit pass keeps the nearest candidate per left row —
    ties break to the EARLIER right timestamp, making the winner total-
    order deterministic.  Left rows with no candidate in tolerance drop
    (inner semantics), matching the oracle's join.

    The top-1 window partitions on a synthetic per-row id stamped on the
    left input BEFORE the join, so two left rows identical on every
    column still each keep their own nearest match (partitioning on
    ``left.columns`` would collapse them into one group and silently
    drop a row).  The id never leaves the operator.
    """
    lid = left.withColumn("__lid", F.monotonically_increasing_id())
    cand = interval_join(
        lid, right, on, left_ts, right_ts, -tolerance_ms, tolerance_ms
    )
    diff = F.abs(F.unix_micros(F.col(right_ts)) - F.unix_micros(F.col(left_ts)))
    w = Window.partitionBy("__lid").orderBy(
        diff.asc(), F.unix_micros(F.col(right_ts)).asc()
    )
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__lid")
        .withColumn("abs_diff_ms", (diff / F.lit(1000)).cast("long"))
    )


def scd2_lookup(events: DataFrame) -> DataFrame:
    """Point-in-time dimension lookup against the SCD2 history — THE
    warehouse join: each purchase event resolves the user's tracked
    state AS OF the purchase timestamp (the version whose
    ``[valid_from, valid_to)`` interval covers it). Because a key's
    validity intervals tile time without overlap, the interval lookup IS
    a backward as-of join on ``valid_from`` — so this composes
    :func:`scd2_history` with :func:`asof_join` (one user-keyed shuffle,
    union + running-last, no inequality join node) instead of paying a
    range join.

    Emits (event_id, user_id, ts_ms, state_at, version) per purchase —
    ``how='inner'`` since every purchase postdates the user's first
    version by construction (the first event opens version 1).
    """
    from ..schema import ts_ms

    # validity is ms-quantized: two changes inside one millisecond leave
    # the earlier with an EMPTY [from, to) interval — keep only the last
    # version per (user, ms) so the as-of tie rule and the interval
    # semantics agree exactly (the window runs per user over its
    # version-count-sized history, not the corpus)
    wv = Window.partitionBy("user_id", "valid_from_ms").orderBy(
        F.col("version").desc()
    )
    hist = (
        scd2_history(events)
        .withColumn("__rv", F.row_number().over(wv))
        .filter(F.col("__rv") == 1)
        .select(
            "user_id",
            F.timestamp_millis(F.col("valid_from_ms")).alias("__vts"),
            F.col("state").alias("state_at"),
            "version",
        )
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    looked = asof_join(
        purchases,
        hist,
        "user_id",
        "ts",
        "__vts",
        ["state_at", "version"],
        how="inner",
    )
    return looked.select(
        "event_id",
        "user_id",
        ts_ms("ts").alias("ts_ms"),
        "state_at",
        "version",
    )
