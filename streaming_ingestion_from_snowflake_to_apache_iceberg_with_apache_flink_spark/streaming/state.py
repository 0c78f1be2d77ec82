"""Per-key stateful streaming: the reference's offset state machine as
``applyInPandasWithState`` (SURVEY.md §1.4: the Spark analogue of Flink's
keyed ``ValueState`` + timers, ``SnowflakeProcessFunction.java:21-23,46-85``).

The control-table design in ``streaming.ingest`` is the default path (plain
DataFrames, restart-safe, inspectable). This module is the in-stream
alternative: state lives in the streaming checkpoint, one group per shard,
exactly like the reference's keyed operator. Used when the offset decision
must happen inside the stream (e.g. per-shard rate limiting) rather than
between micro-batches.

Group-state semantics mirrored from the reference:
* first record for a key bootstraps state (offset=0) — O4;
* every batch advances the offset by the rows seen — O7;
* state never resets (the reference's reset branch is dead code,
  ``SnowflakeProcessFunction.java:113-115``).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

STATE_SCHEMA = T.StructType([T.StructField("offset", T.LongType())])

PROGRESS_SCHEMA = T.StructType(
    [
        T.StructField("shard_value", T.StringType()),
        T.StructField("batch_rows", T.LongType()),
        T.StructField("offset", T.LongType()),
    ]
)


def _track(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    offset = state.get[0] if state.exists else 0  # O4 bootstrap
    rows = 0
    for pdf in pdfs:
        rows += len(pdf)
    offset += rows  # O7: monotone advance, never reset
    state.update((offset,))
    yield pd.DataFrame(
        {"shard_value": [key[0]], "batch_rows": [rows], "offset": [offset]}
    )


class OffsetProcessor(StatefulProcessor):
    """The same offset machine on the Spark 4 ``transformWithState`` API.

    Differences from ``applyInPandasWithState`` that matter operationally:
    state is schema-evolvable and per-state-variable (``getValueState``),
    timers are first-class (the natural home for the reference's per-key
    processing-time timer, ``SnowflakeProcessFunction.java:76-85``), and the
    backing store is RocksDB — at 1000 executors that means state scales
    past executor heap. Requires the RocksDB state store provider conf
    (see ``track_offsets_tws``).
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._offset = handle.getValueState("offset", STATE_SCHEMA)

    def handleInputRows(
        self, key: tuple[Any, ...], rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        offset = self._offset.get()[0] if self._offset.exists() else 0  # O4
        n = sum(len(pdf) for pdf in rows)
        offset += n  # O7: monotone advance, never reset
        self._offset.update((offset,))
        yield pd.DataFrame(
            {"shard_value": [key[0]], "batch_rows": [n], "offset": [offset]}
        )

    def close(self) -> None:
        pass


def track_offsets_tws(stream: DataFrame, shard_column: str) -> DataFrame:
    """``track_offsets`` on ``transformWithStateInPandas``.

    Needs the ``protobuf`` package at runtime (the TWS Python worker's
    control channel; absent in this sandbox, so the test is skip-gated —
    ``applyInPandasWithState``/``track_offsets`` is the tested path here).
    The session must run the RocksDB state store provider::

        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    """
    return stream.groupBy(shard_column).transformWithStateInPandas(
        OffsetProcessor(),
        outputStructType=PROGRESS_SCHEMA,
        outputMode="update",
        timeMode="none",
    )


def track_offsets(stream: DataFrame, shard_column: str) -> DataFrame:
    """Per-shard running row offsets over a (streaming) DataFrame.

    Each micro-batch emits one progress row per shard with the advanced
    offset — the keyed-state core of the reference job, minus the JDBC
    side effect (which lives in the cycle engine where it belongs: I/O in
    stateful streaming operators pins connections inside executors).
    """
    return stream.groupBy(shard_column).applyInPandasWithState(
        _track,
        outputStructType=PROGRESS_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# CDC latest-state materialization: the in-stream twin of
# operators/merge.apply_change_feed (O12's upsert + equality-delete
# semantics, IcebergSinkBuilder.java:31-43) — keyed state holds the latest
# applied change per key, tombstones mark deletion, each micro-batch emits
# the key's current state.

CDC_STATE_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType()),
        T.StructField("tie", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("deleted", T.BooleanType()),
        T.StructField("n_changes", T.LongType()),
    ]
)

CDC_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("last_ts_ms", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("deleted", T.BooleanType()),
        T.StructField("n_changes", T.LongType()),
    ]
)


def _apply_cdc(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Apply one micro-batch of ordered changes to a key's state: sort by
    (seq, tie), adopt the last change iff it is newer than the held state
    (late replays of already-applied changes are no-ops — the idempotence
    a CDC consumer needs), count every change seen."""
    if state.exists:
        seq, tie, value, deleted, n = state.get
    else:
        seq, tie, value, deleted, n = -1, -1, float("nan"), True, 0
    frames = [p for p in pdfs if len(p)]  # empty chunks would poison concat dtypes
    batch = (
        pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()
    )
    if len(batch):
        n += len(batch)
        last = batch.sort_values(["ts_ms", "event_id"]).iloc[-1]
        last_seq, last_tie = int(last["ts_ms"]), int(last["event_id"])
        if (last_seq, last_tie) > (seq, tie):
            seq, tie = last_seq, last_tie
            value = float(last["value"])
            deleted = bool(last["del"])
    state.update((seq, tie, value, deleted, n))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "last_ts_ms": [seq],
            "value": [value],
            "deleted": [deleted],
            "n_changes": [n],
        }
    )


def apply_cdc_stream(stream: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Latest-state CDC materialization over a change stream with columns
    (key, ts_ms, event_id, value, del): keyed ``applyInPandasWithState``
    holding one fixed-width record per key — state size = |keys|, never
    |changes|, the property that lets the operator run forever on an
    unbounded feed. Update-mode output: each batch re-emits only touched
    keys."""
    return stream.groupBy(key_col).applyInPandasWithState(
        _apply_cdc,
        outputStructType=CDC_OUT_SCHEMA,
        stateStructType=CDC_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming NEAR-duplicate detection: MinHash-LSH band keys as the state
# key, one running minimum doc_id per band — the in-stream twin of
# operators/dedup.minhash_lsh_pairs' candidate generation. A document is a
# near-dup candidate iff some band's minimum is a SMALLER doc_id, a
# definition that is independent of arrival and micro-batch order (min is
# commutative), so the drained result is exactly batch-checkable.

BAND_MIN_STATE_SCHEMA = T.StructType(
    [T.StructField("min_doc", T.LongType())]
)

BAND_MIN_OUT_SCHEMA = T.StructType(
    [
        T.StructField("band_key", T.StringType()),
        T.StructField("min_doc", T.LongType()),
    ]
)


def _band_min(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold one micro-batch of (band_key, doc_id) rows into the band's
    running min; emit the band's current min. State is ONE long per band
    — |bands| states total, never |documents|·bands."""
    cur = state.get[0] if state.exists else None
    for p in pdfs:
        if len(p):
            m = int(p["doc_id"].min())
            cur = m if cur is None else min(cur, m)
    if cur is None:  # empty batch for this key; nothing to emit
        return
    state.update((cur,))
    yield pd.DataFrame({"band_key": [key[0]], "min_doc": [cur]})


def lsh_band_min_stream(bands: DataFrame) -> DataFrame:
    """Keyed running-min over a stream of exploded (band_key, doc_id)
    rows via ``applyInPandasWithState``. Update-mode output re-emits a
    band only when touched; the post-drain ``min`` per band equals the
    global band minimum REGARDLESS of how files were split into
    micro-batches — the property that makes the streaming near-dup
    verdict deterministic and oracle-checkable."""
    return bands.groupBy("band_key").applyInPandasWithState(
        _band_min,
        outputStructType=BAND_MIN_OUT_SCHEMA,
        stateStructType=BAND_MIN_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming per-key moment accumulation: exact integer (n, Σx, Σx²) in
# cents — the monitoring statistic every ingest pipeline keeps per shard.
# Sums are commutative/associative, so the drained result is independent
# of micro-batch order and exactly batch-checkable (same contract as the
# band-min dedup above).

MOMENTS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("sx", T.LongType()),
        T.StructField("sxx", T.LongType()),
    ]
)

MOMENTS_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("sx", T.LongType()),
        T.StructField("sxx", T.LongType()),
    ]
)


def _fold_moments(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold one micro-batch of cents values into the key's exact moment
    triple; emit the running triple. State is three longs per key."""
    n, sx, sxx = state.get if state.exists else (0, 0, 0)
    for p in pdfs:
        if len(p):
            cv = p["cv"].astype("int64")
            n += int(len(cv))
            sx += int(cv.sum())
            sxx += int((cv * cv).sum())
    state.update((n, sx, sxx))
    yield pd.DataFrame(
        {"event_type": [key[0]], "n": [n], "sx": [sx], "sxx": [sxx]}
    )


def stream_moments(stream: DataFrame, key_col: str = "event_type") -> DataFrame:
    """Keyed exact-moment accumulation over a stream of (key, cv) rows
    via ``applyInPandasWithState`` — the per-shard mean/variance monitor
    of a production ingest, with bit-exact semantics: integer sums
    commute, so the final emission per key equals the batch aggregate
    REGARDLESS of file/micro-batch split."""
    return stream.groupBy(key_col).applyInPandasWithState(
        _fold_moments,
        outputStructType=MOMENTS_OUT_SCHEMA,
        stateStructType=MOMENTS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming KMV distinct-count sketch: the k smallest distinct hashes per
# key as fixed-size state — set-min merging is commutative/associative, so
# the drained sketch equals the batch sketch exactly under any micro-batch
# split (same contract as the band-min / moments states above) and the
# estimate carries KMV's exact integer arithmetic.

KMV_STATE_SCHEMA = T.StructType(
    [T.StructField("mins", T.ArrayType(T.LongType()))]
)

KMV_OUT_SCHEMA = T.StructType(
    [
        T.StructField("lang", T.StringType()),
        T.StructField("kth", T.LongType()),
        T.StructField("ku", T.LongType()),
    ]
)

KMV_STREAM_K = 128


def _fold_kmv(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Merge one micro-batch of token hashes into the key's k-minimum
    distinct set (state is ≤ k longs — FIXED size however many tokens
    stream through); emit the current (kth, ku) summary."""
    mins = set(state.get[0]) if state.exists else set()
    for p in pdfs:
        if len(p):
            mins.update(int(h) for h in p["h"])
    if not mins:
        return
    kept = sorted(mins)[:KMV_STREAM_K]
    state.update((kept,))
    yield pd.DataFrame(
        {"lang": [key[0]], "kth": [kept[-1]], "ku": [len(kept)]}
    )


def stream_kmv(stream: DataFrame, key_col: str = "lang") -> DataFrame:
    """Keyed KMV sketch accumulation over a stream of (key, h) hash rows
    via ``applyInPandasWithState`` — the mergeable-summary property that
    makes sketches work on 1000 executors, demonstrated IN-STREAM: the
    final per-key emission is bit-identical to the batch sketch under
    any file/micro-batch split, so the approximate estimator still sits
    inside the exact oracle gate."""
    return stream.groupBy(key_col).applyInPandasWithState(
        _fold_kmv,
        outputStructType=KMV_OUT_SCHEMA,
        stateStructType=KMV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
