"""Streaming runtime: ingest loop, stream-stream joins, windowed
aggregations, custom keyed state."""

from __future__ import annotations

from contextlib import contextmanager

_PARTS_KEY = "spark.sql.shuffle.partitions"


@contextmanager
def scoped_confs(spark, confs: dict):
    """Set session confs for the duration of a block, restoring previous
    values (or unsetting) on exit — the pattern every streaming runner
    needs because the engine captures confs like the state-partition
    count and the state-store provider at ``writeStream.start()``."""
    prev: dict = {}
    for k, v in confs.items():
        prev[k] = spark.conf.get(k, None)
        spark.conf.set(k, str(v))
    try:
        yield
    finally:
        for k, old in prev.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)


@contextmanager
def scoped_state_partitions(spark, n: int | None):
    """Scope ``spark.sql.shuffle.partitions`` (which doubles as the
    streaming STATE partition count, frozen into the checkpoint at first
    query start) around a ``writeStream.start()`` — see
    ``session.stream_state_partitions`` for the sizing rationale.  ``None``
    inherits the session value untouched."""
    if n is None:
        yield
        return
    with scoped_confs(spark, {_PARTS_KEY: n}):
        yield


def drain_to_memory(
    spark,
    df,
    query_name: str,
    output_mode: str,
    timeout_sec: int = 300,
    state_partitions: int | None = None,
    extra_confs: dict | None = None,
):
    """The shared AvailableNow-drain tail of every runtime query: start
    the stream into a memory sink under the scoped confs, wait for the
    drain, return the sink table."""
    confs = dict(extra_confs or {})
    if state_partitions is not None:
        confs[_PARTS_KEY] = state_partitions
    with scoped_confs(spark, confs):
        q = (
            df.writeStream.format("memory")
            .queryName(query_name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        # awaitTermination returns False on timeout — a partially-drained
        # memory table must never be returned as if complete
        if not q.awaitTermination(timeout_sec):
            q.stop()
            raise TimeoutError(
                f"stream {query_name!r} did not drain within {timeout_sec}s"
            )
    return spark.table(query_name)
