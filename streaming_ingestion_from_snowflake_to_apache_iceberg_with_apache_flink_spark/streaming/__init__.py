"""Streaming runtime: ingest loop, stream-stream joins, windowed
aggregations, custom keyed state."""

from __future__ import annotations

from contextlib import contextmanager


@contextmanager
def scoped_state_partitions(spark, n: int | None):
    """Scope ``spark.sql.shuffle.partitions`` (which doubles as the
    streaming STATE partition count, frozen into the checkpoint at first
    query start) around a ``writeStream.start()`` — see
    ``session.stream_state_partitions`` for the sizing rationale.  ``None``
    inherits the session value untouched."""
    key = "spark.sql.shuffle.partitions"
    if n is None:
        yield
        return
    prev = spark.conf.get(key)
    spark.conf.set(key, str(n))
    try:
        yield
    finally:
        spark.conf.set(key, prev)
