"""Parquet fixture readers.

The sandbox stand-in for the Snowflake JDBC source (TESTDATA.md): one parquet
file per table under ``/root/testdata/sf*/``. ``spark.read.parquet`` gives a
vectorized columnar scan with predicate pushdown and column pruning — the
scan every downstream operator in this engine is designed to keep intact
(check with ``plans.explain_str``: ``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

#: (sf_dir, name) → (session, DataFrame). DataFrames are immutable and the
#: fixture files never change, so reusing the scan relation is safe; it
#: skips a parquet footer read + relation build per call (hundreds of
#: calls per bench/oracle sweep). Keyed per session — a new session
#: invalidates the entry. Conf pinning below still runs on EVERY call:
#: callers use load_table to (re)pin session semantics.
_TABLE_MEMO: dict[tuple, tuple] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown fixture table {name!r}; expected one of {TABLES}")
    # Pin timestamp semantics per FIXTURES.md §2 so results are identical to
    # the DuckDB oracle regardless of how the caller built the session:
    # - events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses by
    #   default (PARQUET_TYPE_ILLEGAL): read nanos as long, truncate to µs
    #   below — exactly what DuckDB's reader does;
    # - naive parquet timestamps read as TimestampType under a UTC session
    #   (not NTZ), one convention for instants everywhere (schema.py).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    key = (sf_dir, name)
    hit = _TABLE_MEMO.get(key)
    if hit is not None and hit[0] is spark:
        return hit[1]
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    _TABLE_MEMO[key] = (spark, df)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for ``spark.sql`` use."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
